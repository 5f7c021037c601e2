"""Model factory: name → (config, init, forward fns).

The reference's factory (training/path_open_clip/factory.py) resolves 60+
arch JSONs, builds the model, and post-hoc swaps towers (``model.visual`` ←
UNI weights, text ← knowledge-BERT — :200-217). Here architectures are
explicit configs in a registry and tower weights load through ``compat``
converters — no monkeypatching (and no reproduction of the factory's broken
imports, SURVEY §2.2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax

from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    family: str  # 'keep' | 'kep' | 'clip' | 'coca' | 'pmc_clip'
    config: Any
    init: Callable
    encode_image: Optional[Callable] = None
    encode_text: Optional[Callable] = None
    forward: Optional[Callable] = None


_REGISTRY: dict[str, Callable[[], ModelSpec]] = {}


def register_model(name: str):
    def wrap(fn):
        _REGISTRY[name] = fn
        return fn

    return wrap


def list_models() -> list[str]:
    from keep_tpu import presets

    return sorted(set(_REGISTRY) | set(presets.PRESETS))


def create_model(name: str, seed: int = 0, dtype=None, pretrained=None,
                 **overrides):
    """→ (params, ModelSpec). ``overrides`` replace top-level config fields.

    ``pretrained``: load released weights — a registry name
    (compat.registry), a local path, or a URL (fetched + sha256-verified +
    cached; the reference's create_model(pretrained=...) →
    download_pretrained path, factory.py:286-339 / pretrained.py:400-427).

    Names outside the curated registry resolve through the OpenCLIP preset
    inventory (``keep_tpu.presets`` — the reference's model_configs/*.json)."""
    import jax.numpy as jnp

    if pretrained is not None and name not in ("keep",):
        raise NotImplementedError(
            "pretrained= loading is wired for the released 'keep' model; "
            "other families load tower checkpoints via keep_tpu.compat "
            "converters or train.main (pretrained_image/pretrained_text)")
    if name not in _REGISTRY:
        from keep_tpu import presets

        if name in presets.PRESETS or name in presets.UNSUPPORTED:
            if overrides:
                raise ValueError(
                    "config overrides are not supported for OpenCLIP presets;"
                    " use presets.resolve() and build towers directly")
            params, model = presets.create_preset(
                name, seed=seed, dtype=dtype or jnp.float32)
            spec = ModelSpec(
                family=model.preset.family, config=model.preset,
                init=lambda *a, **k: params,
                encode_image=model.encode_image,
                encode_text=model.encode_text, forward=model.forward,
            )
            return params, spec
        raise KeyError(f"unknown model {name!r}; have {list_models()}")
    spec = _REGISTRY[name]()
    if overrides:
        spec = dataclasses.replace(
            spec, config=dataclasses.replace(spec.config, **overrides)
        )
    if pretrained is not None:
        import os

        from keep_tpu.compat.registry import fetch
        from keep_tpu.compat.torch_loader import load_keep_checkpoint

        path = fetch(pretrained)
        if os.path.isdir(path):
            cfg_json = os.path.join(path, "config.json")
            if os.path.exists(cfg_json):
                # checkpoint config first, USER OVERRIDES on top — replacing
                # wholesale silently discarded e.g. img_size=384
                hf_cfg = KEEPConfig.from_hf_json(cfg_json)
                if overrides:
                    hf_cfg = dataclasses.replace(hf_cfg, **overrides)
                spec = dataclasses.replace(spec, config=hf_cfg)
            for fname in ("pytorch_model.bin", "model.safetensors"):
                weights = os.path.join(path, fname)
                if os.path.exists(weights):
                    break
            else:
                raise FileNotFoundError(f"no weights file in {path}")
        else:
            weights = path
        params = load_keep_checkpoint(weights, spec.config)
        return params, spec
    params = spec.init(jax.random.PRNGKey(seed), spec.config,
                       dtype or jnp.float32)
    return params, spec


# --------------------------------------------------------------------------


@register_model("keep")  # the released ViT-L/16 + BERT model
def _keep() -> ModelSpec:
    from keep_tpu.models import keep

    return ModelSpec(
        family="keep", config=KEEPConfig(), init=keep.init,
        encode_image=keep.encode_image, encode_text=keep.encode_text,
        forward=keep.forward,
    )


@register_model("kep")  # the training-time knowledge-enhanced model
def _kep() -> ModelSpec:
    from keep_tpu.models import kep

    return ModelSpec(
        family="kep", config=kep.KEPConfig(), init=kep.init,
        encode_image=kep.encode_image, encode_text=kep.encode_text,
        forward=kep.forward,
    )


@register_model("clip-vit-b-16")
def _clip_b16() -> ModelSpec:
    from keep_tpu.models import clip as clip_model

    cfg = clip_model.CLIPConfig(
        embed_dim=512,
        vision=ViTConfig(patch_size=16, embed_dim=768, depth=12, num_heads=12,
                         layerscale_init=None, ln_eps=1e-5),
    )
    return ModelSpec(
        family="clip", config=cfg, init=clip_model.init,
        encode_image=clip_model.encode_image, encode_text=clip_model.encode_text,
        forward=clip_model.forward,
    )


@register_model("clip-vit-l-14")
def _clip_l14() -> ModelSpec:
    from keep_tpu.models import clip as clip_model
    from keep_tpu.models.text_transformer import TextTransformerConfig

    cfg = clip_model.CLIPConfig(
        embed_dim=768,
        vision=ViTConfig(patch_size=14, img_size=224, embed_dim=1024, depth=24,
                         num_heads=16, layerscale_init=None, ln_eps=1e-5),
        text=TextTransformerConfig(width=768, heads=12, layers=12, output_dim=768),
    )
    return ModelSpec(
        family="clip", config=cfg, init=clip_model.init,
        encode_image=clip_model.encode_image, encode_text=clip_model.encode_text,
        forward=clip_model.forward,
    )


@register_model("rn50-clip")
def _rn50() -> ModelSpec:
    from keep_tpu.models import resnet

    cfg = resnet.ModifiedResNetConfig()
    return ModelSpec(
        family="clip", config=cfg, init=resnet.init,
        encode_image=resnet.forward,
    )


@register_model("coca")
def _coca() -> ModelSpec:
    from keep_tpu.models import coca

    return ModelSpec(
        family="coca", config=coca.CoCaConfig(), init=coca.init,
        encode_image=coca.encode_image, encode_text=coca.encode_text,
        forward=coca.forward,
    )


@register_model("pmc-clip")
def _pmc() -> ModelSpec:
    from keep_tpu.models import pmc_clip

    return ModelSpec(
        family="pmc_clip", config=pmc_clip.PMCCLIPConfig(), init=pmc_clip.init,
        encode_image=pmc_clip.encode_image, forward=pmc_clip.forward,
    )


def get_tokenizer(kind: str, path: str, **kw):
    """Tokenizer factory (reference factory.get_tokenizer, factory.py:85-98):
    'bert' → WordPiece (vocab.txt file or model dir), 'clip' → byte-level BPE
    (merges file). The native C++ WordPiece fast path is used when built."""
    import os

    if kind == "bert":
        try:
            from keep_tpu.text.fast_tokenizer import FastWordPieceTokenizer

            vocab = path if path.endswith(".txt") else os.path.join(path, "vocab.txt")
            return FastWordPieceTokenizer(vocab, **kw)
        except (ImportError, OSError, RuntimeError):
            # only build-environment failures (no compiler, lib load, bad
            # native handle) fall back to the slow path — a bad vocab or a
            # typo'd kwarg must surface, not silently change tokenizers
            from keep_tpu.text.tokenizer import WordPieceTokenizer

            if path.endswith(".txt"):
                return WordPieceTokenizer(path, **kw)
            return WordPieceTokenizer.from_pretrained(path, **kw)
    if kind == "clip":
        try:
            from keep_tpu.text.fast_tokenizer import FastBPETokenizer

            return FastBPETokenizer(path, **kw)
        except Exception:
            from keep_tpu.text.bpe import BPETokenizer

            return BPETokenizer(path, **kw)
    raise ValueError(f"unknown tokenizer kind {kind!r} (want 'bert' or 'clip')")
