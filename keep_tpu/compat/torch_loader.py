"""PyTorch checkpoint → JAX pytree converters.

Handles the released KEEP HF checkpoint layout (``pytorch_model.bin`` with
``visual.*`` timm ViT keys, ``visual_head.{0,2}.*``, ``text.*`` HF-BERT keys,
``logit_scale`` — reference quick_start/keep_inference.py:28-52,82-83) and the
training-stack layouts (``module.`` DDP prefixes, ``{'state_dict': ...}``
checkpoint dicts — reference training/path_training/main.py:306-326,
path_open_clip/factory.py:101-109).

Conversions are pure tensor reshapes/transposes:
- torch ``nn.Linear.weight`` [out, in] → kernel [in, out],
- patch conv [D, 3, P, P] → [P*P*3, D] with (ph, pw, c) flatten order
  (matches ``keep_tpu.models.vit.patchify``),
- per-layer weights stacked on a leading layer axis for ``lax.scan``,
- BERT q/k/v fused into one [D, 3D] kernel.
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np

from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def strip_prefix(sd: Mapping, prefix: str) -> dict:
    """Select keys under ``prefix`` and strip it (also drops DDP ``module.``)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if k.startswith(prefix):
            out[k[len(prefix) :]] = v
    return out


def _stack(getter: Callable[[int], np.ndarray], depth: int) -> np.ndarray:
    return np.stack([getter(i) for i in range(depth)], axis=0)


def convert_timm_vit(sd: Mapping, cfg: ViTConfig) -> dict:
    """timm ``VisionTransformer`` state dict → ``keep_tpu.models.vit`` pytree."""
    g = lambda k: _to_numpy(sd[k])
    d = cfg.embed_dim

    conv_w = g("patch_embed.proj.weight")  # [D, 3, P, P]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)  # (ph, pw, c) → D

    def stack_lin(fmt: str) -> dict:
        return {
            "kernel": _stack(lambda i: g(fmt.format(i) + ".weight").T, cfg.depth),
            "bias": _stack(lambda i: g(fmt.format(i) + ".bias"), cfg.depth),
        }

    def stack_ln(fmt: str) -> dict:
        return {
            "scale": _stack(lambda i: g(fmt.format(i) + ".weight"), cfg.depth),
            "bias": _stack(lambda i: g(fmt.format(i) + ".bias"), cfg.depth),
        }

    blocks = {
        "norm1": stack_ln("blocks.{}.norm1"),
        "attn": {
            "qkv": stack_lin("blocks.{}.attn.qkv"),
            "proj": stack_lin("blocks.{}.attn.proj"),
        },
        "norm2": stack_ln("blocks.{}.norm2"),
        "mlp": {
            "fc1": stack_lin("blocks.{}.mlp.fc1"),
            "fc2": stack_lin("blocks.{}.mlp.fc2"),
        },
    }
    if cfg.layerscale_init is not None:
        blocks["ls1"] = _stack(lambda i: g(f"blocks.{i}.ls1.gamma"), cfg.depth)
        blocks["ls2"] = _stack(lambda i: g(f"blocks.{i}.ls2.gamma"), cfg.depth)

    return {
        "patch_embed": {"kernel": patch_kernel, "bias": g("patch_embed.proj.bias")},
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "blocks": blocks,
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }


def convert_timm_eva(sd: Mapping, cfg) -> dict:
    """timm ``Eva`` state dict → ``keep_tpu.models.eva`` pytree (cfg is an
    ``EvaConfig``). Handles both the TrV layout (split q/k/v projections with
    a zero ``k_bias`` buffer, SwiGLU fc1_g/fc1_x + hidden norm, attn inner
    norm) and the E-variant layout (fused qkv with q_bias/v_bias params,
    plain-GELU mlp.fc1/fc2)."""
    g = lambda k: _to_numpy(sd[k])
    d, l = cfg.embed_dim, cfg.depth

    conv_w = g("patch_embed.proj.weight")  # [D, 3, P, P]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)

    def stack_lin(fmt: str, bias: bool = True) -> dict:
        out = {"kernel": _stack(lambda i: g(fmt.format(i) + ".weight").T, l)}
        if bias:
            out["bias"] = _stack(lambda i: g(fmt.format(i) + ".bias"), l)
        return out

    def stack_ln(fmt: str) -> dict:
        return {"scale": _stack(lambda i: g(fmt.format(i) + ".weight"), l),
                "bias": _stack(lambda i: g(fmt.format(i) + ".bias"), l)}

    if cfg.qkv_fused:
        def qkv_bias(i: int) -> np.ndarray:
            k = f"blocks.{i}.attn.qkv.bias"
            if k in sd:
                return g(k)
            # timm fused-Eva layout: q_bias/v_bias params, k_bias zero buffer
            return np.concatenate([
                g(f"blocks.{i}.attn.q_bias"), np.zeros(d, np.float32),
                g(f"blocks.{i}.attn.v_bias")])

        attn = {
            "qkv": {"kernel": _stack(
                lambda i: g(f"blocks.{i}.attn.qkv.weight").T, l),
                "bias": _stack(qkv_bias, l)},
            "proj": stack_lin("blocks.{}.attn.proj"),
        }
    else:
        attn = {
            "q": stack_lin("blocks.{}.attn.q_proj"),
            "k": stack_lin("blocks.{}.attn.k_proj", bias=False),
            "v": stack_lin("blocks.{}.attn.v_proj"),
            "proj": stack_lin("blocks.{}.attn.proj"),
        }
    if cfg.scale_attn_inner:
        attn["norm"] = stack_ln("blocks.{}.attn.norm")

    if cfg.swiglu:
        mlp = {
            "fc1_g": stack_lin("blocks.{}.mlp.fc1_g"),
            "fc1_x": stack_lin("blocks.{}.mlp.fc1_x"),
            "fc2": stack_lin("blocks.{}.mlp.fc2"),
        }
        if cfg.scale_mlp:
            mlp["norm"] = stack_ln("blocks.{}.mlp.norm")
    else:
        mlp = {"fc1": stack_lin("blocks.{}.mlp.fc1"),
               "fc2": stack_lin("blocks.{}.mlp.fc2")}

    out = {
        "patch_embed": {"kernel": patch_kernel,
                        "bias": g("patch_embed.proj.bias")},
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "blocks": {"norm1": stack_ln("blocks.{}.norm1"), "attn": attn,
                   "norm2": stack_ln("blocks.{}.norm2"), "mlp": mlp},
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
    if "head.weight" in sd:
        out["head"] = {"kernel": g("head.weight").T, "bias": g("head.bias")}
    return out


def convert_timm_vit_relpos(sd: Mapping, cfg) -> dict:
    """timm ``VisionTransformerRelPos`` (cls variant) state dict →
    ``keep_tpu.models.vit_relpos`` pytree. The per-block RelPosMlp lives at
    ``blocks.{i}.attn.rel_pos.mlp.fc{1,2}``; there is no absolute pos embed."""
    g = lambda k: _to_numpy(sd[k])
    d, l = cfg.embed_dim, cfg.depth

    conv_w = g("patch_embed.proj.weight")
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)

    def stack_lin(fmt: str) -> dict:
        kernel = _stack(lambda i: g(fmt.format(i) + ".weight").T, l)
        if fmt.format(0) + ".bias" in sd:
            bias = _stack(lambda i: g(fmt.format(i) + ".bias"), l)
        else:
            # vit_relpos presets are registered with qkv_bias=False — the
            # pytree always carries a bias, so synthesize zeros (identical
            # math; same pattern as convert_timm_eva's missing k_bias)
            bias = np.zeros(kernel.shape[::2], kernel.dtype)
        return {"kernel": kernel, "bias": bias}

    def stack_ln(fmt: str) -> dict:
        return {"scale": _stack(lambda i: g(fmt.format(i) + ".weight"), l),
                "bias": _stack(lambda i: g(fmt.format(i) + ".bias"), l)}

    return {
        "patch_embed": {"kernel": patch_kernel,
                        "bias": g("patch_embed.proj.bias")},
        "cls_token": g("cls_token"),
        "blocks": {
            "norm1": stack_ln("blocks.{}.norm1"),
            "attn": {
                "qkv": stack_lin("blocks.{}.attn.qkv"),
                "proj": stack_lin("blocks.{}.attn.proj"),
                "rel_pos": {
                    "fc1": stack_lin("blocks.{}.attn.rel_pos.mlp.fc1"),
                    "fc2": stack_lin("blocks.{}.attn.rel_pos.mlp.fc2"),
                },
            },
            "norm2": stack_ln("blocks.{}.norm2"),
            "mlp": {"fc1": stack_lin("blocks.{}.mlp.fc1"),
                    "fc2": stack_lin("blocks.{}.mlp.fc2")},
        },
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }


def convert_hf_bert(sd: Mapping, cfg: BertConfig) -> dict:
    """HF ``BertModel`` state dict → ``keep_tpu.models.bert`` pytree."""
    g = lambda k: _to_numpy(sd[k])
    depth = cfg.num_hidden_layers

    def qkv(i: int) -> dict:
        base = f"encoder.layer.{i}.attention.self"
        kernel = np.concatenate(
            [g(f"{base}.{n}.weight").T for n in ("query", "key", "value")], axis=1
        )
        bias = np.concatenate(
            [g(f"{base}.{n}.bias") for n in ("query", "key", "value")], axis=0
        )
        return {"kernel": kernel, "bias": bias}

    def stack_lin(fmt: str) -> dict:
        return {
            "kernel": _stack(lambda i: g(fmt.format(i) + ".weight").T, depth),
            "bias": _stack(lambda i: g(fmt.format(i) + ".bias"), depth),
        }

    def stack_ln(fmt: str) -> dict:
        return {
            "scale": _stack(lambda i: g(fmt.format(i) + ".weight"), depth),
            "bias": _stack(lambda i: g(fmt.format(i) + ".bias"), depth),
        }

    qkv_stacked = [qkv(i) for i in range(depth)]
    out = {
        "embeddings": {
            "word": g("embeddings.word_embeddings.weight"),
            "position": g("embeddings.position_embeddings.weight"),
            "token_type": g("embeddings.token_type_embeddings.weight"),
            "norm": {
                "scale": g("embeddings.LayerNorm.weight"),
                "bias": g("embeddings.LayerNorm.bias"),
            },
        },
        "blocks": {
            "attn": {
                "qkv": {
                    "kernel": np.stack([q["kernel"] for q in qkv_stacked]),
                    "bias": np.stack([q["bias"] for q in qkv_stacked]),
                },
                "out": stack_lin("encoder.layer.{}.attention.output.dense"),
                "norm": stack_ln("encoder.layer.{}.attention.output.LayerNorm"),
            },
            "mlp": {
                "fc1": stack_lin("encoder.layer.{}.intermediate.dense"),
                "fc2": stack_lin("encoder.layer.{}.output.dense"),
            },
            "norm": stack_ln("encoder.layer.{}.output.LayerNorm"),
        },
    }
    if "pooler.dense.weight" in sd:  # absent for add_pooling_layer=False
        out["pooler"] = {
            "kernel": g("pooler.dense.weight").T,
            "bias": g("pooler.dense.bias"),
        }
    return out


def normalize_state_dict(sd: Mapping) -> dict:
    """Released-checkpoint quirks, applied up front: unwrap training
    ``{'state_dict': ...}`` dicts (main.py:424-431), strip DDP ``module.``
    prefixes (factory.py:101-109), drop ``position_ids`` buffers (older
    transformers serialize them; they are constants)."""
    if isinstance(sd, Mapping) and "state_dict" in sd and not hasattr(
        sd["state_dict"], "shape"
    ):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if k.endswith("position_ids"):
            continue
        out[k] = v
    return out


def convert_keep_state_dict(sd: Mapping, cfg: KEEPConfig) -> dict:
    """Full KEEP HF-layout state dict → KEEP params pytree
    (quick_start/keep_inference.py:28-52: ``visual.*`` timm ViT,
    ``visual_head.{0,2}.*``, ``text.*`` HF BertModel, ``logit_scale``)."""
    sd = normalize_state_dict(sd)
    g = lambda k: _to_numpy(sd[k])
    return {
        "visual": convert_timm_vit(strip_prefix(sd, "visual."), cfg.vision),
        "visual_head": {
            "fc1": {"kernel": g("visual_head.0.weight").T, "bias": g("visual_head.0.bias")},
            "fc2": {"kernel": g("visual_head.2.weight").T, "bias": g("visual_head.2.bias")},
        },
        "text": convert_hf_bert(strip_prefix(sd, "text."), cfg.text),
        "logit_scale": g("logit_scale").reshape(()),
    }


def load_state_dict_file(path: str) -> dict:
    """Read a weights file by extension: ``.safetensors`` (HF releases
    increasingly ship these exclusively) or a torch ``.bin``/``.pt``."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def load_keep_checkpoint(path: str, cfg: KEEPConfig) -> dict:
    """Load ``pytorch_model.bin`` / ``model.safetensors`` (or a training
    checkpoint dict) and convert."""
    sd = load_state_dict_file(path)
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, convert_keep_state_dict(sd, cfg))
