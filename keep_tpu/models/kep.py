"""KEP — the training-time model family (knowledge-enhanced pretraining).

Reference (training/path_open_clip/model/model.py:258-376 + knowledge_bert.py:
17-65): a vision tower (timm ViT in the KEEP config; factory.py:211-217 swaps
in UNI weights), a PATH_BERT text tower (HF BERT + ``mlp_embed``: Linear
768→D → GELU → Linear D→D, init std=D^-0.5), optional visual/text MLP heads,
PLUS a third PATH_BERT **knowledge** tower with ``encode_knowledge`` for the
knowledge-distillation objective, and logit_scale = ln(1/0.04).

Params pytree: {'visual', 'visual_head'?, 'text': {'bert', 'mlp_embed'},
'text_head'?, 'knowledge': {'bert', 'mlp_embed'}, 'logit_scale'}.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import BertConfig, ViTConfig
from keep_tpu.models import bert, vit
from keep_tpu.ops.nn import gelu, l2_normalize, linear

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class KEPConfig:
    vision: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    text: BertConfig = dataclasses.field(default_factory=BertConfig)
    embed_dim: int = 768  # TEXT_EMBED_DIM in keep_config.yml
    image_encoder: str = "vit"  # 'vit' | 'res_ssl' | 'rn_clip' (model.py:283-333)
    vision_rn: Optional[object] = None  # ModifiedResNetConfig for 'rn_clip'
    visual_embedding_head: bool = True
    text_embedding_head: bool = False
    with_knowledge: bool = True
    logit_scale_init: float = 0.04


def _mlp_head(p: dict, x: Array) -> Array:
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def path_bert_encode(p: dict, input_ids, attention_mask, cfg: BertConfig,
                     *, dtype=jnp.float32, use_flash=False) -> Array:
    """PATH_BERT.encode_text (knowledge_bert.py:56-60): pooler → mlp_embed
    (unnormalized; forward() normalizes)."""
    out = bert.forward(p["bert"], input_ids, attention_mask, cfg=cfg,
                       dtype=dtype, use_flash=use_flash)
    return _mlp_head(p["mlp_embed"], out["pooler_output"])


def encode_image(params, pixels, cfg: KEPConfig, *, normalize=False,
                 dtype=jnp.float32, use_flash=False) -> Array:
    if cfg.image_encoder == "vit":
        feats = vit.forward(params["visual"], pixels, cfg.vision,
                            dtype=dtype, use_flash=use_flash)
    elif cfg.image_encoder == "res_ssl":
        # lunit SSL RN50 trunk + global avg pool (model.py:283-285,330-333)
        from keep_tpu.models.resnet import resnet_trunk_pooled

        feats = resnet_trunk_pooled(params["visual"], pixels, dtype=dtype)
    elif cfg.image_encoder == "rn_clip":
        from keep_tpu.models import resnet

        rn_cfg = cfg.vision_rn or resnet.ModifiedResNetConfig(
            output_dim=cfg.vision.embed_dim
        )
        feats = resnet.forward(params["visual"], pixels, rn_cfg, dtype=dtype)
    else:
        raise ValueError(f"unknown image_encoder {cfg.image_encoder!r}")
    if "visual_head" in params:
        feats = _mlp_head(params["visual_head"], feats)
    return l2_normalize(feats.astype(jnp.float32)) if normalize else feats


def encode_text(params, input_ids, attention_mask=None, cfg: KEPConfig = None,
                *, normalize=False, dtype=jnp.float32, use_flash=False) -> Array:
    x = path_bert_encode(params["text"], input_ids, attention_mask, cfg.text,
                         dtype=dtype, use_flash=use_flash)
    if "text_head" in params:
        x = _mlp_head(params["text_head"], x)
    return l2_normalize(x.astype(jnp.float32)) if normalize else x


def encode_knowledge(params, input_ids, attention_mask=None,
                     cfg: KEPConfig = None, *, normalize=False,
                     dtype=jnp.float32, use_flash=False) -> Array:
    x = path_bert_encode(params["knowledge"], input_ids, attention_mask,
                         cfg.text, dtype=dtype, use_flash=use_flash)
    return l2_normalize(x.astype(jnp.float32)) if normalize else x


def forward(params, pixels=None, input_ids=None, attention_mask=None,
            cfg: KEPConfig = None, **kw) -> dict:
    out = {"logit_scale": jnp.exp(params["logit_scale"])}
    if pixels is not None:
        out["image_features"] = encode_image(params, pixels, cfg, normalize=True, **kw)
    if input_ids is not None:
        out["text_features"] = encode_text(
            params, input_ids, attention_mask, cfg, normalize=True, **kw)
        if "knowledge" in params:
            out["knowledge_features"] = encode_knowledge(
                params, input_ids, attention_mask, cfg, normalize=True, **kw)
    return out


def init(key: jax.Array, cfg: KEPConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 8))
    d = cfg.embed_dim

    def head(key, fan_in, std=0.01):
        k1, k2 = jax.random.split(key)
        return {
            "fc1": {"kernel": (jax.random.normal(k1, (fan_in, d)) * std).astype(dtype),
                    "bias": jnp.zeros((d,), dtype)},
            "fc2": {"kernel": (jax.random.normal(k2, (d, d)) * std).astype(dtype),
                    "bias": jnp.zeros((d,), dtype)},
        }

    def path_bert(key):
        kb, km = jax.random.split(key)
        # mlp_embed init std = embed_dim ** -0.5 (knowledge_bert.py:34-38)
        return {
            "bert": bert.init(kb, cfg.text, dtype),
            "mlp_embed": head(km, cfg.text.hidden_size, std=d**-0.5),
        }

    if cfg.image_encoder == "vit":
        visual = vit.init(next(keys), cfg.vision, dtype)
        vis_dim = cfg.vision.embed_dim
    elif cfg.image_encoder == "rn_clip":
        from keep_tpu.models import resnet

        rn_cfg = cfg.vision_rn or resnet.ModifiedResNetConfig(
            output_dim=cfg.vision.embed_dim)
        visual = resnet.init(next(keys), rn_cfg, dtype)
        vis_dim = rn_cfg.output_dim
    elif cfg.image_encoder == "res_ssl":
        # the lunit SSL RN50 trunk has no from-scratch init (it loads
        # pretrained weights — model.py:283-285); an explicit empty
        # placeholder forces the caller to install the trunk (the factory
        # pattern), instead of the old silent ViT pytree that crashed
        # inside resnet.forward at first use
        visual = {}
        vis_dim = 2048  # RN50 trunk pooled width
    else:
        raise ValueError(f"unknown image_encoder {cfg.image_encoder!r}")
    params = {
        "visual": visual,
        "text": path_bert(next(keys)),
        "logit_scale": jnp.asarray(np.log(1 / cfg.logit_scale_init), jnp.float32),
    }
    if cfg.visual_embedding_head:
        params["visual_head"] = head(next(keys), vis_dim)
    if cfg.text_embedding_head:
        params["text_head"] = head(next(keys), d)
    if cfg.with_knowledge:
        params["knowledge"] = path_bert(next(keys))
    return params


def load_knowledge_bert(params: dict, torch_path: str, cfg: KEPConfig,
                        into: str = "text") -> dict:
    """Load a knowledge-BERT torch checkpoint into the text (or knowledge)
    tower (factory.py:200-208: state dict with bert_model.* / mlp_embed.*)."""
    import torch

    from keep_tpu.compat.torch_loader import (
        _to_numpy,
        convert_hf_bert,
        strip_prefix,
    )

    sd = torch.load(torch_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    tower = {
        "bert": convert_hf_bert(strip_prefix(sd, "bert_model."), cfg.text),
        "mlp_embed": {
            "fc1": {"kernel": _to_numpy(sd["mlp_embed.0.weight"]).T,
                    "bias": _to_numpy(sd["mlp_embed.0.bias"])},
            "fc2": {"kernel": _to_numpy(sd["mlp_embed.2.weight"]).T,
                    "bias": _to_numpy(sd["mlp_embed.2.bias"])},
        },
    }
    out = dict(params)
    out[into] = jax.tree.map(jnp.asarray, tower)
    return out
