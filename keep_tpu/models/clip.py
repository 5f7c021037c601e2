"""OpenAI/OpenCLIP-style CLIP model (the reference's ``CLIP`` class,
training/path_open_clip/model/model.py:186-255): ViT image tower with a
projection matrix + fused causal text tower, shared logit_scale.

Params: {'visual': vit pytree + {'proj': [D, E]}, 'text': text_transformer
pytree, 'logit_scale'}.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import ViTConfig
from keep_tpu.models import text_transformer, vit
from keep_tpu.models.text_transformer import TextTransformerConfig
from keep_tpu.ops.nn import l2_normalize

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    vision: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig(
            embed_dim=768, depth=12, num_heads=12, layerscale_init=None,
            ln_eps=1e-5,
        )
    )
    text: TextTransformerConfig = dataclasses.field(default_factory=TextTransformerConfig)
    logit_scale_init: float = 1 / 14.285714  # ln(1/0.07) — OpenAI default


def encode_image(params, pixels, cfg: CLIPConfig, *, normalize=False,
                 dtype=jnp.float32, use_flash=False) -> Array:
    feats = vit.forward(params["visual"], pixels, cfg.vision,
                        dtype=dtype, use_flash=use_flash)
    feats = jnp.dot(feats, params["visual"]["proj"].astype(feats.dtype),
                    preferred_element_type=jnp.float32).astype(feats.dtype)
    return l2_normalize(feats.astype(jnp.float32)) if normalize else feats


def encode_text(params, input_ids, cfg: CLIPConfig, *, normalize=False,
                dtype=jnp.float32) -> Array:
    feats = text_transformer.forward(params["text"], input_ids, cfg.text, dtype=dtype)
    return l2_normalize(feats.astype(jnp.float32)) if normalize else feats


def forward(params, pixels, input_ids, cfg: CLIPConfig, **kw) -> dict:
    return {
        "image_features": encode_image(params, pixels, cfg, normalize=True, **kw),
        "text_features": encode_text(params, input_ids, cfg, normalize=True),
        "logit_scale": jnp.exp(params["logit_scale"]),
    }


def init(key: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    kv, kp, kt = jax.random.split(key, 3)
    visual = vit.init(kv, cfg.vision, dtype)
    visual["proj"] = (
        jax.random.normal(kp, (cfg.vision.embed_dim, cfg.embed_dim))
        * cfg.vision.embed_dim**-0.5
    ).astype(dtype)
    return {
        "visual": visual,
        "text": text_transformer.init(kt, cfg.text, dtype),
        "logit_scale": jnp.asarray(np.log(1 / cfg.logit_scale_init), jnp.float32),
    }
