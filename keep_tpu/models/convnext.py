"""ConvNeXt image tower — the reference's ``convnext_*`` arch family
(11 of the 62 model_configs delegate to timm ConvNeXt via ``TimmModel``,
timm_model.py:28-149; this is a native NHWC implementation of the
documented architecture, oracle-tested against ``transformers.ConvNextModel``).

Per block: 7×7 depthwise conv → channel-last LayerNorm → pointwise 4×
expand → GELU → pointwise project → LayerScale → residual. Stages are
separated by LN + 2×2 stride-2 downsampling convs; the stem is a 4×4
stride-4 conv + LN. Trunk output (timm ``num_classes=0`` head semantics,
matching the OpenCLIP presets' ``timm_pool: ''``): global average pool →
final LN → [B, num_features].

TPU notes: everything is NHWC with channel-last LayerNorms (no transposes);
the pointwise convs are expressed as [*, C]·[C, F] matmuls so they land on
the MXU; blocks within a stage run under ``lax.scan`` over stacked params
(one compiled block body per stage).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.ops.nn import gelu, layer_norm, linear

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    img_size: int = 224
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    ls_init: float | None = 1e-6
    ln_eps: float = 1e-6

    @property
    def num_features(self) -> int:
        return self.dims[-1]


def _conv(p: dict, x: Array, stride: int, groups: int = 1,
          padding="VALID") -> Array:
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + p["bias"].astype(out.dtype)


def block(p: dict, x: Array, cfg: ConvNeXtConfig) -> Array:
    c = x.shape[-1]
    y = _conv(p["dwconv"], x, 1, groups=c, padding=[(3, 3), (3, 3)])
    y = layer_norm(p["norm"], y, cfg.ln_eps)
    y = linear(p["fc2"], gelu(linear(p["fc1"], y)))
    if "gamma" in p:
        y = y * p["gamma"].astype(y.dtype)
    return x + y


def forward(params: dict, pixels: Array, cfg: ConvNeXtConfig, *,
            dtype=jnp.float32, pool: bool = True, **_ignored) -> Array:
    """[B, H, W, 3] → [B, num_features] (``pool=True``) or the final
    [B, H/32, W/32, C] feature map (``pool=False``, for attention pooling)."""
    x = pixels.astype(dtype)
    x = _conv(params["stem"]["conv"], x, 4)
    x = layer_norm(params["stem"]["norm"], x, cfg.ln_eps)
    for s in range(len(cfg.depths)):
        st = params["stages"][s]
        if s > 0:
            x = layer_norm(st["down_norm"], x, cfg.ln_eps)
            x = _conv(st["down_conv"], x, 2)

        def body(carry, p):
            return block(p, carry, cfg), None

        x, _ = jax.lax.scan(body, x, st["blocks"])
    if not pool:
        return x
    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
    return layer_norm(params["norm"], x, cfg.ln_eps)


def init(key: jax.Array, cfg: ConvNeXtConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 4 + 4 * len(cfg.depths)))

    def trunc(k, shape, std=0.02):
        return (jax.random.truncated_normal(k, -2, 2, shape) * std).astype(dtype)

    def conv_p(k, kh, kw, ci, co):
        return {"kernel": trunc(k, (kh, kw, ci, co)),
                "bias": jnp.zeros((co,), dtype)}

    def ln_p(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    params = {
        "stem": {"conv": conv_p(next(keys), 4, 4, 3, cfg.dims[0]),
                 "norm": ln_p(cfg.dims[0])},
        "stages": [],
        "norm": ln_p(cfg.num_features),
    }
    for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        kb = jax.random.split(next(keys), max(depth, 1) * 3)
        blocks = {
            "dwconv": {"kernel": jnp.stack([trunc(kb[3 * i], (7, 7, 1, dim))
                                            for i in range(depth)]),
                       "bias": jnp.zeros((depth, dim), dtype)},
            "norm": {"scale": jnp.ones((depth, dim), dtype),
                     "bias": jnp.zeros((depth, dim), dtype)},
            "fc1": {"kernel": jnp.stack([trunc(kb[3 * i + 1], (dim, 4 * dim))
                                         for i in range(depth)]),
                    "bias": jnp.zeros((depth, 4 * dim), dtype)},
            "fc2": {"kernel": jnp.stack([trunc(kb[3 * i + 2], (4 * dim, dim))
                                         for i in range(depth)]),
                    "bias": jnp.zeros((depth, dim), dtype)},
        }
        if cfg.ls_init is not None:
            blocks["gamma"] = jnp.full((depth, dim), cfg.ls_init, dtype)
        stage = {"blocks": blocks}
        if s > 0:
            stage["down_norm"] = ln_p(cfg.dims[s - 1])
            stage["down_conv"] = conv_p(next(keys), 2, 2, cfg.dims[s - 1], dim)
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------- converters


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _conv_w(w):  # torch [O, I, kh, kw] → HWIO
    return _np(w).transpose(2, 3, 1, 0)


def _dw_w(w):  # torch depthwise [C, 1, kh, kw] → [kh, kw, 1, C]
    return _np(w).transpose(2, 3, 1, 0)


def convert_hf_convnext(sd, cfg: ConvNeXtConfig) -> dict:
    """``transformers.ConvNextModel`` state dict → our pytree (the oracle
    layout; timm checkpoints go through :func:`convert_timm_convnext`)."""
    out = {
        "stem": {
            "conv": {"kernel": _conv_w(sd["embeddings.patch_embeddings.weight"]),
                     "bias": _np(sd["embeddings.patch_embeddings.bias"])},
            "norm": {"scale": _np(sd["embeddings.layernorm.weight"]),
                     "bias": _np(sd["embeddings.layernorm.bias"])},
        },
        "stages": [],
        "norm": {"scale": _np(sd["layernorm.weight"]),
                 "bias": _np(sd["layernorm.bias"])},
    }
    for s, depth in enumerate(cfg.depths):
        pre = f"encoder.stages.{s}."

        def stack(fmt, f=_np):
            return np.stack([f(sd[pre + f"layers.{i}." + fmt])
                             for i in range(depth)])

        blocks = {
            "dwconv": {"kernel": stack("dwconv.weight", _dw_w),
                       "bias": stack("dwconv.bias")},
            "norm": {"scale": stack("layernorm.weight"),
                     "bias": stack("layernorm.bias")},
            "fc1": {"kernel": stack("pwconv1.weight", lambda v: _np(v).T),
                    "bias": stack("pwconv1.bias")},
            "fc2": {"kernel": stack("pwconv2.weight", lambda v: _np(v).T),
                    "bias": stack("pwconv2.bias")},
        }
        if pre + "layers.0.layer_scale_parameter" in sd:
            blocks["gamma"] = stack("layer_scale_parameter")
        stage = {"blocks": blocks}
        if s > 0:
            stage["down_norm"] = {
                "scale": _np(sd[pre + "downsampling_layer.0.weight"]),
                "bias": _np(sd[pre + "downsampling_layer.0.bias"])}
            stage["down_conv"] = {
                "kernel": _conv_w(sd[pre + "downsampling_layer.1.weight"]),
                "bias": _np(sd[pre + "downsampling_layer.1.bias"])}
        out["stages"].append(stage)
    return out


def convert_timm_convnext(sd, cfg: ConvNeXtConfig) -> dict:
    """timm ``convnext_*`` state dict (the layout inside OpenCLIP
    ``convnext_*`` checkpoints, trunk-prefixed) → our pytree."""
    out = {
        "stem": {"conv": {"kernel": _conv_w(sd["stem.0.weight"]),
                          "bias": _np(sd["stem.0.bias"])},
                 "norm": {"scale": _np(sd["stem.1.weight"]),
                          "bias": _np(sd["stem.1.bias"])}},
        "stages": [],
        "norm": {"scale": _np(sd["head.norm.weight"]),
                 "bias": _np(sd["head.norm.bias"])},
    }
    for s, depth in enumerate(cfg.depths):
        pre = f"stages.{s}."

        def stack(fmt, f=_np):
            return np.stack([f(sd[pre + f"blocks.{i}." + fmt])
                             for i in range(depth)])

        blocks = {
            "dwconv": {"kernel": stack("conv_dw.weight", _dw_w),
                       "bias": stack("conv_dw.bias")},
            "norm": {"scale": stack("norm.weight"),
                     "bias": stack("norm.bias")},
            "fc1": {"kernel": stack("mlp.fc1.weight", lambda v: _np(v).T),
                    "bias": stack("mlp.fc1.bias")},
            "fc2": {"kernel": stack("mlp.fc2.weight", lambda v: _np(v).T),
                    "bias": stack("mlp.fc2.bias")},
        }
        if pre + "blocks.0.gamma" in sd:
            blocks["gamma"] = stack("gamma")
        stage = {"blocks": blocks}
        if s > 0:
            stage["down_norm"] = {"scale": _np(sd[pre + "downsample.0.weight"]),
                                  "bias": _np(sd[pre + "downsample.0.bias"])}
            stage["down_conv"] = {"kernel": _conv_w(sd[pre + "downsample.1.weight"]),
                                  "bias": _np(sd[pre + "downsample.1.bias"])}
        out["stages"].append(stage)
    return out
