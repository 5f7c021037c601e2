"""EVA02 image trunk (2D rotary pos-embed + SwiGLU + sub-LN), TPU-native.

The reference builds its EVA02 presets by delegating to external timm
(``timm_model_name: eva02_*_clip_224`` in
training/path_open_clip/model_configs/EVA02-*.json; adapter
timm_model.py:28-149). timm is not installable in this image, so this is a
from-public-spec implementation of the EVA-02 "TrV" block (arXiv 2303.11331
§2.2, mirrored by timm's ``eva.py`` layout for weight conversion):

- separate q/k/v projections; **k has no bias** (timm keeps a zero k_bias
  buffer so fused-qkv checkpoints load),
- 2D axial rotary embeddings on q/k **patch tokens only** (the CLS token
  passes through unrotated), on top of a learned absolute pos embed,
- an extra LayerNorm on the attention output before the out-proj
  (``scale_attn_inner``) and on the SwiGLU hidden before fc2
  (``scale_mlp`` — the paper's sub-LN),
- SwiGLU MLP: ``fc2(norm(silu(fc1_g(x)) * fc1_x(x)))`` with
  hidden = int(embed_dim·8/3) (timm mlp_ratio 4·2/3),
- pre-LN blocks, final LN, CLS pooling, linear head to the CLIP embed dim.

The E (enormous) variant departs from TrV: fused qkv, plain-GELU MLP
(hidden 15360), **post-norm** blocks (``x + norm(sublayer(x))``) and no
rope — the scaled EVA-01-style recipe (EVA-02-CLIP, arXiv 2303.15389).

No released-weight oracle exists in-image (timm uninstallable —
round-2 review "missing #1"), so correctness is established by invariant
tests: rope relative-position invariance/norm preservation, sub-layer
shapes, and synthetic timm-layout converter round-trips
(tests/test_eva.py).

Design: stacked-layer param pytrees under ``lax.scan`` like models/vit.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from keep_tpu.ops.nn import layer_norm, linear

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EvaConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_hidden: int = 2048  # B:2048  L:2730 (=int(1024*8/3))  E:15360
    swiglu: bool = True
    scale_mlp: bool = True  # LN over the MLP hidden (sub-LN)
    scale_attn_inner: bool = True  # LN over attn out before proj
    qkv_fused: bool = False
    rope: bool = True
    rope_temperature: float = 100.0  # timm EVA02-CLIP rope temperature
    post_norm: bool = False  # E variant: x + norm(sublayer(x))
    ln_eps: float = 1e-6
    out_dim: int = 512  # CLIP embed dim (timm num_classes head)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


# ---------------------------------------------------------------------------
# 2D axial rotary embedding
# ---------------------------------------------------------------------------


def rope_2d_angles(grid_h: int, grid_w: int, head_dim: int,
                   temperature: float = 100.0) -> Array:
    """[N, head_dim/2] rotation angles for the patch grid, axial split:
    the first head_dim/4 angle slots rotate by ROW position, the second by
    COLUMN position; each axis uses the standard rope frequency ladder
    ``temperature^(-4j/head_dim)``."""
    if head_dim % 4:
        raise ValueError(f"head_dim {head_dim} must be divisible by 4")
    bands = head_dim // 4
    inv_freq = temperature ** (-jnp.arange(bands, dtype=jnp.float32)
                               * 4.0 / head_dim)
    rows = jnp.arange(grid_h, dtype=jnp.float32)
    cols = jnp.arange(grid_w, dtype=jnp.float32)
    ang_r = rows[:, None] * inv_freq[None, :]  # [H, bands]
    ang_c = cols[:, None] * inv_freq[None, :]  # [W, bands]
    ang = jnp.concatenate(
        [
            jnp.broadcast_to(ang_r[:, None, :], (grid_h, grid_w, bands)),
            jnp.broadcast_to(ang_c[None, :, :], (grid_h, grid_w, bands)),
        ],
        axis=-1,
    )  # [H, W, head_dim/2]
    return ang.reshape(grid_h * grid_w, head_dim // 2)


def apply_rope(x: Array, angles: Array) -> Array:
    """Rotate interleaved pairs of the last dim: x [..., N, D] with angles
    [N, D/2]; pair (x[2j], x[2j+1]) rotates by angles[j]."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    cos = jnp.cos(angles)  # [N, D/2], broadcasts over leading dims
    sin = jnp.sin(angles)
    x1, x2 = x_pairs[..., 0], x_pairs[..., 1]
    out = jnp.stack(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).reshape(xf.shape)
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _attention(p: dict, x: Array, cfg: EvaConfig, angles: Array | None) -> Array:
    b, s, d = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    if cfg.qkv_fused:
        qkv = linear(p["qkv"], x)  # [B, S, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(p["q"], x)
        # no k bias — but keep the module-wide fp32 accumulation (a raw
        # bf16 jnp.dot accumulated at MXU bf16 precision, unlike q/v)
        k = jnp.dot(x, p["k"]["kernel"].astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        v = linear(p["v"], x)
    q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)  # [B, H, S, Dh]
    k = k.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    if angles is not None:
        # rotate patch tokens only; the CLS prefix passes through
        q = jnp.concatenate([q[:, :, :1], apply_rope(q[:, :, 1:], angles)], 2)
        k = jnp.concatenate([k[:, :, :1], apply_rope(k[:, :, 1:], angles)], 2)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * dh**-0.5
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    if cfg.scale_attn_inner:
        out = layer_norm(p["norm"], out, cfg.ln_eps)
    return linear(p["proj"], out)


def _mlp(p: dict, x: Array, cfg: EvaConfig) -> Array:
    if cfg.swiglu:
        gate = jax.nn.silu(linear(p["fc1_g"], x))
        hidden = gate * linear(p["fc1_x"], x)
        if cfg.scale_mlp:
            hidden = layer_norm(p["norm"], hidden, cfg.ln_eps)
        return linear(p["fc2"], hidden)
    hidden = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    return linear(p["fc2"], hidden)


def block(p: dict, x: Array, cfg: EvaConfig, angles: Array | None) -> Array:
    if cfg.post_norm:
        # E-variant sub-LN placement: x + norm(sublayer(x))
        x = x + layer_norm(p["norm1"], _attention(p["attn"], x, cfg, angles),
                           cfg.ln_eps)
        return x + layer_norm(p["norm2"], _mlp(p["mlp"], x, cfg), cfg.ln_eps)
    x = x + _attention(p["attn"], layer_norm(p["norm1"], x, cfg.ln_eps), cfg,
                       angles)
    return x + _mlp(p["mlp"], layer_norm(p["norm2"], x, cfg.ln_eps), cfg)


def forward(params: dict, x: Array, cfg: EvaConfig, *,
            dtype: jnp.dtype = jnp.float32, **_ignored) -> Array:
    """[B, H, W, 3] normalized pixels → [B, out_dim] CLS features (un-normalized;
    CLIP normalization happens in the preset closure)."""
    b, ih, iw, _ = x.shape
    ps = cfg.patch_size
    if ih % ps or iw % ps:
        raise ValueError(f"image {(ih, iw)} not a multiple of patch {ps}")
    x = x.astype(dtype)
    gh, gw = ih // ps, iw // ps

    from keep_tpu.models.vit import patchify, resample_pos_embed

    tokens = patchify(params["patch_embed"], x, ps)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = resample_pos_embed(params["pos_embed"], (gh, gw), num_prefix=1)
    tokens = tokens + pos.astype(dtype)

    angles = None
    if cfg.rope:
        angles = rope_2d_angles(gh, gw, cfg.head_dim, cfg.rope_temperature)

    def scan_body(carry, layer_params):
        return block(layer_params, carry, cfg, angles), None

    tokens, _ = jax.lax.scan(scan_body, tokens, params["blocks"])
    tokens = layer_norm(params["norm"], tokens, cfg.ln_eps)
    pooled = tokens[:, 0]
    if "head" in params:
        pooled = linear(params["head"], pooled)
    return pooled


def init(key: jax.Array, cfg: EvaConfig, dtype: jnp.dtype = jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 24))
    d, f, l = cfg.embed_dim, cfg.mlp_hidden, cfg.depth
    pdim = cfg.patch_size * cfg.patch_size * 3

    def trunc(k, shape, std=0.02):
        return (jax.random.truncated_normal(k, -2, 2, shape) * std).astype(dtype)

    def lin(k, fin, fout, layers=None, bias=True):
        shape = (fin, fout) if layers is None else (layers, fin, fout)
        out = {"kernel": (jax.random.normal(k, shape) * fin**-0.5).astype(dtype)}
        if bias:
            bshape = (fout,) if layers is None else (layers, fout)
            out["bias"] = jnp.zeros(bshape, dtype)
        return out

    def ln(shape):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    attn: dict = {"proj": lin(next(keys), d, d, layers=l)}
    if cfg.qkv_fused:
        attn["qkv"] = lin(next(keys), d, 3 * d, layers=l)
    else:
        attn["q"] = lin(next(keys), d, d, layers=l)
        attn["k"] = lin(next(keys), d, d, layers=l, bias=False)
        attn["v"] = lin(next(keys), d, d, layers=l)
    if cfg.scale_attn_inner:
        attn["norm"] = ln((l, d))

    mlp: dict = {"fc2": lin(next(keys), f, d, layers=l)}
    if cfg.swiglu:
        mlp["fc1_g"] = lin(next(keys), d, f, layers=l)
        mlp["fc1_x"] = lin(next(keys), d, f, layers=l)
        if cfg.scale_mlp:
            mlp["norm"] = ln((l, f))
    else:
        mlp["fc1"] = lin(next(keys), d, f, layers=l)

    out = {
        "patch_embed": lin(next(keys), pdim, d),
        "cls_token": trunc(next(keys), (1, 1, d)),
        "pos_embed": trunc(next(keys), (1, 1 + cfg.grid * cfg.grid, d)),
        "blocks": {"norm1": ln((l, d)), "attn": attn, "norm2": ln((l, d)),
                   "mlp": mlp},
        "norm": ln((d,)),
    }
    if cfg.out_dim and cfg.out_dim != d:
        out["head"] = lin(next(keys), d, cfg.out_dim)
    return out


# named configs for the reference's 5 EVA02 presets
# (model_configs/EVA02-*.json → timm model names)
EVA02_CONFIGS = {
    # eva02_base_patch16_clip_224
    "EVA02-B-16": EvaConfig(patch_size=16, embed_dim=768, depth=12,
                            num_heads=12, mlp_hidden=2048, out_dim=512),
    # eva02_large_patch14_clip_224 (mlp int(1024*8/3)=2730)
    "EVA02-L-14": EvaConfig(patch_size=14, embed_dim=1024, depth=24,
                            num_heads=16, mlp_hidden=2730, out_dim=768),
    "EVA02-L-14-336": EvaConfig(img_size=336, patch_size=14, embed_dim=1024,
                                depth=24, num_heads=16, mlp_hidden=2730,
                                out_dim=768),
    # eva02_enormous_patch14_clip_224: scaled EVA-01-style recipe
    "EVA02-E-14": EvaConfig(patch_size=14, embed_dim=1792, depth=64,
                            num_heads=16, mlp_hidden=15360, swiglu=False,
                            scale_mlp=False, scale_attn_inner=False,
                            qkv_fused=True, rope=False, post_norm=True,
                            out_dim=1024),
    "EVA02-E-14-plus": EvaConfig(patch_size=14, embed_dim=1792, depth=64,
                                 num_heads=16, mlp_hidden=15360, swiglu=False,
                                 scale_mlp=False, scale_attn_inner=False,
                                 qkv_fused=True, rope=False, post_norm=True,
                                 out_dim=1024),
}
