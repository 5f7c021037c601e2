"""ViT with MLP relative-position attention bias (timm ``vit_relpos_*``).

The reference's ``vit_relpos_medium_patch16_cls_224`` preset delegates to
external timm (model_configs/vit_relpos_medium_patch16_cls_224.json,
timm_model.py adapter). timm is uninstallable in-image, so this is a
from-public-spec implementation of the timm ``VisionTransformerRelPos``
family, 'cls' variant:

- NO absolute position embedding; instead every block's attention adds a
  per-head bias b[h, i, j] that depends only on the RELATIVE grid offset
  between patch tokens i and j,
- the bias is produced by a small per-block MLP (2 → hidden → heads, ReLU —
  timm RelPosMlp uses ``act_layer=nn.ReLU``) over log-scaled relative
  coordinates (mode='cr': ``sign(Δ)·log1p(|Δ|)``),
- a learned class token participates in attention with ZERO relative bias
  (timm pads the bias with zeros for prefix tokens),
- otherwise a plain pre-LN ViT (exact-GELU MLP, CLS pooling, final LN).

No released-weight oracle exists in-image; invariants tested instead:
translation invariance of the bias (pairs at equal offsets share bias),
zero bias on the CLS row/column, converter round-trip over a synthetic
timm-layout state dict (tests/test_eva.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from keep_tpu.ops.nn import gelu, layer_norm, linear

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTRelPosConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    # timm vit_relpos_medium_patch16_cls_224 sets rel_pos_dim=256 (the
    # RelPosMlp hidden width); real-checkpoint shapes depend on this
    rel_pos_hidden: int = 256
    ln_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


def rel_log_coords(grid_h: int, grid_w: int) -> Array:
    """[(2H-1)·(2W-1), 2] log-scaled relative offsets (timm 'cr' mode:
    sign(Δ)·log1p(|Δ|)) over every possible (Δrow, Δcol)."""
    dr = jnp.arange(-(grid_h - 1), grid_h, dtype=jnp.float32)
    dc = jnp.arange(-(grid_w - 1), grid_w, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(dr, dc, indexing="ij"), axis=-1)
    coords = grid.reshape(-1, 2)
    return jnp.sign(coords) * jnp.log1p(jnp.abs(coords))


def rel_index(grid_h: int, grid_w: int) -> Array:
    """[N, N] index into the (2H-1)(2W-1) relative-offset table for each
    (query patch, key patch) pair."""
    pos = jnp.stack(
        jnp.meshgrid(jnp.arange(grid_h), jnp.arange(grid_w), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    rel = pos[:, None, :] - pos[None, :, :]  # [N, N, 2] in [-(H-1), H-1]
    rel = rel + jnp.asarray([grid_h - 1, grid_w - 1])
    return rel[..., 0] * (2 * grid_w - 1) + rel[..., 1]


def rel_pos_bias(p: dict, grid_h: int, grid_w: int, num_heads: int) -> Array:
    """Per-head attention bias [H, 1+N, 1+N]: MLP over the unique relative
    offsets, gathered per pair; CLS row/column zero."""
    # ReLU, not GELU: timm RelPosMlp builds Mlp(..., act_layer=nn.ReLU)
    table = jax.nn.relu(linear(p["fc1"], rel_log_coords(grid_h, grid_w)))
    table = linear(p["fc2"], table)  # [(2H-1)(2W-1), heads]
    idx = rel_index(grid_h, grid_w)
    bias = table[idx]  # [N, N, heads]
    bias = bias.transpose(2, 0, 1)  # [heads, N, N]
    n = grid_h * grid_w
    out = jnp.zeros((num_heads, 1 + n, 1 + n), bias.dtype)
    return out.at[:, 1:, 1:].set(bias)


def block(p: dict, x: Array, cfg: ViTRelPosConfig, *,
          gelu_approx: bool = False) -> Array:
    b, s, d = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    y = layer_norm(p["norm1"], x, cfg.ln_eps)
    qkv = linear(p["attn"]["qkv"], y).reshape(b, s, 3, h, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * dh**-0.5
    scores = scores + rel_pos_bias(p["attn"]["rel_pos"], cfg.grid, cfg.grid,
                                   h).astype(scores.dtype)[None]
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + linear(p["attn"]["proj"], out)
    y = layer_norm(p["norm2"], x, cfg.ln_eps)
    y = linear(p["mlp"]["fc2"],
               gelu(linear(p["mlp"]["fc1"], y), approximate=gelu_approx))
    return x + y


def forward(params: dict, x: Array, cfg: ViTRelPosConfig, *,
            dtype: jnp.dtype = jnp.float32, remat: bool = False,
            gelu_approx: bool = False, use_flash: bool = False) -> Array:
    """[B, H, W, 3] → [B, embed_dim] CLS features. The image size is fixed to
    the config grid (the relative-offset table is grid-shaped; timm relpos
    models are likewise fixed-size).

    ``use_flash`` is accepted for factory-signature parity but has no fused
    path here: the relative-position bias is a full per-head [H, S, S] score
    bias, which the flash kernel does not support (it takes key masks only —
    kernels/flash_attention.flash_attention docstring); attention runs the
    XLA path regardless."""
    b, ih, iw, _ = x.shape
    if (ih, iw) != (cfg.img_size, cfg.img_size):
        raise ValueError(
            f"relpos ViT is fixed at {cfg.img_size}px (got {(ih, iw)})")
    x = x.astype(dtype)

    from keep_tpu.models.vit import patchify

    tokens = patchify(params["patch_embed"], x, cfg.patch_size)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)

    block_fn = functools.partial(block, cfg=cfg, gelu_approx=gelu_approx)
    if remat:
        block_fn = jax.checkpoint(block_fn)

    def scan_body(carry, layer_params):
        # bias recomputed per layer from that layer's MLP (cheap: R=(2g-1)²
        # rows through a 2→hidden→heads MLP, traced once under scan)
        return block_fn(layer_params, carry), None

    tokens, _ = jax.lax.scan(scan_body, tokens, params["blocks"])
    tokens = layer_norm(params["norm"], tokens, cfg.ln_eps)
    return tokens[:, 0]


def init(key: jax.Array, cfg: ViTRelPosConfig,
         dtype: jnp.dtype = jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 12))
    d, f, l = cfg.embed_dim, cfg.mlp_hidden, cfg.depth
    pdim = cfg.patch_size * cfg.patch_size * 3

    def lin(k, fin, fout, layers=None):
        shape = (fin, fout) if layers is None else (layers, fin, fout)
        bshape = (fout,) if layers is None else (layers, fout)
        return {"kernel": (jax.random.normal(k, shape) * fin**-0.5).astype(dtype),
                "bias": jnp.zeros(bshape, dtype)}

    def ln(shape):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "patch_embed": lin(next(keys), pdim, d),
        "cls_token": (jax.random.truncated_normal(next(keys), -2, 2, (1, 1, d))
                      * 0.02).astype(dtype),
        "blocks": {
            "norm1": ln((l, d)),
            "attn": {
                "qkv": lin(next(keys), d, 3 * d, layers=l),
                "proj": lin(next(keys), d, d, layers=l),
                "rel_pos": {
                    "fc1": lin(next(keys), 2, cfg.rel_pos_hidden, layers=l),
                    "fc2": lin(next(keys), cfg.rel_pos_hidden, cfg.num_heads,
                               layers=l),
                },
            },
            "norm2": ln((l, d)),
            "mlp": {
                "fc1": lin(next(keys), d, f, layers=l),
                "fc2": lin(next(keys), f, d, layers=l),
            },
        },
        "norm": ln((d,)),
    }
