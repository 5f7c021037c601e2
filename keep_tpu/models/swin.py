"""Swin Transformer (tiny) with an optional ConvStem — the ``ctranspath``
image tower family (reference model/ctran.py:46-51, which requires an
external ``timm_ctp`` package even in the reference; this is a native
implementation of the documented architecture).

Swin-T: 4 stages, depths (2,2,6,2), heads (3,6,12,24), dims 96→768,
7×7 window attention with relative position bias, shifted windows on
alternate blocks, 2×2 patch merging between stages, final LN + global
average pool. ConvStem (ctranspath ctran.py:23-31) replaces the 4×4
linear patch embed with conv3×3(3→d/8, s2)+BN+ReLU →
conv3×3(d/8→d/4, s2)+BN+ReLU → conv1×1(d/4→d, bias), reaching the same
1/4 resolution. Shifted windows follow timm's rule: disabled once the
window covers the whole feature map (stage 4 at 224²).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.ops.nn import layer_norm, linear, mlp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5
    conv_stem: bool = True  # ctranspath variant
    num_features_mult: int = 8  # final dim = embed_dim * 8

    @property
    def num_features(self) -> int:
        return self.embed_dim * self.num_features_mult


def window_partition(x: Array, w: int) -> Array:
    """[B, H, W, C] → [B·nH·nW, w, w, C]."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)


def window_reverse(windows: Array, w: int, h: int, ww: int) -> Array:
    b = windows.shape[0] // (h // w * ww // w)
    x = windows.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


@functools.lru_cache(maxsize=4)
def relative_position_index(w: int) -> np.ndarray:
    """[w², w²] indices into the (2w−1)² relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=16)
def shift_attn_mask(h: int, ww: int, w: int, shift: int) -> np.ndarray:
    """[nWindows, w², w²] additive mask (−1e9 across shifted-window seams)."""
    img = np.zeros((1, h, ww, 1), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    wins = np.asarray(window_partition(jnp.asarray(img), w)).reshape(-1, w * w)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


def window_attention(p: dict, x: Array, heads: int, w: int,
                     mask: Array | None) -> Array:
    """x: [nW, w², C]; relative position bias per head from the table."""
    nw, n, c = x.shape
    dh = c // heads
    qkv = linear(p["qkv"], x).reshape(nw, n, 3, heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scores = jnp.einsum("whqd,whkd->whqk", q, k,
                        preferred_element_type=jnp.float32) * dh**-0.5
    idx = jnp.asarray(relative_position_index(w).reshape(-1))
    bias = jnp.take(p["rel_bias"], idx, axis=0).reshape(n, n, heads)
    scores = scores + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nm = mask.shape[0]
        scores = scores.reshape(nw // nm, nm, heads, n, n) + mask[None, :, None]
        scores = scores.reshape(nw, heads, n, n)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("whqk,whkd->whqd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return linear(p["proj"], out.transpose(0, 2, 1, 3).reshape(nw, n, c))


def swin_block(p: dict, x: Array, cfg: SwinConfig, heads: int, shift: int) -> Array:
    b, h, ww, c = x.shape
    w = cfg.window
    y = layer_norm(p["norm1"], x, cfg.ln_eps)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(shift_attn_mask(h, ww, w, shift))
    else:
        mask = None
    wins = window_partition(y, w).reshape(-1, w * w, c)
    attn = window_attention(p["attn"], wins, heads, w, mask)
    y = window_reverse(attn.reshape(-1, w, w, c), w, h, ww)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = x + y
    y = mlp(p["mlp"], layer_norm(p["norm2"], x, cfg.ln_eps))
    return x + y


def patch_merge(p: dict, x: Array, eps: float) -> Array:
    """2×2 neighborhood concat → LN → linear 4C→2C (Swin v1 downsampling)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, h // 2, w // 2, 4 * c)
    x = layer_norm(p["norm"], x, eps)
    return linear(p["reduction"], x)


def forward(params: dict, pixels: Array, cfg: SwinConfig,
            *, dtype=jnp.float32) -> Array:
    """[B, H, W, 3] → [B, num_features] (final LN + global average pool)."""
    x = pixels.astype(dtype)
    if cfg.conv_stem:
        from keep_tpu.models.resnet import batch_norm, conv

        # ctranspath ConvStem (ctran.py:23-31): conv3x3(3→d/8, s2)+BN+ReLU,
        # conv3x3(d/8→d/4, s2)+BN+ReLU, conv1x1(d/4→d, bias)
        s = params["stem"]
        x = jax.nn.relu(batch_norm(s["bn1"], conv(s["conv1"], x, stride=2, padding=1), 1e-5))
        x = jax.nn.relu(batch_norm(s["bn2"], conv(s["conv2"], x, stride=2, padding=1), 1e-5))
        x = conv(s["conv3"], x, stride=1, padding=0) \
            + s["conv3"]["bias"].astype(x.dtype)
    else:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 4, 4, w // 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 4, w // 4, 48)
        x = linear(params["patch_embed"], x)
    x = layer_norm(params["embed_norm"], x, cfg.ln_eps)

    for si, depth in enumerate(cfg.depths):
        stage = params[f"stage{si}"]
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else cfg.window // 2
            if min(x.shape[1], x.shape[2]) <= cfg.window:
                # timm rule: once the window covers the whole feature map
                # (every 224 preset's 7x7 stage 4), shifting is a no-op
                # semantically and MUST be disabled — rolling the single
                # global window and applying the seam mask would block
                # attention between wrap regions and scramble the relative
                # position bias, diverging from converted checkpoints
                shift = 0
            x = swin_block(stage["blocks"][bi], x, cfg, cfg.heads[si], shift)
        if si < len(cfg.depths) - 1:
            x = patch_merge(stage["merge"], x, cfg.ln_eps)

    x = layer_norm(params["norm"], x, cfg.ln_eps)
    return x.mean(axis=(1, 2))


def init(key: jax.Array, cfg: SwinConfig, dtype=jnp.float32) -> dict:
    kiter = iter(jax.random.split(key, 128))

    def lin(fi, fo):
        # timm's bias-free layers (the merge reduction) still carry a zero
        # bias here — linear() consumes it and the converter writes zeros
        return {"kernel": (jax.random.normal(next(kiter), (fi, fo)) * fi**-0.5).astype(dtype),
                "bias": jnp.zeros((fo,), dtype)}

    ln = lambda c: {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def block(c, heads):
        f = int(c * cfg.mlp_ratio)
        return {
            "norm1": ln(c),
            "attn": {
                "qkv": lin(c, 3 * c),
                "proj": lin(c, c),
                "rel_bias": (jax.random.normal(
                    next(kiter), ((2 * cfg.window - 1) ** 2, heads)) * 0.02).astype(dtype),
            },
            "norm2": ln(c),
            "mlp": {"fc1": lin(c, f), "fc2": lin(f, c)},
        }

    d = cfg.embed_dim
    params = {"embed_norm": ln(d)}
    if cfg.conv_stem:
        # ctranspath layout (ctran.py:23-31): d/8 → d/4 → 1×1 to d
        c1, c2 = d // 8, d // 4
        bn = lambda n: {"scale": jnp.ones(n, dtype), "bias": jnp.zeros(n, dtype),
                        "mean": jnp.zeros(n, dtype), "var": jnp.ones(n, dtype)}
        params["stem"] = {
            "conv1": {"kernel": (jax.random.normal(next(kiter), (3, 3, 3, c1)) * 0.1).astype(dtype)},
            "bn1": bn(c1),
            "conv2": {"kernel": (jax.random.normal(next(kiter), (3, 3, c1, c2)) * 0.1).astype(dtype)},
            "bn2": bn(c2),
            "conv3": {"kernel": (jax.random.normal(next(kiter), (1, 1, c2, d)) * 0.1).astype(dtype),
                      "bias": jnp.zeros((d,), dtype)},
        }
    else:
        params["patch_embed"] = lin(48, d)

    c = d
    for si, depth in enumerate(cfg.depths):
        stage = {"blocks": [block(c, cfg.heads[si]) for _ in range(depth)]}
        if si < len(cfg.depths) - 1:
            stage["merge"] = {"norm": ln(4 * c), "reduction": lin(4 * c, 2 * c)}
            c *= 2
        params[f"stage{si}"] = stage
    params["norm"] = ln(c)
    return params


def convert_timm_swin(sd, cfg: SwinConfig) -> dict:
    """timm ``swin_*_patch4_window7`` state dict → pytree (linear patch-embed
    variant; ctranspath stems come from its own checkpoint layout).

    timm keys: patch_embed.proj (4×4 conv), layers.S.blocks.B.{norm1,
    attn.{qkv, proj, relative_position_bias_table}, norm2, mlp.fc1/fc2},
    layers.S.downsample.{norm, reduction}, norm.
    """
    g = lambda k: (sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach")
                   else np.asarray(sd[k]))

    def lin(k, bias=True):
        out = {"kernel": g(k + ".weight").T}
        out["bias"] = g(k + ".bias") if bias else np.zeros(
            out["kernel"].shape[-1], np.float32)
        return out

    ln = lambda k: {"scale": g(k + ".weight"), "bias": g(k + ".bias")}

    conv = g("patch_embed.proj.weight")  # [D, 3, 4, 4]
    d = conv.shape[0]
    # our linear patch embed flattens (ph, pw, c); match that order
    kernel = conv.transpose(2, 3, 1, 0).reshape(-1, d)
    params = {
        "patch_embed": {"kernel": kernel, "bias": g("patch_embed.proj.bias")},
        "embed_norm": ln("patch_embed.norm"),
        "norm": ln("norm"),
    }
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            pre = f"layers.{si}.blocks.{bi}"
            blocks.append({
                "norm1": ln(pre + ".norm1"),
                "attn": {
                    "qkv": lin(pre + ".attn.qkv"),
                    "proj": lin(pre + ".attn.proj"),
                    "rel_bias": g(pre + ".attn.relative_position_bias_table"),
                },
                "norm2": ln(pre + ".norm2"),
                "mlp": {"fc1": lin(pre + ".mlp.fc1"), "fc2": lin(pre + ".mlp.fc2")},
            })
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["merge"] = {
                "norm": ln(f"layers.{si}.downsample.norm"),
                "reduction": lin(f"layers.{si}.downsample.reduction", bias=False),
            }
        params[f"stage{si}"] = stage
    return params
