"""ViT-L/16 image encoder, TPU-native.

Matches timm ``vit_large_patch16_224`` semantics as instantiated by the
reference (quick_start/keep_inference.py:32-40: ``init_values=1e-5``,
``num_classes=0``, ``dynamic_img_size=True``):

- patchify conv (implemented as reshape + one big matmul → MXU-friendly),
- CLS token + learned pos embed (bicubic resample for non-224 sizes,
  mirroring the reference's pos-embed interpolation,
  training/path_open_clip/model/model.py:563-594),
- pre-LN blocks with LayerScale, exact-GELU MLP,
- final LayerNorm then CLS pooling.

Design: pure functions over a parameter pytree. Per-block params are stacked
along a leading layer axis and the 24 blocks run under ``jax.lax.scan`` —
one traced block, fast compiles, remat-friendly.

Param pytree layout (D=embed_dim, F=mlp_dim, L=depth, P=patch_size):
  patch_embed: {kernel [P*P*3, D], bias [D]}   # flatten order (ph, pw, c)
  cls_token:   [1, 1, D]
  pos_embed:   [1, 1+N, D]
  blocks:      {norm1:{scale,bias [L,D]}, attn:{qkv:{kernel [L,D,3D], bias [L,3D]},
               proj:{kernel [L,D,D], bias [L,D]}}, ls1 [L,D],
               norm2:{...}, mlp:{fc1:{kernel [L,D,F], bias [L,F]},
               fc2:{kernel [L,F,D], bias [L,D]}}, ls2 [L,D]}
  norm:        {scale [D], bias [D]}
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from keep_tpu.configs import ViTConfig
from keep_tpu.ops.nn import layer_norm, linear, mha_attention, mlp

Array = jax.Array


def patchify(p: dict, x: Array, patch_size: int) -> Array:
    """[B, H, W, 3] → [B, H/P * W/P, D] via reshape + matmul (equivalent to the
    stride-P conv patch embed, but expressed as a single MXU matmul)."""
    b, h, w, c = x.shape
    gh, gw = h // patch_size, w // patch_size
    x = x.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, c]
    x = x.reshape(b, gh * gw, patch_size * patch_size * c)
    return linear(p, x)


def resample_pos_embed(
    pos_embed: Array, grid_hw: tuple[int, int], num_prefix: int
) -> Array:
    """Bicubic pos-embed resample for dynamic image sizes (timm
    ``resample_abs_pos_embed`` semantics; reference model.py:563-594).

    Implemented as two separable weight matmuls with TORCH's antialiased
    bicubic kernel (a=-0.75, half-pixel centers) — ``jax.image.resize``'s
    Keys a=-0.5 kernel deviates from the reference's
    ``F.interpolate(mode='bicubic', antialias=True)`` on every resampled
    position (oracle-tested vs real torch in tests/test_vit_parity.py)."""
    from keep_tpu.ops.preprocess import torch_resize_weights

    n = pos_embed.shape[1] - num_prefix
    old = int(round(float(n) ** 0.5))
    gh, gw = grid_hw
    if (old, old) == (gh, gw):
        return pos_embed
    prefix = pos_embed[:, :num_prefix]
    grid = pos_embed[0, num_prefix:].reshape(old, old, -1).astype(jnp.float32)
    wh = jnp.asarray(torch_resize_weights(old, gh))
    ww = jnp.asarray(torch_resize_weights(old, gw))
    grid = jnp.tensordot(wh, grid, axes=[[1], [0]])      # [gh, old, D]
    grid = jnp.einsum("co,hod->hcd", ww, grid)           # [gh, gw, D]
    grid = grid.reshape(1, gh * gw, -1).astype(pos_embed.dtype)
    return jnp.concatenate([prefix, grid], axis=1)


def patch_dropout(
    tokens: Array, key: jax.Array, keep_rate: float, num_prefix: int = 1
) -> Array:
    """Training-time patch dropout (reference transformer.py:47-84): keep a
    random ``keep_rate`` subset of patch tokens per sample, prefix tokens
    always kept. Returns [B, num_prefix + max(1, floor(keep_rate·N)), D]
    (floor — the reference's ``int()``). Calling ``forward`` with
    ``patch_dropout_rate > 0`` but no ``dropout_key`` is EVAL mode: all
    tokens kept (the reference disables PatchDropout outside training)."""
    if keep_rate >= 1.0:
        return tokens
    b, s, d = tokens.shape
    n = s - num_prefix
    num_keep = max(1, int(n * keep_rate))
    noise = jax.random.uniform(key, (b, n))
    keep_idx = jnp.argsort(noise, axis=-1)[:, :num_keep] + num_prefix
    prefix = tokens[:, :num_prefix]
    kept = jnp.take_along_axis(tokens, keep_idx[..., None], axis=1)
    return jnp.concatenate([prefix, kept], axis=1)


def block(p: dict, x: Array, cfg: ViTConfig, *, use_flash: bool,
          gelu_approx: bool = False, fuse_ln: bool = False,
          collect_ln_stats: bool = False) -> Array:
    """``collect_ln_stats=True`` (calibration only — quant.smooth_vit) also
    returns per-channel abs-max of the two LN outputs, i.e. the exact inputs
    the int8 path quantizes per token (qkv's and fc1's)."""
    b, s, d = x.shape
    h, dh = cfg.num_heads, cfg.head_dim

    quantized = "kernel_q" in p["attn"]["qkv"]
    if collect_ln_stats and (fuse_ln or quantized):
        raise ValueError("LN-stats calibration needs the unfused fp path")
    if (
        quantized and use_flash and gelu_approx
        and cfg.act == "gelu"
        and "ls1" not in p
        and "kernel_q" in p["attn"]["proj"]
        and "kernel_q" in p["mlp"]["fc1"] and "kernel_q" in p["mlp"]["fc2"]
    ):
        # int8 megakernel path (LayerScale pre-folded — KEEPModel.quantize):
        # whole attention sub-block in one kernel (LN → int8 qkv → MHA →
        # int8 proj → +residual), then the MLP pair with fused LN+residual —
        # each layer reads/writes the [B, S, D] stream exactly twice
        from keep_tpu.kernels.qblock import quantized_attention_block
        from keep_tpu.kernels.qmlp import quantized_mlp_bsd

        x = quantized_attention_block(
            x, p["norm1"], p["attn"]["qkv"], p["attn"]["proj"],
            num_heads=h, eps=cfg.ln_eps,
        )
        m = p["mlp"]
        return quantized_mlp_bsd(
            x,
            m["fc1"]["kernel_q"], m["fc1"]["scale"], m["fc1"]["bias"],
            m["fc2"]["kernel_q"], m["fc2"]["scale"], m["fc2"]["bias"],
            out_dtype=x.dtype,
            ln_scale=p["norm2"]["scale"], ln_bias=p["norm2"]["bias"],
            eps=cfg.ln_eps, residual=True,
        )
    if fuse_ln and use_flash and not quantized and cfg.act == "gelu":
        # inference fast path: LN computed in-kernel, feeding the MXU
        # directly (no materialized normalized activations)
        from keep_tpu.kernels.flash_attention import attention_qkv_slab
        from keep_tpu.kernels.ln_matmul import ln_matmul

        slab = ln_matmul(
            x.reshape(b * s, d), p["norm1"]["scale"], p["norm1"]["bias"],
            p["attn"]["qkv"]["kernel"].astype(x.dtype),
            p["attn"]["qkv"]["bias"], eps=cfg.ln_eps, out_dtype=x.dtype,
        ).reshape(b, s, 3 * d)
        attn = attention_qkv_slab(slab, num_heads=h)
    elif use_flash:
        from keep_tpu.kernels.flash_attention import attention_qkv_slab

        # one fused qkv dot; the kernel lane-slices heads from the slab —
        # no transposes, no padding, slab DMA'd once per layer
        ln1_out = layer_norm(p["norm1"], x, cfg.ln_eps)
        attn = attention_qkv_slab(
            linear(p["attn"]["qkv"], ln1_out), num_heads=h)
    else:
        ln1_out = layer_norm(p["norm1"], x, cfg.ln_eps)
        qkv = linear(p["attn"]["qkv"], ln1_out)  # [B, S, 3D]
        qkv = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
        attn = mha_attention(qkv[0], qkv[1], qkv[2], use_flash=False)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    attn = linear(p["attn"]["proj"], attn)
    # param presence decides (fold_layerscale removes the gammas at inference)
    if "ls1" in p:
        attn = attn * p["ls1"].astype(attn.dtype)
    x = x + attn

    if (fuse_ln and use_flash and "kernel_q" not in p["mlp"]["fc1"]
            and cfg.act == "gelu"):
        from keep_tpu.kernels.ln_matmul import ln_matmul
        from keep_tpu.ops.nn import gelu as _gelu

        hdn = ln_matmul(
            x.reshape(b * s, d), p["norm2"]["scale"], p["norm2"]["bias"],
            p["mlp"]["fc1"]["kernel"].astype(x.dtype), p["mlp"]["fc1"]["bias"],
            eps=cfg.ln_eps, out_dtype=x.dtype,
        )
        hdn = _gelu(hdn, approximate=gelu_approx)
        y = linear(p["mlp"]["fc2"], hdn).reshape(b, s, d)
    else:
        y2 = layer_norm(p["norm2"], x, cfg.ln_eps)
        y = mlp(p["mlp"], y2, gelu_approx=gelu_approx, act=cfg.act)
    if "ls2" in p:
        y = y * p["ls2"].astype(y.dtype)
    out = x + y
    if collect_ln_stats:
        stats = {
            "qkv": jnp.max(jnp.abs(ln1_out.astype(jnp.float32)), axis=(0, 1)),
            "fc1": jnp.max(jnp.abs(y2.astype(jnp.float32)), axis=(0, 1)),
        }
        return out, stats
    return out


def forward(
    params: dict,
    x: Array,
    cfg: ViTConfig,
    *,
    dtype: jnp.dtype = jnp.float32,
    use_flash: bool = False,
    remat: bool = False,
    gelu_approx: bool = False,
    fuse_ln: bool = False,
    patch_dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    ln_stats: bool = False,
    act_sharding=None,
) -> Array:
    """Image encoder forward: [B, H, W, 3] (normalized pixels) → [B, D] CLS features.

    ``ln_stats=True`` additionally returns ``{"qkv": [L, D], "fc1": [L, D]}``
    per-layer per-channel abs-max of the LN outputs feeding qkv/fc1 — the
    calibration pass for ``quant.smooth_vit``.

    ``act_sharding`` (a NamedSharding for the [B, S, D] stream, e.g.
    ``parallel.sp.seq_sharding``) pins the residual stream at every block
    boundary — Megatron-style sequence parallelism via GSPMD constraints;
    mathematically an identity."""
    b, h, w, _ = x.shape
    ps = cfg.patch_size
    if h % ps or w % ps:
        raise ValueError(f"image size {(h, w)} not a multiple of patch_size {ps}")
    if cfg.num_prefix_tokens > 1:
        # registers are not implemented: forward concatenates ONE cls token
        # while pos_embed/pooling would size for more — a silent mismatch
        raise ValueError(
            f"num_prefix_tokens={cfg.num_prefix_tokens} unsupported (0 = gap "
            f"ViT, 1 = CLS); register tokens are not implemented")

    x = x.astype(dtype)
    tokens = patchify(params["patch_embed"], x, ps)
    if "cls_token" in params:  # absent for gap ViTs (num_prefix_tokens=0)
        cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                               (b, 1, cfg.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = resample_pos_embed(
        params["pos_embed"], (h // ps, w // ps), cfg.num_prefix_tokens
    )
    tokens = tokens + pos.astype(dtype)

    if "ln_pre" in params:  # OpenAI-CLIP ViT variant (pre-transformer LN)
        tokens = layer_norm(params["ln_pre"], tokens, cfg.ln_eps)

    if patch_dropout_rate > 0.0 and dropout_key is not None:
        tokens = patch_dropout(
            tokens, dropout_key, 1.0 - patch_dropout_rate, cfg.num_prefix_tokens
        )

    block_fn = functools.partial(block, cfg=cfg, use_flash=use_flash,
                                 gelu_approx=gelu_approx, fuse_ln=fuse_ln,
                                 collect_ln_stats=ln_stats)
    if remat:
        block_fn = jax.checkpoint(block_fn)

    if act_sharding is not None:
        tokens = jax.lax.with_sharding_constraint(tokens, act_sharding)

    def scan_body(carry, layer_params):
        out = block_fn(layer_params, carry)
        out, extra = (out[0], out[1]) if ln_stats else (out, None)
        if act_sharding is not None:
            out = jax.lax.with_sharding_constraint(out, act_sharding)
        return out, extra

    tokens, stats = jax.lax.scan(scan_body, tokens, params["blocks"])
    if not cfg.fc_norm:
        tokens = layer_norm(params["norm"], tokens, cfg.ln_eps)

    if cfg.pool == "token":
        pooled = tokens[:, 0]
    elif cfg.pool == "avg":
        pooled = jnp.mean(tokens[:, cfg.num_prefix_tokens :], axis=1)
    else:
        return (tokens, stats) if ln_stats else tokens
    if cfg.fc_norm:  # timm gap-ViT order: pool first, then LN (fc_norm)
        pooled = layer_norm(params["norm"], pooled, cfg.ln_eps)
    return (pooled, stats) if ln_stats else pooled


def init(key: jax.Array, cfg: ViTConfig, dtype: jnp.dtype = jnp.float32) -> dict:
    """Random init mirroring timm's ViT init (trunc-normal .02 pos/cls, xavier-ish
    linears are fine for from-scratch training; exactness only matters for parity
    when *converting* weights, not initializing)."""
    keys = iter(jax.random.split(key, 16))
    d, f, l = cfg.embed_dim, cfg.mlp_dim, cfg.depth
    pdim = cfg.patch_size * cfg.patch_size * 3

    def trunc(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2, 2, shape) * std).astype(dtype)

    def lin(key, fan_in, fan_out, layers=None):
        shape = (fan_in, fan_out) if layers is None else (layers, fan_in, fan_out)
        bshape = (fan_out,) if layers is None else (layers, fan_out)
        std = fan_in**-0.5
        return {
            "kernel": (jax.random.normal(key, shape) * std).astype(dtype),
            "bias": jnp.zeros(bshape, dtype),
        }

    def ln_params(shape):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    out = {
        "patch_embed": lin(next(keys), pdim, d),
        "pos_embed": trunc(
            next(keys), (1, cfg.num_prefix_tokens + cfg.num_patches, d)),
        "blocks": {
            "norm1": ln_params((l, d)),
            "attn": {
                "qkv": lin(next(keys), d, 3 * d, layers=l),
                "proj": lin(next(keys), d, d, layers=l),
            },
            "norm2": ln_params((l, d)),
            "mlp": {
                "fc1": lin(next(keys), d, f, layers=l),
                "fc2": lin(next(keys), f, d, layers=l),
            },
        },
        "norm": ln_params((d,)),
    }
    if cfg.layerscale_init is not None:
        # LayerScale params exist only when the arch has them (block()
        # applies them by presence; torch_loader emits them conditionally
        # too — an unconditional ls1/ls2 would both change the
        # layerscale_init=None architectures and make init() pytrees
        # structurally incompatible with converted checkpoints)
        out["blocks"]["ls1"] = jnp.full((l, d), cfg.layerscale_init, dtype)
        out["blocks"]["ls2"] = jnp.full((l, d), cfg.layerscale_init, dtype)
    if cfg.num_prefix_tokens >= 1:
        out["cls_token"] = trunc(next(keys), (1, 1, d))
    return out


def fold_layerscale(params: dict) -> dict:
    """Inference-time transform: fold LayerScale gammas into the proj/fc2
    kernels+biases (γ·(Wx+b) = (γ⊙W)x + γ⊙b) — exact, removes two
    elementwise passes per block."""
    b = params["blocks"]
    if "ls1" not in b:
        return params
    out = dict(params)
    blocks = {k: v for k, v in b.items() if k not in ("ls1", "ls2")}
    ls1 = b["ls1"][:, None, :]  # [L, 1, D]
    ls2 = b["ls2"][:, None, :]
    blocks["attn"] = dict(b["attn"])
    blocks["attn"]["proj"] = {
        "kernel": b["attn"]["proj"]["kernel"] * ls1,
        "bias": b["attn"]["proj"]["bias"] * b["ls1"],
    }
    blocks["mlp"] = dict(b["mlp"])
    blocks["mlp"]["fc2"] = {
        "kernel": b["mlp"]["fc2"]["kernel"] * ls2,
        "bias": b["mlp"]["fc2"]["bias"] * b["ls2"],
    }
    out["blocks"] = blocks
    return out
