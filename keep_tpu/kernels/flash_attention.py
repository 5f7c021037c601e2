"""Fused multi-head attention Pallas kernels for short sequences.

The encoder workload (ViT-L: S=197, BERT: S=256 — reference
quick_start/keep_inference.py towers) has tiny sequences but huge batch×head
counts. XLA's attention materializes the fp32 score tensor in HBM
(B·H·S² ≈ 600 MB/layer at B=256) and the [B,S,H,D]→[B,H,S,D] transposes
copy another ~225 MB/layer. This kernel computes ``softmax(q kᵀ·scale +
bias) v`` for a GROUP of heads per program with scores living only in VMEM,
and consumes q/k/v in their natural post-projection layout ``[B, S, H*Dh]``
(heads = 64-lane slices) — no transposes, no padding copies: Mosaic masks
non-aligned S internally.

Not a streaming (online-softmax) flash variant: S ≤ a few hundred means the
whole [S, S] score block fits VMEM, so the single-pass softmax is exact and
cheaper. For long sequences a blocked variant would be needed — out of scope
for the KEEP encoder family.

Entry points:
- ``attention_qkv_slab(qkv, key_bias)``     — fastest path (the models' one):
  consumes the UNSPLIT [B, S, 3·H·Dh] qkv-projection output, differentiable.
- ``attention_qkv_heads(q, k, v, key_bias)`` — split q/k/v, [B, S, H*Dh].
- ``flash_attention(q, k, v, bias)``        — generic [B, H, S, Dh] API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keep_tpu.kernels._cost import VMEM_LIMIT_BYTES, maybe_cost_estimate

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _sdpa(q, k, v, bias_row, scale):
    """softmax(q kᵀ·scale + bias_row) v on one head, all in VMEM, fp32 softmax."""
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    if bias_row is not None:
        s = s + bias_row
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    return jnp.dot(p, v, preferred_element_type=jnp.float32).astype(v.dtype)


def _make_kernel(scale: float, group: int, dh: int, with_bias: bool):
    def kernel(*refs):
        if with_bias:
            q_ref, k_ref, v_ref, bias_ref, o_ref = refs
            # bias is passed whole ([B, S] is tiny) and indexed by program —
            # a (1, S) block would violate the (8, 128) tile rule for
            # non-aligned S (same pattern as the slab/postln kernels)
            bias_row = bias_ref[pl.program_id(0)][None, :]  # [1, S]
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            bias_row = None
        qs, ks, vs = q_ref[0], k_ref[0], v_ref[0]  # [S, G*Dh]
        for g in range(group):  # static unroll over the head group
            q = qs[:, g * dh : (g + 1) * dh]
            k = ks[:, g * dh : (g + 1) * dh]
            v = vs[:, g * dh : (g + 1) * dh]
            o_ref[0, :, g * dh : (g + 1) * dh] = _sdpa(q, k, v, bias_row, scale)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "group"))
def attention_qkv_heads(
    q: Array,
    k: Array,
    v: Array,
    key_bias: Array | None = None,
    *,
    num_heads: int,
    group: int = 8,
) -> Array:
    """q/k/v [B, S, H*Dh] (head h occupies lanes [h·Dh, (h+1)·Dh)) → [B, S, H*Dh].

    ``key_bias``: optional [B, S] additive mask on key positions (0 valid,
    −1e9 masked) — the BERT padding mask.
    """
    b, s, hd = q.shape
    h = num_heads
    if hd % h:
        raise ValueError(f"lane dim {hd} is not divisible by num_heads={h}")
    dh = hd // h
    while h % group:
        group //= 2
    scale = dh**-0.5
    grid = (b, h // group)
    spec = pl.BlockSpec((1, s, group * dh), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)

    args = [q, k, v]
    in_specs = [spec, spec, spec]
    if key_bias is not None:
        in_specs.append(
            pl.BlockSpec((b, s), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(key_bias.astype(jnp.float32))

    return pl.pallas_call(
        _make_kernel(scale, group, dh, key_bias is not None),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec,
        cost_estimate=maybe_cost_estimate(
            flops=4 * b * h * s * s * dh,
            bytes_accessed=4 * b * s * hd * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=_interpret(),
    )(*args)


def _make_slab_kernel(scale: float, h: int, dh: int, with_bias: bool):
    def kernel(*refs):
        if with_bias:
            qkv_ref, bias_ref, o_ref = refs
            # bias is passed whole ([B, S] is tiny); a (1, S) block would
            # violate the (8, 128) tile rule for non-aligned S
            bias_row = bias_ref[pl.program_id(0)][None, :]
        else:
            qkv_ref, o_ref = refs
            bias_row = None
        slab = qkv_ref[0]  # [S, 3·H·Dh] — q | k | v lane blocks
        d = h * dh
        for g in range(h):
            q = slab[:, g * dh : (g + 1) * dh]
            k = slab[:, d + g * dh : d + (g + 1) * dh]
            v = slab[:, 2 * d + g * dh : 2 * d + (g + 1) * dh]
            o_ref[0, :, g * dh : (g + 1) * dh] = _sdpa(q, k, v, bias_row, scale)

    return kernel


def attention_qkv_slab(
    qkv: Array, key_bias: Array | None = None, *, num_heads: int
) -> Array:
    """qkv [B, S, 3·H·Dh] — the UNSPLIT fused qkv-projection output — →
    [B, S, H·Dh]. One program per batch row computes every head, so the qkv
    projection stays a single large MXU dot and the slab is DMA'd exactly
    once per layer.

    Differentiable: the forward is the Pallas kernel; the backward is the
    closed-form attention VJP in XLA (scores rematerialized — the standard
    flash-attention recompute trade)."""
    if key_bias is None:
        key_bias = jnp.zeros(qkv.shape[:2], jnp.float32)
    return _slab_attn_vjp(qkv, key_bias, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _slab_attn_vjp(qkv: Array, key_bias: Array, num_heads: int) -> Array:
    return _slab_attn_fwd_kernel(qkv, key_bias, num_heads=num_heads)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def _slab_attn_fwd_kernel(
    qkv: Array, key_bias: Array, *, num_heads: int
) -> Array:
    b, s, three_hd = qkv.shape
    h = num_heads
    if three_hd % (3 * h):
        raise ValueError(
            f"slab lane dim {three_hd} is not divisible by 3·num_heads={3 * h}")
    dh = three_hd // (3 * h)
    scale = dh**-0.5

    in_specs = [
        pl.BlockSpec((1, s, three_hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _make_slab_kernel(scale, h, dh, with_bias=True),
        out_shape=jax.ShapeDtypeStruct((b, s, h * dh), qkv.dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, s, h * dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=maybe_cost_estimate(
            flops=4 * b * h * s * s * dh,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=_interpret(),
    )(qkv, key_bias.astype(jnp.float32))


def _slab_split(qkv: Array, h: int):
    b, s, three_hd = qkv.shape
    dh = three_hd // (3 * h)
    parts = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)  # [3,B,H,S,Dh]
    return parts[0], parts[1], parts[2], dh


def _slab_attn_fwd(qkv, key_bias, num_heads):
    out = _slab_attn_fwd_kernel(qkv, key_bias, num_heads=num_heads)
    return out, (qkv, key_bias)


def _slab_attn_bwd(num_heads, residuals, g):
    """Closed-form attention backward in XLA (rematerializes p):
    dv = pᵀ·do; ds = p ∘ (do·vᵀ − rowsum(do·vᵀ ∘ p)); dq = ds·k·scale;
    dk = dsᵀ·q·scale. No gradient flows into the key bias (a mask)."""
    qkv, key_bias = residuals
    b, s, three_hd = qkv.shape
    h = num_heads
    q, k, v, dh = _slab_split(qkv, h)
    scale = dh**-0.5

    do = g.reshape(b, s, h, dh).transpose(0, 2, 1, 3)  # [B,H,S,Dh]
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32) * scale
    sc = sc + key_bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(sc, axis=-1)
    dof = do.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    dqkv = jnp.stack([dq, dk, dv], axis=0)  # [3,B,H,S,Dh]
    dqkv = dqkv.transpose(1, 3, 0, 2, 4).reshape(b, s, three_hd).astype(qkv.dtype)
    return dqkv, jnp.zeros_like(key_bias)


_slab_attn_vjp.defvjp(_slab_attn_fwd, _slab_attn_bwd)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Array | None = None,
    group: int = 8,
) -> Array:
    """Generic [B, H, S, Dh] API (drop-in for ``mha_attention``'s XLA path).

    ``bias`` must be a KEY-mask shaped [B, 1, 1, S] (broadcast over heads and
    query positions — the BERT padding mask) or None. Full score-level biases
    ([B, H|1, S, S]) are NOT supported by the fused kernel — callers with a
    per-query bias must use the XLA path (``mha_attention(use_flash=False)``).
    Layout shuffles here are for API compatibility; the models keep the fused
    qkv slab unsplit and call ``attention_qkv_slab`` directly, skipping them.
    """
    b, h, s, dh = q.shape
    if bias is not None and (bias.ndim != 4 or bias.shape[1] != 1
                             or bias.shape[2] != 1):
        raise ValueError(
            f"flash_attention supports only [B, 1, 1, S] key-mask biases, got "
            f"{bias.shape}; use mha_attention(use_flash=False) for full "
            f"score-level biases"
        )
    to_lanes = lambda x: x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    key_bias = None if bias is None else bias.reshape(b, s)
    out = attention_qkv_heads(
        to_lanes(q), to_lanes(k), to_lanes(v), key_bias,
        num_heads=h, group=group,
    )
    return out.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
