"""In-kernel math helpers shared by the Pallas kernels.

The megakernels' claimed cross-path parity (cos 1.0000 between the fused
and unfused int8 paths, docs/PERF.md) depends on the quantize / GELU / LN
math being bit-identical in every kernel. Keep it identical by importing
these, not by copying them (same convention as ``_cost.VMEM_LIMIT_BYTES``).
All helpers trace inside Pallas kernel bodies (plain jnp on fp32 blocks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu_tanh(x):
    """tanh-approx GELU (the bf16/int8 inference activation; docs/PERF.md)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def quant_rows(xf):
    """Per-token (row) abs-max int8 quantization of an fp32 block.

    Returns ``(q int8, scale fp32 [M, 1])`` with ``q·scale ≈ xf``; the
    1e-8 floor keeps all-zero rows finite."""
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf * (1.0 / scale)), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dot(xq, wq):
    """int8 × int8 → int32 MXU contraction (2× the bf16 rate on v5e)."""
    return jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def ln_rows(xf, g_row, b_row, eps):
    """Row LayerNorm of an fp32 [M, D] block; ``g_row``/``b_row`` are [1, D]."""
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * g_row + b_row
