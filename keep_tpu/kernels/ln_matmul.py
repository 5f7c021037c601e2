"""Fused LayerNorm → matmul Pallas kernel.

Every transformer block computes ``linear(W, layer_norm(x))`` twice (qkv and
fc1). XLA materializes the normalized activations in HBM between the two
ops (~200 MB of traffic per ViT-L layer at batch 256); this kernel
normalizes each M-tile in VMEM (fp32) and feeds the MXU directly.

Inference-path only (no VJP) — training uses the unfused ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keep_tpu.kernels._cost import maybe_cost_estimate
from keep_tpu.kernels._kops import ln_rows as _ln_rows

Array = jax.Array

TILE_M = 256


def _ln_mm_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, o_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)
    y = _ln_rows(xf, g_ref[0][None, :], b_ref[0][None, :], eps)
    acc = jnp.dot(y.astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc + wb_ref[0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype"))
def ln_matmul(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    w: Array,
    w_bias: Array,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
) -> Array:
    """[M, K] → layer_norm (fp32) → @ w [K, N] + bias → [M, N] out_dtype."""
    m, k = x.shape
    _, n = w.shape
    # keep resident weight + double-buffered tiles inside ~16MB VMEM
    tile_m = 128 if (k * n + TILE_M * (k + n) * 3) * 2 > 14 * 2**20 else TILE_M
    return pl.pallas_call(
        functools.partial(_ln_mm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(pl.cdiv(m, tile_m),),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=maybe_cost_estimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n * 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        x,
        ln_scale.reshape(1, k).astype(jnp.float32),
        ln_bias.reshape(1, k).astype(jnp.float32),
        w,
        w_bias.reshape(1, n).astype(jnp.float32),
    )
