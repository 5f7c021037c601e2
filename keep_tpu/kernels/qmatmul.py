"""Fused W8A8 matmul Pallas kernel: quantize → int8 MXU dot → dequant
(+ optional GELU) in one pass.

The XLA int8 path (`ops.nn._qlinear`) wins only ~5% end-to-end because the
dynamic-quantization epilogues materialize between kernels. Here the whole
chain lives in VMEM per M-tile: per-token abs-max scaling, int8×int8→int32
MXU dot (2× the bf16 rate on v5e), fp32 dequant + bias + activation, bf16
store. Weights are resident across the grid (constant index map).

Inference-only (no VJP) — training runs the bf16 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keep_tpu.kernels._cost import VMEM_LIMIT_BYTES, maybe_cost_estimate
from keep_tpu.kernels._kops import gelu_tanh as _gelu_tanh
from keep_tpu.kernels._kops import int8_dot as _int8_dot
from keep_tpu.kernels._kops import quant_rows as _quant_rows

Array = jax.Array

TILE_M = 256


def _qmm_kernel(x_ref, wq_ref, scale_ref, bias_ref, o_ref, *, activation):
    xq, ascale = _quant_rows(x_ref[:].astype(jnp.float32))
    acc = _int8_dot(xq, wq_ref[:])
    out = acc.astype(jnp.float32) * ascale * scale_ref[0][None, :]
    out = out + bias_ref[0][None, :]
    if activation == "gelu_tanh":
        out = _gelu_tanh(out)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "out_dtype"))
def quantized_matmul(
    x: Array,
    w_q: Array,
    w_scale: Array,
    bias: Array,
    activation: str | None = None,
    out_dtype=jnp.bfloat16,
) -> Array:
    """x [M, K] (bf16/fp32) × w_q [K, N] int8 (+ per-column scale [N], bias
    [N]) → [M, N] ``out_dtype``; optional fused tanh-GELU epilogue."""
    m, k = x.shape
    _, n = w_q.shape
    grid = (pl.cdiv(m, TILE_M),)
    return pl.pallas_call(
        functools.partial(_qmm_kernel, activation=activation),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=maybe_cost_estimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n + m * n * 2,
            transcendentals=m * n if activation else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=jax.default_backend() == "cpu",
    )(x, w_q, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))


def _qmm_bsd_kernel(x_ref, wq_ref, scale_ref, bias_ref, o_ref, *, activation):
    xq, ascale = _quant_rows(x_ref[0].astype(jnp.float32))  # [S, K]
    acc = _int8_dot(xq, wq_ref[:])
    out = acc.astype(jnp.float32) * ascale * scale_ref[0][None, :]
    out = out + bias_ref[0][None, :]
    if activation == "gelu_tanh":
        out = _gelu_tanh(out)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "out_dtype"))
def quantized_matmul_bsd(
    x: Array,
    w_q: Array,
    w_scale: Array,
    bias: Array,
    activation: str | None = None,
    out_dtype=jnp.bfloat16,
) -> Array:
    """``quantized_matmul`` over [B, S, K] activations WITHOUT flattening.

    The [B, S, K] → [B·S, K] reshape is a physical relayout whenever S isn't
    sublane-aligned (ViT-L: S=197) — ~2 HBM round-trips of the activations
    per kernel call, which is exactly what erased the int8 win in-model.
    Here the grid runs over the batch axis and each program consumes one
    [S, K] slab in its natural layout."""
    b, s, k = x.shape
    _, n = w_q.shape
    return pl.pallas_call(
        functools.partial(_qmm_bsd_kernel, activation=activation),
        out_shape=jax.ShapeDtypeStruct((b, s, n), out_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=maybe_cost_estimate(
            flops=2 * b * s * k * n,
            bytes_accessed=b * s * k * 2 + k * n + b * s * n * 2,
            transcendentals=b * s * n if activation else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=jax.default_backend() == "cpu",
    )(x, w_q, w_scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32))


def qlinear_fused(p: dict, x: Array, activation: str | None = None) -> Array:
    """Quantized linear over [..., K] inputs via the fused kernel (TPU) with
    the XLA fallback elsewhere. ``p``: {kernel_q, scale, bias}. 3-D inputs
    take the batch-gridded kernel (no flatten relayout)."""
    if x.ndim == 3:
        return quantized_matmul_bsd(x, p["kernel_q"], p["scale"], p["bias"],
                                    activation=activation, out_dtype=x.dtype)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = quantized_matmul(x2, p["kernel_q"], p["scale"], p["bias"],
                           activation=activation, out_dtype=x.dtype)
    return out.reshape(shape[:-1] + (out.shape[-1],))
