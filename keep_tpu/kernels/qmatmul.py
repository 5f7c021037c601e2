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


def _qmm_kernel(*refs, activation, with_ps):
    refs = list(refs)
    x_ref = refs.pop(0)
    ps_ref = refs.pop(0) if with_ps else None
    wq_ref, scale_ref, bias_ref, o_ref = refs
    xf = x_ref[:].astype(jnp.float32)
    if with_ps:
        # SmoothQuant pre_scale (1/s): the kernel rows carry s, the
        # quantize input divides by s IN-KERNEL — no fp32 HBM stream
        xf = xf * ps_ref[0][None, :]
    xq, ascale = _quant_rows(xf)
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
    pre_scale: Array | None = None,
) -> Array:
    """x [M, K] (bf16/fp32) × w_q [K, N] int8 (+ per-column scale [N], bias
    [N]) → [M, N] ``out_dtype``; optional fused tanh-GELU epilogue.
    ``pre_scale`` [K] (SmoothQuant 1/s) multiplies the quantize input
    in-kernel — the bf16 activation stream stays bf16 through HBM."""
    m, k = x.shape
    _, n = w_q.shape
    grid = (pl.cdiv(m, TILE_M),)
    with_ps = pre_scale is not None
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((TILE_M, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    if with_ps:
        in_specs.append(const((1, k)))
        args.append(jnp.asarray(pre_scale, jnp.float32).reshape(1, k))
    in_specs += [const((k, n)), const((1, n)), const((1, n))]
    args += [w_q, w_scale.reshape(1, n).astype(jnp.float32),
             bias.reshape(1, n).astype(jnp.float32)]
    return pl.pallas_call(
        functools.partial(_qmm_kernel, activation=activation,
                          with_ps=with_ps),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
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
    )(*args)


def _qmm_bsd_kernel(*refs, activation, with_ps):
    refs = list(refs)
    x_ref = refs.pop(0)
    ps_ref = refs.pop(0) if with_ps else None
    wq_ref, scale_ref, bias_ref, o_ref = refs
    xf = x_ref[0].astype(jnp.float32)  # [S, K]
    if with_ps:
        xf = xf * ps_ref[0][None, :]
    xq, ascale = _quant_rows(xf)
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
    pre_scale: Array | None = None,
) -> Array:
    """``quantized_matmul`` over [B, S, K] activations WITHOUT flattening.

    The [B, S, K] → [B·S, K] reshape is a physical relayout whenever S isn't
    sublane-aligned (ViT-L: S=197) — ~2 HBM round-trips of the activations
    per kernel call, which is exactly what erased the int8 win in-model.
    Here the grid runs over the batch axis and each program consumes one
    [S, K] slab in its natural layout. ``pre_scale`` as in
    ``quantized_matmul``."""
    b, s, k = x.shape
    _, n = w_q.shape
    with_ps = pre_scale is not None
    in_specs = [pl.BlockSpec((1, s, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    if with_ps:
        in_specs.append(pl.BlockSpec((1, k), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(pre_scale, jnp.float32).reshape(1, k))
    in_specs += [
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [w_q, w_scale.reshape(1, n).astype(jnp.float32),
             bias.reshape(1, n).astype(jnp.float32)]
    return pl.pallas_call(
        functools.partial(_qmm_bsd_kernel, activation=activation,
                          with_ps=with_ps),
        out_shape=jax.ShapeDtypeStruct((b, s, n), out_dtype),
        grid=(b,),
        in_specs=in_specs,
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
    )(*args)


def qlinear_fused(p: dict, x: Array, activation: str | None = None) -> Array:
    """Quantized linear over [..., K] inputs via the fused kernel (TPU) with
    the XLA fallback elsewhere. ``p``: {kernel_q, scale, bias} and optional
    SmoothQuant ``pre_scale`` (applied in-kernel before the quantize).
    3-D inputs take the batch-gridded kernel (no flatten relayout)."""
    ps = p.get("pre_scale")
    if x.ndim == 3:
        return quantized_matmul_bsd(x, p["kernel_q"], p["scale"], p["bias"],
                                    activation=activation, out_dtype=x.dtype,
                                    pre_scale=ps)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = quantized_matmul(x2, p["kernel_q"], p["scale"], p["bias"],
                           activation=activation, out_dtype=x.dtype,
                           pre_scale=ps)
    return out.reshape(shape[:-1] + (out.shape[-1],))
