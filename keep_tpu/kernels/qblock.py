"""Fused int8 attention-block megakernel: LN → int8 qkv → multi-head
attention → int8 proj → +residual, one program per batch row.

Motivation (measured, docs/PERF.md): with separate kernels each ViT-L layer
moves ~1.3 GB of activations through HBM (LN out, the [B, S, 3D] qkv slab
written+read, attention out, proj in/out, residual) — ~1.6 ms/layer at v5e's
819 GB/s. Fusing the whole pre-LN attention sub-block reads x once and
writes the residual sum once (~0.25 ms/layer). The qkv/proj dots run on the
int8 MXU (2× bf16); LN, softmax and the dequant epilogues stay fp32 — the
same numerics as the unfused path (cos 1.0000 end-to-end).

LayerScale must be pre-folded into the proj kernel
(``vit.fold_layerscale`` — ``KEEPModel.quantize()`` does this); blocks that
still carry ``ls1`` take the unfused path.

Inference-only (no VJP) — training runs the bf16 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keep_tpu.kernels._cost import VMEM_LIMIT_BYTES, maybe_cost_estimate
from keep_tpu.kernels._kops import int8_dot as _int8_dot
from keep_tpu.kernels._kops import ln_rows as _ln
from keep_tpu.kernels._kops import quant_rows as _quant_rows

Array = jax.Array


def _sdpa(q, k, v, scale):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    return jnp.dot(p, v, preferred_element_type=jnp.float32)


def _make_qattn_kernel(heads: int, dh: int, eps: float):
    scale = dh**-0.5
    d = heads * dh

    def kernel(x_ref, g_ref, bln_ref, wqkv_ref, sqkv_ref, bqkv_ref,
               wproj_ref, sproj_ref, bproj_ref, o_ref, attn_scratch):
        xf = x_ref[0].astype(jnp.float32)  # [S, D]
        y = _ln(xf, g_ref[0][None, :], bln_ref[0][None, :], eps)
        yq, a1 = _quant_rows(y)
        slab = _int8_dot(yq, wqkv_ref[:]).astype(jnp.float32)
        slab = slab * (a1 * sqkv_ref[0][None, :]) + bqkv_ref[0][None, :]
        slab = slab.astype(jnp.bfloat16)
        for h in range(heads):  # static unroll — lane slices at dh offsets
            q = slab[:, h * dh : (h + 1) * dh]
            k = slab[:, d + h * dh : d + (h + 1) * dh]
            v = slab[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            attn_scratch[:, h * dh : (h + 1) * dh] = _sdpa(q, k, v, scale)
        aq, a2 = _quant_rows(attn_scratch[:])
        out = _int8_dot(aq, wproj_ref[:]).astype(jnp.float32)
        out = out * (a2 * sproj_ref[0][None, :]) + bproj_ref[0][None, :]
        o_ref[0] = (xf + out).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "eps"))
def _qattn_call(x, g, bln, wqkv, sqkv, bqkv, wproj, sproj, bproj,
                *, num_heads: int, eps: float):
    b, s, d = x.shape
    dh = d // num_heads
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_qattn_kernel(num_heads, dh, eps),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)),
            const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s, d), jnp.float32)],
        cost_estimate=maybe_cost_estimate(
            flops=2 * b * s * d * 4 * d + 4 * b * num_heads * s * s * dh,
            bytes_accessed=2 * b * s * d * 2 + d * 4 * d,
            transcendentals=b * num_heads * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=jax.default_backend() == "cpu",
    )(x, g, bln, wqkv, sqkv, bqkv, wproj, sproj, bproj)


def quantized_attention_block(
    x: Array,
    norm1: dict,
    qkv_p: dict,
    proj_p: dict,
    *,
    num_heads: int,
    eps: float,
) -> Array:
    """x [B, S, D] → x + proj(MHA(qkv(LN(x)))) with int8 qkv/proj.

    ``qkv_p``/``proj_p``: {kernel_q, scale, bias} (LayerScale pre-folded into
    proj); ``norm1``: {scale, bias}."""
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    return _qattn_call(
        x, row(norm1["scale"]), row(norm1["bias"]),
        qkv_p["kernel_q"], row(qkv_p["scale"]), row(qkv_p["bias"]),
        proj_p["kernel_q"], row(proj_p["scale"]), row(proj_p["bias"]),
        num_heads=num_heads, eps=eps,
    )


# ---------------------------------------------------------------------------
# post-LN (BERT) variant: attn on the RAW input, LN applied to the residual
# sum at the exit, additive key-padding mask on the scores
# ---------------------------------------------------------------------------


def _sdpa_masked(q, k, v, scale, bias_row):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_row
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    return jnp.dot(p, v, preferred_element_type=jnp.float32)


def _make_qattn_postln_kernel(heads: int, dh: int, eps: float):
    scale = dh**-0.5
    d = heads * dh

    def kernel(x_ref, mask_ref, g_ref, bln_ref, psq_ref, wqkv_ref, sqkv_ref,
               bqkv_ref, wout_ref, sout_ref, bout_ref, o_ref, attn_scratch):
        xf = x_ref[0].astype(jnp.float32)  # [S, D]
        # the mask is passed whole ([B, S] is tiny) and indexed by program —
        # a (1, S) block would violate the 8-sublane block rule
        bias_row = mask_ref[pl.program_id(0)][None, :]  # [1, S]
        # SmoothQuant pre_scale (1/s; ones when unsmoothed): the qkv kernel
        # rows carry s, so dividing only the QUANTIZE input keeps x·W exact
        # while the int8 rounding sees the equalized tensor. The residual
        # and exit LN still use the raw xf.
        yq, a1 = _quant_rows(xf * psq_ref[0][None, :])
        slab = _int8_dot(yq, wqkv_ref[:]).astype(jnp.float32)
        slab = slab * (a1 * sqkv_ref[0][None, :]) + bqkv_ref[0][None, :]
        slab = slab.astype(jnp.bfloat16)
        for h in range(heads):
            q = slab[:, h * dh : (h + 1) * dh]
            k = slab[:, d + h * dh : d + (h + 1) * dh]
            v = slab[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            attn_scratch[:, h * dh : (h + 1) * dh] = _sdpa_masked(
                q, k, v, scale, bias_row)
        aq, a2 = _quant_rows(attn_scratch[:])
        out = _int8_dot(aq, wout_ref[:]).astype(jnp.float32)
        out = out * (a2 * sout_ref[0][None, :]) + bout_ref[0][None, :]
        o_ref[0] = _ln(xf + out, g_ref[0][None, :], bln_ref[0][None, :],
                       eps).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "eps"))
def _qattn_postln_call(x, mask, g, bln, psq, wqkv, sqkv, bqkv, wout, sout,
                       bout, *, num_heads: int, eps: float):
    b, s, d = x.shape
    dh = d // num_heads
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_qattn_postln_kernel(num_heads, dh, eps),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((b, s)),  # whole mask, indexed by program id
            const((1, d)), const((1, d)), const((1, d)),
            const((d, 3 * d)), const((1, 3 * d)), const((1, 3 * d)),
            const((d, d)), const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s, d), jnp.float32)],
        cost_estimate=maybe_cost_estimate(
            flops=2 * b * s * d * 4 * d + 4 * b * num_heads * s * s * dh,
            bytes_accessed=2 * b * s * d * 2 + d * 4 * d,
            transcendentals=b * num_heads * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=jax.default_backend() == "cpu",
    )(x, mask, g, bln, psq, wqkv, sqkv, bqkv, wout, sout, bout)


def quantized_attention_block_postln(
    x: Array,
    key_mask: Array,
    norm: dict,
    qkv_p: dict,
    out_p: dict,
    *,
    num_heads: int,
    eps: float,
) -> Array:
    """x [B, S, D] → LN(x + out(MHA(qkv(x)))) with int8 qkv/out — the BERT
    post-LN attention sub-block (models/bert.block), additive ``key_mask``
    [B, S] (0 valid, -1e9 padded) applied to the scores.

    ``qkv_p``/``out_p``: {kernel_q, scale, bias}; ``norm``: the block's
    attention LayerNorm (applied at the EXIT, over the residual sum).
    A ``pre_scale`` leaf on ``qkv_p`` (SmoothQuant, quant.smooth_bert) is
    applied to the quantize input in-kernel."""
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    psq = qkv_p.get("pre_scale")
    if psq is None:
        psq = jnp.ones((1, x.shape[-1]), jnp.float32)
    return _qattn_postln_call(
        x, jnp.asarray(key_mask, jnp.float32),
        row(norm["scale"]), row(norm["bias"]), row(psq),
        qkv_p["kernel_q"], row(qkv_p["scale"]), row(qkv_p["bias"]),
        out_p["kernel_q"], row(out_p["scale"]), row(out_p["bias"]),
        num_heads=num_heads, eps=eps,
    )
