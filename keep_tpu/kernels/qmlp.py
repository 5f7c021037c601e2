"""Fused int8 MLP-pair Pallas kernel: the fc1→GELU→fc2 chain int8
end-to-end, with the [M, F] intermediate living only in VMEM.

The unfused int8 path (`kernels.qmatmul`) stores the [M, 4096] GELU output
to HBM in bf16 and the fc2 kernel reads it back: ~826 MB of HBM traffic per
ViT-L layer at batch 256 (~1 ms/layer at v5e's 819 GB/s) — about what the
int8 MXU saves at K=1024, which is why W8A8 measured only +6% end-to-end in
round 1 (docs/PERF.md). Here one program per M-tile runs:

  per-token quantize → int8×int8 MXU dot (fc1) → fp32 dequant + bias +
  tanh-GELU → per-token re-quantize → int8 dot (fc2) → dequant + bias →
  bf16 store

with both weight matrices grid-resident in VMEM (int8: 4 MB each for
ViT-L's 1024×4096) and the hidden activations never leaving VMEM.

Inference-only (no VJP) — training runs the bf16 path. Reference has no
quantized path at all (SURVEY §2.1 #25: amp/GradScaler only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keep_tpu.kernels._cost import VMEM_LIMIT_BYTES, maybe_cost_estimate
from keep_tpu.kernels._kops import gelu_tanh as _gelu_tanh
from keep_tpu.kernels._kops import int8_dot
from keep_tpu.kernels._kops import ln_rows as _ln_rows
from keep_tpu.kernels._kops import quant_rows as _quant_rows

Array = jax.Array

TILE_M = 256


def _int8_dot(xq, wq_ref):
    return int8_dot(xq, wq_ref[:])


def _qmlp_kernel(*refs, with_ps=False):
    refs = list(refs)
    x_ref = refs.pop(0)
    ps1_ref = refs.pop(0) if with_ps else None
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref = refs
    xf = x_ref[:].astype(jnp.float32)
    if with_ps:  # SmoothQuant: kernel rows carry s, quantize input ÷ s
        xf = xf * ps1_ref[0][None, :]
    xq, a1 = _quant_rows(xf)
    h = _int8_dot(xq, w1_ref).astype(jnp.float32)
    h = h * (a1 * s1_ref[0][None, :]) + b1_ref[0][None, :]
    h = _gelu_tanh(h)
    hq, a2 = _quant_rows(h)
    out = _int8_dot(hq, w2_ref).astype(jnp.float32)
    out = out * (a2 * s2_ref[0][None, :]) + b2_ref[0][None, :]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def quantized_mlp(
    x: Array,
    w1_q: Array, w1_scale: Array, b1: Array,
    w2_q: Array, w2_scale: Array, b2: Array,
    out_dtype=jnp.bfloat16,
    pre_scale1: Array | None = None,
) -> Array:
    """x [M, D] × int8 fc1 [D, F] → tanh-GELU → int8 fc2 [F, D] → [M, D].

    ``w*_scale`` are per-output-channel dequant scales ([F] and [D]);
    activations are re-quantized per token between the two dots.
    ``pre_scale1`` [D] (SmoothQuant 1/s, fc1 kernel rows carry s) is
    applied to the quantize input in-kernel."""
    m, d = x.shape
    _, f = w1_q.shape
    grid = (pl.cdiv(m, TILE_M),)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    with_ps = pre_scale1 is not None
    in_specs = [pl.BlockSpec((TILE_M, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    if with_ps:
        in_specs.append(const((1, d)))
        args.append(jnp.asarray(pre_scale1, jnp.float32).reshape(1, d))
    in_specs += [const((d, f)), const((1, f)), const((1, f)),
                 const((f, d)), const((1, d)), const((1, d))]
    args += [
        w1_q, w1_scale.reshape(1, f).astype(jnp.float32),
        b1.reshape(1, f).astype(jnp.float32),
        w2_q, w2_scale.reshape(1, d).astype(jnp.float32),
        b2.reshape(1, d).astype(jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_qmlp_kernel, with_ps=with_ps),
        out_shape=jax.ShapeDtypeStruct((m, d), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_M, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=maybe_cost_estimate(
            flops=2 * m * d * f * 2,
            bytes_accessed=m * d * 4 + d * f * 2,
            transcendentals=m * f,
        ),
        # own the VMEM budget (like the bsd variant below): the resident
        # int8 weights + double-buffered tiles + [TILE_M, F] fp32 hidden
        # exceed the ~16 MiB default when the caller's jit sets no limit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _make_qmlp_bsd_kernel(with_ln: bool, residual: bool, eps: float,
                          post_ln: bool = False, rows: int = 1,
                          with_ps: bool = False):
    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        g_ref, bln_ref = (refs.pop(0), refs.pop(0)) if with_ln else (None, None)
        ps1_ref = refs.pop(0) if with_ps else None
        (w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref) = refs
        if rows > 1:
            # k independent batch rows in one program: all math here is
            # per-token, so collapsing [k, S, D] → [k·S, D] in VMEM is
            # exact — and the fatter M amortizes the S→sublane padding on
            # the MXU (S=197 pads 13.7% alone, 1.5% at k=4)
            k, s, d = x_ref.shape
            xf = x_ref[:].astype(jnp.float32).reshape(k * s, d)
        else:
            xf = x_ref[0].astype(jnp.float32)  # [S, D]
        y = _ln_rows(xf, g_ref[0][None, :], bln_ref[0][None, :], eps) \
            if with_ln and not post_ln else xf
        # SmoothQuant pre_scale (1/s): fc1's kernel rows carry s, the
        # quantize input is divided by s — exact, tamer int8 rounding
        xq, a1 = _quant_rows(y * ps1_ref[0][None, :] if with_ps else y)
        h = _int8_dot(xq, w1_ref).astype(jnp.float32)
        h = h * (a1 * s1_ref[0][None, :]) + b1_ref[0][None, :]
        h = _gelu_tanh(h)
        hq, a2 = _quant_rows(h)
        out = _int8_dot(hq, w2_ref).astype(jnp.float32)
        out = out * (a2 * s2_ref[0][None, :]) + b2_ref[0][None, :]
        if post_ln:
            # post-LN (BERT) block tail: LN(x + mlp(x))
            out = _ln_rows(out + xf, g_ref[0][None, :], bln_ref[0][None, :],
                           eps)
        elif residual:
            out = out + xf
        if rows > 1:
            o_ref[:] = out.reshape(x_ref.shape).astype(o_ref.dtype)
        else:
            o_ref[0] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "eps", "residual",
                                    "post_ln", "rows"))
def quantized_mlp_bsd(
    x: Array,
    w1_q: Array, w1_scale: Array, b1: Array,
    w2_q: Array, w2_scale: Array, b2: Array,
    out_dtype=jnp.bfloat16,
    ln_scale: Array | None = None,
    ln_bias: Array | None = None,
    eps: float = 1e-6,
    residual: bool = False,
    post_ln: bool = False,
    rows: int = 1,
    pre_scale1: Array | None = None,
) -> Array:
    """``quantized_mlp`` over [B, S, D] activations in their natural layout
    (no [B·S, D] flatten — a physical relayout when S isn't sublane-aligned;
    see kernels/qmatmul.quantized_matmul_bsd).

    ``rows``: batch rows per kernel program (default 1). The MLP is
    strictly per-token, so k rows per program is bit-identical (tested) and
    a fatter M amortizes the S=197→224 sublane padding on the MXU — an
    ISOLATED 24-layer MLP stack at [B/4, 4·S, D] runs 88.4→78.1 ms. But in
    the full model the attention megakernel pins the stream to [B, 197, D],
    and S=197 is not sublane-aligned, so getting to the fat shape costs a
    physical relayout either way: reshaping the array between kernels
    (295 ms vs 289 model) or widening the BlockSpec and collapsing
    [k, S, D]→[k·S, D] in VMEM (323 ms) both LOSE (docs/PERF.md). Leave 1
    unless the surrounding stack genuinely runs at the fat shape.

    Optional fusions (all exact — fp32 math identical to separate ops):
    ``ln_scale``/``ln_bias`` apply a pre-LayerNorm to the input in-kernel;
    ``residual=True`` adds the RAW input to the output (the pre-LN block's
    ``x + mlp(ln(x))``); ``post_ln=True`` instead computes the post-LN (BERT)
    tail ``LN(x + mlp(x))`` with ``ln_scale``/``ln_bias`` as the EXIT norm —
    each saves an [B, S, D] HBM round trip. ``pre_scale1`` (SmoothQuant,
    quant.smooth_bert) divides fc1's quantize input per channel in-kernel."""
    b, s, d = x.shape
    _, f = w1_q.shape
    with_ln = ln_scale is not None
    with_ps = pre_scale1 is not None
    if post_ln and not with_ln:
        raise ValueError("post_ln=True needs ln_scale/ln_bias (the exit norm)")
    if rows < 1 or b % rows:
        raise ValueError(f"rows={rows} must be a positive divisor of "
                         f"batch {b}")
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((rows, s, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x]
    if with_ln:
        in_specs += [const((1, d)), const((1, d))]
        args += [jnp.asarray(ln_scale, jnp.float32).reshape(1, d),
                 jnp.asarray(ln_bias, jnp.float32).reshape(1, d)]
    if with_ps:
        in_specs += [const((1, d))]
        args += [jnp.asarray(pre_scale1, jnp.float32).reshape(1, d)]
    in_specs += [const((d, f)), const((1, f)), const((1, f)),
                 const((f, d)), const((1, d)), const((1, d))]
    args += [w1_q, w1_scale.reshape(1, f).astype(jnp.float32),
             b1.reshape(1, f).astype(jnp.float32),
             w2_q, w2_scale.reshape(1, d).astype(jnp.float32),
             b2.reshape(1, d).astype(jnp.float32)]
    return pl.pallas_call(
        _make_qmlp_bsd_kernel(with_ln, residual, eps, post_ln, rows=rows,
                              with_ps=with_ps),
        out_shape=jax.ShapeDtypeStruct((b, s, d), out_dtype),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=maybe_cost_estimate(
            flops=2 * b * s * d * f * 2,
            bytes_accessed=b * s * d * 4 + d * f * 2,
            transcendentals=b * s * f,
        ),
        # own the VMEM budget so multi-row programs (rows>1) compile the
        # same regardless of the caller's jit compiler options
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def qmlp_fused(p_fc1: dict, p_fc2: dict, x: Array) -> Array:
    """MLP over [..., D] inputs via the fused pair kernel. ``p_fc1``/``p_fc2``:
    {kernel_q, scale, bias} from ``quant.quantize_linear_weights``; an
    fc1 SmoothQuant ``pre_scale`` rides into the kernel (``pre_scale1``).
    3-D inputs take the batch-gridded kernel (no flatten relayout)."""
    ps1 = p_fc1.get("pre_scale")
    if x.ndim == 3:
        return quantized_mlp_bsd(
            x,
            p_fc1["kernel_q"], p_fc1["scale"], p_fc1["bias"],
            p_fc2["kernel_q"], p_fc2["scale"], p_fc2["bias"],
            out_dtype=x.dtype,
            pre_scale1=ps1,
        )
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = quantized_mlp(
        x2,
        p_fc1["kernel_q"], p_fc1["scale"], p_fc1["bias"],
        p_fc2["kernel_q"], p_fc2["scale"], p_fc2["bias"],
        out_dtype=x.dtype,
        pre_scale1=ps1,
    )
    return out.reshape(shape[:-1] + (out.shape[-1],))
