"""Attention lab, round 3: the two unmeasured ideas from the round-2 review.

(a) softmax cost — round 2 established fp32 softmax as the attention
    sub-block's VPU floor (docs/PERF.md) but never measured a cheaper exp:
      v5   bf16 exp (max-subtract fp32, exp+divide in bf16, fp32-acc AV)
      v6   exp2 with scale*log2(e) pre-folded into q (one [S,DH] multiply
           replaces the [S,S] post-dot scale; exp2 is the VPU-native exp)
      v6b  v6 with the exp2 computed in bf16
      v4   all heads in ONE batched dot pair (defined in round 2's lab but
           never timed)
(b) whole-layer fusion — the production pair (qblock + qmlp_bsd) writes the
    [B, S, D] stream to HBM between the attention and MLP sub-blocks: 4
    touches/layer where 2 suffice. ``fused`` runs LN→qkv→MHA→proj→(+x)→
    LN→fc1→GELU→fc2→(+r) in one Pallas program.

Usage: python scripts/attn_lab2.py [v5 v6 v6b v4 fused fused6b pair ...]
(no args = all). One JSON line per measurement: 24-layer-scan ms + accuracy
vs the production pair.
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keep_tpu.kernels.qblock import _int8_dot, _ln, _quant_rows
from keep_tpu.kernels.qmlp import _gelu_tanh

B, S, D, H = 256, 197, 1024, 16
F = 4096
DH = D // H
EPS = 1e-6
LOG2E = 1.4426950408889634
import os as _os

OPTS = {"xla_tpu_scoped_vmem_limit_kib":
        _os.environ.get("KEEP_LAB_VMEM_KIB", "65536")}


def timed(name, fn, *args, ref=None, iters=10):
    try:
        float(jnp.sum(fn(*args)))  # warm w/ a real fetch (relay: block_until_ready no-op)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        ms = (time.time() - t0) / iters * 1e3
        rec = {"name": name, "ms": round(ms, 2)}
        if ref is not None:
            a = np.asarray(out, np.float32).ravel()
            b = np.asarray(ref, np.float32).ravel()
            rec["max_abs"] = round(float(np.abs(a - b).max()), 5)
            rec["cos"] = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
        print(json.dumps(rec), flush=True)
        return out
    except Exception as e:
        print(json.dumps({"name": name, "error": str(e)[:300]}), flush=True)
        return None


# ---------------------------------------------------------------------------
# attention inner-loop variants (operate on the bf16 qkv slab [S, 3D])
# ---------------------------------------------------------------------------


def attn_v0(slab, scratch, scale):
    for h in range(H):
        q = slab[:, h * DH : (h + 1) * DH]
        k = slab[:, D + h * DH : D + (h + 1) * DH]
        v = slab[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        scratch[:, h * DH : (h + 1) * DH] = jnp.dot(
            p, v, preferred_element_type=jnp.float32)


def attn_v5(slab, scratch, scale):
    """bf16 softmax: fp32 max-subtract, exp + normalize in bf16."""
    for h in range(H):
        q = slab[:, h * DH : (h + 1) * DH] * jnp.bfloat16(scale)
        k = slab[:, D + h * DH : D + (h + 1) * DH]
        v = slab[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.bfloat16))
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(e, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        scratch[:, h * DH : (h + 1) * DH] = o * recip


def attn_v6(slab, scratch, scale):
    """exp2 softmax: scale*log2e folded into q; exp2(s2 - m2) == softmax
    numerator exactly (base change), so the result is mathematically
    identical to v0 up to fp rounding."""
    c = jnp.bfloat16(scale * LOG2E)
    for h in range(H):
        q = slab[:, h * DH : (h + 1) * DH] * c
        k = slab[:, D + h * DH : D + (h + 1) * DH]
        v = slab[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        scratch[:, h * DH : (h + 1) * DH] = jnp.dot(
            p, v, preferred_element_type=jnp.float32)


def attn_v6b(slab, scratch, scale):
    """exp2 in bf16 (cheapest): fp32 max-subtract, bf16 exp2, fp32-acc AV,
    fold the rowsum reciprocal into the [S, DH] output."""
    c = jnp.bfloat16(scale * LOG2E)
    for h in range(H):
        q = slab[:, h * DH : (h + 1) * DH] * c
        k = slab[:, D + h * DH : D + (h + 1) * DH]
        v = slab[:, 2 * D + h * DH : 2 * D + (h + 1) * DH]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m).astype(jnp.bfloat16))
        recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(e, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        scratch[:, h * DH : (h + 1) * DH] = o * recip


def attn_v4(slab, scratch, scale):
    """All heads in one batched dot pair ([H, S, DH] batch dims)."""
    qkv = slab.reshape(S, 3, H, DH)
    q = qkv[:, 0].transpose(1, 0, 2)  # [H, S, DH]
    k = qkv[:, 1].transpose(1, 0, 2)
    v = qkv[:, 2].transpose(1, 0, 2)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    scratch[:, :] = o.transpose(1, 0, 2).reshape(S, D)


VARIANTS = {"v0": attn_v0, "v5": attn_v5, "v6": attn_v6, "v6b": attn_v6b,
            "v4": attn_v4}


# ---------------------------------------------------------------------------
# attention-only kernel (round-2 qblock with a pluggable inner loop)
# ---------------------------------------------------------------------------


def make_attn_kernel(attn_fn):
    scale = DH**-0.5

    def kernel(x_ref, g_ref, bln_ref, wqkv_ref, sqkv_ref, bqkv_ref,
               wproj_ref, sproj_ref, bproj_ref, o_ref, attn_scratch):
        xf = x_ref[0].astype(jnp.float32)
        y = _ln(xf, g_ref[0][None, :], bln_ref[0][None, :], EPS)
        yq, a1 = _quant_rows(y)
        slab = _int8_dot(yq, wqkv_ref[:]).astype(jnp.float32)
        slab = slab * (a1 * sqkv_ref[0][None, :]) + bqkv_ref[0][None, :]
        slab = slab.astype(jnp.bfloat16)
        attn_fn(slab, attn_scratch, scale)
        aq, a2 = _quant_rows(attn_scratch[:])
        out = _int8_dot(aq, wproj_ref[:]).astype(jnp.float32)
        out = out * (a2 * sproj_ref[0][None, :]) + bproj_ref[0][None, :]
        o_ref[0] = (xf + out).astype(o_ref.dtype)

    return kernel


def _attn_call(x, g, bln, wqkv, sqkv, bqkv, wproj, sproj, bproj, *, variant):
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_attn_kernel(VARIANTS[variant]),
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)),
            const((D, 3 * D)), const((1, 3 * D)), const((1, 3 * D)),
            const((D, D)), const((1, D)), const((1, D)),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * D * 4 * D + 4 * B * H * S * S * DH,
            bytes_accessed=2 * B * S * D * 2 + D * 4 * D,
            transcendentals=B * H * S * S,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, g, bln, wqkv, sqkv, bqkv, wproj, sproj, bproj)


# ---------------------------------------------------------------------------
# whole-layer fused kernel: attention sub-block + MLP sub-block, one program
# ---------------------------------------------------------------------------


def make_layer_kernel(attn_fn):
    scale = DH**-0.5

    def kernel(x_ref, g1_ref, b1_ref, wqkv_ref, sqkv_ref, bqkv_ref,
               wproj_ref, sproj_ref, bproj_ref,
               g2_ref, b2_ref, w1_ref, s1_ref, bm1_ref,
               w2_ref, s2_ref, bm2_ref, o_ref, attn_scratch):
        xf = x_ref[0].astype(jnp.float32)
        y = _ln(xf, g1_ref[0][None, :], b1_ref[0][None, :], EPS)
        yq, a1 = _quant_rows(y)
        slab = _int8_dot(yq, wqkv_ref[:]).astype(jnp.float32)
        slab = slab * (a1 * sqkv_ref[0][None, :]) + bqkv_ref[0][None, :]
        slab = slab.astype(jnp.bfloat16)
        attn_fn(slab, attn_scratch, scale)
        aq, a2 = _quant_rows(attn_scratch[:])
        out = _int8_dot(aq, wproj_ref[:]).astype(jnp.float32)
        out = out * (a2 * sproj_ref[0][None, :]) + bproj_ref[0][None, :]
        r = xf + out
        # MLP sub-block on the residual sum — no HBM round trip
        y2 = _ln(r, g2_ref[0][None, :], b2_ref[0][None, :], EPS)
        hq, a3 = _quant_rows(y2)
        hid = _int8_dot(hq, w1_ref[:]).astype(jnp.float32)
        hid = hid * (a3 * s1_ref[0][None, :]) + bm1_ref[0][None, :]
        hid = _gelu_tanh(hid)
        hq2, a4 = _quant_rows(hid)
        out2 = _int8_dot(hq2, w2_ref[:]).astype(jnp.float32)
        out2 = out2 * (a4 * s2_ref[0][None, :]) + bm2_ref[0][None, :]
        o_ref[0] = (r + out2).astype(o_ref.dtype)

    return kernel


def _layer_call(x, g1, b1, wqkv, sqkv, bqkv, wproj, sproj, bproj,
                g2, b2, w1, s1, bm1, w2, s2, bm2, *, variant):
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_layer_kernel(VARIANTS[variant]),
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)),
            const((D, 3 * D)), const((1, 3 * D)), const((1, 3 * D)),
            const((D, D)), const((1, D)), const((1, D)),
            const((1, D)), const((1, D)),
            const((D, F)), const((1, F)), const((1, F)),
            const((F, D)), const((1, D)), const((1, D)),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * D * (4 * D + 2 * F) + 4 * B * H * S * S * DH,
            bytes_accessed=2 * B * S * D * 2 + D * 4 * D + 2 * D * F,
            transcendentals=B * H * S * S + B * S * F,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, g1, b1, wqkv, sqkv, bqkv, wproj, sproj, bproj,
      g2, b2, w1, s1, bm1, w2, s2, bm2)


def main():
    from keep_tpu.kernels.qmlp import quantized_mlp_bsd
    from keep_tpu.quant import quantize_kernel

    which = sys.argv[1:] or ["pair", "v5", "v6", "v6b", "v4",
                             "fused", "fused6b"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32)).astype(jnp.bfloat16)
    g1 = jnp.asarray(rng.standard_normal((1, D)).astype(np.float32) * 0.1 + 1.0)
    b1 = jnp.zeros((1, D), jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((1, D)).astype(np.float32) * 0.1 + 1.0)
    b2 = jnp.zeros((1, D), jnp.float32)
    wqkv = quantize_kernel(jnp.asarray((rng.standard_normal((D, 3 * D)) * 0.03).astype(np.float32)))
    wproj = quantize_kernel(jnp.asarray((rng.standard_normal((D, D)) * 0.03).astype(np.float32)))
    w1 = quantize_kernel(jnp.asarray((rng.standard_normal((D, F)) * 0.03).astype(np.float32)))
    w2 = quantize_kernel(jnp.asarray((rng.standard_normal((F, D)) * 0.03).astype(np.float32)))
    bqkv = jnp.zeros((1, 3 * D), jnp.float32)
    bproj = jnp.zeros((1, D), jnp.float32)
    bm1 = jnp.zeros((1, F), jnp.float32)
    bm2 = jnp.zeros((1, D), jnp.float32)

    attn_args = (x, g1, b1, wqkv["kernel_q"], wqkv["scale"].reshape(1, -1), bqkv,
                 wproj["kernel_q"], wproj["scale"].reshape(1, -1), bproj)
    mlp_rest = (g2, b2, w1["kernel_q"], w1["scale"].reshape(1, -1), bm1,
                w2["kernel_q"], w2["scale"].reshape(1, -1), bm2)

    # production baseline: qblock(v0) + qmlp_bsd, 24-layer scan
    @functools.partial(jax.jit, compiler_options=OPTS)
    def pair24(x, *rest):
        def body(carry, _):
            a = _attn_call(carry, *rest[:8], variant="v0")
            m = quantized_mlp_bsd(
                a, w1["kernel_q"], w1["scale"], bm1.ravel(),
                w2["kernel_q"], w2["scale"], bm2.ravel(),
                out_dtype=a.dtype, ln_scale=g2.ravel(), ln_bias=b2.ravel(),
                eps=EPS, residual=True)
            return m, None
        out, _ = jax.lax.scan(body, x, None, length=24)
        return out

    ref = None
    if "pair" in which:
        ref = timed("pair v0+qmlp x24", pair24, *attn_args)

    # attention-only variants, 24-scan (compare against round-2's 74.2 ms)
    for name in ("v5", "v6", "v6b", "v4"):
        if name not in which:
            continue

        @functools.partial(jax.jit, compiler_options=OPTS)
        def attn24(x, *rest, n=name):
            def body(carry, _):
                return _attn_call(carry, *rest, variant=n), None
            out, _ = jax.lax.scan(body, x, None, length=24)
            return out
        timed(f"attn-{name} x24", attn24, *attn_args)

    # whole-layer fused kernel, 24-scan
    for name, var in (("fused", "v0"), ("fused6b", "v6b"), ("fused5", "v5"),
                      ("fused6", "v6"), ("fused4", "v4")):
        if name not in which:
            continue

        @functools.partial(jax.jit, compiler_options=OPTS)
        def layer24(x, *rest, v=var):
            def body(carry, _):
                return _layer_call(carry, *rest, variant=v), None
            out, _ = jax.lax.scan(body, x, None, length=24)
            return out
        timed(f"{name}({var}) x24", layer24, *attn_args, *mlp_rest,
              ref=ref)


if __name__ == "__main__":
    main()
