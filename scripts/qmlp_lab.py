"""MLP-pair lab, round 4: the two bounded frontier items from the round-3
review of the int8 stack (docs/PERF.md "attention internals" conclusions
stand; this probes the OTHER ~70 ms — the fused fc1→GELU→fc2 pair).

(a) int4 — round 2 recorded "int4 dots don't lower through the relay
    (compile error), untested" and never retried. ``probe`` re-tests the
    three lowering routes on whatever toolchain is live today:
      xla-int4      lax.dot_general on int4 operands (XLA path)
      pallas-int4   the same dot inside a Pallas kernel
      w4a8          int4 weights upcast to int8 in-kernel (halves the
                    resident weight VMEM + HBM weight stream; MXU still
                    runs the int8 rate) — the only int4 variant whose win
                    does not depend on an int4 MXU mode existing.
(b) re-quantize bound — ~25 ms of the pair's ~70 ms (24 layers, B=256) is
    non-dot VPU time; the largest single slice is the second
    ``quant_rows`` over the [M, F] GELU output (an extra full reduce pass
    over the fp32 hidden). ``geluscale`` replaces the exact post-GELU
    abs-max with a bound computed from the PRE-GELU row max:

      amax(gelu(h_row)) <= max(gelu(max(h_row)), 0.17)

    (tanh-GELU is monotone on x>=0 and |gelu(x)| <= 0.17 for x<0), fusing
    the reduce into the pass that already reads h for the dequant — one
    fewer traversal of the [256, 4096] hidden per layer. The bound is
    tight whenever the row max exceeds ~1.35, so the int8 resolution loss
    is negligible (measured via cos below).

Usage: python scripts/qmlp_lab.py [probe geluscale pair ...]
(no args = all). One JSON line per measurement: 24-layer-scan ms +
accuracy vs the production pair kernel.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keep_tpu.kernels._cost import VMEM_LIMIT_BYTES
from keep_tpu.kernels._kops import gelu_tanh, int8_dot, quant_rows
from keep_tpu.kernels.qmlp import quantized_mlp_bsd

B, S, D, F = 256, 197, 1024, 4096
LAYERS = 24


def timed(name, fn, *args, ref=None, iters=10):
    try:
        float(jnp.sum(fn(*args)))  # warm (relay: block_until_ready no-op)
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
            rec["cos"] = round(
                float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
    except Exception as e:
        rec = {"name": name, "error": f"{type(e).__name__}: {e}"[:300]}
    print(json.dumps(rec), flush=True)
    return rec


# ---------------------------------------------------------------- int4 probe

def probe_int4():
    """Three compile probes, each reported independently — the question is
    which lowering routes EXIST through today's relay, not their speed
    (speeds only matter once one compiles)."""
    k = jax.random.PRNGKey(0)
    xi8 = jax.random.randint(k, (256, 1024), -7, 7, jnp.int8)
    wi8 = jax.random.randint(k, (1024, 1024), -7, 7, jnp.int8)

    def xla_int4(x8, w8):
        x4 = x8.astype(jnp.int4)
        w4 = w8.astype(jnp.int4)
        return jax.lax.dot_general(
            x4, w4, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    timed("xla-int4-dot", jax.jit(xla_int4), xi8, wi8)

    def pallas_int4_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def pallas_int4(x8, w8):
        return pl.pallas_call(
            pallas_int4_kernel,
            out_shape=jax.ShapeDtypeStruct((256, 1024), jnp.int32),
        )(x8.astype(jnp.int4), w8.astype(jnp.int4))

    timed("pallas-int4-dot", jax.jit(pallas_int4), xi8, wi8)

    def w4a8_kernel(x_ref, w_ref, o_ref):
        # int4 weights resident, upcast to int8 at use: the MXU runs the
        # int8 rate but the weight stream/VMEM halves
        o_ref[:] = int8_dot(x_ref[:], w_ref[:].astype(jnp.int8))

    def w4a8(x8, w8):
        return pl.pallas_call(
            w4a8_kernel,
            out_shape=jax.ShapeDtypeStruct((256, 1024), jnp.int32),
        )(x8, w8.astype(jnp.int4))

    timed("pallas-w4a8-dot", jax.jit(w4a8), xi8, wi8)


# ---------------------------------------------------- bf16-epilogue variant

def _qmlp_bf16epi_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                         b2_ref, o_ref):
    """The [M, F] hidden's elementwise chain (GELU + requant) in bf16:
    the result is requantized to 8 bits anyway, so bf16's 8 mantissa bits
    cost ~nothing in resolution IF the VPU runs bf16 elementwise faster.
    The dequant multiply-add stays fp32 (int32 accum needs the range)."""
    xf = x_ref[0].astype(jnp.float32)
    xq, a1 = quant_rows(xf)
    h = int8_dot(xq, w1_ref[:]).astype(jnp.float32)
    h = (h * (a1 * s1_ref[0][None, :]) + b1_ref[0][None, :]).astype(
        jnp.bfloat16)
    g = gelu_tanh(h)
    amax = jnp.max(jnp.abs(g.astype(jnp.float32)), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    hq = jnp.clip(jnp.round(g.astype(jnp.float32) * (1.0 / scale)),
                  -127, 127).astype(jnp.int8)
    out = int8_dot(hq, w2_ref[:]).astype(jnp.float32)
    out = out * (scale * s2_ref[0][None, :]) + b2_ref[0][None, :]
    o_ref[0] = out.astype(o_ref.dtype)


@jax.jit
def qmlp_bf16epi(x, w1_q, w1_s, b1, w2_q, w2_s, b2):
    b, s, d = x.shape
    _, f = w1_q.shape
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _qmlp_bf16epi_kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((d, f)), const((1, f)), const((1, f)),
                  const((f, d)), const((1, d)), const((1, d))],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(x, w1_q, w1_s.reshape(1, f).astype(jnp.float32),
      b1.reshape(1, f).astype(jnp.float32),
      w2_q, w2_s.reshape(1, d).astype(jnp.float32),
      b2.reshape(1, d).astype(jnp.float32))


# ------------------------------------------------- gelu-scale-bound variant

def _qmlp_geluscale_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                           b2_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)
    xq, a1 = quant_rows(xf)
    h = int8_dot(xq, w1_ref[:]).astype(jnp.float32)
    h = h * (a1 * s1_ref[0][None, :]) + b1_ref[0][None, :]
    # row max BEFORE the GELU (fused into the pass that computes h);
    # bound: amax(gelu(row)) <= max(gelu(rowmax), 0.17)
    rowmax = jnp.max(h, axis=1, keepdims=True)
    amax = jnp.maximum(gelu_tanh(rowmax), 0.17)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    g = gelu_tanh(h)
    hq = jnp.clip(jnp.round(g * (1.0 / scale)), -127, 127).astype(jnp.int8)
    out = int8_dot(hq, w2_ref[:]).astype(jnp.float32)
    out = out * (scale * s2_ref[0][None, :]) + b2_ref[0][None, :]
    o_ref[0] = out.astype(o_ref.dtype)


@jax.jit
def qmlp_geluscale(x, w1_q, w1_s, b1, w2_q, w2_s, b2):
    b, s, d = x.shape
    _, f = w1_q.shape
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _qmlp_geluscale_kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((d, f)), const((1, f)), const((1, f)),
                  const((f, d)), const((1, d)), const((1, d))],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(x, w1_q, w1_s.reshape(1, f).astype(jnp.float32),
      b1.reshape(1, f).astype(jnp.float32),
      w2_q, w2_s.reshape(1, d).astype(jnp.float32),
      b2.reshape(1, d).astype(jnp.float32))


def make_params(key):
    ks = jax.random.split(key, 4)
    w1 = jax.random.normal(ks[0], (LAYERS, D, F), jnp.float32) * 0.02
    w2 = jax.random.normal(ks[1], (LAYERS, F, D), jnp.float32) * 0.02
    b1 = jax.random.normal(ks[2], (LAYERS, F), jnp.float32) * 0.01
    b2 = jax.random.normal(ks[3], (LAYERS, D), jnp.float32) * 0.01

    def q(w):
        amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return (jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8),
                s.squeeze(-2))

    w1q, s1 = q(w1)
    w2q, s2 = q(w2)
    return {"w1q": w1q, "s1": s1, "b1": b1, "w2q": w2q, "s2": s2, "b2": b2}


def stack(pair_fn):
    """24-layer scan of an MLP pair over the [B, S, D] stream."""
    def run(p, x):
        def body(h, leaf):
            return pair_fn(h, leaf["w1q"], leaf["s1"], leaf["b1"],
                           leaf["w2q"], leaf["s2"], leaf["b2"]), None
        out, _ = jax.lax.scan(body, x, p)
        return out
    return jax.jit(run)


def main():
    which = set(sys.argv[1:]) or {"probe", "geluscale", "bf16epi", "pair"}
    if "probe" in which:
        probe_int4()
    if not ({"geluscale", "bf16epi", "pair"} & which):
        return
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.bfloat16)

    pair = stack(lambda h, w1q, s1, b1, w2q, s2, b2: quantized_mlp_bsd(
        h, w1q, s1, b1, w2q, s2, b2, out_dtype=h.dtype))
    ref = pair(params, x)
    rec = timed("pair-baseline", pair, params, x)
    if "geluscale" in which:
        gs = stack(qmlp_geluscale)
        timed("geluscale", gs, params, x, ref=ref)
    if "bf16epi" in which:
        be = stack(qmlp_bf16epi)
        timed("bf16epi", be, params, x, ref=ref)


if __name__ == "__main__":
    main()
