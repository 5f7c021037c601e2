"""Kernel lab: isolate the ViT-L MLP shapes and find where int8 time goes.

Shapes: x [M=50432, 1024] (batch 256 × 197 tokens), fc1 1024→4096,
fc2 4096→1024 — one layer's MLP. Prints one JSON line per variant as it
completes (axon-relay timing: 10 dispatched iters + one scalar fetch).

Learned: standalone jits get a 16 MB scoped-VMEM limit — pass
xla_tpu_scoped_vmem_limit_kib=65536 like the model forward does.
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, D, F = 50432, 1024, 4096
OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def timed(name, fn, *args, iters=10, tf=None):
    try:
        float(jnp.sum(fn(*args)))
        t0 = time.time()
        for _ in range(iters):
            r = fn(*args)
        float(jnp.sum(r))
        ms = (time.time() - t0) / iters * 1e3
        rec = {"name": name, "ms": round(ms, 2)}
        if tf:
            rec["tf_s"] = round(tf / (ms / 1e3), 1)
        print(json.dumps(rec), flush=True)
    except Exception as e:
        print(json.dumps({"name": name, "error": str(e)[:200]}), flush=True)


def _gelu_tanh(x):
    c = 0.7978845608028654
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal((D, F)) * 0.03).astype(np.float32))
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray((rng.standard_normal((F, D)) * 0.03).astype(np.float32))
    b2 = jnp.zeros((D,), jnp.float32)
    tf1 = 2 * M * D * F / 1e12  # one fc dot
    from keep_tpu.quant import quantize_kernel

    q1 = quantize_kernel(w1)
    q2 = quantize_kernel(w2)

    jit = functools.partial(jax.jit, compiler_options=OPTS)

    # 1) bf16 XLA references
    def bf16_mlp(a):
        h = jnp.dot(a, w1.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + b1, approximate=True).astype(jnp.bfloat16)
        return jnp.dot(h, w2.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    timed("bf16_xla_mlp", jit(bf16_mlp), x, tf=2 * tf1)

    def bf16_dot(a):
        return jnp.dot(a, w1.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    timed("bf16_xla_fc1_dot", jit(bf16_dot), x, tf=tf1)

    # 2) bare Pallas int8 dots (pre-quantized input, no epilogue)
    xq = jnp.asarray(np.clip(np.round(np.asarray(x, np.float32) * 4), -127,
                             127).astype(np.int8))

    def bare(tile_m, out_i8):
        def kern(x_ref, w_ref, o_ref):
            acc = jax.lax.dot_general(
                x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:] = (acc >> 8).astype(jnp.int8) if out_i8 else acc

        dt = jnp.int8 if out_i8 else jnp.int32
        return jit(lambda a, w: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, F), dt),
            grid=(pl.cdiv(M, tile_m),),
            in_specs=[
                pl.BlockSpec((tile_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(flops=2 * M * D * F,
                                          bytes_accessed=M * D + D * F + M * F,
                                          transcendentals=0),
        )(a, w))

    timed("pallas_int8_fc1_i32out_t256", bare(256, False), xq, q1["kernel_q"], tf=tf1)
    timed("pallas_int8_fc1_i8out_t256", bare(256, True), xq, q1["kernel_q"], tf=tf1)
    timed("pallas_int8_fc1_i8out_t512", bare(512, True), xq, q1["kernel_q"], tf=tf1)

    # 3) current fused qmlp kernel (fp32 epilogue)
    from keep_tpu.kernels.qmlp import quantized_mlp

    timed("qmlp_fused_t256",
          jit(lambda a: quantized_mlp(a, q1["kernel_q"], q1["scale"], b1,
                                      q2["kernel_q"], q2["scale"], b2)),
          x, tf=2 * tf1)

    # 4) fused qmlp variant: bf16 epilogue math (half the VPU bytes)
    def qmlp_bf16_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                         b2_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        a1 = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        xq_ = jnp.clip(jnp.round(xf * (1.0 / a1)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq_, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = acc.astype(jnp.bfloat16)
        h = h * (a1.astype(jnp.bfloat16) * s1_ref[0][None, :].astype(jnp.bfloat16))
        h = h + b1_ref[0][None, :].astype(jnp.bfloat16)
        h = _gelu_tanh(h)
        amax2 = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1, keepdims=True)
        a2 = jnp.maximum(amax2, 1e-8) * (1.0 / 127.0)
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) * (1.0 / a2)), -127,
                      127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc2.astype(jnp.float32) * (a2 * s2_ref[0][None, :])
        o_ref[:] = (out + b2_ref[0][None, :]).astype(o_ref.dtype)

    def qmlp_variant(kern, tile_m):
        const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                           memory_space=pltpu.VMEM)
        return jit(lambda a: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
            grid=(pl.cdiv(M, tile_m),),
            in_specs=[
                pl.BlockSpec((tile_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                const((D, F)), const((1, F)), const((1, F)),
                const((F, D)), const((1, D)), const((1, D)),
            ],
            out_specs=pl.BlockSpec((tile_m, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(flops=4 * M * D * F,
                                          bytes_accessed=M * D * 4 + D * F * 2,
                                          transcendentals=M * F),
        )(a, q1["kernel_q"], q1["scale"].reshape(1, F), b1.reshape(1, F),
          q2["kernel_q"], q2["scale"].reshape(1, D), b2.reshape(1, D)))

    timed("qmlp_bf16_epilogue_t256", qmlp_variant(qmlp_bf16_kernel, 256),
          x, tf=2 * tf1)

    # 5) old two-kernel path
    from keep_tpu.kernels.qmatmul import qlinear_fused

    p1 = {"kernel_q": q1["kernel_q"], "scale": q1["scale"], "bias": b1}
    p2 = {"kernel_q": q2["kernel_q"], "scale": q2["scale"], "bias": b2}

    def old_path(a):
        return qlinear_fused(p2, qlinear_fused(p1, a, activation="gelu_tanh"))

    timed("old_two_kernel_int8", jit(old_path), x, tf=2 * tf1)


if __name__ == "__main__":
    main()
