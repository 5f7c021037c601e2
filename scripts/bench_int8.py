"""Perf probe: ViT-L/16 encode — bf16 vs int8 (fused MLP-pair) on one chip.

Run on the TPU (axon relay): timings fetch a scalar per loop (relay's
block_until_ready is a no-op); ≥10 iters amortize dispatch overhead.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from keep_tpu.configs import ViTConfig
from keep_tpu.models import vit
from keep_tpu.quant import quantize_linear_weights
from keep_tpu.utils.compile import tpu_compiler_options


def timed(fwd, params, x, iters=10):
    float(jnp.sum(fwd(params, x)))  # compile + warmup
    t0 = time.time()
    for _ in range(iters):
        r = fwd(params, x)
    float(jnp.sum(r))
    return (time.time() - t0) / iters


def main():
    cfg = ViTConfig()
    params = vit.init(jax.random.PRNGKey(0), cfg)
    params = vit.fold_layerscale(params)
    qparams = quantize_linear_weights(params)
    bs = 256
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (bs, 224, 224, 3), dtype=np.float32))
    on_tpu = jax.default_backend() == "tpu"

    fwd = jax.jit(
        lambda p, xx: vit.forward(p, xx, cfg, dtype=jnp.bfloat16,
                                  use_flash=on_tpu, gelu_approx=True),
        compiler_options=tpu_compiler_options(),
    )

    out = {}
    dt = timed(fwd, params, x)
    out["bf16"] = {"ms": round(dt * 1e3, 1), "pps": round(bs / dt, 1)}

    dt = timed(fwd, qparams, x)
    out["int8_fused_mlp"] = {"ms": round(dt * 1e3, 1), "pps": round(bs / dt, 1)}

    a = np.asarray(fwd(params, x), np.float32)
    b = np.asarray(fwd(qparams, x), np.float32)
    cos = float(np.mean(
        np.sum(a * b, 1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    ))
    out["cos_int8_vs_bf16"] = round(cos, 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
