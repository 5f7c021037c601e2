"""Benchmark: ViT-L/16 encode_image throughput (224² patches/sec/chip).

The reference publishes no throughput numbers (SURVEY §6); BASELINE.json sets
a 20K patches/s/chip north star. Physics check: ViT-L/16 @224² is ~122.6
GFLOPs/patch, so one v5e chip (197 TFLOP/s bf16 peak) tops out near ~1,600
patches/s at 100% MXU — the JSON reports measured patches/s with
``vs_baseline`` against the 20K target and ``sol_fraction`` against the
single-chip speed-of-light.

Note: through the axon relay ``block_until_ready`` is a no-op; timing uses a
scalar fetch per iteration (adds ~30ms/iter of relay latency — measured
throughput is therefore a lower bound).
"""

import json
import os
import time

import numpy as np

FLOPS_PER_PATCH = 122.6e9
PEAK_TFLOPS = 197e12
BASELINE = 20000.0


def main():
    import jax
    import jax.numpy as jnp

    from keep_tpu.configs import ViTConfig
    from keep_tpu.models import vit

    on_tpu = jax.default_backend() == "tpu"
    cfg = ViTConfig()
    if os.environ.get("KEEP_BENCH_TINY"):  # CI smoke: exercise the contract
        cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                        num_heads=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    bs = 256 if on_tpu else 8
    from keep_tpu.utils.compile import tpu_compiler_options

    fwd = jax.jit(
        lambda p, x: vit.forward(
            p, x, cfg, dtype=jnp.bfloat16, use_flash=on_tpu, gelu_approx=True
        ),
        compiler_options=tpu_compiler_options(),
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (bs, cfg.img_size, cfg.img_size, 3), dtype=np.float32
        )
    )

    # warmup (compile) + steady state with forced materialization
    float(jnp.sum(fwd(params, x)))
    iters = 10 if on_tpu else 2
    t0 = time.time()
    for _ in range(iters):
        r = fwd(params, x)
    float(jnp.sum(r))
    dt = (time.time() - t0) / iters

    pps = bs / dt
    sol = PEAK_TFLOPS / FLOPS_PER_PATCH
    print(
        json.dumps(
            {
                "metric": "vit_l16_encode_224_patches_per_sec_per_chip",
                "value": round(pps, 1),
                "unit": "patches/s",
                "vs_baseline": round(pps / BASELINE, 4),
                "sol_fraction": round(pps / sol, 4),
                "batch_size": bs,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
