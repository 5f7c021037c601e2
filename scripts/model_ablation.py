"""Model-level int8 ablation: which quantized subset helps/hurts ViT-L encode.

Isolated per-layer MLP int8 is 1.57x bf16 (scripts/kernel_lab.py) but the
fully-quantized model measured SLOWER than bf16 — this probe times the full
forward with each target subset quantized to find the regression.
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
    float(jnp.sum(fwd(params, x)))
    t0 = time.time()
    for _ in range(iters):
        r = fwd(params, x)
    float(jnp.sum(r))
    return (time.time() - t0) / iters


def main():
    cfg = ViTConfig()
    base = vit.fold_layerscale(vit.init(jax.random.PRNGKey(0), cfg))
    bs = 256
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (bs, 224, 224, 3), dtype=np.float32))
    fwd = jax.jit(
        lambda p, xx: vit.forward(p, xx, cfg, dtype=jnp.bfloat16,
                                  use_flash=True, gelu_approx=True),
        compiler_options=tpu_compiler_options(),
    )
    variants = {
        "bf16": None,
        "int8_mlp_only": ("fc1", "fc2"),
        "int8_qkv_proj_only": ("qkv", "proj"),
        "int8_all": ("qkv", "proj", "fc1", "fc2", "patch_embed"),
    }
    for name, targets in variants.items():
        p = base if targets is None else quantize_linear_weights(base, targets)
        dt = timed(fwd, p, x)
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 1),
                          "pps": round(bs / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
