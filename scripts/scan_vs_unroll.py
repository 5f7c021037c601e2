"""Is lax.scan over stacked weights what kills in-model int8?

Times the full ViT-L forward with blocks run (a) under lax.scan over the
stacked [24, ...] params (the shipped path), (b) unrolled in Python with
per-layer param slices taken OUTSIDE the traced scan.
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


def forward_unrolled(params, x, cfg, dtype, use_flash, gelu_approx):
    b, h, w, _ = x.shape
    ps = cfg.patch_size
    x = x.astype(dtype)
    tokens = vit.patchify(params["patch_embed"], x, ps)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = vit.resample_pos_embed(params["pos_embed"], (h // ps, w // ps),
                                 cfg.num_prefix_tokens)
    tokens = tokens + pos.astype(dtype)
    for i in range(cfg.depth):
        layer = jax.tree.map(lambda p: p[i], params["blocks"])
        tokens = vit.block(layer, tokens, cfg, use_flash=use_flash,
                           gelu_approx=gelu_approx)
    from keep_tpu.ops.nn import layer_norm

    tokens = layer_norm(params["norm"], tokens, cfg.ln_eps)
    return tokens[:, 0]


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
    qall = quantize_linear_weights(base)
    bs = 256
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (bs, 224, 224, 3), dtype=np.float32))
    opts = tpu_compiler_options()

    unrolled = jax.jit(
        lambda p, xx: forward_unrolled(p, xx, cfg, jnp.bfloat16, True, True),
        compiler_options=opts)
    for name, p in (("int8_all_unrolled", qall), ("bf16_unrolled", base)):
        dt = timed(unrolled, p, x)
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 1),
                          "pps": round(bs / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
