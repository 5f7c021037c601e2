"""Perf probe: pipelined vs synchronous feature extraction, full ViT-L int8.

extract_features now keeps one batch in flight (dispatch N+1 before fetching
N). Through the axon relay the per-batch uint8 upload (~38 MB at batch 256)
dominates compute, so the overlap win here is a lower bound on co-located
hardware where upload and compute are comparable.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from keep_tpu.configs import KEEPConfig, PreprocessConfig
from keep_tpu.models import keep
from keep_tpu.ops.preprocess import normalize_only
from keep_tpu.wsi.extract import extract_features


def main():
    cfg = KEEPConfig()
    model = keep.KEEPModel(
        params=keep.init(jax.random.PRNGKey(0), cfg), cfg=cfg,
        dtype=jnp.bfloat16, use_flash=jax.default_backend() == "tpu",
    ).quantize()
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 255, (2048, 224, 224, 3), dtype=np.uint8)
    bs = 256

    def sync_extract(tiles):
        outs = []
        for i in range(0, len(tiles), bs):
            chunk = tiles[i : i + bs]
            pixels = normalize_only(jnp.asarray(chunk), PreprocessConfig())
            outs.append(np.asarray(model.encode_image(pixels)))
        return np.concatenate(outs)

    # warmup/compile both paths once
    extract_features(model, tiles[:bs], batch_size=bs)
    sync_extract(tiles[:bs])

    t0 = time.time()
    a = extract_features(model, tiles, batch_size=bs)
    t_pipe = time.time() - t0

    t0 = time.time()
    b = sync_extract(tiles)
    t_sync = time.time() - t0

    assert np.allclose(a, b, atol=1e-2), np.abs(a - b).max()
    print(json.dumps({
        "n_tiles": len(tiles),
        "sync_s": round(t_sync, 2),
        "pipelined_s": round(t_pipe, 2),
        "speedup": round(t_sync / t_pipe, 3),
        "tiles_per_s_pipelined": round(len(tiles) / t_pipe, 1),
    }))


if __name__ == "__main__":
    main()
