"""Relay-floor decomposition lab (round 5, VERDICT weak #2).

Round 4's dispatch-bound metrics regressed 2-3x vs round 3
(e2e_single_tile 48 vs 22 ms; classifier bucketed 1.064 s vs 0.441 s) while
compute-bound metrics held. Hypothesis: the relay's per-dispatch floor
swings day-to-day and dominates few-dispatch paths. This lab measures the
pieces separately so regression vs jitter is decidable:

  1. null-dispatch RTT (scalar add + scalar fetch), median/p95/min
  2. tunnel bandwidth: upload (host->device put) and download (fetch) MB/s
  3. BERT text-tower per-dispatch cost at widths 32/64/128/256, batch 512
     (the classifier-build workload) -> fixed-cost vs per-token split
  4. e2e single tile bf16 vs int8 (the B=1 serving point)

Usage: python scripts/rtt_lab.py [--skip-model]
Emits one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(rec):
    print(json.dumps(rec), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/keep_tpu_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from keep_tpu.utils.rtt import measure_rtt

    rtt = measure_rtt(n=20)
    emit({"measure": "relay_rtt_ms", **{k: round(v, 3) if isinstance(v, float) else v
                                        for k, v in rtt.items()}})

    # -- bandwidth: the shared fresh-content measurement (utils.rtt) — an
    # earlier inline version here re-uploaded one constant buffer, which
    # the relay DEDUPS, measuring its cache instead of the link
    from keep_tpu.utils.rtt import measure_bandwidth

    bw = measure_bandwidth(mb=16.0, reps=5, refresh=True)
    emit({"measure": "tunnel_bandwidth",
          "upload_mb_per_s": round(bw["upload_mb_per_s"], 1),
          "download_mb_per_s": round(bw["download_mb_per_s"], 1),
          "mb": bw["mb"]})

    if "--skip-model" in sys.argv:
        return

    from keep_tpu.configs import KEEPConfig
    from keep_tpu.models import keep
    from keep_tpu.quant import quantize_linear_weights

    cfg = KEEPConfig()
    params = keep.init(jax.random.PRNGKey(0), cfg)
    qp = dict(params)
    qp["text"] = quantize_linear_weights(params["text"])
    rng = np.random.default_rng(0)
    bs = 512

    @jax.jit
    def encode(p, i, m):
        return keep.encode_text(p, i, m, cfg=cfg, dtype=jnp.bfloat16,
                                use_flash=True, gelu_approx=True)

    # per-width dispatch cost, int8 text tower (the classifier-build path)
    for width in (32, 64, 128, 256):
        ids = jnp.asarray(rng.integers(1, cfg.text.vocab_size, (bs, width)))
        mask = jnp.ones((bs, width), jnp.int32)
        np.asarray(encode(qp, ids, mask))  # compile + warm
        # (a) dispatch+fetch per call (what encode_texts_bucketed pays)
        ts = []
        for _ in range(8):
            t0 = time.time()
            np.asarray(encode(qp, ids, mask))
            ts.append(time.time() - t0)
        # (b) amortized: 8 async dispatches, one fetch (compute-bound floor)
        t0 = time.time()
        for _ in range(8):
            r = encode(qp, ids, mask)
        np.asarray(r)
        amortized = (time.time() - t0) / 8
        emit({"measure": "bert_dispatch_ms", "width": width, "batch": bs,
              "fetch_each_ms": round(sorted(ts)[len(ts) // 2] * 1e3, 1),
              "fetch_each_min_ms": round(min(ts) * 1e3, 1),
              "amortized_ms": round(amortized * 1e3, 1),
              "feat_download_mb": round(bs * 768 * 4 / 2**20, 2)})

    # e2e single tile bf16 vs int8 (keep_inference.py:88-104 shape)
    from keep_tpu.models.vit import fold_layerscale
    from keep_tpu.ops.preprocess import preprocess

    tile = rng.integers(0, 255, (512, 512, 3)).astype(np.uint8)
    ids3 = jnp.asarray(rng.integers(1, cfg.text.vocab_size, (3, 256)))
    mask3 = jnp.ones((3, 256), jnp.int32)
    qfull = dict(params)
    qfull["visual"] = fold_layerscale(params["visual"])
    qfull = quantize_linear_weights(qfull)

    for label, p, ga in (("bf16", params, False), ("int8", qfull, True)):
        @jax.jit
        def towers(p, raw, i, m):
            img = keep.encode_image(p, preprocess(raw), cfg,
                                    dtype=jnp.bfloat16, use_flash=True,
                                    gelu_approx=ga)
            txt = keep.encode_text(p, i, m, cfg=cfg, dtype=jnp.bfloat16,
                                   use_flash=True, gelu_approx=ga)
            return img @ txt.T

        np.asarray(towers(p, tile, ids3, mask3))
        ts = []
        for _ in range(12):
            t0 = time.time()
            np.asarray(towers(p, tile, ids3, mask3))
            ts.append(time.time() - t0)
        t0 = time.time()
        for _ in range(12):
            r = towers(p, tile, ids3, mask3)
        np.asarray(r)
        emit({"measure": "e2e_single_tile_ms", "precision": label,
              "fetch_each_ms": round(sorted(ts)[len(ts) // 2] * 1e3, 2),
              "fetch_each_min_ms": round(min(ts) * 1e3, 2),
              "amortized_ms": round((time.time() - t0) / 12 * 1e3, 2)})

    rtt2 = measure_rtt(refresh=True)
    emit({"measure": "relay_rtt_ms_after", **{k: round(v, 3) if isinstance(v, float) else v
                                              for k, v in rtt2.items()}})


if __name__ == "__main__":
    main()
