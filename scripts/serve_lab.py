"""Serving lab: per-bucket precision A/B + concurrent-load latency.

Round-3 verdict: `serve.py --int8` applied int8 globally, but the e2e
batch-1 tile+3-prompt path measured SLOWER int8 than bf16, and the server
had no p50/p99 under concurrent load. This lab measures, on the real chip:

  (a) per-bucket, per-tower latency for bf16 vs int8 at the serving buckets
      (1/8/32/128) — the data the per-bucket precision policy in serve.py
      ships with;
  (b) the InferenceServer core under concurrent clients: p50/p99 latency,
      throughput, dispatch counts (the micro-batching claim, measured).

Usage:
  python scripts/serve_lab.py ab            # (a) bucket x precision table
  python scripts/serve_lab.py load [--int8] # (b) load test (core-level)

One JSON line per measurement.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from keep_tpu.configs import KEEPConfig, PreprocessConfig
from keep_tpu.models import keep

BUCKETS = (1, 8, 32, 128)


def build_models():
    cfg = KEEPConfig()
    on_tpu = jax.default_backend() == "tpu"
    bf16 = keep.KEEPModel(params=keep.init(jax.random.PRNGKey(0), cfg),
                          cfg=cfg, dtype=jnp.bfloat16, use_flash=on_tpu)
    return cfg, bf16, bf16.quantize()


def timed(fn, iters=20):
    np.asarray(fn())  # compile + warmup
    np.asarray(fn())
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    np.asarray(r)  # fetch = sync through the relay
    return (time.time() - t0) / iters * 1e3


def run_ab():
    from keep_tpu.ops.preprocess import normalize_only

    cfg, bf16, int8 = build_models()
    pcfg = PreprocessConfig()
    rng = np.random.default_rng(0)
    for b in BUCKETS:
        tiles = jnp.asarray(rng.integers(0, 255, (b, 224, 224, 3),
                                         dtype=np.uint8))
        ids = jnp.asarray(rng.integers(1, cfg.text.vocab_size, (b, 256)))
        mask = jnp.ones((b, 256), jnp.int32)
        rec = {"bucket": b}
        for name, m in (("bf16", bf16), ("int8", int8)):
            rec[f"image_{name}_ms"] = round(timed(
                lambda m=m: m.encode_image(normalize_only(tiles, pcfg))), 2)
            rec[f"text_{name}_ms"] = round(timed(
                lambda m=m: m.encode_text(ids, mask)), 2)
        rec["image_winner"] = ("int8" if rec["image_int8_ms"]
                               < rec["image_bf16_ms"] else "bf16")
        rec["text_winner"] = ("int8" if rec["text_int8_ms"]
                              < rec["text_bf16_ms"] else "bf16")
        print(json.dumps(rec), flush=True)


def run_load(int8: bool, n_clients: int = 16, req_tiles: int = 16,
             n_requests: int = 8, texts_per_req: int = 4):
    """Concurrent clients against the InferenceServer CORE (no HTTP): each
    client fires `n_requests` image requests of `req_tiles` tiles plus text
    requests, recording per-request wall latency."""
    from keep_tpu.serve import InferenceServer

    cfg, bf16, q = build_models()
    model = q if int8 else bf16

    class Tok:  # serving only needs ids+mask; WordPiece is orthogonal here
        def __call__(self, texts, max_length=256):
            n = len(texts)
            ids = np.ones((n, max_length), np.int64)
            return {"input_ids": ids, "attention_mask": np.ones_like(ids)}

    core = InferenceServer(model, Tok(), max_length=256, image_size=224)
    t0 = time.time()
    core.warmup()
    warm_s = time.time() - t0

    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 255, (req_tiles, 224, 224, 3), dtype=np.uint8)
    img_lat, txt_lat = [], []
    lock = threading.Lock()

    def client(k):
        for _ in range(n_requests):
            t0 = time.time()
            core.encode_image(tiles)
            li = time.time() - t0
            t0 = time.time()
            core.encode_text(["a photo of tumor tissue"] * texts_per_req)
            lt = time.time() - t0
            with lock:
                img_lat.append(li)
                txt_lat.append(lt)

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(k,))
               for k in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    stats = core.stats()
    core.stop()

    total_tiles = n_clients * n_requests * req_tiles
    total_txt = n_clients * n_requests * texts_per_req

    def pct(v, p):
        return round(float(np.percentile(np.array(v) * 1e3, p)), 1)

    print(json.dumps({
        "precision": "int8" if int8 else "bf16",
        "clients": n_clients, "tiles_per_req": req_tiles,
        "warmup_s": round(warm_s, 1),
        "wall_s": round(wall, 2),
        "images_per_s": round(total_tiles / wall, 1),
        "texts_per_s": round(total_txt / wall, 1),
        "img_p50_ms": pct(img_lat, 50), "img_p99_ms": pct(img_lat, 99),
        "txt_p50_ms": pct(txt_lat, 50), "txt_p99_ms": pct(txt_lat, 99),
        "image_dispatches": stats["image"]["dispatches"],
        "text_dispatches": stats["text"]["dispatches"],
        "image_bucket_hits": stats["image"]["bucket_hits"],
        "text_bucket_hits": stats["text"]["bucket_hits"],
        "requests": n_clients * n_requests,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["ab", "load"])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--tiles", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8,
                    help="requests per client (docs/PERF.md run: 8)")
    ap.add_argument("--texts", type=int, default=4,
                    help="texts per request (docs/PERF.md run: 4)")
    args = ap.parse_args()
    if args.mode == "ab":
        run_ab()
    else:
        run_load(args.int8, n_clients=args.clients, req_tiles=args.tiles,
                 n_requests=args.requests, texts_per_req=args.texts)


if __name__ == "__main__":
    main()
