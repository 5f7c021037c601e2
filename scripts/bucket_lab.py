"""Perf probe: length-bucketed prompt encoding vs the reference's flat
max_length=256 padding, full BERT-base text tower, one chip.

The reference tokenizes every prompt at ``max_length=256, padding='max_length'``
(quick_start/keep_inference.py:99) while its shipped WSI prompt corpora are
~10-25 tokens; BERT masks padded keys out of attention, so bucketed encoding
(32/64/128/256) is numerically identical and skips the padded MXU work.
This measures the end-to-end classifier-corpus encode (CPTAC-CM-sized: 1,386
prompts x 2 classes = 2,772 texts) both ways, bf16 and int8.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig
from keep_tpu.models import bert
from keep_tpu.quant import quantize_linear_weights
from keep_tpu.zeroshot import encode_texts_bucketed


def make_corpus(n=2772, rng=None):
    """Token ids/mask with the shipped prompt files' length profile:
    'An H&E image of <phrase>.' -> mostly 8-24 tokens, tail to ~40."""
    rng = rng or np.random.default_rng(0)
    lengths = np.clip(rng.normal(16, 5, n).astype(int), 6, 40)
    ids = np.zeros((n, 256), np.int32)
    mask = np.zeros((n, 256), np.int32)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(1, 30000, ln)
        mask[i, :ln] = 1
    return ids, mask


def run(encode, ids, mask, buckets, batch_size=256):
    # warm every compiled shape first, then time the steady-state pass
    encode_texts_bucketed(encode, ids, mask, batch_size=batch_size,
                          length_buckets=buckets)
    t0 = time.time()
    out = encode_texts_bucketed(encode, ids, mask, batch_size=batch_size,
                                length_buckets=buckets)
    return time.time() - t0, out


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = BertConfig()
    params = bert.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_linear_weights(params)
    ids, mask = make_corpus()

    @jax.jit
    def f(p, i, m):
        out = bert.forward(p, i, m, cfg=cfg, dtype=jnp.bfloat16,
                           use_flash=on_tpu, gelu_approx=True)
        x = out["pooler_output"].astype(jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    def make_encode(p):
        # params ride as runtime args (device-resident), NOT jit constants —
        # closure capture embeds 440 MB into the HLO and the relay's
        # remote_compile rejects the request body (HTTP 413)
        placed = jax.device_put(p)
        return lambda i, m: f(placed, i, m)

    results = {"n_texts": int(ids.shape[0])}
    for name, p in [("bf16", params), ("int8", qparams)]:
        encode = make_encode(p)
        t_flat, ref = run(encode, ids, mask, None)
        t_bkt, got = run(encode, ids, mask, (32, 64, 128, 256))
        cos = float(np.mean(np.sum(ref * got, 1)))
        results[name] = {
            "flat_s": round(t_flat, 3),
            "bucketed_s": round(t_bkt, 3),
            "speedup": round(t_flat / t_bkt, 2),
            "texts_per_s_bucketed": round(ids.shape[0] / t_bkt, 1),
            "cos_bucketed_vs_flat": round(cos, 6),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
