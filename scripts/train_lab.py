"""Train-step lab, round 3: two unmeasured throughput knobs.

Round 2 measured the full KEEP HyMetric train step at 127.8 samples/s
(B=64, full per-block remat — mandatory: no-remat needs ~30 GB) and showed
dot-saving remat POLICIES don't fit (docs/PERF.md). Unmeasured:

  (a) batch size: does B=96/128 still fit under full remat, and does the
      fatter backward buy throughput?
  (b) per-TOWER selective remat: remat the ViT (the memory hog) but save
      the BERT tower's activations (≈ skip one BERT forward in the
      backward). BERT @256 tokens is ~1/4 of the step's FLOPs.

Usage: python scripts/train_lab.py [b64 b96 b128 b64-textsave b96-textsave]
One JSON line per config: ms/step + samples/s (OOM prints an error line).

Round-3 session-3 additions — optimizer-memory knobs toward unlocking B>64:
  bNN-mu16      AdamW with the first moment in bf16 (-0.85 GB)
  bNN-adafactor Adafactor (factored 2nd moment, no 1st; -3.3 GB vs AdamW)
RUN ONE CONFIG PER PROCESS on the real chip: a prior config's buffers
fragment the arena and produce spurious OOMs (docs/PERF.md caveat).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from keep_tpu.configs import KEEPConfig
from keep_tpu.models import keep
from keep_tpu.train import optim, schedules
from keep_tpu.train import trainer
from keep_tpu.train.trainer import LossConfig, make_train_step, tree_state

CAPTION_NUM = 8  # groups per batch; batch = CAPTION_NUM * n_instances


def make_batch(batch_size, cfg):
    rng = np.random.default_rng(0)
    n_id = CAPTION_NUM
    return {
        "pixels": jnp.asarray(rng.standard_normal(
            (batch_size, 224, 224, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(
            1, cfg.text.vocab_size, (batch_size, 256))),
        "attention_mask": jnp.ones((batch_size, 256), jnp.int32),
        "node_connection": jnp.ones((n_id, n_id), jnp.float32),
    }


def build(batch_size, cfg, loss_cfg, tx):
    params = keep.init(jax.random.PRNGKey(0), cfg)
    state = tree_state(params, tx)
    rng = np.random.default_rng(0)
    n_id = CAPTION_NUM
    batch = {
        "pixels": jnp.asarray(rng.standard_normal(
            (batch_size, 224, 224, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(
            1, cfg.text.vocab_size, (batch_size, 256))),
        "attention_mask": jnp.ones((batch_size, 256), jnp.int32),
        "node_connection": jnp.ones((n_id, n_id), jnp.float32),
    }
    return state, batch


def timed(name, step, state, batch, iters=8):
    try:
        state, m = step(state, batch, None)
        float(m["loss"])  # compile + fetch
        t0 = time.time()
        for _ in range(iters):
            state, m = step(state, batch, None)
        float(m["loss"])
        ms = (time.time() - t0) / iters * 1e3
        bs = batch["pixels"].shape[0]
        print(json.dumps({"name": name, "ms": round(ms, 1),
                          "samples_per_s": round(bs / (ms / 1e3), 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"name": name, "error": str(e)[:200]}), flush=True)


def main():
    which = sys.argv[1:] or ["b64", "b96", "b128", "b64-textsave"]
    cfg = KEEPConfig()
    loss_cfg = LossConfig(kind="hierarchy_metric", caption_num=CAPTION_NUM)
    import optax
    lr = schedules.cosine_lr(1e-5, 100, 10000)

    def make_tx(variant):
        if variant == "adafactor":
            return optax.chain(optax.clip_by_global_norm(1.0),
                               optax.adafactor(learning_rate=lr))
        mu = jnp.bfloat16 if variant == "mu16" else None
        return optim.adamw(lr, weight_decay=0.2, grad_clip_norm=1.0,
                           mu_dtype=mu)

    orig_encode = trainer._encode_batch

    def encode_textsave(params, batch, cfg, dtype, use_flash, remat=True,
                        **_kw):
        img = keep.encode_image(params, batch["pixels"], cfg, dtype=dtype,
                                use_flash=use_flash, remat=True)
        txt = keep.encode_text(
            params, batch["input_ids"], batch.get("attention_mask"),
            batch.get("token_type_ids"), cfg, dtype=dtype,
            use_flash=use_flash, remat=False)  # save BERT activations
        return img, txt, jnp.zeros((), jnp.float32)

    for name in which:
        parts = name.split("-")
        bs = int(parts[0][1:])
        textsave = "textsave" in parts[1:]
        lora_rank = next((int(p[4:]) for p in parts[1:]
                          if p.startswith("lora")), 0)
        variant = next((p for p in parts[1:]
                        if p != "textsave" and not p.startswith("lora")), None)
        tx = make_tx(variant)
        trainer._encode_batch = encode_textsave if textsave else orig_encode
        try:
            if lora_rank:
                # rank-r adapters: optimizer state ~0.4% of AdamW's; the
                # question is whether the freed HBM unlocks B > 64.
                # Build base WITHOUT tree_state: transiently allocating the
                # full-model AdamW moments would fragment the arena (the
                # run-one-config-per-process caveat above) and taint the
                # memory probe this config exists for
                from keep_tpu.train import lora as lora_mod

                base = keep.init(jax.random.PRNGKey(0), cfg)
                batch = make_batch(bs, cfg)
                adapters = lora_mod.init_lora(
                    jax.random.PRNGKey(1), base, lora_rank)
                state = trainer.tree_state(adapters, tx)
                raw = make_train_step(cfg, loss_cfg, tx, dtype=jnp.bfloat16,
                                      use_flash=True, donate=False,
                                      lora_scale=16.0 / lora_rank)
                step = lambda s, b, f: raw(s, b, f, base)
            else:
                step = make_train_step(cfg, loss_cfg, tx, dtype=jnp.bfloat16,
                                       use_flash=True, donate=False)
                state, batch = build(bs, cfg, loss_cfg, tx)
            timed(name, step, state, batch)
            del state, batch
        finally:
            trainer._encode_batch = orig_encode


if __name__ == "__main__":
    main()
