"""Why does the LoRA 200-step memorization curve plateau? (round 5)

On the fixed group-blocked batch, full fine-tune grinds HyMetricLoss from
4.94 to ~0 by step ~170 while rank-8 LoRA drops to ~4.83 in two steps and
flatlines — at 1e-4 AND 1e-3 lr, on chip (bf16) AND tiny-CPU (fp32). This
lab isolates the variable: same tiny config, same batch, same optimizer,
sweeping adapter rank (and full FT as the reference) for N steps.

If the plateau lifts with rank, the explanation is expressivity: low-rank
residuals on a frozen RANDOM-INIT base cannot realize the feature geometry
hard-mining contrastive memorization needs (on a pretrained base the
residual needed is small — the published LoRA regime). If rank doesn't
move it, something structural in the LoRA step is wrong.

Usage: python scripts/lora_curve_lab.py [--steps=200]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.models import keep
from keep_tpu.train import lora as lora_mod, optim, schedules
from keep_tpu.train.trainer import LossConfig, make_train_step, tree_state

CAPTION_NUM = 4


def tiny_cfg():
    return KEEPConfig(
        vision=ViTConfig(img_size=32, patch_size=16, embed_dim=64,
                         depth=2, num_heads=4),
        text=BertConfig(vocab_size=64, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=128,
                        max_position_embeddings=32),
        projection_dim=64,
    )


def make_batch(rng, batch_size, cfg):
    n_id = min(CAPTION_NUM, batch_size)
    seq = min(cfg.max_text_length, cfg.text.max_position_embeddings)
    return {
        "pixels": jnp.asarray(rng.standard_normal(
            (batch_size, cfg.vision.img_size, cfg.vision.img_size, 3)
        ).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(
            1, cfg.text.vocab_size, (batch_size, seq))),
        "attention_mask": jnp.ones((batch_size, seq), jnp.int32),
        "node_connection": jnp.ones((n_id, n_id), jnp.float32),
    }


def run(cfg, batch, steps, rank=None, lr=1e-3, dtype=jnp.float32):
    loss_cfg = LossConfig(kind="hierarchy_metric", caption_num=CAPTION_NUM)
    tx = optim.adamw(schedules.cosine_lr(lr, warmup_length=2, steps=100000),
                     weight_decay=0.2, grad_clip_norm=1.0)
    base = keep.init(jax.random.PRNGKey(0), cfg)
    if rank is None:
        state = tree_state(base, tx)
        raw = make_train_step(cfg, loss_cfg, tx, dtype=dtype,
                              donate=False)
        step = lambda s, b: raw(s, b, None)
    else:
        adapters = lora_mod.init_lora(jax.random.PRNGKey(1), base, rank)
        state = tree_state(adapters, tx)
        raw = make_train_step(cfg, loss_cfg, tx, dtype=dtype,
                              donate=False, lora_scale=16.0 / rank)
        step = lambda s, b: raw(s, b, None, base)
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    return losses


def main():
    steps = 200
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    batch = make_batch(rng, 8, cfg)
    grid = [
        ("full_fp32", None, 1e-3, jnp.float32),
        ("lora_r2_fp32", 2, 1e-3, jnp.float32),
        ("lora_r8_fp32", 8, 1e-3, jnp.float32),
        ("lora_r32_fp32", 32, 1e-3, jnp.float32),
        ("lora_r64_fp32", 64, 1e-3, jnp.float32),
        # the chip regime is bf16 compute: does the adapter signal survive
        # the rounding of (frozen tower output + tiny residual)?
        ("full_bf16", None, 1e-3, jnp.bfloat16),
        ("lora_r8_bf16", 8, 1e-3, jnp.bfloat16),
        # and the chip lr, fp32: is the plateau just a timescale artifact?
        ("lora_r8_fp32_lr1e-4", 8, 1e-4, jnp.float32),
    ]
    for label, rank, lr, dtype in grid:
        losses = run(cfg, batch, steps, rank=rank, lr=lr, dtype=dtype)
        stride = max(1, len(losses) // 10)
        print(json.dumps({
            "config": label,
            "loss_first": round(losses[0], 4),
            "loss_min": round(min(losses), 4),
            "loss_last": round(losses[-1], 4),
            "curve": [round(v, 4) for v in losses[::stride]],
        }), flush=True)


if __name__ == "__main__":
    main()
