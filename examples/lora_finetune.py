"""LoRA fine-tuning of a released KEEP checkpoint on a small cohort,
then merge + serve — the parameter-efficient path a pathology lab takes
to adapt the foundation model (beyond the reference, whose only controls
are whole-tower locking and freeze epochs).

Two ways to run it:

1. The training CLI (everything the full trainer offers — freeze phases,
   resume, in-training zero-shot eval, mesh dp): add to your YAML

       solver:
         lora_rank: 8        # 0 = full fine-tuning
         lora_alpha: 16.0
         # lora_targets: [qkv, proj, out, fc1, fc2]   # default

   and train as usual:  python -m keep_tpu.train.main --config cfg.yml
   Checkpoints store the ADAPTER tree only (a few MB).

2. The library loop below: explicit control over every step.

Usage: python examples/lora_finetune.py /path/to/KEEP_release out_dir
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from keep_tpu.models.keep import KEEPModel
from keep_tpu.train import lora, optim, schedules
from keep_tpu.train.trainer import LossConfig, make_train_step, tree_state


def main(model_path: str, out_dir: str):
    model = KEEPModel.from_pretrained(model_path, dtype=jnp.bfloat16)
    base, cfg = model.params, model.cfg

    rank, alpha = 8, 16.0
    scale = alpha / rank
    adapters = lora.init_lora(jax.random.PRNGKey(0), base, rank)
    n_ad, _ = lora.lora_param_count(adapters)
    print(f"training {n_ad:,} adapter params; base frozen")

    tx = optim.adamw(schedules.cosine_lr(1e-4, 20, 200), weight_decay=0.0)
    state = tree_state(adapters, tx)
    step = make_train_step(cfg, LossConfig(kind="clip"), tx,
                           dtype=jnp.bfloat16, donate=False,
                           use_flash=jax.default_backend() == "tpu",
                           lora_scale=scale)

    # your cohort here: (pixels [B,224,224,3] fp32, tokenized captions)
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(rng.standard_normal(
            (16, cfg.vision.img_size, cfg.vision.img_size, 3)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(1, cfg.text.vocab_size, (16, 64))),
        "attention_mask": jnp.ones((16, 64), jnp.int32),
    }
    for i in range(10):
        state, metrics = step(state, batch, None, base)
        print(f"step {i}: loss {float(metrics['loss']):.4f}")

    # bake the adapters into a standalone model and save it in the released
    # HF layout — ready for KEEPModel.from_pretrained / serve.py / quantize
    from keep_tpu.compat.export import save_pretrained

    merged = lora.merge_lora(base, state.params, scale)
    save_pretrained(out_dir, merged, cfg)
    print(f"merged model saved to {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
