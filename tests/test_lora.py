"""LoRA adapters (train/lora.py): init/apply identity, target filtering,
gradient flow through the rank-r factors only, the CLI integration
(solver.lora_rank) with base-frozen training + adapter checkpoints +
resume, and merge-for-export equivalence."""

import dataclasses
import json
import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.models import keep
from keep_tpu.train import lora, optim, schedules
from keep_tpu.train.trainer import LossConfig, make_train_step, tree_state

pytestmark = pytest.mark.slow


def tiny_keep():
    return KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                         num_heads=2),
        text=BertConfig(vocab_size=48, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        projection_dim=32,
        max_text_length=16,
    )


def test_init_apply_identity_and_targets():
    """b=0 at init → merged == base exactly; only targeted modules carry
    adapters; shapes honor the stacked-layer axis; bad targets raise."""
    cfg = tiny_keep()
    params = keep.init(jax.random.PRNGKey(0), cfg)
    ad = lora.init_lora(jax.random.PRNGKey(1), params, rank=3,
                        targets=("qkv", "proj"))
    merged = lora.apply_lora(params, ad, scale=2.0)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # adapters exist exactly for qkv (visual+text) and proj (visual only —
    # the BERT attn out-proj is named 'out'), stacked [L, D, r]/[L, r, N]
    assert set(ad) == {"visual", "text", "logit_scale"}
    v_qkv = ad["visual"]["blocks"]["attn"]["qkv"]
    assert v_qkv["a"].shape == (2, 32, 3)
    assert v_qkv["b"].shape == (2, 3, 96)
    assert np.all(np.asarray(v_qkv["b"]) == 0)
    assert "out" not in ad["text"]["blocks"]["attn"]
    assert "mlp" not in ad["visual"]["blocks"]

    with pytest.raises(ValueError, match="no module"):
        lora.init_lora(jax.random.PRNGKey(1), params, rank=3,
                       targets=("nonexistent",))
    with pytest.raises(ValueError, match="rank"):
        lora.init_lora(jax.random.PRNGKey(1), params, rank=0)

    total, ab = lora.lora_param_count(ad)
    n_base = sum(int(math.prod(x.shape)) for x in jax.tree.leaves(params))
    assert 0 < ab < 0.1 * n_base and total == ab + 1  # + logit_scale


def test_apply_changes_only_targeted_kernels():
    cfg = tiny_keep()
    params = keep.init(jax.random.PRNGKey(0), cfg)
    ad = lora.init_lora(jax.random.PRNGKey(1), params, rank=2,
                        targets=("fc1",))
    # make the delta nonzero
    ad = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, ad)
    merged = lora.merge_lora(params, ad, scale=0.5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        keys = [getattr(p, "key", None) for p in path]
        changed = not np.allclose(np.asarray(a), np.asarray(b))
        if "logit_scale" in keys:
            assert changed  # the all-0.1 adapter tree overrides it
        else:
            assert changed == ("fc1" in keys and keys[-1] == "kernel"), path
    # delta value: kernel + 0.5 * (0.1 A) @ (0.1 B), inner dim r=2
    k = np.asarray(params["visual"]["blocks"]["mlp"]["fc1"]["kernel"])
    km = np.asarray(merged["visual"]["blocks"]["mlp"]["fc1"]["kernel"])
    np.testing.assert_allclose(km - k, 0.5 * 0.1 * 0.1 * 2, atol=1e-6)


def test_train_step_updates_adapters_only():
    """make_train_step(lora_scale=...): grads flow into a/b + logit_scale;
    the base tree the step consumes is untouched; loss decreases over a
    few steps on a fixed batch."""
    cfg = tiny_keep()
    base = keep.init(jax.random.PRNGKey(0), cfg)
    ad = lora.init_lora(jax.random.PRNGKey(1), base, rank=2)
    tx = optim.adamw(schedules.cosine_lr(5e-3, 2, 20), weight_decay=0.0)
    state = tree_state(ad, tx)
    step = make_train_step(cfg, LossConfig(kind="clip"), tx,
                           dtype=jnp.float32, donate=False, lora_scale=8.0)
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(rng.standard_normal((8, 16, 16, 3)),
                              jnp.float32),
        "input_ids": jnp.asarray(rng.integers(1, 48, (8, 16))),
        "attention_mask": jnp.ones((8, 16), jnp.int32),
    }
    base_snapshot = jax.tree.map(np.asarray, base)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, None, base)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # base untouched
    for a, b in zip(jax.tree.leaves(base_snapshot), jax.tree.leaves(base)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # the b factors moved off zero (they start at 0)
    b_leaf = np.asarray(state.params["visual"]["blocks"]["attn"]["qkv"]["b"])
    assert np.abs(b_leaf).max() > 0
    # merged model now differs from base
    merged = lora.merge_lora(base, state.params, scale=8.0)
    qk = np.asarray(merged["visual"]["blocks"]["attn"]["qkv"]["kernel"])
    assert not np.allclose(
        qk, np.asarray(base["visual"]["blocks"]["attn"]["qkv"]["kernel"]))


def test_train_cli_lora(tmp_path):
    """solver.lora_rank through train(): runs on the 8-device dp mesh,
    loses finitely, checkpoints the ADAPTER tree, resumes, and the merged
    model encodes like apply_lora(base, restored_adapters)."""
    from tests.test_train_main import make_cfg, run_dirs  # noqa: F401
    import keep_tpu.train.main as tmain
    from keep_tpu.train import checkpoint as ckpt

    # build fixtures without the fixture machinery
    import tests.test_train_main as ttm

    class _F:
        @staticmethod
        def mktemp(name):
            d = tmp_path / name
            d.mkdir()
            return d

    dirs = ttm.run_dirs.__wrapped__(_F)
    cfg = ttm.make_cfg(dirs, tmp_path / "out", epochs=2, lora_rank=2,
                       lora_alpha=4.0, freeze_visual_epochs=0,
                       freeze_text_epochs=0, zeroshot_frequency=1)
    # eval_data exercises the merged-adapter eval path (merge_eval)
    rng0 = np.random.default_rng(1)
    pixels = rng0.standard_normal((8, 16, 16, 3)).astype(np.float32)
    texts = (["an image of lung adenocarcinoma ."] * 4
             + ["melanoma of skin ."] * 4)
    res = tmain.train(cfg, eval_data={"zeroshot_ret": (pixels, texts)})
    assert np.isfinite(res["train_loss"])
    assert "zeroshot-ret-p@10" in res  # eval ran on the MERGED model
    ckpt_dir = os.path.join(str(tmp_path / "out"), "exp", "checkpoints")
    restored = ckpt.restore(ckpt_dir)
    # the checkpoint holds the adapter tree, not full params
    assert "a" in restored["params"]["visual"]["blocks"]["attn"]["qkv"]
    b_leaf = np.asarray(
        restored["params"]["visual"]["blocks"]["attn"]["qkv"]["b"])
    assert np.abs(b_leaf).max() > 0  # trained

    # resume continues from the adapter checkpoint
    cfg2 = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(cfg.solver, epochs=3),
        save=dataclasses.replace(cfg.save, resume="latest"),
    )
    res2 = tmain.train(cfg2)
    assert res2["epoch"] == 2 and np.isfinite(res2["train_loss"])

    # merged export: base rebuilt from the same seed + restored adapters
    base = tmain.build_params(cfg, cfg.seed)
    merged = lora.merge_lora(
        base, jax.tree.map(jnp.asarray, restored["params"]),
        scale=cfg.solver.lora_alpha / cfg.solver.lora_rank)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 3)), jnp.float32)
    feats = keep.encode_image(merged, x, cfg.keep, dtype=jnp.float32)
    assert np.isfinite(np.asarray(feats)).all()
    assert feats.shape == (2, 32)

    # composition guards
    bad = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, fsdp=True))
    with pytest.raises(ValueError, match="lora"):
        tmain.train(bad)
    bad2 = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, accum_freq=2))
    with pytest.raises(ValueError, match="lora"):
        tmain.train(bad2)
