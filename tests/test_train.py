"""Trainer stack: schedules vs reference formulas, freeze masking,

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'
train-step convergence, grad accumulation equivalence, checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.models import keep
from keep_tpu.train import optim, schedules
from keep_tpu.train.freeze import FreezeSchedule, diff_report, snapshot
from keep_tpu.train.trainer import (

    LossConfig,
    make_accum_train_step,
    make_train_step,
    tree_state,
)

TINY = KEEPConfig(
    vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=2),
    text=BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=32,
    ),
    projection_dim=32,
)


def make_batch(rng, n, n_id=4):
    return {
        "pixels": rng.standard_normal((n, 16, 16, 3)).astype(np.float32),
        "input_ids": rng.integers(1, 64, (n, 16)),
        "attention_mask": np.ones((n, 16), np.int32),
        "node_connection": np.ones((n_id, n_id), np.float32),
    }


# --------------------------------------------------------------------------


def test_schedules_match_reference_formulas():
    # cosine (scheduler.py:43-53)
    sch = schedules.cosine_lr(1e-3, warmup_length=5, steps=100)
    assert float(sch(0)) == pytest.approx(1e-3 * 1 / 5)
    assert float(sch(4)) == pytest.approx(1e-3)
    e, es = 50 - 5, 100 - 5
    assert float(sch(50)) == pytest.approx(0.5 * (1 + np.cos(np.pi * e / es)) * 1e-3)
    # const (scheduler.py:13-21)
    c = schedules.const_lr(2e-4, 3)
    assert float(c(1)) == pytest.approx(2e-4 * 2 / 3)
    assert float(c(10)) == pytest.approx(2e-4)
    # cooldown (scheduler.py:24-40)
    cd = schedules.const_lr_cooldown(1e-3, 2, steps=20, cooldown_steps=10,
                                     cooldown_power=2.0, cooldown_end_lr=1e-5)
    assert float(cd(5)) == pytest.approx(1e-3)
    e, es = 15 - 10, 10
    ref = (1 - e / es) ** 2 * (1e-3 - 1e-5) + 1e-5
    assert float(cd(15)) == pytest.approx(ref, rel=1e-6)


def test_train_step_learns_and_clamps(rng):
    params = keep.init(jax.random.PRNGKey(0), TINY)
    params["logit_scale"] = jnp.asarray(10.0)  # above ln(100) ≈ 4.6 → must clamp
    tx = optim.adamw(1e-3, weight_decay=0.01, grad_clip_norm=1.0)
    state = tree_state(params, tx)
    step = make_train_step(
        TINY, LossConfig(kind="clip"), tx, dtype=jnp.float32, donate=False
    )
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 8).items()}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert float(state.params["logit_scale"]) <= np.log(100.0) + 1e-6
    assert losses[-1] < losses[0]  # memorizes the fixed batch
    assert int(state.step) == 8


def test_hierarchy_metric_step_runs(rng):
    params = keep.init(jax.random.PRNGKey(1), TINY)
    tx = optim.adamw(1e-3, params=params)
    state = tree_state(params, tx)
    step = make_train_step(
        TINY, LossConfig(kind="hierarchy_metric", caption_num=4), tx,
        dtype=jnp.float32, donate=False,
    )
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 8, n_id=4).items()}
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_freeze_masks_gradients(rng):
    params = keep.init(jax.random.PRNGKey(0), TINY)
    fs = FreezeSchedule(freeze_visual_epochs=1, freeze_text_epochs=0)
    tx = optim.freeze_wrapper(optim.adamw(1e-2), fs.frozen_fn(epoch=0))
    state = tree_state(params, tx)
    before = snapshot(params)
    step = make_train_step(TINY, LossConfig(kind="clip"), tx,
                           dtype=jnp.float32, donate=False)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 4).items()}
    for _ in range(3):
        state, _ = step(state, batch)
    report = diff_report(before, state.params)
    assert report["visual"] == "frozen"
    assert report["text"] == "open"
    assert report["visual_head"] == "open"
    # epoch 1: everything opens
    tx1 = optim.freeze_wrapper(optim.adamw(1e-2), fs.frozen_fn(epoch=1))
    state1 = tree_state(state.params, tx1)
    before1 = snapshot(state1.params)
    step1 = make_train_step(TINY, LossConfig(kind="clip"), tx1,
                            dtype=jnp.float32, donate=False)
    state1, _ = step1(state1, batch)
    assert diff_report(before1, state1.params)["visual"] == "open"


def test_freeze_phases():
    fs = FreezeSchedule(freeze_visual_epochs=2, freeze_text_epochs=1)
    phases = fs.phases(4)
    assert phases == [
        (0, frozenset({"visual", "text"})),
        (1, frozenset({"visual"})),
        (2, frozenset()),
    ]


def test_accum_step_matches_full_batch(rng):
    """accum_freq=2 with cached negatives ≈ one full-batch step (identical
    here because cached features equal live ones at the same params)."""
    params = keep.init(jax.random.PRNGKey(0), TINY)
    tx = optim.adamw(1e-3)
    batch = make_batch(rng, 8)
    full = {k: jnp.asarray(v) for k, v in batch.items()}
    micro = {
        k: jnp.asarray(v.reshape((2, 4) + v.shape[1:]) if k != "node_connection"
                       else np.stack([v, v]))
        for k, v in batch.items()
    }
    s_full = tree_state(params, tx)
    step_full = make_train_step(TINY, LossConfig(kind="clip"), tx,
                                dtype=jnp.float32, donate=False)
    s_full, m_full = step_full(s_full, full)

    s_acc = tree_state(params, tx)
    step_acc = make_accum_train_step(TINY, LossConfig(kind="clip"), tx, 2,
                                     dtype=jnp.float32)
    s_acc, m_acc = step_acc(s_acc, micro)

    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-4)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_full.params, s_acc.params
    )
    assert max(jax.tree.leaves(diffs)) < 5e-5


def test_checkpoint_roundtrip(tmp_path, rng):
    from keep_tpu.train import checkpoint as ckpt

    params = keep.init(jax.random.PRNGKey(0), TINY)
    tx = optim.adamw(1e-3)
    state = tree_state(params, tx)
    d = str(tmp_path / "ckpts")
    ckpt.save(d, epoch=0, params=state.params, opt_state=state.opt_state, step=5)
    ckpt.save(d, epoch=2, params=state.params, opt_state=state.opt_state, step=15)
    assert ckpt.latest_epoch(d) == 2
    like = {"params": state.params, "opt_state": state.opt_state,
            "step": np.asarray(0)}
    out = ckpt.restore(d, like=like)
    assert out["epoch"] == 2 and int(out["step"]) == 15
    np.testing.assert_allclose(
        np.asarray(out["params"]["logit_scale"]),
        np.asarray(state.params["logit_scale"]),
    )
    out0 = ckpt.restore(d, epoch=0, like=like)
    assert int(out0["step"]) == 5


def test_wd_mask_structure():
    params = keep.init(jax.random.PRNGKey(0), TINY)
    mask = optim.wd_mask(params)
    assert mask["logit_scale"] is False
    assert mask["visual"]["cls_token"] is False
    assert mask["visual"]["blocks"]["ls1"] is False
    assert mask["visual"]["blocks"]["attn"]["qkv"]["kernel"] is True
    assert mask["visual"]["blocks"]["attn"]["qkv"]["bias"] is False
    assert mask["text"]["embeddings"]["word"] is True
    assert mask["text"]["blocks"]["norm"]["scale"] is False


def test_accum_step_forwards_labels(rng):
    """mask_contrastive labels must survive gradient accumulation — the
    accum path previously dropped them, silently degrading to plain
    InfoNCE only when accum was on."""
    params = keep.init(jax.random.PRNGKey(0), TINY)
    tx = optim.adamw(1e-3)
    batch = make_batch(rng, 8)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32)
    full = {**{k: jnp.asarray(v) for k, v in batch.items()},
            "labels": jnp.asarray(labels)}
    micro = {
        k: jnp.asarray(v.reshape((2, 4) + v.shape[1:]) if k != "node_connection"
                       else np.stack([v, v]))
        for k, v in batch.items()
    }
    micro["labels"] = jnp.asarray(labels.reshape(2, 4))

    s_full = tree_state(params, tx)
    step_full = make_train_step(TINY, LossConfig(kind="clip"), tx,
                                dtype=jnp.float32, donate=False)
    s_full, m_full = step_full(s_full, full)

    # the labeled loss is genuinely different from unlabeled InfoNCE
    # (run before the accum step — it donates the shared param buffers)
    _, m_plain = step_full(tree_state(params, tx),
                           {k: v for k, v in full.items() if k != "labels"})
    assert float(m_plain["loss"]) != pytest.approx(float(m_full["loss"]),
                                                   rel=1e-5)

    s_acc = tree_state(params, tx)
    step_acc = make_accum_train_step(TINY, LossConfig(kind="clip"), tx, 2,
                                     dtype=jnp.float32)
    s_acc, m_acc = step_acc(s_acc, micro)
    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-4)


def test_accum_step_hierarchy_matches_full(rng):
    """Accumulation parity for the hierarchical metric loss under the REAL
    data layout: each microbatch is independently group-blocked with
    ``caption_num`` groups (the data pipeline emits one such batch per host
    step), so the super-batch has accum·caption_num groups and ONE combined
    node_connection over all chunks' labels."""
    params = keep.init(jax.random.PRNGKey(2), TINY)
    tx = optim.adamw(1e-3)
    accum, cnum, micro_n = 2, 2, 8  # 2 chunks × (2 groups × 4 instances)
    batch = make_batch(rng, accum * micro_n, n_id=accum * cnum)
    # non-trivial DO connectivity across chunks
    conn = np.ones((accum * cnum, accum * cnum), np.float32)
    conn[0, 2] = conn[2, 0] = -1.0  # group 0 (chunk 0) related to group 2 (chunk 1)
    batch["node_connection"] = conn

    full = {k: jnp.asarray(v) for k, v in batch.items()}
    micro = {
        k: jnp.asarray(v.reshape((accum, micro_n) + v.shape[1:])
                       if k != "node_connection" else v)
        for k, v in batch.items()
    }
    s_full = tree_state(params, tx)
    s_full, m_full = make_train_step(
        TINY, LossConfig(kind="hierarchy_metric", caption_num=accum * cnum),
        tx, dtype=jnp.float32, donate=False,
    )(s_full, full)
    s_acc = tree_state(params, tx)
    s_acc, m_acc = make_accum_train_step(
        TINY, LossConfig(kind="hierarchy_metric", caption_num=cnum), tx, accum,
        dtype=jnp.float32,
    )(s_acc, micro)
    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-4)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_full.params, s_acc.params
    )
    assert max(jax.tree.leaves(diffs)) < 5e-5


def test_freeze_mask_single_optimizer(rng):
    """The dynamic freeze mask freezes towers without rebuilding the
    optimizer: one tx + one jitted step across phases; Adam moments/schedule
    count continue; frozen params don't move (incl. weight decay)."""
    params = keep.init(jax.random.PRNGKey(0), TINY)
    fs = FreezeSchedule(freeze_visual_epochs=1, freeze_text_epochs=0)
    sch = schedules.cosine_lr(1e-2, warmup_length=2, steps=50)
    tx = optim.adamw(sch, weight_decay=0.1)
    state = tree_state(params, tx)
    step = make_train_step(TINY, LossConfig(kind="clip"), tx,
                           dtype=jnp.float32, donate=False)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 4).items()}

    frozen0 = optim.freeze_mask(params, fs.frozen_fn(epoch=0))
    before = snapshot(state.params)
    for _ in range(3):
        state, _ = step(state, batch, frozen0)
    report = diff_report(before, state.params)
    assert report["visual"] == "frozen"
    assert report["text"] == "open"
    # frozen tower's Adam moments stayed exactly zero
    def path_has(p, name):
        return any(
            name == str(getattr(k, "name", getattr(k, "key", ""))) for k in p
        )

    vis_moments = [
        leaf for p, leaf in jax.tree_util.tree_leaves_with_path(state.opt_state)
        if path_has(p, "mu") and path_has(p, "visual")
    ]
    assert vis_moments
    assert all(float(jnp.max(jnp.abs(m))) == 0.0 for m in vis_moments)
    # phase change: same tx/state, new mask — visual opens, count continues
    frozen1 = optim.freeze_mask(params, fs.frozen_fn(epoch=1))
    before1 = snapshot(state.params)
    state, _ = step(state, batch, frozen1)
    assert diff_report(before1, state.params)["visual"] == "open"
    assert int(state.step) == 4


def test_static_freeze_bit_identical(rng):
    """static_frozen (compile-time stop_gradient on frozen leaves, letting
    XLA drop the frozen tower's backward) produces bit-identical params to
    the dynamic-mask-only step."""
    params = keep.init(jax.random.PRNGKey(3), TINY)
    fs = FreezeSchedule(freeze_visual_epochs=1, freeze_text_epochs=1)
    tx = optim.adamw(1e-2, weight_decay=0.05)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 4).items()}
    mask = optim.freeze_mask(params, fs.frozen_fn(epoch=0))
    static = jax.tree.map(lambda x: bool(np.asarray(x) > 0.5), mask)

    dyn = make_train_step(TINY, LossConfig(kind="clip"), tx,
                          dtype=jnp.float32, donate=False)
    sta = make_train_step(TINY, LossConfig(kind="clip"), tx,
                          dtype=jnp.float32, donate=False,
                          static_frozen=static)
    s_d = tree_state(params, tx)
    s_s = tree_state(params, tx)
    for _ in range(2):
        s_d, m_d = dyn(s_d, batch, mask)
        s_s, m_s = sta(s_s, batch, mask)
    for a, b in zip(jax.tree.leaves(s_d.params), jax.tree.leaves(s_s.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m_d["loss"]) == pytest.approx(float(m_s["loss"]), rel=1e-6)


def test_mu_dtype_bf16_moments(rng):
    """`mu_dtype='bfloat16'` (SolverConfig knob): Adam's first moment is
    stored bf16, the second stays fp32, and the step still learns."""
    params = keep.init(jax.random.PRNGKey(0), TINY)
    tx = optim.adamw(1e-3, weight_decay=0.01, grad_clip_norm=1.0,
                     mu_dtype="bfloat16")
    state = tree_state(params, tx)
    step = make_train_step(
        TINY, LossConfig(kind="clip"), tx, dtype=jnp.float32, donate=False
    )
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 8).items()}
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    adam_state = [s for s in jax.tree.leaves(
        state.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(s, "mu")]
    assert adam_state, "expected a ScaleByAdamState in the chain"
    mus = jax.tree.leaves(adam_state[0].mu)
    nus = jax.tree.leaves(adam_state[0].nu)
    assert all(m.dtype == jnp.bfloat16 for m in mus)
    assert all(n.dtype == jnp.float32 for n in nus)
    assert losses[-1] < losses[0]


def test_bn_running_stats_never_updated():
    """BatchNorm mean/var leaves are buffers (reference freeze_batch_norm_2d
    semantics, utils.py:5-30): AdamW must zero their updates even when
    gradients flow through them, while sibling scale/bias still train."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keep_tpu.train import optim

    params = {
        "conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
        "bn1": {"scale": jnp.ones(2), "bias": jnp.zeros(2),
                "mean": jnp.zeros(2), "var": jnp.ones(2)},
    }
    tx = optim.adamw(1e-2, weight_decay=0.1, grad_clip_norm=1.0)
    state = tx.init(params)

    def loss(p):
        # gradients flow through EVERY leaf, including the stats
        return (jnp.sum(p["conv"]["kernel"]) + jnp.sum(p["bn1"]["scale"])
                + jnp.sum(p["bn1"]["mean"]) + jnp.sum(p["bn1"]["var"])) ** 2

    grads = jax.grad(loss)(params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["bn1"]["mean"]) == 0)
    assert np.all(np.asarray(updates["bn1"]["var"]) == 0)
    assert np.any(np.asarray(updates["bn1"]["scale"]) != 0)
    assert np.any(np.asarray(updates["conv"]["kernel"]) != 0)

    # Torch buffers carry NO grad, so the stat grads must also not inflate
    # the global clip norm (they are zeroed BEFORE clip_by_global_norm):
    # trainable updates must match a run where the stat grads never existed.
    grads_nostat = jax.tree.map(lambda g: g, grads)
    grads_nostat["bn1"]["mean"] = jnp.zeros(2)
    grads_nostat["bn1"]["var"] = jnp.zeros(2)
    updates_ref, _ = tx.update(grads_nostat, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]),
                               np.asarray(updates_ref["conv"]["kernel"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["bn1"]["scale"]),
                               np.asarray(updates_ref["bn1"]["scale"]),
                               rtol=1e-6)


def test_freeze_scheduler_knowledge_and_head_exclusion():
    """The third (knowledge) tower freezes on its own schedule, empty paths
    are never frozen, and keep_text_head_open leaves mlp_embed trainable
    inside a frozen text tower (reference freeze_scheduler.py:6-56)."""
    from keep_tpu.train.freeze import FreezeSchedule

    fs = FreezeSchedule(freeze_visual_epochs=1, freeze_text_epochs=2,
                        freeze_knowledge_epochs=3, keep_text_head_open=True)
    assert fs.frozen_towers(0) == {"visual", "text", "knowledge"}
    assert fs.frozen_towers(2) == {"knowledge"}
    assert fs.frozen_towers(3) == frozenset()
    fn = fs.frozen_fn(0)
    assert fn(("knowledge", "blocks")) is True
    assert fn(()) is False
    assert fn(("text", "mlp_embed", "kernel")) is False
    assert fn(("text", "pooler", "kernel")) is True
