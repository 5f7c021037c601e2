"""Multi-device paths on the 8-device virtual CPU mesh: graft-entry dry run,
sharded WSI scoring parity, batch sharding helpers."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from keep_tpu.parallel import batch_sharding, make_mesh, pad_to_multiple, shard_batch
from keep_tpu.wsi.pipelines import score_tiles

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'


def test_mesh_helpers():
    mesh = make_mesh(8, axes=("dp",))
    assert mesh.shape == {"dp": 8}
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    sharded = shard_batch(mesh, {"x": x})
    np.testing.assert_allclose(np.asarray(sharded["x"]), x)
    padded, n = pad_to_multiple(np.ones((10, 3)), 8)
    assert padded.shape == (16, 3) and n == 10


def test_hybrid_and_2d_mesh():
    """make_mesh multi-axis (topology-aware path with reshape fallback) and
    make_hybrid_mesh (multi-slice DCN layout): right shapes/axes, every
    device used once, and a dp-sharded computation runs on both."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from keep_tpu.parallel import make_hybrid_mesh

    m2 = make_mesh(axes=("dp", "mp"), shape=(4, 2))
    assert dict(m2.shape) == {"dp": 4, "mp": 2}
    hyb = make_hybrid_mesh((2, 2), (2, 1), axes=("dp", "mp"))
    assert dict(hyb.shape) == {"dp": 4, "mp": 2}
    for mesh in (m2, hyb):
        ids = sorted(d.id for d in mesh.devices.flat)
        assert ids == sorted(d.id for d in jax.devices())
        x = jnp.arange(8.0)
        y = jax.jit(lambda x: x * 2,
                    in_shardings=NamedSharding(mesh, P("dp")),
                    out_shardings=NamedSharding(mesh, P("dp")))(x)
        np.testing.assert_allclose(np.asarray(y), np.arange(8.0) * 2)
    with pytest.raises(ValueError, match="rank"):
        make_hybrid_mesh((2, 2), (2,), axes=("dp", "mp"))


def test_sharded_wsi_scoring_matches_single(rng):
    """The WSI patch axis sharded over the mesh (SURVEY §5 long-axis plan):
    per-tile softmax scores are embarrassingly parallel — sharded run must
    equal the single-device run exactly."""
    mesh = make_mesh(8)
    feats = rng.standard_normal((8 * 125, 64)).astype(np.float32)
    cls = rng.standard_normal((64, 3)).astype(np.float32)

    single = np.asarray(score_tiles(jnp.asarray(cls), jnp.asarray(feats)))

    feats_sh = jax.device_put(jnp.asarray(feats), batch_sharding(mesh))
    cls_rep = jax.device_put(jnp.asarray(cls), NamedSharding(mesh, P()))
    out = jax.jit(
        score_tiles,
        in_shardings=(NamedSharding(mesh, P()), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )(cls_rep, feats_sh)
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-6)


def test_graft_entry_single():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_score_tiles_sharded_api(rng):
    from keep_tpu.wsi.pipelines import score_tiles_sharded

    mesh = make_mesh(8)
    feats = rng.standard_normal((1003, 32)).astype(np.float32)  # non-divisible
    cls = rng.standard_normal((32, 2)).astype(np.float32)
    out = np.asarray(score_tiles_sharded(jnp.asarray(cls), feats, mesh=mesh))
    ref = np.asarray(score_tiles(jnp.asarray(cls), jnp.asarray(feats)))
    assert out.shape == (1003, 2)
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # scale is forwarded (regression: it used to be silently ignored)
    out1 = np.asarray(score_tiles_sharded(jnp.asarray(cls), feats, mesh=mesh,
                                          scale=1.0))
    ref1 = np.asarray(score_tiles(jnp.asarray(cls), jnp.asarray(feats),
                                  scale=1.0))
    np.testing.assert_allclose(out1, ref1, atol=1e-6)
    assert not np.allclose(out1, out)


def test_extract_features_sharded_parity(rng):
    """The feature-extraction sweep (pixels → features — the north-star
    workload itself) sharded over 'dp': identical features to the
    single-device path, at a non-divisible tile count (round-2 review #2)."""
    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
    from keep_tpu.models.keep import KEEPModel
    from keep_tpu.wsi.extract import extract_features

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                         num_heads=4),
        text=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        projection_dim=48,
    )
    from keep_tpu.models import keep as keep_mod

    params = keep_mod.init(jax.random.PRNGKey(0), cfg)
    model = KEEPModel(params=params, cfg=cfg, dtype=jnp.float32)
    tiles = rng.integers(0, 255, (8 * 3 + 5, 32, 32, 3)).astype(np.uint8)

    mesh = make_mesh(8)
    single = extract_features(model, tiles, batch_size=8)
    sharded = extract_features(model, tiles, batch_size=6, mesh=mesh)  # →8
    assert sharded.shape == (len(tiles), cfg.projection_dim)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_patch_dropout(rng):
    from keep_tpu.models.vit import patch_dropout

    tokens = jnp.asarray(rng.standard_normal((4, 17, 8), dtype=np.float32))
    out = patch_dropout(tokens, jax.random.PRNGKey(0), keep_rate=0.5, num_prefix=1)
    assert out.shape == (4, 1 + 8, 8)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(tokens[:, 0]))
    # all kept rows exist in the original token set
    for b in range(4):
        orig = {tuple(r) for r in np.asarray(tokens[b])}
        for r in np.asarray(out[b]):
            assert tuple(r) in orig
    # keep_rate=1 is identity
    same = patch_dropout(tokens, jax.random.PRNGKey(0), keep_rate=1.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(tokens))


def test_accum_step_on_mesh(rng):
    """Cached-negative accumulation with the microbatch axis device-put on the
    mesh (params replicated) — the multi-chip accumulation path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from keep_tpu.models import keep
    from keep_tpu.train import optim
    from keep_tpu.train.trainer import (
        LossConfig,
        make_accum_train_step,
        tree_state,
    )
    from tests.test_train import TINY, make_batch

    mesh = make_mesh(8)
    params = keep.init(jax.random.PRNGKey(0), TINY)
    tx = optim.adamw(1e-3)
    state = tree_state(params, tx)
    batch = make_batch(np.random.default_rng(0), 16, n_id=4)
    micro = {
        k: jnp.asarray(v.reshape((2, 8) + v.shape[1:]) if k != "node_connection"
                       else np.stack([v, v]))
        for k, v in batch.items()
    }
    with jax.set_mesh(mesh):
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(None, "dp"))  # [accum, micro, ...]
        state = jax.device_put(state, repl)
        micro = {k: jax.device_put(v, repl if k == "node_connection" else data)
                 for k, v in micro.items()}
        step = make_accum_train_step(TINY, LossConfig(kind="clip"), tx, 2,
                                     dtype=jnp.float32)
        state, m = step(state, micro)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1

def test_prompt_select_sharded_parity(rng):
    """Sharded prompt screening == single-device prompt_select at a
    non-divisible tile count (padding masked out of the screening mean)."""
    from keep_tpu.wsi.sharded import prompt_select_sharded
    from keep_tpu.zeroshot.classifier import prompt_select

    mesh = make_mesh(8)
    p, d, c, n = 23, 32, 3, 1003
    cls = rng.standard_normal((p, d, c)).astype(np.float32)
    cls /= np.linalg.norm(cls, axis=1, keepdims=True)
    feats = rng.standard_normal((n, d)).astype(np.float32)

    ref = np.asarray(prompt_select(jnp.asarray(cls), jnp.asarray(feats), topn=5))
    got = np.asarray(prompt_select_sharded(jnp.asarray(cls), feats, mesh=mesh,
                                           topn=5))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # topn larger than the pool clamps like the single-device path
    # (regression: top_k used to crash on small prompt files)
    ref50 = np.asarray(prompt_select(jnp.asarray(cls), jnp.asarray(feats),
                                     topn=50))
    got50 = np.asarray(prompt_select_sharded(jnp.asarray(cls), feats,
                                             mesh=mesh, topn=50))
    np.testing.assert_allclose(got50, ref50, atol=1e-5)


def test_refined_probs_sharded_parity(rng):
    """Sharded score→scatter→refine→gather == the single-device pipeline at a
    non-divisible patch count with duplicates and holes in the grid."""
    from keep_tpu.wsi.grid import CoordGrid
    from keep_tpu.wsi.pipelines import refined_tumor_probs
    from keep_tpu.wsi.sharded import refined_probs_sharded

    mesh = make_mesh(8)
    d, n = 32, 531
    feats = rng.standard_normal((n, d)).astype(np.float32)
    cls = rng.standard_normal((d, 2)).astype(np.float32)
    # ragged grid with duplicates: some coords repeat, some cells are holes
    side = 25
    cells = rng.choice(side * side, size=n, replace=True)
    coords = np.stack([(cells % side) * 224, (cells // side) * 224], 1)

    grid = CoordGrid.from_coords(coords, 224)
    ref = np.asarray(
        refined_tumor_probs(jnp.asarray(cls), jnp.asarray(feats), grid,
                            overlap=True))
    got = refined_probs_sharded(jnp.asarray(cls), feats, coords, 224,
                                mesh=mesh, overlap=True)
    assert got.shape == (grid.num_patches, 2)
    np.testing.assert_allclose(got[:, 1], ref, atol=1e-6)


def test_tensor_parallel_encode_parity(rng):
    """Megatron-layout param shardings over a (dp=2, mp=4) mesh: encode
    matches the single-device forward; qkv/fc1 split columns, proj/fc2 rows."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from keep_tpu.configs import ViTConfig
    from keep_tpu.models import vit
    from keep_tpu.parallel.tp import place_tp, tp_fraction, tp_shardings

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    ref = np.asarray(vit.forward(params, jnp.zeros((2, 16, 16, 3)), cfg))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "mp"))
    sh = tp_shardings(params, mesh)
    assert sh["blocks"]["attn"]["qkv"]["kernel"].spec == P(None, None, "mp")
    assert sh["blocks"]["attn"]["qkv"]["bias"].spec == P(None, "mp")
    assert sh["blocks"]["attn"]["proj"]["kernel"].spec == P(None, "mp", None)
    assert sh["blocks"]["mlp"]["fc2"]["kernel"].spec == P(None, "mp", None)
    assert sh["blocks"]["norm1"]["scale"].spec == P()
    assert tp_fraction(params, mesh) > 0.5

    placed = place_tp(params, mesh)
    x = jax.device_put(np.zeros((2, 16, 16, 3), np.float32),
                       NamedSharding(mesh, P("dp")))
    out = jax.jit(lambda p, px: vit.forward(p, px, cfg))(placed, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
    # the placed qkv kernel is genuinely split over mp
    shard = placed["blocks"]["attn"]["qkv"]["kernel"].addressable_shards[0]
    assert shard.data.shape == (2, 32, 96 // 4)


def test_tensor_parallel_train_step(rng):
    """One jitted HyMetric train step with params TP-sharded: loss matches
    the replicated step (XLA inserts the TP collectives)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
    from keep_tpu.models import keep
    from keep_tpu.parallel.tp import place_tp
    from keep_tpu.train import optim, schedules
    from keep_tpu.train.trainer import LossConfig, make_train_step, tree_state

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                         num_heads=4),
        text=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=16),
        projection_dim=32,
    )
    params = keep.init(jax.random.PRNGKey(0), cfg)
    tx = optim.adamw(schedules.const_lr(1e-3, 0))
    loss_cfg = LossConfig(kind="hierarchy_metric", caption_num=2)
    step = make_train_step(cfg, loss_cfg, tx, dtype=jnp.float32, donate=False)

    batch = {
        "pixels": rng.standard_normal((4, 16, 16, 3)).astype(np.float32),
        "input_ids": rng.integers(1, 64, (4, 12)),
        "attention_mask": np.ones((4, 12), np.int32),
        "node_connection": np.ones((2, 2), np.float32),
    }
    _, m_ref = step(tree_state(params, tx), batch)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("dp", "mp"))
    with jax.set_mesh(mesh):
        state = tree_state(params, tx)
        state = state.replace(params=place_tp(state.params, mesh))
        _, m_tp = step(state, jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
