"""End-to-end ``train.main.train()`` regressions on the 8-device virtual CPU
mesh: real data-parallel sharding through the CLI code path, full-fidelity
resume (optimizer state + schedule step), tokenizer plumbing via
dataset.vocab_path, and accumulation with the hierarchy loss."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import keep_tpu.train.main as tmain
from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.train.config import (
    DataloaderConfig,
    DatasetConfig,
    ModelSection,
    SaveConfig,
    SolverConfig,
    TrainRunConfig,
)

pytestmark = pytest.mark.slow

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] lung cancer adenocarcinoma melanoma skin "
    "tumor normal tissue a an image of photomicrograph showing is shown this "
    "there h&e stain stained histopathological photograph example presence "
    "present disease cellular proliferation .".split()
)

NODES = {
    "DOID:14566": {"name": "disease of cellular proliferation", "parent": []},
    "DOID:lung": {"name": "lung cancer", "parent": ["DOID:14566"]},
    "DOID:luad": {"name": "lung adenocarcinoma", "parent": ["DOID:lung"]},
    "DOID:mel": {"name": "melanoma", "parent": ["DOID:14566"]},
}


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("trainmain")
    img_dir = d / "images"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        name = f"im{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
        ).save(img_dir / name)
        names.append(name)

    groups = {
        "g_luad": {"captions": ["an image of lung adenocarcinoma ."],
                   "images": names[:2], "labels": {"DOID:luad": 1}},
        "g_lung": {"captions": ["lung cancer tissue ."],
                   "images": names[2:4], "labels": {"DOID:lung": 1}},
        "g_mel": {"captions": ["melanoma of skin ."],
                  "images": names[4:6], "labels": {"DOID:mel": 1}},
        "g_norm": {"captions": ["normal tissue is shown ."],
                   "images": names[6:], "labels": {}},
    }
    (d / "groups.json").write_text(json.dumps(groups))
    (d / "kg.json").write_text(json.dumps(NODES))
    # vocab deliberately OUTSIDE img_dir: exercises dataset.vocab_path
    vocab_dir = d / "tok"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text("\n".join(VOCAB))
    return d


def make_cfg(run_dirs, out_dir, vision_kw=None, **solver_kw) -> TrainRunConfig:
    tiny = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                         num_heads=2, **(vision_kw or {})),
        text=BertConfig(vocab_size=len(VOCAB), hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, max_position_embeddings=32),
        projection_dim=32,
        max_text_length=16,
    )
    kw = dict(
        epochs=3, lr=1e-3, warmup=5, lr_scheduler="const",
        freeze_visual_epochs=1, freeze_text_epochs=0, zeroshot_frequency=0,
    )
    kw.update(solver_kw)
    solver = SolverConfig(**kw)
    return TrainRunConfig(
        dataset=DatasetConfig(
            train_data=str(run_dirs / "groups.json"),
            img_dir=str(run_dirs / "images"),
            knowledge_file=str(run_dirs / "kg.json"),
            vocab_path=str(run_dirs / "tok"),
        ),
        dataloader=DataloaderConfig(batch_size=8, caption_num=4, workers=1),
        solver=solver,
        model=ModelSection(precision="fp32", type="hierarchy_metric",
                           use_flash=False),
        save=SaveConfig(output_dir=str(out_dir), experiment_name="exp",
                        save_frequency=1),
        keep=tiny,
        seed=0,
    )


def _losses(d):
    lines = (d / "exp" / "checkpoints" / "results.jsonl").read_text()
    vals = [json.loads(ln).get("train_loss") for ln in lines.splitlines()]
    return [v for v in vals if v is not None]


@pytest.fixture(scope="module")
def rep2_losses(run_dirs, tmp_path_factory):
    """Replicated-DP baseline trajectory (epochs=2, no freeze) shared by
    every parallelism-equivalence test — trained once per module."""
    d = tmp_path_factory.mktemp("rep2")
    tmain.train(make_cfg(run_dirs, d, epochs=2, freeze_visual_epochs=0))
    return _losses(d)


def test_train_e2e_mesh_really_shards(run_dirs, tmp_path, monkeypatch):
    """train() on the 8-device mesh: the batch must actually shard over 'dp'
    (1 sample per device), state replicated; checkpoints + results land."""
    captured = {}
    real = tmain.make_placement

    def spy(mesh, batch_axis=0):
        put_state, put_batch, put_repl = real(mesh, batch_axis)

        def put_batch2(arrays):
            out = put_batch(arrays)
            captured["mesh"] = mesh
            captured["shardings"] = {k: v.sharding for k, v in out.items()}
            captured["shard_shape"] = (
                out["pixels"].addressable_shards[0].data.shape
            )
            return out

        return put_state, put_batch2, put_repl

    monkeypatch.setattr(tmain, "make_placement", spy)
    cfg = make_cfg(run_dirs, tmp_path, epochs=1)
    res = tmain.train(cfg)
    assert np.isfinite(res["train_loss"])

    assert captured["mesh"] is not None, "mesh path not taken on 8 devices"
    pix_sh = captured["shardings"]["pixels"]
    assert len(pix_sh.device_set) == 8
    assert captured["shard_shape"][0] == 1  # batch 8 / 8 devices
    assert captured["shardings"]["node_connection"].is_fully_replicated

    out = tmp_path / "exp"
    assert (out / "checkpoints" / "results.jsonl").exists()
    from keep_tpu.train import checkpoint as ckpt

    assert ckpt.latest_epoch(str(out / "checkpoints")) == 0


def test_eval_batches_shard_over_dp(run_dirs, tmp_path, monkeypatch):
    """In-training zero-shot eval must shard eval encodes over 'dp' like
    training batches — not replicate the full batch onto every device
    (round-2 review weak #3; the reference evaluates master-only,
    train_hierarchy.py:253)."""
    captured = []
    real = tmain.make_eval_placement

    def spy(mesh, put_repl):
        put_eval = real(mesh, put_repl)

        def put_eval2(x):
            out = put_eval(x)
            captured.append(out.sharding)
            return out

        return put_eval2

    monkeypatch.setattr(tmain, "make_eval_placement", spy)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    texts = ["an image of lung adenocarcinoma ."] * 4 + ["melanoma of skin ."] * 4
    cfg = make_cfg(run_dirs, tmp_path, epochs=1, zeroshot_frequency=1)
    res = tmain.train(cfg, eval_data={"zeroshot_ret": (pixels, texts)})

    assert "zeroshot-ret-p@10" in res
    assert captured, "eval placement never invoked"
    for sh in captured:
        assert len(sh.device_set) == 8
        assert not sh.is_fully_replicated, "eval batch replicated, not sharded"


def test_train_with_csv_eval_sets(run_dirs, tmp_path):
    """Full in-training eval through the CSV path (build_eval_data ←
    get_zeroshot_dataset, data_proc_group.py:459-496): zeroshot-cls WF1
    quartiles, retrieval p@K, and val contrastive metrics all land in
    results.jsonl."""
    from PIL import Image

    d = tmp_path / "evaldata"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                        .astype(np.uint8)).save(d / f"ev{i}.png")

    # build_eval_data reads with sep='both' (comma, tab fallback —
    # data_proc_group.py:459-496), so eval CSVs are comma-separated
    (d / "cls.csv").write_text(
        "image_name,label\n" + "\n".join(
            f"ev{i}.png,{'tumor' if i % 2 else 'normal'}" for i in range(6)))
    (d / "ret.csv").write_text(
        "image_name,caption\n" + "\n".join(
            f"ev{i}.png,an image of lung cancer ." for i in range(6)))
    prompts = {str(i): {"classnames": {"normal": "normal tissue",
                                       "tumor": "tumor"},
                        "templates": "an image of CLASSNAME ."}
               for i in range(3)}
    (d / "prompts.json").write_text(json.dumps(prompts))

    # val images resolve against dataset.img_dir (the training image root)
    (d / "val.csv").write_text(
        "image_name,caption\n" + "\n".join(
            f"im{i}.png,melanoma of skin ." for i in range(6)))

    cfg = make_cfg(run_dirs, tmp_path, epochs=1, zeroshot_frequency=1)
    cfg = dataclasses.replace(cfg, dataset=dataclasses.replace(
        cfg.dataset,
        zeroshot_cls=str(d / "cls.csv"), zeroshot_cls_imdir=str(d),
        zeroshot_cls_prompts=str(d / "prompts.json"),
        zeroshot_ret=str(d / "ret.csv"), zeroshot_ret_imdir=str(d),
        val_data=str(d / "val.csv"),
    ))
    res = tmain.train(cfg)

    for key in ("zeroshot-cls-WF1-median", "zeroshot-ret-p@10",
                "val_contrastive_loss", "image_to_text_R@1"):
        assert key in res, (key, sorted(res))
    assert np.isfinite(res["val_contrastive_loss"])
    out = tmp_path / "exp"
    lines = (out / "checkpoints" / "results.jsonl").read_text().splitlines()
    assert any("zeroshot-cls-WF1-median" in l for l in lines)


def test_train_resume_equivalence(run_dirs, tmp_path):
    """Train 3 epochs continuously vs train 1 + resume + 2: identical final
    params. Fails if opt_state/step aren't restored (Adam moments + warmup
    schedule restart) or if data isn't epoch-keyed."""
    cfg_a = make_cfg(run_dirs, tmp_path / "a", epochs=3)
    tmain.train(cfg_a)

    cfg_b1 = make_cfg(run_dirs, tmp_path / "b", epochs=1)
    tmain.train(cfg_b1)
    cfg_b2 = make_cfg(run_dirs, tmp_path / "b", epochs=3)
    cfg_b2.save.resume = "latest"
    tmain.train(cfg_b2)

    from keep_tpu.train import checkpoint as ckpt

    pa = ckpt.restore(str(tmp_path / "a" / "exp" / "checkpoints"))["params"]
    pb = ckpt.restore(str(tmp_path / "b" / "exp" / "checkpoints"))["params"]
    flat_a = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(pa)}
    flat_b = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(pb)}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], rtol=0, atol=1e-7,
                                   err_msg=k)


def test_train_moe_resume_equivalence(run_dirs, tmp_path):
    """Full-fidelity resume holds for the MoE trunk too (Orbax round-trips
    the expert/router pytree): 2 epochs continuous == 1 + resume + 1."""
    vk = dict(moe_experts=2, moe_capacity_factor=2.0)
    cfg_a = make_cfg(run_dirs, tmp_path / "a", epochs=2, vision_kw=vk)
    tmain.train(cfg_a)
    cfg_b1 = make_cfg(run_dirs, tmp_path / "b", epochs=1, vision_kw=vk)
    tmain.train(cfg_b1)
    cfg_b2 = make_cfg(run_dirs, tmp_path / "b", epochs=2, vision_kw=vk)
    cfg_b2.save.resume = "latest"
    tmain.train(cfg_b2)

    from keep_tpu.train import checkpoint as ckpt

    pa = ckpt.restore(str(tmp_path / "a" / "exp" / "checkpoints"))["params"]
    pb = ckpt.restore(str(tmp_path / "b" / "exp" / "checkpoints"))["params"]
    flat_a = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(pa)}
    flat_b = {jax.tree_util.keystr(p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(pb)}
    assert flat_a.keys() == flat_b.keys()
    assert any("'moe'" in k or "moe" in k for k in flat_a)
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], rtol=0, atol=1e-7,
                                   err_msg=k)


def test_train_accum_hierarchy(run_dirs, tmp_path):
    """accum_freq=2 through train(): two group-blocked host batches form one
    optimizer step with a combined cross-chunk node_connection."""
    cfg = make_cfg(run_dirs, tmp_path, epochs=1, accum_freq=2)
    cfg.dataloader = DataloaderConfig(batch_size=4, caption_num=2, workers=1)
    res = tmain.train(cfg)
    assert np.isfinite(res["train_loss"])


def test_train_fsdp_equivalence(run_dirs, tmp_path, rep2_losses):
    """solver.fsdp shards the training state over the 8-device mesh (ZeRO-3
    analog, parallel/fsdp.py) and produces the SAME trajectory as replicated
    DP — XLA's SPMD partitioner inserts the gathers/reduce-scatters."""
    cfg_f = make_cfg(run_dirs, tmp_path / "fsdp", epochs=2,
                     freeze_visual_epochs=0)
    cfg_f = dataclasses.replace(
        cfg_f, solver=dataclasses.replace(cfg_f.solver, fsdp=True,
                                          fsdp_min_size=256))
    tmain.train(cfg_f)

    a, b = rep2_losses, _losses(tmp_path / "fsdp")
    assert a and len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_train_tp_equivalence(run_dirs, tmp_path, rep2_losses):
    """solver.tp=2 trains on a 2-D (dp=4, mp=2) mesh with Megatron param
    shardings (parallel/tp.py) and produces the SAME trajectory as
    replicated DP; pp+fsdp together is a config error."""
    cfg_t = make_cfg(run_dirs, tmp_path / "tp", epochs=2,
                     freeze_visual_epochs=0)
    cfg_t = dataclasses.replace(
        cfg_t, solver=dataclasses.replace(cfg_t.solver, tp=2))
    tmain.train(cfg_t)

    a, b = rep2_losses, _losses(tmp_path / "tp")
    assert a and len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    cfg_bad = dataclasses.replace(
        cfg_t, solver=dataclasses.replace(cfg_t.solver, tp=1, pp=2,
                                          fsdp=True))
    with pytest.raises(ValueError, match="mutually exclusive"):
        tmain.train(cfg_bad)

    # an explicit tp request with a bad batch size must FAIL, not silently
    # degrade to a replicated single-device run
    cfg_nd = dataclasses.replace(
        cfg_t, dataloader=dataclasses.replace(cfg_t.dataloader, batch_size=6,
                                              caption_num=2))
    with pytest.raises(ValueError, match="not divisible"):
        tmain.train(cfg_nd)


def test_train_tp_fsdp_equivalence(run_dirs, tmp_path, rep2_losses):
    """solver.tp=2 + solver.fsdp (Megatron-LM 2-D state layout: 'mp' on
    feature axes, 'dp' on the large leaves' remaining axes) produces the
    same trajectory as replicated DP."""
    cfg_c = make_cfg(run_dirs, tmp_path / "combo", epochs=2,
                     freeze_visual_epochs=0)
    cfg_c = dataclasses.replace(
        cfg_c, solver=dataclasses.replace(cfg_c.solver, tp=2, fsdp=True,
                                          fsdp_min_size=128))
    tmain.train(cfg_c)

    a, b = rep2_losses, _losses(tmp_path / "combo")
    assert a and len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_tp_fsdp_spec_composition():
    """A qkv-style [in, out] leaf gets 'mp' on its output axis AND 'dp' on
    its input axis; small leaves replicate; fsdp-only leaves get 'dp'."""
    from jax.sharding import Mesh, PartitionSpec as P

    from keep_tpu.parallel.tp import tp_fsdp_shardings

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "mp"))
    params = {
        "blocks": {"qkv": {"kernel": jnp.zeros((24, 64, 128)),
                           "bias": jnp.zeros((24, 128))},
                   "proj": {"kernel": jnp.zeros((24, 128, 64))},
                   "ln": {"scale": jnp.zeros((24, 64))}},
        "pos_embed": jnp.zeros((1, 197, 64)),
        "big_plain": jnp.zeros((256, 64)),
    }
    sh = tp_fsdp_shardings(params, mesh, min_size=1024)
    assert sh["blocks"]["qkv"]["kernel"].spec == P(None, "dp", "mp")
    assert sh["blocks"]["proj"]["kernel"].spec == P(None, "mp", "dp")
    # both >= the tiny test min_size, so fsdp adds 'dp' to the layer axis /
    # largest free axis on top of (or without) the tp split
    assert sh["blocks"]["qkv"]["bias"].spec == P("dp", "mp")
    assert sh["blocks"]["ln"]["scale"].spec == P(None, "dp")
    assert sh["big_plain"].spec == P("dp", None)  # fsdp-only leaf
    # pos_embed: 197 not divisible, 64-dim axis... largest dp-divisible
    # axis wins only if >= min_size; 1*197*64 = 12608 >= 1024 -> 'dp' on
    # the 64 axis (the only divisible one)
    assert sh["pos_embed"].spec == P(None, None, "dp")


def test_train_tp_sp_equivalence(run_dirs, tmp_path, rep2_losses):
    """solver.tp=2 + solver.sp (Megatron-SP: the residual streams
    sequence-sharded over 'mp' via GSPMD constraints, parallel/sp.py)
    produces the same trajectory as replicated DP; sp without tp is a
    config error."""
    cfg_s = make_cfg(run_dirs, tmp_path / "sp", epochs=2,
                     freeze_visual_epochs=0)
    cfg_s = dataclasses.replace(
        cfg_s, solver=dataclasses.replace(cfg_s.solver, tp=2, sp=True))
    tmain.train(cfg_s)

    a, b = rep2_losses, _losses(tmp_path / "sp")
    assert a and len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    cfg_bad = dataclasses.replace(
        cfg_s, solver=dataclasses.replace(cfg_s.solver, tp=1, sp=True))
    with pytest.raises(ValueError, match="requires solver.tp"):
        tmain.train(cfg_bad)


def test_train_pp_equivalence(run_dirs, tmp_path, rep2_losses):
    """solver.pp=2 trains on a 2-D (dp=4, pp=2) mesh — the visual trunk
    GPipe-staged over 'pp' (parallel/pp.py), batch sharded over 'dp' — and
    produces the SAME trajectory as replicated DP; pp+tp together is a
    config error."""
    cfg_p = make_cfg(run_dirs, tmp_path / "pp", epochs=2,
                     freeze_visual_epochs=0)
    cfg_p = dataclasses.replace(
        cfg_p, solver=dataclasses.replace(cfg_p.solver, pp=2))
    tmain.train(cfg_p)

    a, b = rep2_losses, _losses(tmp_path / "pp")
    assert a and len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    cfg_bad = dataclasses.replace(
        cfg_p, solver=dataclasses.replace(cfg_p.solver, pp=2, tp=2))
    with pytest.raises(ValueError, match="mutually exclusive"):
        tmain.train(cfg_bad)


def test_train_moe_ep_equivalence(run_dirs, tmp_path):
    """model.vision.moe_experts=2 + solver.ep=2 trains the Switch-MoE
    visual trunk on a 2-D (dp=4, ep=2) mesh with expert kernels sharded
    over 'ep' — and produces the same trajectory as the same MoE model on
    the plain replicated dp mesh (sharding is placement, not math).
    ep without an MoE trunk, or ep with tp, is a config error."""
    moe_vision = dict(moe_experts=2, moe_top_k=1, moe_capacity_factor=2.0)
    cfg_dp = make_cfg(run_dirs, tmp_path / "dp", epochs=2,
                      freeze_visual_epochs=0, vision_kw=moe_vision)
    tmain.train(cfg_dp)
    cfg_e = make_cfg(run_dirs, tmp_path / "ep", epochs=2,
                     freeze_visual_epochs=0, vision_kw=moe_vision)
    cfg_e = dataclasses.replace(
        cfg_e, solver=dataclasses.replace(cfg_e.solver, ep=2))
    tmain.train(cfg_e)

    a, b = _losses(tmp_path / "dp"), _losses(tmp_path / "ep")
    assert a and len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # and the MoE run is a real trajectory, different from the dense one
    # (the aux loss alone shifts it)
    assert all(np.isfinite(v) for v in a)

    cfg_bad = make_cfg(run_dirs, tmp_path / "bad", epochs=1)
    cfg_bad = dataclasses.replace(
        cfg_bad, solver=dataclasses.replace(cfg_bad.solver, ep=2))
    with pytest.raises(ValueError, match="moe_experts"):
        tmain.train(cfg_bad)

    cfg_bad2 = dataclasses.replace(
        cfg_e, solver=dataclasses.replace(cfg_e.solver, ep=2, tp=2))
    with pytest.raises(ValueError, match="composes with dp"):
        tmain.train(cfg_bad2)

    # ep requires the EP-shardable einsum dispatch; the gather fast path
    # is single-device/dp only
    cfg_bad3 = make_cfg(run_dirs, tmp_path / "bad3", epochs=1,
                        vision_kw=dict(moe_vision, moe_dispatch="gather"))
    cfg_bad3 = dataclasses.replace(
        cfg_bad3, solver=dataclasses.replace(cfg_bad3.solver, ep=2))
    with pytest.raises(ValueError, match="moe_dispatch"):
        tmain.train(cfg_bad3)


def test_fsdp_placement_unit():
    """fsdp_spec/place_state/sharded_fraction mechanics on the virtual mesh."""
    from jax.sharding import PartitionSpec as P

    from keep_tpu.parallel.fsdp import (
        fsdp_spec,
        place_state,
        sharded_fraction,
        state_shardings,
    )
    from keep_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    assert fsdp_spec((1024, 333), 8, min_size=1024) == P("dp", None)
    assert fsdp_spec((333, 1024), 8, min_size=1024) == P(None, "dp")
    assert fsdp_spec((16, 16), 8, min_size=1024) == P()  # below min_size
    assert fsdp_spec((333, 333), 8, min_size=1) == P()  # nothing divides

    tree = {"big": np.ones((64, 48), np.float32),
            "small": np.ones((4,), np.float32),
            "scalar": np.float32(3.0)}
    placed = place_state(tree, mesh, min_size=512)
    assert len({s.data.shape for s in placed["big"].addressable_shards}) == 1
    assert placed["big"].addressable_shards[0].data.shape == (8, 48)
    assert placed["small"].addressable_shards[0].data.shape == (4,)
    frac = sharded_fraction(tree, mesh, min_size=512)
    assert frac == pytest.approx((64 * 48) / (64 * 48 + 4 + 1))
    sh = state_shardings(tree, mesh, min_size=512)
    assert sh["scalar"].spec == P()


def test_train_async_checkpointing(run_dirs, tmp_path):
    """save.async_checkpointing: background Orbax saves; resume-latest still
    finds the final epoch and the payload is complete."""
    cfg = make_cfg(run_dirs, tmp_path, epochs=2)
    cfg.save.async_checkpointing = True
    res = tmain.train(cfg)
    assert np.isfinite(res["train_loss"])
    from keep_tpu.train import checkpoint as ckpt

    d = str(tmp_path / "exp" / "checkpoints")
    assert ckpt.latest_epoch(d) == 1
    restored = ckpt.restore(d)
    assert "params" in restored and "opt_state" in restored
    assert int(np.asarray(restored["step"])) >= 1


# ------------------------------------------------- coverage-gap round 4

def test_solver_combo_validation(run_dirs, tmp_path):
    """Every parallelism-combo guard fires with its own message (the
    round-4 coverage report showed these raise lines unexecuted)."""
    cases = [
        (dict(tp=2, sp=True, accum_freq=2), None,
         "sp does not compose with accum_freq"),
        (dict(tp=2), dict(moe_experts=2, moe_capacity_factor=2.0),
         "MoE trunk trains with dp/fsdp/ep"),
        (dict(pp=2, accum_freq=2), None,
         "pp does not compose with accum_freq"),
        (dict(ep=2, fsdp=True),
         dict(moe_experts=2, moe_capacity_factor=2.0),
         "ep and solver.fsdp are mutually exclusive"),
        (dict(tp=3), None, "does not divide"),
    ]
    for i, (solver_kw, vision_kw, match) in enumerate(cases):
        cfg = make_cfg(run_dirs, tmp_path / f"v{i}", vision_kw=vision_kw,
                       **solver_kw)
        with pytest.raises(ValueError, match=match):
            tmain.train(cfg)


def test_pp_microbatch_split_validation(run_dirs, tmp_path):
    """pp=2 with batch 4 on 8 devices: microbatches of 2 don't divide
    dp=4 -> the explicit split error, not a cryptic reshape failure."""
    cfg = make_cfg(run_dirs, tmp_path, pp=2)
    cfg.dataloader = DataloaderConfig(batch_size=4, caption_num=4, workers=1)
    with pytest.raises(ValueError, match="must split into pp microbatches"):
        tmain.train(cfg)


def test_experiment_name_autogenerated(run_dirs, tmp_path):
    cfg = make_cfg(run_dirs, tmp_path)
    cfg.save = dataclasses.replace(cfg.save, experiment_name="")
    name = tmain.experiment_name(cfg)
    assert "model_hierarchy_metric" in name
    assert "lr_0.001" in name and "b_8" in name and "e_3" in name


def test_build_schedule_branches(run_dirs, tmp_path):
    base = make_cfg(run_dirs, tmp_path)
    for sched in ("cosine", "const-cooldown"):
        cfg = dataclasses.replace(
            base, solver=dataclasses.replace(base.solver, lr_scheduler=sched))
        fn = tmain.build_schedule(cfg, steps_per_epoch=4)
        assert np.isfinite(float(fn(0))) and np.isfinite(float(fn(11)))
    bad = dataclasses.replace(
        base, solver=dataclasses.replace(base.solver, lr_scheduler="nope"))
    with pytest.raises(ValueError, match="unknown lr scheduler"):
        tmain.build_schedule(bad, steps_per_epoch=4)


def test_build_params_pretrained_towers(run_dirs, tmp_path):
    """model.pretrained_image / pretrained_text load timm-ViT / (prefixed)
    HF-BERT torch checkpoints through the converters; an MoE trunk with a
    dense pretrained_image is rejected."""
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    from tests.torch_fixtures import TorchViT

    cfg = make_cfg(run_dirs, tmp_path)
    tvit = TorchViT(cfg.keep.vision).eval()
    img_pt = tmp_path / "vit.pt"
    torch.save(tvit.state_dict(), img_pt)

    t = cfg.keep.text
    hf = BertModel(HFBertConfig(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        intermediate_size=t.intermediate_size,
        max_position_embeddings=t.max_position_embeddings)).eval()
    # the reference's knowledge-BERT checkpoints carry a bert_model. prefix
    sd = {f"bert_model.{k}": v for k, v in hf.state_dict().items()}
    txt_pt = tmp_path / "bert.pt"
    torch.save(sd, txt_pt)

    cfg.model = dataclasses.replace(
        cfg.model, pretrained_image=str(img_pt), pretrained_text=str(txt_pt))
    params = tmain.build_params(cfg, rng_seed=0)
    np.testing.assert_allclose(
        np.asarray(params["visual"]["cls_token"]).ravel(),
        tvit.cls_token.detach().numpy().ravel(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["text"]["embeddings"]["word"]),
        hf.state_dict()["embeddings.word_embeddings.weight"].numpy(),
        atol=1e-6)

    moe_cfg = make_cfg(run_dirs, tmp_path,
                       vision_kw=dict(moe_experts=2, moe_capacity_factor=2.0))
    moe_cfg.model = dataclasses.replace(
        moe_cfg.model, pretrained_image=str(img_pt))
    with pytest.raises(ValueError, match="DENSE timm trunk"):
        tmain.build_params(moe_cfg, rng_seed=0)


def test_resume_fresh_start_and_epoch_select(run_dirs, tmp_path):
    """resume='latest' on an empty dir logs fresh-start; resume='<epoch>'
    restores that epoch; resuming past solver.epochs trains nothing."""
    d = tmp_path / "run"
    cfg = make_cfg(run_dirs, d, epochs=1)
    cfg.save = dataclasses.replace(cfg.save, resume="latest")
    res = tmain.train(cfg)  # no checkpoint yet -> fresh start leg
    assert res["epoch"] == 0

    cfg2 = make_cfg(run_dirs, d, epochs=2)
    cfg2.save = dataclasses.replace(cfg2.save, resume="0")  # explicit epoch
    res2 = tmain.train(cfg2)
    assert res2["epoch"] == 1  # trained exactly the remaining epoch

    cfg3 = make_cfg(run_dirs, d, epochs=1)
    cfg3.save = dataclasses.replace(cfg3.save, resume="latest")
    res3 = tmain.train(cfg3)  # start_epoch 2 >= epochs 1: nothing to train
    assert res3["resumed"] and res3["epoch"] == 1  # last restored epoch


def test_copy_codebase_remote_sync_and_preload(run_dirs, tmp_path):
    """One run exercising save.copy_codebase, save.remote_sync (local dir
    target: initial sync, background process, final sync) and
    dataset.preload_images."""
    sync_dir = tmp_path / "synced"
    cfg = make_cfg(run_dirs, tmp_path / "run", epochs=1)
    cfg.save = dataclasses.replace(cfg.save, copy_codebase=True,
                                   remote_sync=str(sync_dir),
                                   remote_sync_frequency=1)
    cfg.dataset = dataclasses.replace(cfg.dataset, preload_data=True)
    res = tmain.train(cfg)
    assert res["epoch"] == 0
    out = tmp_path / "run" / "exp"
    assert (out / "code" / "keep_tpu").is_dir()  # snapshot
    assert any(sync_dir.rglob("*")), "remote sync copied nothing"


def test_main_cli_overrides(run_dirs, tmp_path):
    """In-process main(argv): --resume and --experiment-name override the
    YAML (the subprocess CLI tests don't register line coverage)."""
    import yaml

    cfg = make_cfg(run_dirs, tmp_path, epochs=1)
    y = tmp_path / "cfg.yml"
    y.write_text(yaml.safe_dump(dataclasses.asdict(cfg)))
    res = tmain.main(["--config", str(y), "--experiment-name", "cli_exp",
                      "--resume", ""])
    assert res["epoch"] == 0
    assert (tmp_path / "cli_exp").is_dir()
