"""Tests provoked by the round-4 line-coverage report (docs/COVERAGE.md):
error/CLI legs that no test had ever executed — multihost env discovery,
remote-sync fsspec leg, config rejection paths, wsi.run helpers, serve CLI
without --lora."""

import json
import os

import numpy as np
import pytest

import jax


# ---------------------------------------------------------------------------
# parallel/multihost.init_from_env (reference distributed.py:24-60 order)
# ---------------------------------------------------------------------------


def test_init_from_env_no_cluster_env_is_noop(monkeypatch):
    from keep_tpu.parallel import multihost

    for var in ("MASTER_ADDR", "WORLD_SIZE", "RANK", "SLURM_PROCID",
                "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(multihost, "_INITIALIZED", False)
    assert multihost.init_from_env() is False


def test_init_from_env_missing_rank_fails_fast(monkeypatch):
    """MASTER_ADDR + WORLD_SIZE>1 without RANK: every process would
    announce process_id=0 and hang the coordinator — must raise instead."""
    from keep_tpu.parallel import multihost

    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.delenv("RANK", raising=False)
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    monkeypatch.setattr(multihost, "_INITIALIZED", False)
    with pytest.raises(ValueError, match="no RANK"):
        multihost.init_from_env()


def test_init_from_env_torchrun_style_parsing(monkeypatch):
    """The torchrun env contract (RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT)
    maps onto jax.distributed.initialize(addr, num_processes, process_id)."""
    from keep_tpu.parallel import multihost

    calls = {}

    def fake_init(addr, num_processes, process_id):
        calls.update(addr=addr, world=num_processes, rank=process_id)

    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "1234")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "3")
    monkeypatch.setattr(multihost, "_INITIALIZED", False)
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    try:
        assert multihost.init_from_env() is True
        assert calls == {"addr": "10.0.0.1:1234", "world": 4, "rank": 3}
        assert multihost.init_from_env() is True  # idempotent, no re-init
    finally:
        monkeypatch.setattr(multihost, "_INITIALIZED", False)


def test_init_from_env_already_initialized_runtime_error(monkeypatch):
    """jax.distributed already up (library use after jax calls) → warn and
    run single-process, never crash (the RuntimeError leg)."""
    from keep_tpu.parallel import multihost

    def raising_init(*a, **k):
        raise RuntimeError("backend already initialized")

    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.setenv("RANK", "0")
    monkeypatch.setattr(multihost, "_INITIALIZED", False)
    monkeypatch.setattr(jax.distributed, "initialize", raising_init)
    assert multihost.init_from_env() is False


# ---------------------------------------------------------------------------
# train/sync: the fsspec leg + failure isolation (file_utils.py:10-61)
# ---------------------------------------------------------------------------


def test_sync_fsspec_roundtrip_and_size_skip(tmp_path):
    fsspec = pytest.importorskip("fsspec")  # noqa: F841

    from keep_tpu.train import sync

    src = tmp_path / "ckpts"
    (src / "sub").mkdir(parents=True)
    (src / "epoch_1.ckpt").write_bytes(b"x" * 64)
    (src / "sub" / "results.jsonl").write_text("{}\n")
    (src / "epoch_latest.ckpt").write_bytes(b"y")  # mutating file: excluded
    dst = tmp_path / "remote"
    assert sync.sync_fsspec(str(src), f"file://{dst}") is True
    assert (dst / "epoch_1.ckpt").read_bytes() == b"x" * 64
    assert (dst / "sub" / "results.jsonl").exists()
    assert not (dst / "epoch_latest.ckpt").exists()

    # second pass: size-match skip (immutable checkpoints not re-uploaded)
    before = (dst / "epoch_1.ckpt").stat().st_mtime_ns
    assert sync.sync_fsspec(str(src), f"file://{dst}") is True
    assert (dst / "epoch_1.ckpt").stat().st_mtime_ns == before


def test_remote_sync_never_raises(monkeypatch, tmp_path):
    from keep_tpu.train import sync

    def boom(*a):
        raise OSError("disk on fire")

    monkeypatch.setattr(sync, "sync_local", boom)
    assert sync.remote_sync(str(tmp_path), str(tmp_path / "out")) is False


def test_remote_sync_protocol_routing(monkeypatch, tmp_path):
    from keep_tpu.train import sync

    routed = []
    monkeypatch.setattr(sync, "sync_local", lambda *a: routed.append("local") or True)
    monkeypatch.setattr(sync, "sync_fsspec", lambda *a: routed.append("fsspec") or True)
    sync.remote_sync("/a", "/b")                      # auto, no scheme
    sync.remote_sync("/a", "s3://bucket/x")           # auto, scheme
    sync.remote_sync("/a", "s3://bucket/x", "local")  # forced
    assert routed == ["local", "fsspec", "local"]


# ---------------------------------------------------------------------------
# train/config rejection paths
# ---------------------------------------------------------------------------


def test_config_unknown_key_rejected(tmp_path):
    from keep_tpu.train.config import TrainRunConfig

    p = tmp_path / "cfg.yml"
    p.write_text("solver:\n  learning_rat: 1e-4\n")  # typo'd key
    with pytest.raises(KeyError, match="learning_rat"):
        TrainRunConfig.from_yaml(str(p))


def test_config_empty_yaml_gives_defaults(tmp_path):
    from keep_tpu.train.config import TrainRunConfig

    p = tmp_path / "cfg.yml"
    p.write_text("")
    cfg = TrainRunConfig.from_yaml(str(p))
    assert cfg.keep.projection_dim == 768


# ---------------------------------------------------------------------------
# wsi/run helpers
# ---------------------------------------------------------------------------


def test_try_open_pyramid_rejects_non_slide(tmp_path):
    from keep_tpu.wsi.run import _try_open_pyramid

    p = tmp_path / "not_a_slide.png"
    p.write_bytes(b"\x89PNG nope")
    assert _try_open_pyramid(str(p)) is None


def test_check_wsi_level_out_of_range(tmp_path):
    import types

    from keep_tpu.wsi.run import _check_wsi_level

    closed = []
    pyramid = types.SimpleNamespace(level_count=2,
                                    close=lambda: closed.append(1))
    args = types.SimpleNamespace(wsi_level=5)
    with pytest.raises(SystemExit, match="out of range"):
        _check_wsi_level(args, pyramid, "slide.svs")
    assert closed == [1]


def test_flat_tiles_memoized(tmp_path):
    import types

    from PIL import Image

    from keep_tpu.wsi import run as wsi_run

    img = np.full((96, 96, 3), 240, np.uint8)
    img[10:60, 20:80] = [200, 120, 160]
    p = tmp_path / "flat.png"
    Image.fromarray(img).save(str(p))
    args = types.SimpleNamespace(patch_size=32, tissue_fraction=0.25)
    wsi_run._flat_cache.clear()
    t1, c1 = wsi_run._flat_tiles(args, str(p))
    v1 = wsi_run._flat_cache["value"]
    t2, _ = wsi_run._flat_tiles(args, str(p))
    assert wsi_run._flat_cache["value"] is v1  # second visit: no re-decode
    np.testing.assert_array_equal(t1, t2)
    # different patch size busts the cache
    args2 = types.SimpleNamespace(patch_size=16, tissue_fraction=0.25)
    wsi_run._flat_tiles(args2, str(p))
    assert wsi_run._flat_cache["value"] is not v1
