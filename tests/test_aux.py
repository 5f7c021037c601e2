"""Aux subsystems: remote sync, throughput meter, preprocessing config."""

import os
import time

import numpy as np

from keep_tpu.train.sync import remote_sync, start_sync_process
from keep_tpu.utils.profiling import ThroughputMeter


def test_remote_sync_local(tmp_path):
    src = tmp_path / "ckpts"
    dst = tmp_path / "remote"
    (src / "0").mkdir(parents=True)
    (src / "0" / "data.bin").write_bytes(b"abc")
    (src / "epoch_latest.bin").write_bytes(b"mutating")  # must be excluded
    (src / "1.orbax-checkpoint-tmp").mkdir()
    assert remote_sync(str(src), str(dst))
    assert (dst / "0" / "data.bin").read_bytes() == b"abc"
    assert not (dst / "epoch_latest.bin").exists()


def test_remote_sync_incremental(tmp_path):
    src = tmp_path / "a"
    dst = tmp_path / "b"
    src.mkdir()
    f = src / "x.bin"
    f.write_bytes(b"v1")
    remote_sync(str(src), str(dst))
    t1 = os.path.getmtime(dst / "x.bin")
    remote_sync(str(src), str(dst))  # unchanged → not recopied
    assert os.path.getmtime(dst / "x.bin") == t1
    time.sleep(0.01)
    f.write_bytes(b"v2")
    os.utime(f)
    remote_sync(str(src), str(dst))
    assert (dst / "x.bin").read_bytes() == b"v2"


def test_sync_process_lifecycle(tmp_path):
    src = tmp_path / "s"
    src.mkdir()
    (src / "f.bin").write_bytes(b"z")
    p = start_sync_process(1, str(src), str(tmp_path / "d"))
    assert p.is_alive()
    p.terminate()
    p.join(timeout=5)
    assert not p.is_alive()


def test_throughput_meter():
    m = ThroughputMeter(window=10)
    m.update(10)
    time.sleep(0.02)
    m.update(10)
    assert m.samples_per_sec > 0
    assert m.per_device(2) == m.samples_per_sec / 2


def test_multihost_single_process_passthrough():
    from keep_tpu.parallel.multihost import (
        all_gather_object,
        broadcast_object,
        is_master,
        process_count,
        process_index,
    )

    assert process_index() == 0 and process_count() == 1 and is_master()
    obj = {"resume": "/ckpts/epoch_3", "n": 7}
    assert broadcast_object(obj) == obj
    assert all_gather_object(obj) == [obj]


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from keep_tpu.utils.profiling import trace

    with trace(str(tmp_path / "prof")):
        float(jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64))))
    import os

    found = any("plugins" in r or f for r, d, f in os.walk(tmp_path / "prof"))
    assert found  # a profile directory structure was written


def test_metric_writer(tmp_path):
    """MetricWriter fans out to JSONL (always) and degrades cleanly when
    TB/wandb are absent; torch's SummaryWriter is picked up when available."""
    import json

    from keep_tpu.utils.writers import MetricWriter

    w = MetricWriter(str(tmp_path))
    w.write(1, {"loss": 2.5, "lr": 1e-4, "tag": "not-a-scalar"})
    w.write(2, {"loss": 2.0})
    w.close()
    lines = [json.loads(ln) for ln in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 2.5
    assert lines[1]["loss"] == 2.0


def test_metric_writer_non_primary_noop(tmp_path):
    """primary=False (non-zero process in multi-host runs) writes nothing —
    metrics are identical across processes and the reference logs
    master-only."""
    from keep_tpu.utils.writers import MetricWriter

    w = MetricWriter(str(tmp_path), primary=False)
    w.write(1, {"loss": 1.0})
    w.close()
    assert not (tmp_path / "metrics.jsonl").exists()


def test_metric_writer_scalar_coercion():
    """numpy / 0-d jax scalars are recognized for the TB path (np.float32 is
    not a Python float subclass)."""
    import numpy as np

    from keep_tpu.utils.writers import _scalar

    import jax.numpy as jnp

    assert _scalar(np.float32(1.5)) == 1.5
    assert _scalar(np.int64(3)) == 3.0
    assert _scalar(jnp.asarray(2.5)) == 2.5
    assert _scalar("tag") is None
    assert _scalar(np.zeros(3)) is None


def test_checkpoint_delete_previous_via_max_to_keep(tmp_path):
    """keep_previous=False delegates GC to Orbax max_to_keep=1: only the
    newest epoch survives, resume still works, async saves don't
    serialize behind a hand-rolled rmtree."""
    import numpy as np

    from keep_tpu.train import checkpoint as ckpt

    d = str(tmp_path / "ck")
    w = ckpt.CheckpointWriter(d, keep_previous=False)
    for e in range(3):
        w.save(e, {"w": np.full((4,), float(e))}, step=e * 10)
    w.close()
    assert ckpt.list_epochs(d) == [2]
    out = ckpt.restore(d)
    assert out["epoch"] == 2 and int(out["step"]) == 20
    np.testing.assert_array_equal(out["params"]["w"], np.full((4,), 2.0))

    # keep_previous=True (default) keeps everything
    d2 = str(tmp_path / "ck2")
    w2 = ckpt.CheckpointWriter(d2)
    for e in range(2):
        w2.save(e, {"w": np.zeros((2,))}, step=e)
    w2.close()
    assert ckpt.list_epochs(d2) == [0, 1]


def test_pick_from_medians_margin_rule():
    """The shared B=1 policy rule: the default keeps its seat unless a
    challenger beats it by more than the margin (bounded regret)."""
    from keep_tpu.utils.rtt import pick_from_medians

    # challenger wins big (the r04 day: bf16 48 vs int8 69 ms) -> switch
    assert pick_from_medians({"int8": 69.0, "bf16": 48.0}, "int8") == "bf16"
    # challenger wins small (r05 dress day, roles reversed) -> default holds
    assert pick_from_medians({"int8": 49.1, "bf16": 53.7}, "int8") == "int8"
    assert pick_from_medians({"int8": 50.0, "bf16": 47.0}, "int8") == "int8"
    # default itself the winner -> default
    assert pick_from_medians({"int8": 40.0, "bf16": 80.0}, "int8") == "int8"


def test_pick_by_probe_times_and_warms():
    """pick_by_probe: one warm call + n timed per candidate; returns the
    measured choice and the medians it decided from."""
    from keep_tpu.utils.rtt import pick_by_probe

    calls = {"fast": 0, "slow": 0}

    def mk(name, s):
        def f():
            calls[name] += 1
            time.sleep(s)
        return f

    choice, meds = pick_by_probe(
        {"slow": mk("slow", 0.02), "fast": mk("fast", 0.002)},
        n=3, default="slow")
    assert choice == "fast"  # 10x faster clears any margin
    assert calls == {"fast": 4, "slow": 4}  # 1 warm + 3 timed each
    assert meds["fast"] < meds["slow"]
    # without a default the plain minimum wins
    choice, _ = pick_by_probe(
        {"a": mk("fast", 0.002), "b": mk("fast", 0.002)}, n=1)
    assert choice in ("a", "b")


def test_metric_writer_tensorboard_and_failed_wandb(tmp_path, caplog):
    """The TB leg (torch.utils.tensorboard ships in-image) writes event
    files; an explicitly requested wandb project that cannot init warns and
    degrades to JSONL+TB instead of crashing the run."""
    import json as _json
    import logging as _logging

    from keep_tpu.utils.writers import MetricWriter

    with caplog.at_level(_logging.WARNING):
        w = MetricWriter(str(tmp_path), wandb_project="definitely-absent")
    w.write(0, {"loss": 1.5, "label": "skipme"})
    w.write(1, {"loss": 1.25})
    w.close()
    lines = [
        _json.loads(l) for l in
        open(tmp_path / "metrics.jsonl").read().splitlines()
    ]
    assert [l["loss"] for l in lines] == [1.5, 1.25]
    if w._tb is not None:  # torch's SummaryWriter was importable
        import os as _os

        tb_dir = tmp_path / "tensorboard"
        assert any(tb_dir.iterdir())
        assert w._wandb is None
        assert any("wandb" in r.message for r in caplog.records)


def test_wsi_dataset_pt_leg_and_iter(tmp_path):
    """WSIDataset use_h5=False reads CLAM .pt feature files (torch tensors,
    zero coords) and __iter__ yields every slide in df order."""
    import pandas as pd
    import torch

    from keep_tpu.io.h5 import WSIDataset

    d = tmp_path / "src"
    (d / "pt_files").mkdir(parents=True)
    feats = {"s1": torch.randn(5, 8), "s2": torch.randn(3, 8)}
    for sid, t in feats.items():
        torch.save(t, d / "pt_files" / f"{sid}.pt")
    df = pd.DataFrame({"slide_id": ["s1", "s2"],
                       "Diagnosis": ["Tumor", "Normal"]})
    ds = WSIDataset(df, str(d), label_map={"Normal": 0, "Tumor": 1},
                    use_h5=False)
    items = list(ds)
    assert [it["slide_id"] for it in items] == ["s1", "s2"]
    assert items[0]["features"].shape == (5, 8)
    np.testing.assert_array_equal(items[0]["coords"], 0)
    assert [it["label"] for it in items] == [1, 0]


def test_remote_sync_error_and_loop_legs(tmp_path, caplog, monkeypatch):
    """remote_sync returns False (logged, not raised) when the backend
    throws; the _loop body logs per-iteration outcomes (it normally runs
    only in the detached child process, so cover it inline)."""
    import logging as _logging

    from keep_tpu.train import sync as sync_mod

    src = tmp_path / "ckpt"
    src.mkdir()
    (src / "a.txt").write_text("x")

    def boom(*a, **k):
        raise OSError("backend down")

    monkeypatch.setattr(sync_mod, "sync_local", boom)
    with caplog.at_level(_logging.ERROR):
        ok = sync_mod.remote_sync(str(src), str(tmp_path / "dst"), "local")
    assert ok is False
    assert any("remote sync failed" in r.message for r in caplog.records)

    # one _loop iteration: patch sleep to run once then stop the loop
    calls = []

    def fake_sleep(_):
        if calls:
            raise KeyboardInterrupt
        calls.append(1)

    monkeypatch.setattr(sync_mod.time, "sleep", fake_sleep)
    monkeypatch.setattr(sync_mod, "remote_sync", lambda *a: True)
    with caplog.at_level(_logging.INFO):
        try:
            sync_mod._loop(1, str(src), str(tmp_path / "dst2"), "local")
        except KeyboardInterrupt:
            pass
    assert any("remote sync ok" in r.message for r in caplog.records)
