"""Env-discovery matrix for parallel/multihost.init_from_env (VERDICT r05
#9): every branch of the reference's init order (distributed.py:24-60) with
jax.distributed.initialize faked — no real pods needed — plus the
multi-process legs of broadcast/all_gather with multihost_utils faked.

The REAL 2-process broadcast/gather behavior is covered end-to-end by
tests/test_multiprocess.py; these tests buy line coverage of the in-process
framing logic."""

import logging

import numpy as np
import pytest

import jax

from keep_tpu.parallel import multihost


@pytest.fixture(autouse=True)
def _reset_state(monkeypatch):
    monkeypatch.setattr(multihost, "_INITIALIZED", False)
    # scrub any launcher vars leaking from the host environment
    for var in ("MASTER_ADDR", "MASTER_PORT", "RANK", "WORLD_SIZE",
                "SLURM_PROCID", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    yield


class FakeInit:
    def __init__(self, raise_runtime=False):
        self.calls = []
        self.raise_runtime = raise_runtime

    def __call__(self, *args, **kw):
        self.calls.append((args, kw))
        if self.raise_runtime:
            raise RuntimeError("backend already initialized")


def test_no_env_is_single_process():
    assert multihost.init_from_env() is False


def test_torchrun_env(monkeypatch):
    fake = FakeInit()
    monkeypatch.setattr(jax.distributed, "initialize", fake)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "1234")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "3")
    assert multihost.init_from_env() is True
    assert fake.calls == [(("10.0.0.1:1234",),
                           {"num_processes": 4, "process_id": 3})]
    # memoized: a second call is a no-op returning True
    assert multihost.init_from_env() is True
    assert len(fake.calls) == 1


def test_torchrun_default_port_and_slurm_rank(monkeypatch):
    fake = FakeInit()
    monkeypatch.setattr(jax.distributed, "initialize", fake)
    monkeypatch.setenv("MASTER_ADDR", "h0")
    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.setenv("SLURM_PROCID", "1")  # RANK absent: SLURM fallback
    assert multihost.init_from_env() is True
    assert fake.calls[0][0] == ("h0:7709",)
    assert fake.calls[0][1] == {"num_processes": 2, "process_id": 1}


def test_master_addr_without_rank_fails_fast(monkeypatch):
    monkeypatch.setattr(jax.distributed, "initialize", FakeInit())
    monkeypatch.setenv("MASTER_ADDR", "h0")
    monkeypatch.setenv("WORLD_SIZE", "2")
    with pytest.raises(ValueError, match="no RANK"):
        multihost.init_from_env()


@pytest.mark.parametrize("var,val", [
    ("SLURM_NTASKS", "4"),
    ("OMPI_COMM_WORLD_SIZE", "8"),
    ("TPU_WORKER_HOSTNAMES", "w0,w1"),
    ("MEGASCALE_COORDINATOR_ADDRESS", "c:1"),
])
def test_cluster_autodetect(monkeypatch, var, val):
    fake = FakeInit()
    monkeypatch.setattr(jax.distributed, "initialize", fake)
    monkeypatch.setenv(var, val)
    assert multihost.init_from_env() is True
    assert fake.calls == [((), {})]  # delegated to JAX auto-detection


def test_single_worker_tpu_vm_not_distributed(monkeypatch):
    # one-entry TPU_WORKER_HOSTNAMES (a plain TPU VM) must NOT init
    monkeypatch.setattr(jax.distributed, "initialize", FakeInit())
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert multihost.init_from_env() is False


def test_already_initialized_runtime_error(monkeypatch, caplog):
    monkeypatch.setattr(jax.distributed, "initialize",
                        FakeInit(raise_runtime=True))
    monkeypatch.setenv("SLURM_NTASKS", "2")
    with caplog.at_level(logging.WARNING):
        assert multihost.init_from_env() is False
    assert "init_from_env skipped" in caplog.text


def test_helpers_single_process():
    assert multihost.process_index() == 0
    assert multihost.process_count() >= 1
    assert multihost.is_master() in (True, False)
    assert multihost.broadcast_object({"a": 1}) == {"a": 1}
    assert multihost.all_gather_object(5) == [5]


def test_broadcast_object_multiprocess_framing(monkeypatch):
    """Drive the >1-process leg in-process: broadcast_one_to_all faked as
    identity (what rank 0 sees), process_count faked to 2."""
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", lambda x: x)
    obj = {"path": "/ckpt/epoch_3.pt", "epoch": 3}
    assert multihost.broadcast_object(obj) == obj


def test_all_gather_object_multiprocess_framing(monkeypatch):
    """process_allgather faked to return two differently-padded rows —
    exercises the length-prefixed unframing of ragged pickles."""
    import pickle

    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    other = pickle.dumps({"rank": 1, "extra": "x" * 50})

    def fake_allgather(buf):
        if buf.size == 1:  # the max-length exchange (int64 lengths)
            return np.stack([buf, np.asarray([len(other)], np.int64)])
        row2 = np.zeros_like(buf)
        row2[:8] = np.frombuffer(
            np.asarray([len(other)], np.int64).tobytes(), np.uint8)
        row2[8:8 + len(other)] = np.frombuffer(other, np.uint8)
        return np.stack([buf, row2])

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    out = multihost.all_gather_object({"rank": 0})
    assert out == [{"rank": 0}, {"rank": 1, "extra": "x" * 50}]
