"""Multi-host coordination helpers.

The reference's ``broadcast_object`` / ``all_gather_object``
(training/path_training/distributed.py:117-137) coordinate Python objects
across DDP ranks (e.g. the discovered resume checkpoint path,
main.py:147-166). JAX's analog is process-level: one process per host,
``multihost_utils`` for object broadcast. On a single host these are
passthroughs, so the same code runs everywhere.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

_INITIALIZED = False


def init_from_env() -> bool:
    """Initialize ``jax.distributed`` from the environment — the
    reference's ``init_distributed_device`` discovery order
    (distributed.py:24-60), TPU-native:

    1. torchrun-style ``MASTER_ADDR``/``MASTER_PORT`` + ``RANK``/
       ``WORLD_SIZE`` (the reference's ``env://`` init, params.py:370-374)
    2. SLURM (``SLURM_NTASKS``/``SLURM_PROCID``) and OpenMPI
       (``OMPI_COMM_WORLD_SIZE``) — delegated to JAX's built-in cluster
       auto-detection
    3. Cloud TPU pod metadata (``TPU_WORKER_HOSTNAMES`` /
       ``MEGASCALE_COORDINATOR_ADDRESS``) — likewise

    Returns True when a multi-process runtime was initialized; no-op
    (False) for single-process runs so the same entrypoint works
    everywhere. The training CLI calls this first thing, so
    ``python -m keep_tpu.train.main`` under torchrun/srun/mpirun Just
    Works like the reference's launcher did."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    env = os.environ
    world = int(env.get("WORLD_SIZE") or 0)
    # single-worker TPU VMs also export TPU_WORKER_HOSTNAMES (one entry) —
    # only a real pod (multiple workers) warrants distributed init
    tpu_workers = len((env.get("TPU_WORKER_HOSTNAMES") or "").split(","))
    try:
        if env.get("MASTER_ADDR") and world > 1:
            rank_s = env.get("RANK") or env.get("SLURM_PROCID")
            if rank_s is None:
                # rank-0 default would make EVERY process announce as 0 and
                # hang the coordinator until timeout — fail fast instead
                raise ValueError(
                    "MASTER_ADDR + WORLD_SIZE>1 set but no RANK (or "
                    "SLURM_PROCID) in the environment — export RANK per "
                    "process (torchrun does)")
            rank = int(rank_s)
            addr = f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '7709')}"
            jax.distributed.initialize(addr, num_processes=world,
                                       process_id=rank)
            _INITIALIZED = True
            return True
        if (int(env.get("SLURM_NTASKS") or 0) > 1
                or int(env.get("OMPI_COMM_WORLD_SIZE") or 0) > 1
                or tpu_workers > 1
                or env.get("MEGASCALE_COORDINATOR_ADDRESS")):
            jax.distributed.initialize()  # JAX cluster auto-detection
            _INITIALIZED = True
            return True
    except RuntimeError as e:
        # backend already initialized (library use after jax calls) — run
        # single-process rather than crash; launchers call us first
        import logging

        logging.warning("init_from_env skipped: %s", e)
    return False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def broadcast_object(obj: Any, name: str = "broadcast") -> Any:
    """Broadcast a picklable object from process 0 to all processes
    (reference broadcast_object, distributed.py:117-127)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # lengths first (fixed shape), then the padded payload
    length = multihost_utils.broadcast_one_to_all(
        np.asarray([payload.size], np.int64)
    )[0]
    buf = np.zeros(int(length), np.uint8)
    if is_master():
        buf[: payload.size] = payload
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(buf.tobytes())


def all_gather_object(obj: Any) -> list[Any]:
    """Gather one picklable object per process (reference all_gather_object,
    distributed.py:130-137)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    # fixed-size frame: every process pads to the global max length
    payload = pickle.dumps(obj)
    max_len = int(
        multihost_utils.process_allgather(np.asarray([len(payload)], np.int64)).max()
    )
    buf = np.zeros(max_len + 8, np.uint8)
    buf[:8] = np.frombuffer(np.asarray([len(payload)], np.int64).tobytes(), np.uint8)
    buf[8 : 8 + len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for row in gathered:
        n = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + n].tobytes()))
    return out
