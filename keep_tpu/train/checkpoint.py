"""Checkpoint / resume via Orbax.

Reference semantics (training/path_training/main.py:111-167,306-326,422-450):
checkpoints carry {epoch, state_dict, optimizer, scaler?}; ``epoch_latest``
is written atomically every epoch; ``resume='latest'`` discovers the newest
checkpoint; bare state_dicts (no optimizer) also load. Orbax provides the
atomic write + async save; no GradScaler state exists on TPU (bf16 native).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

LATEST = "epoch_latest"


def _mgr(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(create=True, enable_async_checkpointing=False),
    )


def save(ckpt_dir: str, epoch: int, params: Any, opt_state: Any = None,
         step: int = 0, keep_previous: bool = True) -> None:
    """Write checkpoint ``epoch_{epoch}`` (atomically, like the reference's
    tmp+os.replace latest save). One-shot wrapper over CheckpointWriter."""
    w = CheckpointWriter(ckpt_dir, async_save=False,
                         keep_previous=keep_previous)
    try:
        w.save(epoch, params, opt_state=opt_state, step=step)
    finally:
        w.close()


class CheckpointWriter:
    """Persistent manager for per-epoch saves; ``async_save=True`` keeps the
    epoch loop running while the previous checkpoint serializes in the
    background (Orbax async path). Call :meth:`close` (train() does) to wait
    for the last pending save before the process exits.

    ``keep_previous=False`` delegates deletion to Orbax's ``max_to_keep=1``
    — old steps are garbage-collected by the manager itself (asynchronously
    under ``async_save``; a hand-rolled rmtree would both serialize every
    save behind wait_until_finished and leave the manager's step metadata
    stale)."""

    def __init__(self, ckpt_dir: str, async_save: bool = False,
                 keep_previous: bool = True):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.keep_previous = keep_previous
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                create=True, enable_async_checkpointing=async_save,
                max_to_keep=None if keep_previous else 1),
        )

    def save(self, epoch: int, params: Any, opt_state: Any = None,
             step: int = 0) -> None:
        payload = {"params": params, "step": np.asarray(step)}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def list_epochs(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        if re.fullmatch(r"\d+", name):
            out.append(int(name))
    return sorted(out)


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    """'resume latest' discovery (main.py:54-67): newest epoch or None."""
    epochs = list_epochs(ckpt_dir)
    return epochs[-1] if epochs else None


def restore(ckpt_dir: str, epoch: Optional[int] = None,
            like: Optional[Any] = None) -> dict:
    """Load checkpoint ``epoch`` (default: latest). ``like`` is an abstract
    payload (same structure, e.g. {'params': params, 'opt_state': ..., 'step': ...})
    to restore into — required for sharded restore."""
    if epoch is None:
        epoch = latest_epoch(ckpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    mgr = _mgr(ckpt_dir)
    if like is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        out = mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))
    else:
        out = mgr.restore(epoch)
    mgr.close()
    out["epoch"] = epoch
    return out
