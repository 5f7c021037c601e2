"""Freeze scheduling: train towers frozen for the first K epochs.

Reference (training/path_training/freeze_scheduler.py:6-103): FreezeScheduler
freezes ``model.visual`` / ``model.text`` / ``model.knowledge`` while
``epoch < FREEZE_*_EPOCHS`` (keeping the text tower's ``mlp_embed`` trainable
when there is no knowledge tower), and FreezeChecker verifies post-epoch that
frozen weights did not move.

TPU-native: freezing = zeroed updates via ``optax.multi_transform`` (see
``optim.freeze_wrapper``); the train step is re-jitted per freeze phase
(a handful of phases per run)."""

from __future__ import annotations

import dataclasses
from typing import FrozenSet, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FreezeSchedule:
    freeze_visual_epochs: int = 0
    freeze_text_epochs: int = 0
    freeze_knowledge_epochs: int = 0
    keep_text_head_open: bool = True  # mlp_embed stays trainable (ref :34-43)

    def frozen_towers(self, epoch: int) -> FrozenSet[str]:
        out = set()
        if epoch < self.freeze_visual_epochs:
            out.add("visual")
        if epoch < self.freeze_text_epochs:
            out.add("text")
        if epoch < self.freeze_knowledge_epochs:
            out.add("knowledge")
        return frozenset(out)

    def frozen_fn(self, epoch: int):
        towers = self.frozen_towers(epoch)
        keep_head = self.keep_text_head_open

        def fn(path_keys: Sequence[str]) -> bool:
            if not path_keys:
                return False
            top = path_keys[0]
            if top not in towers:
                return False
            if top == "text" and keep_head and "mlp_embed" in path_keys:
                return False
            return True

        return fn

    def phases(self, epochs: int) -> list[tuple[int, FrozenSet[str]]]:
        """[(first_epoch, frozen_towers)] change points over the run."""
        out = []
        prev = None
        for e in range(epochs):
            cur = self.frozen_towers(e)
            if cur != prev:
                out.append((e, cur))
                prev = cur
        return out


def snapshot(params: dict) -> dict:
    """Per-top-level-subtree L2 norms (FreezeChecker analog, ref :80-103)."""
    return {
        k: float(
            jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(x.astype(jnp.float32)))
                    for x in jax.tree.leaves(v)
                )
            )
        )
        for k, v in params.items()
    }


def diff_report(before: dict, after_params: dict, atol: float = 1e-7) -> dict:
    """{subtree: 'frozen'|'open'} by comparing norms across an epoch."""
    after = snapshot(after_params)
    return {
        k: ("frozen" if abs(after[k] - before[k]) <= atol * max(1.0, before[k]) else "open")
        for k in before
    }
