"""Metric writers: results.jsonl always; TensorBoard / wandb when their
packages exist (reference main.py:123-133,362-385 — TB writer + wandb run).
This image ships neither, so both gates no-op cleanly."""

from __future__ import annotations

import logging
import os
from typing import Optional


class MetricWriter:
    """Fan-out writer: JSONL (always) + TensorBoard + wandb (if importable)."""

    def __init__(self, out_dir: str, jsonl_name: str = "metrics.jsonl",
                 wandb_project: Optional[str] = None):
        from keep_tpu.utils.logging import append_results

        self._append = append_results
        self._jsonl = os.path.join(out_dir, jsonl_name)
        self._tb = None
        self._wandb = None
        try:  # tensorboardX or torch.utils.tensorboard
            try:
                from tensorboardX import SummaryWriter  # type: ignore
            except ImportError:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(os.path.join(out_dir, "tensorboard"))
        except Exception:
            logging.debug("tensorboard writer unavailable; JSONL only")
        if wandb_project:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(project=wandb_project, dir=out_dir)
            except Exception:
                logging.debug("wandb unavailable; JSONL only")

    def write(self, step: int, metrics: dict) -> None:
        self._append(self._jsonl, {"step": step, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
