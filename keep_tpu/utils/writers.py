"""Metric writers: results.jsonl always; TensorBoard / wandb when their
packages exist (reference main.py:123-133,362-385 — TB writer + wandb run).
This image ships neither, so both gates no-op cleanly."""

from __future__ import annotations

import logging
import numbers
import os
from typing import Optional


def _scalar(v) -> Optional[float]:
    """float value for Python/numpy scalars and 0-d arrays, else None."""
    if isinstance(v, numbers.Number):  # int, float, bool, np.float32, ...
        return float(v)
    if getattr(v, "shape", None) == ():  # 0-d np/jax array
        return float(v)
    return None


class MetricWriter:
    """Fan-out writer: JSONL (always) + TensorBoard + wandb (if importable).

    ``primary=False`` (non-zero ``jax.process_index()`` in multi-host runs)
    makes every method a no-op — the reference logs metrics master-only
    (train_hierarchy.py master gating) and loss/metric values are identical
    across processes after the psum, so replicating them would only race on
    the shared out_dir and open duplicate wandb runs."""

    def __init__(self, out_dir: str, jsonl_name: str = "metrics.jsonl",
                 wandb_project: Optional[str] = None, primary: bool = True):
        from keep_tpu.utils.logging import append_results

        self._append = append_results
        self._jsonl = os.path.join(out_dir, jsonl_name)
        self._primary = primary
        self._tb = None
        self._wandb = None
        if not primary:
            return
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
            except Exception as e:
                # the user asked for wandb explicitly — surface the failure
                logging.warning(
                    "wandb_project=%r requested but wandb.init failed (%s); "
                    "metrics go to JSONL%s only", wandb_project, e,
                    "/TensorBoard" if self._tb is not None else "")

    def write(self, step: int, metrics: dict) -> None:
        if not self._primary:
            return
        self._append(self._jsonl, {"step": step, **metrics})
        if self._tb is not None:
            for k, v in metrics.items():
                f = _scalar(v)
                if f is not None:
                    self._tb.add_scalar(k, f, step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
