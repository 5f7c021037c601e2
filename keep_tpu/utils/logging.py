"""Logging + meters (reference training/path_training/logger.py:4-26,
train_hierarchy.py:36-52) and the results.jsonl eval history
(train_hierarchy.py:341-343)."""

from __future__ import annotations

import json
import logging
import os
import socket
import sys


def setup_logging(
    log_file: str | None = None,
    level: int = logging.INFO,
    include_host: bool = False,
) -> None:
    if include_host:
        hostname = socket.gethostname()
        fmt = f"%(asctime)s | {hostname} | %(levelname)s | %(message)s"
    else:
        fmt = "%(asctime)s | %(levelname)s | %(message)s"
    formatter = logging.Formatter(fmt, datefmt="%Y-%m-%d,%H:%M:%S")

    root = logging.getLogger()
    root.setLevel(level)
    for h in list(root.handlers):
        root.removeHandler(h)
        h.close()  # flush + release the fd of any previous FileHandler
    stream = logging.StreamHandler(sys.stderr)
    stream.setFormatter(formatter)
    root.addHandler(stream)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(formatter)
        root.addHandler(fh)


class AverageMeter:
    """Running average (train_hierarchy.py:36-52)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def append_results(path: str, record: dict) -> None:
    """Append one eval record to results.jsonl (train_hierarchy.py:341-343)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, default=float) + "\n")


def copy_codebase(out_dir: str, repo_root: str | None = None) -> str:
    """Snapshot the framework source next to a run's outputs (reference
    copy_codebase, main.py:469-483)."""
    import shutil

    repo_root = repo_root or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    dst = os.path.join(out_dir, "code")
    if os.path.exists(dst):
        # resumed run (save.resume='latest' reuses out_dir): the snapshot
        # from the original launch is the one worth keeping — don't crash
        logging.getLogger(__name__).info(
            "code snapshot already exists at %s; keeping it", dst)
        return dst
    shutil.copytree(
        os.path.join(repo_root, "keep_tpu"), os.path.join(dst, "keep_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
    )
    return dst
