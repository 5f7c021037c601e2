"""Background checkpoint sync to remote storage.

Reference (training/path_training/file_utils.py:10-75): a multiprocessing
child loops ``remote_sync`` every N seconds, copying the checkpoint dir to
s3/fsspec while excluding the mutating ``epoch_latest`` file; ``pt_load``
reads checkpoints through fsspec.

TPU-native rebuild: same shape — local shutil fast path, fsspec for remote
protocols (s3/gcs/...), master-process only (``jax.process_index() == 0``).
"""

from __future__ import annotations

import logging
import multiprocessing
import os
import shutil
import time


def _should_skip(name: str) -> bool:
    # the latest checkpoint mutates in place; syncing it mid-write races
    # (reference file_utils.py:12 keep_running_checkpoint excluded)
    return "latest" in name or name.endswith(".tmp") or "-tmp" in name


def _walk(local_dir: str):
    """os.walk that PRUNES skip-worthy directories: Orbax async saves write
    under `<step>.orbax-checkpoint-tmp-<ts>/` — the files inside carry no
    'tmp' in their basenames, so a name-only filter synced half-written
    shards and left stale tmp dirs on the remote forever."""
    for root, dirs, files in os.walk(local_dir):
        dirs[:] = [d for d in dirs if not _should_skip(d)]
        yield root, dirs, files


def sync_local(local_dir: str, remote_dir: str) -> bool:
    os.makedirs(remote_dir, exist_ok=True)
    for root, _, files in _walk(local_dir):
        rel = os.path.relpath(root, local_dir)
        for fname in files:
            if _should_skip(fname):
                continue
            src = os.path.join(root, fname)
            dst_dir = os.path.join(remote_dir, rel) if rel != "." else remote_dir
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, fname)
            if not os.path.exists(dst) or os.path.getmtime(src) > os.path.getmtime(dst):
                shutil.copy2(src, dst)
    return True


def sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    try:
        import fsspec
    except ImportError:
        logging.error("fsspec unavailable for remote sync to %s", remote_dir)
        return False
    fs, _ = fsspec.core.url_to_fs(remote_dir)
    for root, _, files in _walk(local_dir):
        rel = os.path.relpath(root, local_dir)
        for fname in files:
            if _should_skip(fname):
                continue
            src = os.path.join(root, fname)
            dst = "/".join(
                x for x in [remote_dir.rstrip("/"), rel if rel != "." else "", fname] if x
            )
            # size-match skip: checkpoints are immutable once written
            # (sync_local's mtime guard analog — without it every pass
            # re-uploaded the full multi-GB tree)
            try:
                if fs.exists(dst) and fs.info(dst).get("size") == os.path.getsize(src):
                    continue
            except Exception:
                pass  # unknown remote state → upload
            # directory-ful filesystems (file://, sftp) need the parent to
            # exist; object stores no-op here (coverage-found: local-scheme
            # sync crashed FileNotFoundError on nested checkpoints)
            try:
                fs.makedirs(dst.rsplit("/", 1)[0], exist_ok=True)
            except Exception:
                pass
            fs.put(src, dst)
    return True


def remote_sync(local_dir: str, remote_dir: str, protocol: str = "auto") -> bool:
    """One sync pass (reference remote_sync, file_utils.py:44-56)."""
    try:
        if protocol == "local" or (protocol == "auto" and "://" not in remote_dir):
            return sync_local(local_dir, remote_dir)
        return sync_fsspec(local_dir, remote_dir)
    except Exception as e:  # sync must never kill training
        logging.error("remote sync failed: %s", e)
        return False


def _loop(interval: int, local_dir: str, remote_dir: str, protocol: str):
    while True:
        time.sleep(interval)
        ok = remote_sync(local_dir, remote_dir, protocol)
        logging.info("remote sync %s", "ok" if ok else "FAILED")


def start_sync_process(
    interval: int, local_dir: str, remote_dir: str, protocol: str = "auto"
) -> multiprocessing.Process:
    """Background sync child (reference start_sync_process, file_utils.py:59-66).
    Call on the master process only; ``.terminate()`` to stop."""
    p = multiprocessing.Process(
        target=_loop,
        args=(interval, local_dir, remote_dir, protocol),
        daemon=True,
        name="keep-tpu-remote-sync",
    )
    p.start()
    return p
