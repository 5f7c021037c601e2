"""Mesh / sharding helpers.

Replaces the reference's torch.distributed runtime (training/path_training/
distributed.py: NCCL process groups, rank sniffing, DDP wrap, Horovod) with
the JAX-native model: one ``jax.sharding.Mesh``, ``NamedSharding`` batch
layouts, and XLA-inserted collectives over ICI. Rank/world =
``jax.process_index()/process_count()``; broadcast_object becomes
``multihost_utils`` when multi-host.

Axes:
- 'dp': data parallel — the training batch axis AND the WSI patch axis
  (the reference's only parallelism is DP; the WSI sweep's patch dimension
  is the long axis worth sharding, SURVEY §5).
- 'mp': reserved model axis (unused at ViT-L scale; kept so meshes can grow
  to tp without API change).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.array(devices[:n])
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(shape), tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Device-put a host batch with the leading axis sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> tuple[np.ndarray, int]:
    """Pad the leading axis so it divides the mesh (returns (padded, n_valid))."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad), n
