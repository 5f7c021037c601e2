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

Device ordering: multi-axis meshes go through
``jax.experimental.mesh_utils.create_device_mesh`` so the minor axis maps
onto physically adjacent chips — collectives on the inner (tp/ep) axis
then ride short ICI rings instead of whatever order ``jax.devices()``
returns. Multi-slice pods (DCN between slices) use ``make_hybrid_mesh``,
which keeps slice-crossing traffic on the designated outer axes only.
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
    devices = devices[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if len([s for s in shape if s > 1]) > 1:
        # topology-aware ordering matters once >1 axis is real
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(
                tuple(shape), devices=devices), tuple(axes))
        except Exception:
            pass  # virtual/CPU platforms without topology info
    return Mesh(np.array(devices).reshape(shape), tuple(axes))


def make_hybrid_mesh(
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int],
    axes: Sequence[str],
) -> Mesh:
    """Multi-slice mesh: ``dcn_shape`` counts slices per axis (axes with
    >1 cross the data-center network), ``ici_shape`` the per-slice chip
    layout. Axis i spans ``dcn_shape[i] * ici_shape[i]`` devices.

    The standard recipe (scaling-book): keep 'dp' as the only
    slice-crossing axis — gradient all-reduces tolerate DCN latency —
    and pin tp/ep/pp axes inside a slice::

        mesh = make_hybrid_mesh((n_per_slice, tp), (n_slices, 1),
                                axes=("dp", "mp"))

    Falls back to a plain reshape when slice topology is unavailable
    (CPU/virtual meshes: devices are grouped by ``process_index`` so the
    outer axes still align with process boundaries).
    """
    if len(ici_shape) != len(dcn_shape) or len(ici_shape) != len(axes):
        raise ValueError(
            f"ici_shape {tuple(ici_shape)} / dcn_shape {tuple(dcn_shape)} "
            f"/ axes {tuple(axes)} must have equal rank")
    devices = jax.devices()
    # real multi-slice hardware carries slice topology on each device —
    # there the hybrid construction is mandatory and its errors must
    # PROPAGATE (a silent reshape would route inner-axis collectives over
    # DCN, the exact failure this function exists to prevent). Virtual/CPU
    # devices have no slice info: group by process instead.
    if getattr(devices[0], "slice_index", None) is not None:
        from jax.experimental import mesh_utils

        return Mesh(
            mesh_utils.create_hybrid_device_mesh(
                tuple(ici_shape), tuple(dcn_shape), devices=devices),
            tuple(axes))
    shape = tuple(d * i for d, i in zip(dcn_shape, ici_shape))
    n = int(np.prod(shape))
    ordered = sorted(devices,
                     key=lambda d: (getattr(d, "process_index", 0), d.id))
    return Mesh(np.array(ordered[:n]).reshape(shape), tuple(axes))


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
