"""Tensor-parallel parameter shardings for the transformer towers — the
'mp' mesh axis SURVEY §2.4 reserves ("leave room via mesh axis"; the
reference has no TP at all).

Megatron-style layout expressed purely as NamedShardings — XLA's SPMD
partitioner derives the math: qkv/fc1 kernels split on the OUTPUT features
(column parallel; each shard computes its heads / its slice of the hidden),
proj/fc2 on the INPUT features (row parallel; the residual add becomes the
all-reduce). Biases of column-parallel layers split too; row-parallel
biases and everything else (LN, embeddings, patchify) replicate on 'mp'.

Stacked-layer pytrees (the ``blocks`` dicts are [L, ...] arrays) shard on
the feature axes AFTER the leading layer axis — handled by matching on the
trailing dimensions.

Compose with data parallelism over a 2-D mesh ``Mesh(devices, ('dp','mp'))``:
batches shard on 'dp' (``mesh_batch_sharding``), params on 'mp' via
:func:`tp_shardings`, optionally ALSO on 'dp' via ``parallel.fsdp``.

Known layout caveat (correctness unaffected — trajectory == replicated DP,
tested): the towers use a FUSED qkv kernel [D, 3D], so an 'mp' split of
the 3D output axis crosses the q|k|v boundary for mp ∤ 3 — the subsequent
``reshape(b, s, 3, h, dh)`` cannot stay sharded and GSPMD re-gathers the
qkv slab each layer instead of computing attention shard-locally. A fully
local Megatron attention needs the kernel laid out [D, 3, H, dh] and
sharded on H (or unfused q/k/v) — a converter + model change deferred
until a tower actually needs TP for capacity (ViT-L does not).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaf-name → which feature axis splits: 'col' = last axis (output),
# 'row' = second-to-last (input). Keys match both vit and bert pytrees.
_COL = {"qkv", "fc1"}
_ROW = {"proj", "out", "fc2"}


def _spec_for(path: tuple, shape: tuple, n_dev: int, axis: str) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    owner = parent if leaf in ("kernel", "bias", "kernel_q", "scale") else leaf
    nd = len(shape)
    if owner in _COL:
        ax = nd - 1  # kernels [.., in, out] and biases [.., out]: both last
        if shape[ax] % n_dev == 0:
            return P(*([None] * ax), axis)
    elif owner in _ROW and leaf in ("kernel", "kernel_q") and nd >= 2:
        ax = nd - 2  # input axis of row-parallel kernels
        if shape[ax] % n_dev == 0:
            return P(*([None] * ax), axis, None)
    return P()


def tp_shardings(params, mesh: Mesh, axis: str = "mp"):
    """Pytree of NamedShardings implementing the Megatron layout over
    ``axis``; leaves that don't match (LN, embeddings, heads) replicate."""
    n_dev = mesh.shape[axis]

    def one(path, leaf):
        return NamedSharding(mesh, _spec_for(path, np.shape(leaf), n_dev, axis))

    return jax.tree_util.tree_map_with_path(one, params)


def place_tp(params, mesh: Mesh, axis: str = "mp"):
    """device_put the params with their tensor-parallel shardings."""
    return jax.tree.map(jax.device_put, params, tp_shardings(params, mesh, axis))


def tp_fsdp_shardings(
    params,
    mesh: Mesh,
    axis: str = "mp",
    dp_axis: str = "dp",
    min_size: int = 1 << 16,
):
    """Megatron-LM-style 2-D sharding: the tensor-parallel layout over
    ``axis`` composed with FSDP over ``dp_axis`` — each large leaf
    additionally shards its largest still-unsharded ``dp``-divisible axis
    (``fsdp.fsdp_spec`` with the tp layout as ``base``), so per-device
    state memory drops by ~dp·mp on the big matrices while the math stays
    the tp math (XLA re-gathers the dp shards at use, the same collectives
    plain FSDP pays)."""
    from keep_tpu.parallel.fsdp import fsdp_spec

    n_mp = mesh.shape[axis]
    n_dp = mesh.shape[dp_axis]

    def one(path, leaf):
        shape = np.shape(leaf)
        tp_spec = _spec_for(path, shape, n_mp, axis)
        return NamedSharding(mesh, fsdp_spec(
            shape, n_dp, min_size, base=tuple(tp_spec), axis=dp_axis))

    return jax.tree_util.tree_map_with_path(one, params)


def place_tp_fsdp(params, mesh: Mesh, axis: str = "mp", dp_axis: str = "dp",
                  min_size: int = 1 << 16):
    """device_put with the composed tp x fsdp shardings."""
    return jax.tree.map(
        jax.device_put, params,
        tp_fsdp_shardings(params, mesh, axis, dp_axis, min_size))


def tp_fraction(params, mesh: Mesh, axis: str = "mp") -> float:
    """Fraction of parameter elements that actually split over ``axis``."""
    import math

    n_dev = mesh.shape[axis]
    total = split = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        n = math.prod(np.shape(leaf)) or 1
        total += n
        if _spec_for(path, np.shape(leaf), n_dev, axis) != P():
            split += n
    return split / max(total, 1)
