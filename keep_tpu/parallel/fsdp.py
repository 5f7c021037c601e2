"""FSDP-style parameter sharding (ZeRO-3 analog) — opt-in memory scaling
for training state.

The reference replicates full model+optimizer state on every rank (plain
DDP, main.py:264-271). On TPU the same mesh axis that shards the batch can
also shard the parameters: each leaf is laid out with its largest
``n_dev``-divisible axis partitioned over 'dp', and XLA's SPMD partitioner
inserts the all-gathers (params at use) and reduce-scatters (grads) that
hand-written FSDP wrappers do manually. Small leaves (LayerNorm scales,
biases below ``min_size`` elements) stay replicated — sharding them would
trade negligible memory for extra collectives.

Adam state follows automatically: the optimizer moments are pytrees of the
same leaf shapes, so the same spec function applies (``place_state``).

Works unchanged under ``jit`` + donation: committed input shardings
propagate through the step, so parameters STAY sharded across steps —
per-device state memory drops by ~n_dev for the large matrices.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def fsdp_spec(shape, n_dev: int, min_size: int = 1 << 16, *,
              base=None, axis: str = "dp") -> P:
    """PartitionSpec sharding the LARGEST still-free ``n_dev``-divisible
    axis over ``axis``; unchanged ``base`` (or P()) when the leaf is small
    or no axis divides. ``base`` is an existing spec (e.g. the Megatron tp
    layout — ``tp.tp_fsdp_shardings``) whose already-sharded axes are
    excluded and preserved in the result."""
    spec = ([None] * len(shape) if base is None
            else list(base) + [None] * (len(shape) - len(base)))
    if math.prod(shape) >= min_size:
        cands = [(s, i) for i, s in enumerate(shape)
                 if spec[i] is None and s % n_dev == 0]
        if cands:
            _, ax = max(cands)
            spec[ax] = axis
    return P(*spec) if any(s is not None for s in spec) else P()


def state_shardings(tree, mesh: Mesh, min_size: int = 1 << 16):
    """Pytree of NamedShardings matching ``tree``'s leaf shapes."""
    n_dev = mesh.shape["dp"]

    def one(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, fsdp_spec(shape, n_dev, min_size))

    return jax.tree.map(one, tree)


def place_state(tree, mesh: Mesh, min_size: int = 1 << 16):
    """device_put every leaf with its FSDP sharding (scalars/small leaves
    replicate)."""
    shardings = state_shardings(tree, mesh, min_size)
    return jax.tree.map(jax.device_put, tree, shardings)


def sharded_fraction(tree, mesh: Mesh, min_size: int = 1 << 16) -> float:
    """Fraction of parameters (by element count) that actually shard —
    observability for logs/tests."""
    n_dev = mesh.shape["dp"]
    total = sharded = 0

    for leaf in jax.tree.leaves(tree):
        n = math.prod(np.shape(leaf)) or 1
        total += n
        if fsdp_spec(np.shape(leaf), n_dev, min_size) != P():
            sharded += n
    return sharded / max(total, 1)
