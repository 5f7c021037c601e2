"""Sequence parallelism (Megatron-SP) as GSPMD sharding constraints.

During tensor-parallel training the residual stream's LayerNorm and
elementwise regions don't need the full sequence on every 'mp' device —
only the attention/matmul regions do. Constraining the [B, S, D] stream
to ``P('dp', 'mp', None)`` at block boundaries makes XLA's SPMD
partitioner run those regions sequence-sharded and insert exactly
Megatron-SP's collectives (all-gather over S before qkv, reduce-scatter
after proj) without hand-writing either collective — the GSPMD analog of
Korthikanti et al. 2022, "Reducing Activation Recomputation in Large
Transformer Models". The math is unchanged (a sharding constraint is an
identity), so the training trajectory equals replicated DP (tested in
``tests/test_train_main.py::test_train_tp_sp_equivalence``).

The reference is single-GPU torch with no activation-sharding analog
(SURVEY §2.3); this axis exists so presets larger than ViT-L drop into
the same trainer with activation memory split over 'mp' too.
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def seq_sharding(mesh: Mesh, dp_axis: str = "dp", sp_axis: str = "mp"):
    """NamedSharding for the [B, S, D] residual stream: batch over
    ``dp_axis``, sequence over ``sp_axis`` (the tensor-parallel axis —
    Megatron-SP reuses the tp group for sequence sharding), features
    replicated."""
    return NamedSharding(mesh, P(dp_axis, sp_axis, None))
