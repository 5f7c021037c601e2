"""Optimizer construction: AdamW with the reference's weight-decay exemptions
and freeze-phase masking.

Reference (training/path_training/main.py:283-298): parameters with ndim < 2,
or named *bn*/*ln*/*bias*/logit_scale, get no weight decay. Freezing
(freeze_scheduler.py) is realized here as a gradient mask (optax.masked over
set_to_zero) — the TPU-native equivalent of requires_grad=False.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def wd_mask(params) -> "jax.tree_util.PyTreeDef":
    """True where weight decay applies: ndim >= 2 and not an embedding-norm
    style param. With our pytree layout, stacked per-layer kernels are 3-D
    and plain kernels 2-D; biases/scales/gains are 1-2D-per-layer — decide by
    trailing structure: decay only 'kernel' leaves and embedding tables."""

    def decide(path, leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "logit_scale" in keys:
            return False
        leafname = keys[-1] if keys else None
        if leafname in ("kernel", "word", "position", "token_type"):
            return True
        if leafname in ("bias", "scale", "cls_token", "pos_embed", "ls1", "ls2"):
            return False
        # default: decay matrices, not vectors (reference ndim<2 rule; +1 for
        # the stacked-layer axis)
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def bn_stats_mask(params):
    """True for BatchNorm running-stat leaves ('mean'/'var' — the RN/Swin
    ConvStem trunks, models/resnet.py, models/swin.py). Torch keeps these as
    BUFFERS: never gradient-updated, and under the reference's LiT locking
    they stay frozen outright (freeze_batch_norm_2d,
    training/path_open_clip/utils.py:5-30, timm_model.py:117-131). Our BN
    layers always normalize with the stored stats (inference-mode/Frozen
    semantics), so the optimizer must never touch them — without this mask
    AdamW would happily follow their gradients."""

    def decide(path, leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        return bool(keys) and keys[-1] in ("mean", "var")

    return jax.tree_util.tree_map_with_path(decide, params)


def adamw(
    learning_rate: Callable | float,
    weight_decay: float = 0.2,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
    grad_clip_norm: Optional[float] = None,
    params=None,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW with decoupled decay masked to kernels only (reference AdamW
    param-group split, main.py:283-298) + optional global-norm clipping
    (train_hierarchy.py:167-184).

    ``mu_dtype='bfloat16'`` stores the FIRST moment in bf16 (halves its HBM
    share; the second moment stays fp32 — its sqrt feeds the update scale
    and bf16's 8 mantissa bits would cost real precision there). A memory
    knob for single-chip training, off by default for exact reference
    numerics.
    """
    txs = []
    # BN running stats are buffers, not parameters (see bn_stats_mask):
    # zero their gradients FIRST — before clipping and the Adam moments —
    # so fine-tuning a BN trunk keeps the reference's frozen-stats
    # semantics. Torch buffers carry no grad at all, so they must not
    # inflate the global clip norm either (zeroing only the final update
    # would leave every other parameter's clipped update too small).
    txs.append(optax.masked(optax.set_to_zero(), bn_stats_mask))
    if grad_clip_norm is not None:
        txs.append(optax.clip_by_global_norm(grad_clip_norm))
    txs.append(
        optax.adamw(
            learning_rate=learning_rate,
            b1=b1,
            b2=b2,
            eps=eps,
            weight_decay=weight_decay,
            mu_dtype=mu_dtype,
            mask=wd_mask if params is None else wd_mask(params),
        )
    )
    return optax.chain(*txs)


def freeze_mask(params, frozen_fn: Callable):
    """Pytree of 0/1 scalars over ``params``: 1.0 where ``frozen_fn(path)``
    says the leaf is frozen. Passed as a DYNAMIC input to the train step
    (grads and updates are multiplied by ``1 - mask``), so one jitted step +
    one optimizer state serve every freeze phase — Adam moments and the LR
    schedule count stay continuous across phase changes, unlike re-initializing
    a ``multi_transform`` per phase (the reference drives one continuous
    global-step scheduler, training/path_training/main.py:339-357)."""
    import jax.numpy as jnp

    def decide(path, leaf):
        keys = tuple(str(getattr(p, "key", getattr(p, "idx", ""))) for p in path)
        return jnp.asarray(1.0 if frozen_fn(keys) else 0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(decide, params)


def freeze_wrapper(
    tx: optax.GradientTransformation, frozen_fn: Callable
) -> optax.GradientTransformation:
    """Zero updates for leaves where ``frozen_fn(path_keys) -> True``.

    The mask is evaluated per leaf path (e.g. ('visual', 'blocks', ...)); use
    with ``keep_tpu.train.freeze.FreezeSchedule`` for epoch-dependent phases.
    """

    def mask_params(params):
        def decide(path, leaf):
            keys = tuple(
                str(getattr(p, "key", getattr(p, "idx", ""))) for p in path
            )
            return "frozen" if frozen_fn(keys) else "open"

        return jax.tree_util.tree_map_with_path(decide, params)

    return optax.multi_transform(
        {"open": tx, "frozen": optax.set_to_zero()}, mask_params
    )
