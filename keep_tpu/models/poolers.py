"""Text-feature pooler registry (reference hf_model.py:45-94).

Poolers map (last_hidden_state [B,S,D], attention_mask [B,S],
pooler_output [B,D]|None) → [B,D]. Note: the reference's MaxPooler fills
VALID positions with −inf (``masked_fill(attention_mask, -inf)`` — inverted
mask, SURVEY §2.2-class defect); this implements the intended semantics.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_POOLERS: dict[str, Callable] = {}


def register_pooler(name: str):
    def wrap(fn):
        _POOLERS[name] = fn
        return fn

    return wrap


def get_pooler(name: str) -> Callable:
    if name not in _POOLERS:
        raise KeyError(f"unknown pooler {name!r}; have {sorted(_POOLERS)}")
    return _POOLERS[name]


@register_pooler("mean_pooler")
def mean_pooler(hidden: Array, mask: Array, pooler_output=None) -> Array:
    m = mask.astype(hidden.dtype)[..., None]
    return (hidden * m).sum(axis=1) / m.sum(axis=1)


@register_pooler("max_pooler")
def max_pooler(hidden: Array, mask: Array, pooler_output=None) -> Array:
    neg = jnp.asarray(-jnp.inf, hidden.dtype)
    masked = jnp.where(mask[..., None].astype(bool), hidden, neg)
    return masked.max(axis=1)


@register_pooler("cls_pooler")
def cls_pooler(hidden: Array, mask: Array, pooler_output: Optional[Array] = None) -> Array:
    if pooler_output is not None:
        return pooler_output
    return hidden[:, 0]


@register_pooler("cls_last_hidden_state_pooler")
def cls_last_hidden_state_pooler(hidden: Array, mask: Array, pooler_output=None) -> Array:
    return hidden[:, 0]
