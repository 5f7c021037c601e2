"""LoRA adapters for parameter-efficient fine-tuning (beyond reference).

The reference's only fine-tuning controls are whole-tower locking (LiT,
params.py --lock-image/--lock-text) and freeze epochs
(freeze_scheduler.py). LoRA (Hu et al. 2021) is the standard
middle ground a fine-tuning user expects: train rank-r factors
ΔW = (α/r)·A@B on the attention/MLP kernels while the released weights
stay frozen — ~0.4% of ViT-L+BERT's parameters at r=8.

TPU-native design: models here are pure functions over param pytrees, so
LoRA needs NO model changes at all — ``apply_lora(base, adapters, scale)``
returns a params pytree with ``kernel + scale·(a@b)`` substituted, and the
unchanged forward consumes it. Under ``value_and_grad`` w.r.t. the adapter
tree only, XLA sees base as a constant input: the backward computes just
the two skinny rank-r contractions per target kernel. The delta matmul
adds r·D·N FLOPs per kernel per step (~0.1% of the forward at r=8) —
negligible, and it keeps the hot path identical to full fine-tuning
(same megakernels, same remat).

Adapter pytree mirrors the base tree: each targeted ``{kernel, bias}``
module is represented as ``{"a": [..., D, r], "b": [..., r, N]}``
(stacked-layer kernels [L, D, N] get [L, D, r]/[L, r, N] — matmul
broadcasts the layer axis), plus a trainable ``logit_scale`` copied from
base (contrastive fine-tuning re-learns the temperature). ``b`` starts
zero, so the merged model at step 0 IS the base model exactly.

The freeze machinery composes transparently: the adapter tree keeps the
base tree's top-level structure ('visual'/'text'/...), so
``optim.freeze_mask`` path matching and the static-freeze compile-time
stop-gradient work on adapters unchanged.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("qkv", "proj", "out", "fc1", "fc2")


def _is_adapter(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"a", "b"}


def init_lora(
    key: jax.Array,
    params: dict,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype: jnp.dtype = jnp.float32,
) -> dict:
    """Adapter pytree for every module named in ``targets`` that carries a
    ``kernel`` leaf. ``a`` ~ N(0, D^-1/2), ``b`` = 0 (merged == base at
    init). Raises if no target matches (a typo'd target list would
    otherwise train nothing, silently)."""
    if rank <= 0:
        raise ValueError(f"rank must be positive, got {rank}")
    targets = tuple(targets)
    n_found = 0

    def rec(node, key):
        nonlocal n_found
        out = {}
        for name, sub in sorted(node.items()):
            if not isinstance(sub, dict):
                continue
            if name in targets and "kernel" in sub and sub["kernel"].ndim >= 2:
                n_found += 1
                k = sub["kernel"]
                key, ka = jax.random.split(key)
                d = k.shape[-2]
                out[name] = {
                    "a": (jax.random.normal(ka, k.shape[:-1] + (rank,))
                          * d ** -0.5).astype(dtype),
                    "b": jnp.zeros(k.shape[:-2] + (rank, k.shape[-1]), dtype),
                }
            else:
                inner = rec(sub, jax.random.fold_in(key, n_found))
                if inner:
                    out[name] = inner
        return out

    adapters = rec(params, key)
    if n_found == 0:
        raise ValueError(
            f"no module named {targets} with a kernel leaf found in params")
    if "logit_scale" in params:
        adapters["logit_scale"] = params["logit_scale"]
    return adapters


def apply_lora(base: dict, adapters: dict, scale: float) -> dict:
    """Merged params: targeted kernels become ``kernel + scale·(a@b)``;
    the adapter tree's ``logit_scale`` (trainable) replaces base's; every
    other leaf is base's, untouched. ``scale`` is α/r."""

    def rec(b, l):
        if _is_adapter(l):
            delta = (l["a"] @ l["b"]) * scale
            return {**b, "kernel": b["kernel"] + delta.astype(b["kernel"].dtype)}
        if isinstance(l, dict):
            return {k: (rec(v, l[k]) if k in l else v) for k, v in b.items()}
        return l  # direct leaf override (logit_scale)

    return rec(base, adapters)


def merge_lora(base: dict, adapters: dict, scale: float) -> dict:
    """Bake the adapters into a standalone param pytree (for export /
    serving / `compat.export.save_pretrained`): same math as
    ``apply_lora``, provided under the name users look for."""
    return apply_lora(base, adapters, scale)


def lora_param_count(adapters: dict) -> tuple[int, int]:
    """(adapter params, of which a/b factors) — for the log line."""
    leaves = jax.tree.leaves(adapters)
    total = sum(int(math.prod(x.shape)) for x in leaves)
    ab = sum(
        int(math.prod(x.shape))
        for path, x in jax.tree_util.tree_flatten_with_path(adapters)[0]
        if getattr(path[-1], "key", None) in ("a", "b")
    )
    return total, ab
