"""Training losses: symmetric InfoNCE (CLIP) and the hierarchical
hard-mining metric loss (HyMetricLoss).

Reference semantics: training/path_open_clip/loss.py —
- ``ClipLoss`` (:82-153): symmetric cross-entropy over image↔text logits,
  with distributed all-gather of features so negatives span the global batch
  (:21-65); ``local_loss`` computes each rank's logits against the gathered
  set, otherwise logits over the full gathered square.
- ``mask_contrastive`` (:67-79): label-masked InfoNCE denominator.
- ``HyMetricLoss`` (:155-357): the batch is N_id caption groups × N_ins
  instances; kron-structured masks pool hard positives/negatives per group
  (four variants; KEEP ships 'lhp-hn'), and Disease-Ontology reachability
  removes ancestor/descendant pairs from the negatives.

TPU-native design: distributed gather is ``jax.lax.all_gather`` under an
axis name (inside ``shard_map``/``pjit``) — no NCCL analog needed. DO-graph
reachability (pure Python BFS over string labels) runs host-side per batch
and enters the loss as a [N_id, N_id] ±1 array; everything else is static
kron masks + exp/matmul, jitted.
"""

from __future__ import annotations

import functools
import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.ops.nn import l2_normalize

Array = jax.Array


# ---------------------------------------------------------------------------
# CLIP InfoNCE
# ---------------------------------------------------------------------------


def _gather(x: Array, axis_name: str) -> Array:
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def clip_loss(
    image_features: Array,
    text_features: Array,
    logit_scale: Array,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    labels: Optional[Array] = None,
) -> Array:
    """Symmetric InfoNCE. Inside a mapped axis (``axis_name``), features are
    all-gathered so negatives span the global batch (grad flows through the
    local shard — the ``gather_with_grad`` semantics)."""
    n_local = image_features.shape[0]
    if axis_name is not None:
        all_img = _gather(image_features, axis_name)
        all_txt = _gather(text_features, axis_name)
        if local_loss:
            rank = jax.lax.axis_index(axis_name)
            logits_i = logit_scale * image_features @ all_txt.T
            logits_t = logit_scale * text_features @ all_img.T
            gt = jnp.arange(n_local) + n_local * rank
        else:
            logits_i = logit_scale * all_img @ all_txt.T
            logits_t = logits_i.T
            gt = jnp.arange(all_img.shape[0])
    else:
        logits_i = logit_scale * image_features @ text_features.T
        logits_t = logits_i.T
        gt = jnp.arange(n_local)

    if labels is not None:
        if axis_name is not None:
            # local labels cannot mask gathered logits (shape mismatch, and
            # other shards' same-label pairs would count as negatives); the
            # reference's mask_contrastive is a local-batch variant too
            raise NotImplementedError(
                "labels= (mask_contrastive) does not compose with "
                "axis_name= (cross-shard negatives)")
        loss = 0.5 * (
            mask_contrastive_loss(logits_i, labels)
            + mask_contrastive_loss(logits_t, labels)
        )
    else:
        ce = lambda lg: -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(lg, axis=-1), gt[:, None], axis=1)
        )
        loss = 0.5 * (ce(logits_i) + ce(logits_t))
    if axis_name is not None:
        # replicate across shards (per-shard means are equal for the global
        # variant; for local_loss this is the DDP-style mean of shard losses)
        loss = jax.lax.pmean(loss, axis_name)
    return loss


def mask_contrastive_loss(logits: Array, labels: Array) -> Array:
    """Label-masked InfoNCE (loss.py:67-79): same-label off-diagonal pairs are
    excluded from the denominator."""
    n = logits.shape[0]
    lab = labels.astype(jnp.int32) + 1
    diff = lab[None, :] - lab[:, None]
    mask = (diff != 0).astype(logits.dtype) + jnp.eye(n, dtype=logits.dtype)
    mask = jnp.where(mask != 0, 1.0, 0.0)
    # row-shifted exp: num/denom is invariant under per-row max subtraction,
    # and the raw exp overflows fp32 once logit_scale·sim exceeds ~88 (the
    # trainer permits scale up to 100)
    shifted = logits - jax.lax.stop_gradient(jnp.max(logits, 1, keepdims=True))
    denom = jnp.sum(jnp.exp(shifted) * mask, axis=1)
    num = jnp.exp(jnp.diag(shifted))
    return -jnp.mean(jnp.log(num / denom))


# ---------------------------------------------------------------------------
# Hierarchical hard-mining metric loss
# ---------------------------------------------------------------------------


class DOGraph:
    """Disease-Ontology parent graph for negative masking
    (loss.py:166-171,293-309). ``nodes[label]['parent']`` = list of parents."""

    def __init__(self, node_parents: dict[str, list[str]]):
        self.parents = node_parents
        # reachability memo: the reference re-runs BFS for every pair every
        # step (O(N_id²) per batch, loss.py:325-331); label vocabularies are
        # small so pairs recur constantly
        self._memo: dict[tuple[str, str], bool] = {}

    @classmethod
    def from_json(cls, path: str) -> "DOGraph":
        with open(path) as f:
            nodes = json.load(f)
        return cls({k: v["parent"] for k, v in nodes.items()})

    def reachable(self, start: str, end: str) -> bool:
        """True iff ``start`` is an ancestor of ``end`` (or equal); BFS up the
        parent links from ``end`` (memoized)."""
        key = (start, end)
        cached = self._memo.get(key)
        if cached is not None:
            return cached
        out = self._reachable(start, end)
        self._memo[key] = out
        return out

    def _reachable(self, start: str, end: str) -> bool:
        if start not in self.parents or end not in self.parents:
            return False
        if start == end:
            return True
        frontier = [end]
        seen = set()
        while frontier:
            nxt = []
            for node in frontier:
                for p in self.parents.get(node, ()):
                    if p == start:
                        return True
                    if p not in seen:
                        seen.add(p)
                        nxt.append(p)
            frontier = nxt
        return False

    def node_connection(self, labels: Sequence[str]) -> np.ndarray:
        """[N_id, N_id] of ±1: −1 where two group labels are DO ancestor/
        descendant related (excluded from negatives), +1 elsewhere/diag."""
        n = len(labels)
        out = np.ones((n, n), np.float32)
        for i in range(n):
            for j in range(n):
                if i != j and (
                    self.reachable(labels[i], labels[j])
                    or self.reachable(labels[j], labels[i])
                ):
                    out[i, j] = -1.0
        return out

    def unknown_connection(self, labels: Sequence[str]) -> np.ndarray:
        """[N_id, N_id] mask for the extra-negative block: −1 off-diagonal,
        −1 on the diagonal for 'unknown' labels (loss.py:337-346)."""
        n = len(labels)
        out = -np.ones((n, n), np.float32)
        for i in range(n):
            if labels[i] != "unknown":
                out[i, i] = 1.0
        return out


@functools.lru_cache(maxsize=8)
def _kron_masks_np(n_id: int, n_ins: int):
    eye = np.eye(n_id, dtype=np.float32)
    right = np.kron(eye, np.ones((n_ins, 1), np.float32))  # [n, N_id]
    left = right.T  # [N_id, n]
    within = np.kron(eye, np.ones((n_ins, n_ins), np.float32))  # 1 in-group
    sign = np.where(within > 0, -1.0, 1.0).astype(np.float32)  # -1 in-group
    return right, left, within, sign, eye


def _kron_masks(n_id: int, n_ins: int):
    # numpy cached; jnp conversion must happen per trace (device constants
    # cached across jits would leak tracers)
    return tuple(jnp.asarray(m) for m in _kron_masks_np(n_id, n_ins))


def _metric_loss(
    sim: Array, scale: Array, n_id: int, n_ins: int, loss_type: str
) -> Array:
    """One direction of the metric loss (loss.py:173-291). ``sim`` is
    [n, n] or [n, n + n_extra] with extra negative columns."""
    n = n_id * n_ins
    rows, cols = sim.shape
    right, left, within, sign, pos_id = _kron_masks(n_id, n_ins)

    sf = sim * scale
    sf_qq = sf[:, :n]
    # overflow guard: the trainer permits logit_scale up to 100 while fp32
    # exp overflows at ~88.7, so a cross-group pair at sim > ~0.887 would
    # inf → NaN the whole loss. A shift is NOT loss-invariant here (positive
    # terms enter via reciprocals), so clamp the exponent instead — exact
    # below the clamp, saturated (finite) above it. mask_contrastive_loss
    # guards the same failure via its row shift.
    e = jnp.exp(jnp.minimum(sf_qq * sign, 85.0))  # exp(-s) in-grp, exp(+s) x-grp

    group_sums = e @ right  # [n, N_id]: per row, sum over each group's members
    pos_mask = right  # [n, N_id] 1 at own-group column per row-block

    def l1_log_diag(mat: Array) -> Array:
        l1 = mat / jnp.sum(jnp.abs(mat), axis=1, keepdims=True)
        return -jnp.mean(jnp.log(jnp.diagonal(l1)[: mat.shape[0]]))

    if loss_type == "hp-hn":
        # hard-pos & hard-neg: pool to [N_id, N_id], invert the diagonal
        gg = left @ group_sums
        inv_diag = 1.0 / jnp.where(gg == 0, 1.0, gg)
        gg = gg * (1 - pos_id) + inv_diag * pos_id
        return l1_log_diag(gg)

    if loss_type == "lhp-hn":
        # lenient-hard-pos: invert positives per INSTANCE before group pooling
        inv_pos = 1.0 / jnp.where(group_sums * pos_mask == 0, 1.0, group_sums)
        staged = group_sums * (1 - pos_mask) + inv_pos * pos_mask
        gg = left @ staged
        if cols != rows:
            # extra negative text block (same N_id×N_ins group structure):
            # per group i, total exp-mass of its own extra-column block
            # (loss.py:239-246)
            extra = jnp.exp(jnp.minimum(sf[:, n:] * within, 85.0))
            add_diag = jnp.diagonal(left @ extra @ right)
            gg = jnp.concatenate([gg, add_diag[:, None]], axis=1)
        return l1_log_diag(gg)

    if loss_type == "hp-lhn":
        # lenient-hard-neg: invert negatives per instance, pool, re-invert
        inv_neg = 1.0 / jnp.where(group_sums * (1 - pos_mask) == 0, 1.0, group_sums)
        staged = inv_neg * (1 - pos_mask) + group_sums * pos_mask
        # same exp-underflow guard as the sibling variants: on TPU
        # (flush-to-zero) fully-underflowed positive columns would pool to 0
        # and 1/0 → inf; the other three variants guard their reciprocals
        pooled = left @ staged
        gg = 1.0 / jnp.where(pooled == 0, 1.0, pooled)
        return l1_log_diag(gg)

    if loss_type == "lhp-lhn":
        # same exp-underflow guard as the other three variants: a zeroed
        # group column would otherwise produce inf → NaN
        inv_all = 1.0 / jnp.where(group_sums == 0, 1.0, group_sums)
        gg = left @ inv_all
        gg = (1.0 / gg) * (1 - pos_id) + gg * pos_id
        return l1_log_diag(gg)

    raise ValueError(f"unknown loss_type {loss_type}")


def hy_metric_loss(
    image_features: Array,
    text_features: Array,
    node_connection: Array,
    logit_scale: Array,
    *,
    caption_num: int,
    loss_type: str = "lhp-hn",
    unknown_connection: Optional[Array] = None,
) -> Array:
    """Full HyMetricLoss (loss.py:311-357): mask DO-related pairs to sim −1,
    then symmetric i→t + t→i metric loss halves.

    ``node_connection``: [N_id, N_id] ±1 from ``DOGraph.node_connection`` of
    the batch's unique group labels (host-side). ``unknown_connection``
    masks extra text columns when text_features has more rows than images.
    """
    img = l2_normalize(image_features.astype(jnp.float32))
    txt = l2_normalize(text_features.astype(jnp.float32))
    n = img.shape[0]
    n_id = caption_num
    n_ins = n // caption_num

    sim = img @ txt.T  # [n, n_txt]
    ones = jnp.ones((n_ins, n_ins), jnp.float32)
    node_mask = jnp.kron(node_connection.astype(jnp.float32), ones)
    if txt.shape[0] != n:
        if unknown_connection is None:
            raise ValueError("extra text columns require unknown_connection")
        node_mask = jnp.concatenate(
            [node_mask, jnp.kron(unknown_connection.astype(jnp.float32), ones)],
            axis=1,
        )
    sim = jnp.where(node_mask == -1, -1.0, sim)

    it = _metric_loss(sim, logit_scale, n_id, n_ins, loss_type) / 2
    ti = _metric_loss(sim[:n, :n].T, logit_scale, n_id, n_ins, loss_type) / 2
    return it + ti
