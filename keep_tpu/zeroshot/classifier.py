"""Zero-shot classifier construction + prompt-ensemble screening, TPU-first.

Reference semantics (WSI_evaluation/utils.py:64-146):
- per prompt dict ``{classnames: {label: name}, templates: str|[str]}``:
  encode each class's template texts, L2-normalize, mean over templates,
  renormalize, stack → [D, n_classes] classifier.
- prompt screening: per classifier, logits over all N tiles; score =
  mean((max − 2nd-max) − |max + 2nd-max − 1|); take top-n classifiers by
  score, sum their matrices, L2-normalize columns → ensemble classifier.

TPU-first rebuild: the reference runs 1386–1782 *sequential* text-encoder
calls and a per-classifier Python loop over logits. Here ALL prompt texts are
encoded in a few fixed-shape batched forwards, classifier assembly is one
segment-mean, and screening is one ``[P,N,C]`` einsum + vectorized top-k —
no per-prompt host round-trips.

``first_template_only=True`` reproduces the reference's ``encode_text(...)[0]``
quirk (utils.py:74: only the first template's embedding survives; identical
for the shipped single-template prompts, wrong for multi-template — see
SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.ops.nn import l2_normalize

Array = jax.Array


def expand_prompt(
    prompt: Mapping, label_map: Mapping[str, int], add_normal: bool = False
) -> list[list[str]]:
    """One prompt dict → per-class template texts, class order = label index
    (reference get_zeroshot_classifier, utils.py:86-104)."""
    classnames = prompt["classnames"]
    templates = prompt["templates"]
    idx_to_class = {v: k for k, v in label_map.items()}
    if len(idx_to_class) != len(label_map):
        # duplicate indices: dict inversion would silently drop classes and
        # misalign every downstream argmax label
        raise ValueError(f"label_map indices must be unique; got {label_map}")
    if sorted(idx_to_class) != list(range(len(idx_to_class))):
        raise ValueError(
            f"label_map indices must be contiguous from 0; got {label_map}"
        )
    if add_normal:
        idx_to_class[len(idx_to_class)] = "Normal"
    if isinstance(templates, str):
        templates = [templates]
    texts = []
    for idx in range(len(idx_to_class)):
        name = classnames[idx_to_class[idx]]
        texts.append([t.replace("CLASSNAME", name) for t in templates])
    return texts


def build_classifier(
    class_embeddings: Sequence[Array],
    first_template_only: bool = False,
) -> Array:
    """Per-class [T, D] unit-ish embeddings → [D, C] classifier
    (normalize → template mean → renormalize → stack; utils.py:76-83)."""
    cols = []
    for emb in class_embeddings:
        emb = jnp.atleast_2d(emb)
        if first_template_only:
            emb = emb[:1]
        emb = l2_normalize(emb.astype(jnp.float32))
        col = emb.mean(axis=0)
        cols.append(col / jnp.linalg.norm(col))
    return jnp.stack(cols, axis=1)


# Per-token text-tower throughput for the "auto" plan chooser's cost model
# (seconds per token-position at the serving batch size; calibrated from
# docs/PERF.md: int8 BERT-base 512x256 tokens in ~114 ms on one v5e). Only
# RELATIVE accuracy matters — the decision boundary is measured per-dispatch
# overhead vs padded-token compute savings.
SEC_PER_TOKEN = {"tpu": 1.0e-6, "cpu": 4.0e-4}
FEATURE_DIM_GUESS = 768  # fetch-size estimate for the cost model (KEEP D)


def plan_length_buckets(
    lengths: np.ndarray,
    full: int,
    batch_size: int,
    buckets: Sequence[int] = (32, 64, 128, 256),
    *,
    rtt_s: float | None = None,
    sec_per_token: float | None = None,
) -> tuple[tuple[int, ...] | None, dict]:
    """Pick bucketed vs flat encoding BY MEASUREMENT, not by faith.

    Bucketing saves padded-token compute but pays one dispatch (+ feature
    fetch) per extra batch; on a jittery relay the per-dispatch floor can
    exceed the compute saved (round 4 measured the bucketed path LOSING
    0.82× on a 28 ms-floor day after winning 1.69× on a 5 ms day —
    BENCH_r03/r04, docs/PERF.md). Cost model per dispatch:
    ``fixed + batch_size·width·sec_per_token`` where ``fixed`` = measured
    null-dispatch RTT (utils.rtt) + feature-download time at the measured
    tunnel bandwidth. Returns ``(bucket_tuple | None, info)`` — ``None``
    means flat wins. Compile cost is out of scope (both plans amortize it
    across runs via the persistent compile cache).
    """
    lengths = np.asarray(lengths)
    n = int(lengths.size)
    if sec_per_token is None:
        import jax

        backend = jax.default_backend()
        sec_per_token = SEC_PER_TOKEN.get(backend, SEC_PER_TOKEN["cpu"])
    if rtt_s is None:
        from keep_tpu.utils import rtt as _rtt

        meas = _rtt.measure_rtt()
        bw = _rtt.measure_bandwidth()
        fetch_mb = batch_size * FEATURE_DIM_GUESS * 4 / 2**20
        rtt_s = meas["median_ms"] / 1e3 + fetch_mb / bw["download_mb_per_s"]
    bks = sorted({min(int(b), full) for b in buckets if b > 0})
    if not bks or bks[-1] < full:
        bks.append(full)

    def batches(rows: int) -> int:
        return -(-rows // batch_size)

    est_flat = batches(n) * (rtt_s + batch_size * full * sec_per_token)
    est_bucketed, prev = 0.0, -1
    for b in bks:
        rows = int(((lengths > prev) & (lengths <= b)).sum())
        prev = b
        est_bucketed += batches(rows) * (rtt_s + batch_size * b * sec_per_token)
    choice = tuple(bks) if est_bucketed < est_flat else None
    return choice, {
        "est_bucketed_s": est_bucketed,
        "est_flat_s": est_flat,
        "per_dispatch_fixed_s": rtt_s,
        "sec_per_token": sec_per_token,
    }


# The measured probe's decision margin: ship bucketed only when its measured
# per-dispatch estimate beats flat by >15% — the probe's blocking timings
# slightly overstate pipelined totals for the overhead-heavy path, so ties
# and near-ties go to flat (the reference behavior). Distinct from
# utils.rtt.PROBE_MARGIN (the B=1 serving-precision rule's 1.10): the two
# policies tolerate different noise, so the constants are named apart.
BUCKET_PROBE_MARGIN = 1.15
# Below this many flat batches the probe's extra dispatches rival the job
# itself; ship flat unless bucketing adds no dispatches (the dominated case).
PROBE_MIN_FLAT_BATCHES = 3


def _width_rows(lengths: np.ndarray, bks: Sequence[int]) -> list:
    """Row indices per bucket width (ascending widths, empty widths dropped).
    The first bucket also takes length-0 rows (all-pad masks)."""
    prev, out = -1, []
    for j, b in enumerate(bks):
        lo = -1 if j == 0 else prev
        rows = np.flatnonzero((lengths > lo) & (lengths <= b))
        prev = b
        if rows.size:
            out.append((int(b), rows))
    return out


def _pad_chunk(ids, mask, chunk, width, batch_size):
    bid = ids[chunk][:, :width]
    bmask = mask[chunk][:, :width]
    if bid.shape[0] < batch_size:  # pad tail: one compiled shape per width
        pad = batch_size - bid.shape[0]
        bid = np.pad(bid, ((0, pad), (0, 0)))
        bmask = np.pad(bmask, ((0, pad), (0, 0)))
    return bid, bmask


def choose_bucket_plan(
    encode_fn: Callable[[np.ndarray, np.ndarray], Array],
    ids: np.ndarray,
    mask: np.ndarray,
    *,
    batch_size: int = 256,
    buckets: Sequence[int] = (32, 64, 128, 256),
    collect: list | None = None,
) -> tuple[tuple[int, ...] | None, dict]:
    """Bucketed-vs-flat, decided by a probe that MEASURES the real tower.

    Round 4/5 on-chip data killed the purely analytic model: with only ONE
    extra dispatch (7 bucketed vs 6 flat at the reference corpus) bucketing
    lost 0.92× on a 26 ms-RTT day — the real per-dispatch cost through the
    relay (~117 ms) is far above the null-RTT + feature-download estimate
    (~66 ms), for reasons the host can't see (BENCH_r04/r05, docs/PERF.md).
    So the chooser trusts measurements, in three tiers:

    1. analytic :func:`plan_length_buckets` says flat → flat (its failure
       mode was only ever over-favoring bucketed);
    2. bucketing adds NO dispatches (every bucket packs into the flat batch
       count) → bucketed without probing: same dispatch count at strictly
       smaller widths cannot lose;
    3. otherwise probe: two blocking dispatches per used width, both timed
       (min-of-2 — a compile inflates the first sample and a jitter spike
       either, so min is the robust per-dispatch estimate) **on real corpus
       rows** — the outputs are valid features (padding-invariance is the
       bucketing premise, parity-tested) and are handed back via ``collect``
       for reuse, so the probe wastes at most ~2 dispatches of suboptimal
       width. Bucketed ships only when its measured total beats flat by
       :data:`BUCKET_PROBE_MARGIN`.

    Returns ``(bucket_tuple | None, info)``; ``info["method"]`` names the
    tier and the probe tier carries the per-width timings and estimates.
    ``collect``, when given, receives ``(features, row_indices)`` pairs.
    """
    import time

    ids = np.asarray(ids)
    mask = np.asarray(mask)
    lengths = mask.sum(axis=1)
    n, full = ids.shape
    plan, info = plan_length_buckets(lengths, full, batch_size, buckets)
    if plan is None:
        return None, {"method": "analytic_flat", **info}

    wr = _width_rows(lengths, plan)
    flat_batches = -(-n // batch_size)
    per_width_batches = {w: -(-rows.size // batch_size) for w, rows in wr}
    bucket_batches = sum(per_width_batches.values())
    if bucket_batches <= flat_batches:
        return plan, {"method": "dominated", "flat_batches": flat_batches,
                      "bucket_batches": bucket_batches, **info}
    if flat_batches < PROBE_MIN_FLAT_BATCHES:
        # the probe's extra dispatches would rival the job itself. On a
        # relay link ship flat (the observed failure mode was bucketed
        # losing there); co-located, dispatches are sub-ms and the analytic
        # plan was never wrong — keep its bucketed choice
        from keep_tpu.utils.rtt import rtt_dominated

        small_choice = None if rtt_dominated() else plan
        return small_choice, {
            "method": "small_job_" + ("flat" if small_choice is None
                                      else "bucketed"),
            "flat_batches": flat_batches,
            "bucket_batches": bucket_batches, **info}

    def probe(width, rows):
        # two blocking dispatches on real rows, min-of-2 as the estimate:
        # a cold compile inflates only the first sample, a jitter spike
        # either — min discards both. Outputs are valid features → collect
        chunks = [rows[i: i + batch_size]
                  for i in range(0, rows.size, batch_size)][:2]
        seen = set()
        ts = []
        for chunk in chunks if len(chunks) > 1 else chunks * 2:
            bid, bmask = _pad_chunk(ids, mask, chunk, width, batch_size)
            t0 = time.time()
            feats = np.asarray(encode_fn(bid, bmask))
            ts.append(time.time() - t0)
            key = int(chunk[0])
            if collect is not None and key not in seen:
                collect.append((feats[: chunk.size], chunk))
                seen.add(key)
        return min(ts)

    t_w = {w: probe(w, rows) for w, rows in wr}
    # full-width sample from the END of the corpus: rows that must be
    # encoded anyway, and (being bucket rows too) they shrink the bucketed
    # remainder instead of duplicating the probe's own work
    t_full = probe(full, np.arange(n)[-min(2 * batch_size, n):])
    est_flat = flat_batches * t_full
    est_bucketed = sum(per_width_batches[w] * t_w[w] for w in t_w)
    choice = plan if est_bucketed * BUCKET_PROBE_MARGIN < est_flat else None
    return choice, {
        "method": "probe",
        "flat_batches": flat_batches,
        "bucket_batches": bucket_batches,
        "probe_ms_per_width": {w: round(t * 1e3, 2) for w, t in t_w.items()},
        "probe_ms_full": round(t_full * 1e3, 2),
        "est_flat_s": round(est_flat, 4),
        "est_bucketed_s": round(est_bucketed, 4),
        "margin": BUCKET_PROBE_MARGIN,
        "analytic": info,
    }


def encode_texts_bucketed(
    encode_fn: Callable[[np.ndarray, np.ndarray], Array],
    ids: np.ndarray,
    mask: np.ndarray,
    *,
    batch_size: int = 256,
    length_buckets: Sequence[int] | str | None = "auto",
) -> np.ndarray:
    """Encode ``[N, L]`` padded token ids in per-length buckets → ``[N, D]``.

    BERT-family towers mask padded keys out of attention and pool from
    position 0, so ``encode(ids[:, :b])`` is numerically identical to
    ``encode(ids)`` whenever every real token fits in ``b`` — padding beyond
    a text's length is pure wasted MXU time. The reference pads *everything*
    to max_length=256 (quick_start/keep_inference.py:99) while its shipped
    prompt corpora average ~15 tokens; bucketing recovers that ~8× without
    changing a single output bit beyond fp noise (parity-tested in
    tests/test_zeroshot.py). One compile per (batch_size, bucket) shape.

    ``length_buckets=None`` disables bucketing (single full-width pass);
    ``"auto"`` (the default) picks bucketed-vs-flat with the measured probe
    in :func:`choose_bucket_plan` — the probe's dispatches do real rows and
    their features are reused here, so the slower path never ships and the
    probe itself costs at most ~2 extra dispatches.
    """
    ids = np.asarray(ids)
    mask = np.asarray(mask)
    n, full = ids.shape
    lengths = mask.sum(axis=1)
    done = np.zeros(n, bool)
    out = None
    if isinstance(length_buckets, str):
        if length_buckets != "auto":
            raise ValueError(f"length_buckets={length_buckets!r} "
                             "(expected a tuple, None, or 'auto')")
        probed: list = []
        length_buckets, _ = choose_bucket_plan(
            encode_fn, ids, mask, batch_size=batch_size, collect=probed)
        for feats, chunk in probed:  # probe outputs ARE the job's outputs
            if out is None:
                out = np.empty((n, feats.shape[1]), feats.dtype)
            out[chunk] = feats
            done[chunk] = True
    if length_buckets:
        buckets = sorted({min(int(b), full) for b in length_buckets if b > 0})
        if not buckets or buckets[-1] < full:
            buckets.append(full)
    else:
        buckets = [full]

    def dispatches():
        prev = -1  # first bucket takes length-0 rows too (all-pad masks)
        for b in buckets:
            rows = np.flatnonzero((lengths > prev) & (lengths <= b) & ~done)
            prev = b
            for i in range(0, rows.size, batch_size):
                chunk = rows[i : i + batch_size]
                # same _pad_chunk as the probe: shapes must match or each
                # width compiles twice
                bid, bmask = _pad_chunk(ids, mask, chunk, b, batch_size)
                yield encode_fn(bid, bmask), chunk  # async dispatch

    # double-buffered fetch: batch N's download overlaps batch N+1's compute
    from collections import deque

    pending: deque = deque()

    def drain():
        nonlocal out
        feats, chunk = pending.popleft()
        feats = np.asarray(feats)[: chunk.size]
        if out is None:
            out = np.empty((n, feats.shape[1]), feats.dtype)
        out[chunk] = feats

    for item in dispatches():
        pending.append(item)
        if len(pending) > 1:
            drain()
    while pending:
        drain()
    if out is None:  # n == 0
        raise ValueError("no texts to encode")
    return out


def build_classifiers_batched(
    encode_fn: Callable[[np.ndarray, np.ndarray], Array],
    tokenizer,
    prompts: Mapping[str, Mapping],
    label_map: Mapping[str, int],
    add_normal: bool = False,
    max_length: int = 256,
    batch_size: int = 256,
    first_template_only: bool = False,
    length_buckets: Sequence[int] | str | None = "auto",
) -> Array:
    """All prompts → [P, D, C] classifier stack with batched text encoding.

    ``encode_fn(input_ids, attention_mask) -> [B, D]`` is the jitted text
    tower; all texts across all prompts/classes/templates go through it in
    fixed-size batches (pad the tail), bucketed by token length
    (``encode_texts_bucketed``) so short prompts don't pay the max_length=256
    contract's padding.
    """
    keys = sorted(prompts.keys(), key=lambda k: int(k))
    all_texts: list[str] = []
    spans: list[list[tuple[int, int]]] = []  # per prompt, per class: (start, end)
    for k in keys:
        per_class = expand_prompt(prompts[k], label_map, add_normal)
        prompt_spans = []
        for texts in per_class:
            start = len(all_texts)
            all_texts.extend(texts)
            prompt_spans.append((start, len(all_texts)))
        spans.append(prompt_spans)

    enc = tokenizer(all_texts, max_length=max_length)
    feats = encode_texts_bucketed(
        encode_fn, enc["input_ids"], enc["attention_mask"],
        batch_size=batch_size, length_buckets=length_buckets,
    )

    # one vectorized segment-mean over the [N, D] features (the docstring's
    # promise) — the per-(prompt, class) loop dispatched thousands of tiny
    # device ops at reference scale (P=1386)
    starts = np.array([s for ps in spans for (s, _) in ps])
    ends = np.array([e for ps in spans for (_, e) in ps])
    f = np.asarray(feats, np.float32)
    fn = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    if first_template_only:
        cols = fn[starts]  # the reference's [0] quirk (utils.py:74)
    else:
        seg = np.repeat(np.arange(len(starts)), ends - starts)
        sums = np.zeros((len(starts), f.shape[1]), np.float32)
        np.add.at(sums, seg, fn)
        cols = sums / np.maximum((ends - starts)[:, None], 1)
    cols = cols / np.maximum(np.linalg.norm(cols, axis=1, keepdims=True), 1e-12)
    p, c = len(spans), len(spans[0])
    return jnp.asarray(cols.reshape(p, c, -1).transpose(0, 2, 1))  # [P, D, C]


def rank_cls_scores(logits: Array) -> Array:
    """[P, N, C] logits → [P] screening scores (utils.py:107-117)."""
    top2 = jax.lax.top_k(logits, 2)[0]  # [P, N, 2]
    largest, second = top2[..., 0], top2[..., 1]
    diff = largest - second
    complement = jnp.abs(largest + second - 1.0)
    return (diff - complement).mean(axis=-1)


import functools


@functools.partial(jax.jit, static_argnames=("topn",))
def _prompt_select_jit(classifiers: Array, features: Array, topn: int) -> tuple:
    feats = l2_normalize(features.astype(jnp.float32))
    logits = jnp.einsum(
        "nd,pdc->pnc", feats, classifiers, preferred_element_type=jnp.float32
    )
    scores = rank_cls_scores(logits)
    _, order = jax.lax.top_k(scores, topn)
    merged = classifiers[order].sum(axis=0)  # [D, C]
    merged = merged / jnp.linalg.norm(merged, axis=0, keepdims=True)
    return merged, scores, order


def prompt_select(
    classifiers: Array, features: Array, topn: int = 50
) -> Array:
    """Screen [P, D, C] classifiers on [N, D] tile features; return the
    column-normalized sum of the top-n (utils.py:119-146) as [D, C].
    ``topn`` clamps to the pool size (the reference indexes top-50 of 1386;
    smaller prompt files must still work)."""
    topn = min(topn, int(classifiers.shape[0]))
    merged, _, _ = _prompt_select_jit(classifiers, features, topn)
    return merged


def random_ensemble(classifiers: Array, topn: int = 50) -> Array:
    """The no-screening fallback (zeroshot_detection_WSI.py:60-67): sum of
    ``topn`` seeded-random classifiers (with replacement), column-normalized."""
    import random as _random

    total = int(classifiers.shape[0])
    picks = []
    for cter in range(topn):
        # byte-identical to the reference's `random.seed(cter); randint`
        # (same Mersenne seeding) WITHOUT mutating the caller's global
        # random stream
        picks.append(_random.Random(cter).randint(0, total - 1))
    merged = classifiers[jnp.asarray(picks)].sum(axis=0)
    return merged / jnp.linalg.norm(merged, axis=0, keepdims=True)
