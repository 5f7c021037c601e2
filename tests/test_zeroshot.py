"""Zero-shot classifier build + prompt screening vs a torch-style oracle
implementing the documented reference math (SURVEY.md §2.1 #4-#5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from keep_tpu.zeroshot import (
    build_classifier,
    build_classifiers_batched,
    prompt_select,
    random_ensemble,
    rank_cls_scores,
)


def normalize(x, axis=-1):
    return x / np.linalg.norm(x, axis=axis, keepdims=True)


def test_build_classifier_single_template(rng):
    emb = rng.standard_normal((1, 16)).astype(np.float32)
    cls = np.asarray(build_classifier([jnp.asarray(emb), jnp.asarray(emb * 2)]))
    ref_col = normalize(normalize(emb).mean(0))
    np.testing.assert_allclose(cls[:, 0], ref_col[0] if ref_col.ndim > 1 else ref_col, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(cls, axis=0), 1.0, atol=1e-6)
    assert cls.shape == (16, 2)


def test_build_classifier_multi_template(rng):
    embs = [rng.standard_normal((5, 16)).astype(np.float32) for _ in range(3)]
    cls = np.asarray(build_classifier([jnp.asarray(e) for e in embs]))
    for c, e in enumerate(embs):
        col = normalize(e).mean(0)
        col = col / np.linalg.norm(col)
        np.testing.assert_allclose(cls[:, c], col, atol=1e-6)
    # first_template_only quirk (reference utils.py:74)
    cls_q = np.asarray(
        build_classifier([jnp.asarray(e) for e in embs], first_template_only=True)
    )
    for c, e in enumerate(embs):
        np.testing.assert_allclose(cls_q[:, c], normalize(e[0]), atol=1e-6)


def test_rank_cls_scores(rng):
    logits = rng.random((7, 40, 3)).astype(np.float32)
    got = np.asarray(rank_cls_scores(jnp.asarray(logits)))
    srt = np.sort(logits, axis=-1)
    largest, second = srt[..., -1], srt[..., -2]
    ref = ((largest - second) - np.abs(largest + second - 1)).mean(-1)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_prompt_select_matches_oracle(rng):
    p, d, c, n, topn = 12, 16, 2, 100, 5
    classifiers = rng.standard_normal((p, d, c)).astype(np.float32)
    classifiers = classifiers / np.linalg.norm(classifiers, axis=1, keepdims=True)
    feats = rng.standard_normal((n, d)).astype(np.float32)

    got = np.asarray(prompt_select(jnp.asarray(classifiers), jnp.asarray(feats), topn))

    fn = normalize(feats)
    scores = []
    for k in range(p):
        logits = fn @ classifiers[k]
        srt = np.sort(logits, axis=1)
        largest, second = srt[:, -1], srt[:, -2]
        scores.append(((largest - second) - np.abs(largest + second - 1)).mean())
    order = np.argsort(-np.asarray(scores), kind="stable")
    merged = classifiers[order[:topn]].sum(0)
    merged = merged / np.linalg.norm(merged, axis=0, keepdims=True)
    np.testing.assert_allclose(got, merged, atol=1e-5)


def test_random_ensemble_seeding(rng):
    """Seeded picks must be reproducible (zeroshot_detection_WSI.py:60-67)."""
    classifiers = jnp.asarray(rng.standard_normal((9, 8, 2)).astype(np.float32))
    a = np.asarray(random_ensemble(classifiers, topn=4))
    b = np.asarray(random_ensemble(classifiers, topn=4))
    np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=0), 1.0, atol=1e-6)


def test_build_classifiers_batched(rng):
    """End-to-end prompt stack via a fake encoder + real tokenizer path."""
    d = 8

    class FakeTok:
        def __call__(self, texts, max_length=256):
            n = len(texts)
            ids = np.zeros((n, 4), np.int32)
            for i, t in enumerate(texts):
                ids[i, 0] = (hash(t) % 1000) + 1
            return {
                "input_ids": ids,
                "attention_mask": np.ones((n, 4), np.int32),
                "token_type_ids": np.zeros((n, 4), np.int32),
            }

    def fake_encode(ids, mask):
        # deterministic unit feature per text id
        g = np.random.default_rng(ids[:, 0].astype(np.int64))
        feats = g.standard_normal((ids.shape[0], d)).astype(np.float32)
        return jnp.asarray(normalize(feats))

    prompts = {
        "0": {"classnames": {"Normal": "normal tissue", "Tumor": "melanoma"},
              "templates": "CLASSNAME."},
        "1": {"classnames": {"Normal": "benign", "Tumor": "cancer"},
              "templates": ["an image of CLASSNAME.", "CLASSNAME"]},
    }
    label_map = {"Normal": 0, "Tumor": 1}
    stack = build_classifiers_batched(
        fake_encode, FakeTok(), prompts, label_map, batch_size=3
    )
    assert stack.shape == (2, d, 2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(stack), axis=1), 1.0, atol=1e-5
    )
    # add_normal appends a class column
    stack3 = build_classifiers_batched(
        fake_encode, FakeTok(),
        {"0": {"classnames": {"A": "a", "B": "b", "Normal": "normal"},
               "templates": "CLASSNAME."}},
        {"A": 0, "B": 1}, add_normal=True, batch_size=2,
    )
    assert stack3.shape == (1, d, 3)


def test_non_contiguous_label_map_rejected():
    from keep_tpu.zeroshot.classifier import expand_prompt

    prompt = {"classnames": {"Tumor": "tumor"}, "templates": "CLASSNAME."}
    with pytest.raises(ValueError, match="contiguous"):
        expand_prompt(prompt, {"Tumor": 1})


def test_generate_prompts():
    from keep_tpu.zeroshot.prompts import generate_prompts, tumor_phrasings

    nodes = {
        "DOID:leaf": {"name": "cutaneous melanoma",
                      "synonyms": ["malignant melanoma of skin"],
                      "parent": ["DOID:mid"]},
        "DOID:mid": {"name": "melanoma", "synonyms": ["skin cancer, melanoma"],
                     "parent": ["DOID:14566"]},
        "DOID:14566": {"name": "disease of cellular proliferation",
                       "synonyms": [], "parent": []},
    }
    phr = tumor_phrasings(nodes, "DOID:leaf")
    assert "cutaneous melanoma" in phr
    assert "malignant melanoma of skin" in phr
    assert "melanoma" in phr
    assert "melanoma cutaneous melanoma" in phr  # coarse→fine path phrase
    assert "disease of cellular proliferation" not in phr  # root excluded

    # depth-2 path phrases are CONTIGUOUS ("gp mid leaf" — the shape
    # hierarchy_caption trains on), never the "gp leaf" skip
    nodes2 = {
        "DOID:leaf": {"name": "leafoma", "parent": ["DOID:mid"]},
        "DOID:mid": {"name": "midoma", "parent": ["DOID:gp"]},
        "DOID:gp": {"name": "gpoma", "parent": []},
    }
    phr2 = tumor_phrasings(nodes2, "DOID:leaf")
    assert "midoma leafoma" in phr2
    assert "gpoma midoma leafoma" in phr2
    assert "gpoma leafoma" not in phr2

    # an explicitly empty template list means no prompts, not the defaults
    assert generate_prompts(nodes, "DOID:leaf", templates=[]) == {}

    prompts = generate_prompts(nodes, "DOID:leaf",
                               normal_phrases=["normal tissue"],
                               templates=["CLASSNAME."])
    # reference prompt-JSON shape
    assert set(prompts["0"]) == {"classnames", "templates"}
    assert prompts["0"]["classnames"]["Normal"] == "normal tissue"
    assert prompts["0"]["templates"] == "CLASSNAME."
    assert len(prompts) == len(phr)
    # consumable by the classifier builder contract
    from keep_tpu.zeroshot.classifier import expand_prompt

    texts = expand_prompt(prompts["0"], {"Normal": 0, "Tumor": 1})
    assert texts[0] == ["normal tissue."]


def test_prompt_select_clamps_topn(rng):
    """topn larger than the prompt pool must clamp, not crash (the reference
    only ever runs with 660+ prompts; small prompt files are legal input)."""
    from keep_tpu.zeroshot.classifier import prompt_select

    cls = jnp.asarray(rng.standard_normal((4, 16, 2), dtype=np.float32))
    cls = cls / jnp.linalg.norm(cls, axis=1, keepdims=True)
    feats = jnp.asarray(rng.standard_normal((10, 16), dtype=np.float32))
    merged = prompt_select(cls, feats, topn=50)
    assert merged.shape == (16, 2)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(merged), axis=0),
                               1.0, atol=1e-5)


def test_encode_texts_bucketed_exact_parity(rng):
    """Bucketed encode == full-width encode through a real BERT tower.

    Padding beyond a text's length is masked out of attention and the pooler
    reads position 0, so slicing each text to its length bucket must not
    change the features (the whole premise of the bucketed classifier build).
    """
    import jax

    from keep_tpu.configs import BertConfig
    from keep_tpu.models import bert
    from keep_tpu.zeroshot import encode_texts_bucketed

    cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
    )
    params = bert.init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def encode(ids, mask):
        out = bert.forward(params, ids, mask, cfg=cfg)
        return out["pooler_output"]

    n, full = 23, 48
    lengths = rng.integers(2, full + 1, size=n)
    lengths[0], lengths[1] = 2, full  # hit both extremes
    ids = np.zeros((n, full), np.int32)
    mask = np.zeros((n, full), np.int32)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(1, cfg.vocab_size, size=ln)
        mask[i, :ln] = 1

    ref = np.asarray(encode(ids, mask))
    got = encode_texts_bucketed(
        lambda i, m: encode(i, m), ids, mask,
        batch_size=7, length_buckets=(8, 16, 32, 64),
    )
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)

    # buckets wider than the corpus collapse to one pass; None disables
    got_none = encode_texts_bucketed(
        lambda i, m: encode(i, m), ids, mask, batch_size=7, length_buckets=None
    )
    np.testing.assert_allclose(got_none, ref, atol=1e-7)


def test_build_classifiers_batched_bucketed_matches_unbucketed(rng):
    """The classifier stack is identical with and without bucketing when the
    encoder is genuinely padding-invariant."""
    d = 8

    class VarTok:
        def __call__(self, texts, max_length=256):
            n = len(texts)
            L = 12
            ids = np.zeros((n, L), np.int32)
            mask = np.zeros((n, L), np.int32)
            for i, t in enumerate(texts):
                ln = 2 + (hash(t) % (L - 2))
                ids[i, :ln] = (np.arange(ln) + hash(t)) % 997 + 1
                mask[i, :ln] = 1
            return {"input_ids": ids, "attention_mask": mask}

    def fake_encode(ids, mask):
        # padding-invariant: mean of per-token hashes over real tokens only
        g = np.random.default_rng(1)
        table = g.standard_normal((1000, d)).astype(np.float32)
        ids = np.asarray(ids)
        mask = np.asarray(mask).astype(np.float32)
        tok = table[ids % 1000] * mask[..., None]
        return jnp.asarray(tok.sum(1) / np.maximum(mask.sum(1, keepdims=True), 1))

    prompts = {
        str(i): {"classnames": {"Normal": f"normal {i}", "Tumor": f"tumor {'x' * i}"},
                 "templates": "an image of CLASSNAME."}
        for i in range(5)
    }
    label_map = {"Normal": 0, "Tumor": 1}
    a = np.asarray(build_classifiers_batched(
        fake_encode, VarTok(), prompts, label_map, batch_size=3,
        length_buckets=(4, 8, 16)))
    b = np.asarray(build_classifiers_batched(
        fake_encode, VarTok(), prompts, label_map, batch_size=3,
        length_buckets=None))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_plan_length_buckets_cost_model():
    """The auto chooser is measurement-driven (VERDICT r04 #4).

    Fragmentation case: a 600-text corpus at batch 512 is 2 flat dispatches
    but 4 bucketed ones (each padded to the full batch). At a high measured
    per-dispatch floor the 2 extra dispatches cost more than the padded-token
    savings -> flat; co-located the savings win -> bucketed.
    """
    from keep_tpu.zeroshot.classifier import plan_length_buckets

    g = np.random.default_rng(0)
    lengths = g.integers(1, 257, 600)  # fills all four buckets
    kw = dict(full=256, batch_size=512, sec_per_token=1.0e-6)
    fast, info_f = plan_length_buckets(lengths, rtt_s=0.001, **kw)
    slow, info_s = plan_length_buckets(lengths, rtt_s=0.140, **kw)
    assert fast == (32, 64, 128, 256)  # bucketed wins co-located
    assert info_f["est_bucketed_s"] < info_f["est_flat_s"]
    assert slow is None  # 2 extra 140 ms dispatches beat the savings
    assert info_s["est_flat_s"] <= info_s["est_bucketed_s"]

    # the reference-scale corpus (2,772 short prompts -> 7 bucketed vs 6
    # flat dispatches) passes the analytic pre-filter at BOTH floors — but
    # on-chip round-5 data measured it LOSING 0.92x on a 26 ms-RTT day, so
    # the analytic plan is only tier 1 of choose_bucket_plan: when bucketing
    # adds dispatches, a measured probe makes the final call.
    ref_lengths = np.clip(g.normal(16, 5, 2772).astype(int), 6, 40)
    for rtt_s in (0.001, 0.140):
        choice, _ = plan_length_buckets(ref_lengths, rtt_s=rtt_s, **kw)
        assert choice is not None


def _probe_corpus(rng, n=24, full=64, short=8, n_long=4):
    """n texts, mostly <= `short` tokens with `n_long` near-full ones —
    at batch 8 that is 3 flat dispatches vs 4 bucketed (probe territory)."""
    ids = np.zeros((n, full), np.int32)
    mask = np.zeros((n, full), np.int32)
    for i in range(n):
        ln = int(rng.integers(full - 8, full)) if i < n_long \
            else int(rng.integers(2, short + 1))
        ids[i, :ln] = rng.integers(1, 1000, size=ln)
        mask[i, :ln] = 1
    return ids, mask


def _sleepy_encode(d=8, per_width_s=0.0, fixed_s=0.0, calls=None):
    """Padding-invariant fake tower with a controllable time profile:
    ``fixed_s + width * per_width_s`` per call. ``calls`` (a list) logs the
    dispatched widths."""
    import time as _time

    g = np.random.default_rng(1)
    table = g.standard_normal((1000, d)).astype(np.float32)

    def encode(ids, mask):
        ids = np.asarray(ids)
        m = np.asarray(mask).astype(np.float32)
        if calls is not None:
            calls.append(ids.shape[1])
        _time.sleep(fixed_s + ids.shape[1] * per_width_s)
        tok = table[ids % 1000] * m[..., None]
        return jnp.asarray(
            tok.sum(1) / np.maximum(m.sum(1, keepdims=True), 1))

    return encode


def test_choose_bucket_plan_dominated_skips_probe(rng):
    """Tier 2: when every bucket packs into the flat batch count, bucketed
    wins by construction — no probe dispatches at all."""
    from keep_tpu.zeroshot.classifier import choose_bucket_plan

    n, full = 10, 64  # one batch either way
    ids = np.zeros((n, full), np.int32)
    mask = np.zeros((n, full), np.int32)
    for i in range(n):
        ln = int(rng.integers(2, 8))
        ids[i, :ln] = rng.integers(1, 1000, size=ln)
        mask[i, :ln] = 1
    calls: list = []
    plan, info = choose_bucket_plan(
        _sleepy_encode(calls=calls), ids, mask, batch_size=16,
        buckets=(8, 16, 32, 64))
    assert plan is not None
    assert info["method"] == "dominated"
    assert calls == []  # decided without touching the tower


def test_choose_bucket_plan_probe_decides_both_ways(rng):
    """Tier 3: the probe ships whichever path MEASURES faster — a
    dispatch-floor-dominated link picks flat (the r04/r05 regression this
    chooser exists to prevent), a compute-dominated one picks bucketed."""
    from keep_tpu.zeroshot.classifier import choose_bucket_plan

    ids, mask = _probe_corpus(rng)

    # constant per-dispatch cost regardless of width == pure dispatch floor:
    # bucketed needs 4 dispatches vs flat's 3 -> flat must ship
    plan, info = choose_bucket_plan(
        _sleepy_encode(fixed_s=0.02), ids, mask, batch_size=8,
        buckets=(8, 16, 32, 64))
    assert info["method"] == "probe"
    assert plan is None

    # cost proportional to width == compute-dominated: bucketed's 3 narrow
    # + 1 wide dispatches beat 3 full-width ones by far more than the margin
    plan, info = choose_bucket_plan(
        _sleepy_encode(per_width_s=0.0005), ids, mask, batch_size=8,
        buckets=(8, 16, 32, 64))
    assert info["method"] == "probe"
    assert plan is not None
    assert info["est_bucketed_s"] * info["margin"] < info["est_flat_s"]


def test_choose_bucket_plan_small_job_follows_link(rng, monkeypatch):
    """Tier 2.5: under 3 flat batches the probe would rival the job, so the
    link decides — flat on a relay (the observed failure regime), the
    analytic bucketed plan co-located (never wrong there, sub-ms
    dispatches). No probe dispatches either way."""
    from keep_tpu.utils import rtt as rtt_mod
    from keep_tpu.zeroshot.classifier import choose_bucket_plan

    # 12 texts over THREE widths (5@<=8, 3@<=16, 4@~60) at batch 8: 2 flat
    # batches vs 3 bucketed -> extra dispatches, but under the probe floor
    n, full = 12, 64
    ids = np.zeros((n, full), np.int32)
    mask = np.zeros((n, full), np.int32)
    for i in range(n):
        ln = 4 if i < 5 else (12 if i < 8 else 60)
        ids[i, :ln] = rng.integers(1, 1000, size=ln)
        mask[i, :ln] = 1
    calls: list = []
    enc = _sleepy_encode(calls=calls)

    for rtt_ms, expect_plan in ((28.0, False), (0.4, True)):
        monkeypatch.setattr(rtt_mod, "_memo",
                            {"median_ms": rtt_ms, "p95_ms": rtt_ms,
                             "min_ms": rtt_ms, "n": 1})
        plan, info = choose_bucket_plan(enc, ids, mask, batch_size=8,
                                        buckets=(8, 16, 32, 64))
        assert info["method"].startswith("small_job")
        assert (plan is not None) == expect_plan
    assert calls == []


def test_encode_texts_bucketed_auto_reuses_probe_work(rng):
    """'auto' parity with flat AND probe-dispatch reuse: the probe's
    real-row outputs are scattered into the result, so the total dispatch
    count stays near the pure plan's, not probe + full job."""
    from keep_tpu.zeroshot import encode_texts_bucketed

    ids, mask = _probe_corpus(rng)
    ref = encode_texts_bucketed(
        _sleepy_encode(), ids, mask, batch_size=8, length_buckets=None)

    calls: list = []
    auto = encode_texts_bucketed(
        _sleepy_encode(per_width_s=0.0005, calls=calls), ids, mask,
        batch_size=8, length_buckets="auto")
    np.testing.assert_allclose(auto, ref, atol=1e-6)
    # probe <= 6 dispatches (2 per width x {8, 64, full}), all on real rows;
    # the remainder must NOT re-encode them: naive probe+job would be 6 + 4
    assert len(calls) <= 8


def test_encode_texts_bucketed_auto_parity(rng):
    """length_buckets='auto' returns the same features as both explicit
    plans (whatever the chooser picks, outputs are padding-invariant)."""
    from keep_tpu.zeroshot import encode_texts_bucketed

    d = 8

    def fake_encode(ids, mask):
        g = np.random.default_rng(1)
        table = g.standard_normal((1000, d)).astype(np.float32)
        ids = np.asarray(ids)
        m = np.asarray(mask).astype(np.float32)
        tok = table[ids % 1000] * m[..., None]
        return jnp.asarray(tok.sum(1) / np.maximum(m.sum(1, keepdims=True), 1))

    n, full = 17, 64
    ids = np.zeros((n, full), np.int32)
    mask = np.zeros((n, full), np.int32)
    for i in range(n):
        ln = int(rng.integers(2, full + 1))
        ids[i, :ln] = rng.integers(1, 1000, size=ln)
        mask[i, :ln] = 1
    ref = encode_texts_bucketed(fake_encode, ids, mask, batch_size=5,
                                length_buckets=None)
    auto = encode_texts_bucketed(fake_encode, ids, mask, batch_size=5,
                                 length_buckets="auto")
    np.testing.assert_allclose(auto, ref, atol=1e-6)
    import pytest

    with pytest.raises(ValueError, match="auto"):
        encode_texts_bucketed(fake_encode, ids, mask, length_buckets="bogus")
