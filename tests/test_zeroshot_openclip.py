"""OpenCLIP zero-shot classifier builder (zeroshot.openclip ← reference
zero_shot_classifier.py:21-69) — oracle-tested against a torch
reimplementation of the exact reference math, plus the ImageNet metadata
consumption path and top-k eval."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.zeroshot import openclip
from keep_tpu.zeroshot.imagenet_metadata import (
    IMAGENET_CLASSNAMES,
    OPENAI_IMAGENET_TEMPLATES,
    SIMPLE_IMAGENET_TEMPLATES,
)


class _ToyTokenizer:
    """Deterministic toy tokenizer: hash of words → ids."""

    def __call__(self, texts, max_length=8):
        ids = np.zeros((len(texts), max_length), np.int64)
        mask = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            toks = [hash(w) % 97 + 1 for w in t.split()][: max_length]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _toy_encode(W):
    def encode(ids, mask):
        # bag-of-ids embedding → a fixed random projection
        onehot = np.zeros((len(ids), 97), np.float32)
        for i, row in enumerate(np.asarray(ids)):
            for t in row[np.asarray(mask)[i] == 1]:
                onehot[i, t % 97] += 1.0
        return onehot @ W

    return encode


def test_builder_matches_reference_math(rng):
    """Exact reference pipeline: normalize → template mean → renormalize →
    transpose, class batches concatenated."""
    W = rng.standard_normal((97, 16), dtype=np.float32)
    encode = _toy_encode(W)
    tok = _ToyTokenizer()
    classnames = ["cat", "dog", "lung tumor", "normal tissue", "melanoma"]
    templates = ["a photo of a {}.", "an image of {}.", "{}"]

    got = np.asarray(openclip.build_zero_shot_classifier(
        encode, tok, classnames, templates, num_classes_per_batch=2))

    # oracle: the reference math verbatim (zero_shot_classifier.py:52-60)
    embs = []
    for c in classnames:
        texts = [t.format(c) for t in templates]
        e = encode(*[np.asarray(v) for v in
                     (tok(texts)["input_ids"], tok(texts)["attention_mask"])])
        e = e / np.linalg.norm(e, axis=-1, keepdims=True)
        m = e.mean(axis=0)
        embs.append(m / np.linalg.norm(m))
    ref = np.stack(embs, axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    assert got.shape == (16, 5)


def test_imagenet_metadata_consumable():
    assert len(IMAGENET_CLASSNAMES) == 1000
    assert len(OPENAI_IMAGENET_TEMPLATES) == 80
    assert len(SIMPLE_IMAGENET_TEMPLATES) == 7
    # template-application contract: callables or format strings both work
    t0 = OPENAI_IMAGENET_TEMPLATES[0]
    s = t0("goldfish") if callable(t0) else t0.format("goldfish")
    assert "goldfish" in s


@pytest.mark.slow
def test_imagenet_classifier_small_slice(rng):
    """Build a classifier over a 25-class ImageNet slice with the real 80
    OpenAI templates through the fixed-shape batch path."""
    W = rng.standard_normal((97, 8), dtype=np.float32)
    cls = openclip.build_zero_shot_classifier(
        _toy_encode(W), _ToyTokenizer(), IMAGENET_CLASSNAMES[:25],
        OPENAI_IMAGENET_TEMPLATES, num_classes_per_batch=10)
    assert cls.shape == (8, 25)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(cls), axis=0), 1.0,
                               atol=1e-5)


def test_topk_accuracy_and_eval():
    logits = jnp.asarray([[9.0, 1.0, 0.0], [0.0, 1.0, 5.0], [3.0, 2.0, 1.0]])
    target = jnp.asarray([0, 1, 2])
    a1, a2 = openclip.accuracy(logits, target, topk=(1, 2))
    # row0: top1 hit; row1: top1=[2] miss, top2=[2,1] hit; row2: miss both
    assert a1 == pytest.approx(1 / 3)
    assert a2 == pytest.approx(2 / 3)

    cls = jnp.eye(4)[:, :3]  # [D=4, C=3]
    feats = np.eye(4, dtype=np.float32)[:3]  # 3 samples aligned to classes
    batches = [(feats[:2], np.asarray([0, 1])), (feats[2:], np.asarray([2]))]
    out = openclip.zero_shot_eval_imagenet(lambda x: x, cls, batches)
    assert out["imagenet-zeroshot-val-top1"] == 1.0
    assert out["imagenet-zeroshot-val-top5"] == 1.0
