"""OpenCLIP-style zero-shot classifier builder + ImageNet eval — the
reference's ``zero_shot_classifier.py:21-69`` (build_zero_shot_classifier)
and the ``zero_shot_metadata.py`` consumption path, TPU-native.

Semantics (verified against the reference): per class-batch, every
(classname × template) text is encoded, L2-normalized, reshaped
[classes, templates, D], template-MEAN'd, re-normalized, transposed →
weights [D, num_classes]. Classes are processed in fixed-size batches so a
single compiled text-encoder shape serves the whole build (tail padded) —
vs the reference's per-batch dynamic shapes.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from keep_tpu.ops.nn import l2_normalize

Array = jax.Array


def build_zero_shot_classifier(
    encode_text: Callable[[np.ndarray, np.ndarray], Array],
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[Union[Callable, str]],
    num_classes_per_batch: int = 10,
    max_length: int = 77,
) -> Array:
    """→ [D, num_classes] zero-shot weights (zero_shot_classifier.py:21-69).

    ``encode_text(input_ids, attention_mask) -> [N, D]`` (unnormalized ok —
    normalized here); ``templates`` are '{}'-format strings or callables.
    """
    assert len(templates) > 0 and len(classnames) > 0
    use_format = isinstance(templates[0], str)
    nt = len(templates)
    nb = num_classes_per_batch

    cols = []
    for start in range(0, len(classnames), nb):
        batch = list(classnames[start: start + nb])
        real = len(batch)
        batch += [batch[-1]] * (nb - real)  # fixed shape: one compile
        texts = [t.format(c) if use_format else t(c)
                 for c in batch for t in templates]
        enc = tokenizer(texts, max_length=max_length)
        emb = encode_text(np.asarray(enc["input_ids"]),
                          np.asarray(enc["attention_mask"]))
        emb = l2_normalize(jnp.asarray(emb).astype(jnp.float32))
        emb = emb.reshape(nb, nt, -1).mean(axis=1)
        cols.append(l2_normalize(emb)[:real])
    return jnp.concatenate(cols, axis=0).T


def accuracy(logits: Array, target: Array, topk=(1,)) -> list[float]:
    """top-k accuracies (reference zero_shot.py:18-21)."""
    pred = jnp.argsort(-logits, axis=-1)[:, : max(topk)]
    correct = pred == target[:, None]
    n = logits.shape[0]
    return [float(correct[:, :k].any(axis=1).sum()) / n for k in topk]


def zero_shot_eval_imagenet(
    encode_image: Callable[[Array], Array],
    classifier: Array,
    batches,
    logit_scale: float = 100.0,
) -> dict:
    """ImageNet-style zero-shot eval: iterate (pixels, labels) batches,
    logits = scale · norm(feats) @ classifier, report top-1/top-5
    (reference zero_shot.py run() semantics for the OpenCLIP path)."""
    top1 = top5 = n = 0.0
    for pixels, labels in batches:
        feats = l2_normalize(jnp.asarray(
            encode_image(jnp.asarray(pixels))).astype(jnp.float32))
        logits = logit_scale * feats @ classifier.astype(jnp.float32)
        a1, a5 = accuracy(logits, jnp.asarray(labels), topk=(1, 5))
        b = len(labels)
        top1 += a1 * b
        top5 += a5 * b
        n += b
    return {"imagenet-zeroshot-val-top1": top1 / max(n, 1),
            "imagenet-zeroshot-val-top5": top5 / max(n, 1)}
