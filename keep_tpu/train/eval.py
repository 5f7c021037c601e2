"""In-training evaluation: zero-shot classification / retrieval + validation
contrastive metrics.

Reference semantics (training/path_training/zero_shot.py:81-254 and
train_hierarchy.py:251-370):
- zeroshot-cls: encode all eval images; build 50 caption rounds from the
  prompt JSON (prompt i supplies one caption per class); per round, 1-NN over
  the class caption embeddings; report WF1 median/Q1/Q3 (midpoint
  percentiles) over rounds.
- zeroshot-ret / zeroshot-po: encode image/text pairs; per text, top-50
  images by similarity; p@10 / p@50 against the paired index.
- val: contrastive loss + R@K/rank metrics on paired features.

TPU-native: all encodes go through fixed-shape jitted batches; ranking math
is one [T, I] matmul + top-k on device.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Optional, Sequence

import numpy as np

from keep_tpu.metrics import (
    classification_metrics,
    clip_retrieval_metrics,
    retrieval_precision,
)


def label_captions_from_prompts(
    prompts: dict, rounds: int = 50
) -> dict[str, list[str]]:
    """{class: [caption per round]} from the prompt JSON (zero_shot.py:50-63).
    ``templates`` may be a str or a list (the WSI prompt files use both
    shapes — classifier.expand_prompt accepts either); per reference
    round semantics one caption per round, so a list contributes its
    first entry."""
    types = list(prompts["0"]["classnames"].keys())
    out = {t: [] for t in types}
    for t in types:
        for i in range(rounds):
            p = prompts[str(i)]
            tpl = p["templates"]
            if isinstance(tpl, (list, tuple)):
                tpl = tpl[0]
            out[t].append(tpl.replace("CLASSNAME", p["classnames"][t]))
    return out


def encode_in_batches(
    encode_fn: Callable, arrays: Sequence[np.ndarray], batch_size: int
) -> np.ndarray:
    """Fixed-shape batched encode: tail batches padded so one compiled shape
    serves everything."""
    n = arrays[0].shape[0]
    feats = []
    for i in range(0, n, batch_size):
        chunk = [a[i : i + batch_size] for a in arrays]
        if chunk[0].shape[0] < batch_size:
            pad = batch_size - chunk[0].shape[0]
            chunk = [np.pad(c, ((0, pad),) + ((0, 0),) * (c.ndim - 1)) for c in chunk]
        feats.append(np.asarray(encode_fn(*chunk)))
    return np.concatenate(feats, axis=0)[:n]


def zeroshot_classification(
    image_features: np.ndarray,
    labels: Sequence[str],
    caption_features: dict[str, np.ndarray],
    rounds: int = 50,
) -> dict:
    """WF1 over ``rounds`` caption rounds (zero_shot.py:121-139,240-246).

    ``caption_features[class]`` is [rounds, D] (already encoded).
    """
    img = image_features / np.linalg.norm(image_features, axis=1, keepdims=True)
    class_names = list(caption_features.keys())
    wf1 = []
    for i in range(rounds):
        round_emb = np.stack([caption_features[t][i] for t in class_names])
        round_emb = round_emb / np.linalg.norm(round_emb, axis=1, keepdims=True)
        scores = img @ round_emb.T
        idx = np.argmax(scores, axis=1)  # one vectorized argmax per round
        preds = [class_names[i] for i in idx]
        wf1.append(classification_metrics(list(labels), preds)["WF1"])
    q1, med, q3 = np.percentile(np.asarray(wf1), (25, 50, 75), method="midpoint")
    return {
        "zeroshot-cls-WF1-median": float(med),
        "zeroshot-cls-WF1-Q1": float(q1),
        "zeroshot-cls-WF1-Q3": float(q3),
        "rounds": wf1,
    }


def zeroshot_retrieval(
    image_features: np.ndarray, text_features: np.ndarray, topk: int = 50
) -> dict:
    """Text→image retrieval p@10/p@50 (zero_shot.py:180-188)."""
    img = image_features / np.linalg.norm(image_features, axis=1, keepdims=True)
    txt = text_features / np.linalg.norm(text_features, axis=1, keepdims=True)
    scores = txt @ img.T
    best = np.argsort(-scores, axis=1, kind="stable")[:, :topk]
    targets = list(range(len(img)))
    return retrieval_precision(targets, list(best))


def validation_metrics(
    image_features: np.ndarray,
    text_features: np.ndarray,
    logit_scale: float,
) -> dict:
    """Val contrastive loss + R@K / rank metrics
    (train_hierarchy.py:264-326,353-370)."""
    img = np.asarray(image_features)
    txt = np.asarray(text_features)
    logits = logit_scale * img @ txt.T
    n = logits.shape[0]
    log_sm = logits - _logsumexp(logits, axis=1)
    log_sm_t = logits.T - _logsumexp(logits.T, axis=1)
    loss = -0.5 * (np.mean(np.diag(log_sm)) + np.mean(np.diag(log_sm_t)))
    out = {"val_contrastive_loss": float(loss)}
    out.update(clip_retrieval_metrics(img, txt, logit_scale))
    return out


def _logsumexp(x, axis):
    m = x.max(axis=axis, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))


def zero_shot_eval(
    encode_image_fn: Callable,
    encode_text_fn: Callable,
    tokenizer,
    data: dict,
    *,
    prompts_path: Optional[str] = None,
    batch_size: int = 64,
    max_length: int = 256,
    rounds: Optional[int] = None,
) -> dict:
    """Full in-training eval over available eval sets (zero_shot.py:81-254).

    ``data`` maps task → ONE (pixels, label_or_text) pair of host arrays
    (batching happens inside, `encode_in_batches`):
      'zeroshot_cls': (pixels [N,S,S,3], labels [N] str)
      'zeroshot_ret' / 'zeroshot_po': (pixels, texts)
    """
    results = {}
    if "zeroshot_cls" in data and prompts_path:
        pixels, labels = data["zeroshot_cls"]
        img = encode_in_batches(encode_image_fn, [pixels], batch_size)
        with open(prompts_path) as f:
            prompts = json.load(f)
        # the reference assumes exactly 50 prompt rounds and KeyErrors on
        # fewer (SURVEY §2.2); derive from the file instead
        if rounds is None:
            rounds = min(50, len(prompts))
        caps = label_captions_from_prompts(prompts, rounds)
        # length-bucketed text encode: identical output (padding is masked),
        # ~8x less MXU time on short caption corpora (zeroshot/classifier.py)
        from keep_tpu.zeroshot.classifier import encode_texts_bucketed

        cap_feats = {}
        for t, texts in caps.items():
            enc = tokenizer(texts, max_length=max_length)
            cap_feats[t] = encode_texts_bucketed(
                encode_text_fn,
                np.asarray(enc["input_ids"]), np.asarray(enc["attention_mask"]),
                batch_size=batch_size,
            )
        cls = zeroshot_classification(img, labels, cap_feats, rounds)
        results.update({k: v for k, v in cls.items() if k != "rounds"})

    for task in ("zeroshot_ret", "zeroshot_po"):
        if task in data:
            from keep_tpu.zeroshot.classifier import encode_texts_bucketed

            pixels, texts = data[task]
            img = encode_in_batches(encode_image_fn, [pixels], batch_size)
            enc = tokenizer(list(texts), max_length=max_length)
            txt = encode_texts_bucketed(
                encode_text_fn,
                np.asarray(enc["input_ids"]), np.asarray(enc["attention_mask"]),
                batch_size=batch_size,
            )
            ret = zeroshot_retrieval(img, txt)
            tag = task.split("_")[1]
            results[f"zeroshot-{tag}-p@10"] = ret["p@10"]
            results[f"zeroshot-{tag}-p@50"] = ret["p@50"]
    return results
