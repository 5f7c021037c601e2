"""Native C++ WordPiece vs the Python implementation (exact parity) + speed."""

import shutil
import subprocess
import time

import numpy as np
import pytest

HAS_GXX = shutil.which("g++") is not None

pytestmark = pytest.mark.skipif(not HAS_GXX, reason="no C++ toolchain")

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] "
    "an h e image of breast invasive carcinoma normal tissue lung adeno "
    "##carcinoma ##oma a the . , - & ; ( ) melan cutaneous skin cancer "
    "malignant tumor grade ##s ##ous 1 2 3"
).split()


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    from keep_tpu.text.fast_tokenizer import FastWordPieceTokenizer
    from keep_tpu.text.tokenizer import WordPieceTokenizer

    p = tmp_path_factory.mktemp("fast") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return FastWordPieceTokenizer(str(p)), WordPieceTokenizer(str(p))


TEXTS = [
    "an H&E image of breast invasive carcinoma.",
    "Malignant melanoma (skin cancer), grade 3; tumor",
    "  weird   spacing\tand\ttabs ",
    "",
    "a" * 250,
    "adenocarcinoma adenomas cancerous",
    "café non-ascii route",  # → python fallback path
    "中文 mixed",
]


def test_native_matches_python(tokenizers):
    fast, ref = tokenizers
    got = fast(TEXTS, max_length=32)
    want = ref(TEXTS, max_length=32)
    np.testing.assert_array_equal(got["input_ids"], want["input_ids"])
    np.testing.assert_array_equal(got["attention_mask"], want["attention_mask"])


def test_native_truncation(tokenizers):
    fast, ref = tokenizers
    long = "breast invasive carcinoma " * 50
    got = fast([long], max_length=16)
    want = ref([long], max_length=16)
    np.testing.assert_array_equal(got["input_ids"], want["input_ids"])


def test_native_faster_than_python(tokenizers):
    fast, ref = tokenizers
    corpus = TEXTS[:6] * 300  # ascii-only hot path
    # best-of-3 to be robust against host load from concurrent TPU jobs
    t_fast = min(
        _time(lambda: fast(corpus, max_length=256)) for _ in range(3)
    )
    t_ref = min(_time(lambda: ref(corpus, max_length=256)) for _ in range(3))
    assert t_fast < t_ref, (t_fast, t_ref)


def _time(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_build_is_idempotent():
    from keep_tpu.text.fast_tokenizer import build_native

    p1 = build_native()
    p2 = build_native()
    assert p1 == p2
