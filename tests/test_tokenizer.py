"""Tokenizer parity vs transformers.BertTokenizer (the exact tokenizer the
reference loads, quick_start/keep_inference.py:87) on a synthetic vocab."""

import numpy as np
import pytest
from transformers import BertTokenizer

from keep_tpu.text.tokenizer import WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] "
    "an h e image of breast invasive carcinoma normal tissue lung adeno "
    "##carcinoma ##oma ##den ##o ##ma a the . , - & ; ( ) "
    "melan cutaneous skin cancer malignant tumor cell grade "
    "##s ##ous ##al ##ic renal clear kidney papillary chromophobe "
    "un ##k ##n ##own xyz 1 2 3 ##1 ##2"
).split()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tokenizers(vocab_file):
    ours = WordPieceTokenizer(vocab_file, lower_case=True)
    hf = BertTokenizer(vocab_file, do_lower_case=True)
    return ours, hf

TEXTS = [
    "an H&E image of breast invasive carcinoma.",
    "an H&E image of normal tissue.",
    "an H&E image of lung adenocarcinoma.",
    "Malignant melanoma (skin cancer), grade 3; unknown",
    "  weird   spacing\tand\ncontrol\x00chars� here ",
    "café naïve — em-dash and accents",
    "中文 mixed with english",
    "",
    "a" * 250,  # long-word → [UNK]
    "xyz123 un-k-nown",
]


@pytest.mark.parametrize("text", TEXTS, ids=range(len(TEXTS)))
def test_tokenize_matches_hf(tokenizers, text):
    ours, hf = tokenizers
    assert ours.tokenize(text) == hf.tokenize(text)


def test_encode_contract_matches_hf(tokenizers):
    ours, hf = tokenizers
    got = ours(TEXTS[:4], max_length=32)
    ref = hf(TEXTS[:4], max_length=32, padding="max_length", truncation=True)
    np.testing.assert_array_equal(got["input_ids"], np.array(ref["input_ids"]))
    np.testing.assert_array_equal(
        got["attention_mask"], np.array(ref["attention_mask"])
    )
    np.testing.assert_array_equal(
        got["token_type_ids"], np.array(ref["token_type_ids"])
    )


def test_truncation(tokenizers):
    ours, hf = tokenizers
    text = "breast invasive carcinoma " * 40
    got = ours([text], max_length=16)
    ref = hf([text], max_length=16, padding="max_length", truncation=True)
    np.testing.assert_array_equal(got["input_ids"], np.array(ref["input_ids"]))
    assert got["input_ids"].shape == (1, 16)


def test_max_length_256_default(tokenizers):
    ours, _ = tokenizers
    out = ours("an image of normal tissue.")
    assert out["input_ids"].shape == (1, 256)
    assert out["attention_mask"].sum() > 0


def test_decode_roundtrip(tokenizers):
    ours, _ = tokenizers
    ids = ours.encode("an image of breast invasive carcinoma.", max_length=32)
    assert ours.decode(ids) == "an image of breast invasive carcinoma ."


def test_fuzz_against_hf(tokenizers, rng):
    """Random ASCII soup must tokenize identically to transformers."""
    import string

    ours, hf = tokenizers
    alphabet = string.ascii_letters + string.digits + string.punctuation + "  \t"
    for i in range(60):
        n = int(rng.integers(0, 80))
        text = "".join(rng.choice(list(alphabet), size=n))
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)
    # vocab-word soup with casing/punct glue
    words = ["breast", "Invasive", "CARCINOMA", "&", "h", "e", "-", "adeno"]
    for i in range(40):
        k = int(rng.integers(1, 10))
        text = "".join(
            w + ("" if rng.random() < 0.3 else " ")
            for w in rng.choice(words, size=k)
        )
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)
