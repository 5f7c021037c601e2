"""Golden-vector replay: parity proofs that survive without their oracles.

These tests intentionally import NO torch, NO transformers, and touch
nothing under /root/reference — the frozen bundles in tests/golden/ carry
the oracle outputs (generated once by scripts/make_golden.py from the real
``transformers.BertModel`` and the reference's own WSI decision functions).
If those dependencies ever leave the image, this file still proves the
text tower and the WSI rules match the published behavior
(quick_start/keep_inference.py:54-62, WSI_evaluation/*_utils.py).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from keep_tpu.utils.golden import load_bundle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _bundle(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated (scripts/make_golden.py)")
    return load_bundle(path)


@pytest.fixture(scope="module")
def bert_bundle():
    return _bundle("bert_small.npz")


@pytest.fixture(scope="module")
def wsi_bundle():
    return _bundle("wsi_rules.npz")


def test_bert_matches_frozen_hf(bert_bundle):
    from keep_tpu.configs import BertConfig
    from keep_tpu.models import bert

    b = bert_bundle
    cfg = BertConfig(**{k: int(v) for k, v in b["cfg"].items()})
    ids = b["inputs"]["ids"]
    mask = b["inputs"]["mask"]
    out = bert.forward(b["params"], jnp.asarray(ids), jnp.asarray(mask),
                       cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), b["expected"]["pooler_output"],
        atol=2e-5, rtol=2e-5)
    got_h = np.asarray(out["last_hidden_state"])
    keep_pos = mask.astype(bool)
    np.testing.assert_allclose(
        got_h[keep_pos], b["expected"]["last_hidden_state"][keep_pos],
        atol=2e-5, rtol=2e-5)

    out_tt = bert.forward(
        b["params"], jnp.asarray(ids), jnp.asarray(mask),
        token_type_ids=jnp.asarray(b["inputs"]["token_type_ids"]), cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(out_tt["pooler_output"]), b["expected"]["pooler_output_tt"],
        atol=2e-5, rtol=2e-5)


def test_detection_matches_frozen_reference(wsi_bundle):
    from keep_tpu.wsi.pipelines import zero_shot_detection

    for name, case in sorted(wsi_bundle["detection"].items()):
        got = zero_shot_detection(
            jnp.asarray(case["cls"]), jnp.asarray(case["feats"]),
            case["coords"], patch_size=int(case["ps"]),
            overlap=bool(case["overlap"]))
        assert got == pytest.approx(float(case["ref_tumor_prob"]),
                                    abs=1e-6), name


def test_segment_refine_matches_frozen_reference(wsi_bundle):
    from keep_tpu.wsi.grid import CoordGrid
    from keep_tpu.wsi.pipelines import refined_tumor_probs

    for name, case in sorted(wsi_bundle["segment_refine"].items()):
        ps = int(case["ps"])
        grid = CoordGrid.from_coords(case["coords"], ps)
        got = np.asarray(refined_tumor_probs(
            jnp.asarray(case["cls"]), jnp.asarray(case["feats"]), grid,
            overlap=bool(case["overlap"])))
        ref = {tuple(xy): v for xy, v in
               zip(case["ref_coords"], case["ref_probs"])}
        kept = grid.kept_coords(case["coords"])
        assert len(got) == len(ref), name
        for (x, y), v in zip(kept, got):
            assert v == pytest.approx(ref[(x, y)], abs=1e-5), name


def test_subtyping_matches_frozen_reference(wsi_bundle):
    from keep_tpu.wsi.pipelines import zero_shot_subtyping

    for name, case in sorted(wsi_bundle["subtyping"].items()):
        label, fractions = zero_shot_subtyping(
            jnp.asarray(case["cls"]), jnp.asarray(case["feats"]),
            case["coords"], patch_size=int(case["ps"]),
            overlap=bool(case["overlap"]))
        assert label == int(case["ref_label"]), name
        np.testing.assert_allclose(fractions, case["ref_fractions"],
                                   atol=1e-6, err_msg=name)


def test_bundle_roundtrip(tmp_path):
    from keep_tpu.utils.golden import (flatten_tree, load_bundle,
                                       save_bundle, unflatten_tree)

    tree = {"a": {"b": np.arange(3), "c": np.float64(1.5)},
            "d": np.ones((2, 2), np.int8)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    p = str(tmp_path / "t.npz")
    save_bundle(p, tree)
    loaded = load_bundle(p)
    np.testing.assert_array_equal(loaded["d"], tree["d"])
    with pytest.raises(ValueError, match="separator"):
        flatten_tree({"x/y": np.zeros(1)})


def test_tokenizer_matches_frozen_hf(tmp_path):
    """WordPiece tokenize + the max_length=256 encode contract vs frozen
    transformers.BertTokenizer outputs (incl. control-char, unicode, and
    fuzz cases) — no transformers import."""
    from keep_tpu.text.tokenizer import WordPieceTokenizer
    from keep_tpu.utils.golden import unpack_strings

    b = _bundle("tokenizer.npz")
    vocab = unpack_strings(b["vocab"])
    texts = unpack_strings(b["texts"])
    expected = [t.split("\x1f") if t else [] for t in
                unpack_strings(b["tokens_joined"])]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(vf), lower_case=True)
    for text, want in zip(texts, expected):
        assert tok.tokenize(text) == want, repr(text)
    enc = tok(texts, max_length=256)
    np.testing.assert_array_equal(np.asarray(enc["input_ids"], np.int32),
                                  b["enc"]["input_ids"])
    np.testing.assert_array_equal(
        np.asarray(enc["attention_mask"], np.int32),
        b["enc"]["attention_mask"])


def test_pack_strings_roundtrip():
    from keep_tpu.utils.golden import pack_strings, unpack_strings

    cases = ["", "plain", "nul\x00byte", "中文", "a" * 300]
    assert unpack_strings(pack_strings(cases)) == cases
    assert unpack_strings(pack_strings([])) == []


def test_selfcheck_replays_all_bundles_and_fails_on_missing(
        monkeypatch, tmp_path, capsys):
    import verify_release

    assert verify_release.run_golden_selfcheck() is True
    out = capsys.readouterr().out
    assert "BERT pooler" in out and "refine" in out and "WordPiece" in out

    # absence is a FAILURE, not a vacuous pass (the bundles ship in git)
    monkeypatch.setattr(verify_release, "__file__",
                        str(tmp_path / "verify_release.py"))
    assert verify_release.run_golden_selfcheck() is False
    assert "missing" in capsys.readouterr().out
