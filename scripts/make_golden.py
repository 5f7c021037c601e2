"""Generate tests/golden/*.npz from the in-image oracles (round 5,
VERDICT #8).

Freezes small (input, expected-output) pairs produced by the LIVE oracles —
the real ``transformers.BertModel`` and the reference's own WSI decision
functions under /root/reference — so the parity contract survives without
torch, transformers, or the reference on disk (tests/test_golden.py,
``verify_release.py --golden``).

Usage: python scripts/make_golden.py [outdir]     (default tests/golden)

Regenerate ONLY when the contract itself legitimately changes; the bundles
are the proof that our towers/rules still match oracles that may no longer
be importable.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keep_tpu.utils.golden import save_bundle

REF = "/root/reference/WSI_evaluation"

# the small-but-structural BERT config shared with tests/test_bert_parity.py
BERT_CFG = dict(
    vocab_size=512, hidden_size=64, num_hidden_layers=3,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=96,
)


def make_bert_bundle(path: str) -> None:
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from keep_tpu.compat.torch_loader import convert_hf_bert
    from keep_tpu.configs import BertConfig

    cfg = BertConfig(**BERT_CFG)
    torch.manual_seed(0)
    hf = BertModel(HFBertConfig(
        **BERT_CFG, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")).eval()
    params = convert_hf_bert(hf.state_dict(), cfg)

    rng = np.random.default_rng(42)
    b, s = 3, 48
    ids = rng.integers(0, cfg.vocab_size, size=(b, s))
    mask = np.zeros((b, s), np.int64)
    for i, ln in enumerate([48, 31, 7]):
        mask[i, :ln] = 1
    ids = ids * mask
    tt = (rng.random((b, s)) > 0.5).astype(np.int64) * mask
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask))
        ref_tt = hf(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    token_type_ids=torch.from_numpy(tt))
    save_bundle(path, {
        "cfg": {k: np.int64(v) for k, v in BERT_CFG.items()},
        "params": params,
        "inputs": {"ids": ids, "mask": mask, "token_type_ids": tt},
        "expected": {
            "pooler_output": ref.pooler_output.numpy(),
            "last_hidden_state": ref.last_hidden_state.numpy(),
            "pooler_output_tt": ref_tt.pooler_output.numpy(),
        },
    })
    print(f"wrote {path}")


TOK_VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] "
    "an h e image of breast invasive carcinoma normal tissue lung adeno "
    "##carcinoma ##oma ##den ##o ##ma a the . , - & ; ( ) "
    "melan cutaneous skin cancer malignant tumor cell grade "
    "##s ##ous ##al ##ic renal clear kidney papillary chromophobe "
    "un ##k ##n ##own xyz 1 2 3 ##1 ##2"
).split()

TOK_TEXTS = [
    "an H&E image of breast invasive carcinoma.",
    "an H&E image of normal tissue.",
    "an H&E image of lung adenocarcinoma.",
    "Malignant melanoma (skin cancer), grade 3; unknown",
    "  weird   spacing\tand\ncontrol\x00chars� here ",
    "café naïve — em-dash and accents",
    "中文 mixed with english",
    "",
    "a" * 250,
    "xyz123 un-k-nown",
]


def make_tokenizer_bundle(path: str) -> None:
    """WordPiece contract (do_lower_case, max_length=256 padding —
    quick_start/keep_inference.py:87,99) frozen from the real
    ``transformers.BertTokenizer`` on the synthetic vocab the parity
    tests use, plus random ASCII fuzz strings."""
    import tempfile

    from transformers import BertTokenizer

    from keep_tpu.utils.golden import pack_strings

    rng = np.random.default_rng(11)
    alphabet = list("abcdefu nko##.x,y z123-&;()\t")
    fuzz = ["".join(rng.choice(alphabet, rng.integers(1, 60)))
            for _ in range(24)]
    texts = TOK_TEXTS + fuzz

    with tempfile.TemporaryDirectory() as td:
        vf = os.path.join(td, "vocab.txt")
        with open(vf, "w") as f:
            f.write("\n".join(TOK_VOCAB) + "\n")
        hf = BertTokenizer(vf, do_lower_case=True)
        tokens = ["\x1f".join(hf.tokenize(t)) for t in texts]
        enc = hf(texts, max_length=256, padding="max_length",
                 truncation=True, return_tensors="np")
    save_bundle(path, {
        "vocab": pack_strings(TOK_VOCAB),
        "texts": pack_strings(texts),
        "tokens_joined": pack_strings(tokens),
        "enc": {"input_ids": enc["input_ids"].astype(np.int32),
                "attention_mask": enc["attention_mask"].astype(np.int32)},
    })
    print(f"wrote {path}")


def _import_reference():
    """Reference WSI modules with their flat-layout imports satisfied
    (mirrors tests/test_wsi_reference_oracle.py's fixture)."""
    import types

    if "openslide" not in sys.modules:
        stub = types.ModuleType("openslide")
        stub.open_slide = None
        sys.modules["openslide"] = stub
    saved = sys.modules.pop("utils", None)
    sys.path.insert(0, REF)
    try:
        import detection_utils
        import segment_utils
        import subtyping_utils
    finally:
        sys.path.remove(REF)
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)
    return detection_utils, segment_utils, subtyping_utils


def make_slide(rng, n, ps, holes=0.35, dup=7, offset=(0, 0), d=24):
    side = int(np.sqrt(n / (1 - holes))) + 2
    cells = [(r, c) for r in range(side) for c in range(side)]
    rng.shuffle(cells)
    cells = cells[:n]
    coords = np.array(
        [(c * ps + offset[0], r * ps + offset[1]) for r, c in cells], np.int64)
    if dup:
        coords = np.concatenate([coords, coords[:dup]], axis=0)
    feats = rng.standard_normal((len(coords), d), dtype=np.float32)
    return coords, feats


def make_wsi_bundle(path: str) -> None:
    import torch

    det, seg, sub = _import_reference()

    def probs_of(feats, cls):
        f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        return torch.softmax(torch.from_numpy(f) @ torch.from_numpy(cls) * 10,
                             dim=1)

    bundle: dict = {"detection": {}, "segment_refine": {}, "subtyping": {}}
    rng = np.random.default_rng(7)

    for i, (ps, overlap, offset) in enumerate([
            (256, False, (0, 0)), (256, True, (0, 0)),
            (224, True, (96, 32)), (224, False, (13, 13))]):
        coords, feats = make_slide(rng, n=260, ps=ps, offset=offset)
        cls = rng.standard_normal((feats.shape[1], 2), dtype=np.float32)
        ref = det.zero_shot_detection(
            torch.from_numpy(cls), torch.from_numpy(feats),
            np.asarray(coords, np.int64), patch_size=ps, overlap=overlap)
        bundle["detection"][f"case{i}"] = {
            "coords": coords, "feats": feats, "cls": cls,
            "ps": np.int64(ps), "overlap": np.bool_(overlap),
            "ref_tumor_prob": np.float64(float(ref)),
        }

    for i, (ps, overlap) in enumerate([(224, True), (256, False)]):
        coords, feats = make_slide(rng, n=220, ps=ps, offset=(ps, 2 * ps))
        cls = rng.standard_normal((feats.shape[1], 2), dtype=np.float32)
        ref_probs = seg.refine_seg(probs_of(feats, cls),
                                   np.asarray(coords, np.int64),
                                   patch_size=ps, overlap=overlap)
        ref_xy = np.array([[int(v) for v in k.split("_")]
                           for k in ref_probs], np.int64)
        bundle["segment_refine"][f"case{i}"] = {
            "coords": coords, "feats": feats, "cls": cls,
            "ps": np.int64(ps), "overlap": np.bool_(overlap),
            "ref_coords": ref_xy,
            "ref_probs": np.array(list(ref_probs.values()), np.float64),
        }

    for i, (ps, overlap, ncls) in enumerate([(256, True, 4), (224, True, 3),
                                             (256, False, 5)]):
        coords, feats = make_slide(rng, n=240, ps=ps)
        cls = rng.standard_normal((feats.shape[1], ncls), dtype=np.float32)
        ref_label = sub.zero_shot_subtyping(
            torch.from_numpy(cls), torch.from_numpy(feats),
            np.asarray(coords, np.int64), patch_size=ps, overlap=overlap)
        ref_preds = sub.refine_seg(probs_of(feats, cls),
                                   np.asarray(coords, np.int64),
                                   patch_size=ps, overlap=overlap)
        vals = np.array(list(ref_preds.values()))
        bundle["subtyping"][f"case{i}"] = {
            "coords": coords, "feats": feats, "cls": cls,
            "ps": np.int64(ps), "overlap": np.bool_(overlap),
            "ncls": np.int64(ncls), "ref_label": np.int64(int(ref_label)),
            "ref_fractions": np.array(
                [(vals == c).mean() for c in range(ncls)], np.float64),
        }

    save_bundle(path, bundle)
    print(f"wrote {path}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden")
    os.makedirs(outdir, exist_ok=True)
    make_bert_bundle(os.path.join(outdir, "bert_small.npz"))
    make_tokenizer_bundle(os.path.join(outdir, "tokenizer.npz"))
    if os.path.isdir(REF):
        make_wsi_bundle(os.path.join(outdir, "wsi_rules.npz"))
    else:
        print("reference absent; skipping wsi_rules.npz")


if __name__ == "__main__":
    main()
