"""Validate keep_tpu against the RELEASED KEEP checkpoint, the moment one
exists on disk (zero-egress image: weights can't be downloaded here).

Given a weights dir (HF layout: config.json + pytorch_model.bin + vocab.txt —
hf.co/Astaxanthin/KEEP), this reproduces the quick_start similarity row
(reference quick_start/keep_inference.py:96-104) and cross-checks the text
tower against the REAL `transformers.BertModel` loaded with the same released
weights (a true oracle — not our own reimplementation).

Usage:
  python verify_release.py --model-dir /path/to/KEEP_release \
      [--image /root/reference/quick_start/example.tif] \
      [--expected "0.39,0.12,0.08"] \
      [--h5 slide.h5 --prompts prompts.json --label '{"Normal":0,"Tumor":1}']

The optional --h5/--prompts leg is a detection SMOKE (well-formed finite
probabilities); reproducing the README AUROC tables needs labeled cohorts
via `python -m keep_tpu.wsi.run detection --cohort-csv ...`.
Exit code 0 = all checks passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _max_len(model) -> int:
    # the release tokenizes at 256 (keep_inference.py:99); never exceed the
    # tower's learned positions (lets this script run on tiny test exports)
    return min(256, model.cfg.text.max_position_embeddings)


def _tower_tol(fp32: bool) -> float:
    # fp32 towers pass at ~1e-5/2e-5; bf16 at ~1e-3 — pick the threshold
    # from the dtype so the 'tightest parity' mode can actually catch a
    # small systematic conversion error
    return 1e-4 if fp32 else 5e-3


def _load_release_sd(model_dir: str):
    """Released state dict as torch tensors, normalized — loaded ONCE
    (the real pytorch_model.bin is ~1.6 GB; both tower checks share it)."""
    import torch

    from keep_tpu.compat.torch_loader import (load_state_dict_file,
                                              normalize_state_dict)

    weights = os.path.join(model_dir, "pytorch_model.bin")
    if not os.path.exists(weights):
        weights = os.path.join(model_dir, "model.safetensors")
    sd = load_state_dict_file(weights)
    sd = {k: (torch.from_numpy(np.asarray(v)) if not hasattr(v, "dim") else v)
          for k, v in sd.items()}
    return normalize_state_dict(sd)


def check_text_tower_vs_transformers(model_dir: str, model, tokenizer,
                                     sd=None, tol: float = 5e-3) -> bool:
    """encode_text parity vs the real HF BertModel on the released weights."""
    try:
        import torch
        from transformers import BertConfig, BertModel
    except ImportError:
        print("[skip] transformers not available — text-tower oracle skipped")
        return True

    from keep_tpu.compat.torch_loader import strip_prefix

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    if sd is None:
        sd = _load_release_sd(model_dir)
    sd = strip_prefix(sd, "text.")
    bert = BertModel(BertConfig(**hf_cfg["text_config"]))
    missing, unexpected = bert.load_state_dict(sd, strict=False)
    real_missing = [k for k in missing if not k.endswith("position_ids")]
    if real_missing or unexpected:
        print(f"[FAIL] BertModel load: missing={real_missing} unexpected={unexpected}")
        return False
    bert.eval()

    texts = ["an H&E image of breast invasive carcinoma.",
             "an H&E image of normal tissue.",
             "an H&E image of lung adenocarcinoma."]
    enc = tokenizer(texts, max_length=_max_len(model))
    with torch.no_grad():
        ref = bert(input_ids=torch.from_numpy(np.asarray(enc["input_ids"])),
                   attention_mask=torch.from_numpy(np.asarray(enc["attention_mask"]))
                   ).pooler_output
        ref = torch.nn.functional.normalize(ref, dim=-1).numpy()
    import jax.numpy as jnp

    got = np.asarray(model.encode_text(jnp.asarray(enc["input_ids"]),
                                       jnp.asarray(enc["attention_mask"])))
    err = np.abs(got - ref).max()
    ok = err < tol
    print(f"[{'ok' if ok else 'FAIL'}] text tower vs real transformers "
          f"BertModel: max abs err {err:.2e} (tol {tol:g})")
    return bool(ok)


def check_visual_tower_vs_torch(model_dir: str, model, rng_seed: int = 0,
                                sd=None, tol: float = 5e-3) -> bool:
    """encode_image parity vs a torch recreation of the released timm
    ViT-L/16 semantics (tests/torch_fixtures.TorchViT — timm-layout names, so
    the released ``visual.*`` weights load strict=True), mirrored after the
    text-tower oracle. timm itself is uninstallable in-image; this is the
    strongest visual-side release check available offline."""
    try:
        import torch
    except ImportError:
        print("[skip] torch not available — visual-tower check skipped")
        return True

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.torch_fixtures import TorchViT

    from keep_tpu.compat.torch_loader import strip_prefix

    if sd is None:
        sd = _load_release_sd(model_dir)

    tvit = TorchViT(model.cfg.vision)
    missing, unexpected = tvit.load_state_dict(
        strip_prefix(sd, "visual."), strict=False)
    if missing or unexpected:
        print(f"[FAIL] TorchViT load: missing={list(missing)} "
              f"unexpected={list(unexpected)}")
        return False
    tvit.eval()

    rng = np.random.default_rng(rng_seed)
    size = model.cfg.vision.img_size
    px = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        trunk = tvit(torch.from_numpy(px.transpose(0, 3, 1, 2)))
        w0 = sd["visual_head.0.weight"]
        b0 = sd["visual_head.0.bias"]
        w2 = sd["visual_head.2.weight"]
        b2 = sd["visual_head.2.bias"]
        head = torch.nn.functional.gelu(trunk @ w0.T + b0) @ w2.T + b2
        ref = torch.nn.functional.normalize(head, dim=-1).numpy()
    import jax.numpy as jnp

    got = np.asarray(model.encode_image(jnp.asarray(px)))
    err = np.abs(got - ref).max()
    ok = err < tol
    print(f"[{'ok' if ok else 'FAIL'}] visual tower vs torch timm-semantics "
          f"recreation: max abs err {err:.2e} (tol {tol:g})")
    return bool(ok)


def run_golden_selfcheck() -> bool:
    """Replay ALL frozen oracle bundles (tests/golden/*.npz) — the same
    checks as tests/test_golden.py, usable without pytest, torch,
    transformers, or /root/reference: the standalone parity self-check
    (VERDICT r05 #8). Every expected bundle is REQUIRED — a missing file
    fails (the bundles ship in git; absence means a packaging error, and
    a vacuous pass here would defeat the self-check's purpose)."""
    import tempfile

    import jax.numpy as jnp

    from keep_tpu.utils.golden import load_bundle, unpack_strings

    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "golden")
    ok = True

    def require(name):
        nonlocal ok
        path = os.path.join(golden, name)
        if not os.path.exists(path):
            print(f"[FAIL] tests/golden/{name} missing "
                  f"(regenerate: scripts/make_golden.py)")
            ok = False
            return None
        return load_bundle(path)

    b = require("bert_small.npz")
    if b is not None:
        from keep_tpu.configs import BertConfig
        from keep_tpu.models import bert

        cfg = BertConfig(**{k: int(v) for k, v in b["cfg"].items()})
        out = bert.forward(b["params"], jnp.asarray(b["inputs"]["ids"]),
                           jnp.asarray(b["inputs"]["mask"]), cfg=cfg)
        err = float(np.abs(np.asarray(out["pooler_output"])
                           - b["expected"]["pooler_output"]).max())
        good = err < 2e-5 + 2e-5 * float(
            np.abs(b["expected"]["pooler_output"]).max())
        print(f"[{'ok' if good else 'FAIL'}] golden BERT pooler vs frozen "
              f"transformers output (max abs err {err:.2e})")
        ok &= good

    w = require("wsi_rules.npz")
    if w is not None:
        from keep_tpu.wsi.grid import CoordGrid
        from keep_tpu.wsi.pipelines import (refined_tumor_probs,
                                            zero_shot_detection,
                                            zero_shot_subtyping)

        good = True
        for name, case in sorted(w["detection"].items()):
            got = zero_shot_detection(
                jnp.asarray(case["cls"]), jnp.asarray(case["feats"]),
                case["coords"], patch_size=int(case["ps"]),
                overlap=bool(case["overlap"]))
            good &= abs(got - float(case["ref_tumor_prob"])) < 1e-6
        for name, case in sorted(w["segment_refine"].items()):
            grid = CoordGrid.from_coords(case["coords"], int(case["ps"]))
            got = np.asarray(refined_tumor_probs(
                jnp.asarray(case["cls"]), jnp.asarray(case["feats"]), grid,
                overlap=bool(case["overlap"])))
            ref = {tuple(xy): v for xy, v in
                   zip(case["ref_coords"], case["ref_probs"])}
            kept = grid.kept_coords(case["coords"])
            good &= len(got) == len(ref) and all(
                abs(v - ref[(x, y)]) < 1e-5
                for (x, y), v in zip(kept, got))
        for name, case in sorted(w["subtyping"].items()):
            label, fr = zero_shot_subtyping(
                jnp.asarray(case["cls"]), jnp.asarray(case["feats"]),
                case["coords"], patch_size=int(case["ps"]),
                overlap=bool(case["overlap"]))
            good &= (label == int(case["ref_label"])
                     and np.allclose(fr, case["ref_fractions"], atol=1e-6))
        print(f"[{'ok' if good else 'FAIL'}] golden WSI decision rules vs "
              f"frozen reference outputs "
              f"({len(w['detection'])} detection + "
              f"{len(w['segment_refine'])} refine + "
              f"{len(w['subtyping'])} subtyping cases)")
        ok &= good

    t = require("tokenizer.npz")
    if t is not None:
        from keep_tpu.text.tokenizer import WordPieceTokenizer

        texts = unpack_strings(t["texts"])
        expected = [s.split("\x1f") if s else []
                    for s in unpack_strings(t["tokens_joined"])]
        with tempfile.TemporaryDirectory() as td:
            vf = os.path.join(td, "vocab.txt")
            with open(vf, "w") as f:
                f.write("\n".join(unpack_strings(t["vocab"])) + "\n")
            tok = WordPieceTokenizer(vf, lower_case=True)
            good = all(tok.tokenize(s) == want
                       for s, want in zip(texts, expected))
            enc = tok(texts, max_length=256)
            good &= bool(
                np.array_equal(np.asarray(enc["input_ids"], np.int32),
                               t["enc"]["input_ids"])
                and np.array_equal(
                    np.asarray(enc["attention_mask"], np.int32),
                    t["enc"]["attention_mask"]))
        print(f"[{'ok' if good else 'FAIL'}] golden WordPiece tokenize + "
              f"256-pad encode vs frozen transformers outputs "
              f"({len(texts)} texts)")
        ok &= good
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir",
                    help="released-checkpoint dir (required unless --golden)")
    ap.add_argument("--golden", action="store_true",
                    help="replay the frozen golden-vector bundles "
                         "(tests/golden/) — no weights, torch, or reference "
                         "needed; combine with --model-dir to also run the "
                         "release checks")
    ap.add_argument("--image",
                    default="/root/reference/quick_start/example.tif")
    ap.add_argument("--expected",
                    help="comma-separated expected similarity row to compare")
    ap.add_argument("--tol", type=float, default=2e-2)
    ap.add_argument("--h5", help="CLAM h5 slide for a WSI detection check")
    ap.add_argument("--prompts", help="prompt JSON for the WSI check")
    ap.add_argument("--label", default='{"Normal": 0, "Tumor": 1}')
    ap.add_argument("--fp32", action="store_true",
                    help="run towers in fp32 (tightest parity)")
    args = ap.parse_args(argv)

    golden_ok = True
    if args.golden:
        golden_ok = run_golden_selfcheck()
        if not args.model_dir:
            return 0 if golden_ok else 1
    elif not args.model_dir:
        ap.error("--model-dir is required (or pass --golden)")

    import jax.numpy as jnp

    from keep_tpu.factory import get_tokenizer
    from keep_tpu.models.keep import KEEPModel
    from keep_tpu.ops.preprocess import preprocess

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = KEEPModel.from_pretrained(args.model_dir, dtype=dtype)
    tokenizer = get_tokenizer("bert", args.model_dir)
    ok = True

    # 1) quick_start similarity row (keep_inference.py:96-104)
    if os.path.exists(args.image):
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"))
        pixels = preprocess(img)
        texts = ["an H&E image of breast invasive carcinoma.",
                 "an H&E image of normal tissue.",
                 "an H&E image of lung adenocarcinoma."]
        enc = tokenizer(texts, max_length=_max_len(model))
        img_f = model.encode_image(pixels)
        txt_f = model.encode_text(jnp.asarray(enc["input_ids"]),
                                  jnp.asarray(enc["attention_mask"]))
        row = np.asarray(img_f @ txt_f.T)[0]
        print(f"[info] similarity row: {row.tolist()}")
        if args.expected:
            want = np.array([float(v) for v in args.expected.split(",")])
            err = np.abs(row - want).max()
            good = err < args.tol
            ok &= good
            print(f"[{'ok' if good else 'FAIL'}] vs expected row: "
                  f"max abs err {err:.3e} (tol {args.tol})")
    else:
        print(f"[skip] image {args.image} not found")

    # 2) both tower oracles share ONE read of the released weights and a
    # dtype-scaled tolerance (fp32 mode must catch small systematic errors)
    tol = _tower_tol(args.fp32)
    try:
        sd = _load_release_sd(args.model_dir)
    except ImportError:
        sd = None  # torch absent: the checks print their own [skip]
    ok &= check_text_tower_vs_transformers(args.model_dir, model, tokenizer,
                                           sd=sd, tol=tol)
    ok &= check_visual_tower_vs_torch(args.model_dir, model, sd=sd, tol=tol)

    # 3) optional WSI detection smoke on a real slide: classifier build →
    # prompt screening → scoring must produce finite, well-formed
    # probabilities (per-patch GT isn't shipped, so no AUROC here — the
    # quality tables need the cohort CLI with labels); this check GATES
    if args.h5 and args.prompts:
        import h5py

        from keep_tpu.wsi.pipelines import score_tiles
        from keep_tpu.zeroshot.classifier import (
            build_classifiers_batched, prompt_select)

        with h5py.File(args.h5) as f:
            feats = np.asarray(f["features"])
        with open(args.prompts) as f:
            prompts = json.load(f)
        cls_stack = build_classifiers_batched(
            lambda ids, mask: model.encode_text(jnp.asarray(ids),
                                                jnp.asarray(mask)),
            tokenizer, prompts,
            json.loads(args.label), first_template_only=True)
        merged = prompt_select(cls_stack, jnp.asarray(feats))
        probs = np.asarray(score_tiles(merged, jnp.asarray(feats)))
        frac = float((probs[:, 1] > 0.5).mean())
        good = (probs.shape == (len(feats), len(json.loads(args.label)))
                and np.isfinite(probs).all()
                and float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
                and abs(float(probs.sum(1).mean()) - 1.0) < 1e-3)
        ok &= good
        print(f"[{'ok' if good else 'FAIL'}] WSI detection smoke: "
              f"probs {probs.shape} finite, rows sum to 1; "
              f"tumor fraction (thr 0.5) {frac:.4f}")

    ok &= golden_ok
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
