#!/usr/bin/env python3
"""One-command end-to-end validation of every user-facing surface —
the release 'grand drive' (run it on CPU for a smoke pass, on the TPU
chip for real-hardware validation; mirrors the reference's runnable-
example test strategy, SURVEY §4).

    python scripts/grand_drive.py [--workdir DIR] [--full] [--int8]

Builds a synthetic-but-complete workspace (HF-layout model dir, prompt
JSON, pyramidal .svs slide, training corpus), then drives, in order:
pyramid write/read → tile extraction (wsi.run extract) → zero-shot
detection / segmentation / subtyping CLIs → cohort sweep → the batching
HTTP server (real requests over a socket) → the training CLI (fresh run
+ resume-latest). Each step is timed and the script exits nonzero if any
step fails. ``--full`` swaps in the real ViT-L/16+BERT-base KEEP config
(slow first compiles — minutes through the relay); default is a tiny
config that finishes in ~2 min on CPU.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import tempfile
import threading
import time
import traceback
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS: list[tuple[str, float, str]] = []
_PATCH = [32]  # set from the model's img_size in main()


def step(name):
    def deco(fn):
        def run(*a, **kw):
            t0 = time.time()
            try:
                out = fn(*a, **kw)
                RESULTS.append((name, time.time() - t0, "ok"))
                print(f"[ok]   {name} ({time.time() - t0:.1f}s)", flush=True)
                return out
            except Exception:
                RESULTS.append((name, time.time() - t0, "FAIL"))
                print(f"[FAIL] {name}", flush=True)
                traceback.print_exc()
                # swallow: later independent steps still run, the summary
                # table always prints, and main exits 1 via RESULTS
                return None
        return run
    return deco


def tiny_cfg():
    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig

    return KEEPConfig(
        vision=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                         num_heads=2),
        text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=64),
        projection_dim=32,
    )


VOCAB = ("[PAD] [UNK] [CLS] [SEP] [MASK] normal tissue tumor melanoma "
         "cutaneous skin cancer malignant an image of h&e .".split())


@step("build workspace (model dir, prompts, slide, train corpus)")
def build_workspace(d: str, full: bool):
    import jax
    from keep_tpu.compat.export import save_pretrained
    from keep_tpu.configs import KEEPConfig
    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.models import keep

    cfg = KEEPConfig() if full else tiny_cfg()
    params = keep.init(jax.random.PRNGKey(0), cfg)
    save_pretrained(os.path.join(d, "model"), params, cfg)
    if full:
        # the real release ships the PubMedBERT vocab; synthesize a filler
        vocab = VOCAB + [f"tok{i}" for i in range(cfg.text.vocab_size - len(VOCAB))]
    else:
        vocab = VOCAB[: cfg.text.vocab_size]
    with open(os.path.join(d, "model", "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))

    prompts = {
        str(i): {"classnames": {"Normal": "normal tissue", "Tumor": t},
                 "templates": "an h&e image of CLASSNAME."}
        for i, t in enumerate(
            ["cutaneous melanoma", "skin cancer", "malignant melanoma",
             "tumor tissue"])
    }
    with open(os.path.join(d, "prompts.json"), "w") as f:
        json.dump(prompts, f)

    # synthetic pyramidal slide: tissue blobs on a white background, big
    # enough for several tiles at the model's native size
    rng = np.random.default_rng(0)
    ts = cfg.vision.img_size
    side = ts * 6
    img = np.full((side, side, 3), 245, np.uint8)
    for _ in range(12):
        y, x = rng.integers(0, side - ts, 2)
        img[y:y + ts, x:x + ts] = rng.integers(60, 200, (ts, ts, 3))
    write_pyramid(os.path.join(d, "slide.svs"), img, tile=ts, min_size=ts * 2)

    # training corpus: tiny PNGs + semantic groups + knowledge graph
    from PIL import Image

    img_dir = os.path.join(d, "images")
    os.makedirs(img_dir, exist_ok=True)
    names = []
    for i in range(8):
        n = f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (ts, ts, 3), dtype=np.uint8)
                        ).save(os.path.join(img_dir, n))
        names.append(n)
    groups = {
        "g_mel": {"captions": ["cutaneous melanoma .",
                               "malignant melanoma ."],
                  "images": names[:4], "labels": {"DOID:mel": 1}},
        "g_norm": {"captions": ["normal tissue .", "normal skin tissue ."],
                   "images": names[4:], "labels": {}},
    }
    with open(os.path.join(d, "groups.json"), "w") as f:
        json.dump(groups, f)
    kg = {"DOID:mel": {"name": "melanoma", "parent": []},
          "DOID:norm": {"name": "normal", "parent": []}}
    with open(os.path.join(d, "kg.json"), "w") as f:
        json.dump(kg, f)
    cfg_yml = f"""
dataset:
  train_data: {d}/groups.json
  img_dir: {d}/images
  knowledge_file: {d}/kg.json
  vocab_path: {d}/model
dataloader:
  batch_size: 8
  caption_num: 4
  workers: 1
solver:
  epochs: 1
  lr: 1.0e-3
  warmup: 2
  lr_scheduler: const
  freeze_visual_epochs: 0
  freeze_text_epochs: 0
  zeroshot_frequency: 0
model:
  precision: fp32
  type: hierarchy_metric
  use_flash: false
save:
  output_dir: {d}/train_out
  experiment_name: drive
  save_frequency: 1
"""
    if full:
        cfg_yml += "keep: {}\n"
    else:
        cfg_yml += (
            "keep:\n"
            "  projection_dim: 32\n"
            "  max_text_length: 16\n"
            "  vision: {img_size: 32, patch_size: 16, embed_dim: 32, "
            "depth: 2, num_heads: 2}\n"
            "  text: {vocab_size: %d, hidden_size: 32, num_hidden_layers: 2, "
            "num_attention_heads: 2, intermediate_size: 64, "
            "max_position_embeddings: 64}\n" % len(vocab))
    with open(os.path.join(d, "cfg.yml"), "w") as f:
        f.write(cfg_yml)
    return cfg


def run_wsi(argv) -> str:
    from keep_tpu.wsi import run as wsi_run

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        wsi_run.main(argv)
    out = buf.getvalue()
    print("       " + out.strip().replace("\n", "\n       "))
    return out


@step("extract: pyramid slide -> tissue tiles -> features h5")
def drive_extract(d, int8, patch: int):
    argv = ["extract", "--model", f"{d}/model", "--image", f"{d}/slide.svs",
            "--out", f"{d}/slide.h5", "--batch-size", "8",
            "--patch-size", str(patch)]
    if int8:
        argv.append("--int8")
    run_wsi(argv)
    import h5py

    with h5py.File(f"{d}/slide.h5") as f:
        n, dim = f["features"].shape
        assert n >= 4 and np.isfinite(f["features"][:]).all()
    print(f"       {n} tiles x {dim} dims")


def EVAL_FLAGS():
    return ["--text-batch-size", "8", "--max-length", "16", "--topn", "2",
            "--patch-size", str(_PATCH[0])]


@step("zero-shot detection CLI")
def drive_detection(d, int8):
    argv = ["detection", "--model", f"{d}/model", "--prompts",
            f"{d}/prompts.json", "--h5", f"{d}/slide.h5"] + EVAL_FLAGS()
    if int8:
        argv.append("--int8")
    out = run_wsi(argv)
    assert "prob" in out.lower() or "tumor" in out.lower()


@step("zero-shot segmentation CLI (synthetic mask)")
def drive_segmentation(d):
    import h5py

    with h5py.File(f"{d}/slide.h5") as f:
        coords = f["coords"][:]
    side = int(coords.max()) + 64
    mask = np.zeros((side, side), np.uint8)
    mask[: side // 2] = 1
    np.save(f"{d}/mask.npy", mask)
    out = run_wsi(["segmentation", "--model", f"{d}/model", "--prompts",
                   f"{d}/prompts.json", "--h5", f"{d}/slide.h5",
                   "--mask", f"{d}/mask.npy"] + EVAL_FLAGS())
    assert "dice" in out.lower()


@step("zero-shot subtyping CLI")
def drive_subtyping(d):
    out = run_wsi(["subtyping", "--model", f"{d}/model", "--prompts",
                   f"{d}/prompts.json", "--h5", f"{d}/slide.h5",
                   "--no-screening"] + EVAL_FLAGS())
    assert "subtype" in out.lower() or "prob" in out.lower()


@step("cohort: slide-dir extraction -> cohort detection")
def drive_cohort(d):
    import shutil

    src = os.path.join(d, "cohort_src")
    os.makedirs(src, exist_ok=True)
    for sid in ("case_t", "case_n"):
        shutil.copy(f"{d}/slide.svs", f"{src}/{sid}.svs")
    run_wsi(["extract", "--model", f"{d}/model", "--slide-dir", src,
             "--out-dir", f"{d}/cohort", "--batch-size", "8",
             "--patch-size", str(_PATCH[0])])
    with open(f"{d}/cohort/cohort.csv", "w") as f:
        f.write("slide_id,Diagnosis\ncase_t,Tumor\ncase_n,Normal\n")
    out = run_wsi(["detection", "--model", f"{d}/model", "--prompts",
                   f"{d}/prompts.json", "--cohort-csv", f"{d}/cohort/cohort.csv",
                   "--data-source", f"{d}/cohort"] + EVAL_FLAGS())
    assert "auroc" in out.lower() or '"n"' in out


@step("serving: HTTP server answers encode_text + similarity")
def drive_serve(d, cfg):
    import jax.numpy as jnp
    from keep_tpu import serve
    from keep_tpu.models.keep import KEEPModel
    from keep_tpu.text.tokenizer import WordPieceTokenizer

    model = KEEPModel.from_pretrained(f"{d}/model", dtype=jnp.float32)
    tok = WordPieceTokenizer.from_pretrained(f"{d}/model")
    core = serve.InferenceServer(model, tok, max_length=16,
                                 image_size=cfg.vision.img_size,
                                 buckets=(2, 4))
    httpd = serve.make_http_server(core, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        out = post("/encode_text", {"texts": ["melanoma .", "normal tissue ."]})
        assert len(out["embeddings"]) == 2
        img = np.random.default_rng(0).integers(
            0, 255, (1, cfg.vision.img_size, cfg.vision.img_size, 3)).tolist()
        out = post("/similarity",
                   {"images": img, "texts": ["melanoma .", "normal tissue ."]})
        assert len(out["logits"]) == 1 and len(out["logits"][0]) == 2
        print(f"       similarity row: {out['logits'][0]}")
    finally:
        httpd.shutdown()
        core.stop()  # release the serve model before the training steps
        del core, model


@step("training CLI: 1 epoch + resume-latest")
def drive_train(d):
    from keep_tpu.train.main import main as train_main

    train_main(["--config", f"{d}/cfg.yml"])
    ck = f"{d}/train_out/drive/checkpoints"
    assert os.path.exists(f"{ck}/results.jsonl")
    # resume from the saved checkpoint with a 2-epoch config
    cfg2 = open(f"{d}/cfg.yml").read().replace("epochs: 1", "epochs: 2")
    with open(f"{d}/cfg2.yml", "w") as f:
        f.write(cfg2)
    train_main(["--config", f"{d}/cfg2.yml", "--resume", "latest"])
    lines = open(f"{ck}/results.jsonl").read().splitlines()
    assert len(lines) >= 2
    print(f"       {len(lines)} result lines; last: {lines[-1][:100]}")


@step("training CLI: LoRA fine-tune (solver.lora_rank)")
def drive_train_lora(d):
    from keep_tpu.train.main import main as train_main

    cfg_l = (open(f"{d}/cfg.yml").read()
             .replace("train_out", "train_lora_out")
             .replace("solver:", "solver:\n  lora_rank: 2\n  lora_alpha: 4.0"))
    with open(f"{d}/cfg_lora.yml", "w") as f:
        f.write(cfg_l)
    train_main(["--config", f"{d}/cfg_lora.yml"])
    ck = f"{d}/train_lora_out/drive/checkpoints"
    assert os.path.exists(f"{ck}/results.jsonl")
    # the checkpoint is the ADAPTER tree — prove it merges + encodes
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keep_tpu.models import keep
    from keep_tpu.train import checkpoint as ckpt, lora
    from keep_tpu.train.config import TrainRunConfig
    from keep_tpu.train.main import build_params

    run_cfg = TrainRunConfig.from_yaml(f"{d}/cfg_lora.yml")
    restored = ckpt.restore(ck)
    base = build_params(run_cfg, run_cfg.seed)
    merged = lora.merge_lora(
        base, jax.tree.map(jnp.asarray, restored["params"]),
        scale=run_cfg.solver.lora_alpha / run_cfg.solver.lora_rank)
    size = run_cfg.keep.vision.img_size
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, size, size, 3)), jnp.float32)
    feats = keep.encode_image(merged, x, run_cfg.keep, dtype=jnp.float32)
    assert np.isfinite(np.asarray(feats)).all()
    print(f"       adapter ckpt merged + encoded: feats {feats.shape}")


@step("golden self-check: frozen oracle bundles replay (verify_release --golden)")
def drive_golden():
    import runpy

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    saved = sys.argv
    sys.argv = ["verify_release.py", "--golden"]
    try:
        runpy.run_path(os.path.join(root, "verify_release.py"),
                       run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            raise AssertionError(f"golden self-check failed (exit {e.code})")
    finally:
        sys.argv = saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None,
                    help="workspace dir (default: a fresh temp dir)")
    ap.add_argument("--full", action="store_true",
                    help="real ViT-L/16 + BERT-base (slow compiles)")
    ap.add_argument("--int8", action="store_true",
                    help="drive the int8 path in extract/detection (TPU)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin JAX to CPU (the axon sitecustomize ignores "
                    "JAX_PLATFORMS; this sets jax.config before backend init)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    d = args.workdir or tempfile.mkdtemp(prefix="grand_drive_")
    os.makedirs(d, exist_ok=True)
    print(f"workspace: {d}")
    t0 = time.time()
    cfg = build_workspace(d, args.full)
    if cfg is not None:  # everything downstream needs the workspace
        _PATCH[0] = cfg.vision.img_size
        drive_extract(d, args.int8, cfg.vision.img_size)
        drive_detection(d, args.int8)
        drive_segmentation(d)
        drive_subtyping(d)
        drive_cohort(d)
        drive_serve(d, cfg)
        drive_train(d)
        drive_train_lora(d)
    drive_golden()

    print(f"\n=== grand drive: {len(RESULTS)} steps, "
          f"{sum(1 for *_, s in RESULTS if s == 'ok')} ok, "
          f"{time.time() - t0:.0f}s total ===")
    for name, dt, status in RESULTS:
        print(f"  {status:4s} {dt:7.1f}s  {name}")
    sys.exit(0 if all(s == "ok" for *_, s in RESULTS) else 1)


if __name__ == "__main__":
    main()
