"""End-to-end CLI regressions: the WSI driver and the training entrypoint
run against on-disk fixtures (model dir, prompts, h5 slide, groups JSON)."""

import json
import os

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.compat.export import save_pretrained
from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.models import keep

TINY = KEEPConfig(
    vision=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                     num_heads=2),
    text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=64),
    projection_dim=32,
)

VOCAB = "[PAD] [UNK] [CLS] [SEP] [MASK] normal tissue tumor melanoma cutaneous skin cancer malignant .".split()


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clidrive")
    params = keep.init(jax.random.PRNGKey(0), TINY)
    save_pretrained(str(d / "model"), params, TINY)
    (d / "model" / "vocab.txt").write_text("\n".join(VOCAB))
    prompts = {
        str(i): {"classnames": {"Normal": "normal tissue", "Tumor": t},
                 "templates": "CLASSNAME."}
        for i, t in enumerate(
            ["cutaneous melanoma", "skin cancer", "malignant melanoma",
             "tumor tissue"]
        )
    }
    json.dump(prompts, open(d / "prompts.json", "w"))
    rng = np.random.default_rng(0)
    side = 10
    with h5py.File(d / "slide.h5", "w") as f:
        f.create_dataset("features",
                         data=rng.standard_normal((100, 32)).astype(np.float32))
        f.create_dataset(
            "coords",
            data=np.array([((i % side) * 256, (i // side) * 256)
                           for i in range(100)], np.int64),
        )
    return d


def test_wsi_cli_detection(model_dir, capsys):
    from keep_tpu.wsi.run import main

    main([
        "detection", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--h5", str(model_dir / "slide.h5"),
        "--text-batch-size", "8", "--max-length", "32", "--topn", "3",
    ])
    out = capsys.readouterr().out
    assert "Tumor probability:" in out
    prob = float(out.strip().split()[-1])
    assert 0.0 <= prob <= 1.0


def test_wsi_cli_detection_heatmap(model_dir, capsys, tmp_path):
    from PIL import Image

    from keep_tpu.wsi.run import main

    png = tmp_path / "hm.png"
    main([
        "detection", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--h5", str(model_dir / "slide.h5"),
        "--text-batch-size", "8", "--max-length", "32", "--topn", "3",
        "--heatmap-out", str(png),
    ])
    out = capsys.readouterr().out
    assert "Heatmap" in out and png.exists()
    img = np.asarray(Image.open(png))
    # 100 patches on a 10-wide grid at 256px -> 16px cells
    assert img.shape == (10 * 16, 10 * 16) and img.dtype == np.uint8


def test_wsi_cli_subtyping_no_screening(model_dir, capsys):
    from keep_tpu.wsi.run import main

    main([
        "subtyping", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--h5", str(model_dir / "slide.h5"),
        "--text-batch-size", "8", "--max-length", "32", "--topn", "2",
        "--no-screening", "--label-map", '{"Tumor": 0}',
    ])
    out = capsys.readouterr().out
    assert "Predicted subtype:" in out


def test_wsi_cli_cohort_detection(model_dir, tmp_path, capsys):
    import shutil

    import pandas as pd

    from keep_tpu.wsi.run import main

    src = tmp_path / "cohort"
    (src / "h5_files").mkdir(parents=True)
    for sid in ("s0", "s1"):
        shutil.copy(model_dir / "slide.h5", src / "h5_files" / f"{sid}.h5")
    pd.DataFrame(
        {"slide_id": ["s0", "s1"], "Diagnosis": ["Normal", "Tumor"]}
    ).to_csv(src / "cohort.csv", index=False)
    main([
        "detection", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--cohort-csv", str(src / "cohort.csv"),
        "--data-source", str(src),
        "--text-batch-size", "8", "--max-length", "32", "--topn", "2",
    ])
    out = capsys.readouterr().out
    rec = json.loads(out[out.index("{"):])
    assert rec["n"] == 2


def test_wsi_cli_segmentation(model_dir, tmp_path, capsys):
    from keep_tpu.wsi.run import main

    # level-0 mask covering the left half of the 10x10x256 slide grid
    mask = np.zeros((10 * 256, 10 * 256), np.uint8)
    mask[:, : 5 * 256] = 255
    np.save(tmp_path / "mask.npy", mask)
    main([
        "segmentation", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--h5", str(model_dir / "slide.h5"),
        "--mask", str(tmp_path / "mask.npy"),
        "--text-batch-size", "8", "--max-length", "32", "--topn", "2",
        "--patch-size", "256",
    ])
    out = capsys.readouterr().out
    assert "AUROC:" in out and "Dice:" in out


def test_wsi_cli_cohort_segmentation(model_dir, tmp_path, capsys):
    import shutil

    import pandas as pd

    from keep_tpu.wsi.run import main

    src = tmp_path / "segcohort"
    (src / "h5_files").mkdir(parents=True)
    (src / "masks").mkdir()
    mask = np.zeros((10 * 256, 10 * 256), np.uint8)
    mask[:, : 5 * 256] = 255
    for sid in ("a", "b"):
        shutil.copy(model_dir / "slide.h5", src / "h5_files" / f"{sid}.h5")
        np.save(src / "masks" / f"{sid}.npy", mask)
    pd.DataFrame({"slide_id": ["a", "b"], "Diagnosis": ["Tumor", "Tumor"]}
                 ).to_csv(src / "cohort.csv", index=False)
    main([
        "segmentation", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--cohort-csv", str(src / "cohort.csv"),
        "--data-source", str(src),
        "--mask-dir", str(src / "masks"),
        "--text-batch-size", "8", "--max-length", "32", "--topn", "2",
        "--patch-size", "256",
    ])
    out = capsys.readouterr().out
    rec = json.loads(out[out.index("{"):])
    assert rec["n"] == 2 and "mean_dice" in rec


def test_wsi_cli_segmentation_tiff_mask(model_dir, tmp_path, capsys):
    """--mask as a pyramidal TIFF slide path: with no OpenSlide in the
    image, the native libtiff GT branch engages and must reproduce the
    .npy-mask numbers exactly (the pyramid's 16x level IS the [::16, ::16]
    emulation when boundaries align)."""
    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.wsi.run import main

    mask = np.zeros((10 * 256, 10 * 256), np.uint8)
    mask[:, : 5 * 256] = 255
    np.save(tmp_path / "mask.npy", mask)
    write_pyramid(str(tmp_path / "mask.tif"),
                  np.repeat(mask[..., None], 3, axis=2), tile=256)

    outs = []
    for m in ("mask.npy", "mask.tif"):
        main([
            "segmentation", "--model", str(model_dir / "model"),
            "--prompts", str(model_dir / "prompts.json"),
            "--h5", str(model_dir / "slide.h5"),
            "--mask", str(tmp_path / m),
            "--text-batch-size", "8", "--max-length", "32", "--topn", "2",
            "--patch-size", "256",
        ])
        outs.append(capsys.readouterr().out)
    assert "AUROC:" in outs[0] and "Dice:" in outs[0]
    assert outs[0] == outs[1]


def test_wsi_cli_extract_pyramid(model_dir, tmp_path, capsys):
    """extract on a pyramidal .tif streams through the native reader and
    produces the same h5 as the flat-PNG path on the same level-0 image."""
    from PIL import Image

    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.wsi.run import main as run_main

    rng = np.random.default_rng(3)
    img = np.full((200, 200, 3), 250, np.uint8)
    img[40:160, 40:160] = rng.integers(80, 200, (120, 120, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "slide.png")
    write_pyramid(str(tmp_path / "slide.tif"), img, tile=32, min_size=64)

    h5s = {}
    for name in ("slide.png", "slide.tif"):
        out = tmp_path / f"{name}.h5"
        run_main([
            "extract", "--model", str(model_dir / "model"),
            "--image", str(tmp_path / name), "--out", str(out),
            "--patch-size", "32", "--batch-size", "8",
        ])
        assert "wrote" in capsys.readouterr().out
        with h5py.File(out) as f:
            h5s[name] = (f["features"][:], f["coords"][:])

    feats_png, coords_png = h5s["slide.png"]
    feats_tif, coords_tif = h5s["slide.tif"]
    assert len(feats_tif) > 0
    # same tiles (thumbnail-scale==1 here so selection is identical) and
    # identical features
    np.testing.assert_array_equal(coords_png, coords_tif)
    np.testing.assert_allclose(feats_png, feats_tif, atol=1e-5)


def test_wsi_cli_extract_slide_dir(model_dir, tmp_path, capsys):
    """Cohort extraction: --slide-dir with a mixed bag (pyramidal .tif +
    flat .png) → out-dir/h5_files/<stem>.h5 each, then the detection
    cohort driver runs straight off that tree."""
    import pandas as pd
    from PIL import Image

    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.wsi.run import main as run_main

    rng = np.random.default_rng(9)
    slides = tmp_path / "slides"
    slides.mkdir()
    img = np.full((200, 200, 3), 250, np.uint8)
    img[40:160, 40:160] = rng.integers(80, 200, (120, 120, 3)).astype(np.uint8)
    write_pyramid(str(slides / "case_a.tif"), img, tile=32, min_size=64)
    Image.fromarray(img).save(slides / "case_b.png")
    (slides / "notes.txt").write_text("not a slide")

    out_root = tmp_path / "extracted"
    run_main([
        "extract", "--model", str(model_dir / "model"),
        "--slide-dir", str(slides), "--out-dir", str(out_root),
        "--patch-size", "32", "--batch-size", "8",
    ])
    assert "across 2 slides" in capsys.readouterr().out
    a = out_root / "h5_files" / "case_a.h5"
    b = out_root / "h5_files" / "case_b.h5"
    with h5py.File(a) as fa, h5py.File(b) as fb:
        # same image through both paths -> same features
        np.testing.assert_array_equal(fa["coords"][:], fb["coords"][:])
        np.testing.assert_allclose(fa["features"][:], fb["features"][:],
                                   atol=1e-5)

    pd.DataFrame({"slide_id": ["case_a", "case_b"],
                  "Diagnosis": ["Tumor", "Tumor"]}
                 ).to_csv(tmp_path / "cohort.csv", index=False)
    run_main([
        "detection", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--cohort-csv", str(tmp_path / "cohort.csv"),
        "--data-source", str(out_root), "--patch-size", "32",
        "--max-length", "16", "--no-screening",
    ])
    out = capsys.readouterr().out
    rec = json.loads(out[out.index("{"):])
    assert rec["n"] == 2


def test_wsi_cli_int8(model_dir, capsys):
    from keep_tpu.wsi.run import main

    main([
        "detection", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--h5", str(model_dir / "slide.h5"),
        "--text-batch-size", "8", "--max-length", "32", "--topn", "2",
        "--int8",
    ])
    out = capsys.readouterr().out
    assert "Tumor probability:" in out


def test_wsi_cli_extract_then_detect(model_dir, tmp_path, capsys):
    from keep_tpu.wsi.run import main as run_main
    """pixels → tissue tiles → features h5 → detection, all through the CLI
    (the CLAM feature-extraction step the reference outsources,
    README.md:74)."""
    from PIL import Image

    rng = np.random.default_rng(1)
    img = np.full((200, 200, 3), 250, np.uint8)  # white background
    img[40:160, 40:160] = rng.integers(80, 200, (120, 120, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "slide.png")

    out_h5 = tmp_path / "extracted.h5"
    run_main([
        "extract", "--model", str(model_dir / "model"),
        "--image", str(tmp_path / "slide.png"), "--out", str(out_h5),
        "--patch-size", "32", "--batch-size", "8",
    ])
    assert "wrote" in capsys.readouterr().out
    with h5py.File(out_h5) as f:
        n = f["features"].shape[0]
        assert n > 0 and f["features"].shape[1] == 32
        assert f["coords"].shape == (n, 2)

    run_main([
        "detection", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--h5", str(out_h5), "--patch-size", "32",
        "--max-length", "16", "--no-screening",
    ])
    assert "Tumor probability" in capsys.readouterr().out


def test_wsi_cli_extract_requires_args(model_dir):
    from keep_tpu.wsi.run import main as run_main
    with pytest.raises(SystemExit):
        run_main(["extract", "--model", str(model_dir / "model")])
    with pytest.raises(SystemExit):  # eval tasks still require --prompts
        run_main(["detection", "--model", str(model_dir / "model"),
                  "--h5", "x.h5"])


def test_verify_release_runs(model_dir, capsys):
    """verify_release.py must execute end-to-end on any exported model dir
    (it previously shipped with a dead encode_text_ids call): text tower
    cross-checked against the REAL transformers BertModel."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from verify_release import main as vr_main

    rc = vr_main(["--model-dir", str(model_dir / "model"), "--fp32",
                  "--image", "/nonexistent.tif"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "text tower vs real transformers" in out
    assert "visual tower vs torch" in out  # round-3 visual-side release check
    assert "tol 0.0001" in out  # --fp32 tightens the tower tolerance
    assert "PASS" in out

    # the optional WSI leg is a GATING smoke (finite well-formed probs)
    rc = vr_main(["--model-dir", str(model_dir / "model"), "--fp32",
                  "--image", "/nonexistent.tif",
                  "--h5", str(model_dir / "slide.h5"),
                  "--prompts", str(model_dir / "prompts.json")])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[ok] WSI detection smoke" in out


def test_wsi_cli_segmentation_requires_mask(model_dir):
    from keep_tpu.wsi.run import main

    with pytest.raises(SystemExit):
        main([
            "segmentation", "--model", str(model_dir / "model"),
            "--prompts", str(model_dir / "prompts.json"),
            "--h5", str(model_dir / "slide.h5"),
            "--text-batch-size", "8", "--max-length", "32", "--topn", "3",
        ])


def test_wsi_cli_cascade_detection(model_dir, tmp_path, capsys):
    """detection --image runs the coarse-to-fine cascade straight off the
    pyramid; --patch-size 64 != the 32px tower exercises the resize leg."""
    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.wsi.run import main

    g = np.random.default_rng(1)
    side = 512
    base = np.broadcast_to(np.array([210.0, 140.0, 180.0]), (side, side, 3))
    img = np.clip(base + g.normal(0, 12, (side, side, 3)), 0,
                  255).astype(np.uint8)
    p = tmp_path / "slide.tif"
    write_pyramid(str(p), img, tile=128, compression="none", min_size=64)
    main([
        "detection", "--model", str(model_dir / "model"),
        "--prompts", str(model_dir / "prompts.json"),
        "--image", str(p), "--cascade-margin", "0.2",
        "--patch-size", "64", "--coarse-downsample", "4",
        "--text-batch-size", "8", "--max-length", "32", "--topn", "3",
        "--batch-size", "16",
    ])
    out = capsys.readouterr().out
    assert "Tumor probability:" in out
    assert "cascade:" in out and "downsample 4" in out


def test_wsi_cli_cascade_requires_margin(model_dir, tmp_path):
    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.wsi.run import main

    p = tmp_path / "slide.tif"
    write_pyramid(str(p), np.full((256, 256, 3), 200, np.uint8),
                  tile=128, compression="none", min_size=64)
    with pytest.raises(SystemExit):
        main([
            "detection", "--model", str(model_dir / "model"),
            "--prompts", str(model_dir / "prompts.json"),
            "--image", str(p),
            "--text-batch-size", "8", "--max-length", "32",
        ])


def test_wsi_cli_extract_int8_calibrated(model_dir, tmp_path, capsys):
    """extract --int8 --int8-calib: SmoothQuant calibrates on the slide's
    own first tiles through BOTH source legs of _slide_calib — the
    streaming pyramid path and the flat-image path (wsi/run.py:105-129)."""
    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.wsi.run import main as run_main
    from PIL import Image

    rng = np.random.default_rng(3)
    img = np.full((200, 200, 3), 250, np.uint8)
    img[40:160, 40:160] = rng.integers(80, 200, (120, 120, 3)).astype(np.uint8)
    write_pyramid(str(tmp_path / "slide.tif"), img, tile=32, min_size=64)
    Image.fromarray(img).save(tmp_path / "slide.png")

    for src in ("slide.tif", "slide.png"):
        out_h5 = tmp_path / f"{src}.h5"
        run_main([
            "extract", "--model", str(model_dir / "model"),
            "--image", str(tmp_path / src), "--out", str(out_h5),
            "--patch-size", "32", "--batch-size", "8",
            "--int8", "--int8-calib", "4",
        ])
        assert "wrote" in capsys.readouterr().out
        with h5py.File(out_h5) as f:
            assert f["features"].shape[0] > 0

    # all-background slide -> no tissue tiles -> calibration returns None
    # (falls back to weight-only scales) and extract reports zero tiles
    from keep_tpu.wsi import run as run_mod

    blank = np.full((200, 200, 3), 255, np.uint8)
    Image.fromarray(blank).save(tmp_path / "blank.png")
    import argparse

    args = argparse.Namespace(int8=True, int8_calib=4, patch_size=32,
                              tissue_fraction=0.25, wsi_level=0)
    assert run_mod._slide_calib(args, str(tmp_path / "blank.png")) is None
