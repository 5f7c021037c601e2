"""Cohort WSI drivers + HF export/import round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.wsi.cohort import (
    detection_cohort,
    load_kidrare_labels,
    segmentation_cohort,
    subtyping_cohort,
)


def make_cohort(rng, n_slides=6, n_patches=120, d=32, ps=256, n_classes=2):
    """Synthetic cohort: tumor slides carry features aligned with class-1
    direction."""
    direction = np.zeros(d, np.float32)
    direction[0] = 1.0
    cls = np.stack([-direction, direction], axis=1).astype(np.float32)
    if n_classes > 2:
        extra = np.zeros((d, n_classes - 2), np.float32)
        for i in range(n_classes - 2):
            extra[i + 1, i] = 1.0
        cls = np.concatenate([cls, extra], axis=1)
    side = int(np.ceil(np.sqrt(n_patches)))
    coords = np.array(
        [((i % side) * ps, (i // side) * ps) for i in range(n_patches)], np.int64
    )
    items = []
    for s in range(n_slides):
        label = s % 2
        sign = 2.0 * label - 1.0
        feats = (
            sign * np.outer(np.ones(n_patches), direction)
            + 0.3 * rng.standard_normal((n_patches, d))
        ).astype(np.float32)
        items.append(
            {"slide_id": f"s{s}", "features": feats, "coords": coords, "label": label}
        )
    return jnp.asarray(cls), items


def test_detection_cohort(rng):
    cls, items = make_cohort(rng)
    out = detection_cohort(cls, items)
    assert out["n"] == 6
    assert out["auroc"] == 1.0
    assert out["sensitivity"] == 1.0 and out["specificity"] == 1.0


def test_segmentation_cohort(rng):
    cls, items = make_cohort(rng, n_slides=2, n_patches=100, ps=224)
    side = 10
    masks = {}
    for item in items:
        m = np.zeros((side * 224, side * 224), np.uint8)
        if item["label"] == 1:
            m[:, : 5 * 224] = 255  # left half tumor
        else:
            m[:224, :224] = 255  # tiny region so both GT classes exist
        masks[item["slide_id"]] = m
    # make slide-0's first patch strongly tumor so GT has both classes
    items[0]["features"][0] = 5.0 * np.eye(32, dtype=np.float32)[0]
    out = segmentation_cohort(cls, items, lambda sid: masks[sid], patch_size=224)
    assert out["n"] == 2
    assert 0.0 <= out["mean_dice"] <= 1.0
    assert out["per_slide"]["s1"]["auroc"] >= 0.0


def test_subtyping_cohort(rng):
    # 3 classes = 2 subtypes + Normal appended last
    d = 32
    dirs = np.eye(d, dtype=np.float32)
    cls = np.stack([dirs[0], dirs[1], dirs[2]], axis=1)
    ps = 256
    coords = np.array([(i * ps, 0) for i in range(50)], np.int64)
    items = []
    for s in range(4):
        label = s % 2
        feats = (np.outer(np.ones(50), dirs[label])
                 + 0.2 * rng.standard_normal((50, d))).astype(np.float32)
        items.append({"slide_id": f"s{s}", "features": feats,
                      "coords": coords, "label": label})
    out = subtyping_cohort(jnp.asarray(cls), items)
    assert out["balanced_accuracy"] == 1.0


def test_kidrare_labels(tmp_path):
    import json

    p = tmp_path / "labels.json"
    json.dump({"slide1": "Normal", "slide2": "Nephroblastoma"}, open(p, "w"))
    slides, label_map = load_kidrare_labels(str(p), "Nephroblastoma")
    assert label_map == {"Normal": 0, "Nephroblastoma": 1}
    assert slides["slide2"] == "Nephroblastoma"


# ---------------------------------------------------------------------------


def test_download_pretrained_from_url(tmp_path, monkeypatch):
    """resolve→fetch→sha256-verify→cache via file:// URLs (the reference's
    download_pretrained_from_url, pretrained.py:336-377): cache hit skips the
    fetch, checksum mismatch re-downloads, bad download raises."""
    from keep_tpu.compat import registry

    monkeypatch.setenv("KEEP_TPU_HOME", str(tmp_path / "home"))
    src = tmp_path / "src" / "weights.bin"
    src.parent.mkdir()
    src.write_bytes(b"release-weights-v1")
    sha = registry.sha256_file(str(src))
    url = "file://" + str(src)

    # fresh fetch + verify
    got = registry.download_pretrained_from_url(url, expected_sha256=sha)
    assert open(got, "rb").read() == b"release-weights-v1"
    # cache hit: source can vanish, the cached verified copy is returned
    src.unlink()
    assert registry.download_pretrained_from_url(url, expected_sha256=sha) == got
    # sha prefix matching (openaipublic-style short prefixes)
    assert registry.download_pretrained_from_url(
        url, expected_sha256=sha[:12]) == got
    # cached copy with a WRONG checksum → re-download attempt (source gone →
    # urlopen fails, proving the cache was not trusted)
    with pytest.raises(Exception):
        with pytest.warns(UserWarning, match="re-downloading"):
            registry.download_pretrained_from_url(url, expected_sha256="f" * 64)
    # fresh download whose content mismatches the expected sha → hard error
    src.write_bytes(b"corrupted")
    (tmp_path / "home" / "downloads" / "weights.bin").unlink()
    with pytest.raises(RuntimeError, match="sha256"):
        registry.download_pretrained_from_url(url, expected_sha256=sha)


def test_registry_entry_with_url_fetches(tmp_path, monkeypatch):
    """Registry entries carrying a url are fetched into the cache on first
    resolve (download_pretrained semantics, pretrained.py:400-427)."""
    from keep_tpu.compat import registry

    monkeypatch.setenv("KEEP_TPU_HOME", str(tmp_path / "home"))
    src = tmp_path / "knowledge_bert.pt"
    src.write_bytes(b"tower")
    sha = registry.sha256_file(str(src))
    registry.register("kb-url", "kb/knowledge_bert.pt", kind="file",
                      sha256=sha, url="file://" + str(src))
    p = registry.resolve("kb-url")
    assert p == str(tmp_path / "home" / "kb" / "knowledge_bert.pt")
    assert open(p, "rb").read() == b"tower"
    src.unlink()
    assert registry.resolve("kb-url") == p  # cached thereafter

    # fetch(): one front door — path | URL | registry name
    assert registry.fetch(p) == p
    assert registry.fetch("kb-url") == p


def test_create_model_pretrained(tmp_path, monkeypatch):
    """factory.create_model(pretrained=...) loads released weights through
    the fetch path (reference create_model pretrained wiring,
    factory.py:286-339)."""
    from keep_tpu import factory
    from keep_tpu.compat import registry
    from keep_tpu.compat.export import save_pretrained
    from keep_tpu.models import keep
    from tests.test_keep_api import TINY

    monkeypatch.setenv("KEEP_TPU_HOME", str(tmp_path / "home"))
    ref_params = keep.init(jax.random.PRNGKey(7), TINY)
    save_pretrained(str(tmp_path / "model"), ref_params, TINY)

    # by local path: config.json supplies the arch, weights load exactly
    params, spec = factory.create_model("keep", pretrained=str(tmp_path / "model"))
    assert spec.config.vision.embed_dim == TINY.vision.embed_dim
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3), dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(keep.encode_image(params, x, TINY)),
        np.asarray(keep.encode_image(ref_params, x, TINY)), atol=1e-6)

    # by registry name
    registry.register("tiny-keep", str(tmp_path / "model"), kind="dir")
    params2, _ = factory.create_model("keep", pretrained="tiny-keep")
    np.testing.assert_allclose(
        np.asarray(params2["logit_scale"]),
        np.asarray(ref_params["logit_scale"]), atol=1e-6)

    with pytest.raises(NotImplementedError):
        factory.create_model("coca", pretrained="tiny-keep")


def test_hf_export_roundtrip(tmp_path, rng):
    from keep_tpu.compat.export import save_pretrained
    from keep_tpu.models import keep
    from tests.test_keep_api import TINY

    params = keep.init(jax.random.PRNGKey(3), TINY)
    save_pretrained(str(tmp_path / "model"), params, TINY)
    assert (tmp_path / "model" / "config.json").exists()

    model = keep.KEEPModel.from_pretrained(str(tmp_path / "model"), cfg=TINY)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    a = keep.encode_image(params, x, TINY)
    b = model.encode_image(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ids = jnp.asarray(rng.integers(1, TINY.text.vocab_size, (2, 16)))
    ta = keep.encode_text(params, ids, cfg=TINY)
    tb = model.encode_text(ids)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=1e-6)


def test_quantized_artifact_roundtrip(tmp_path, rng):
    """save_quantized → from_pretrained serves the EXACT pre-calibrated int8
    params: dtype-preserving round-trip (int8 kernel_q, fp32 scales,
    SmoothQuant pre_scale), bit-identical features, and the guards fire
    (save of unquantized params, double-quantize of the loaded artifact)."""
    import jax

    from keep_tpu.compat.export import save_quantized
    from keep_tpu.models import keep
    from keep_tpu.quant import is_quantized
    from tests.test_keep_api import TINY

    params = keep.init(jax.random.PRNGKey(3), TINY)
    model = keep.KEEPModel(params=params, cfg=TINY)
    with pytest.raises(ValueError, match="already-quantized"):
        save_quantized(str(tmp_path / "m"), params, TINY)

    calib = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    qmodel = model.quantize(calib_pixels=calib)  # smoothed → pre_scale rows
    assert is_quantized(qmodel.params) and not is_quantized(params)
    save_quantized(str(tmp_path / "m"), qmodel.params, TINY)

    loaded = keep.KEEPModel.from_pretrained(str(tmp_path / "m"))
    q_leaves = jax.tree.leaves(qmodel.params)
    l_leaves = jax.tree.leaves(loaded.params)
    assert [l.dtype for l in q_leaves] == [l.dtype for l in l_leaves]
    assert any(l.dtype == jnp.int8 for l in l_leaves)

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(qmodel.encode_image(x)),
                                  np.asarray(loaded.encode_image(x)))
    ids = jnp.asarray(rng.integers(1, TINY.text.vocab_size, (2, 16)))
    np.testing.assert_array_equal(np.asarray(qmodel.encode_text(ids)),
                                  np.asarray(loaded.encode_text(ids)))

    with pytest.raises(ValueError, match="already quantized"):
        loaded.quantize()


def test_export_loads_in_torch_reference_layout(tmp_path):
    """The exported state dict must slot into a torch KEEP module built like
    the published one (keep_inference.py:28-52) with strict=True."""
    import torch

    from keep_tpu.compat.export import to_keep_state_dict
    from keep_tpu.models import keep
    from tests.test_keep_api import TINY, build_torch_keep

    visual, head, text, ref_sd = build_torch_keep(TINY)
    params = keep.init(jax.random.PRNGKey(0), TINY)
    sd = {k: torch.from_numpy(np.asarray(v, np.float32).copy())
          for k, v in to_keep_state_dict(params, TINY).items()}
    assert set(sd.keys()) == set(ref_sd.keys())
    for k in sd:
        assert tuple(sd[k].shape) == tuple(ref_sd[k].shape), k


def test_reference_kidrare_fixtures():
    """The reference's shipped KidRare label JSONs load through our contract."""
    import os

    base = "/root/reference/WSI_evaluation/kidrare_label"
    if not os.path.isdir(base):
        pytest.skip("reference kidrare labels not present")
    # binary detection cohort
    slides, label_map = load_kidrare_labels(
        os.path.join(base, "Nephroblastoma_labels.json")
    )
    assert label_map == {"Normal": 0, "Tumor": 1}
    assert len(slides) == 110
    # multi-subtype cohorts (no Normal; pair with add_normal in subtyping)
    for tumor, n_subtypes in (("Neuroblastoma", 3), ("Hepatoblastoma", 4),
                              ("Medulloblastoma", 3)):
        slides, label_map = load_kidrare_labels(
            os.path.join(base, f"{tumor}_labels.json")
        )
        assert len(label_map) == n_subtypes
        assert sorted(label_map.values()) == list(range(n_subtypes))
        assert "Normal" not in label_map


def test_pretrained_registry(tmp_path, monkeypatch):
    """Local registry shim: resolve() verifies presence + sha and errors with
    download directions (zero-egress stand-in for pretrained.py:358-427)."""
    import json as _json

    import pytest as _pytest

    from keep_tpu.compat import registry

    monkeypatch.setenv("KEEP_TPU_HOME", str(tmp_path))
    with _pytest.raises(FileNotFoundError, match="Astaxanthin/KEEP"):
        registry.resolve("keep")
    with _pytest.raises(KeyError, match="unknown pretrained name"):
        registry.resolve("nope")

    # file entry with sha check
    ckpt = tmp_path / "model.bin"
    ckpt.write_bytes(b"weights!")
    good = registry.sha256_file(str(ckpt))
    registry.register("m", str(ckpt), source="local", sha256=good, kind="file")
    assert registry.resolve("m") == str(ckpt)
    registry.register("bad", str(ckpt), sha256="0" * 64, kind="file")
    with _pytest.raises(ValueError, match="sha256 mismatch"):
        registry.resolve("bad")

    # registry.json extension
    (tmp_path / "registry.json").write_text(_json.dumps(
        {"extra": {"path": "sub", "kind": "dir", "source": "s"}}))
    (tmp_path / "sub").mkdir()
    assert registry.resolve("extra") == str(tmp_path / "sub")


def test_imagenet_metadata():
    from keep_tpu.zeroshot.imagenet_metadata import (
        IMAGENET_CLASSNAMES,
        OPENAI_IMAGENET_TEMPLATES,
        SIMPLE_IMAGENET_TEMPLATES,
        apply_templates,
        imagenet_classifier_texts,
    )

    assert len(IMAGENET_CLASSNAMES) == 1000
    assert len(OPENAI_IMAGENET_TEMPLATES) == 80
    assert len(SIMPLE_IMAGENET_TEMPLATES) == 7
    texts = apply_templates("dog", SIMPLE_IMAGENET_TEMPLATES)
    assert texts[0] == "itap of a dog."
    all_texts = imagenet_classifier_texts(SIMPLE_IMAGENET_TEMPLATES)
    assert len(all_texts) == 1000 and len(all_texts[0]) == 7
