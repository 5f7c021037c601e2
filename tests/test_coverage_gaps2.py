"""Round-4 coverage-gap closure, part 2 (docs/COVERAGE.md): CLI validation
legs in wsi.run, factory/preset error paths and head kinds, KEP alternative
encoders, profiling utilities, native-WSI error branches."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- wsi.run

def test_wsi_run_extract_arg_validation(tmp_path):
    from keep_tpu.wsi import run

    model = str(tmp_path / "model")  # never reached: validation fires first
    with pytest.raises(SystemExit):
        run.main(["extract", "--model", model, "--slide-dir", str(tmp_path)])
    with pytest.raises(SystemExit):
        run.main(["extract", "--model", model])
    empty = tmp_path / "noslides"
    empty.mkdir()
    with pytest.raises(SystemExit):
        run.main(["extract", "--model", model, "--slide-dir", str(empty),
                  "--out-dir", str(tmp_path / "o")])


def test_wsi_run_try_open_pyramid_rejects(tmp_path):
    """_try_open_pyramid: unreadable file -> None; single-level non-svs
    TIFF -> None (flat path wins)."""
    from keep_tpu.io.wsi import write_pyramid
    from keep_tpu.wsi.run import _try_open_pyramid

    assert _try_open_pyramid(str(tmp_path / "missing.svs")) is None

    flat = tmp_path / "flat.tif"
    img = np.random.default_rng(0).integers(
        0, 255, (256, 256, 3), dtype=np.uint8)
    # min_size >= side: exactly one level -> not a pyramid
    write_pyramid(str(flat), img, tile=128, compression="none", min_size=512)
    assert _try_open_pyramid(str(flat)) is None


# ---------------------------------------------------------------- factory

def test_factory_unknown_names():
    from keep_tpu.factory import create_model, get_tokenizer, list_models

    assert "keep" in list_models()
    with pytest.raises(KeyError, match="unknown model"):
        create_model("not-a-model")
    with pytest.raises(ValueError, match="unknown tokenizer kind"):
        get_tokenizer("spm", "/dev/null")


def test_factory_pretrained_dir_without_weights(tmp_path):
    from keep_tpu.factory import create_model

    d = tmp_path / "ckpt"
    d.mkdir()
    with pytest.raises(FileNotFoundError, match="no weights file"):
        create_model("keep", pretrained=str(d))


def test_factory_kep_spec_with_overrides():
    """The registered kep builder + overrides leg (spec config replaced
    before init)."""
    from keep_tpu.configs import BertConfig, ViTConfig
    from keep_tpu.factory import create_model
    from keep_tpu.models.kep import KEPConfig  # noqa: F401 (family import)

    tiny_vit = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                         num_heads=2)
    tiny_bert = BertConfig(vocab_size=32, hidden_size=32,
                           num_hidden_layers=1, num_attention_heads=2,
                           intermediate_size=64, max_position_embeddings=16)
    params, spec = create_model("kep", vision=tiny_vit, text=tiny_bert,
                                embed_dim=32, with_knowledge=False)
    assert spec.config.embed_dim == 32
    assert "knowledge" not in params
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    feats = spec.encode_image(params, x, spec.config, normalize=True)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)


# ---------------------------------------------------------------- presets

def test_presets_resolve_unknown():
    from keep_tpu.presets import resolve

    with pytest.raises(KeyError, match="unknown preset"):
        resolve("ViT-Z-99")


def test_presets_head_kinds():
    """Every projection-head kind the 62 presets use: init shapes and
    apply semantics (timm mlp head: fc1 biased, fc2 unbiased, hidden=2*out)."""
    from keep_tpu.presets import _head_apply, _head_init

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 8)),
                    jnp.float32)
    for kind, leaves in (("matrix", {"proj"}), ("linear", {"w"}),
                         ("linear_bias", {"w", "b"}),
                         ("mlp", {"fc1", "fc1_b", "fc2"})):
        head = _head_init(key, kind, 8, 4, jnp.float32)
        assert set(head) == leaves, kind
        out = _head_apply(head, kind, x)
        assert out.shape == (3, 4), kind
    assert _head_init(key, "none", 8, 4, jnp.float32) is None
    np.testing.assert_array_equal(np.asarray(_head_apply(None, "none", x)),
                                  np.asarray(x))
    # linear_bias really adds the bias
    head = _head_init(key, "linear_bias", 8, 4, jnp.float32)
    want = np.asarray(x) @ np.asarray(head["w"]) + np.asarray(head["b"])
    np.testing.assert_allclose(np.asarray(_head_apply(head, "linear_bias", x)),
                               want, atol=1e-6)


# ---------------------------------------------------------------- KEP

def _tiny_kep_cfg(**kw):
    from keep_tpu.configs import BertConfig, ViTConfig
    from keep_tpu.models.kep import KEPConfig

    return KEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                         num_heads=2),
        text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=16),
        embed_dim=32, with_knowledge=False, **kw)


def test_kep_rn_clip_encoder_and_text_head(rng):
    from keep_tpu.models import kep
    from keep_tpu.models.resnet import ModifiedResNetConfig

    rn = ModifiedResNetConfig(layers=(1, 1, 1, 1), width=8, image_size=32,
                              heads=2, output_dim=32)
    cfg = _tiny_kep_cfg(image_encoder="rn_clip", vision_rn=rn,
                        text_embedding_head=True)
    params = kep.init(jax.random.PRNGKey(0), cfg)
    assert "text_head" in params
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    feats = kep.encode_image(params, x, cfg, normalize=True)
    assert feats.shape == (2, 32)
    ids = jnp.asarray(rng.integers(1, 32, (2, 8)))
    txt = kep.encode_text(params, ids, cfg=cfg, normalize=True)
    assert txt.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt), axis=-1),
                               1.0, rtol=1e-5)


def test_kep_unknown_encoder_raises(rng):
    from keep_tpu.models import kep

    cfg = _tiny_kep_cfg(image_encoder="vgg")
    with pytest.raises(ValueError, match="unknown image_encoder"):
        kep.init(jax.random.PRNGKey(0), cfg)
    good = kep.init(jax.random.PRNGKey(0), _tiny_kep_cfg())
    bad = dataclasses.replace(_tiny_kep_cfg(), image_encoder="vgg")
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="unknown image_encoder"):
        kep.encode_image(good, x, bad)


# ---------------------------------------------------------------- profiling

def test_throughput_meter():
    from keep_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter(window=3)
    assert m.samples_per_sec == 0.0  # <2 events
    for _ in range(5):  # exceeds window -> oldest evicted
        m.update(10)
    assert len(m._events) == 3
    assert m.samples_per_sec > 0
    assert m.per_device(n_devices=2) == pytest.approx(m.samples_per_sec / 2)
    assert m.per_device() >= 0  # default jax.device_count() leg


def test_enable_hlo_dump_sets_flag(tmp_path, monkeypatch):
    from keep_tpu.utils import profiling

    monkeypatch.setenv("XLA_FLAGS", "--xla_dump_to=/old --other=1")
    profiling.enable_hlo_dump(str(tmp_path / "dump"))
    flags = os.environ["XLA_FLAGS"]
    assert f"--xla_dump_to={tmp_path / 'dump'}" in flags
    assert "--xla_dump_to=/old" not in flags and "--other=1" in flags


# ---------------------------------------------------------------- io.wsi

def test_append_stripped_page_validates_shape(tmp_path):
    from keep_tpu.io.wsi import append_stripped_page

    with pytest.raises(ValueError, match="RGB uint8"):
        append_stripped_page(str(tmp_path / "x.tif"),
                             np.zeros((4, 4), np.uint8))


def test_wsi_reader_native_rejects_nontiff(tmp_path):
    from keep_tpu.io.wsi import WSIReader

    p = tmp_path / "fake.tif"
    p.write_bytes(b"not a tiff at all")
    with pytest.raises(OSError):
        WSIReader(str(p), backend="native")
