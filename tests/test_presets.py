"""OpenCLIP preset inventory (keep_tpu.presets ← the reference's 62
model_configs/*.json, factory.py:41-62): every entry resolves to native
tower configs; small representatives build and run end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu import presets


def test_inventory_is_complete():
    """All 62 of the reference's model_configs/*.json now build natively
    (round 3 added EVA02 ×5, relpos ViT, coca_roberta)."""
    assert len(presets.PRESETS) == 62
    assert len(presets.UNSUPPORTED) == 0
    assert not set(presets.PRESETS) & set(presets.UNSUPPORTED)


def test_all_supported_presets_resolve():
    for name in presets.preset_names():
        r = presets.resolve(name)
        assert r.embed_dim > 0
        if r.family == "coca":
            continue
        if r.vision_kind in ("vit", "vit_gap", "eva01_g"):
            assert r.vision_cfg.embed_dim % r.vision_cfg.num_heads == 0, name
        if r.text_kind == "clip":
            assert r.text_cfg.width % r.text_cfg.heads == 0, name
            assert r.text_cfg.output_dim == r.embed_dim, name


def test_known_shapes():
    r = presets.resolve("ViT-bigG-14")
    assert (r.vision_cfg.embed_dim, r.vision_cfg.depth,
            r.vision_cfg.num_heads) == (1664, 48, 16)  # head_width 104
    assert r.vision_cfg.mlp_ratio == pytest.approx(4.9231)
    r = presets.resolve("RN50x64")
    assert tuple(r.vision_cfg.layers) == (3, 15, 36, 10)
    assert r.vision_cfg.image_size == 448
    r = presets.resolve("convnext_xxlarge")
    assert tuple(r.vision_cfg.dims) == (384, 768, 1536, 3072)
    r = presets.resolve("ViT-B-32-quickgelu")
    assert r.vision_cfg.act == "quick_gelu" and r.text_cfg.act == "quick_gelu"
    r = presets.resolve("xlm-roberta-large-ViT-H-14")
    assert r.text_cfg.trunk.vocab_size == 250002
    assert r.text_cfg.trunk.hidden_size == 1024
    assert r.vision_cfg.num_heads == 16  # 1280 / head_width 80


def test_unknown_preset_raises():
    with pytest.raises(KeyError, match="unknown preset"):
        presets.resolve("ViT-Z-99")


def test_mt5_preset_resolves():
    r = presets.resolve("mt5-xl-ViT-H-14")
    assert r.text_cfg.trunk.d_model == 2048
    assert r.text_cfg.trunk.num_layers == 24
    assert r.text_cfg.context_length == 0  # relative positions: no hard max


@pytest.mark.slow
@pytest.mark.parametrize("name,img", [
    ("ViT-S-32", 224),
    ("convnext_tiny", 224),
    ("RN50", 224),
])
def test_create_preset_forward(name, img, rng):
    params, model = presets.create_preset(name)
    x = jnp.asarray(rng.standard_normal((1, img, img, 3), dtype=np.float32))
    ids = np.full((2, 77), 3, np.int64)
    ids[:, 0], ids[:, -1] = 49406, 49407
    out = model.forward(params, x, jnp.asarray(ids))
    e = model.preset.embed_dim
    assert out["image_features"].shape == (1, e)
    assert out["text_features"].shape == (2, e)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        atol=1e-5)


@pytest.mark.slow
def test_create_preset_mixed_text_towers(rng):
    """bert / roberta text towers + gap-ViT vision through the preset path."""
    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3), dtype=np.float32))

    params, model = presets.create_preset("roberta-ViT-B-32")
    ids = np.full((2, 20), 7, np.int64)
    ids[1, 10:] = 1  # roberta pad
    t = model.encode_text(params, jnp.asarray(ids), normalize=True)
    assert t.shape == (2, 512)
    i = model.encode_image(params, x, normalize=True)
    assert i.shape == (1, 512)

    params, model = presets.create_preset("ViT-B-32-bert")
    ids = np.full((2, 16), 5, np.int64)
    ids[1, 8:] = 0  # bert pad
    t = model.encode_text(params, jnp.asarray(ids))
    assert t.shape == (2, 768)

    params, model = presets.create_preset("vit_medium_patch16_gap_256")
    xi = jnp.asarray(rng.standard_normal((1, 256, 256, 3), dtype=np.float32))
    i = model.encode_image(params, xi)
    assert i.shape == (1, 512)
    assert "cls_token" not in params["visual"]  # gap ViT has no CLS


def test_factory_routes_presets():
    from keep_tpu import factory

    names = factory.list_models()
    assert "ViT-B-16" in names and "keep" in names
    params, spec = factory.create_model("ViT-S-32")
    assert spec.family == "clip"
    x = jnp.zeros((1, 224, 224, 3))
    assert spec.encode_image(params, x).shape == (1, 384)
    with pytest.raises(ValueError, match="overrides"):
        factory.create_model("ViT-S-32", embed_dim=128)


def test_preprocess_config_per_preset():
    from keep_tpu.ops.preprocess import preprocess

    pc = presets.preprocess_config("RN50x64")
    assert pc.size == 448
    assert pc.mean == presets.OPENAI_DATASET_MEAN  # CLIP stats, not ImageNet
    pc = presets.preprocess_config("convnext_base_w_320")
    assert pc.size == 320
    out = preprocess(np.zeros((400, 360, 3), np.uint8), presets.preprocess_config("ViT-B-16-plus-240"))
    assert out.shape == (1, 240, 240, 3)


def test_tokenizer_kind():
    assert presets.tokenizer_kind("ViT-B-16") == "clip"
    assert presets.tokenizer_kind("coca_ViT-B-32") == "clip"
    assert presets.tokenizer_kind("ViT-B-32-bert") == "bert"
    with pytest.raises(presets.UnsupportedPresetError, match="SentencePiece"):
        presets.tokenizer_kind("xlm-roberta-base-ViT-B-32")


@pytest.mark.slow
def test_swin_and_eva01_towers_shrunken(rng):
    """swin/EVA01 presets resolve to real tower configs; forward a shrunken
    clone of each resolved config to prove the dispatch wiring (the full
    towers are 88M/1B params — too heavy for unit tests)."""
    import dataclasses

    r = presets.resolve("swin_base_patch4_window7_224")
    assert (r.vision_cfg.embed_dim, tuple(r.vision_cfg.depths)) == (128, (2, 2, 18, 2))
    from keep_tpu.models import swin

    scfg = dataclasses.replace(r.vision_cfg, img_size=56, embed_dim=8,
                               depths=(1, 1), heads=(2, 4),
                               num_features_mult=2)
    sp = swin.init(jax.random.PRNGKey(0), scfg)
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 3), dtype=np.float32))
    assert swin.forward(sp, x, scfg).shape == (1, scfg.num_features)

    r = presets.resolve("EVA01-g-14")
    assert (r.vision_cfg.embed_dim, r.vision_cfg.depth) == (1408, 40)
    assert r.vision_cfg.mlp_ratio == pytest.approx(6144 / 1408)
    assert r.vision_proj == "linear_bias"  # timm classifier head as proj
    from keep_tpu.models import vit

    ecfg = dataclasses.replace(r.vision_cfg, img_size=28, embed_dim=32,
                               depth=2, num_heads=4)
    ep = vit.init(jax.random.PRNGKey(1), ecfg)
    xi = jnp.asarray(rng.standard_normal((1, 28, 28, 3), dtype=np.float32))
    assert vit.forward(ep, xi, ecfg).shape == (1, 32)


@pytest.mark.slow
@pytest.mark.parametrize("name,img", [
    ("swin_base_patch4_window7_224", 224),   # swin windowed trunk
    ("EVA02-B-16", 224),                     # rope/SwiGLU trunk
    ("vit_relpos_medium_patch16_cls_224", 224),  # relpos-bias trunk
])
def test_create_preset_forward_alt_kinds(name, img, rng):
    """The remaining vision-kind dispatch legs of create_preset build and
    encode end-to-end (swin / eva02 / vit_relpos)."""
    params, model = presets.create_preset(name)
    x = jnp.asarray(rng.standard_normal((1, img, img, 3), dtype=np.float32))
    feats = model.encode_image(params, x, normalize=True)
    assert feats.ndim == 2 and feats.shape[0] == 1
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats, np.float32), axis=-1), 1.0,
        atol=1e-3)
