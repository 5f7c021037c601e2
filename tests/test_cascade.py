"""Coarse-to-fine cascade sweep (wsi/cascade.py): exact-limit parity with
the plain sweep, inheritance mechanics, and the error legs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.io.tiles import iter_wsi_tiles
from keep_tpu.io.wsi import write_pyramid
from keep_tpu.models import keep
from keep_tpu.wsi.cascade import cascade_detect
from keep_tpu.wsi.extract import extract_features
from keep_tpu.wsi.pipelines import score_tiles

PS = 32  # tile size == the tiny model's img_size

CFG = KEEPConfig(
    vision=ViTConfig(img_size=PS, patch_size=16, embed_dim=32, depth=2,
                     num_heads=2),
    text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=32),
    projection_dim=32,
)


@pytest.fixture(scope="module")
def model():
    return keep.KEEPModel(params=keep.init(jax.random.PRNGKey(0), CFG),
                          cfg=CFG)


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    """1024² pyramid (levels 1/2/4 at min_size 256) of pink tissue-like
    texture with a distinct dark region — every tile passes the tissue
    mask, and the two regions give the classifier something to separate."""
    g = np.random.default_rng(3)
    side = 1024
    yy, xx = np.mgrid[0:side, 0:side]
    base = np.stack([np.full((side, side), 210.0),
                     np.full((side, side), 140.0),
                     np.full((side, side), 180.0)], -1)
    dark = (xx > side // 2) & (yy > side // 3)
    base[dark] = [120.0, 60.0, 100.0]
    slide = np.clip(base + g.normal(0, 12, base.shape), 0,
                    255).astype(np.uint8)
    p = tmp_path_factory.mktemp("cascade") / "slide.tif"
    write_pyramid(str(p), slide, tile=128, compression="none", min_size=256)
    return str(p)


@pytest.fixture(scope="module")
def classifier(model, slide_path):
    """Prototype classifier from one example tile per region — even a
    random-init encoder separates the two textures."""
    tiles = np.concatenate([t for t, _ in iter_wsi_tiles(
        slide_path, patch_size=PS, tissue_fraction=0.1, chunk=64)])
    feats = extract_features(model, tiles, batch_size=16)
    # brightest and darkest tiles as the two class prototypes
    lum = tiles.mean(axis=(1, 2, 3))
    protos = np.stack([feats[np.argmax(lum)], feats[np.argmin(lum)]], axis=1)
    return protos / np.linalg.norm(protos, axis=0, keepdims=True)


def full_sweep(model, slide_path, classifier):
    parts = list(iter_wsi_tiles(slide_path, patch_size=PS,
                                tissue_fraction=0.25, chunk=64))
    tiles = np.concatenate([t for t, _ in parts])
    coords = np.concatenate([c for _, c in parts])
    feats = extract_features(model, tiles, batch_size=16)
    probs = np.asarray(score_tiles(jnp.asarray(classifier),
                                   jnp.asarray(feats)))
    return probs, coords


def test_full_refine_limit_equals_plain_sweep(model, slide_path, classifier):
    """margin >= 0.5 refines every parent: same candidate grid, same
    probabilities, same slide decision as the plain level-0 sweep."""
    res = cascade_detect(model, slide_path, classifier, patch_size=PS,
                         coarse_downsample=4, margin=0.5, batch_size=16)
    probs, coords = full_sweep(model, slide_path, classifier)
    np.testing.assert_array_equal(res.coords, coords)
    assert res.refined.all()
    assert res.n_fine_encoded == res.n_fine_total == len(coords)
    np.testing.assert_allclose(res.probs, probs, atol=1e-5)
    want = float((probs[:, 1] > 0.5).mean())
    assert res.tumor_prob == pytest.approx(want, abs=1e-6)
    assert res.encode_fraction > 1.0  # the coarse pass is pure overhead here


def test_margin_zero_trusts_coarse(model, slide_path, classifier):
    res = cascade_detect(model, slide_path, classifier, patch_size=PS,
                         coarse_downsample=4, margin=0.0, batch_size=16)
    # margin 0 only refines exact ties — none here
    assert res.n_fine_encoded <= res.n_coarse
    assert res.encode_fraction < 0.2  # ~d^-2 = 1/16 + ties
    # every candidate inherits its parent's probability verbatim
    span = res.downsample * PS
    parent = res.coords // span
    for p in np.unique(parent, axis=0):
        rows = (parent == p).all(axis=1)
        block = res.probs[rows & ~res.refined]
        if len(block):
            assert np.ptp(block[:, 1]) == 0.0


def test_partial_refine_mechanics(model, slide_path, classifier):
    """At a working margin: refined tiles get level-0 probs (match the
    plain sweep), unrefined inherit; the decision mixes both."""
    res = cascade_detect(model, slide_path, classifier, patch_size=PS,
                         coarse_downsample=4, margin=0.15, batch_size=16)
    probs, coords = full_sweep(model, slide_path, classifier)
    np.testing.assert_array_equal(res.coords, coords)
    if res.refined.any():
        np.testing.assert_allclose(res.probs[res.refined],
                                   probs[res.refined], atol=1e-5)
    assert 0.0 <= res.tumor_prob <= 1.0
    assert res.encode_fraction <= 1.0 + res.n_coarse / res.n_fine_total
    # agreement with the full sweep on the slide call, as a sanity signal
    agree = (res.probs[:, 1] > 0.5) == (probs[:, 1] > 0.5)
    assert agree[res.refined].all()  # refined tiles are exact by design


def test_error_legs(model, classifier, tmp_path):
    g = np.random.default_rng(0)
    flat = np.clip(200 + g.normal(0, 10, (256, 256, 3)), 0,
                   255).astype(np.uint8)
    p = str(tmp_path / "flat.tif")
    write_pyramid(p, flat, tile=128, compression="none", min_size=256)
    with pytest.raises(ValueError, match="no coarse level"):
        cascade_detect(model, p, classifier, patch_size=PS,
                       coarse_downsample=4)
    with pytest.raises(ValueError, match="margin"):
        cascade_detect(model, p, classifier, patch_size=PS, margin=-0.1)


def test_resize_parity_with_full_sweep(model, slide_path, classifier):
    """resize=True at patch_size != img_size: the full-refine limit still
    equals a plain sweep that routes through the same resize path (the CLI
    contract: 64px tiles on the 32px tower)."""
    ps2 = 64
    res = cascade_detect(model, slide_path, classifier, patch_size=ps2,
                         coarse_downsample=4, margin=0.5, batch_size=16,
                         resize=True)
    parts = list(iter_wsi_tiles(slide_path, patch_size=ps2,
                                tissue_fraction=0.25, chunk=16))
    tiles = np.concatenate([t for t, _ in parts])
    coords = np.concatenate([c for _, c in parts])
    feats = extract_features(model, tiles, batch_size=16, resize=True)
    probs = np.asarray(score_tiles(jnp.asarray(classifier),
                                   jnp.asarray(feats)))
    np.testing.assert_array_equal(res.coords, coords)
    assert res.refined.all()
    np.testing.assert_allclose(res.probs, probs, atol=1e-5)
