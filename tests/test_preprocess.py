"""Preprocessing parity vs PIL (the reference transform operates on PIL images:
torchvision Resize/CenterCrop on PIL input delegates to PIL.Image.resize)."""

import numpy as np
import pytest
from PIL import Image

from keep_tpu.configs import PreprocessConfig
from keep_tpu.ops.preprocess import (
    preprocess,
    resize_weights,
    resized_output_size,
)

CFG = PreprocessConfig()


def pil_reference(img_u8: np.ndarray, size=224, crop=224) -> np.ndarray:
    """torchvision Resize(224,BICUBIC)+CenterCrop(224)+ToTensor+Normalize
    replicated with PIL + numpy."""
    im = Image.fromarray(img_u8)
    h, w = img_u8.shape[:2]
    oh, ow = resized_output_size(h, w, size)
    im = im.resize((ow, oh), Image.BICUBIC)
    top = int(round((oh - crop) / 2.0))
    left = int(round((ow - crop) / 2.0))
    im = im.crop((left, top, left + crop, top + crop))
    x = np.asarray(im, np.float32) / 255.0
    return (x - np.array(CFG.mean)) / np.array(CFG.std)


@pytest.mark.parametrize(
    "shape",
    [(448, 448), (512, 384), (300, 500), (224, 224), (1000, 250)],
    ids=str,
)
def test_matches_pil(shape, rng):
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    ref = pil_reference(img)
    got = np.asarray(preprocess(img, CFG))[0]
    assert got.shape == ref.shape
    # pil_quantize emulates PIL's uint8 intermediate; residual gap is PIL's
    # int16 fixed-point coefficients vs our float weights (≤1 pixel step).
    bound = 1.5 / 255.0 / min(CFG.std)
    assert np.max(np.abs(got - ref)) < bound


def test_upscale_matches_pil(rng):
    img = rng.integers(0, 256, size=(160, 120, 3), dtype=np.uint8)
    ref = pil_reference(img)
    got = np.asarray(preprocess(img, CFG))[0]
    assert np.max(np.abs(got - ref)) < 1.5 / 255.0 / min(CFG.std)


def test_float_path_close(rng):
    """The pure-float path stays within the 8-bit quantization envelope."""
    img = rng.integers(0, 256, size=(448, 448, 3), dtype=np.uint8)
    q = np.asarray(preprocess(img, CFG, pil_quantize=True))[0]
    f = np.asarray(preprocess(img, CFG, pil_quantize=False))[0]
    assert np.max(np.abs(q - f)) < 5.0 / 255.0 / min(CFG.std)


def test_batched(rng):
    imgs = rng.integers(0, 256, size=(4, 448, 448, 3), dtype=np.uint8)
    out = np.asarray(preprocess(imgs, CFG))
    assert out.shape == (4, 224, 224, 3)
    single = np.asarray(preprocess(imgs[0], CFG))[0]
    np.testing.assert_allclose(out[0], single, atol=1e-6)


def test_resize_weights_row_stochastic():
    for n_in, n_out in [(448, 224), (224, 224), (100, 224), (999, 224)]:
        w = resize_weights(n_in, n_out)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_identity_resize(rng):
    """224→224 resize must be (near-)identity."""
    img = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
    got = np.asarray(preprocess(img, CFG))[0]
    ref = (img.astype(np.float32) / 255.0 - np.array(CFG.mean)) / np.array(CFG.std)
    assert np.max(np.abs(got - ref)) < 1e-4


@pytest.mark.parametrize("target", [240, 256, 288, 320, 336, 448])
def test_matches_pil_at_preset_sizes(target, rng):
    """The OpenCLIP presets run at 240–448px (presets.preprocess_config);
    PIL parity must hold at every target size, not just 224."""
    img = rng.integers(0, 256, size=(500, 470, 3), dtype=np.uint8)
    from keep_tpu.configs import PreprocessConfig

    cfg = PreprocessConfig(size=target)
    got = np.asarray(preprocess(img, cfg))[0]
    ref = pil_reference(img, size=target, crop=target)
    assert got.shape == (target, target, 3)
    assert np.abs(got - ref).max() <= 1.5 / 255 / 0.225 + 1e-6


def test_preprocess_composes_under_jit():
    """preprocess fused into a larger jit (how bench/serving compile it)
    must match the eager call, and a jit-first call must not poison the
    weight cache for later eager calls (regression: the lru-cached resize
    matrices were once jnp arrays — Tracers when built inside a trace)."""
    import jax

    # the package re-exports the function under the module's name; pull
    # module internals directly
    from keep_tpu.ops.preprocess import (
        PreprocessConfig as PC,
        _resize_crop_matrices,
        preprocess as pre,
    )

    _resize_crop_matrices.cache_clear()
    rng = np.random.default_rng(3)
    tile = rng.integers(0, 255, (96, 80, 3)).astype(np.uint8)
    cfg = PC(size=40)
    jitted = jax.jit(lambda r: pre(r, cfg, crop=32))(tile)
    eager = pre(tile, cfg, crop=32)  # same (h, w) → warm cache
    np.testing.assert_array_equal(np.asarray(jitted), np.asarray(eager))
