"""Fused device-side image preprocessing.

Reproduces the reference eval transform (quick_start/keep_inference.py:88-93):
  Resize(shortest_side=224, bicubic, antialias) → CenterCrop(224) →
  ToTensor (scale to [0,1]) → Normalize(ImageNet mean/std)

TPU-first design: PIL/torchvision do this per-image on host CPU; here the
resize is expressed as two small matmuls (separable convolution with
precomputed PIL-semantics weights), and resize+crop+normalize fuse into ONE
jitted device function. The crop is composed *into* the resize matrices, so
out-of-crop rows are never computed.

Weight construction mirrors PIL's convolution resampler (cubic a=-0.5,
support=2, filter support scaled by the downscale ratio = antialiasing). PIL
quantizes 8-bit channels between passes; we stay in float, which lands within
~2/255 of PIL per pixel — inside the fp32-tolerance contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import PreprocessConfig

Array = jax.Array


def _cubic_filter(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic kernel (Catmull-Rom family, a=-0.5, support 2)."""
    x = np.abs(x)
    out = np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )
    return out


def resize_weights(in_size: int, out_size: int, support: float = 2.0,
                   a: float = -0.5) -> np.ndarray:
    """[out_size, in_size] row-stochastic resample matrix, PIL semantics."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support * filterscale
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax)
        k = _cubic_filter((xs + 0.5 - center) / filterscale, a)
        w[i, xmin:xmax] = k / k.sum()
    return w.astype(np.float32)


def torch_resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] matrix matching ``torch.nn.functional.interpolate(
    mode='bicubic', antialias=True, align_corners=False)`` — the reference's
    pos-embed resample (model.py:563-594 passes antialias=True). torch's AA
    resampler IS Pillow's windowed-normalized construction (it was written
    to match PIL, cubic a=-0.5, at upscale and downscale alike — verified
    ≤6e-6 vs real torch in tests/test_vit_parity.py); only torch's
    non-antialias bicubic uses a=-0.75."""
    return resize_weights(in_size, out_size)


def resized_output_size(h: int, w: int, size: int) -> tuple[int, int]:
    """torchvision Resize(int) semantics: shortest side → size, other side
    scaled with trunc-int (torchvision _compute_resized_output_size)."""
    if h <= w:
        return size, int(size * w / h)
    return int(size * h / w), size


def crop_window(out_size: int, crop: int) -> int:
    """torchvision CenterCrop top/left: int(round((full - crop) / 2))."""
    return int(round((out_size - crop) / 2.0))


@functools.lru_cache(maxsize=64)
def _resize_crop_matrices(h: int, w: int, size: int, crop: int):
    # cache NUMPY (not jnp) arrays: a jnp.asarray built while tracing is a
    # Tracer, and caching one would leak it into later eager calls
    # (`preprocess` is legitimately called both ways — e.g. fused into a
    # larger jit by bench.py/serving, eager in the data path)
    oh, ow = resized_output_size(h, w, size)
    if oh < crop or ow < crop:
        raise ValueError(f"resized {(oh, ow)} smaller than crop {crop}")
    wh = resize_weights(h, oh)[crop_window(oh, crop) : crop_window(oh, crop) + crop]
    ww = resize_weights(w, ow)[crop_window(ow, crop) : crop_window(ow, crop) + crop]
    return wh, ww


@functools.partial(jax.jit, static_argnames=("pil_quantize", "mean", "std"))
def _preprocess_jit(images: Array, wh: Array, ww: Array, pil_quantize, mean, std) -> Array:
    x = images.astype(jnp.float32)
    # separable resize+crop, PIL pass order: horizontal (width) then vertical.
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    if pil_quantize:
        # PIL's 8-bit resampler rounds+clips the intermediate image between
        # the two passes (ImagingResampleHorizontal_8bpc); emulating it takes
        # per-pixel diff vs PIL from ~4/255 to ≤1/255.
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    if pil_quantize:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def preprocess(
    images: np.ndarray | Array,
    cfg: PreprocessConfig = PreprocessConfig(),
    crop: int | None = None,
    pil_quantize: bool = True,
) -> Array:
    """uint8 [B, H, W, 3] (or [H, W, 3]) → normalized fp32 [B, crop, crop, 3].

    One fused XLA computation per distinct input size (weights cached).
    ``pil_quantize=True`` bit-nearly matches PIL/torchvision (the released
    model's transform); ``False`` is the pure-float resample (more accurate,
    marginally faster).
    """
    if images.ndim == 3:
        images = images[None]
    b, h, w, c = images.shape
    crop = crop or cfg.size
    wh, ww = _resize_crop_matrices(h, w, cfg.size, crop)
    return _preprocess_jit(
        jnp.asarray(images), wh, ww, pil_quantize, tuple(cfg.mean), tuple(cfg.std)
    )


def normalize_only(images: Array, cfg: PreprocessConfig = PreprocessConfig()) -> Array:
    """uint8/float [B, S, S, 3] already at target size → normalized fp32
    (the WSI tile path, where tiles are pre-cut at patch size)."""
    x = images.astype(jnp.float32)
    x = x / 255.0
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    return (x - mean) / std
