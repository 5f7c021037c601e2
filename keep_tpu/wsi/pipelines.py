"""Zero-shot WSI pipelines: detection, segmentation, subtyping.

Decision rules match the reference exactly (WSI_evaluation/
detection_utils.py:88-100, segment_utils.py:44-152, subtyping_utils.py:67-83):
softmax(logits·10), strict > threshold, first-seen dedupe, 2×2 neighbor
refine, Normal-class exclusion for subtyping — but the patch axis runs as one
batched device computation on a dense coordinate grid instead of Python dict
loops, and scales to 100K+ patches (shardable over the mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.metrics.classification import dice_from_counts, roc_best_threshold
from keep_tpu.ops.nn import l2_normalize
from keep_tpu.wsi.grid import CoordGrid, refine_grid

Array = jax.Array


@jax.jit
def score_tiles(classifier: Array, features: Array, scale: float = 10.0) -> Array:
    """[N, D] tile features × [D, C] classifier → [N, C] softmax(sim·scale)
    (the batched-similarity kernel; detection_utils.py:90-93)."""
    feats = l2_normalize(features.astype(jnp.float32))
    logits = jnp.dot(feats, classifier.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return jax.nn.softmax(logits * scale, axis=-1)


def score_tiles_sharded(
    classifier: Array,
    features: np.ndarray,
    mesh=None,
    scale: float = 10.0,
) -> Array:
    """``score_tiles`` with the patch axis sharded over the mesh's 'dp' axis —
    the TPU-native handling of the WSI long axis (10K–100K+ patches/slide,
    SURVEY §5): pad to the mesh, score shard-parallel, slice."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from keep_tpu.parallel import make_mesh, pad_to_multiple

    mesh = mesh or make_mesh()
    n_dev = mesh.shape["dp"]
    padded, n = pad_to_multiple(np.asarray(features), n_dev)
    feats = jax.device_put(jnp.asarray(padded), NamedSharding(mesh, P("dp")))
    cls = jax.device_put(jnp.asarray(classifier), NamedSharding(mesh, P()))
    probs = jax.jit(
        lambda c, f: score_tiles(c, f, scale),  # forward scale (parity
        # with the single-device path at any value)
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))),
        out_shardings=NamedSharding(mesh, P("dp")),
    )(cls, feats)
    return probs[:n]


def zero_shot_detection(
    classifier: Array,
    tile_features: Array,
    tile_coords: np.ndarray,
    patch_size: int = 256,
    overlap: bool = False,
    threshold: float = 0.5,
) -> float:
    """WSI tumor probability = fraction of (deduped) patches whose class-1
    prob exceeds ``threshold`` (detection_utils.py:88-100)."""
    grid = CoordGrid.from_coords(tile_coords, patch_size)
    probs_kept = _refined_probs(classifier, tile_features, grid, overlap)
    preds = probs_kept[:, 1] > threshold
    return float(jnp.mean(preds.astype(jnp.float32)))


def _refined_probs(
    classifier: Array,
    tile_features: Array,
    grid: CoordGrid,
    overlap: bool,
) -> Array:
    """[M, C] (optionally neighbor-refined) probabilities in first-seen
    patch order — the one copy of the scatter→refine→gather decision rule
    every pipeline shares."""
    probs = score_tiles(classifier, tile_features)
    if overlap:
        g, occ = grid.scatter(probs)
        return grid.gather(refine_grid(g, occ))
    return probs[jnp.asarray(grid.keep)]


def refined_tumor_probs(
    classifier: Array,
    tile_features: Array,
    grid: CoordGrid,
    overlap: bool = True,
) -> Array:
    """[M] refined class-1 probabilities in first-seen patch order."""
    return _refined_probs(classifier, tile_features, grid, overlap)[:, 1]


def tumor_heatmap(
    classifier: Array,
    tile_features: Array,
    tile_coords: np.ndarray,
    patch_size: int = 224,
    *,
    overlap: bool = True,
    downsample: int = 16,
) -> np.ndarray:
    """uint8 tumor-probability heatmap over the slide's patch bounding box.

    The visualization counterpart of the Dice painting
    (segment_utils.py:122-152): per-patch class-1 probabilities (optionally
    2×2-stencil refined, ``overlap``) scattered onto the dense coordinate
    grid and painted at ``patch_size/downsample`` pixels per patch —
    prob·255, unscored cells 0. Save with ``PIL.Image.fromarray``."""
    from keep_tpu.wsi.grid import heatmap_image

    grid = CoordGrid.from_coords(tile_coords, patch_size)
    probs = score_tiles(classifier, tile_features)
    g, occ = grid.scatter(probs)
    if overlap:
        g = refine_grid(g, occ)
    return heatmap_image(np.asarray(g[..., 1]), np.asarray(occ),
                         patch_size, downsample)


def subtype_class_map(
    classifier: Array,
    tile_features: Array,
    tile_coords: np.ndarray,
    patch_size: int = 256,
    *,
    overlap: bool = True,
    downsample: int = 16,
) -> np.ndarray:
    """uint8 class-index map: per occupied cell, argmax class + 1 (0 =
    unscored) at ``patch_size/downsample`` pixels per patch — the
    visualization of the subtyping refine (subtyping_utils.py:38-65).
    Map back to names via ``{i+1: classname}``; feed a palette for color."""
    grid = CoordGrid.from_coords(tile_coords, patch_size)
    probs = score_tiles(classifier, tile_features)
    g, occ = grid.scatter(probs)
    if overlap:
        g = refine_grid(g, occ)
    cls = (np.asarray(jnp.argmax(g, axis=-1)).astype(np.uint8) + 1) * (
        np.asarray(occ) > 0)
    cell = max(1, int(round(patch_size / downsample)))
    return np.kron(cls, np.ones((cell, cell), np.uint8))


def patch_labels_from_mask(
    mask: np.ndarray, coords: np.ndarray, patch_size: int
) -> np.ndarray:
    """Per-patch GT: 1 iff >50% of the level-0 mask pixels under the patch are
    nonzero (segment_utils.py:97-103). Vectorized via an integral image —
    replaces the per-patch OpenSlide read loop for in-memory masks."""
    nz = (np.asarray(mask) != 0).astype(np.int64)
    ii = np.zeros((nz.shape[0] + 1, nz.shape[1] + 1), np.int64)
    ii[1:, 1:] = nz.cumsum(0).cumsum(1)
    h, w = nz.shape
    out = np.zeros(len(coords), np.int64)
    for i, (x, y) in enumerate(np.asarray(coords, np.int64)):
        y0, x0 = min(max(y, 0), h), min(max(x, 0), w)
        y1, x1 = min(y + patch_size, h), min(x + patch_size, w)
        if y1 <= y0 or x1 <= x0:
            continue
        count = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
        out[i] = int(count > patch_size * patch_size / 2)
    return out


def dice_at_lowres(
    probs: np.ndarray,
    coords: np.ndarray,
    mask_lowres: np.ndarray,
    mag_num: int,
    patch_size: int,
    threshold: float,
) -> float:
    """Paint predicted patches into a ~16×-downsampled mask and compute Dice
    with the reference's nonzero·256 pixel counting (segment_utils.py:122-152)."""
    mask_img = np.asarray(mask_lowres)
    pred_mask = np.zeros_like(mask_img)
    ps = patch_size
    for (x, y), p in zip(np.asarray(coords, np.int64), np.asarray(probs)):
        if p > threshold:
            r0, c0 = int(y / mag_num), int(x / mag_num)
            pred_mask[r0 : int(y / mag_num + ps / mag_num), c0 : int(x / mag_num + ps / mag_num)] = 255
    mask_sum = np.count_nonzero(mask_img) * 256
    pred_sum = np.count_nonzero(pred_mask) * 256
    intersection = np.count_nonzero(mask_img * pred_mask) * 256
    return dice_from_counts(intersection, mask_sum, pred_sum)


def zero_shot_segment(
    classifier: Array,
    tile_features: Array,
    tile_coords: np.ndarray,
    mask: Optional[np.ndarray] = None,
    mask_path: Optional[str] = None,
    patch_size: int = 224,
    overlap: bool = True,
) -> tuple[float, float]:
    """(AUROC, Dice) for one slide (segment_utils.py:44-60).

    Ground truth from an in-memory level-0 ``mask`` array (vectorized), or
    from ``mask_path`` via OpenSlide when the library is present.
    """
    grid = CoordGrid.from_coords(tile_coords, patch_size)
    probs = np.asarray(refined_tumor_probs(classifier, tile_features, grid, overlap))
    kept = grid.kept_coords(tile_coords)

    if mask is not None:
        gt = patch_labels_from_mask(mask, kept, patch_size)
        # emulate the ~16× level the reference evaluates Dice at
        mag = 16
        lowres = np.asarray(mask)[::mag, ::mag]
    elif mask_path is not None:
        gt, lowres, mag = _mask_path_gt(mask_path, kept, patch_size)
    else:
        raise ValueError("provide mask or mask_path")

    auc, best_thd = roc_best_threshold(gt, probs)
    dice = dice_at_lowres(probs, kept, lowres, mag, patch_size, best_thd)
    return auc, dice


def _mask_path_gt(mask_path: str, coords: np.ndarray, patch_size: int):
    """Slide-file GT: OpenSlide when importable (reference parity,
    segment_utils.py:91-127), else the native pyramidal-TIFF reader
    (keep_tpu.io.wsi) — same decision rules either way."""
    try:
        return _openslide_gt(mask_path, coords, patch_size)
    except ImportError:
        return _tiffwsi_gt(mask_path, coords, patch_size)


def _tiffwsi_gt(mask_path: str, coords: np.ndarray, patch_size: int):
    from keep_tpu.io.wsi import WSIReader

    def to_gray(rgb: np.ndarray) -> np.ndarray:
        # PIL convert("L")'s exact fixed-point ITU-R 601 luma (rounded) —
        # the openslide branch goes through convert("L"), so edge pixels
        # must binarize identically here
        r, g, b = (rgb[..., i].astype(np.uint32) for i in range(3))
        return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
            np.uint8)

    with WSIReader(mask_path) as slide:
        gt = np.zeros(len(coords), np.int64)
        for i, (x, y) in enumerate(np.asarray(coords, np.int64)):
            region = to_gray(
                slide.read_region((int(x), int(y)), 0, (patch_size, patch_size))
            )
            gt[i] = int(np.count_nonzero(region) > patch_size * patch_size / 2)
        idx = slide.best_level_for_downsample(16)
        lowres = to_gray(
            slide.read_region((0, 0), idx, slide.level_dimensions[idx])
        )
        # truncate like the openslide branch's int(level_downsamples[idx])
        # so Dice is host-independent on non-power-of-2 pyramids
        return gt, lowres, int(slide.level_downsamples[idx])


def _openslide_gt(mask_path: str, coords: np.ndarray, patch_size: int):
    try:
        import openslide
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "OpenSlide is required for mask_path-based segmentation GT; "
            "pass an in-memory `mask` array instead"
        ) from e
    slide = openslide.open_slide(mask_path)
    gt = np.zeros(len(coords), np.int64)
    for i, (x, y) in enumerate(np.asarray(coords, np.int64)):
        region = np.array(
            slide.read_region((int(x), int(y)), 0, (patch_size, patch_size)).convert("L")
        )
        gt[i] = int(np.count_nonzero(region) > patch_size * patch_size / 2)
    idx = min(
        range(len(slide.level_downsamples)),
        key=lambda i: abs(slide.level_downsamples[i] - 16),
    )
    lowres = np.array(
        slide.read_region((0, 0), idx, slide.level_dimensions[idx]).convert("L")
    )
    return gt, lowres, int(slide.level_downsamples[idx])


def zero_shot_subtyping(
    classifier: Array,
    tile_features: Array,
    tile_coords: np.ndarray,
    patch_size: int = 256,
    overlap: bool = True,
    exclude_last_class: bool = True,
) -> tuple[int, np.ndarray]:
    """(predicted label, per-class patch fractions). Per-patch argmax of the
    refined softmax(logits·10); slide label = argmax of class fractions
    excluding the appended Normal class (subtyping_utils.py:67-83)."""
    grid = CoordGrid.from_coords(tile_coords, patch_size)
    kept = _refined_probs(classifier, tile_features, grid, overlap)
    pred_labels = jnp.argmax(kept, axis=-1)
    n_classes = int(classifier.shape[1])
    fractions = np.asarray(
        jnp.bincount(pred_labels, length=n_classes).astype(jnp.float32)
        / pred_labels.shape[0]
    )
    usable = fractions[:-1] if exclude_last_class else fractions
    return int(np.argmax(usable)), fractions


def probability_heatmap(
    classifier: Array,
    tile_features: Array,
    tile_coords: np.ndarray,
    patch_size: int = 224,
    overlap: bool = True,
    class_index: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """(heatmap [rows, cols], occupancy [rows, cols]) of refined per-patch
    class probabilities — the visual analog of the reference's painted pred
    mask (segment_utils.py:134-140), as a dense float image for display."""
    grid = CoordGrid.from_coords(tile_coords, patch_size)
    probs = score_tiles(classifier, tile_features)
    g, occ = grid.scatter(probs)
    if overlap:
        g = refine_grid(g, occ)
    heat = np.asarray(g[..., class_index]) * np.asarray(occ)
    return heat, np.asarray(occ)
