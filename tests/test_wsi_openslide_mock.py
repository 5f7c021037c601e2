"""`_openslide_gt` coverage via a sys.modules-injected fake OpenSlide.

The image has no openslide, so the real-WSI segmentation GT branch
(wsi/pipelines.py `_openslide_gt`; reference segment_utils.py:91-127) is
exercised here against a synthetic level-0 mask: read_region windowing, the
>50%-nonzero patch rule, level-selection arithmetic, and full
`zero_shot_segment(mask_path=...)` agreement with the integral-image
in-memory path on the same mask.
"""

import sys
import types

import numpy as np
import pytest

from keep_tpu.wsi.pipelines import (
    _openslide_gt,
    patch_labels_from_mask,
    zero_shot_segment,
)

PS = 224  # segmentation patch size (segment_utils.py:44)


class _FakeRegion:
    """PIL-like: .convert('L') then np.array(...) yields the mask window."""

    def __init__(self, arr):
        self._arr = np.asarray(arr, np.uint8)

    def convert(self, mode):
        assert mode == "L"
        return self._arr


class _FakeSlide:
    """OpenSlide semantics: read_region(location_level0, level, size_at_level);
    regions index the level-0 mask strided by the level's downsample."""

    def __init__(self, mask, downsamples):
        self.mask = np.asarray(mask, np.uint8)
        self.level_downsamples = list(downsamples)
        h, w = self.mask.shape
        self.level_dimensions = [
            (int(w // d), int(h // d)) for d in self.level_downsamples
        ]

    def read_region(self, loc, level, size):
        x, y = int(loc[0]), int(loc[1])
        w, h = int(size[0]), int(size[1])
        d = int(self.level_downsamples[level])
        return _FakeRegion(self.mask[y : y + h * d : d, x : x + w * d : d])


def _install(monkeypatch, slides: dict):
    mod = types.ModuleType("openslide")
    mod.open_slide = lambda path: slides[path]
    monkeypatch.setitem(sys.modules, "openslide", mod)


def _mask_and_coords(rng):
    """2240x2240 level-0 mask with a tumor blob; 10x10 aligned patch grid."""
    mask = np.zeros((2240, 2240), np.uint8)
    mask[300:1200, 500:1700] = 255  # covers some patches >50%, grazes others
    coords = np.array(
        [(c * PS, r * PS) for r in range(10) for c in range(10)], np.int64
    )
    return mask, coords


def test_gt_matches_integral_image_path(monkeypatch):
    rng = np.random.default_rng(0)
    mask, coords = _mask_and_coords(rng)
    _install(monkeypatch, {"/fake/slide.tif": _FakeSlide(mask, [1.0, 4.0, 16.0, 64.0])})

    gt, lowres, mag = _openslide_gt("/fake/slide.tif", coords, PS)
    ref_gt = patch_labels_from_mask(mask, coords, PS)
    np.testing.assert_array_equal(gt, ref_gt)
    assert gt.sum() > 0 and gt.sum() < len(gt)  # both classes present
    assert mag == 16
    np.testing.assert_array_equal(lowres, mask[::16, ::16])


def test_level_selection_picks_nearest_to_16(monkeypatch):
    mask, coords = _mask_and_coords(np.random.default_rng(0))
    # nearest to 16 is 17 (|17-16| < |4-16|); reference picks by min |d-16|
    _install(monkeypatch, {"/fake/s17.tif": _FakeSlide(mask, [1.0, 4.0, 17.0])})
    _, lowres, mag = _openslide_gt("/fake/s17.tif", coords, PS)
    assert mag == 17
    assert lowres.shape == (2240 // 17, 2240 // 17)


def test_zero_shot_segment_mask_path_agrees_with_in_memory(monkeypatch):
    """Full pipeline parity: mask_path (fake openslide) vs mask array on the
    same synthetic slide — identical AUROC and Dice."""
    rng = np.random.default_rng(1)
    mask, coords = _mask_and_coords(rng)
    _install(monkeypatch, {"/fake/slide.tif": _FakeSlide(mask, [1.0, 4.0, 16.0, 64.0])})

    # synthetic features loosely correlated with GT so AUROC is non-trivial
    gt = patch_labels_from_mask(mask, coords, PS)
    d = 16
    w_tumor = rng.standard_normal(d)
    w_norm = rng.standard_normal(d)
    feats = np.stack([
        (w_tumor if g else w_norm) + 0.8 * rng.standard_normal(d) for g in gt
    ]).astype(np.float32)
    classifier = np.stack([w_norm, w_tumor], axis=1).astype(np.float32)
    classifier /= np.linalg.norm(classifier, axis=0, keepdims=True)

    auc_a, dice_a = zero_shot_segment(classifier, feats, coords, mask=mask,
                                      patch_size=PS)
    auc_b, dice_b = zero_shot_segment(classifier, feats, coords,
                                      mask_path="/fake/slide.tif", patch_size=PS)
    assert auc_a == pytest.approx(auc_b, abs=1e-9)
    assert dice_a == pytest.approx(dice_b, abs=1e-9)
    assert 0.5 < auc_a <= 1.0 and 0.0 < dice_a <= 1.0


def test_missing_openslide_raises_helpfully(monkeypatch):
    monkeypatch.setitem(sys.modules, "openslide", None)
    with pytest.raises(ImportError, match="mask"):
        _openslide_gt("/nope.tif", np.zeros((1, 2), np.int64), PS)
