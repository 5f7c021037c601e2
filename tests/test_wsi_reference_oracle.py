"""WSI decision rules vs the reference's OWN functions (real oracles).

test_wsi.py checks our grid/refine pipelines against an independent
dict-based re-statement of the documented rules; a shared misreading of
those rules would pass there. Here we import the actual
`detection_utils.refine_seg` / `zero_shot_detection`
(/root/reference/WSI_evaluation/detection_utils.py:39-100),
`segment_utils.refine_seg` / `zero_shot_segment` (:63-152, openslide mocked)
and `subtyping_utils.refine_seg` / `zero_shot_subtyping` (:38-90) and assert
equality on random sparse grids — duplicates, holes, non-origin offsets,
both patch sizes, overlap on/off.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from keep_tpu.wsi.grid import CoordGrid
from keep_tpu.wsi.pipelines import (
    refined_tumor_probs,
    score_tiles,
    zero_shot_detection,
    zero_shot_segment,
    zero_shot_subtyping,
)

REF = "/root/reference/WSI_evaluation"


@pytest.fixture(scope="module")
def ref_wsi():
    """Import the three reference WSI modules with their flat-layout imports
    (`from utils import cood2str`) and module-level `import openslide`
    satisfied; leave sys.modules clean of the generic 'utils' name after."""
    if not os.path.isdir(REF):
        pytest.skip("reference not present")
    if "openslide" not in sys.modules:
        stub = types.ModuleType("openslide")
        stub.open_slide = None  # replaced per-test via monkeypatch
        sys.modules["openslide"] = stub
    saved_utils = sys.modules.pop("utils", None)
    sys.path.insert(0, REF)
    try:
        import detection_utils
        import segment_utils
        import subtyping_utils
    finally:
        sys.path.remove(REF)
        if saved_utils is not None:
            sys.modules["utils"] = saved_utils
        else:
            sys.modules.pop("utils", None)
    return types.SimpleNamespace(
        detection=detection_utils, segment=segment_utils,
        subtyping=subtyping_utils)


def make_slide(rng, n=300, ps=256, holes=0.35, dup=7, offset=(0, 0), d=24):
    """Random sparse coordinate grid with holes, duplicates, and an origin
    offset (all of which the reference's string-keyed dicts handle)."""
    side = int(np.sqrt(n / (1 - holes))) + 2
    cells = [(r, c) for r in range(side) for c in range(side)]
    rng.shuffle(cells)
    cells = cells[:n]
    coords = np.array(
        [(c * ps + offset[0], r * ps + offset[1]) for r, c in cells], np.int64
    )
    if dup:
        coords = np.concatenate([coords, coords[:dup]], axis=0)
    feats = rng.standard_normal((len(coords), d), dtype=np.float32)
    return coords, feats


def _coords_list(coords):
    # the reference iterates `for coods, logits in zip(coords_slide, ...)`
    # with coords as an [N, 2] numpy array (utils.py:53-55)
    return np.asarray(coords, np.int64)


@pytest.mark.parametrize("ps,overlap,offset", [
    (256, False, (0, 0)),       # the detection config (detection_utils.py:88)
    (256, True, (0, 0)),
    (224, True, (96, 32)),      # segmentation patch size, offset origin
    (224, False, (13, 13)),
])
def test_detection_vs_reference(ref_wsi, rng, ps, overlap, offset):
    coords, feats = make_slide(rng, n=260, ps=ps, offset=offset)
    cls = rng.standard_normal((feats.shape[1], 2), dtype=np.float32)

    ref = ref_wsi.detection.zero_shot_detection(
        torch.from_numpy(cls), torch.from_numpy(feats), _coords_list(coords),
        patch_size=ps, overlap=overlap)
    got = zero_shot_detection(jnp.asarray(cls), jnp.asarray(feats), coords,
                              patch_size=ps, overlap=overlap)
    assert got == pytest.approx(float(ref), abs=1e-6)


@pytest.mark.parametrize("ps,overlap", [(224, True), (256, False)])
def test_refined_probs_vs_reference_refine_seg(ref_wsi, rng, ps, overlap):
    """Per-coordinate refined class-1 probabilities, keyed exactly as the
    reference keys them ('x_y' strings, first-seen dedupe)."""
    coords, feats = make_slide(rng, n=220, ps=ps, offset=(ps, 2 * ps))
    cls = rng.standard_normal((feats.shape[1], 2), dtype=np.float32)
    probs_t = torch.softmax(
        torch.from_numpy(
            feats / np.linalg.norm(feats, axis=1, keepdims=True)
        ) @ torch.from_numpy(cls) * 10, dim=1)

    ref_probs = ref_wsi.segment.refine_seg(
        probs_t, _coords_list(coords), patch_size=ps, overlap=overlap)

    grid = CoordGrid.from_coords(coords, ps)
    got = np.asarray(refined_tumor_probs(
        jnp.asarray(cls), jnp.asarray(feats), grid, overlap=overlap))
    kept = grid.kept_coords(coords)
    assert len(got) == len(ref_probs)
    for (x, y), v in zip(kept, got):
        assert v == pytest.approx(ref_probs[f"{x}_{y}"], abs=1e-5)


@pytest.mark.parametrize("ps,overlap,ncls", [(256, True, 4), (224, True, 3),
                                             (256, False, 5)])
def test_subtyping_vs_reference(ref_wsi, rng, ps, overlap, ncls):
    coords, feats = make_slide(rng, n=240, ps=ps)
    cls = rng.standard_normal((feats.shape[1], ncls), dtype=np.float32)

    ref_label = ref_wsi.subtyping.zero_shot_subtyping(
        torch.from_numpy(cls), torch.from_numpy(feats), _coords_list(coords),
        patch_size=ps, overlap=overlap)
    got_label, fractions = zero_shot_subtyping(
        jnp.asarray(cls), jnp.asarray(feats), coords, patch_size=ps,
        overlap=overlap)
    assert got_label == int(ref_label)

    # per-class fractions against the reference's refine preds directly
    probs_t = torch.softmax(
        torch.from_numpy(
            feats / np.linalg.norm(feats, axis=1, keepdims=True)
        ) @ torch.from_numpy(cls) * 10, dim=1)
    ref_preds = ref_wsi.subtyping.refine_seg(
        probs_t, _coords_list(coords), patch_size=ps, overlap=overlap)
    vals = np.array(list(ref_preds.values()))
    ref_frac = np.array([(vals == i).mean() for i in range(ncls)])
    np.testing.assert_allclose(fractions, ref_frac, atol=1e-6)


class _FakeRegion:
    def __init__(self, arr):
        self._arr = np.asarray(arr, np.uint8)

    def convert(self, mode):
        assert mode == "L"
        return self._arr


class _FakeSlide:
    """OpenSlide semantics (as in test_wsi_openslide_mock.py): read_region
    takes a level-0 location and a size at `level`."""

    def __init__(self, mask, downsamples=(1.0, 4.0, 16.0, 64.0)):
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


def test_segmentation_auc_dice_vs_reference(ref_wsi, rng, monkeypatch):
    """Full zero_shot_segment (AUROC + Youden threshold + Dice painting) vs
    the reference's own function over a mocked OpenSlide mask."""
    ps = 224
    side = 9
    coords = np.array(
        [(c * ps, r * ps) for r in range(side) for c in range(side)], np.int64
    )
    # features correlated with a left-half tumor mask + noise, so the ROC
    # curve has interior points and the Youden threshold is non-trivial
    tumor = (coords[:, 0] < 4 * ps).astype(np.float32)
    d = np.zeros(24, np.float32)
    d[0] = 1.0
    feats = (np.outer(2 * tumor - 1, d)
             + 0.6 * rng.standard_normal((len(coords), 24))).astype(np.float32)
    cls = np.stack([-d, d], axis=1).astype(np.float32)
    mask = np.zeros((side * ps, side * ps), np.uint8)
    mask[:, : 4 * ps] = 255
    mask[: 2 * ps, 4 * ps : 5 * ps] = 255  # a partial-coverage column

    fake = _FakeSlide(mask)
    monkeypatch.setattr(sys.modules["openslide"], "open_slide",
                        lambda path: fake)
    ref_auc, ref_dice = ref_wsi.segment.zero_shot_segment(
        torch.from_numpy(cls), torch.from_numpy(feats), _coords_list(coords),
        "/fake/mask.tif", patch_size=ps, overlap=True)

    auc, dice = zero_shot_segment(
        jnp.asarray(cls), jnp.asarray(feats), coords, mask=mask,
        patch_size=ps, overlap=True)
    assert auc == pytest.approx(float(ref_auc), abs=1e-6)
    assert dice == pytest.approx(float(ref_dice), abs=1e-6)
