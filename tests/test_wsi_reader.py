"""Native pyramidal-TIFF WSI reader/writer (native/tiffwsi.cpp +
keep_tpu/io/wsi.py) — the OpenSlide-free slide path.

The reference reads real slides only through openslide.OpenSlide
(WSI_evaluation/segment_utils.py:91-127) and consumes CLAM-precomputed
features otherwise; here pyramidal TIFF/SVS reads natively via libtiff.
Everything is verified against numpy ground truth on synthetic pyramids
written by our own writer AND against PIL-written stripped TIFFs (an
independent producer).
"""

import numpy as np
import pytest

from keep_tpu.io.wsi import WSIReader, open_slide, write_pyramid


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.fixture(scope="module")
def level0(rng):
    # odd, non-tile-aligned dims on purpose
    return rng.integers(0, 256, (531, 777, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def pyramid_path(tmp_path_factory, level0):
    p = tmp_path_factory.mktemp("wsi") / "pyr.tif"
    write_pyramid(str(p), level0, tile=64, compression="deflate", min_size=64)
    return str(p)


def _box2(img):
    """The writer's 2x2 box filter (edge-clamped odd dims, round-half-up)."""
    h, w = img.shape[:2]
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    pad = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    s = pad.astype(np.uint32).reshape(ph // 2, 2, pw // 2, 2, 3).sum((1, 3))
    return ((s + 2) // 4).astype(np.uint8)


def test_levels_and_dims(pyramid_path, level0):
    with WSIReader(pyramid_path) as s:
        assert s.backend == "native"
        assert s.dimensions == (777, 531)
        assert s.level_dimensions[0] == (777, 531)
        assert s.level_dimensions[1] == (389, 266)
        # downsamples roughly double
        for i in range(1, s.level_count):
            assert s.level_downsamples[i] == pytest.approx(2.0**i, rel=0.05)
        assert s.level_dimensions[-1][0] <= 64 or s.level_dimensions[-1][1] <= 64


def test_full_level_reads_are_exact(pyramid_path, level0):
    with WSIReader(pyramid_path) as s:
        got = s.read_region((0, 0), 0, s.level_dimensions[0])
        np.testing.assert_array_equal(got, level0)
        # level 1 equals the writer's own box filter exactly
        got1 = s.read_region((0, 0), 1, s.level_dimensions[1])
        np.testing.assert_array_equal(got1, _box2(level0))


def test_window_reads_match_numpy(pyramid_path, level0):
    with WSIReader(pyramid_path) as s:
        for (x, y, w, h) in [(0, 0, 64, 64), (63, 1, 65, 130),
                             (700, 500, 77, 31), (128, 256, 256, 256)]:
            got = s.read_region((x, y), 0, (w, h))
            np.testing.assert_array_equal(got, level0[y:y + h, x:x + w])


def test_out_of_bounds_zero_fill(pyramid_path, level0):
    with WSIReader(pyramid_path) as s:
        got = s.read_region((750, 520), 0, (64, 64))
        ref = np.zeros((64, 64, 3), np.uint8)
        ref[:11, :27] = level0[520:, 750:]
        np.testing.assert_array_equal(got, ref)
        got = s.read_region((-10, -5), 0, (32, 32))
        ref = np.zeros((32, 32, 3), np.uint8)
        ref[5:, 10:] = level0[:27, :22]
        np.testing.assert_array_equal(got, ref)
        # fully outside
        assert not s.read_region((10_000, 10_000), 0, (16, 16)).any()


def test_level0_coordinate_semantics(pyramid_path, level0):
    """read_region location is level-0 coords regardless of level
    (OpenSlide contract)."""
    with WSIReader(pyramid_path) as s:
        got = s.read_region((100, 60), 1, (50, 40))
        ref = _box2(level0)[30:70, 50:100]
        np.testing.assert_array_equal(got, ref)


def test_best_level_and_thumbnail(pyramid_path, level0):
    with WSIReader(pyramid_path) as s:
        assert s.best_level_for_downsample(1) == 0
        assert s.best_level_for_downsample(2) == 1
        assert s.best_level_for_downsample(16) == min(4, s.level_count - 1)
        th = s.get_thumbnail((100, 100))
        assert th.shape[0] <= 100 and th.shape[1] <= 100
        assert th.ndim == 3 and th.shape[2] == 3


def test_jpeg_pyramid_close_to_source(tmp_path, level0):
    # smooth gradient compresses predictably (random noise would not)
    yy, xx = np.mgrid[0:240, 0:320]
    img = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1).astype(np.uint8)
    p = tmp_path / "jp.tif"
    write_pyramid(str(p), img, tile=64, compression="jpeg", quality=95,
                  min_size=64)
    with WSIReader(str(p)) as s:
        got = s.read_region((0, 0), 0, (320, 240))
        assert np.mean(np.abs(got.astype(int) - img.astype(int))) < 3.0


def test_pil_written_stripped_tiff_native_and_fallback(tmp_path, rng):
    """An independently-produced (PIL, stripped, single-level) TIFF reads
    identically through the native strip path and the PIL fallback."""
    from PIL import Image

    img = rng.integers(0, 256, (123, 217, 3), dtype=np.uint8)
    p = tmp_path / "strip.tif"
    Image.fromarray(img).save(p)
    with WSIReader(str(p), backend="native") as s:
        assert s.level_count == 1
        np.testing.assert_array_equal(
            s.read_region((0, 0), 0, (217, 123)), img)
        np.testing.assert_array_equal(
            s.read_region((30, 17), 0, (64, 100)), img[17:117, 30:94])
    with WSIReader(str(p), backend="pil") as s:
        assert s.backend == "pil"
        np.testing.assert_array_equal(
            s.read_region((0, 0), 0, (217, 123)), img)
        np.testing.assert_array_equal(
            s.read_region((30, 17), 0, (64, 100)), img[17:117, 30:94])


def test_pil_backend_on_pyramid_matches_native(pyramid_path, level0):
    with WSIReader(pyramid_path, backend="pil") as s:
        assert s.level_count >= 4
        np.testing.assert_array_equal(
            s.read_region((0, 0), 0, (777, 531)), level0)
        np.testing.assert_array_equal(
            s.read_region((100, 60), 1, (50, 40)), _box2(level0)[30:70, 50:100])


def test_open_slide_helper_and_errors(pyramid_path, tmp_path):
    s = open_slide(pyramid_path)
    assert s.level_count >= 4
    s.close()
    with pytest.raises(OSError):
        WSIReader(str(tmp_path / "nope.tif"), backend="native")
    with pytest.raises(ValueError):
        WSIReader(pyramid_path, backend="martian")
    bad = tmp_path / "not_a_tiff.tif"
    bad.write_bytes(b"hello world, definitely not TIFF")
    with pytest.raises(Exception):
        open_slide(str(bad))


def test_svs_stripped_thumbnail_page_not_a_level(tmp_path, level0):
    """Aperio SVS layout: [tiled full-res, STRIPPED thumbnail (slide
    aspect), tiled reduced levels]. The stripped page must not appear in
    level_dimensions (it would corrupt level indices/downsamples vs
    OpenSlide and best_level_for_downsample could pick it as Dice GT)."""
    from keep_tpu.io.wsi import append_stripped_page

    p = tmp_path / "aperio_like.tif"
    write_pyramid(str(p), level0, tile=64, min_size=64)
    with WSIReader(str(p)) as s:
        dims_before = list(s.level_dimensions)
    thumb = _box2(_box2(level0))  # same aspect as the slide
    append_stripped_page(str(p), thumb)
    # libtiff appends at the end; a real SVS has it at directory 1 — the
    # filter is order-independent (any stripped page on a tiled slide)
    for backend in ("native", "pil"):
        with WSIReader(str(p), backend=backend) as s:
            assert s.level_dimensions == dims_before, backend
    # flat stripped files are still fine: stripped base keeps its pages
    from PIL import Image

    flat = tmp_path / "flat.tif"
    Image.fromarray(thumb).save(flat)
    with WSIReader(str(flat)) as s:
        assert s.level_count == 1


def test_empty_slide_keeps_feature_width(tmp_path):
    """A no-tissue slide writes (0, projection_dim) features, not (0, 0)."""
    from keep_tpu.wsi.extract import extract_features

    class ToyModel:
        class cfg:
            projection_dim = 7

        def encode_image(self, pixels):  # pragma: no cover - never called
            raise AssertionError

    feats = extract_features(ToyModel(), iter(()), batch_size=4)
    assert feats.shape == (0, 7)


def test_write_pyramid_validates(tmp_path):
    with pytest.raises(ValueError):
        write_pyramid(str(tmp_path / "x.tif"), np.zeros((4, 4), np.uint8))
    with pytest.raises(OSError):
        write_pyramid(str(tmp_path / "x.tif"),
                      np.zeros((4, 4, 3), np.uint8), tile=50)  # not %16


def _tissue_image(rng, h=600, w=800, patch=64):
    """White background + a saturated tissue blob covering known tiles."""
    img = np.full((h, w, 3), 250, np.uint8)
    region = img[100:400, 200:600]
    region[:] = [180, 60, 120]  # saturated "tissue"
    region += rng.integers(0, 20, region.shape, dtype=np.uint8)
    return img


def test_iter_wsi_tiles_matches_cut_tiles(tmp_path, rng):
    """Streaming tiles from the pyramid == in-memory cut_tiles on the same
    array (tissue selection is thumbnail-based so compare supersets on the
    unambiguous interior tiles)."""
    from keep_tpu.io.tiles import cut_tiles, iter_wsi_tiles

    img = _tissue_image(rng)
    p = tmp_path / "tissue.tif"
    write_pyramid(str(p), img, tile=64, min_size=128)

    chunks = list(iter_wsi_tiles(str(p), patch_size=64, tissue_fraction=0.5,
                                 chunk=32))
    tiles = np.concatenate([t for t, _ in chunks])
    coords = np.concatenate([c for _, c in chunks])
    # pixel-exactness: every streamed tile equals the source window
    for t, (x, y) in zip(tiles, coords):
        np.testing.assert_array_equal(t, img[y:y + 64, x:x + 64])
    # the fully-interior tissue tiles must all be present
    ref_tiles, ref_coords = cut_tiles(img, patch_size=64, tissue_fraction=0.99)
    got = {tuple(c) for c in coords.tolist()}
    for c in ref_coords.tolist():
        assert tuple(c) in got


def test_iter_wsi_tiles_level1(tmp_path, rng):
    from keep_tpu.io.tiles import iter_wsi_tiles

    img = _tissue_image(rng)
    p = tmp_path / "tissue1.tif"
    write_pyramid(str(p), img, tile=64, min_size=128)
    chunks = list(iter_wsi_tiles(str(p), patch_size=64, tissue_fraction=0.5,
                                 chunk=1000, level=1))
    assert chunks
    tiles, coords = chunks[0]
    lvl1 = _box2(img)
    for t, (x, y) in zip(tiles, coords):
        np.testing.assert_array_equal(t, lvl1[y:y + 64, x:x + 64])


def test_read_regions_batched_threaded(pyramid_path, level0, rng):
    """read_regions == N read_region calls, on every thread count and
    level (per-thread TIFF handles in C++; order preserved)."""
    with WSIReader(pyramid_path) as s:
        locs = np.stack([
            rng.integers(-16, 760, 12), rng.integers(-16, 520, 12)
        ], axis=1).astype(np.int64)
        ref = np.stack([s.read_region(l, 0, (96, 80)) for l in locs])
        for threads in (1, 4, 16):
            got = s.read_regions(locs, 0, (96, 80), threads=threads)
            np.testing.assert_array_equal(got, ref)
        # level-1 semantics identical too
        ref1 = np.stack([s.read_region(l, 1, (40, 40)) for l in locs])
        np.testing.assert_array_equal(s.read_regions(locs, 1, (40, 40)), ref1)
        # empty batch
        assert s.read_regions(np.zeros((0, 2)), 0, (8, 8)).shape == (0, 8, 8, 3)
    # PIL fallback path agrees
    with WSIReader(pyramid_path, backend="pil") as s:
        np.testing.assert_array_equal(s.read_regions(locs, 0, (96, 80)), ref)


def test_segmentation_mask_path_native_fallback(tmp_path):
    """zero_shot_segment(mask_path=...) without OpenSlide: the native
    reader branch must agree with the in-memory mask branch on the same
    pyramid-written mask."""
    from keep_tpu.wsi.pipelines import _mask_path_gt, _tiffwsi_gt

    h0 = w0 = 1024
    mask = np.zeros((h0, w0), np.uint8)
    mask[0:512, 0:768] = 255  # tumor region
    rgb = np.repeat(mask[..., None], 3, axis=2)
    p = tmp_path / "mask.tif"
    write_pyramid(str(p), rgb, tile=64, min_size=32)

    coords = np.array([[0, 0], [512, 0], [768, 0], [0, 512], [512, 512]],
                      np.int64)
    ps = 256
    gt, lowres, mag = _mask_path_gt(str(p), coords, ps)  # no openslide here
    np.testing.assert_array_equal(gt, [1, 1, 0, 0, 0])
    assert mag == 16
    # lowres equals the box-filtered pyramid level (grayscale of an
    # RGB-replicated mask is the mask)
    assert lowres.shape == (64, 64)
    assert (lowres > 0).mean() == pytest.approx(0.375, abs=0.01)

    gt2, lowres2, mag2 = _tiffwsi_gt(str(p), coords, ps)
    np.testing.assert_array_equal(gt, gt2)
    np.testing.assert_array_equal(lowres, lowres2)
    assert mag == mag2


def test_extract_wsi_to_h5_streams(tmp_path, rng):
    """End-to-end: pyramid slide → streaming tiles → features h5; features
    equal the in-memory extract on the same tiles."""
    import h5py

    from keep_tpu.io.tiles import iter_wsi_tiles
    from keep_tpu.wsi.extract import extract_features, extract_wsi_to_h5

    img = _tissue_image(rng, h=320, w=320)
    p = tmp_path / "slide.tif"
    write_pyramid(str(p), img, tile=64, min_size=64)

    class ToyModel:
        def encode_image(self, pixels):
            import jax.numpy as jnp

            return jnp.mean(pixels, axis=(1, 2))  # [B, 3] "features"

    out = tmp_path / "feat.h5"
    n = extract_wsi_to_h5(ToyModel(), str(p), str(out), patch_size=64,
                          tissue_fraction=0.5, batch_size=8)
    with h5py.File(out) as f:
        feats = f["features"][:]
        coords = f["coords"][:]
    assert n == len(coords) == len(feats) and n > 0

    chunks = list(iter_wsi_tiles(str(p), patch_size=64, tissue_fraction=0.5,
                                 chunk=8))
    tiles = np.concatenate([t for t, _ in chunks])
    ref = extract_features(ToyModel(), tiles, batch_size=8)
    np.testing.assert_allclose(feats, ref, rtol=1e-6)
    np.testing.assert_array_equal(
        coords, np.concatenate([c for _, c in chunks]))


def test_thumbnail_level_pick_respects_request_size(tmp_path, rng):
    """On >2x-spaced pyramids (Aperio 4x layout) the thumbnail must come
    from the smallest level still >= the requested size, not a level below
    it (regression: the old pick degraded every downstream tissue mask)."""
    from PIL import Image

    base = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
    # hand-build a 4x-spaced stripped pyramid via PIL: 400x300, 100x75
    p = tmp_path / "sparse.tif"
    im0 = Image.fromarray(base)
    im1 = im0.resize((100, 75))
    im0.save(str(p), save_all=True, append_images=[im1])
    with WSIReader(str(p)) as s:
        assert s.level_count == 2
        th = s.get_thumbnail((200, 150))
        # must be downsampled from level 0 (400x300), not upscaled-from or
        # raw level 1 (100x75)
        assert th.shape[:2] == (150, 200), th.shape
        want = np.asarray(Image.fromarray(base).resize(
            (200, 150), Image.Resampling.BICUBIC))
        # same content at same scale (loose tolerance: PIL thumbnail uses
        # draft/antialias internally)
        assert np.mean(np.abs(th.astype(int) - want.astype(int))) < 30
        # larger-than-slide requests fall back to level 0 unscaled
        big = s.get_thumbnail((10000, 10000))
        assert big.shape[:2] == (300, 400)


def test_closed_reader_raises_clearly(pyramid_path):
    s = WSIReader(pyramid_path)
    s.read_region((0, 0), 0, (4, 4))
    s.close()
    if s.backend == "native":
        with pytest.raises(ValueError, match="closed"):
            s.read_region((0, 0), 0, (4, 4))


def test_reader_and_writer_error_branches(tmp_path):
    """Fail-fast legs: native open on a non-TIFF raises OSError, bad input
    shapes to the writers raise ValueError, and appending into an
    unwritable path surfaces the native rc."""
    import pytest

    from keep_tpu.io.wsi import WSIReader, append_stripped_page, write_pyramid

    junk = tmp_path / "junk.tif"
    junk.write_bytes(b"this is not a tiff at all")
    with pytest.raises(OSError, match="native libtiff cannot open"):
        WSIReader(str(junk), backend="native")

    gray = np.zeros((32, 32), np.uint8)
    with pytest.raises(ValueError, match=r"\[H, W, 3\]"):
        append_stripped_page(str(tmp_path / "x.tif"), gray)
    with pytest.raises(ValueError):
        write_pyramid(str(tmp_path / "y.tif"), gray, tile=16)

    rgb = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(OSError):
        append_stripped_page(str(tmp_path / "no_dir" / "z.tif"), rgb)
