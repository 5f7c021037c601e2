"""Native C++ JPEG/PNG decoder vs PIL (bit parity on the fast path, PIL
fallback everywhere else) + threaded batch decode."""

import shutil
import time

import numpy as np
import pytest
from PIL import Image

HAS_GXX = shutil.which("g++") is not None

pytestmark = pytest.mark.skipif(not HAS_GXX, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth-ish content so JPEG actually exercises the DCT path
    base = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    paths = {}
    Image.fromarray(base).save(d / "rgb.jpg", quality=90)
    Image.fromarray(base).save(d / "prog.jpg", quality=85, progressive=True)
    Image.fromarray(base[..., 0]).save(d / "gray.jpg", quality=90)
    Image.fromarray(base).save(d / "rgb.png")
    Image.fromarray(base[..., 0]).save(d / "gray.png")
    Image.fromarray(base).convert("P", palette=Image.ADAPTIVE).save(d / "pal.png")
    rgba = np.concatenate([base, rng.integers(0, 255, (64, 80, 1), np.uint8)], -1)
    Image.fromarray(rgba).save(d / "rgba.png")  # → PIL fallback
    (d / "corrupt.jpg").write_bytes(b"\xff\xd8\xff" + b"junk" * 10)
    for f in d.iterdir():
        paths[f.name] = str(f)
    return paths


def _pil(path):
    return np.asarray(Image.open(path).convert("RGB"))


def test_decode_matches_pil_bitwise(images):
    from keep_tpu.io.fast_decode import decode_image

    for name in ["rgb.jpg", "prog.jpg", "gray.jpg", "rgb.png", "gray.png",
                 "pal.png"]:
        got = decode_image(images[name])
        want = _pil(images[name])
        assert got.shape == want.shape, name
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_alpha_png_falls_back_to_pil(images):
    from keep_tpu.io.fast_decode import decode_bytes, decode_image

    with open(images["rgba.png"], "rb") as f:
        assert decode_bytes(f.read()) is None  # fast path declines
    np.testing.assert_array_equal(
        decode_image(images["rgba.png"]), _pil(images["rgba.png"])
    )


def test_corrupt_stream_returns_none(images):
    from keep_tpu.io.fast_decode import decode_bytes

    with open(images["corrupt.jpg"], "rb") as f:
        assert decode_bytes(f.read()) is None


def test_batch_decode_mixed(images):
    from keep_tpu.io.fast_decode import decode_files

    names = ["rgb.jpg", "rgba.png", "pal.png", "gray.jpg", "rgb.png"]
    got = decode_files([images[n] for n in names], workers=4)
    for arr, n in zip(got, names):
        np.testing.assert_array_equal(arr, _pil(images[n]), err_msg=n)


def test_load_image_uses_fast_path(images, tmp_path):
    import os

    from keep_tpu.train.data import load_image

    d = os.path.dirname(images["rgb.jpg"])
    np.testing.assert_array_equal(
        load_image(d, "rgb.jpg"), _pil(images["rgb.jpg"])
    )


def test_threaded_batch_faster_than_pil(images, tmp_path):
    from keep_tpu.io.fast_decode import decode_files

    rng = np.random.default_rng(1)
    paths = []
    for i in range(48):
        arr = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
        p = tmp_path / f"t{i}.jpg"
        Image.fromarray(arr).save(p, quality=90)
        paths.append(str(p))

    def t(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_fast = t(lambda: decode_files(paths, workers=8))
    t_pil = t(lambda: [_pil(p) for p in paths])
    # 1.15 margin: on a loaded 1-CPU box the best-of-3 timings jitter by
    # ~10% — this asserts "not slower", the real speedup is measured in
    # docs/PERF.md, not here
    assert t_fast < 1.15 * t_pil, (t_fast, t_pil)


def test_preload_images_uses_batch_decode(tmp_path):
    import json

    from keep_tpu.train.data import GroupDataset, preload_images

    rng = np.random.default_rng(2)
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    groups = {}
    for g in range(3):
        names = []
        for k in range(2):
            name = f"g{g}_{k}.png"
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(imgs / name)
            names.append(name)
        groups[f"grp{g}"] = {"images": names, "captions": [f"cap {g}"]}
    ds = GroupDataset(groups, num_instance=2)
    pre = preload_images(ds, str(imgs), workers=2)
    assert len(pre) == 6
    for name, arr in pre.items():
        np.testing.assert_array_equal(arr, _pil(str(imgs / name)))


def test_16bit_png_falls_back_to_pil(tmp_path):
    # libpng's simplified API would linear->sRGB-convert 16-bit samples;
    # PIL takes the high byte — the fast path must decline
    import struct
    import zlib

    from keep_tpu.io.fast_decode import decode_bytes, decode_image

    w = h = 4
    rng = np.random.default_rng(3)
    raw16 = rng.integers(0, 65535, (h, w, 3), dtype=np.uint16)
    rows = b"".join(
        b"\x00" + raw16[y].astype(">u2").tobytes() for y in range(h)
    )

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(rows))
           + chunk(b"IEND", b""))
    p = tmp_path / "rgb16.png"
    p.write_bytes(png)
    assert decode_bytes(png) is None
    np.testing.assert_array_equal(
        decode_image(str(p)),
        np.asarray(Image.open(p).convert("RGB")),
    )


def test_decode_files_fallback_legs(tmp_path, monkeypatch):
    """Native-unavailable → whole batch through the threaded PIL pool (and
    the cached-failure RuntimeError); formats the native probe declines
    (GIF) land in the per-image PIL fallback; garbage bytes → None."""
    import pytest
    from PIL import Image

    from keep_tpu.io import fast_decode as fd

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 20, 3)).astype(np.uint8)
    jpg = tmp_path / "a.jpg"
    gif = tmp_path / "b.gif"
    Image.fromarray(img).save(jpg, quality=95)
    Image.fromarray(img).save(gif)

    outs = fd.decode_files([str(jpg), str(gif)], workers=2)
    assert outs[0].shape == (16, 20, 3) and outs[1].shape == (16, 20, 3)

    assert fd.decode_bytes(b"not an image") is None

    # simulate a missing/broken native toolchain: the cached-failure flag
    # raises immediately and decode_files degrades to the PIL pool
    monkeypatch.setattr(fd, "_lib", None)
    monkeypatch.setattr(fd, "_lib_failed", True)
    with pytest.raises(RuntimeError, match="cached failure"):
        fd._load_lib()
    outs = fd.decode_files([str(jpg), str(gif)], workers=2)
    assert outs[0].shape == (16, 20, 3) and outs[1].shape == (16, 20, 3)
