// Native pyramidal-TIFF whole-slide reader/writer (libtiff).
//
// The reference stack needs OpenSlide + CLAM preprocessing before any of its
// WSI pipelines run (WSI_evaluation/segment_utils.py:91-127 reads GT masks
// through openslide.OpenSlide; features come from CLAM h5). This module
// removes that dependency for the dominant slide container: Aperio .svs and
// generic pyramidal .tif are both tiled multi-directory TIFFs that libtiff
// reads directly. Scope: 8-bit RGB/YCbCr/grayscale/palette pyramids, tiled
// or stripped, any libtiff-configured codec (JPEG/Deflate/LZW/none);
// exotic containers (.ndpi JPEG streams, .mrxs) still need OpenSlide and
// the Python wrapper (keep_tpu/io/wsi.py) routes there when importable.
//
// Also a writer: build a tiled pyramidal TIFF from a level-0 RGB image
// (2x2 box-filtered levels) — the "make me a pyramid from this PNG" utility
// the reference has no analog for, and the fixture generator for tests.
//
// C ABI only (ctypes). Links: -ltiff. Handles are mutex-guarded (a TIFF*
// is not thread-safe); distinct handles may be used concurrently.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <tiffio.h>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrLevel = -2;
constexpr int kErrRead = -3;
constexpr int kErrWrite = -4;
constexpr int kErrArgs = -5;

struct Level {
  tdir_t dir;        // TIFF directory index
  uint32_t w, h;
};

struct Slide {
  TIFF* tif;
  std::vector<Level> levels;
  std::mutex mu;
};

// libtiff error/warning handlers are process-global; silence them once so
// partially-broken slides don't spew to the caller's stderr (failures are
// reported through return codes instead).
struct SilenceTiff {
  SilenceTiff() {
    TIFFSetErrorHandler(nullptr);
    TIFFSetWarningHandler(nullptr);
  }
} silence_tiff;

// RGBA (TIFFGetR/G/B packing) raster row -> RGB output row.
void rgba_row_to_rgb(const uint32_t* src, uint8_t* dst, uint32_t n) {
  for (uint32_t i = 0; i < n; ++i) {
    uint32_t p = src[i];
    dst[3 * i + 0] = static_cast<uint8_t>(TIFFGetR(p));
    dst[3 * i + 1] = static_cast<uint8_t>(TIFFGetG(p));
    dst[3 * i + 2] = static_cast<uint8_t>(TIFFGetB(p));
  }
}

}  // namespace

extern "C" {

int tiffwsi_codec_ok(int compression) {
  return TIFFIsCODECConfigured(static_cast<uint16_t>(compression)) ? 1 : 0;
}

// Open a pyramidal (or flat) TIFF. Directories whose aspect ratio deviates
// >5% from the first full-resolution directory are skipped (Aperio label /
// macro images), and — when the base directory is tiled — so are stripped
// directories (the Aperio SVS thumbnail is a stripped page with the
// slide's aspect ratio; OpenSlide likewise only counts tiled directories
// as levels). Remaining levels are sorted by descending width.
void* tiffwsi_open(const char* path) {
  TIFF* tif = TIFFOpen(path, "rm");  // m: no mmap — files can exceed RAM
  if (!tif) return nullptr;
  auto* s = new Slide{tif, {}, {}};
  tdir_t dir = 0;
  uint32_t w0 = 0, h0 = 0;
  bool base_tiled = false;
  do {
    uint32_t w = 0, h = 0;
    if (!TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w) ||
        !TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h) || !w || !h) {
      ++dir;
      continue;
    }
    if (w0 == 0) {
      w0 = w;
      h0 = h;
      base_tiled = TIFFIsTiled(tif);
    } else {
      double ar0 = double(w0) / double(h0), ar = double(w) / double(h);
      if (ar < 0.95 * ar0 || ar > 1.05 * ar0) {  // label/macro page
        ++dir;
        continue;
      }
      if (base_tiled && !TIFFIsTiled(tif)) {  // SVS stripped thumbnail
        ++dir;
        continue;
      }
    }
    s->levels.push_back({dir, w, h});
    ++dir;
  } while (TIFFReadDirectory(tif));
  if (s->levels.empty()) {
    TIFFClose(tif);
    delete s;
    return nullptr;
  }
  for (size_t i = 1; i < s->levels.size(); ++i) {  // insertion sort, desc w
    Level key = s->levels[i];
    size_t j = i;
    for (; j > 0 && s->levels[j - 1].w < key.w; --j) s->levels[j] = s->levels[j - 1];
    s->levels[j] = key;
  }
  return s;
}

void tiffwsi_close(void* handle) {
  auto* s = static_cast<Slide*>(handle);
  if (!s) return;
  {
    std::lock_guard<std::mutex> lock(s->mu);
    TIFFClose(s->tif);
  }
  delete s;
}

int tiffwsi_level_count(void* handle) {
  auto* s = static_cast<Slide*>(handle);
  return s ? static_cast<int>(s->levels.size()) : 0;
}

int tiffwsi_level_dims(void* handle, int level, uint32_t* w, uint32_t* h) {
  auto* s = static_cast<Slide*>(handle);
  if (!s || level < 0 || level >= static_cast<int>(s->levels.size()))
    return kErrLevel;
  *w = s->levels[level].w;
  *h = s->levels[level].h;
  return kOk;
}

// Read a w*h RGB region whose top-left corner is (x, y) IN LEVEL
// COORDINATES. Out-of-bounds parts of the window come back zero (black),
// matching OpenSlide's read_region edge behavior.
//
// TIFFReadRGBATile/Strip return bottom-origin rasters: image row r of a
// tile/strip lands at raster row (tile_h - 1 - r) — edge tiles included,
// libtiff shifts partial reads to keep that mapping (tif_getimage.c
// TIFFReadRGBATile's memmove); the copy loops below invert it.
int tiffwsi_read_region(void* handle, int level, int64_t x, int64_t y,
                        uint32_t w, uint32_t h, uint8_t* out) {
  auto* s = static_cast<Slide*>(handle);
  if (!s || !out) return kErrArgs;
  if (level < 0 || level >= static_cast<int>(s->levels.size()))
    return kErrLevel;
  if (w == 0 || h == 0) return kOk;
  std::lock_guard<std::mutex> lock(s->mu);
  const Level& lv = s->levels[level];
  if (!TIFFSetDirectory(s->tif, lv.dir)) return kErrLevel;
  std::memset(out, 0, size_t(w) * h * 3);

  // Clip the window to the level; (ox, oy) is where the clipped part sits
  // inside the output buffer.
  int64_t x0 = x < 0 ? 0 : x, y0 = y < 0 ? 0 : y;
  int64_t x1 = x + w, y1 = y + h;
  if (x1 > lv.w) x1 = lv.w;
  if (y1 > lv.h) y1 = lv.h;
  if (x0 >= x1 || y0 >= y1) return kOk;  // fully outside: all zeros
  int64_t ox = x0 - x, oy = y0 - y;

  if (TIFFIsTiled(s->tif)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(s->tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(s->tif, TIFFTAG_TILELENGTH, &th);
    if (!tw || !th) return kErrRead;
    std::vector<uint32_t> raster(size_t(tw) * th);
    for (int64_t ty = (y0 / th) * th; ty < y1; ty += th) {
      for (int64_t tx = (x0 / tw) * tw; tx < x1; tx += tw) {
        std::memset(raster.data(), 0, raster.size() * sizeof(uint32_t));
        if (!TIFFReadRGBATile(s->tif, uint32_t(tx), uint32_t(ty),
                              raster.data()))
          return kErrRead;
        int64_t cx0 = x0 > tx ? x0 : tx;
        int64_t cy0 = y0 > ty ? y0 : ty;
        int64_t cx1 = x1 < tx + tw ? x1 : tx + tw;
        int64_t cy1 = y1 < ty + th ? y1 : ty + th;
        for (int64_t yy = cy0; yy < cy1; ++yy) {
          const uint32_t* src =
              raster.data() + size_t(th - 1 - (yy - ty)) * tw + (cx0 - tx);
          uint8_t* dst = out + (size_t(yy - y) * w + (cx0 - x)) * 3;
          rgba_row_to_rgb(src, dst, uint32_t(cx1 - cx0));
        }
      }
    }
    (void)ox;
    (void)oy;
  } else {
    uint32_t rps = 0;
    TIFFGetFieldDefaulted(s->tif, TIFFTAG_ROWSPERSTRIP, &rps);
    if (!rps || rps > lv.h) rps = lv.h;
    std::vector<uint32_t> raster(size_t(lv.w) * rps);
    for (int64_t sy = (y0 / rps) * rps; sy < y1; sy += rps) {
      uint32_t nrows = uint32_t(sy + rps > lv.h ? lv.h - sy : rps);
      std::memset(raster.data(), 0, raster.size() * sizeof(uint32_t));
      if (!TIFFReadRGBAStrip(s->tif, uint32_t(sy), raster.data()))
        return kErrRead;
      int64_t cy0 = y0 > sy ? y0 : sy;
      int64_t cy1 = y1 < sy + nrows ? y1 : sy + nrows;
      for (int64_t yy = cy0; yy < cy1; ++yy) {
        const uint32_t* src =
            raster.data() + size_t(nrows - 1 - (yy - sy)) * lv.w + x0;
        uint8_t* dst = out + (size_t(yy - y) * w + ox) * 3;
        rgba_row_to_rgb(src, dst, uint32_t(x1 - x0));
      }
    }
  }
  return kOk;
}

// Batched threaded region reads: n same-size regions at one level, decoded
// on up to `threads` worker threads, each with its OWN TIFF handle (a
// TIFF* is single-threaded; per-thread handles instead of a shared mutex
// so JPEG tile decode scales). xy = int64[n*2] (x, y) level coords;
// out = n consecutive w*h*3 RGB buffers. Returns 0 or the first error.
int tiffwsi_read_regions(const char* path, int level, const int64_t* xy,
                         int n, uint32_t w, uint32_t h, uint8_t* out,
                         int threads) {
  if (!path || !xy || !out || n < 0) return kErrArgs;
  if (n == 0) return kOk;
  int t = threads < 1 ? 1 : threads;
  if (t > n) t = n;
  std::atomic<int> next(0), err(0);
  auto worker = [&]() {
    void* handle = tiffwsi_open(path);
    if (!handle) {
      err.store(kErrOpen);
      return;
    }
    int i;
    while ((i = next.fetch_add(1)) < n && !err.load()) {
      int rc = tiffwsi_read_region(handle, level, xy[2 * i], xy[2 * i + 1],
                                   w, h, out + size_t(i) * w * h * 3);
      if (rc != 0) err.store(rc);
    }
    tiffwsi_close(handle);
  };
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int k = 0; k < t; ++k) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

// Append a STRIPPED RGB directory to an existing TIFF — composes
// Aperio-like layouts (tiled pyramid + stripped thumbnail page) for tests
// and tooling; the reader intentionally skips such pages on tiled slides.
int tiffwsi_append_stripped(const char* path, const uint8_t* rgb, uint32_t w,
                            uint32_t h) {
  if (!path || !rgb || !w || !h) return kErrArgs;
  TIFF* tif = TIFFOpen(path, "a");
  if (!tif) return kErrOpen;
  TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, w);
  TIFFSetField(tif, TIFFTAG_IMAGELENGTH, h);
  TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
  TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
  TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
  TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
  TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
  TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
  TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, 16);
  for (uint32_t r = 0; r < h; ++r) {
    if (TIFFWriteScanline(tif, const_cast<uint8_t*>(rgb + size_t(r) * w * 3),
                          r, 0) < 0) {
      TIFFClose(tif);
      return kErrWrite;
    }
  }
  if (!TIFFWriteDirectory(tif)) {
    TIFFClose(tif);
    return kErrWrite;
  }
  TIFFClose(tif);
  return kOk;
}

// Build a tiled pyramidal TIFF from a level-0 RGB image. Levels 2x2
// box-downsample until max(w, h) <= min_size or max_levels reached.
// compression: 0 none, 1 deflate, 2 jpeg(quality).
int tiffwsi_write_pyramid(const char* path, const uint8_t* rgb, uint32_t w,
                          uint32_t h, uint32_t tile, int max_levels,
                          uint32_t min_size, int compression, int quality) {
  if (!path || !rgb || !w || !h || tile % 16) return kErrArgs;  // TIFF spec:
  // tile dims must be multiples of 16
  uint16_t comp = compression == 2   ? COMPRESSION_JPEG
                  : compression == 1 ? COMPRESSION_ADOBE_DEFLATE
                                     : COMPRESSION_NONE;
  if (!TIFFIsCODECConfigured(comp)) return kErrWrite;
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return kErrOpen;

  std::vector<uint8_t> cur(rgb, rgb + size_t(w) * h * 3);
  uint32_t lw = w, lh = h;
  int written = 0;
  while (true) {
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, lw);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, lh);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, tile);
    TIFFSetField(tif, TIFFTAG_TILELENGTH, tile);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, comp);
    if (comp == COMPRESSION_JPEG) {
      // YCbCr-in-file, RGB at the API boundary — the standard SVS layout
      TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_YCBCR);
      TIFFSetField(tif, TIFFTAG_JPEGCOLORMODE, JPEGCOLORMODE_RGB);
      TIFFSetField(tif, TIFFTAG_JPEGQUALITY, quality > 0 ? quality : 85);
      TIFFSetField(tif, TIFFTAG_YCBCRSUBSAMPLING, 1, 1);
    } else {
      TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
    }
    if (written > 0)
      TIFFSetField(tif, TIFFTAG_SUBFILETYPE, FILETYPE_REDUCEDIMAGE);

    std::vector<uint8_t> tbuf(size_t(tile) * tile * 3);
    for (uint32_t ty = 0; ty < lh; ty += tile) {
      for (uint32_t tx = 0; tx < lw; tx += tile) {
        std::memset(tbuf.data(), 0, tbuf.size());
        uint32_t cw = tx + tile > lw ? lw - tx : tile;
        uint32_t ch = ty + tile > lh ? lh - ty : tile;
        for (uint32_t r = 0; r < ch; ++r)
          std::memcpy(tbuf.data() + size_t(r) * tile * 3,
                      cur.data() + (size_t(ty + r) * lw + tx) * 3,
                      size_t(cw) * 3);
        if (TIFFWriteTile(tif, tbuf.data(), tx, ty, 0, 0) < 0) {
          TIFFClose(tif);
          return kErrWrite;
        }
      }
    }
    if (!TIFFWriteDirectory(tif)) {
      TIFFClose(tif);
      return kErrWrite;
    }
    ++written;
    if ((max_levels > 0 && written >= max_levels) ||
        (lw <= min_size && lh <= min_size) || lw < 2 || lh < 2)
      break;

    // 2x2 box filter (odd trailing row/col: clamp to edge)
    uint32_t nw = (lw + 1) / 2, nh = (lh + 1) / 2;
    std::vector<uint8_t> nxt(size_t(nw) * nh * 3);
    for (uint32_t yy = 0; yy < nh; ++yy) {
      uint32_t y0i = 2 * yy, y1i = y0i + 1 < lh ? y0i + 1 : y0i;
      for (uint32_t xx = 0; xx < nw; ++xx) {
        uint32_t x0i = 2 * xx, x1i = x0i + 1 < lw ? x0i + 1 : x0i;
        for (int c = 0; c < 3; ++c) {
          uint32_t sum = cur[(size_t(y0i) * lw + x0i) * 3 + c] +
                         cur[(size_t(y0i) * lw + x1i) * 3 + c] +
                         cur[(size_t(y1i) * lw + x0i) * 3 + c] +
                         cur[(size_t(y1i) * lw + x1i) * 3 + c];
          nxt[(size_t(yy) * nw + xx) * 3 + c] =
              static_cast<uint8_t>((sum + 2) / 4);
        }
      }
    }
    cur.swap(nxt);
    lw = nw;
    lh = nh;
  }
  TIFFClose(tif);
  return kOk;
}

}  // extern "C"
