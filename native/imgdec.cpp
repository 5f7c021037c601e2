// Native image decoder — threaded JPEG/PNG decode for the training
// data-loader (the host hot path the reference delegates to PIL/cv2 worker
// processes, data_proc_group.py:246-249,282-283).
//
// Scope: the formats training corpora actually use — baseline/progressive
// JPEG (YCbCr/grayscale/RGB) and PNG without alpha (gray/palette/RGB).
// Anything else (CMYK JPEG, RGBA/tRNS PNG, other containers) returns a
// fallback code and the Python wrapper routes to PIL, so behavior is
// identical everywhere; both paths sit on the same libjpeg, so outputs are
// bit-identical where the fast path engages (asserted in
// tests/test_fast_decode.py).
//
// C ABI only (ctypes). Links: -ljpeg -lpng.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int kFmtJpeg = 0;
constexpr int kFmtPng = 1;
constexpr int kErrUnsupported = -1;  // wrapper falls back to PIL
constexpr int kErrCorrupt = -2;

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jump, 1);
}

bool is_jpeg(const uint8_t* buf, size_t len) {
  return len > 3 && buf[0] == 0xFF && buf[1] == 0xD8 && buf[2] == 0xFF;
}

bool is_png(const uint8_t* buf, size_t len) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  return len > 8 && std::memcmp(buf, sig, 8) == 0;
}

int probe_jpeg(const uint8_t* buf, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrCorrupt;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  int ok = kFmtJpeg;
  if (cinfo.jpeg_color_space != JCS_YCbCr &&
      cinfo.jpeg_color_space != JCS_GRAYSCALE &&
      cinfo.jpeg_color_space != JCS_RGB) {
    ok = kErrUnsupported;  // CMYK/YCCK: PIL's conversion is non-trivial
  }
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return ok;
}

int probe_png(const uint8_t* buf, size_t len, int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) {
    png_image_free(&image);
    return kErrCorrupt;
  }
  int ok = kFmtPng;
  if (image.format & PNG_FORMAT_FLAG_ALPHA) {
    ok = kErrUnsupported;  // PIL drops alpha without compositing; don't race it
  }
  if (image.format & PNG_FORMAT_FLAG_LINEAR) {
    // 16-bit channels: the simplified API would apply a linear->sRGB
    // transfer when downconverting, PIL takes the high byte — not parity
    ok = kErrUnsupported;
  }
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  png_image_free(&image);
  return ok;
}

int decode_jpeg(const uint8_t* buf, size_t len, uint8_t* out, int w, int h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrCorrupt;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // same libjpeg conversion PIL requests
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != w ||
      static_cast<int>(cinfo.output_height) != h ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return kErrCorrupt;
  }
  const size_t stride = static_cast<size_t>(w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int decode_png(const uint8_t* buf, size_t len, uint8_t* out, int w, int h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) {
    png_image_free(&image);
    return kErrCorrupt;
  }
  if (static_cast<int>(image.width) != w ||
      static_cast<int>(image.height) != h) {
    png_image_free(&image);
    return kErrCorrupt;
  }
  image.format = PNG_FORMAT_RGB;  // gray/palette expand losslessly
  if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) {
    png_image_free(&image);
    return kErrCorrupt;
  }
  return 0;
}

}  // namespace

extern "C" {

// Sniff format + dims. Returns kFmtJpeg/kFmtPng, or <0 (fallback to PIL).
int imgdec_probe(const uint8_t* buf, size_t len, int* w, int* h) {
  if (is_jpeg(buf, len)) return probe_jpeg(buf, len, w, h);
  if (is_png(buf, len)) return probe_png(buf, len, w, h);
  return kErrUnsupported;
}

// Decode into caller-allocated [h, w, 3] uint8 RGB. Returns 0 on success.
int imgdec_decode(const uint8_t* buf, size_t len, uint8_t* out, int w, int h) {
  if (is_jpeg(buf, len)) return decode_jpeg(buf, len, out, w, h);
  if (is_png(buf, len)) return decode_png(buf, len, out, w, h);
  return kErrUnsupported;
}

// Threaded batch decode: items partitioned over n_threads std::threads
// (each ctypes call releases the GIL, so decode runs truly parallel).
// rc[i] = 0 ok, <0 fallback/corrupt.
void imgdec_decode_batch(const uint8_t** bufs, const size_t* lens, int n,
                         uint8_t** outs, const int* ws, const int* hs,
                         int n_threads, int* rc) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads) {
        rc[i] = imgdec_decode(bufs[i], lens[i], outs[i], ws[i], hs[i]);
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
