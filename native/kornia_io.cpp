// kornia_tpu native IO backend.
//
// TPU-native analogue of the reference's external Rust crate `kornia_rs`
// (kornia/io/io.py:24 — jpegturbo/png decode): libjpeg + libpng decoding,
// bilinear resize, and a std::thread batch loader that decodes a whole
// batch to a fixed-shape RGB8 tensor (ready for one host→device transfer).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
// Build: make -C native   (g++ -O3 -shared -fPIC ... -ljpeg -lpng)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct kio_jpeg_err {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void kio_jpeg_error_exit(j_common_ptr cinfo) {
  kio_jpeg_err* err = reinterpret_cast<kio_jpeg_err*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Returns 0 on success; fills w/h/c.
int kio_jpeg_info(const char* path, int* w, int* h, int* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  kio_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = kio_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  *c = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode to RGB8 (out must hold w*h*3). Returns 0 on success.
int kio_jpeg_read(const char* path, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  kio_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = kio_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int stride = cinfo.output_width * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

int kio_jpeg_write(const char* path, const uint8_t* buf, int w, int h,
                   int quality) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  jpeg_compress_struct cinfo;
  kio_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = kio_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  const int stride = w * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    const uint8_t* row = buf + cinfo.next_scanline * stride;
    jpeg_write_scanlines(&cinfo, const_cast<uint8_t**>(&row), 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

int kio_png_info(const char* path, int* w, int* h, int* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  *c = png_get_channels(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

// Decode any PNG to RGB8.
int kio_png_read(const char* path, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  // normalize everything to 8-bit RGB
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; y++) rows[y] = out + y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

int kio_png_write(const char* path, const uint8_t* buf, int w, int h, int c) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  int color = (c == 1) ? PNG_COLOR_TYPE_GRAY : PNG_COLOR_TYPE_RGB;
  png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; y++)
    rows[y] = const_cast<uint8_t*>(buf) + y * w * c;
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Generic dispatch + bilinear resize + threaded batch loader
// ---------------------------------------------------------------------------

static bool has_suffix(const char* path, const char* suf) {
  const size_t lp = strlen(path), ls = strlen(suf);
  if (ls > lp) return false;
  for (size_t i = 0; i < ls; i++) {
    char a = path[lp - ls + i];
    char b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

int kio_image_info(const char* path, int* w, int* h, int* c) {
  if (has_suffix(path, ".png")) return kio_png_info(path, w, h, c);
  return kio_jpeg_info(path, w, h, c);
}

int kio_image_read(const char* path, uint8_t* out) {
  if (has_suffix(path, ".png")) return kio_png_read(path, out);
  return kio_jpeg_read(path, out);
}

static void bilinear_resize_rgb(const uint8_t* src, int sw, int sh,
                                uint8_t* dst, int dw, int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int ch = 0; ch < 3; ch++) {
        float v00 = src[(y0 * sw + x0) * 3 + ch];
        float v01 = src[(y0 * sw + x1) * 3 + ch];
        float v10 = src[(y1 * sw + x0) * 3 + ch];
        float v11 = src[(y1 * sw + x1) * 3 + ch];
        float top = v00 * (1 - wx) + v01 * wx;
        float bot = v10 * (1 - wx) + v11 * wx;
        dst[(y * dw + x) * 3 + ch] =
            static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

// Decode n images (JPEG/PNG by extension), resize each to (out_w, out_h),
// write RGB8 into out (n * out_h * out_w * 3). status[i] = 0 on success.
// The data-loader hot path: one call, all cores.
int kio_read_batch(const char** paths, int n, int out_w, int out_h,
                   uint8_t* out, int* status, int num_threads) {
  if (num_threads <= 0)
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (num_threads > n) num_threads = n;
  if (num_threads < 1) num_threads = 1;

  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += num_threads) {
      int w = 0, h = 0, c = 0;
      status[i] = kio_image_info(paths[i], &w, &h, &c);
      if (status[i] != 0) continue;
      std::vector<uint8_t> tmp(static_cast<size_t>(w) * h * 3);
      status[i] = kio_image_read(paths[i], tmp.data());
      if (status[i] != 0) continue;
      uint8_t* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      if (w == out_w && h == out_h) {
        memcpy(dst, tmp.data(), tmp.size());
      } else {
        bilinear_resize_rgb(tmp.data(), w, h, dst, out_w, out_h);
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; t++) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
