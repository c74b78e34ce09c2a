// Native image decode for the data loader.
//
// The reference's hot loop decodes PNGs synchronously via cv::imread
// (ref src/slam.cpp:112-113). Our host-side loader decodes through this
// libpng-backed C library instead: ctypes calls release the GIL, so the
// PrefetchingReader's worker threads decode genuinely in parallel with the
// TPU compute dispatch. Grayscale conversion uses integer BT.601 weights.
//
// C ABI (ctypes-friendly):
//   png_gray_read(path, out_buf, buf_capacity, &h, &w) -> 0 on success
//   png_gray_dims(path, &h, &w)                        -> 0 on success

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct PngReader {
  FILE* fp = nullptr;
  png_structp png = nullptr;
  png_infop info = nullptr;

  ~PngReader() {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    if (fp) fclose(fp);
  }

  // Opens the file and parses the header; returns false on any failure.
  bool open(const char* path) {
    fp = fopen(path, "rb");
    if (!fp) return false;
    unsigned char sig[8];
    if (fread(sig, 1, 8, fp) != 8 || png_sig_cmp(sig, 0, 8)) return false;
    png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                                 nullptr);
    if (!png) return false;
    info = png_create_info_struct(png);
    if (!info) return false;
    if (setjmp(png_jmpbuf(png))) return false;
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);
    return true;
  }
};

}  // namespace

extern "C" {

int png_gray_dims(const char* path, int* h, int* w) {
  PngReader r;
  if (!r.open(path)) return -1;
  *h = static_cast<int>(png_get_image_height(r.png, r.info));
  *w = static_cast<int>(png_get_image_width(r.png, r.info));
  return 0;
}

// Decodes into out as float32 grayscale (0..255), row-major [h, w].
int png_gray_read(const char* path, float* out, long capacity, int* h_out,
                  int* w_out) {
  PngReader r;
  if (!r.open(path)) return -1;
  if (setjmp(png_jmpbuf(r.png))) return -2;

  png_uint_32 h = png_get_image_height(r.png, r.info);
  png_uint_32 w = png_get_image_width(r.png, r.info);
  if (static_cast<long>(h) * static_cast<long>(w) > capacity) return -3;

  int bit_depth = png_get_bit_depth(r.png, r.info);
  int color_type = png_get_color_type(r.png, r.info);

  // Normalize every input layout to 8-bit RGB or gray.
  if (bit_depth == 16) png_set_strip_16(r.png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(r.png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(r.png);
  if (png_get_valid(r.png, r.info, PNG_INFO_tRNS))
    png_set_tRNS_to_alpha(r.png);
  png_set_strip_alpha(r.png);
  png_read_update_info(r.png, r.info);

  color_type = png_get_color_type(r.png, r.info);
  const bool rgb = (color_type == PNG_COLOR_TYPE_RGB);
  const size_t rowbytes = png_get_rowbytes(r.png, r.info);

  std::vector<unsigned char> row(rowbytes);
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(r.png, row.data(), nullptr);
    float* dst = out + static_cast<size_t>(y) * w;
    if (rgb) {
      for (png_uint_32 x = 0; x < w; ++x) {
        const unsigned char* p = &row[3 * x];
        // BT.601 integer luma, matching PIL's convert("L") rounding.
        dst[x] = static_cast<float>(
            (p[0] * 299 + p[1] * 587 + p[2] * 114 + 500) / 1000);
      }
    } else {
      for (png_uint_32 x = 0; x < w; ++x) dst[x] = row[x];
    }
  }
  *h_out = static_cast<int>(h);
  *w_out = static_cast<int>(w);
  return 0;
}

}  // extern "C"
