// Native data-loader core: threaded JPEG/PNG decode + bilinear resize +
// normalization into caller-owned float buffers.
//
// TPU-native analog of the reference's native data path (torch DataLoader's
// C++ worker pool feeding pinned buffers). The hot host-side loop during
// training is image decode + resize + normalize; doing it here with a thread
// pool keeps the Python side to a single ctypes call per batch and removes
// the per-sample Python/cv2 overhead.
//
// Build: g++ -O3 -march=native -shared -fPIC aloloader.cpp -ljpeg -lpng
//        -lpthread -o libaloloader.so
//
// C ABI (ctypes-friendly):
//   alo_load_batch(paths, n, out, H, W, mode, mean, std, n_threads) -> n_ok
//     mode: 0 = raw 0..255, 1 = /255, 2 = (x/255 - mean) / std per channel
//   failed decodes leave zeros and are reported via the ok[] mask.

#include <cstddef>  // size_t — jpeglib.h needs these pre-included
#include <cstdio>   // FILE

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<unsigned char> data;  // HWC RGB8
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const unsigned char* buf, size_t len, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->data.resize(size_t(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = img->data.data() +
                         size_t(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
struct PngReadState {
  const unsigned char* data;
  size_t len, pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "png: read past end");
  }
  memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

bool decode_png(const unsigned char* buf, size_t len, Image* img) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_mem_read);
  png_read_info(png, info);
  png_set_expand(png);           // palettes / low bit depth -> 8 bit
  png_set_strip_16(png);         // 16 bit -> 8 bit
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img->w = png_get_image_width(png, info);
  img->h = png_get_image_height(png, info);
  img->data.resize(size_t(img->w) * img->h * 3);
  std::vector<png_bytep> rows(img->h);
  for (int y = 0; y < img->h; ++y)
    rows[y] = img->data.data() + size_t(y) * img->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool read_file(const char* path, std::vector<unsigned char>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    fclose(f);
    return false;
  }
  out->resize(len);
  size_t got = fread(out->data(), 1, len, f);
  fclose(f);
  return got == size_t(len);
}

bool decode_any(const std::vector<unsigned char>& buf, Image* img) {
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8)
    return decode_jpeg(buf.data(), buf.size(), img);
  if (buf.size() >= 8 && !png_sig_cmp(buf.data(), 0, 8))
    return decode_png(buf.data(), buf.size(), img);
  // fall through: try both
  return decode_jpeg(buf.data(), buf.size(), img) ||
         decode_png(buf.data(), buf.size(), img);
}

// ------------------------------------------------- resize + normalize ----
// bilinear, half-pixel centers (matches jax.image.resize / cv2 INTER_LINEAR)
void resize_normalize(const Image& img, float* out, int oh, int ow, int mode,
                      const float* mean, const float* stddev) {
  const float sy = float(img.h) / oh;
  const float sx = float(img.w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= img.h ? img.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= img.h ? img.h - 1 : y0 + 1);
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= img.w ? img.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= img.w ? img.w - 1 : x0 + 1);
      const unsigned char* p00 = &img.data[(size_t(y0c) * img.w + x0c) * 3];
      const unsigned char* p01 = &img.data[(size_t(y0c) * img.w + x1c) * 3];
      const unsigned char* p10 = &img.data[(size_t(y1c) * img.w + x0c) * 3];
      const unsigned char* p11 = &img.data[(size_t(y1c) * img.w + x1c) * 3];
      float* o = out + (size_t(y) * ow + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        if (mode == 1) {
          v /= 255.f;
        } else if (mode == 2) {
          v = (v / 255.f - mean[c]) / stddev[c];
        }
        o[c] = v;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one image to HWC float32 at (oh, ow). Returns 0 on success.
int alo_decode_resize(const char* path, float* out, int oh, int ow, int mode,
                      const float* mean, const float* stddev) {
  std::vector<unsigned char> buf;
  if (!read_file(path, &buf)) return 1;
  Image img;
  if (!decode_any(buf, &img)) return 2;
  resize_normalize(img, out, oh, ow, mode, mean, stddev);
  return 0;
}

// Decode a batch in parallel. out: (n, oh, ow, 3) float32; ok: (n,) int32
// (1 = decoded). Returns the number of successful decodes.
int alo_load_batch(const char** paths, int n, float* out, int oh, int ow,
                   int mode, const float* mean, const float* stddev,
                   int n_threads, int* ok) {
  std::atomic<int> next(0), n_ok(0);
  const size_t stride = size_t(oh) * ow * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = alo_decode_resize(paths[i], out + stride * i, oh, ow, mode,
                                 mean, stddev);
      ok[i] = rc == 0 ? 1 : 0;
      if (rc == 0) {
        n_ok.fetch_add(1);
      } else {
        memset(out + stride * i, 0, stride * sizeof(float));
      }
    }
  };
  int workers = n_threads > 0 ? n_threads : 4;
  if (workers > n) workers = n;
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return n_ok.load();
}

// Image dimensions without a full decode (header only). Returns 0 on success.
int alo_image_size(const char* path, int* h, int* w) {
  std::vector<unsigned char> buf;
  if (!read_file(path, &buf)) return 1;
  Image img;
  if (!decode_any(buf, &img)) return 2;  // small images: full decode is fine
  *h = img.h;
  *w = img.w;
  return 0;
}

}  // extern "C"
