// plasticnet_native — native runtime components for plastic_unet_tpu.
//
// The reference is pure Python (SURVEY.md §2.2: no native code anywhere), so
// these are new, TPU-framework-side runtime pieces, not ports:
//   * rle_encode_batch: column-major run-length encoding of binary masks
//     (output-compatible with reference src/utils/rle_encode.py:6-17),
//     multithreaded across masks — the ~18k-tile submission encode.
//   * load_png_gray_batch: threaded grayscale PNG tile loader (libpng),
//     skimage-compatible semantics (8/16-bit native range; RGB -> ITU-R
//     601-2 luma in [0,1]) feeding the host staging buffers.
//   * iou_threshold_sweep: the Kaggle batch-IoU metric over a threshold
//     grid (reference eval.py:52 hot loop) for CPU-side use.
//
// ABI: plain C, bound from Python with ctypes (ops/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// RLE
// ---------------------------------------------------------------------------

// Encode one (h, w) row-major binary mask in column-major (Fortran) order.
// Appends "start len start len ..." (1-based starts) to `out`.
static void rle_encode_one(const uint8_t* mask, int h, int w, std::string* out) {
  char buf[32];
  long run_start = 0;  // 1-based position of the current run
  long run_len = 0;
  long pos = 0;
  for (int c = 0; c < w; ++c) {
    const uint8_t* col = mask + c;
    for (int r = 0; r < h; ++r) {
      ++pos;  // 1-based flat index in F order
      if (col[(size_t)r * w]) {
        if (run_len == 0) run_start = pos;
        ++run_len;
      } else if (run_len) {
        int n = snprintf(buf, sizeof buf, "%ld %ld ", run_start, run_len);
        out->append(buf, n);
        run_len = 0;
      }
    }
  }
  if (run_len) {
    int n = snprintf(buf, sizeof buf, "%ld %ld ", run_start, run_len);
    out->append(buf, n);
  }
  if (!out->empty() && out->back() == ' ') out->pop_back();
}

// Encode `n` masks (n, h, w) uint8 row-major. Writes NUL-separated strings
// into `out_buf` (capacity `out_cap`). Returns total bytes written
// (including NULs) or -1 on overflow.
long long rle_encode_batch(const uint8_t* masks, int n, int h, int w,
                           char* out_buf, long long out_cap, int n_threads) {
  std::vector<std::string> results((size_t)n);
  if (n_threads < 1) n_threads = 1;
  n_threads = std::min<int>(n_threads, std::max(1u, std::thread::hardware_concurrency()));
  std::atomic<int> next(0);
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      rle_encode_one(masks + (size_t)i * h * w, h, w, &results[(size_t)i]);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  long long off = 0;
  for (int i = 0; i < n; ++i) {
    long long need = (long long)results[(size_t)i].size() + 1;
    if (off + need > out_cap) return -1;
    memcpy(out_buf + off, results[(size_t)i].data(), results[(size_t)i].size());
    off += need;
    out_buf[off - 1] = '\0';
  }
  return off;
}

// ---------------------------------------------------------------------------
// PNG loading (skimage as_grey semantics)
// ---------------------------------------------------------------------------

// Decode one PNG to float64 grayscale of exactly (h, w); returns 0 on
// success. Grayscale sources keep native integer range; RGB -> luma [0, 1].
// Images whose size differs from (h, w) are bilinear-resized.
static int load_png_gray_one(const char* path, int out_h, int out_w, double* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (depth == 16) png_set_swap(png);  // little-endian reads below
  png_read_update_info(png, info);
  color = png_get_color_type(png, info);
  depth = png_get_bit_depth(png, info);
  int channels = png_get_channels(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> data((size_t)h * rowbytes);
  std::vector<png_bytep> rows((size_t)h);
  for (png_uint_32 r = 0; r < h; ++r) rows[r] = data.data() + (size_t)r * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  // to float64 grayscale at native size
  std::vector<double> gray((size_t)h * w);
  const double maxv = depth == 16 ? 65535.0 : 255.0;
  for (png_uint_32 r = 0; r < h; ++r) {
    for (png_uint_32 c = 0; c < w; ++c) {
      double v;
      if (channels >= 3) {
        double rr, gg, bb;
        if (depth == 16) {
          const uint16_t* px = (const uint16_t*)(rows[r]) + (size_t)c * channels;
          rr = px[0]; gg = px[1]; bb = px[2];
        } else {
          const uint8_t* px = rows[r] + (size_t)c * channels;
          rr = px[0]; gg = px[1]; bb = px[2];
        }
        v = (0.2125 * rr + 0.7154 * gg + 0.0721 * bb) / maxv;  // luma [0,1]
      } else {
        v = depth == 16 ? (double)((const uint16_t*)(rows[r]))[c]
                        : (double)rows[r][c];  // native range
      }
      gray[(size_t)r * w + c] = v;
    }
  }

  if ((int)h == out_h && (int)w == out_w) {
    memcpy(out, gray.data(), sizeof(double) * (size_t)out_h * out_w);
    return 0;
  }
  // bilinear resize, half-pixel centers (matches data/images.py)
  for (int r = 0; r < out_h; ++r) {
    double y = std::min(std::max((r + 0.5) * ((double)h / out_h) - 0.5, 0.0), (double)h - 1);
    int y0 = std::min((int)y, (int)h - 1), y1 = std::min(y0 + 1, (int)h - 1);
    double fy = y - y0;
    for (int c = 0; c < out_w; ++c) {
      double x = std::min(std::max((c + 0.5) * ((double)w / out_w) - 0.5, 0.0), (double)w - 1);
      int x0 = std::min((int)x, (int)w - 1), x1 = std::min(x0 + 1, (int)w - 1);
      double fx = x - x0;
      double a = gray[(size_t)y0 * w + x0], b = gray[(size_t)y0 * w + x1];
      double d = gray[(size_t)y1 * w + x0], e = gray[(size_t)y1 * w + x1];
      out[(size_t)r * out_w + c] = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + d * fy * (1 - fx) + e * fy * fx;
    }
  }
  return 0;
}

// Load `n` PNGs (paths NUL-separated in `paths`) into out (n, h, w) float64.
// Returns the number of failures.
int load_png_gray_batch(const char* paths, int n, int h, int w, double* out, int n_threads) {
  std::vector<const char*> ptrs((size_t)n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[(size_t)i] = p;
    p += strlen(p) + 1;
  }
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (load_png_gray_one(ptrs[(size_t)i], h, w, out + (size_t)i * h * w) != 0)
        failures.fetch_add(1);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return failures.load();
}

// ---------------------------------------------------------------------------
// IoU threshold sweep (reference eval.py:52 semantics, see ops/iou.py)
// ---------------------------------------------------------------------------

// y_true (n, pix) float32, preds (n, pix) float32, thresholds (T,) float32.
// For each threshold: mean over images of mean_{kt in 0.5:.05:.95}[iou > kt],
// with the 1e-9 zero-replacement of the reference metric. Writes (T,) out.
void iou_threshold_sweep(const float* y_true, const float* preds, int n, long long pix,
                         const float* thresholds, int T, float* out, int n_threads) {
  // Precompute per-image true-positive masks once.
  std::vector<long long> t_sum((size_t)n, 0);
  std::vector<uint8_t> t_mask((size_t)n * pix);
  for (int i = 0; i < n; ++i) {
    const float* row = y_true + (size_t)i * pix;
    long long s = 0;
    uint8_t* tm = t_mask.data() + (size_t)i * pix;
    for (long long j = 0; j < pix; ++j) {
      tm[j] = row[j] >= 0.5f;
      s += tm[j];
    }
    t_sum[(size_t)i] = s;
  }
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&] {
    for (;;) {
      int t = next.fetch_add(1);
      if (t >= T) return;
      float thr = thresholds[t];
      double acc = 0;
      for (int i = 0; i < n; ++i) {
        const float* row = preds + (size_t)i * pix;
        const uint8_t* tm = t_mask.data() + (size_t)i * pix;
        long long inter = 0, psum = 0;
        for (long long j = 0; j < pix; ++j) {
          uint8_t pv = row[j] > thr;
          psum += pv;
          inter += pv & tm[j];
        }
        double di = inter ? (double)inter : 1e-9;
        double du = (double)(t_sum[(size_t)i] + psum - inter);
        if (du == 0) du = 1e-9;
        double iou = di / du;
        int cnt = 0;
        for (double kt = 0.5; kt < 1.0 - 1e-12; kt += 0.05) cnt += iou > kt;
        acc += cnt / 10.0;
      }
      out[t] = (float)(acc / n);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int th = 0; th < n_threads; ++th) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
}

}  // extern "C"
