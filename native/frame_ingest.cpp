// Native host-side frame ingest for pmoe_tpu.
//
// The reference pipeline spends its host time in per-worker Python:
// cv2.imread -> crop -> PIL resize -> imgaug -> ToTensor (SURVEY §3.2 calls
// the data-worker chain a stage-2 throughput bottleneck). This library moves
// the decode -> crop -> bilinear-resize -> batch-collate path into C++ with a
// thread pool, producing the exact uint8 NHWC batches the jitted train step
// consumes (augmentation happens on the TPU).
//
// Exposed via a C ABI for ctypes (pmoe_tpu/data/native.py). Resize uses
// OpenCV-compatible half-pixel-center bilinear sampling so outputs match the
// cv2.INTER_LINEAR host path bit-for-bit up to rounding.
//
// Build: make -C native  (g++ + libpng16 + zlib, both in the base image)

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;
  int h = 0, w = 0, c = 0;
};

// Decode a PNG as 8-bit RGB (c=3) or grayscale (c=1).
bool decode_png(const char* path, int want_channels, Image* out) {
  png_image im;
  std::memset(&im, 0, sizeof(im));
  im.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&im, path)) return false;
  im.format = (want_channels == 1) ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  out->h = static_cast<int>(im.height);
  out->w = static_cast<int>(im.width);
  out->c = want_channels;
  out->data.resize(PNG_IMAGE_SIZE(im));
  if (!png_image_finish_read(&im, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&im);
    return false;
  }
  return true;
}

// OpenCV-compatible bilinear resize (half-pixel centers) of a cropped row
// range [top, src_h - bottom) into dst (out_h x out_w x c, uint8).
void crop_resize_bilinear(const Image& src, int top, int bottom, int out_h,
                          int out_w, uint8_t* dst) {
  const int c = src.c;
  const int crop_h = src.h - top - bottom;
  const int crop_w = src.w;
  const float sy = static_cast<float>(crop_h) / out_h;
  const float sx = static_cast<float>(crop_w) / out_w;
  const uint8_t* base = src.data.data() + static_cast<size_t>(top) * src.w * c;

  std::vector<int> x0s(out_w), x1s(out_w);
  std::vector<float> fxs(out_w);
  for (int ox = 0; ox < out_w; ++ox) {
    float fx = (ox + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    float dx = fx - x0;
    x0s[ox] = std::clamp(x0, 0, crop_w - 1);
    x1s[ox] = std::clamp(x0 + 1, 0, crop_w - 1);
    fxs[ox] = dx < 0 ? 0.0f : dx;
  }
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float dy = fy - y0;
    if (dy < 0) dy = 0.0f;
    int y0c = std::clamp(y0, 0, crop_h - 1);
    int y1c = std::clamp(y0 + 1, 0, crop_h - 1);
    const uint8_t* r0 = base + static_cast<size_t>(y0c) * src.w * c;
    const uint8_t* r1 = base + static_cast<size_t>(y1c) * src.w * c;
    uint8_t* drow = dst + static_cast<size_t>(oy) * out_w * c;
    for (int ox = 0; ox < out_w; ++ox) {
      const int x0 = x0s[ox] * c, x1 = x1s[ox] * c;
      const float dx = fxs[ox];
      for (int ch = 0; ch < c; ++ch) {
        float v = (1 - dy) * ((1 - dx) * r0[x0 + ch] + dx * r0[x1 + ch]) +
                  dy * ((1 - dx) * r1[x0 + ch] + dx * r1[x1 + ch]);
        drow[ox * c + ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one PNG, crop top/bottom rows, resize to (out_h, out_w).
// dst must hold out_h*out_w*channels bytes. Returns 0 on success.
int pmoe_ingest_frame(const char* path, int top, int bottom, int out_h,
                      int out_w, int channels, uint8_t* dst) {
  Image im;
  if (!decode_png(path, channels, &im)) return 1;
  if (im.h - top - bottom <= 0) return 2;
  crop_resize_bilinear(im, top, bottom, out_h, out_w, dst);
  return 0;
}

// Batch ingest with a thread pool: paths is n null-terminated strings
// concatenated; offsets[i] is the byte offset of path i. dst is the
// contiguous (n, out_h, out_w, channels) uint8 buffer.
// Returns the number of failed frames (0 = all good).
int pmoe_ingest_batch(const char* paths, const int64_t* offsets, int n,
                      int top, int bottom, int out_h, int out_w, int channels,
                      int num_threads, uint8_t* dst) {
  const size_t frame_bytes =
      static_cast<size_t>(out_h) * out_w * channels;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = pmoe_ingest_frame(paths + offsets[i], top, bottom, out_h,
                                 out_w, channels, dst + frame_bytes * i);
      if (rc != 0) failures.fetch_add(1);
    }
  };
  int t = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
