// Native NYU data-loader core: RGB-coded depth PNG decode + metric-cube crop.
//
// C++ counterpart of the reference's offline preprocessing hot path
// (dataset/nyu_generator.py:43-68 + dataset/utils.py:70-124): decode depth
// from the G<<8|B channels of an 8-bit RGB PNG, back-project every pixel of
// the crop ROI, re-center on the cube center, and orthographically project
// into a small square patch (last-write-wins scatter, background 100).
// Where the reference's CUDA/C++ footprint was a render kernel, this
// framework's native footprint is the data loader: decoding ~220k PNGs
// dominates dataset preparation, and a std::thread pool here saturates the
// host cores without Python in the loop.
//
// Exposed as a plain C API consumed via ctypes
// (spherehand_tpu/data/native.py); no pybind11 dependency.

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Intrinsics {
  float fx, fy, cx, cy;
};

// Decode one NYU depth PNG (8-bit RGB, depth = G<<8 | B) into out[h*w].
// Returns 0 on success.
int decode_depth_png(const char* path, float* out, int expect_h, int expect_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return 2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  if ((int)height != expect_h || (int)width != expect_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }

  std::vector<png_byte> row(png_get_rowbytes(png, info));
  for (png_uint_32 y = 0; y < height; ++y) {
    png_read_row(png, row.data(), nullptr);
    for (png_uint_32 x = 0; x < width; ++x) {
      const int g = row[x * 3 + 1];
      const int b = row[x * 3 + 2];
      out[y * width + x] = (float)((g << 8) | b);
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Crop a metric cube around center into an out_size^2 orthographic patch.
// Mirrors dataset/utils.py:crop_dm exactly (int truncations, row-major
// last-write-wins scatter).
void crop_depth(const float* dm, int dm_h, int dm_w, const float* center,
                Intrinsics cam, float cube, int out_size, float background,
                float* out) {
  for (int i = 0; i < out_size * out_size; ++i) out[i] = background;

  const float half = cube / 2.0f;
  const float z0 = center[2] - half, z1 = center[2] + half;
  // Project the front-face corners to bound the ROI (utils.py:86-94).
  const float zc = center[2] - half;
  const float u0f = (center[0] - half) * cam.fx / zc + cam.cx;
  const float v0f = (center[1] - half) * cam.fy / zc + cam.cy;
  const float u1f = (center[0] + half) * cam.fx / zc + cam.cx;
  const float v1f = (center[1] + half) * cam.fy / zc + cam.cy;
  const int u_start = (int)std::fmax(u0f, 0.0f);
  const int u_end = (int)std::fmin(u1f, (float)dm_w);
  const int v_start = (int)std::fmax(v0f, 0.0f);
  const int v_end = (int)std::fmin(v1f, (float)dm_h);

  const float rfx = out_size / cube, rcx = out_size / 2.0f;

  for (int v = v_start; v < v_end; ++v) {
    for (int u = u_start; u < u_end; ++u) {
      const float d = dm[v * dm_w + u];
      if (d < z0 || d >= z1) continue;
      // perspective back-project, re-center, orthographic project
      const float x = ((float)u - cam.cx) * d / cam.fx - center[0];
      const float y = ((float)v - cam.cy) * d / cam.fy - center[1];
      const float z = d - center[2];
      const int ui = (int)(x * rfx + rcx);
      const int vi = (int)(y * rfx + rcx);
      if (ui < 0 || ui >= out_size || vi < 0 || vi >= out_size) continue;
      out[vi * out_size + ui] = z;
    }
  }
}

}  // namespace

extern "C" {

// Decode one PNG; returns 0 on success.
int shx_decode_depth_png(const char* path, float* out, int height, int width) {
  return decode_depth_png(path, out, height, width);
}

// Crop one depth map (already decoded).
void shx_crop_depth(const float* dm, int dm_h, int dm_w, const float* center,
                    float fx, float fy, float cx, float cy, float cube,
                    int out_size, float background, float* out) {
  crop_depth(dm, dm_h, dm_w, center, {fx, fy, cx, cy}, cube, out_size,
             background, out);
}

// Batched decode + crop over a thread pool.
//   paths:   num x null-terminated strings
//   centers: num x 3 floats (crop centers, camera space)
//   out:     num x out_size x out_size floats
// Returns the number of failed decodes (their outputs stay background).
int shx_decode_crop_batch(const char** paths, int num, const float* centers,
                          int dm_h, int dm_w, float fx, float fy, float cx,
                          float cy, float cube, int out_size, float background,
                          int num_threads, float* out) {
  std::atomic<int> next(0), failures(0);
  if (num_threads <= 0)
    num_threads = (int)std::thread::hardware_concurrency();

  auto worker = [&]() {
    std::vector<float> dm((size_t)dm_h * dm_w);
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= num) break;
      float* dst = out + (size_t)i * out_size * out_size;
      if (decode_depth_png(paths[i], dm.data(), dm_h, dm_w) != 0) {
        for (int k = 0; k < out_size * out_size; ++k) dst[k] = background;
        failures.fetch_add(1);
        continue;
      }
      crop_depth(dm.data(), dm_h, dm_w, centers + (size_t)i * 3,
                 {fx, fy, cx, cy}, cube, out_size, background, dst);
    }
  };

  std::vector<std::thread> threads;
  const int n_threads = std::min(num_threads, num > 0 ? num : 1);
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // extern "C"
