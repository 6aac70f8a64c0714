// dsf_host: native host-side preprocessing kernels.
//
// The reference leans on OpenCV C++ (cv2.resize / warpPerspective /
// warpAffine, render_loader.py:408, 476-481, 795) inside its 4 Python
// dataloader workers.  This library provides the same primitives as a
// dependency-free C++ shared object driven through ctypes (see
// dsf_tpu/data/native.py): depth-aware crop (comToBounds + getCrop +
// nearest resize + centered paste), 3x3 perspective warp with nearest
// sampling, in-plane rotation warp, and depth normalization — the exact
// semantics of the NumPy/cv2 path in dsf_tpu/data/crop.py, threaded
// over a batch.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// crop_deep_pp: comToBounds crop -> aspect-preserving nearest resize ->
// centered paste into (dsize x dsize).  Writes the 3x3 matrix M (row
// major) mapping full-frame px -> crop px.  Matches
// dsf_tpu/data/crop.py::crop_image_deep_pp (ref render_loader.py:748).
// ---------------------------------------------------------------------
void crop_deep_pp(const float* depth, int H, int W,
                  const float* com,          // (u, v, z)
                  const float* cube,         // (sx, sy, sz)
                  const float* paras,        // (fx, fy, cx, cy)
                  int dsize,
                  float* out_img,            // (dsize, dsize)
                  float* out_M) {            // (3, 3) row major
  const float fx = paras[0], fy = paras[1];
  const float u = com[0], v = com[1], z = com[2];
  const float sx = cube[0], sy = cube[1], sz = cube[2];

  const float zstart = z - sz / 2.f;
  const float zend = z + sz / 2.f;
  const int xstart = (int)std::floor((u * z / fx - sx / 2.f) / z * fx + 0.5f);
  const int xend = (int)std::floor((u * z / fx + sx / 2.f) / z * fx + 0.5f);
  const int ystart = (int)std::floor((v * z / fy - sy / 2.f) / z * fy + 0.5f);
  const int yend = (int)std::floor((v * z / fy + sy / 2.f) / z * fy + 0.5f);

  const int ch = yend - ystart;   // cropped height
  const int cw = xend - xstart;   // cropped width

  // crop with zero padding + z-threshold (getCrop semantics)
  std::vector<float> cropped((size_t)ch * cw, 0.f);
  for (int r = 0; r < ch; ++r) {
    const int src_r = ystart + r;
    if (src_r < 0 || src_r >= H) continue;
    for (int c = 0; c < cw; ++c) {
      const int src_c = xstart + c;
      if (src_c < 0 || src_c >= W) continue;
      float d = depth[(size_t)src_r * W + src_c];
      if (d != 0.f && d < zstart) d = zstart;
      else if (d != 0.f && d > zend) d = 0.f;
      cropped[(size_t)r * cw + c] = d;
    }
  }

  // aspect-preserving target size
  int szw, szh;
  if (cw > ch) { szw = dsize; szh = (int)((int64_t)ch * dsize / cw); }
  else { szh = dsize; szw = (int)((int64_t)cw * dsize / ch); }

  float scale;
  if (ch > cw) scale = (float)szh / (float)ch;
  else scale = (float)szw / (float)cw;

  // nearest resize (cv2 resizeNN): src = floor(dst * ifx) with
  // ifx = 1.0/((double)dst/src) — cv2 inverts its forward scale, and
  // that double rounding matters: at 186->128, 64*(186.0/128) == 93
  // exactly but 64*(1/(128.0/186)) == 92.9999... -> index 92.  Both the
  // ratio AND the reciprocal must be double (f32 index math flips
  // floors too; caught by tests/test_aug_batch_parity.py).
  const double ify = 1.0 / ((double)szh / ch), ifx = 1.0 / ((double)szw / cw);
  std::vector<float> rz((size_t)szh * szw, 0.f);
  for (int r = 0; r < szh; ++r) {
    int sr = (int)((double)r * ify);
    if (sr >= ch) sr = ch - 1;
    for (int c = 0; c < szw; ++c) {
      int sc = (int)((double)c * ifx);
      if (sc >= cw) sc = cw - 1;
      rz[(size_t)r * szw + c] = cropped[(size_t)sr * cw + sc];
    }
  }

  // centered paste
  std::memset(out_img, 0, sizeof(float) * (size_t)dsize * dsize);
  const int px = (int)std::floor(dsize / 2.f - szw / 2.f);
  const int py = (int)std::floor(dsize / 2.f - szh / 2.f);
  for (int r = 0; r < szh; ++r)
    std::memcpy(out_img + (size_t)(py + r) * dsize + px,
                rz.data() + (size_t)r * szw, sizeof(float) * szw);

  // M = off @ scale @ trans
  out_M[0] = scale; out_M[1] = 0.f; out_M[2] = scale * (float)(-xstart) + px;
  out_M[3] = 0.f; out_M[4] = scale; out_M[5] = scale * (float)(-ystart) + py;
  out_M[6] = 0.f; out_M[7] = 0.f; out_M[8] = 1.f;
}

// ---------------------------------------------------------------------
// warp_perspective_nearest: dst(r, c) = src(inv(M) @ (c, r, 1)) with
// nearest sampling and constant border (cv2.warpPerspective INTER_NEAREST
// equivalence; M maps src px -> dst px, row major).
// ---------------------------------------------------------------------
void warp_perspective_nearest(const float* src, int H, int W,
                              const float* M, int dH, int dW,
                              float border, float* dst) {
  // invert M (3x3)
  const float a = M[0], b = M[1], c = M[2], d = M[3], e = M[4], f = M[5],
              g = M[6], h = M[7], i = M[8];
  const float A = e * i - f * h, B = -(d * i - f * g), C = d * h - e * g;
  const float det = a * A + b * B + c * C;
  const float inv[9] = {
      A / det, -(b * i - c * h) / det, (b * f - c * e) / det,
      B / det, (a * i - c * g) / det, -(a * f - c * d) / det,
      C / det, -(a * h - b * g) / det, (a * e - b * d) / det};
  for (int r = 0; r < dH; ++r) {
    for (int cc = 0; cc < dW; ++cc) {
      const float w = inv[6] * cc + inv[7] * r + inv[8];
      const float sx = (inv[0] * cc + inv[1] * r + inv[2]) / w;
      const float sy = (inv[3] * cc + inv[4] * r + inv[5]) / w;
      const int ix = (int)std::lround(sx);
      const int iy = (int)std::lround(sy);
      dst[(size_t)r * dW + cc] =
          (ix >= 0 && ix < W && iy >= 0 && iy < H)
              ? src[(size_t)iy * W + ix] : border;
    }
  }
}

// ---------------------------------------------------------------------
// normalize_depth: premax/0 -> far plane, clamp to cube, map to [-1, 1]
// (ref render_loader.py:738-745 semantics, in place).
// ---------------------------------------------------------------------
void normalize_depth(float* img, int n, float premax, float com_z,
                     float cube_z) {
  const float far_v = com_z + cube_z / 2.f;
  const float near_v = com_z - cube_z / 2.f;
  for (int k = 0; k < n; ++k) {
    float d = img[k];
    if (d == premax || d == 0.f) d = far_v;
    if (d >= far_v) d = far_v;
    if (d <= near_v) d = near_v;
    img[k] = (d - com_z) / (cube_z / 2.f);
  }
}

// ---------------------------------------------------------------------
// batch_crop_normalize: threaded batch driver — full per-sample pipeline
// (crop + normalize) for B samples, nthreads workers.
// ---------------------------------------------------------------------
void batch_crop_normalize(const float* depths, int B, int H, int W,
                          const float* coms,      // (B, 3)
                          const float* cubes,     // (B, 3)
                          const float* paras, int dsize,
                          float* out_imgs,        // (B, dsize, dsize)
                          float* out_Ms,          // (B, 3, 3)
                          int nthreads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int b = next.fetch_add(1);
      if (b >= B) return;
      float* img = out_imgs + (size_t)b * dsize * dsize;
      crop_deep_pp(depths + (size_t)b * H * W, H, W, coms + 3 * b,
                   cubes + 3 * b, paras, dsize, img, out_Ms + 9 * b);
      float premax = 0.f;
      for (int k = 0; k < dsize * dsize; ++k)
        premax = std::max(premax, img[k]);
      normalize_depth(img, dsize * dsize, premax, coms[3 * b + 2],
                      cubes[3 * b + 2]);
    }
  };
  if (nthreads <= 1) { worker(); return; }
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------
// batch_crop_raw: crop WITHOUT normalization — the augmented train path
// warps the raw-depth crop first (rot/com/sc modes) and normalizes only
// at the end (dsf_tpu/data/crop.py::augment_crop ordering).
// ---------------------------------------------------------------------
void batch_crop_raw(const float* depths, int B, int H, int W,
                    const float* coms,      // (B, 3)
                    const float* cubes,     // (B, 3)
                    const float* paras, int dsize,
                    float* out_imgs,        // (B, dsize, dsize)
                    float* out_Ms,          // (B, 3, 3)
                    int nthreads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int b = next.fetch_add(1);
      if (b >= B) return;
      crop_deep_pp(depths + (size_t)b * H * W, H, W, coms + 3 * b,
                   cubes + 3 * b, paras, dsize,
                   out_imgs + (size_t)b * dsize * dsize, out_Ms + 9 * b);
    }
  };
  if (nthreads <= 1) { worker(); return; }
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------
// batch_finish_aug: post-warp floor threshold + z-window + normalize,
// one pass per sample (the tails of rotateHand/recropHand/normalize_img
// fused; dsf_tpu/data/crop.py:163-221, 132-140).  flags bit0 = apply
// floor (x < floor_val -> 0), bit1 = apply z-window ((x<zstart, x!=0)
// -> zstart; (x>zend, x!=0) -> 0).
// ---------------------------------------------------------------------
// Precision contract (bit-exact vs the numpy per-sample path): the
// python code compares f32 pixels against f64 thresholds (numpy
// upcasts), stores f64 values into the f32 image, subtracts the f32
// com_z in f32, and divides by the f64 half-cube in f64 — this routine
// mirrors each of those cast points exactly
// (tests/test_aug_batch_parity.py asserts array_equal on images).
void batch_finish_aug(float* imgs, int B, int n,
                      const unsigned char* flags,  // (B,)
                      const float* floors,         // (B,) f32 like nv_val
                      const double* zwins,         // (B, 2) f64 zstart/zend
                      const float* premaxes,       // (B,)
                      const float* com_zs,         // (B,) f32 like com[2]
                      const double* cube_zs,       // (B,) f64 like cube[2]
                      int nthreads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int b = next.fetch_add(1);
      if (b >= B) return;
      float* img = imgs + (size_t)b * n;
      if (flags[b] & 1) {
        const float fl = floors[b];
        for (int k = 0; k < n; ++k)
          if (img[k] < fl) img[k] = 0.f;
      }
      if (flags[b] & 2) {
        const double zs = zwins[2 * b], ze = zwins[2 * b + 1];
        const float zs_store = (float)zs;
        for (int k = 0; k < n; ++k) {
          const float d = img[k];
          if (d != 0.f && (double)d < zs) img[k] = zs_store;
          else if (d != 0.f && (double)d > ze) img[k] = 0.f;
        }
      }
      const float premax = premaxes[b];
      const float com_z = com_zs[b];
      const double cube_half = cube_zs[b] / 2.0;
      const double far64 = (double)com_z + cube_half;
      const double near64 = (double)com_z - cube_half;
      const float far_store = (float)far64;
      const float near_store = (float)near64;
      for (int k = 0; k < n; ++k) {
        float d = img[k];
        if (d == premax || d == 0.f) d = far_store;
        if ((double)d >= far64) d = far_store;
        if ((double)d <= near64) d = near_store;
        d = d - com_z;                       // numpy in-place f32 -=
        img[k] = (float)((double)d / cube_half);
      }
    }
  };
  if (nthreads <= 1) { worker(); return; }
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

// decode NYU packed depth (B + G * 256) from interleaved BGR bytes
void nyu_unpack(const uint8_t* bgr, int H, int W, float* out) {
  for (size_t k = 0; k < (size_t)H * W; ++k)
    out[k] = (float)bgr[3 * k] + (float)bgr[3 * k + 1] * 256.f;
}

}  // extern "C"
