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

  // nearest resize (cv2.INTER_NEAREST: src = floor(dst * src/dst))
  std::vector<float> rz((size_t)szh * szw, 0.f);
  for (int r = 0; r < szh; ++r) {
    int sr = (int)((float)r * ch / szh);
    if (sr >= ch) sr = ch - 1;
    for (int c = 0; c < szw; ++c) {
      int sc = (int)((float)c * cw / szw);
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

// decode NYU packed depth (B + G * 256) from interleaved BGR bytes
void nyu_unpack(const uint8_t* bgr, int H, int W, float* out) {
  for (size_t k = 0; k < (size_t)H * W; ++k)
    out[k] = (float)bgr[3 * k] + (float)bgr[3 * k + 1] * 256.f;
}

}  // extern "C"
