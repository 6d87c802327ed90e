// Fused train-time augmentation kernel: mosaic compose + inverse-affine
// bilinear warp + HSV jitter + flips in ONE pass over the output pixels.
//
// Role: the reference runs mosaic -> cv2.warpAffine -> HSV LUT -> flips as
// separate full-image passes in DataLoader worker processes (reference:
// yolov6/data/data_augment.py:77-208, datasets.py general_augment). On a
// TPU-VM host the loader competes with dispatch for CPU, so this kernel
// removes every intermediate: the 2Hx2W mosaic canvas is never materialized
// (each output pixel inverse-maps into one of the 4 source images), and the
// HSV jitter + flips fold into the same pass. Randomness stays in Python —
// the caller draws every parameter (mosaic center, affine matrix, HSV gains,
// flips) with the reference's distributions and passes them down; label
// geometry also stays in Python/numpy (a few dozen boxes, exact math).
//
// Color order is RGB end-to-end (the native decoder emits RGB), so the
// Python path's final BGR->RGB copy disappears too.
//
// Build: make -C yolov6_tpu/native

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct Region {
  int x1a, y1a, x2a, y2a;  // canvas box the source patch covers
  int dx, dy;              // canvas -> source offset: src(x - dx, y - dy)
  const uint8_t* src;
  int h, w;
};

// Value of the (virtual) mosaic canvas at integer coords. Points outside
// every region read the pad value — identical to bilinear over a canvas
// prefilled with pad (cv2 borderValue=114 gives the same result outside
// the canvas itself).
inline void CanvasPx(const Region* regs, int n_regions, int ix, int iy,
                     uint8_t pad, uint8_t out[3]) {
  for (int i = 0; i < n_regions; ++i) {
    const Region& r = regs[i];
    if (ix >= r.x1a && ix < r.x2a && iy >= r.y1a && iy < r.y2a) {
      const uint8_t* p =
          r.src + (static_cast<size_t>(iy - r.dy) * r.w + (ix - r.dx)) * 3;
      out[0] = p[0];
      out[1] = p[1];
      out[2] = p[2];
      return;
    }
  }
  out[0] = out[1] = out[2] = pad;
}

// RGB -> HSV (cv2 8-bit convention: H in [0,180), S/V in [0,255]) -> jitter
// -> RGB. Gain semantics match the reference LUTs (data_augment.py:13-26):
// hue wraps mod 180, sat/val clip to [0,255], casts truncate like
// numpy.astype(uint8).
inline void HsvJitter(uint8_t rgb[3], float gh, float gs, float gv) {
  const float r = rgb[0], g = rgb[1], b = rgb[2];
  const float v = std::max(r, std::max(g, b));
  const float mn = std::min(r, std::min(g, b));
  const float c = v - mn;
  float h = 0.f;
  if (c > 0.f) {
    if (v == r)
      h = 30.f * (g - b) / c;
    else if (v == g)
      h = 60.f + 30.f * (b - r) / c;
    else
      h = 120.f + 30.f * (r - g) / c;
    if (h < 0.f) h += 180.f;
  }
  const float s = v > 0.f ? 255.f * c / v : 0.f;
  // quantize to the 8-bit grid first — the reference LUTs act on uint8 H/S/V
  float hq = std::nearbyint(h);
  if (hq >= 180.f) hq -= 180.f;
  const float sq = std::nearbyint(s);
  const float vq = v;  // v is already an exact uint8 value (a max of inputs)

  // jitter (truncating casts, like astype(uint8))
  float h2 = std::floor(std::fmod(hq * gh, 180.f));
  if (h2 < 0.f) h2 += 180.f;
  const float s2 = std::floor(std::min(std::max(sq * gs, 0.f), 255.f));
  const float v2 = std::floor(std::min(std::max(vq * gv, 0.f), 255.f));

  // HSV -> RGB (cv2 full-range float math, rounded)
  const float hh = h2 / 30.f;  // sector in [0, 6)
  const int sector = static_cast<int>(hh) % 6;
  const float f = hh - std::floor(hh);
  const float sn = s2 / 255.f;
  const float p = v2 * (1.f - sn);
  const float q = v2 * (1.f - sn * f);
  const float t = v2 * (1.f - sn * (1.f - f));
  float rr, gg, bb;
  switch (sector) {
    case 0: rr = v2; gg = t; bb = p; break;
    case 1: rr = q; gg = v2; bb = p; break;
    case 2: rr = p; gg = v2; bb = t; break;
    case 3: rr = p; gg = q; bb = v2; break;
    case 4: rr = t; gg = p; bb = v2; break;
    default: rr = v2; gg = p; bb = q; break;
  }
  rgb[0] = static_cast<uint8_t>(std::nearbyint(rr));
  rgb[1] = static_cast<uint8_t>(std::nearbyint(gg));
  rgb[2] = static_cast<uint8_t>(std::nearbyint(bb));
}

}  // namespace

extern "C" {

// Fused mosaic + affine + HSV + flip producing out[out_h, out_w, 3] u8 RGB.
//
//   srcs/src_hw : n_regions source images (RGB u8, HxWx3) and their (h, w)
//   place       : per region (x1a, y1a, x2a, y2a, x1b, y1b) — the mosaic
//                 placement rectangles of the reference
//                 (data_augment.py:146-178); for a plain single-image affine
//                 pass use one region (0, 0, w, h, 0, 0)
//   minv        : 6 doubles, the INVERSE affine (dst pixel -> canvas coords)
//   gh/gs/gv    : HSV gain triple (pass do_hsv=0 to skip)
//   flip_lr/ud  : mirror the OUTPUT (labels are flipped by the caller)
void yolov6_train_aug(const uint8_t* const* srcs, const int* src_hw,
                      const int* place, int n_regions, const double* minv,
                      uint8_t* out, int out_h, int out_w, float gh, float gs,
                      float gv, int do_hsv, int flip_lr, int flip_ud,
                      uint8_t pad) {
  Region regs[8];
  const int nr = std::min(n_regions, 8);
  for (int i = 0; i < nr; ++i) {
    regs[i].x1a = place[i * 6 + 0];
    regs[i].y1a = place[i * 6 + 1];
    regs[i].x2a = place[i * 6 + 2];
    regs[i].y2a = place[i * 6 + 3];
    regs[i].dx = place[i * 6 + 0] - place[i * 6 + 4];  // x1a - x1b
    regs[i].dy = place[i * 6 + 1] - place[i * 6 + 5];  // y1a - y1b
    regs[i].src = srcs[i];
    regs[i].h = src_hw[i * 2];
    regs[i].w = src_hw[i * 2 + 1];
  }
  const float m0 = static_cast<float>(minv[0]), m1 = static_cast<float>(minv[1]),
              m2 = static_cast<float>(minv[2]), m3 = static_cast<float>(minv[3]),
              m4 = static_cast<float>(minv[4]), m5 = static_cast<float>(minv[5]);

  // union bounding box of all regions: a 2x2 block fully outside it is all
  // pad — skips the per-neighbor region scans for the (large) pad margins
  int ux1 = 1 << 30, uy1 = 1 << 30, ux2 = -(1 << 30), uy2 = -(1 << 30);
  for (int i = 0; i < nr; ++i) {
    ux1 = std::min(ux1, regs[i].x1a);
    uy1 = std::min(uy1, regs[i].y1a);
    ux2 = std::max(ux2, regs[i].x2a);
    uy2 = std::max(uy2, regs[i].y2a);
  }

  const Region* last = &regs[0];
  for (int y = 0; y < out_h; ++y) {
    const int ys = flip_ud ? out_h - 1 - y : y;
    uint8_t* row = out + static_cast<size_t>(y) * out_w * 3;
    // incremental coords in double (no drift over a row); xs steps by ∓1
    const int xs0 = flip_lr ? out_w - 1 : 0;
    const double dcx = flip_lr ? -static_cast<double>(m0) : m0;
    const double dcy = flip_lr ? -static_cast<double>(m3) : m3;
    double cxd = static_cast<double>(m0) * xs0 + (static_cast<double>(m1) * ys + m2);
    double cyd = static_cast<double>(m3) * xs0 + (static_cast<double>(m4) * ys + m5);
    for (int x = 0; x < out_w; ++x, cxd += dcx, cyd += dcy) {
      const float cx = static_cast<float>(cxd);
      const float cy = static_cast<float>(cyd);
      const int x0 = static_cast<int>(std::floor(cx));
      const int y0 = static_cast<int>(std::floor(cy));
      const float fx = cx - x0;
      const float fy = cy - y0;
      uint8_t px[3];
      // fast path: the whole 2x2 neighborhood inside ONE region (true for
      // all but seam/border pixels) — two straight row reads, no searches.
      // Consecutive pixels almost always share a region: test the last hit
      // first.
      const Region* hit = nullptr;
      if (x0 >= last->x1a && x0 + 1 < last->x2a && y0 >= last->y1a &&
          y0 + 1 < last->y2a) {
        hit = last;
      } else {
        for (int i = 0; i < nr; ++i) {
          const Region& r = regs[i];
          if (x0 >= r.x1a && x0 + 1 < r.x2a && y0 >= r.y1a && y0 + 1 < r.y2a) {
            hit = last = &r;
            break;
          }
        }
      }
      if (hit) {
        const uint8_t* p0 =
            hit->src +
            (static_cast<size_t>(y0 - hit->dy) * hit->w + (x0 - hit->dx)) * 3;
        const uint8_t* p1 = p0 + static_cast<size_t>(hit->w) * 3;
        for (int ch = 0; ch < 3; ++ch) {
          const float v0 = p0[ch] + (p0[3 + ch] - p0[ch]) * fx;
          const float v1 = p1[ch] + (p1[3 + ch] - p1[ch]) * fx;
          px[ch] = static_cast<uint8_t>(v0 + (v1 - v0) * fy + 0.5f);
        }
      } else if (x0 + 1 < ux1 || x0 > ux2 - 1 || y0 + 1 < uy1 || y0 > uy2 - 1) {
        px[0] = px[1] = px[2] = pad;
      } else {
        uint8_t p00[3], p01[3], p10[3], p11[3];
        CanvasPx(regs, nr, x0, y0, pad, p00);
        CanvasPx(regs, nr, x0 + 1, y0, pad, p01);
        CanvasPx(regs, nr, x0, y0 + 1, pad, p10);
        CanvasPx(regs, nr, x0 + 1, y0 + 1, pad, p11);
        for (int ch = 0; ch < 3; ++ch) {
          const float v0 = p00[ch] + (p01[ch] - p00[ch]) * fx;
          const float v1 = p10[ch] + (p11[ch] - p10[ch]) * fx;
          px[ch] = static_cast<uint8_t>(v0 + (v1 - v0) * fy + 0.5f);
        }
      }
      if (do_hsv) HsvJitter(px, gh, gs, gv);
      row[x * 3 + 0] = px[0];
      row[x * 3 + 1] = px[1];
      row[x * 3 + 2] = px[2];
    }
  }
}

// Mixup blend: a = trunc(a*r + b*(1-r)), bit-matching numpy's float64
// (im*r + im2*(1-r)).astype(uint8) (reference data_augment.py:61-66).
// fp-contract off: an FMA of a*r with b*(1-r) rounds differently from
// numpy's two-products-then-add and flips ~0.1% of pixels by 1.
__attribute__((optimize("fp-contract=off")))
void yolov6_blend(uint8_t* a, const uint8_t* b, long n, double r) {
  for (long i = 0; i < n; ++i) {
    a[i] = static_cast<uint8_t>(a[i] * r + b[i] * (1.0 - r));
  }
}

}  // extern "C"
