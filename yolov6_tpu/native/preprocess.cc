// Native host-side preprocessing + postprocessing for yolov6_tpu.
//
// Plays the role of the reference's C++ deploy pipeline
// (reference: deploy/TensorRT/yolov6.cpp — static_resize:51-62 letterbox,
// nms_sorted_bboxes:122-157 greedy NMS): a production serving host does its
// image prep and final suppression in native code while the TPU runs the
// exported StableHLO graph.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C yolov6_tpu/native

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Aspect-keeping bilinear resize (half-pixel centers) + constant pad.
// src: HxWx3 uint8, dst: out_h x out_w x 3 uint8 prefilled by this function.
// Returns the scale ratio; writes pad offsets to pad_x/pad_y.
// Matches the geometry of reference letterbox (data_augment.py:29-58) with
// auto=False, scaleup=false behavior controlled by `scaleup`.
float yolov6_letterbox(const uint8_t* src, int h, int w,
                       uint8_t* dst, int out_h, int out_w,
                       int scaleup, uint8_t pad_value,
                       int* pad_x, int* pad_y) {
  float r = std::min(static_cast<float>(out_h) / h, static_cast<float>(out_w) / w);
  if (!scaleup) r = std::min(r, 1.0f);
  int new_w = static_cast<int>(std::lround(w * r));
  int new_h = static_cast<int>(std::lround(h * r));
  float dw = (out_w - new_w) / 2.0f;
  float dh = (out_h - new_h) / 2.0f;
  int left = static_cast<int>(std::lround(dw - 0.1f));
  int top = static_cast<int>(std::lround(dh - 0.1f));
  *pad_x = left;
  *pad_y = top;

  std::memset(dst, pad_value, static_cast<size_t>(out_h) * out_w * 3);

  const float sx = static_cast<float>(w) / new_w;
  const float sy = static_cast<float>(h) / new_h;
  for (int y = 0; y < new_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, h - 1);
    y0 = std::max(y0, 0);
    uint8_t* drow = dst + (static_cast<size_t>(y + top) * out_w + left) * 3;
    const uint8_t* srow0 = src + static_cast<size_t>(y0) * w * 3;
    const uint8_t* srow1 = src + static_cast<size_t>(y1) * w * 3;
    for (int x = 0; x < new_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, w - 1);
      x0 = std::max(x0, 0);
      for (int c = 0; c < 3; ++c) {
        float v00 = srow0[x0 * 3 + c], v01 = srow0[x1 * 3 + c];
        float v10 = srow1[x0 * 3 + c], v11 = srow1[x1 * 3 + c];
        float v0 = v00 + (v01 - v00) * wx;
        float v1 = v10 + (v11 - v10) * wx;
        drow[x * 3 + c] = static_cast<uint8_t>(std::lround(v0 + (v1 - v0) * wy));
      }
    }
  }
  return r;
}

// Greedy class-aware NMS over [n, 6] rows (x1, y1, x2, y2, score, cls).
// Writes kept row indices to `keep` (capacity max_det); returns kept count.
// Equivalent keep-set to the reference's torchvision NMS with the
// class-offset trick (reference: utils/nms.py:94-98).
int yolov6_nms(const float* dets, int n, float iou_thres, int class_agnostic,
               int max_det, int* keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return dets[a * 6 + 4] > dets[b * 6 + 4];
  });
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n && kept < max_det; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[kept++] = i;
    const float* di = dets + i * 6;
    float ax1 = di[0], ay1 = di[1], ax2 = di[2], ay2 = di[3];
    float area_a = std::max(0.f, ax2 - ax1) * std::max(0.f, ay2 - ay1);
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets + j * 6;
      if (!class_agnostic && di[5] != dj[5]) continue;
      float ix1 = std::max(ax1, dj[0]), iy1 = std::max(ay1, dj[1]);
      float ix2 = std::min(ax2, dj[2]), iy2 = std::min(ay2, dj[3]);
      float iw = std::max(0.f, ix2 - ix1), ih = std::max(0.f, iy2 - iy1);
      float inter = iw * ih;
      float area_b = std::max(0.f, dj[2] - dj[0]) * std::max(0.f, dj[3] - dj[1]);
      float iou = inter / (area_a + area_b - inter + 1e-12f);
      if (iou > iou_thres) suppressed[j] = 1;
    }
  }
  return kept;
}

// uint8 HWC BGR -> float32 HWC RGB /255, in one pass (serving host prep).
void yolov6_normalize_rgb(const uint8_t* src, float* dst, int n_pixels) {
  for (int i = 0; i < n_pixels; ++i) {
    dst[i * 3 + 0] = src[i * 3 + 2] / 255.0f;
    dst[i * 3 + 1] = src[i * 3 + 1] / 255.0f;
    dst[i * 3 + 2] = src[i * 3 + 0] / 255.0f;
  }
}

}  // extern "C"
