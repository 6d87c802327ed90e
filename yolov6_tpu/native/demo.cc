// Native host-pipeline demo (reference analog: deploy/TensorRT/yolov6.cpp —
// the C++ letterbox + decode + NMS around an accelerator-run model).
//
// Exercises the C ABI end to end: synthesize an image, letterbox it to the
// network input, synthesize decoded detections (standing in for the TPU's
// StableHLO artifact output), run greedy class-aware NMS, print survivors.
//
// Build + run:  make -C yolov6_tpu/native demo && ./yolov6_tpu/native/yolov6_native_demo

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
float yolov6_letterbox(const uint8_t*, int, int, uint8_t*, int, int, int,
                       uint8_t, int*, int*);
int yolov6_nms(const float*, int, float, int, int, int*);
void yolov6_normalize_rgb(const uint8_t*, float*, int);
}

int main(int argc, char** argv) {
  const int src_h = 480, src_w = 640, net = 640;
  std::vector<uint8_t> src(static_cast<size_t>(src_h) * src_w * 3);
  unsigned seed = 42;
  for (auto& v : src) v = static_cast<uint8_t>((seed = seed * 1664525u + 1013904223u) >> 24);

  std::vector<uint8_t> boarded(static_cast<size_t>(net) * net * 3);
  int pad_x = 0, pad_y = 0;
  float r = yolov6_letterbox(src.data(), src_h, src_w, boarded.data(), net, net,
                             /*scaleup=*/0, 114, &pad_x, &pad_y);
  std::printf("letterbox: ratio=%.4f pad=(%d,%d)\n", r, pad_x, pad_y);

  std::vector<float> chw(static_cast<size_t>(net) * net * 3);
  yolov6_normalize_rgb(boarded.data(), chw.data(), net * net);
  std::printf("normalize: first px = %.4f %.4f %.4f\n", chw[0], chw[1], chw[2]);

  // synthetic decoded detections [n,6] = x1 y1 x2 y2 score cls
  const int n = 64;
  std::vector<float> dets(n * 6);
  for (int i = 0; i < n; ++i) {
    float cx = 100.f + (i % 8) * 12.f, cy = 120.f + (i / 8) * 10.f;
    dets[i * 6 + 0] = cx - 40;
    dets[i * 6 + 1] = cy - 30;
    dets[i * 6 + 2] = cx + 40;
    dets[i * 6 + 3] = cy + 30;
    dets[i * 6 + 4] = 0.3f + 0.01f * i;
    dets[i * 6 + 5] = static_cast<float>(i % 3);
  }
  std::vector<int> keep(n);
  int kept = yolov6_nms(dets.data(), n, 0.45f, /*agnostic=*/0, 300, keep.data());
  std::printf("nms: kept %d of %d\n", kept, n);
  for (int i = 0; i < kept && i < 5; ++i) {
    const float* d = dets.data() + keep[i] * 6;
    std::printf("  box %d: [%.0f %.0f %.0f %.0f] score %.2f cls %d\n",
                keep[i], d[0], d[1], d[2], d[3], d[4], static_cast<int>(d[5]));
  }
  return kept > 0 ? 0 : 1;
}
