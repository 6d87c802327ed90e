// OpenCV-DNN C++ inference demo for exported YOLOv6 ONNX graphs.
//
// The reference ships C++ OpenCV demos consuming its ONNX exports
// (reference: deploy/ONNX/OpenCV/yolov6.cpp — letterbox, blob, forward,
// obj*cls threshold, NMSBoxes, draw). This is the TPU repo's analog for
// the ONNX produced by `tools/export.py --format onnx`: a stock-OpenCV
// consumer that exercises the artifact with zero Python or JAX.
//
// Contract (see docs/Deployment.md §1b): input "images" [1,S,S,3] float32
// RGB in [0,1] (NHWC — OpenCV DNN accepts arbitrary-layout 4D inputs for
// ONNX graphs); output "outputs" [1, A, 5+nc] rows of
// (cx, cy, w, h, obj, cls...) in letterbox pixel coords.
//
// Build: make -C yolov6_tpu/native opencv_demo   (needs pkg-config opencv4)
// Run:   yolov6_opencv_demo model.onnx image.jpg [conf] [iou] [size] [out.jpg]
// Output: one line per detection: "det class=<id> conf=<c> box=<x1,y1,x2,y2>"

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include <opencv2/dnn.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Letterbox {
  float ratio;
  int pad_x, pad_y;
};

// Ratio-preserving resize onto an SxS canvas, gray (114) padding — the
// geometry the exported graph was evaluated with (data/data_augment.py).
Letterbox letterbox(const cv::Mat& src, int size, cv::Mat* dst) {
  const float r =
      std::min(size / (float)src.rows, size / (float)src.cols);
  const int new_w = (int)std::round(src.cols * r);
  const int new_h = (int)std::round(src.rows * r);
  const int pad_x = (size - new_w) / 2;
  const int pad_y = (size - new_h) / 2;
  cv::Mat resized;
  cv::resize(src, resized, cv::Size(new_w, new_h), 0, 0, cv::INTER_LINEAR);
  dst->create(size, size, src.type());
  dst->setTo(cv::Scalar(114, 114, 114));
  resized.copyTo((*dst)(cv::Rect(pad_x, pad_y, new_w, new_h)));
  return {r, pad_x, pad_y};
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s model.onnx image.jpg [conf=0.4] [iou=0.45] "
                 "[size=640] [out.jpg]\n",
                 argv[0]);
    return 2;
  }
  const std::string model_path = argv[1];
  const std::string image_path = argv[2];
  const float conf_thres = argc > 3 ? std::atof(argv[3]) : 0.4f;
  const float iou_thres = argc > 4 ? std::atof(argv[4]) : 0.45f;
  const int size = argc > 5 ? std::atoi(argv[5]) : 640;
  const std::string out_path = argc > 6 ? argv[6] : "";

  cv::Mat bgr = cv::imread(image_path, cv::IMREAD_COLOR);
  if (bgr.empty()) {
    std::fprintf(stderr, "cannot read image %s\n", image_path.c_str());
    return 1;
  }

  cv::dnn::Net net = cv::dnn::readNetFromONNX(model_path);

  cv::Mat canvas;
  const Letterbox lb = letterbox(bgr, size, &canvas);

  // NHWC float32 RGB [0,1] blob, matching the export contract.
  cv::Mat rgb;
  cv::cvtColor(canvas, rgb, cv::COLOR_BGR2RGB);
  rgb.convertTo(rgb, CV_32F, 1.0 / 255.0);
  const int blob_dims[4] = {1, size, size, 3};
  cv::Mat blob(4, blob_dims, CV_32F, rgb.ptr<float>());  // rgb is contiguous

  net.setInput(blob, "images");
  cv::Mat out = net.forward();  // [1, A, 5+nc]
  const int num_anchors = out.size[1];
  const int row_len = out.size[2];
  const int nc = row_len - 5;
  const float* data = out.ptr<float>();

  std::vector<cv::Rect2d> boxes;
  std::vector<float> scores;
  std::vector<int> class_ids;
  for (int a = 0; a < num_anchors; ++a) {
    const float* row = data + (size_t)a * row_len;
    const float obj = row[4];
    if (obj * 1.0f < conf_thres) continue;  // max cls prob <= 1
    int best = 0;
    float best_cls = row[5];
    for (int c = 1; c < nc; ++c) {
      if (row[5 + c] > best_cls) { best_cls = row[5 + c]; best = c; }
    }
    const float conf = obj * best_cls;
    if (conf < conf_thres) continue;
    // cx,cy,w,h in letterbox coords -> x,y,w,h in original-image coords
    const double w = row[2] / lb.ratio;
    const double h = row[3] / lb.ratio;
    const double x = (row[0] - lb.pad_x) / lb.ratio - w / 2;
    const double y = (row[1] - lb.pad_y) / lb.ratio - h / 2;
    boxes.emplace_back(x, y, w, h);
    scores.push_back(conf);
    class_ids.push_back(best);
  }

  // Per-class NMS via the class-offset trick (suppression graph stays
  // block-diagonal by class; reference utils/nms.py:94-96). Boxes are
  // already in original-image pixels here, so the offset must exceed the
  // source dimensions — not just the letterbox size — or adjacent classes
  // of very large images could overlap across blocks.
  const double kOffset =
      std::max(8192.0, (double)std::max(bgr.cols, bgr.rows) + 1.0);
  std::vector<cv::Rect2d> shifted(boxes);
  for (size_t i = 0; i < shifted.size(); ++i) {
    shifted[i].x += class_ids[i] * kOffset;
    shifted[i].y += class_ids[i] * kOffset;
  }
  std::vector<int> keep;
  cv::dnn::NMSBoxes(shifted, scores, conf_thres, iou_thres, keep);

  for (int idx : keep) {
    const cv::Rect2d& b = boxes[idx];
    std::printf("det class=%d conf=%.4f box=%.1f,%.1f,%.1f,%.1f\n",
                class_ids[idx], scores[idx], b.x, b.y, b.x + b.width,
                b.y + b.height);
    if (!out_path.empty()) {
      cv::rectangle(bgr, cv::Rect((int)b.x, (int)b.y, (int)b.width,
                                  (int)b.height),
                    cv::Scalar(0, 255, 0), 2);
      char label[64];
      std::snprintf(label, sizeof(label), "%d %.2f", class_ids[idx],
                    scores[idx]);
      cv::putText(bgr, label, cv::Point((int)b.x, (int)b.y - 4),
                  cv::FONT_HERSHEY_SIMPLEX, 0.5, cv::Scalar(0, 255, 0), 1);
    }
  }
  std::printf("num_dets=%zu\n", keep.size());
  if (!out_path.empty()) cv::imwrite(out_path, bgr);
  return 0;
}
