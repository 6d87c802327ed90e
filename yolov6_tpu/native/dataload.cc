// Native data-loading kernels: JPEG decode + letterbox with an internal
// thread pool, exposed over the C ABI for ctypes.
//
// Role: the reference feeds training from torch DataLoader worker processes
// (reference: yolov6/data/data_load.py:66-73); our Python pipeline uses
// threaded cv2. At pod scale the host becomes decode-bound, so this gives
// the loader a GIL-free native path: one call decodes and letterboxes a
// whole batch in parallel (libjpeg + the same bilinear letterbox as
// preprocess.cc, bit-identical to the Python/native letterbox used at eval).
//
// Build: make -C yolov6_tpu/native   (links -ljpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <setjmp.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <map>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" float yolov6_letterbox(const uint8_t*, int, int, uint8_t*, int, int,
                                  int, uint8_t, int*, int*);

namespace {

// ───────────────────────── JPEG decode ─────────────────────────

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jump, 1);
}

// Decode a JPEG byte buffer to RGB u8. Returns 0 on success. When the
// decoded image exceeds max_pixels, applies libjpeg's fractional DCT
// scaling (1/2, 1/4, 1/8) during decode — far cheaper than full decode +
// resize (the reference's cv2.imread + resize path pays full decode).
// force_denom > 1 pins the DCT scale directly (the IMREAD_REDUCED_COLOR_N
// analog used by the train-path fast decode, datasets.py load_image).
int DecodeJpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& out,
               int* h, int* w, long max_pixels, int force_denom = 1) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_RGB;
  if (force_denom > 1) {
    cinfo.scale_num = 1;
    cinfo.scale_denom = std::min(force_denom, 8);
  } else if (max_pixels > 0) {
    long px = static_cast<long>(cinfo.image_width) * cinfo.image_height;
    cinfo.scale_num = 1;
    cinfo.scale_denom = 1;
    // halve while the CURRENT size still exceeds max_pixels (up to 1/8) so
    // the decoded image actually lands under the cap, not one step above it
    while (cinfo.scale_denom < 8 &&
           px / (cinfo.scale_denom * cinfo.scale_denom) > max_pixels) {
      cinfo.scale_denom *= 2;
    }
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out.resize(static_cast<size_t>(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ───────────────────────── thread pool ─────────────────────────

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

// One pool per requested size, never deleted (process-lifetime singletons):
// deleting and replacing a shared pool while another batch_decode call has
// jobs in flight would be a use-after-free.
std::map<int, Pool*> g_pools;
std::mutex g_pool_mu;

Pool& GetPool(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  Pool*& p = g_pools[n_threads];
  if (p == nullptr) p = new Pool(n_threads);
  return *p;
}

// Plain bilinear resize with half-pixel centers — the same sampling as
// yolov6_letterbox's interior (preprocess.cc), without the padding.
void BilinearResize(const uint8_t* src, int h, int w, uint8_t* dst, int dh,
                    int dw) {
  const float sx = static_cast<float>(w) / dw;
  const float sy = static_cast<float>(h) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, h - 1);
    y0 = std::max(y0, 0);
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    const uint8_t* srow0 = src + static_cast<size_t>(y0) * w * 3;
    const uint8_t* srow1 = src + static_cast<size_t>(y1) * w * 3;
    for (int x = 0; x < dw; ++x) {
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
}

std::vector<uint8_t> ReadFile(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(n);
  if (std::fread(buf.data(), 1, n, f) != static_cast<size_t>(n)) buf.clear();
  std::fclose(f);
  return buf;
}

}  // namespace

extern "C" {

// Decode one JPEG file to RGB u8 into caller buffer (capacity cap bytes).
// Returns 0 ok / 1 decode error / 2 buffer too small. h/w set on success.
int yolov6_decode_jpeg_file(const char* path, uint8_t* out, long cap,
                            int* h, int* w, long max_pixels) {
  std::vector<uint8_t> file = ReadFile(path);
  if (file.empty()) return 1;
  std::vector<uint8_t> rgb;
  if (DecodeJpeg(file.data(), file.size(), rgb, h, w, max_pixels)) return 1;
  if (static_cast<long>(rgb.size()) > cap) return 2;
  std::memcpy(out, rgb.data(), rgb.size());
  return 0;
}

// Train-path loader fast path (datasets.py load_image analog): decode a
// JPEG at DCT scale 1/denom (the caller picks the largest denom in
// {1,2,4,8} that keeps the long side >= the train target — the
// IMREAD_REDUCED rule), then bilinear-resize to exactly (dst_h, dst_w).
// out must hold dst_h*dst_w*3 bytes. Returns 0 ok / 1 decode error.
int yolov6_decode_jpeg_resize(const char* path, int denom, int dst_h,
                              int dst_w, uint8_t* out) {
  std::vector<uint8_t> file = ReadFile(path);
  if (file.empty()) return 1;
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (DecodeJpeg(file.data(), file.size(), rgb, &h, &w, 0, denom)) return 1;
  if (h == dst_h && w == dst_w) {
    std::memcpy(out, rgb.data(), rgb.size());
  } else {
    BilinearResize(rgb.data(), h, w, out, dst_h, dst_w);
  }
  return 0;
}

// Batch: decode n JPEG files and letterbox each into out[i] (n x out_h x
// out_w x 3, prefilled with pad by the letterbox). ratios/pads [n] receive
// the letterbox geometry; src_hw [2n] the decoded sizes. Parallel across an
// internal pool of n_threads. Returns number of failed images (their slots
// are left as pad_value).
int yolov6_batch_decode_letterbox(const char** paths, int n,
                                  uint8_t* out, int out_h, int out_w,
                                  int scaleup, uint8_t pad_value,
                                  float* ratios, int* pads, int* src_hw,
                                  int n_threads) {
  Pool& pool = GetPool(std::max(1, n_threads));
  std::atomic<int> failed{0};
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;

  for (int i = 0; i < n; ++i) {
    pool.Submit([&, i] {
      std::vector<uint8_t> rgb;
      int h = 0, w = 0;
      uint8_t* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      std::vector<uint8_t> file = ReadFile(paths[i]);
      if (file.empty() || DecodeJpeg(file.data(), file.size(), rgb, &h, &w, 0)) {
        std::memset(dst, pad_value, static_cast<size_t>(out_h) * out_w * 3);
        ratios[i] = 1.0f;
        pads[2 * i] = pads[2 * i + 1] = 0;
        src_hw[2 * i] = src_hw[2 * i + 1] = 0;
        failed.fetch_add(1);
      } else {
        int px = 0, py = 0;
        float r = yolov6_letterbox(rgb.data(), h, w, dst, out_h, out_w,
                                   scaleup, pad_value, &px, &py);
        ratios[i] = r;
        pads[2 * i] = px;
        pads[2 * i + 1] = py;
        src_hw[2 * i] = h;
        src_hw[2 * i + 1] = w;
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return done.load() == n; });
  return failed.load();
}

}  // extern "C"
