// Native clip loader: threaded decode + augment for the MCGaze data path.
//
// TPU-native equivalent of the reference's data-loading runtime (torch
// DataLoader C++ worker pool + mmcv/cv2 native image ops; reference
// mmdet/datasets/builder.py:87-160 runs 8 worker *processes* per GPU).
// Here the hot per-frame work — imread, BGR->RGB, clip-latched center
// crop, keep-ratio bilinear resize, horizontal flip, ImageNet normalize,
// pad-to-canvas — happens in a persistent C++ thread pool writing
// float32 straight into a caller-owned buffer (zero Python-side copies).
//
// Exact parity with mcgaze_tpu/data/transforms.py is guaranteed by
// linking the SAME OpenCV the Python path uses (cv::resize INTER_LINEAR,
// cv::imread).
//
// C ABI (ctypes-bound by mcgaze_tpu/data/native_loader.py):
//   mcg_pool_create(n_threads) -> handle
//   mcg_pool_destroy(handle)
//   mcg_load_frames(handle, n, paths, crop_ratios, flips,
//                   scale_w, scale_h, canvas_h, canvas_w,
//                   out, out_meta) -> 0 | first failing frame index + 1
//     out:      n * canvas_h * canvas_w * 3 float32 (padded, normalized)
//     out_meta: n * 6 int32  [orig_h, orig_w, crop_h, crop_w, new_h, new_w]

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

constexpr float kMean[3] = {123.675f, 116.28f, 103.53f};   // RGB
constexpr float kStd[3] = {58.395f, 57.12f, 57.375f};

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
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

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
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
  bool stop_;
};

// mmcv rescale_size: fit (h, w) into (scale_w, scale_h) keeping aspect.
void RescaleSize(int h, int w, int scale_w, int scale_h, int* new_w,
                 int* new_h) {
  int max_long = std::max(scale_w, scale_h);
  int max_short = std::min(scale_w, scale_h);
  double f = std::min(
      static_cast<double>(max_long) / std::max(h, w),
      static_cast<double>(max_short) / std::min(h, w));
  *new_w = static_cast<int>(w * f + 0.5);
  *new_h = static_cast<int>(h * f + 0.5);
}

// One frame: decode -> RGB -> crop -> resize -> flip -> normalize+pad.
// Exactly one of out (normalized float32) / out_u8 (raw uint8, for
// on-device normalization that ships 4x fewer bytes to the accelerator)
// is non-null. Returns false on decode failure.
bool LoadOne(const char* path, float crop_ratio, bool flip, int scale_w,
             int scale_h, int canvas_h, int canvas_w, float* out,
             uint8_t* out_u8, int32_t* meta) {
  cv::Mat bgr = cv::imread(path, cv::IMREAD_COLOR);
  if (bgr.empty()) return false;
  cv::Mat img;
  cv::cvtColor(bgr, img, cv::COLOR_BGR2RGB);
  meta[0] = img.rows;
  meta[1] = img.cols;

  if (crop_ratio > 0.0f) {
    // transforms.py center_crop: size = int(dim*ratio + .5),
    // offset = int(max(dim - size, 0)/2 + .5)
    int ch = static_cast<int>(img.rows * crop_ratio + 0.5f);
    int cw = static_cast<int>(img.cols * crop_ratio + 0.5f);
    int oh = static_cast<int>(std::max(img.rows - ch, 0) / 2.0f + 0.5f);
    int ow = static_cast<int>(std::max(img.cols - cw, 0) / 2.0f + 0.5f);
    img = img(cv::Rect(ow, oh, std::min(cw, img.cols - ow),
                       std::min(ch, img.rows - oh)));
  }
  meta[2] = img.rows;
  meta[3] = img.cols;

  int new_w, new_h;
  if (scale_w < 0) {
    // exact-warp mode (keep_ratio=False, the InstBlink/TeViT test
    // pipeline's Resize): negative scale encodes the target verbatim so
    // the C ABI stays unchanged. native_loader.py only sends negatives
    // after probing mcg_has_warp(), so a stale .so never sees them.
    new_w = -scale_w;
    new_h = -scale_h;
  } else {
    RescaleSize(img.rows, img.cols, scale_w, scale_h, &new_w, &new_h);
  }
  cv::Mat resized;
  cv::resize(img, resized, cv::Size(new_w, new_h), 0, 0, cv::INTER_LINEAR);
  meta[4] = new_h;
  meta[5] = new_w;

  if (flip) cv::flip(resized, resized, 1);

  int xmax = std::min(new_w, canvas_w);
  if (out_u8 != nullptr) {
    // raw uint8 pad (normalization happens on-device inside the jit)
    std::fill(out_u8,
              out_u8 + static_cast<size_t>(canvas_h) * canvas_w * 3,
              static_cast<uint8_t>(0));
    for (int y = 0; y < new_h && y < canvas_h; ++y) {
      std::copy_n(resized.ptr<uint8_t>(y), xmax * 3,
                  out_u8 + static_cast<size_t>(y) * canvas_w * 3);
    }
    return true;
  }
  // normalize + pad straight into the canvas slice (zero fill first)
  std::fill(out, out + static_cast<size_t>(canvas_h) * canvas_w * 3, 0.0f);
  for (int y = 0; y < new_h && y < canvas_h; ++y) {
    const uint8_t* row = resized.ptr<uint8_t>(y);
    float* orow = out + static_cast<size_t>(y) * canvas_w * 3;
    for (int x = 0; x < xmax; ++x) {
      for (int c = 0; c < 3; ++c) {
        orow[x * 3 + c] = (row[x * 3 + c] - kMean[c]) / kStd[c];
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

void* mcg_pool_create(int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  return new ThreadPool(n_threads);
}

void mcg_pool_destroy(void* pool) { delete static_cast<ThreadPool*>(pool); }

static int LoadBatch(void* pool, int n, const char** paths,
                     const float* crop_ratios, const uint8_t* flips,
                     int scale_w, int scale_h, int canvas_h, int canvas_w,
                     float* out, uint8_t* out_u8, int32_t* out_meta) {
  auto* tp = static_cast<ThreadPool*>(pool);
  std::atomic<int> failed{0};
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;
  size_t frame_elems = static_cast<size_t>(canvas_h) * canvas_w * 3;
  for (int i = 0; i < n; ++i) {
    tp->Submit([&, i] {
      bool ok = LoadOne(paths[i], crop_ratios ? crop_ratios[i] : -1.0f,
                        flips && flips[i], scale_w, scale_h, canvas_h,
                        canvas_w, out ? out + frame_elems * i : nullptr,
                        out_u8 ? out_u8 + frame_elems * i : nullptr,
                        out_meta + 6 * i);
      if (!ok) {
        int expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failed.load();
}

int mcg_load_frames(void* pool, int n, const char** paths,
                    const float* crop_ratios, const uint8_t* flips,
                    int scale_w, int scale_h, int canvas_h, int canvas_w,
                    float* out, int32_t* out_meta) {
  return LoadBatch(pool, n, paths, crop_ratios, flips, scale_w, scale_h,
                   canvas_h, canvas_w, out, nullptr, out_meta);
}

// uint8 variant: raw padded pixels, caller normalizes on-device.
int mcg_load_frames_u8(void* pool, int n, const char** paths,
                       const float* crop_ratios, const uint8_t* flips,
                       int scale_w, int scale_h, int canvas_h, int canvas_w,
                       uint8_t* out, int32_t* out_meta) {
  return LoadBatch(pool, n, paths, crop_ratios, flips, scale_w, scale_h,
                   canvas_h, canvas_w, nullptr, out, out_meta);
}

// Capability probe: a build that understands the negative-scale exact-
// warp encoding exports this symbol; native_loader.py checks it before
// sending keep_ratio=False loads (a stale .so falls back to Python).
int mcg_has_warp(void) { return 1; }

}  // extern "C"
