// Native data plane: fused JPEG decode + resize + normalize + pad, with an
// asynchronous worker pool.
//
// Role: the TPU-native counterpart of the reference's native data machinery
// (torch's C++ DataLoader workers feeding data/seq_dataset.py:33-43).  The
// streaming submit path needs decode(JPEG) -> BGR->RGB -> short-side resize
// -> ImageNet normalize -> fixed-canvas pad per frame; doing it in one C++
// pass avoids three Python-side numpy copies and releases the GIL for true
// decode/compute overlap.
//
// C ABI (ctypes-friendly), see memotr_tpu/data/native.py for the binding.

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct JobResult {
  int ori_h = 0, ori_w = 0, new_h = 0, new_w = 0;
  int status = -1;  // 0 ok, <0 error
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<std::function<void()>> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable done_cv;
  std::unordered_map<long, JobResult> results;
  bool stopping = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      workers.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu);
            cv.wait(lk, [this] { return stopping || !queue.empty(); });
            if (stopping && queue.empty()) return;
            job = std::move(queue.front());
            queue.pop_front();
          }
          job();
        }
      });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }
};

// Shared front half: decode -> short-side resize (capped long side).
// Fills r.ori/new dims; returns the resized BGR mat (empty on error).
cv::Mat decode_resize(const char* path, int short_side, int max_side,
                      int canvas_h, int canvas_w, JobResult& r) {
  cv::Mat bgr = cv::imread(path, cv::IMREAD_COLOR);
  if (bgr.empty()) {
    r.status = -2;
    return {};
  }
  r.ori_h = bgr.rows;
  r.ori_w = bgr.cols;
  double scale = double(short_side) / std::min(bgr.rows, bgr.cols);
  if (std::max(bgr.rows, bgr.cols) * scale > max_side) {
    scale = double(max_side) / std::max(bgr.rows, bgr.cols);
  }
  int th = int(bgr.rows * scale), tw = int(bgr.cols * scale);
  if (th > canvas_h || tw > canvas_w) {
    r.status = -3;  // canvas too small
    return {};
  }
  cv::Mat resized;
  cv::resize(bgr, resized, cv::Size(tw, th), 0, 0, cv::INTER_LINEAR);
  r.new_h = th;
  r.new_w = tw;
  return resized;
}

// One fused pass: decode -> RGB -> resize(short side, capped long side) ->
// (x/255 - mean)/std -> write into a zeroed float32 canvas + bool mask.
JobResult process_image(const char* path, int short_side, int max_side,
                        int canvas_h, int canvas_w, const float* mean,
                        const float* stdv, float* out_canvas,
                        unsigned char* out_mask) {
  JobResult r;
  cv::Mat resized =
      decode_resize(path, short_side, max_side, canvas_h, canvas_w, r);
  if (resized.empty()) return r;
  const int th = r.new_h, tw = r.new_w;

  const float inv255 = 1.0f / 255.0f;
  // canvas layout: HWC float32, zero outside the valid region
  std::memset(out_canvas, 0, sizeof(float) * canvas_h * canvas_w * 3);
  if (out_mask) std::memset(out_mask, 1, canvas_h * canvas_w);
  for (int y = 0; y < th; ++y) {
    const unsigned char* row = resized.ptr<unsigned char>(y);
    float* dst = out_canvas + (size_t(y) * canvas_w) * 3;
    for (int x = 0; x < tw; ++x) {
      // BGR -> RGB + normalize
      dst[x * 3 + 0] = (row[x * 3 + 2] * inv255 - mean[0]) / stdv[0];
      dst[x * 3 + 1] = (row[x * 3 + 1] * inv255 - mean[1]) / stdv[1];
      dst[x * 3 + 2] = (row[x * 3 + 0] * inv255 - mean[2]) / stdv[2];
    }
    if (out_mask) std::memset(out_mask + size_t(y) * canvas_w, 0, tw);
  }
  r.status = 0;
  return r;
}

// uint8 variant for the pipelined submit path (engine/submit.py): raw RGB
// canvas, normalization rides the compiled device step — 4x fewer
// host->device bytes per streamed frame than the f32 canvas.
JobResult process_image_u8(const char* path, int short_side, int max_side,
                           int canvas_h, int canvas_w,
                           unsigned char* out_canvas,
                           unsigned char* out_mask) {
  JobResult r;
  cv::Mat resized =
      decode_resize(path, short_side, max_side, canvas_h, canvas_w, r);
  if (resized.empty()) return r;
  const int th = r.new_h, tw = r.new_w;

  std::memset(out_canvas, 0, size_t(canvas_h) * canvas_w * 3);
  if (out_mask) std::memset(out_mask, 1, canvas_h * canvas_w);
  cv::Mat rgb;
  cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
  for (int y = 0; y < th; ++y) {
    std::memcpy(out_canvas + (size_t(y) * canvas_w) * 3,
                rgb.ptr<unsigned char>(y), size_t(tw) * 3);
    if (out_mask) std::memset(out_mask + size_t(y) * canvas_w, 0, tw);
  }
  r.status = 0;
  return r;
}

}  // namespace

extern "C" {

void* dp_create(int num_threads) { return new Pool(std::max(1, num_threads)); }

void dp_destroy(void* handle) { delete static_cast<Pool*>(handle); }

// Synchronous fused decode. Returns 0 on success; fills dims[4] with
// (ori_h, ori_w, new_h, new_w).
int dp_decode_sync(const char* path, int short_side, int max_side,
                   int canvas_h, int canvas_w, const float* mean,
                   const float* stdv, float* out_canvas,
                   unsigned char* out_mask, int* dims) {
  JobResult r = process_image(path, short_side, max_side, canvas_h, canvas_w,
                              mean, stdv, out_canvas, out_mask);
  dims[0] = r.ori_h;
  dims[1] = r.ori_w;
  dims[2] = r.new_h;
  dims[3] = r.new_w;
  return r.status;
}

// Synchronous fused uint8 decode (no normalize); same returns.
int dp_decode_sync_u8(const char* path, int short_side, int max_side,
                      int canvas_h, int canvas_w, unsigned char* out_canvas,
                      unsigned char* out_mask, int* dims) {
  JobResult r = process_image_u8(path, short_side, max_side, canvas_h,
                                 canvas_w, out_canvas, out_mask);
  dims[0] = r.ori_h;
  dims[1] = r.ori_w;
  dims[2] = r.new_h;
  dims[3] = r.new_w;
  return r.status;
}

// Asynchronous submit; caller keeps the buffers alive until dp_wait returns.
int dp_submit(void* handle, long job_id, const char* path, int short_side,
              int max_side, int canvas_h, int canvas_w, const float* mean,
              const float* stdv, float* out_canvas, unsigned char* out_mask) {
  Pool* pool = static_cast<Pool*>(handle);
  std::string p(path);
  float m[3] = {mean[0], mean[1], mean[2]};
  float s[3] = {stdv[0], stdv[1], stdv[2]};
  {
    std::lock_guard<std::mutex> lk(pool->mu);
    if (pool->stopping) return -1;
    pool->queue.emplace_back([=] {
      JobResult r = process_image(p.c_str(), short_side, max_side, canvas_h,
                                  canvas_w, m, s, out_canvas, out_mask);
      {
        std::lock_guard<std::mutex> lk2(pool->mu);
        pool->results[job_id] = r;
      }
      pool->done_cv.notify_all();
    });
  }
  pool->cv.notify_one();
  return 0;
}

// Blocks until job_id finishes; same returns as dp_decode_sync.
int dp_wait(void* handle, long job_id, int* dims) {
  Pool* pool = static_cast<Pool*>(handle);
  std::unique_lock<std::mutex> lk(pool->mu);
  pool->done_cv.wait(lk, [&] { return pool->results.count(job_id) > 0; });
  JobResult r = pool->results[job_id];
  pool->results.erase(job_id);
  dims[0] = r.ori_h;
  dims[1] = r.ori_w;
  dims[2] = r.new_h;
  dims[3] = r.new_w;
  return r.status;
}

}  // extern "C"
