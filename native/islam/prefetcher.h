// Background scan prefetcher — the native data-loader stage.
//
// The reference's ingest is a ROS subscriber callback fed by TCPROS deserial-
// ization on a MultiThreadedSpinner(8) (`scanRegistration.cpp:738`): message
// decode happens on spinner threads while the previous scan is processed.
// Replayed from a log, the equivalent overlap is a reader thread that faults
// in and copies the next frames while the device computes on the current one.
//
// A ring of S slots; the IO thread fills slots in order, the consumer
// acquires them in order (blocking), then releases.  Each slot is a
// contiguous, 64-byte-aligned host buffer ready for jax.device_put.
#pragma once

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <mutex>
#include <thread>
#include <vector>

#include "scan_log.h"

namespace islam {

class Prefetcher {
 public:
  // Prefetch frames [start, end) from the log, depth slots deep.
  Prefetcher(const ScanLogReader* log, uint64_t start, uint64_t end,
             uint32_t depth)
      : log_(log),
        start_(start),
        end_(end > log->num_frames() ? log->num_frames() : end),
        depth_(depth),
        slots_(depth) {
    for (auto& s : slots_) s.resize(log_->frame_size() + 64);
    th_ = std::thread([this] { run(); });
  }

  ~Prefetcher() {
    stop();
    if (th_.joinable()) th_.join();
  }

  // Blocks until the next frame in sequence is ready.  Returns the frame
  // index, or UINT64_MAX at end-of-stream.  *data points at the frame bytes
  // (timestamp, xyz, intensity[, gt]) valid until release() is called.
  uint64_t acquire(const uint8_t** data) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_ready_.wait(lk, [&] { return filled_ > taken_ || done_; });
    if (taken_ >= filled_ && done_) return UINT64_MAX;
    uint64_t k = start_ + taken_;
    *data = aligned(slots_[taken_ % depth_]);
    ++taken_;
    return k;
  }

  // Releases the oldest acquired slot back to the IO thread.
  void release() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      ++released_;
    }
    cv_free_.notify_one();
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stopping_ = true;
    }
    cv_free_.notify_all();
    cv_ready_.notify_all();
  }

 private:
  static const uint8_t* aligned(const std::vector<uint8_t>& v) {
    auto p = reinterpret_cast<uintptr_t>(v.data());
    return reinterpret_cast<const uint8_t*>((p + 63) & ~uintptr_t(63));
  }

  void run() {
    uint64_t total = end_ > start_ ? end_ - start_ : 0;
    for (uint64_t i = 0; i < total; ++i) {
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_free_.wait(lk, [&] { return filled_ - released_ < depth_ || stopping_; });
        if (stopping_) break;
      }
      if (i + 1 < total) log_->prefetch(start_ + i + 1);  // fault ahead
      const uint8_t* src = log_->frame_ptr(start_ + i);
      auto* dst = const_cast<uint8_t*>(aligned(slots_[i % depth_]));
      std::memcpy(dst, src, log_->frame_size());
      {
        std::lock_guard<std::mutex> lk(mu_);
        ++filled_;
      }
      cv_ready_.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_ready_.notify_all();
  }

  const ScanLogReader* log_;
  const uint64_t start_, end_;
  const uint32_t depth_;
  std::vector<std::vector<uint8_t>> slots_;
  std::mutex mu_;
  std::condition_variable cv_ready_, cv_free_;
  uint64_t filled_ = 0, taken_ = 0, released_ = 0;
  bool done_ = false, stopping_ = false;
  std::thread th_;
};

}  // namespace islam
