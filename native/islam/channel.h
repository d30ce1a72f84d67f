// Bounded MPMC byte-message channel — the native equivalent of the
// reference's mutex-guarded std::deque queues between its long-running
// threads (`intensity_feature_tracker.h:242-248` keyframe/factor queues,
// `laserOdometry.cpp:138-144` cloud buffers) and of the bounded-latency
// frame-drop policy in `laserMapping.cpp:317-321` (drop backlog to stay
// real-time).
//
// Fixed message size (chosen at construction) keeps the hot path a single
// memcpy under a short critical section; condition variables park consumers.
#pragma once

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace islam {

class Channel {
 public:
  Channel(uint32_t capacity, uint32_t msg_size)
      : cap_(capacity), msg_(msg_size), buf_(size_t(capacity) * msg_size) {}

  uint32_t capacity() const { return cap_; }
  uint32_t msg_size() const { return msg_; }

  // Returns: 1 pushed, 0 full (drop_oldest=false only), -1 closed.
  // drop_oldest: overwrite the oldest queued message instead of failing —
  // the real-time policy for odometry streams (latest data wins).
  int push(const void* data, bool drop_oldest) {
    std::unique_lock<std::mutex> lk(mu_);
    if (closed_) return -1;
    if (count_ == cap_) {
      if (!drop_oldest) return 0;
      head_ = (head_ + 1) % cap_;  // drop oldest
      --count_;
      ++dropped_;
    }
    uint32_t slot = (head_ + count_) % cap_;
    std::memcpy(&buf_[size_t(slot) * msg_], data, msg_);
    ++count_;
    lk.unlock();
    cv_pop_.notify_one();
    return 1;
  }

  // Blocking pop with timeout. Returns 1 popped, 0 timeout, -1 closed+empty.
  int pop(void* out, int64_t timeout_ms) {
    std::unique_lock<std::mutex> lk(mu_);
    auto ready = [&] { return count_ > 0 || closed_; };
    if (timeout_ms < 0) {
      cv_pop_.wait(lk, ready);
    } else if (!cv_pop_.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                 ready)) {
      return 0;
    }
    if (count_ == 0) return -1;  // closed and drained
    std::memcpy(out, &buf_[size_t(head_) * msg_], msg_);
    head_ = (head_ + 1) % cap_;
    --count_;
    lk.unlock();
    cv_push_.notify_one();
    return 1;
  }

  uint32_t size() {
    std::lock_guard<std::mutex> lk(mu_);
    return count_;
  }
  uint64_t dropped() {
    std::lock_guard<std::mutex> lk(mu_);
    return dropped_;
  }

  void close() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      closed_ = true;
    }
    cv_pop_.notify_all();
    cv_push_.notify_all();
  }

 private:
  const uint32_t cap_, msg_;
  std::vector<uint8_t> buf_;
  std::mutex mu_;
  std::condition_variable cv_pop_, cv_push_;
  uint32_t head_ = 0, count_ = 0;
  uint64_t dropped_ = 0;
  bool closed_ = false;
};

}  // namespace islam
