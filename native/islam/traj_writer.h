// Asynchronous trajectory writer (TUM format: "t tx ty tz qx qy qz qw").
//
// The reference's only persistence was a blocking debug ofstream in the hot
// mapping thread (`laserMapping.cpp:1108-1125`, hard-coded /home/snow path).
// Here pose rows are queued from the real-time loop and formatted/flushed by
// a background thread, so file IO never stalls a frame.
#pragma once

#include <condition_variable>
#include <cstdio>
#include <deque>
#include <mutex>
#include <string>
#include <thread>

namespace islam {

class TrajWriter {
 public:
  explicit TrajWriter(const std::string& path) {
    f_ = std::fopen(path.c_str(), "w");
    th_ = std::thread([this] { run(); });
  }
  ~TrajWriter() { close(); }

  bool ok() const { return f_ != nullptr; }

  // q is (w, x, y, z); written in TUM order (x, y, z, w).
  void append(double t, const float* tr, const float* q) {
    Row r{t, {tr[0], tr[1], tr[2]}, {q[0], q[1], q[2], q[3]}};
    {
      std::lock_guard<std::mutex> lk(mu_);
      rows_.push_back(r);
    }
    cv_.notify_one();
  }

  void close() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (closed_) return;
      closed_ = true;
    }
    cv_.notify_all();
    if (th_.joinable()) th_.join();
    if (f_) {
      std::fclose(f_);
      f_ = nullptr;
    }
  }

 private:
  struct Row {
    double t;
    float tr[3], q[4];  // q = (w, x, y, z)
  };

  void run() {
    std::unique_lock<std::mutex> lk(mu_);
    for (;;) {
      cv_.wait(lk, [&] { return !rows_.empty() || closed_; });
      while (!rows_.empty()) {
        Row r = rows_.front();
        rows_.pop_front();
        lk.unlock();
        if (f_)
          std::fprintf(f_, "%.9f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n", r.t,
                       r.tr[0], r.tr[1], r.tr[2], r.q[1], r.q[2], r.q[3],
                       r.q[0]);
        lk.lock();
      }
      if (closed_ && rows_.empty()) break;
    }
    if (f_) std::fflush(f_);
  }

  std::FILE* f_ = nullptr;
  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<Row> rows_;
  bool closed_ = false;
  std::thread th_;
};

}  // namespace islam
