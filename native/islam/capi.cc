// C API for ctypes bindings (pybind11 is not available in this toolchain;
// the Python side wraps these with ctypes in
// intensity_slam_tpu/runtime/native.py).
#include <cstdint>

#include "channel.h"
#include "prefetcher.h"
#include "scan_log.h"
#include "traj_writer.h"

#define ISLAM_API extern "C" __attribute__((visibility("default")))

using namespace islam;

// ---- scan log reader -------------------------------------------------------

ISLAM_API void* islog_open(const char* path) {
  auto* r = new ScanLogReader();
  if (r->open(path) != 0) {
    delete r;
    return nullptr;
  }
  return r;
}

ISLAM_API void islog_close(void* h) { delete static_cast<ScanLogReader*>(h); }

ISLAM_API void islog_info(void* h, uint32_t* height, uint32_t* width,
                          uint64_t* num_frames, uint32_t* flags) {
  auto* r = static_cast<ScanLogReader*>(h);
  *height = r->header().height;
  *width = r->header().width;
  *num_frames = r->num_frames();
  *flags = r->header().flags;
}

ISLAM_API const uint8_t* islog_frame(void* h, uint64_t k) {
  return static_cast<ScanLogReader*>(h)->frame_ptr(k);
}

ISLAM_API uint64_t islog_frame_size(void* h) {
  return static_cast<ScanLogReader*>(h)->frame_size();
}

// ---- scan log writer -------------------------------------------------------

ISLAM_API void* islog_writer_open(const char* path, uint32_t h, uint32_t w,
                                  uint32_t flags) {
  auto* wr = new ScanLogWriter();
  if (wr->open(path, h, w, flags) != 0) {
    delete wr;
    return nullptr;
  }
  return wr;
}

ISLAM_API int islog_writer_append(void* h, double ts, const float* xyz,
                                  const float* intensity, const float* gt_q,
                                  const float* gt_t) {
  return static_cast<ScanLogWriter*>(h)->append(ts, xyz, intensity, gt_q,
                                                gt_t);
}

ISLAM_API int islog_writer_close(void* h) {
  auto* w = static_cast<ScanLogWriter*>(h);
  int rc = w->close();
  delete w;
  return rc;
}

// ---- prefetcher ------------------------------------------------------------

ISLAM_API void* isprefetch_create(void* log, uint64_t start, uint64_t end,
                                  uint32_t depth) {
  return new Prefetcher(static_cast<ScanLogReader*>(log), start, end, depth);
}

ISLAM_API uint64_t isprefetch_acquire(void* h, const uint8_t** data) {
  return static_cast<Prefetcher*>(h)->acquire(data);
}

ISLAM_API void isprefetch_release(void* h) {
  static_cast<Prefetcher*>(h)->release();
}

ISLAM_API void isprefetch_destroy(void* h) {
  delete static_cast<Prefetcher*>(h);
}

// ---- wire-format prefetcher (packs on the IO thread) -----------------------

ISLAM_API void* iswire_create(void* log, uint64_t start, uint64_t end,
                              uint32_t depth, float max_range) {
  return new WirePrefetcher(static_cast<ScanLogReader*>(log), start, end,
                            depth, max_range);
}

ISLAM_API uint64_t iswire_acquire(void* h, const uint16_t** data, double* ts) {
  return static_cast<WirePrefetcher*>(h)->acquire(data, ts);
}

ISLAM_API void iswire_release(void* h) {
  static_cast<WirePrefetcher*>(h)->release();
}

ISLAM_API double iswire_base(void* h) {
  return static_cast<WirePrefetcher*>(h)->base_timestamp();
}

ISLAM_API void iswire_destroy(void* h) {
  delete static_cast<WirePrefetcher*>(h);
}

// ---- channel ---------------------------------------------------------------

ISLAM_API void* ischan_create(uint32_t capacity, uint32_t msg_size) {
  return new Channel(capacity, msg_size);
}

ISLAM_API int ischan_push(void* h, const void* data, int drop_oldest) {
  return static_cast<Channel*>(h)->push(data, drop_oldest != 0);
}

ISLAM_API int ischan_pop(void* h, void* out, int64_t timeout_ms) {
  return static_cast<Channel*>(h)->pop(out, timeout_ms);
}

ISLAM_API uint32_t ischan_size(void* h) {
  return static_cast<Channel*>(h)->size();
}

ISLAM_API uint64_t ischan_dropped(void* h) {
  return static_cast<Channel*>(h)->dropped();
}

ISLAM_API void ischan_close(void* h) { static_cast<Channel*>(h)->close(); }

ISLAM_API void ischan_destroy(void* h) { delete static_cast<Channel*>(h); }

// ---- trajectory writer -----------------------------------------------------

ISLAM_API void* istraj_open(const char* path) {
  auto* w = new TrajWriter(path);
  if (!w->ok()) {
    delete w;
    return nullptr;
  }
  return w;
}

ISLAM_API void istraj_append(void* h, double t, const float* tr,
                             const float* q) {
  static_cast<TrajWriter*>(h)->append(t, tr, q);
}

ISLAM_API void istraj_close(void* h) {
  auto* w = static_cast<TrajWriter*>(h);
  w->close();
  delete w;
}
