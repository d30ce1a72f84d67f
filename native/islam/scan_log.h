// Binary scan-log container ("islog") — the TPU framework's replacement for
// the reference's rosbag ingest (README.md:152-169: spot_corridor.bag,
// sensor_msgs/PointCloud2 on /os_cloud_node/points at ~10 Hz).
//
// Design: fixed-size frames so frame k lives at a computable offset — the
// reader is one mmap and zero parsing; the prefetcher can touch pages ahead
// of the consumer.  Layout (little endian):
//
//   header (64 bytes):
//     char     magic[8] = "ISLAMLG1"
//     uint32   version  = 1
//     uint32   height, width          // organized cloud dims (e.g. 64x1024)
//     uint64   num_frames
//     uint32   flags                  // bit0: frames carry ground-truth pose
//     uint32   reserved[7]
//   frame k (fixed size):
//     double   timestamp              // seconds
//     float    xyz[H*W*3]             // row-major, sensor frame
//     float    intensity[H*W]
//     [flags&1] float gt_q[4], gt_t[3]  // ground-truth pose (w,x,y,z), t
#pragma once

#include <cstdint>
#include <string>

namespace islam {

constexpr char kMagic[8] = {'I', 'S', 'L', 'A', 'M', 'L', 'G', '1'};
constexpr uint32_t kFlagGroundTruth = 1u;

#pragma pack(push, 1)
struct LogHeader {
  char magic[8];
  uint32_t version;
  uint32_t height;
  uint32_t width;
  uint64_t num_frames;
  uint32_t flags;
  uint32_t reserved[8];
};
#pragma pack(pop)
static_assert(sizeof(LogHeader) == 64, "header must be 64 bytes");

inline uint64_t frame_bytes(uint32_t h, uint32_t w, uint32_t flags) {
  uint64_t n = static_cast<uint64_t>(h) * w;
  uint64_t sz = 8 + n * 3 * 4 + n * 4;
  if (flags & kFlagGroundTruth) sz += 7 * 4;
  return sz;
}

// mmap-backed reader.
class ScanLogReader {
 public:
  ScanLogReader() = default;
  ~ScanLogReader();
  ScanLogReader(const ScanLogReader&) = delete;
  ScanLogReader& operator=(const ScanLogReader&) = delete;

  // Returns 0 on success, negative errno-style code on failure.
  int open(const std::string& path);
  void close();

  const LogHeader& header() const { return hdr_; }
  uint64_t num_frames() const { return hdr_.num_frames; }
  // Raw pointer to the start of frame k (timestamp field); nullptr if OOB.
  const uint8_t* frame_ptr(uint64_t k) const;
  uint64_t frame_size() const { return frame_size_; }
  // Hint the kernel to read frame k's pages ahead (madvise WILLNEED).
  void prefetch(uint64_t k) const;

 private:
  LogHeader hdr_{};
  uint8_t* map_ = nullptr;
  uint64_t map_size_ = 0;
  uint64_t frame_size_ = 0;
  int fd_ = -1;
};

// Append-only writer; header's num_frames is finalized on close.
class ScanLogWriter {
 public:
  ScanLogWriter() = default;
  ~ScanLogWriter();
  ScanLogWriter(const ScanLogWriter&) = delete;
  ScanLogWriter& operator=(const ScanLogWriter&) = delete;

  int open(const std::string& path, uint32_t h, uint32_t w, uint32_t flags);
  // xyz: H*W*3 floats, intensity: H*W floats; gt may be null unless
  // the log was opened with kFlagGroundTruth.
  int append(double timestamp, const float* xyz, const float* intensity,
             const float* gt_q, const float* gt_t);
  int close();
  uint64_t num_frames() const { return n_; }

 private:
  LogHeader hdr_{};
  int fd_ = -1;
  uint64_t n_ = 0;
};

}  // namespace islam
