#include "scan_log.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cerrno>
#include <cstring>

namespace islam {

ScanLogReader::~ScanLogReader() { close(); }

int ScanLogReader::open(const std::string& path) {
  close();
  fd_ = ::open(path.c_str(), O_RDONLY);
  if (fd_ < 0) return -errno;
  struct stat st;
  if (fstat(fd_, &st) != 0) {
    int e = -errno;
    close();
    return e;
  }
  if (static_cast<uint64_t>(st.st_size) < sizeof(LogHeader)) {
    close();
    return -EINVAL;
  }
  map_size_ = static_cast<uint64_t>(st.st_size);
  void* p = mmap(nullptr, map_size_, PROT_READ, MAP_SHARED, fd_, 0);
  if (p == MAP_FAILED) {
    int e = -errno;
    close();
    return e;
  }
  map_ = static_cast<uint8_t*>(p);
  std::memcpy(&hdr_, map_, sizeof(hdr_));
  if (std::memcmp(hdr_.magic, kMagic, 8) != 0 || hdr_.version != 1) {
    close();
    return -EINVAL;
  }
  frame_size_ = frame_bytes(hdr_.height, hdr_.width, hdr_.flags);
  uint64_t need = sizeof(LogHeader) + hdr_.num_frames * frame_size_;
  if (map_size_ < need) {
    // tolerate a truncated tail (e.g. writer crash): trust the data we have
    hdr_.num_frames = (map_size_ - sizeof(LogHeader)) / frame_size_;
  }
  // sequential replay is the common access pattern
  madvise(map_, map_size_, MADV_SEQUENTIAL);
  return 0;
}

void ScanLogReader::close() {
  if (map_) {
    munmap(map_, map_size_);
    map_ = nullptr;
  }
  if (fd_ >= 0) {
    ::close(fd_);
    fd_ = -1;
  }
  map_size_ = frame_size_ = 0;
  hdr_ = LogHeader{};
}

const uint8_t* ScanLogReader::frame_ptr(uint64_t k) const {
  if (!map_ || k >= hdr_.num_frames) return nullptr;
  return map_ + sizeof(LogHeader) + k * frame_size_;
}

void ScanLogReader::prefetch(uint64_t k) const {
  const uint8_t* p = frame_ptr(k);
  if (p) madvise(const_cast<uint8_t*>(p), frame_size_, MADV_WILLNEED);
}

ScanLogWriter::~ScanLogWriter() { close(); }

int ScanLogWriter::open(const std::string& path, uint32_t h, uint32_t w,
                        uint32_t flags) {
  close();
  fd_ = ::open(path.c_str(), O_CREAT | O_TRUNC | O_WRONLY, 0644);
  if (fd_ < 0) return -errno;
  std::memset(&hdr_, 0, sizeof(hdr_));
  std::memcpy(hdr_.magic, kMagic, 8);
  hdr_.version = 1;
  hdr_.height = h;
  hdr_.width = w;
  hdr_.flags = flags;
  n_ = 0;
  if (::write(fd_, &hdr_, sizeof(hdr_)) != sizeof(hdr_)) {
    int e = -errno;
    close();
    return e;
  }
  return 0;
}

static int write_all(int fd, const void* buf, size_t n) {
  const uint8_t* p = static_cast<const uint8_t*>(buf);
  while (n > 0) {
    ssize_t w = ::write(fd, p, n);
    if (w < 0) {
      if (errno == EINTR) continue;
      return -errno;
    }
    p += w;
    n -= static_cast<size_t>(w);
  }
  return 0;
}

int ScanLogWriter::append(double timestamp, const float* xyz,
                          const float* intensity, const float* gt_q,
                          const float* gt_t) {
  if (fd_ < 0) return -EBADF;
  uint64_t n = static_cast<uint64_t>(hdr_.height) * hdr_.width;
  int rc = write_all(fd_, &timestamp, 8);
  if (rc == 0) rc = write_all(fd_, xyz, n * 3 * 4);
  if (rc == 0) rc = write_all(fd_, intensity, n * 4);
  if (rc == 0 && (hdr_.flags & kFlagGroundTruth)) {
    if (!gt_q || !gt_t) return -EINVAL;
    rc = write_all(fd_, gt_q, 4 * 4);
    if (rc == 0) rc = write_all(fd_, gt_t, 3 * 4);
  }
  if (rc == 0) ++n_;
  return rc;
}

int ScanLogWriter::close() {
  if (fd_ < 0) return 0;
  hdr_.num_frames = n_;
  int rc = 0;
  if (lseek(fd_, 0, SEEK_SET) < 0) rc = -errno;
  if (rc == 0) rc = write_all(fd_, &hdr_, sizeof(hdr_));
  if (::close(fd_) != 0 && rc == 0) rc = -errno;
  fd_ = -1;
  return rc;
}

}  // namespace islam
