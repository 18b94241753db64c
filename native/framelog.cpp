// framelog: append-only binary frame recorder + mmap zero-copy replayer.
//
// TPU-native replacement for the reference's ad-hoc frame persistence --
// rosbag reads (reference leaf_grasp_node.py:35-51) and loose
// PNG + .npy frame dumps replayed by the offline nodes
// (leaf_grasp_node.py:63-69, test_leaf_node.py:36-41). One compact file
// holds a whole session: a fixed header plus fixed-size records of
// (stamp, seq, int16 mask, f32 depth), so the reader mmaps the file and
// hands out zero-copy pointers with O(1) random access.
//
// Crash safety: records are appended with a single buffered write and
// fflush; a torn final record (power loss mid-append) is detected by
// `size % record_bytes` and ignored by the reader -- the same
// truncate-don't-corrupt contract as the reference collector's
// backup-and-replace scheme (data_collector.py:508-589).
//
// Build: make -C native   (produces libframelog.so; ctypes binding in
// leafgrasp_tpu/io/framelog.py with a numpy-memmap fallback).

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x474C464Cu;  // "LFLG"
// v2 pads the int16 mask payload to a 4-byte multiple so the float
// depth payload is always 4-byte aligned for zero-copy reads (v1 was
// misaligned when h*w is odd). Readers accept both versions.
constexpr uint32_t kVersion = 2;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t height;
  uint32_t width;
  uint64_t record_bytes;  // per-frame record size incl. record header
  uint64_t reserved;
};

struct RecordHeader {
  int64_t stamp_us;
  uint64_t seq;
};

inline uint64_t mask_pad(uint32_t h, uint32_t w, uint32_t version) {
  if (version < 2) return 0;
  uint64_t mask_bytes = static_cast<uint64_t>(h) * w * sizeof(int16_t);
  return (4 - mask_bytes % 4) % 4;
}

inline uint64_t record_bytes(uint32_t h, uint32_t w, uint32_t version) {
  return sizeof(RecordHeader) +
         static_cast<uint64_t>(h) * w * sizeof(int16_t) +
         mask_pad(h, w, version) +
         static_cast<uint64_t>(h) * w * sizeof(float);
}

struct Writer {
  FILE* f;
  uint32_t h, w;
  uint64_t seq;
};

struct Reader {
  int fd;
  const uint8_t* base;
  size_t mapped;
  uint32_t h, w;
  uint64_t rec_bytes;
  uint64_t pad;
  int64_t count;
};

}  // namespace

extern "C" {

// overwrite == 0 refuses to clobber an existing log at `path` (the
// append-only/crash-safe framing makes silent truncation a data-loss
// hazard when a session path is reused).
void* fl_writer_open(const char* path, int h, int w, int overwrite) {
  FILE* f = std::fopen(path, overwrite ? "wb" : "wbx");
  if (!f) return nullptr;
  Header hdr{kMagic, kVersion, static_cast<uint32_t>(h),
             static_cast<uint32_t>(w), record_bytes(h, w, kVersion), 0};
  if (std::fwrite(&hdr, sizeof(hdr), 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  auto* wr = new Writer{f, static_cast<uint32_t>(h),
                        static_cast<uint32_t>(w), 0};
  return wr;
}

int fl_writer_append(void* handle, const int16_t* mask, const float* depth,
                     int64_t stamp_us) {
  auto* wr = static_cast<Writer*>(handle);
  RecordHeader rh{stamp_us, wr->seq};
  const size_t n = static_cast<size_t>(wr->h) * wr->w;
  const uint64_t pad = mask_pad(wr->h, wr->w, kVersion);
  const uint8_t zeros[4] = {0, 0, 0, 0};
  if (std::fwrite(&rh, sizeof(rh), 1, wr->f) != 1) return -1;
  if (std::fwrite(mask, sizeof(int16_t), n, wr->f) != n) return -1;
  if (pad && std::fwrite(zeros, 1, pad, wr->f) != pad) return -1;
  if (std::fwrite(depth, sizeof(float), n, wr->f) != n) return -1;
  if (std::fflush(wr->f) != 0) return -1;
  wr->seq += 1;
  return 0;
}

int64_t fl_writer_count(void* handle) {
  return static_cast<int64_t>(static_cast<Writer*>(handle)->seq);
}

int fl_writer_close(void* handle) {
  auto* wr = static_cast<Writer*>(handle);
  int rc = std::fclose(wr->f);
  delete wr;
  return rc;
}

void* fl_reader_open(const char* path, int* h, int* w, int64_t* count) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (::fstat(fd, &st) != 0 ||
      static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const Header* hdr = static_cast<const Header*>(base);
  if (hdr->magic != kMagic || hdr->version < 1 || hdr->version > kVersion ||
      hdr->record_bytes != record_bytes(hdr->height, hdr->width,
                                        hdr->version)) {
    ::munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }
  // a torn final record is excluded by integer division
  int64_t n = (st.st_size - sizeof(Header)) / hdr->record_bytes;
  auto* rd = new Reader{fd, static_cast<const uint8_t*>(base),
                        static_cast<size_t>(st.st_size), hdr->height,
                        hdr->width, hdr->record_bytes,
                        mask_pad(hdr->height, hdr->width, hdr->version), n};
  *h = static_cast<int>(hdr->height);
  *w = static_cast<int>(hdr->width);
  *count = n;
  return rd;
}

int fl_reader_frame(void* handle, int64_t idx, const int16_t** mask,
                    const float** depth, int64_t* stamp_us) {
  auto* rd = static_cast<Reader*>(handle);
  if (idx < 0 || idx >= rd->count) return -1;
  const uint8_t* rec = rd->base + sizeof(Header) + idx * rd->rec_bytes;
  const auto* rh = reinterpret_cast<const RecordHeader*>(rec);
  *stamp_us = rh->stamp_us;
  *mask = reinterpret_cast<const int16_t*>(rec + sizeof(RecordHeader));
  *depth = reinterpret_cast<const float*>(
      rec + sizeof(RecordHeader) +
      static_cast<uint64_t>(rd->h) * rd->w * sizeof(int16_t) + rd->pad);
  return 0;
}

int fl_reader_close(void* handle) {
  auto* rd = static_cast<Reader*>(handle);
  ::munmap(const_cast<uint8_t*>(rd->base), rd->mapped);
  ::close(rd->fd);
  delete rd;
  return 0;
}

}  // extern "C"
