// framebus: lock-free latest-frame pairing bus for the ingest runtime.
//
// TPU-native replacement for the reference's inter-process plumbing: ROS
// topic callbacks writing into python attributes guarded by a hand-rolled
// `processing` flag plus a parameter-server busy-wait barrier
// (reference leaf_grasp_node_v3.py:104-107,185-218 -- see SURVEY.md 5.2).
// Here each stream (instance mask, depth) gets a triple-buffered
// lock-free mailbox with sequence numbers; the consumer atomically grabs
// the freshest unseen (mask, depth) pair.  Producers never block and
// never tear; stale frames are dropped with counters.
//
// Build: make -C native   (produces libframebus.so; ctypes binding in
// leafgrasp_tpu/io/framebus.py with a pure-python fallback).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

// Triple-buffered single-producer/single-consumer latest-value mailbox.
//
// Slot state encoding in `ready_idx`: lower 2 bits = slot index of the
// most recently published buffer; bit 7 = "fresh" flag (unseen by the
// consumer). Producer writes into its private slot, then atomically
// exchanges it with ready_idx; consumer exchanges ready_idx with its
// private slot when the fresh bit is set.
struct Mailbox {
  uint8_t* slots[3];
  size_t bytes;
  std::atomic<uint32_t> ready;   // (fresh << 7) | slot
  uint32_t write_slot;
  uint32_t read_slot;
  std::atomic<uint64_t> pushed;
  std::atomic<uint64_t> dropped;
  int64_t stamps[3];
  uint64_t seqs[3];

  void init(size_t nbytes) {
    bytes = nbytes;
    for (int i = 0; i < 3; ++i) {
      slots[i] = new uint8_t[nbytes];
      stamps[i] = 0;
      seqs[i] = 0;
    }
    ready.store(0, std::memory_order_relaxed);
    write_slot = 1;
    read_slot = 2;
    pushed.store(0, std::memory_order_relaxed);
    dropped.store(0, std::memory_order_relaxed);
  }

  void destroy() {
    for (int i = 0; i < 3; ++i) delete[] slots[i];
  }

  void push(const void* data, int64_t stamp) {
    std::memcpy(slots[write_slot], data, bytes);
    stamps[write_slot] = stamp;
    uint64_t seq = pushed.fetch_add(1, std::memory_order_relaxed) + 1;
    seqs[write_slot] = seq;
    uint32_t prev = ready.exchange((1u << 7) | write_slot,
                                   std::memory_order_acq_rel);
    if (prev & (1u << 7)) dropped.fetch_add(1, std::memory_order_relaxed);
    write_slot = prev & 3u;
  }

  // Returns true if a fresh frame was copied out.
  bool take(void* out, int64_t* stamp, uint64_t* seq) {
    uint32_t cur = ready.load(std::memory_order_acquire);
    if (!(cur & (1u << 7))) return false;
    uint32_t got = ready.exchange(read_slot, std::memory_order_acq_rel);
    read_slot = got & 3u;
    std::memcpy(out, slots[read_slot], bytes);
    if (stamp) *stamp = stamps[read_slot];
    if (seq) *seq = seqs[read_slot];
    return true;
  }
};

struct FrameBus {
  int height;
  int width;
  Mailbox mask;
  Mailbox depth;
  std::atomic<uint64_t> pairs;
  // staging for pairing: freshest taken-but-unpaired frames
  uint8_t* mask_stage;
  uint8_t* depth_stage;
  bool mask_staged;
  bool depth_staged;
  int64_t mask_stamp;
  int64_t depth_stamp;
};

}  // namespace

extern "C" {

FrameBus* fb_create(int height, int width) {
  auto* fb = new FrameBus();
  fb->height = height;
  fb->width = width;
  fb->mask.init(size_t(height) * width * sizeof(int16_t));
  fb->depth.init(size_t(height) * width * sizeof(float));
  fb->pairs.store(0, std::memory_order_relaxed);
  fb->mask_stage = new uint8_t[size_t(height) * width * sizeof(int16_t)];
  fb->depth_stage = new uint8_t[size_t(height) * width * sizeof(float)];
  fb->mask_staged = fb->depth_staged = false;
  fb->mask_stamp = fb->depth_stamp = 0;
  return fb;
}

void fb_destroy(FrameBus* fb) {
  fb->mask.destroy();
  fb->depth.destroy();
  delete[] fb->mask_stage;
  delete[] fb->depth_stage;
  delete fb;
}

void fb_push_mask(FrameBus* fb, const int16_t* data, int64_t stamp_us) {
  fb->mask.push(data, stamp_us);
}

void fb_push_depth(FrameBus* fb, const float* data, int64_t stamp_us) {
  fb->depth.push(data, stamp_us);
}

// Consumer side (single consumer): returns 1 and fills outputs when a
// fresh (mask, depth) pair is available; 0 otherwise. A pair = the
// freshest mask and freshest depth, each consumed at most once.
int fb_try_get_pair(FrameBus* fb, int16_t* mask_out, float* depth_out,
                    int64_t* mask_stamp, int64_t* depth_stamp) {
  if (!fb->mask_staged)
    fb->mask_staged =
        fb->mask.take(fb->mask_stage, &fb->mask_stamp, nullptr);
  if (!fb->depth_staged)
    fb->depth_staged =
        fb->depth.take(fb->depth_stage, &fb->depth_stamp, nullptr);
  if (!(fb->mask_staged && fb->depth_staged)) return 0;

  std::memcpy(mask_out, fb->mask_stage,
              size_t(fb->height) * fb->width * sizeof(int16_t));
  std::memcpy(depth_out, fb->depth_stage,
              size_t(fb->height) * fb->width * sizeof(float));
  if (mask_stamp) *mask_stamp = fb->mask_stamp;
  if (depth_stamp) *depth_stamp = fb->depth_stamp;
  fb->mask_staged = fb->depth_staged = false;
  fb->pairs.fetch_add(1, std::memory_order_relaxed);
  return 1;
}

void fb_stats(FrameBus* fb, uint64_t* mask_pushed, uint64_t* mask_dropped,
              uint64_t* depth_pushed, uint64_t* depth_dropped,
              uint64_t* pairs) {
  if (mask_pushed) *mask_pushed = fb->mask.pushed.load();
  if (mask_dropped) *mask_dropped = fb->mask.dropped.load();
  if (depth_pushed) *depth_pushed = fb->depth.pushed.load();
  if (depth_dropped) *depth_dropped = fb->depth.dropped.load();
  if (pairs) *pairs = fb->pairs.load();
}

}  // extern "C"
