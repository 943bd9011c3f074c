// Host-side native runtime for absolutetrack_tpu.
//
// The reference delegates its native-performance host work to third-party
// binaries: cv2.remap for warps (lib/tracker/tracker.py:87), shared_memory
// ring buffers for the live demo (demo/main.py:144-171). This library
// provides those pieces natively for the host pipeline (the TPU compute
// path itself is XLA/Pallas; this code feeds it).
//
// Exposed C ABI (consumed via ctypes in absolutetrack_tpu/utils/native.py):
//   at_remap_bilinear   : cv2.remap(INTER_LINEAR, BORDER_CONSTANT 0) analog
//   at_warp_homography  : pixel-homography warp (4x4, new->orig)
//   at_bgr_to_gray      : BT.601 luma conversion (demo capture path)
//   at_ring_*           : single-producer single-consumer frame ring buffer
//
// Build: make -C native  (produces libabstrack_host.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <new>

extern "C" {

// Bilinear sample of src (h x w, float32) at (x, y); zero outside.
static inline float sample_bilinear(const float* src, int h, int w, float x,
                                    float y) {
  if (!(x >= 0.f) || !(y >= 0.f)) return 0.f;
  int x0 = (int)x, y0 = (int)y;
  if (x0 + 1 > w - 1 || y0 + 1 > h - 1) return 0.f;
  float wx = x - x0, wy = y - y0;
  const float* r0 = src + (size_t)y0 * w + x0;
  const float* r1 = r0 + w;
  return r0[0] * (1 - wx) * (1 - wy) + r0[1] * wx * (1 - wy) +
         r1[0] * (1 - wx) * wy + r1[1] * wx * wy;
}

// Generic remap: dst[i] = bilinear(src, map_x[i], map_y[i]).
void at_remap_bilinear(const float* src, int src_h, int src_w,
                       const float* map_x, const float* map_y, float* dst,
                       int dst_h, int dst_w) {
  const int n = dst_h * dst_w;
  for (int i = 0; i < n; ++i) {
    dst[i] = sample_bilinear(src, src_h, src_w, map_x[i], map_y[i]);
  }
}

// Pixel homography warp: for each dst pixel (u, v), src = M @ [u v 1 1]
// projected by z -- the destination grid is the homogeneous pixel (u, v, 1)
// with unit w (matches data_transform.py:78-144 semantics).
void at_warp_homography(const float* src, int src_h, int src_w,
                        const float* m4x4, float* dst, int dst_h, int dst_w) {
  const float* m = m4x4;
  for (int v = 0; v < dst_h; ++v) {
    for (int u = 0; u < dst_w; ++u) {
      float x = m[0] * u + m[1] * v + m[2] + m[3];
      float y = m[4] * u + m[5] * v + m[6] + m[7];
      float z = m[8] * u + m[9] * v + m[10] + m[11];
      float inv = z != 0.f ? 1.f / z : 0.f;
      dst[(size_t)v * dst_w + u] =
          sample_bilinear(src, src_h, src_w, x * inv, y * inv);
    }
  }
}

// BT.601 luma: gray = 0.299 R + 0.587 G + 0.114 B (input BGR u8).
void at_bgr_to_gray(const uint8_t* bgr, uint8_t* gray, int n_pixels) {
  for (int i = 0; i < n_pixels; ++i) {
    const uint8_t* p = bgr + 3 * i;
    gray[i] =
        (uint8_t)((114 * p[0] + 587 * p[1] + 299 * p[2] + 500) / 1000);
  }
}

// ---------------------------------------------------------------------------
// SPSC frame ring buffer over caller-owned memory (e.g. multiprocessing
// shared memory). Layout: header { head, tail } then n_slots * slot_bytes.
// The producer overwrites the oldest unread slot when full (live-capture
// semantics: the demo drops stale frames rather than blocking the camera,
// matching the reference's slot-index ring of size 6, demo/main.py:144-171).
// ---------------------------------------------------------------------------

struct RingHeader {
  std::atomic<uint64_t> head;  // next write index
  std::atomic<uint64_t> tail;  // next read index
  uint64_t n_slots;
  uint64_t slot_bytes;
};

size_t at_ring_header_bytes() { return sizeof(RingHeader); }

void at_ring_init(void* mem, uint64_t n_slots, uint64_t slot_bytes) {
  RingHeader* h = new (mem) RingHeader();
  h->head.store(0, std::memory_order_relaxed);
  h->tail.store(0, std::memory_order_relaxed);
  h->n_slots = n_slots;
  h->slot_bytes = slot_bytes;
}

// Returns the slot index written.
uint64_t at_ring_push(void* mem, const void* data, uint64_t bytes) {
  RingHeader* h = (RingHeader*)mem;
  uint8_t* base = (uint8_t*)mem + sizeof(RingHeader);
  uint64_t head = h->head.load(std::memory_order_relaxed);
  uint64_t slot = head % h->n_slots;
  uint64_t tail = h->tail.load(std::memory_order_acquire);
  if (head - tail >= h->n_slots) {
    // full: drop the oldest frame
    h->tail.compare_exchange_strong(tail, tail + 1, std::memory_order_acq_rel);
  }
  std::memcpy(base + slot * h->slot_bytes, data,
              bytes < h->slot_bytes ? bytes : h->slot_bytes);
  h->head.store(head + 1, std::memory_order_release);
  return slot;
}

// Returns 1 and copies out the next frame, or 0 if empty.
int at_ring_pop(void* mem, void* out, uint64_t bytes) {
  RingHeader* h = (RingHeader*)mem;
  uint8_t* base = (uint8_t*)mem + sizeof(RingHeader);
  uint64_t tail = h->tail.load(std::memory_order_relaxed);
  if (tail >= h->head.load(std::memory_order_acquire)) return 0;
  uint64_t slot = tail % h->n_slots;
  std::memcpy(out, base + slot * h->slot_bytes,
              bytes < h->slot_bytes ? bytes : h->slot_bytes);
  if (!h->tail.compare_exchange_strong(tail, tail + 1,
                                       std::memory_order_acq_rel)) {
    return 0;  // producer overwrote us; caller retries
  }
  return 1;
}

uint64_t at_ring_size(const void* mem) {
  const RingHeader* h = (const RingHeader*)mem;
  return h->head.load(std::memory_order_acquire) -
         h->tail.load(std::memory_order_acquire);
}

}  // extern "C"
