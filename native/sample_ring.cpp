// Native sample transport for srsran_tpu.
//
// Re-design of the reference's hot host-side plumbing:
//  - lock-free SPSC ring buffer (lib/src/phy/utils/ringbuffer.c) for
//    complex64 I/Q samples between the ingest thread and the device feeder
//  - socket sample pump (the rf_zmq_imp.c fake-RF role): a native thread
//    receives UDP datagrams of raw cf32 and writes them into the ring
//    without holding the Python GIL.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

namespace {

struct Ring {
  float* data = nullptr;  // interleaved I/Q, 2 floats per sample
  size_t capacity = 0;    // in samples
  std::atomic<uint64_t> head{0};  // written samples (producer)
  std::atomic<uint64_t> tail{0};  // consumed samples (consumer)
  // UDP pump
  std::thread pump;
  std::atomic<bool> running{false};
  int sock = -1;
  std::atomic<uint64_t> dropped{0};
};

size_t ring_space(const Ring* r) {
  return r->capacity - (r->head.load(std::memory_order_acquire) -
                        r->tail.load(std::memory_order_acquire));
}

size_t ring_avail(const Ring* r) {
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

void copy_in(Ring* r, const float* src, size_t n) {
  uint64_t h = r->head.load(std::memory_order_relaxed);
  size_t pos = h % r->capacity;
  size_t first = std::min(n, r->capacity - pos);
  memcpy(r->data + 2 * pos, src, 2 * first * sizeof(float));
  if (n > first) memcpy(r->data, src + 2 * first, 2 * (n - first) * sizeof(float));
  r->head.store(h + n, std::memory_order_release);
}

void copy_out(Ring* r, float* dst, size_t n) {
  uint64_t t = r->tail.load(std::memory_order_relaxed);
  size_t pos = t % r->capacity;
  size_t first = std::min(n, r->capacity - pos);
  memcpy(dst, r->data + 2 * pos, 2 * first * sizeof(float));
  if (n > first) memcpy(dst + 2 * first, r->data, 2 * (n - first) * sizeof(float));
  r->tail.store(t + n, std::memory_order_release);
}

}  // namespace

extern "C" {

void* ring_create(size_t capacity_samples) {
  Ring* r = new Ring();
  r->data = new float[2 * capacity_samples];
  r->capacity = capacity_samples;
  return r;
}

void ring_destroy(void* h) {
  Ring* r = static_cast<Ring*>(h);
  if (r->running.load()) {
    r->running.store(false);
    shutdown(r->sock, SHUT_RDWR);
    close(r->sock);
    if (r->pump.joinable()) r->pump.join();
  }
  delete[] r->data;
  delete r;
}

size_t ring_readable(void* h) { return ring_avail(static_cast<Ring*>(h)); }
size_t ring_writable(void* h) { return ring_space(static_cast<Ring*>(h)); }
uint64_t ring_dropped(void* h) { return static_cast<Ring*>(h)->dropped.load(); }

// write n samples (2n floats); returns samples written (drops on overflow)
size_t ring_write(void* h, const float* src, size_t n) {
  Ring* r = static_cast<Ring*>(h);
  size_t can = std::min(n, ring_space(r));
  if (can) copy_in(r, src, can);
  if (can < n) r->dropped.fetch_add(n - can);
  return can;
}

// read up to n samples; returns samples read
size_t ring_read(void* h, float* dst, size_t n) {
  Ring* r = static_cast<Ring*>(h);
  size_t can = std::min(n, ring_avail(r));
  if (can) copy_out(r, dst, can);
  return can;
}

// blocking read: spin-waits until n samples available or timeout_us elapses.
size_t ring_read_blocking(void* h, float* dst, size_t n, uint64_t timeout_us) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t waited = 0;
  while (ring_avail(r) < n && waited < timeout_us) {
    usleep(100);
    waited += 100;
  }
  return ring_read(h, dst, std::min(n, ring_avail(r)));
}

// start a native UDP pump: raw cf32 datagrams on 127.0.0.1:port → ring
int udp_pump_start(void* h, int port) {
  Ring* r = static_cast<Ring*>(h);
  r->sock = socket(AF_INET, SOCK_DGRAM, 0);
  if (r->sock < 0) return -1;
  int one = 1;
  setsockopt(r->sock, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(r->sock, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    close(r->sock);
    return -2;
  }
  r->running.store(true);
  r->pump = std::thread([r]() {
    std::vector<float> buf(2 * 8192);
    while (r->running.load(std::memory_order_relaxed)) {
      ssize_t got = recv(r->sock, buf.data(), buf.size() * sizeof(float), 0);
      if (got <= 0) continue;
      ring_write(r, buf.data(), static_cast<size_t>(got) / (2 * sizeof(float)));
    }
  });
  return 0;
}

}  // extern "C"
