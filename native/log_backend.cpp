// Async log backend for srsran_tpu — the srslog role (reference
// lib/src/srslog/log_backend_impl.h:43-61 + backend_worker.cpp): frontends
// enqueue formatted entries without blocking on I/O; ONE dedicated native
// thread drains the queue into the file sink.  Bounded queue, entries are
// dropped (and counted) under pressure like the reference's non-blocking
// mode.  Plain C ABI consumed via ctypes (no pybind11 in this image).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>

namespace {

struct LogBackend {
  FILE* sink = nullptr;
  size_t capacity = 8192;
  std::deque<std::string> q;
  std::mutex m;
  std::condition_variable cv;
  std::thread worker;
  bool stopping = false;
  uint64_t dropped = 0;
  uint64_t written = 0;

  void run() {
    std::deque<std::string> batch;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(m);
        cv.wait(lk, [&] { return stopping || !q.empty(); });
        if (q.empty() && stopping) break;
        batch.swap(q);
      }
      for (const std::string& line : batch) {
        fwrite(line.data(), 1, line.size(), sink);
        written++;
      }
      batch.clear();
      fflush(sink);
    }
    fflush(sink);
  }
};

}  // namespace

extern "C" {

void* slog_create(const char* path, size_t queue_capacity) {
  FILE* f = fopen(path, "a");
  if (!f) return nullptr;
  auto* b = new LogBackend();
  b->sink = f;
  if (queue_capacity) b->capacity = queue_capacity;
  b->worker = std::thread([b] { b->run(); });
  return b;
}

// Returns 1 if enqueued, 0 if dropped (queue full).
int slog_write(void* handle, const char* line, size_t len) {
  auto* b = static_cast<LogBackend*>(handle);
  {
    std::lock_guard<std::mutex> lk(b->m);
    if (b->q.size() >= b->capacity) {
      b->dropped++;
      return 0;
    }
    b->q.emplace_back(line, len);
  }
  b->cv.notify_one();
  return 1;
}

uint64_t slog_dropped(void* handle) {
  return static_cast<LogBackend*>(handle)->dropped;
}

uint64_t slog_written(void* handle) {
  return static_cast<LogBackend*>(handle)->written;
}

// Blocks until everything enqueued so far hits the sink.
void slog_flush(void* handle) {
  auto* b = static_cast<LogBackend*>(handle);
  for (;;) {
    {
      std::lock_guard<std::mutex> lk(b->m);
      if (b->q.empty()) break;
    }
    std::this_thread::sleep_for(std::chrono::milliseconds(1));
  }
}

void slog_destroy(void* handle) {
  auto* b = static_cast<LogBackend*>(handle);
  {
    std::lock_guard<std::mutex> lk(b->m);
    b->stopping = true;
  }
  b->cv.notify_one();
  b->worker.join();
  fclose(b->sink);
  delete b;
}

}  // extern "C"
