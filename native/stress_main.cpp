// Concurrency stress driver for the native runtime pieces — built plain
// and under ThreadSanitizer (the reference gates ASAN/MSAN via CMake,
// CMakeLists.txt:84-87; thread discipline here is *verified*, not assumed).
//
//   g++ -std=c++17 -O1 [-fsanitize=thread] -o stress stress_main.cpp
//       sample_ring.cpp log_backend.cpp -lpthread
//
// Exercises:
//  1. SPSC ring: producer/consumer with randomized chunk sizes at full
//     throttle; every delivered sample's payload must be its global
//     sequence number (ordering + no tearing), no drops when the
//     producer respects ring_writable.
//  2. Overflow accounting: unthrottled producer; delivered + dropped must
//     equal produced.
//  3. Log backend MPSC: 4 producers x 20k tagged lines; per-thread FIFO
//     order and line integrity in the sink file.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* ring_create(size_t);
void ring_destroy(void*);
size_t ring_readable(void*);
size_t ring_writable(void*);
uint64_t ring_dropped(void*);
size_t ring_write(void*, const float*, size_t);
size_t ring_read(void*, float*, size_t);
void* slog_create(const char*, size_t);
int slog_write(void*, const char*, size_t);
uint64_t slog_dropped(void*);
void slog_flush(void*);
void slog_destroy(void*);
}

static int failures = 0;
#define CHECK(cond, msg)                                          \
  do {                                                            \
    if (!(cond)) {                                                \
      std::fprintf(stderr, "FAIL: %s (%s:%d)\n", msg, __FILE__, __LINE__); \
      failures++;                                                 \
    }                                                             \
  } while (0)

static void ring_ordered_stress() {
  const size_t cap = 4096;
  const uint64_t total = 2'000'000;
  void* r = ring_create(cap);

  std::thread producer([&] {
    std::mt19937 rng(1);
    std::vector<float> buf(2 * 512);
    uint64_t seq = 0;
    while (seq < total) {
      size_t want = 1 + rng() % 512;
      if (want > total - seq) want = total - seq;
      while (ring_writable(r) < want) std::this_thread::yield();
      for (size_t i = 0; i < want; i++) {
        buf[2 * i] = static_cast<float>((seq + i) & 0xFFFFFF);
        buf[2 * i + 1] = static_cast<float>((seq + i) >> 24);
      }
      size_t wrote = ring_write(r, buf.data(), want);
      if (wrote != want) {
        CHECK(false, "throttled write dropped");
        return;
      }
      seq += want;
    }
  });

  std::mt19937 rng(2);
  std::vector<float> buf(2 * 768);
  uint64_t seq = 0;
  while (seq < total) {
    size_t got = ring_read(r, buf.data(), 1 + rng() % 768);
    for (size_t i = 0; i < got; i++) {
      uint64_t v = static_cast<uint64_t>(buf[2 * i]) |
                   (static_cast<uint64_t>(buf[2 * i + 1]) << 24);
      if (v != ((seq + i) & 0xFFFFFFFFFFFF)) {
        CHECK(false, "sample out of sequence or torn");
        producer.join();
        ring_destroy(r);
        return;
      }
    }
    seq += got;
    if (!got) std::this_thread::yield();
  }
  producer.join();
  CHECK(ring_dropped(r) == 0, "unexpected drops in throttled phase");
  ring_destroy(r);
  std::fprintf(stderr, "ring ordered stress: %llu samples OK\n",
               (unsigned long long)total);
}

static void ring_overflow_stress() {
  const size_t cap = 1024;
  const uint64_t total = 500'000;
  void* r = ring_create(cap);
  std::atomic<uint64_t> delivered{0};

  std::thread consumer([&] {
    std::vector<float> buf(2 * 333);
    while (delivered.load(std::memory_order_relaxed) + ring_dropped(r) <
           total) {
      delivered.fetch_add(ring_read(r, buf.data(), 333));
    }
  });

  std::vector<float> buf(2 * 100, 1.0f);
  for (uint64_t s = 0; s < total; s += 100) {
    ring_write(r, buf.data(), 100);
  }
  // drain: let the consumer observe the final accounting
  while (delivered.load() + ring_dropped(r) < total) std::this_thread::yield();
  consumer.join();
  const uint64_t dropped = ring_dropped(r);
  CHECK(delivered.load() + dropped == total, "delivered + dropped != produced");
  ring_destroy(r);
  std::fprintf(stderr, "ring overflow stress: %llu delivered, %llu dropped\n",
               (unsigned long long)delivered.load(),
               (unsigned long long)dropped);
}

static void log_mpsc_stress(const char* path) {
  const int nthreads = 4, per = 20000;
  std::remove(path);
  void* lg = slog_create(path, 1 << 20);
  CHECK(lg != nullptr, "slog_create failed");
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; t++) {
    ts.emplace_back([&, t] {
      char line[64];
      for (int i = 0; i < per; i++) {
        int n = std::snprintf(line, sizeof(line), "t%d:%d\n", t, i);
        while (!slog_write(lg, line, static_cast<size_t>(n)))
          std::this_thread::yield();
      }
    });
  }
  for (auto& t : ts) t.join();
  slog_flush(lg);
  slog_destroy(lg);

  // verify: per-thread FIFO, intact lines, complete
  FILE* f = fopen(path, "r");
  CHECK(f != nullptr, "sink file missing");
  std::vector<int> next(nthreads, 0);
  char line[128];
  int total = 0;
  while (f && std::fgets(line, sizeof(line), f)) {
    int t = -1, i = -1;
    if (std::sscanf(line, "t%d:%d", &t, &i) != 2 || t < 0 || t >= nthreads) {
      CHECK(false, "corrupt line in sink");
      break;
    }
    if (i != next[t]) {
      CHECK(false, "per-thread FIFO order violated");
      break;
    }
    next[t]++;
    total++;
  }
  if (f) fclose(f);
  CHECK(total == nthreads * per, "missing lines in sink");
  std::remove(path);
  std::fprintf(stderr, "log MPSC stress: %d lines OK\n", total);
}

int main(int argc, char** argv) {
  const char* log_path = argc > 1 ? argv[1] : "/tmp/srsran_tpu_stress.log";
  ring_ordered_stress();
  ring_overflow_stress();
  log_mpsc_stress(log_path);
  if (failures) {
    std::fprintf(stderr, "%d FAILURES\n", failures);
    return 1;
  }
  std::fprintf(stderr, "all native stress checks passed\n");
  return 0;
}
