// Native background batch loader for fixed-block LM training data.
//
// TPU-native input-pipeline role (reference: the pure-Python
// `LanguageModeling` dataset + DataLoader in VyomAI/pretraining/
// collators.py:108-165): the host here has ONE CPU core, so batch
// assembly must overlap device steps. A producer thread packs shuffled
// fixed-length blocks from a caller-owned int32 token stream into a ring
// of pinned batch buffers; the consumer (Python, via ctypes) pops
// ready buffers without copies.
//
// Determinism contract (shared with the Python fallback in
// vyomai_tpu/training/native_data.py): block order per epoch is a
// Fisher-Yates shuffle driven by splitmix64 seeded with
// (seed ^ (epoch * 0x9E3779B97F4A7C15)). Both implementations produce
// bit-identical batch streams for the same (seed, batch, seq) — tested.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  // unbiased bounded draw (Lemire); bound > 0
  uint64_t bounded(uint64_t bound) {
    // 128-bit multiply trick
    __uint128_t m = (__uint128_t)next() * (__uint128_t)bound;
    return (uint64_t)(m >> 64);
  }
};

struct Loader {
  const int32_t* data;   // caller-owned, must outlive the loader
  int64_t n_tokens;
  int batch, seq, n_buffers;
  uint64_t seed;
  int64_t n_blocks, batches_per_epoch;

  std::vector<std::vector<int32_t>> ring;  // n_buffers x (batch*seq)
  std::vector<int64_t> ready;              // buffer index queue (fifo)
  size_t ready_head = 0;
  std::vector<int> free_bufs;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::thread producer;
  std::atomic<bool> stop{false};
  int consumer_holds = -1;  // buffer currently lent to the consumer

  Loader(const int32_t* d, int64_t n, int b, int s, uint64_t sd, int nb)
      : data(d), n_tokens(n), batch(b), seq(s),
        n_buffers(nb < 2 ? 2 : nb), seed(sd) {
    n_blocks = n_tokens / seq;
    batches_per_epoch = n_blocks / batch;
    ring.assign(n_buffers, std::vector<int32_t>((size_t)batch * seq));
    for (int i = 0; i < n_buffers; ++i) free_bufs.push_back(i);
    producer = std::thread([this] { produce(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> g(mu);
      stop = true;
    }
    cv_free.notify_all();
    cv_ready.notify_all();
    if (producer.joinable()) producer.join();
  }

  void produce() {
    std::vector<int64_t> order((size_t)n_blocks);
    for (uint64_t epoch = 0;; ++epoch) {
      for (int64_t i = 0; i < n_blocks; ++i) order[(size_t)i] = i;
      SplitMix64 rng(seed ^ (epoch * 0x9E3779B97F4A7C15ULL));
      for (int64_t i = n_blocks - 1; i > 0; --i) {
        uint64_t j = rng.bounded((uint64_t)i + 1);
        std::swap(order[(size_t)i], order[j]);
      }
      for (int64_t bi = 0; bi < batches_per_epoch; ++bi) {
        int buf;
        {
          std::unique_lock<std::mutex> lk(mu);
          cv_free.wait(lk, [this] { return stop || !free_bufs.empty(); });
          if (stop) return;
          buf = free_bufs.back();
          free_bufs.pop_back();
        }
        int32_t* dst = ring[(size_t)buf].data();
        for (int r = 0; r < batch; ++r) {
          int64_t blk = order[(size_t)(bi * batch + r)];
          std::memcpy(dst + (size_t)r * seq, data + blk * seq,
                      sizeof(int32_t) * (size_t)seq);
        }
        {
          std::lock_guard<std::mutex> g(mu);
          ready.push_back(buf);
        }
        cv_ready.notify_one();
      }
    }
  }

  // Returns a pointer to a [batch, seq] int32 buffer. The previously
  // returned buffer is recycled on this call (single-consumer contract).
  const int32_t* next() {
    std::unique_lock<std::mutex> lk(mu);
    if (consumer_holds >= 0) {
      free_bufs.push_back(consumer_holds);
      consumer_holds = -1;
      cv_free.notify_one();
    }
    cv_ready.wait(lk, [this] { return stop || ready_head < ready.size(); });
    if (stop) return nullptr;
    int buf = (int)ready[ready_head++];
    if (ready_head > 64) {  // compact the fifo
      ready.erase(ready.begin(), ready.begin() + (long)ready_head);
      ready_head = 0;
    }
    consumer_holds = buf;
    return ring[(size_t)buf].data();
  }
};

}  // namespace

extern "C" {

void* vyom_loader_create(const int32_t* data, int64_t n_tokens, int batch,
                         int seq, uint64_t seed, int n_buffers) {
  if (!data || n_tokens < seq || batch <= 0 || seq <= 0) return nullptr;
  Loader* l = new Loader(data, n_tokens, batch, seq, seed, n_buffers);
  if (l->batches_per_epoch == 0) {
    delete l;
    return nullptr;
  }
  return l;
}

int64_t vyom_loader_batches_per_epoch(void* h) {
  return h ? static_cast<Loader*>(h)->batches_per_epoch : 0;
}

const int32_t* vyom_loader_next(void* h) {
  return h ? static_cast<Loader*>(h)->next() : nullptr;
}

void vyom_loader_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
