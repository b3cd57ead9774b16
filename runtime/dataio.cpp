// Fast dataset I/O: ASCII depth parsing + a threaded file prefetcher.
//
// Native runtime components of mba_vo_tpu. The reference parses Unreal
// ASCII depth maps with an std::ifstream scalar loop (InputOutput.cpp:12-41);
// for 640x480 maps that is ~300k strtof calls on the tracking hot path, so
// this file provides (a) a tight single-pass parser and (b) a background
// prefetch thread pool that reads and parses upcoming files while the
// accelerator is busy — the data-loader role a production framework runs in
// native code. C ABI consumed via ctypes (runtime/bindings.py).

#include <atomic>
#include <cctype>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// Read an entire file into a string; returns false on failure.
bool read_file(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  const size_t got = std::fread(&(*out)[0], 1, static_cast<size_t>(size), f);
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

// Parse whitespace-separated floats; >100 clamps to 0 (the reference's far-
// plane rule, InputOutput.cpp:31-34). Returns number parsed.
int64_t parse_depth(const std::string& text, float* out, int64_t max_vals) {
  const char* p = text.c_str();
  const char* end = p + text.size();
  int64_t n = 0;
  while (p < end && n < max_vals) {
    while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (p >= end) break;
    char* next = nullptr;
    const float v = std::strtof(p, &next);
    if (next == p) break;
    out[n++] = v > 100.0f ? 0.0f : v;
    p = next;
  }
  return n;
}

struct PrefetchItem {
  std::string path;
  std::string raw;
  std::vector<float> depth;   // parsed when requested as depth
  bool parse_as_depth = false;
  bool ready = false;
  bool ok = false;
};

struct Prefetcher {
  std::map<std::string, PrefetchItem> items;
  std::deque<std::string> queue;
  std::mutex mu;
  std::condition_variable cv_work;
  std::condition_variable cv_done;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  explicit Prefetcher(int num_threads) {
    for (int i = 0; i < num_threads; ++i) {
      workers.emplace_back([this] { this->worker(); });
    }
  }

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto& w : workers) w.join();
  }

  void submit(const char* path, bool as_depth) {
    std::lock_guard<std::mutex> lk(mu);
    if (items.count(path)) return;
    PrefetchItem item;
    item.path = path;
    item.parse_as_depth = as_depth;
    items.emplace(path, std::move(item));
    queue.push_back(path);
    cv_work.notify_one();
  }

  void worker() {
    for (;;) {
      std::string path;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop) return;
        path = queue.front();
        queue.pop_front();
      }
      std::string raw;
      const bool ok = read_file(path.c_str(), &raw);
      std::vector<float> depth;
      bool as_depth = false;
      {
        std::lock_guard<std::mutex> lk(mu);
        auto it = items.find(path);
        if (it != items.end()) as_depth = it->second.parse_as_depth;
      }
      if (ok && as_depth) {
        depth.resize(raw.size() / 2 + 1);
        const int64_t n = parse_depth(raw, depth.data(),
                                      static_cast<int64_t>(depth.size()));
        depth.resize(static_cast<size_t>(n));
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        auto it = items.find(path);
        if (it != items.end()) {
          it->second.raw = std::move(raw);
          it->second.depth = std::move(depth);
          it->second.ready = true;
          it->second.ok = ok;
        }
      }
      cv_done.notify_all();
    }
  }

  // Blocks until the item is ready. Returns false if the read failed.
  bool fetch_depth(const char* path, float* out, int64_t max_vals,
                   int64_t* n_out) {
    std::unique_lock<std::mutex> lk(mu);
    auto it = items.find(path);
    if (it == items.end()) return false;
    cv_done.wait(lk, [&] { return it->second.ready; });
    if (!it->second.ok) return false;
    const auto& d = it->second.depth;
    const int64_t n = std::min<int64_t>(max_vals, d.size());
    std::memcpy(out, d.data(), sizeof(float) * static_cast<size_t>(n));
    *n_out = n;
    items.erase(it);
    return true;
  }
};

}  // namespace

extern "C" {

// One-shot fast ASCII depth parse. Returns number of floats written, or -1
// on read failure.
int64_t mbavo_parse_depth_file(const char* path, float* out, int64_t max_vals) {
  std::string text;
  if (!read_file(path, &text)) return -1;
  return parse_depth(text, out, max_vals);
}

void* mbavo_prefetcher_create(int32_t num_threads) {
  return new Prefetcher(num_threads > 0 ? num_threads : 2);
}

void mbavo_prefetcher_free(void* handle) {
  delete static_cast<Prefetcher*>(handle);
}

void mbavo_prefetcher_submit_depth(void* handle, const char* path) {
  static_cast<Prefetcher*>(handle)->submit(path, true);
}

// Blocks until ready; returns floats written or -1 on failure.
int64_t mbavo_prefetcher_fetch_depth(void* handle, const char* path,
                                     float* out, int64_t max_vals) {
  int64_t n = 0;
  if (!static_cast<Prefetcher*>(handle)->fetch_depth(path, out, max_vals, &n)) {
    return -1;
  }
  return n;
}

}  // extern "C"
