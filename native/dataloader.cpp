// Native data-loader: multithreaded .npy batch prefetcher with a bounded
// ring buffer. TPU-native analog of the reference's torch DataLoader worker
// pool (dataset/utils + train_t2v.py:196-221): file IO, npy parsing and
// batch assembly run on C++ threads off the Python GIL, handing Python a
// ready float32/int32 batch pointer.
//
// C API (ctypes-friendly):
//   vlg_loader_create(paths, n_files, batch, capacity, threads) -> handle
//   vlg_loader_create_ex(..., flags, seed)  adds in-worker transforms
//   vlg_loader_next(handle, out_data, out_shape, out_ndim) -> sample count
//   vlg_loader_release(handle, batch_id)
//   vlg_loader_destroy(handle)
//
// Transform flags (vlg_loader_create_ex): the per-sample CPU work our image
// trainers would otherwise do in Python runs on the worker threads instead
// (the reference's DataLoader workers do decode+transform the same way;
// raw video/JPEG decode stays out of scope — the supported input is
// precomputed .npy tensors/latents, see native_loader.py docstring):
//   1 NORMALIZE_PM1: u1 pixels -> [-1, 1] floats (default u1 -> [0, 1])
//   2 RANDOM_HFLIP:  per-sample horizontal flip of rank-3 (H, W, C) samples,
//                    deterministic in (seed, sample index)
//
// Supports .npy v1/v2, little-endian f4/i4/u1, C-order.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <chrono>
#include <vector>

namespace {

struct NpyArray {
  std::vector<int64_t> shape;
  std::string dtype;  // "f4" | "i4" | "u1"
  std::vector<char> data;
};

bool parse_npy(const std::string& path, NpyArray* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[6];
  f.read(magic, 6);
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  unsigned char ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t header_len = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    header_len = h16;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
  }
  std::string header(header_len, '\0');
  f.read(&header[0], header_len);

  // descr
  auto dpos = header.find("'descr':");
  if (dpos == std::string::npos) return false;
  auto q1 = header.find('\'', dpos + 8);
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4" || descr == "|f4") out->dtype = "f4";
  else if (descr == "<i4") out->dtype = "i4";
  else if (descr == "|u1") out->dtype = "u1";
  else return false;  // unsupported dtype
  if (header.find("'fortran_order': True") != std::string::npos) return false;

  // shape
  auto spos = header.find("'shape':");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string dims = header.substr(p1 + 1, p2 - p1 - 1);
  out->shape.clear();
  int64_t cur = -1;
  for (char c : dims) {
    if (c >= '0' && c <= '9') {
      if (cur < 0) cur = 0;
      cur = cur * 10 + (c - '0');
    } else if (cur >= 0) {
      out->shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) out->shape.push_back(cur);

  int64_t elems = 1;
  for (auto s : out->shape) elems *= s;
  size_t esize = out->dtype == "u1" ? 1 : 4;
  out->data.resize(static_cast<size_t>(elems) * esize);
  f.read(out->data.data(), out->data.size());
  return f.good() || f.eof();
}

struct Batch {
  std::vector<float> data;          // converted to f32
  std::vector<int64_t> shape;       // (batch, ...)
  int64_t count = 0;
  int64_t id = 0;
};

constexpr int64_t kNormalizePm1 = 1;
constexpr int64_t kRandomHflip = 2;

// splitmix64: cheap deterministic per-sample hash for augmentation draws
inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

struct Loader {
  std::vector<std::string> paths;
  int64_t batch_size;
  size_t capacity;
  int64_t flags = 0;
  uint64_t seed = 0;
  std::atomic<int64_t> next_index{0};
  std::atomic<bool> stop{false};

  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::deque<Batch*> ready;
  std::vector<Batch*> in_flight;    // handed to Python, pending release
  int64_t next_batch_id = 0;
  std::vector<std::thread> workers;

  ~Loader() {
    stop.store(true);
    cv_produce.notify_all();
    cv_consume.notify_all();
    for (auto& t : workers) if (t.joinable()) t.join();
    for (auto* b : ready) delete b;
    for (auto* b : in_flight) delete b;
  }

  void worker() {
    while (!stop.load()) {
      int64_t start = next_index.fetch_add(batch_size);
      if (start >= static_cast<int64_t>(paths.size())) return;
      int64_t end = std::min<int64_t>(start + batch_size,
                                      static_cast<int64_t>(paths.size()));
      auto* batch = new Batch();
      bool first = true;
      int64_t per_item = 0;
      for (int64_t i = start; i < end; ++i) {
        NpyArray arr;
        if (!parse_npy(paths[static_cast<size_t>(i)], &arr)) continue;
        int64_t elems = 1;
        for (auto s : arr.shape) elems *= s;
        if (first) {
          per_item = elems;
          batch->shape.push_back(0);  // filled below
          for (auto s : arr.shape) batch->shape.push_back(s);
          first = false;
        }
        if (elems != per_item) continue;  // shape mismatch: skip sample
        size_t off = batch->data.size();
        batch->data.resize(off + static_cast<size_t>(elems));
        if (arr.dtype == "f4") {
          memcpy(batch->data.data() + off, arr.data.data(),
                 static_cast<size_t>(elems) * 4);
        } else if (arr.dtype == "i4") {
          const int32_t* src = reinterpret_cast<const int32_t*>(arr.data.data());
          for (int64_t k = 0; k < elems; ++k)
            batch->data[off + static_cast<size_t>(k)] = static_cast<float>(src[k]);
        } else {  // u1
          const uint8_t* src = reinterpret_cast<const uint8_t*>(arr.data.data());
          if (flags & kNormalizePm1) {
            for (int64_t k = 0; k < elems; ++k)
              batch->data[off + static_cast<size_t>(k)] =
                  src[k] / 127.5f - 1.0f;
          } else {
            for (int64_t k = 0; k < elems; ++k)
              batch->data[off + static_cast<size_t>(k)] = src[k] / 255.0f;
          }
        }
        if ((flags & kRandomHflip) && arr.shape.size() == 3 &&
            (mix64(seed ^ static_cast<uint64_t>(i)) & 1)) {
          // reverse the W axis of this (H, W, C) sample in place
          const int64_t h = arr.shape[0], w = arr.shape[1], c = arr.shape[2];
          float* s = batch->data.data() + off;
          for (int64_t y = 0; y < h; ++y)
            for (int64_t x = 0; x < w / 2; ++x)
              for (int64_t ch = 0; ch < c; ++ch)
                std::swap(s[(y * w + x) * c + ch],
                          s[(y * w + (w - 1 - x)) * c + ch]);
        }
        batch->count++;
      }
      if (!batch->shape.empty()) batch->shape[0] = batch->count;

      std::unique_lock<std::mutex> lk(mu);
      cv_produce.wait(lk, [&] { return ready.size() < capacity || stop.load(); });
      if (stop.load()) { delete batch; return; }
      batch->id = next_batch_id++;
      ready.push_back(batch);
      cv_consume.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* vlg_loader_create_ex(const char** paths, int64_t n_files,
                           int64_t batch_size, int64_t capacity,
                           int64_t n_threads, int64_t flags, int64_t seed) {
  auto* l = new Loader();
  l->paths.reserve(static_cast<size_t>(n_files));
  for (int64_t i = 0; i < n_files; ++i) l->paths.emplace_back(paths[i]);
  l->batch_size = batch_size;
  l->capacity = static_cast<size_t>(capacity);
  l->flags = flags;
  l->seed = static_cast<uint64_t>(seed);
  for (int64_t i = 0; i < n_threads; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

void* vlg_loader_create(const char** paths, int64_t n_files,
                        int64_t batch_size, int64_t capacity,
                        int64_t n_threads) {
  return vlg_loader_create_ex(paths, n_files, batch_size, capacity,
                              n_threads, 0, 0);
}

// Returns sample count (0 = exhausted). Fills *out_data with a pointer valid
// until vlg_loader_release(handle, *out_batch_id).
int64_t vlg_loader_next(void* handle, const float** out_data,
                        int64_t* out_shape, int64_t* out_ndim,
                        int64_t* out_batch_id) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  while (l->ready.empty() && !l->stop.load()) {
    bool exhausted =
        l->next_index.load() >= static_cast<int64_t>(l->paths.size());
    if (exhausted) {
      // workers may still be finishing their final batches; join them, then
      // either a batch appeared or the stream is truly done
      lk.unlock();
      for (auto& t : l->workers)
        if (t.joinable()) t.join();
      lk.lock();
      if (l->ready.empty()) return 0;
      break;
    }
    l->cv_consume.wait_for(lk, std::chrono::milliseconds(50));
  }
  if (l->ready.empty()) return 0;
  Batch* b = l->ready.front();
  l->ready.pop_front();
  l->cv_produce.notify_one();
  *out_data = b->data.data();
  *out_ndim = static_cast<int64_t>(b->shape.size());
  for (size_t i = 0; i < b->shape.size(); ++i) out_shape[i] = b->shape[i];
  *out_batch_id = b->id;
  l->in_flight.push_back(b);
  return b->count;
}

void vlg_loader_release(void* handle, int64_t batch_id) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  for (auto it = l->in_flight.begin(); it != l->in_flight.end(); ++it) {
    if ((*it)->id == batch_id) {
      delete *it;
      l->in_flight.erase(it);
      return;
    }
  }
}

void vlg_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
