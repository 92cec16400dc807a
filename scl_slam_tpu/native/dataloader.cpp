// Native data loader: threaded KITTI .bin scan reader with prefetch.
//
// The reference's data path is rosbag replay feeding sensor callbacks
// (launch/test_distributed_loop.launch) — a C++ process decoding and
// queueing scans off the critical path. This is the TPU-native equivalent:
// a worker pool reads velodyne .bin files (float32 x,y,z,reflectance),
// pads/truncates into fixed-capacity host buffers (the static-shape
// contract of the device pipeline), and hands them over through a bounded
// ring buffer so disk I/O and host->device transfer overlap with compute.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Scan {
  int64_t index = -1;
  int32_t n_points = 0;  // valid points (<= capacity)
  std::vector<float> xyz; // [capacity * 3], padded with pad_value
};

struct Loader {
  std::vector<std::string> paths;
  int capacity;
  float pad_value;
  int n_workers;

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  // min-heap by index so scans pop in order
  struct Cmp {
    bool operator()(const Scan* a, const Scan* b) const {
      return a->index > b->index;
    }
  };
  std::priority_queue<Scan*, std::vector<Scan*>, Cmp> ready;
  int64_t next_to_read = 0;   // next file index to claim
  int64_t next_to_pop = 0;    // next index the consumer expects
  size_t max_queue;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  ~Loader() {
    stop.store(true);
    cv_space.notify_all();
    for (auto& t : workers) if (t.joinable()) t.join();
    std::lock_guard<std::mutex> lk(mu);
    while (!ready.empty()) { delete ready.top(); ready.pop(); }
  }
};

void worker_main(Loader* L) {
  for (;;) {
    int64_t idx;
    {
      std::lock_guard<std::mutex> lk(L->mu);
      if (L->stop.load() || L->next_to_read >= (int64_t)L->paths.size()) return;
      idx = L->next_to_read++;
    }
    auto* scan = new Scan();
    scan->index = idx;
    scan->xyz.assign((size_t)L->capacity * 3, L->pad_value);

    FILE* f = fopen(L->paths[idx].c_str(), "rb");
    if (f) {
      // velodyne .bin: interleaved float32 x,y,z,r
      std::vector<float> buf(4096 * 4);
      int32_t count = 0;
      size_t got;
      while ((got = fread(buf.data(), sizeof(float), buf.size(), f)) > 0) {
        size_t pts = got / 4;
        for (size_t p = 0; p < pts && count < L->capacity; ++p, ++count) {
          scan->xyz[(size_t)count * 3 + 0] = buf[p * 4 + 0];
          scan->xyz[(size_t)count * 3 + 1] = buf[p * 4 + 1];
          scan->xyz[(size_t)count * 3 + 2] = buf[p * 4 + 2];
        }
        if (count >= L->capacity) break;
      }
      fclose(f);
      scan->n_points = count;
    } else {
      scan->n_points = -1;  // signal read error
    }

    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_space.wait(lk, [&] {
      return L->stop.load() || L->ready.size() < L->max_queue;
    });
    if (L->stop.load()) { delete scan; return; }
    L->ready.push(scan);
    L->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n_paths, int capacity,
                    float pad_value, int n_workers, int queue_depth) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->capacity = capacity;
  L->pad_value = pad_value;
  L->n_workers = n_workers > 0 ? n_workers : 2;
  L->max_queue = queue_depth > 0 ? (size_t)queue_depth : 4;
  for (int i = 0; i < L->n_workers; ++i)
    L->workers.emplace_back(worker_main, L);
  return L;
}

// Blocking in-order pop. Returns valid point count, -1 on read error,
// -2 when the sequence is exhausted. out_xyz must hold capacity*3 floats.
int loader_next(void* handle, float* out_xyz) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_pop >= (int64_t)L->paths.size()) return -2;
  L->cv_ready.wait(lk, [&] {
    return !L->ready.empty() && L->ready.top()->index == L->next_to_pop;
  });
  Scan* s = L->ready.top();
  L->ready.pop();
  L->next_to_pop++;
  L->cv_space.notify_all();
  lk.unlock();
  std::memcpy(out_xyz, s->xyz.data(), s->xyz.size() * sizeof(float));
  int n = s->n_points;
  delete s;
  return n;
}

int loader_capacity(void* handle) {
  return static_cast<Loader*>(handle)->capacity;
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
