// gs2pc native PLY codec — C++ counterpart of gs2pc/io/ply.py.
//
// The reference ships a CUDA/C++ extension for its GPU hot path; gs2pc's
// device hot path is Pallas/XLA, so the native layer instead accelerates
// the host-side I/O tail: interleaving float positions/normals with uint8
// colours into PLY vertex records and streaming them to disk with a
// dedicated writer thread (overlapping pack and write).  Layout is
// byte-identical to the python writer (and the reference's
// save_xyz_to_ply, gauss_dataloader.py:118-202).
//
// Exposed via a C ABI for ctypes; no pybind11 dependency.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Chunk {
  std::vector<char> data;
};

class StreamWriter {
 public:
  explicit StreamWriter(FILE* f) : f_(f), done_(false), error_(false) {
    worker_ = std::thread([this] { this->Run(); });
  }

  ~StreamWriter() { Finish(); }

  void Push(std::vector<char>&& data) {
    std::unique_lock<std::mutex> lock(mu_);
    // Bound the queue so we never hold more than ~4 chunks in flight.
    cv_space_.wait(lock, [this] { return queue_.size() < 4 || error_; });
    queue_.push_back(Chunk{std::move(data)});
    cv_data_.notify_one();
  }

  bool Finish() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      if (done_) return !error_;
      done_ = true;
      cv_data_.notify_one();
    }
    worker_.join();
    return !error_;
  }

 private:
  void Run() {
    for (;;) {
      Chunk chunk;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_data_.wait(lock, [this] { return !queue_.empty() || done_; });
        if (queue_.empty() && done_) return;
        chunk = std::move(queue_.front());
        queue_.erase(queue_.begin());
        cv_space_.notify_one();
      }
      if (!error_ &&
          fwrite(chunk.data.data(), 1, chunk.data.size(), f_) !=
              chunk.data.size()) {
        error_ = true;
      }
    }
  }

  FILE* f_;
  std::vector<Chunk> queue_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::thread worker_;
  bool done_;
  std::atomic<bool> error_;
};

void pack_records(const float* xyz, const float* normals, const uint8_t* rgb,
                  int64_t lo, int64_t hi, char* out, size_t stride) {
  for (int64_t i = lo; i < hi; ++i) {
    char* rec = out + (i - lo) * stride;
    std::memcpy(rec, xyz + 3 * i, 12);
    size_t off = 12;
    if (normals != nullptr) {
      std::memcpy(rec + off, normals + 3 * i, 12);
      off += 12;
    }
    std::memcpy(rec + off, rgb + 3 * i, 3);
  }
}

}  // namespace

extern "C" {

// Returns 0 on success, negative error codes otherwise.
int gs2pc_write_ply(const char* path, int64_t n, const float* xyz,
                    const float* normals /* nullable */, const uint8_t* rgb,
                    int64_t chunk_size) {
  if (n < 0 || xyz == nullptr || rgb == nullptr) return -1;
  FILE* f = fopen(path, "wb");
  if (f == nullptr) return -2;

  char header[512];
  int hlen;
  if (normals != nullptr) {
    hlen = snprintf(header, sizeof(header),
                    "ply\nformat binary_little_endian 1.0\n"
                    "element vertex %lld\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "property float nx\nproperty float ny\nproperty float nz\n"
                    "property uchar red\nproperty uchar green\nproperty uchar "
                    "blue\nend_header\n",
                    static_cast<long long>(n));
  } else {
    hlen = snprintf(header, sizeof(header),
                    "ply\nformat binary_little_endian 1.0\n"
                    "element vertex %lld\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "property uchar red\nproperty uchar green\nproperty uchar "
                    "blue\nend_header\n",
                    static_cast<long long>(n));
  }
  if (fwrite(header, 1, hlen, f) != static_cast<size_t>(hlen)) {
    fclose(f);
    return -3;
  }

  const size_t stride = (normals != nullptr) ? 27 : 15;
  if (chunk_size <= 0) chunk_size = 1 << 20;

  bool ok = true;
  {
    StreamWriter writer(f);
    const unsigned hw = std::thread::hardware_concurrency();
    const int64_t n_pack_threads = hw > 2 ? hw - 1 : 1;
    for (int64_t lo = 0; lo < n && ok; lo += chunk_size) {
      const int64_t hi = lo + chunk_size < n ? lo + chunk_size : n;
      std::vector<char> buf(static_cast<size_t>(hi - lo) * stride);
      // Parallel pack of one chunk.
      const int64_t rows = hi - lo;
      const int64_t per = (rows + n_pack_threads - 1) / n_pack_threads;
      std::vector<std::thread> packers;
      for (int64_t t = 0; t < n_pack_threads; ++t) {
        const int64_t a = lo + t * per;
        const int64_t b = (a + per < hi) ? a + per : hi;
        if (a >= b) break;
        packers.emplace_back([&, a, b, lo] {
          pack_records(xyz, normals, rgb, a, b,
                       buf.data() + (a - lo) * stride, stride);
        });
      }
      for (auto& th : packers) th.join();
      writer.Push(std::move(buf));
    }
    ok = writer.Finish() && ok;
  }
  fclose(f);
  return ok ? 0 : -4;
}

// Fast body parse of a homogeneous little-endian float32 vertex block:
// de-interleaves `n` records of `n_props` floats into column arrays.
int gs2pc_deinterleave_f32(const char* body, int64_t n, int32_t n_props,
                           float* out /* n_props * n, column-major */) {
  if (body == nullptr || out == nullptr || n < 0 || n_props <= 0) return -1;
  const float* src = reinterpret_cast<const float*>(body);
  const unsigned hw = std::thread::hardware_concurrency();
  const int64_t n_threads = hw > 1 ? hw : 1;
  const int64_t per = (n + n_threads - 1) / n_threads;
  std::vector<std::thread> ts;
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t a = t * per;
    const int64_t b = (a + per < n) ? a + per : n;
    if (a >= b) break;
    ts.emplace_back([=] {
      for (int64_t i = a; i < b; ++i) {
        for (int32_t p = 0; p < n_props; ++p) {
          out[static_cast<int64_t>(p) * n + i] = src[i * n_props + p];
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return 0;
}

}  // extern "C"
