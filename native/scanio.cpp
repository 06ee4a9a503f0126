// Native scan IO: multithreaded point-cloud loading + fixed-size sampling.
//
// The reference feeds its trainers through torch DataLoader worker processes
// (slam/training/trainer.py:557-574); the TPU build's input pipeline is this
// C++ loader instead: a thread pool reads raw scan files (KITTI .bin float4,
// NCLT packed uint16), applies the fixed-count sampling the training path
// needs (ref filter_pcd semantics: random subsample / pad-with-replacement),
// and writes straight into a caller-provided pinned buffer — no Python in
// the per-file loop, GIL released for the whole batch.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native  (produces libscanio.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

// xorshift RNG — deterministic per (seed, file index), cheap per thread
inline uint64_t xorshift(uint64_t& s) {
  s ^= s << 13;
  s ^= s >> 7;
  s ^= s << 17;
  return s;
}

// Read one KITTI-style .bin (N x 4 float32). Returns count or -1.
int64_t read_bin_file(const char* path, std::vector<float>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (bytes <= 0 || bytes % (4 * sizeof(float)) != 0) {
    std::fclose(f);
    return -1;
  }
  buf.resize(static_cast<size_t>(bytes) / sizeof(float));
  const size_t got = std::fread(buf.data(), sizeof(float), buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;
  return static_cast<int64_t>(buf.size() / 4);
}

// Sample `num_points` of `count` points (xyz from stride-4 records) into out.
// count >= num_points: random subsample without replacement (partial
// Fisher-Yates over an index array); count < num_points: keep all + random
// repeats (the reference's pad-with-replacement, kitti_odometry_dataset.py:165).
void sample_into(const float* pts, int64_t count, float* out, int64_t num_points,
                 uint64_t seed, int channels_in, int channels_out) {
  if (count <= 0) {
    std::memset(out, 0, sizeof(float) * num_points * channels_out);
    return;
  }
  uint64_t s = seed * 0x9E3779B97F4A7C15ULL + 0xD1B54A32D192ED03ULL;
  if (count >= num_points) {
    std::vector<int64_t> idx(count);
    for (int64_t i = 0; i < count; ++i) idx[i] = i;
    for (int64_t i = 0; i < num_points; ++i) {
      const int64_t j = i + static_cast<int64_t>(xorshift(s) % (count - i));
      std::swap(idx[i], idx[j]);
      const float* src = pts + idx[i] * channels_in;
      float* dst = out + i * channels_out;
      for (int c = 0; c < channels_out; ++c) dst[c] = src[c];
    }
  } else {
    for (int64_t i = 0; i < num_points; ++i) {
      const int64_t j = (i < count) ? i : static_cast<int64_t>(xorshift(s) % count);
      const float* src = pts + j * channels_in;
      float* dst = out + i * channels_out;
      for (int c = 0; c < channels_out; ++c) dst[c] = src[c];
    }
  }
}

}  // namespace

extern "C" {

// Load a batch of KITTI .bin scans in parallel.
//   paths:      array of n null-terminated path strings
//   out:        (n, num_points, channels_out) float32, caller-allocated
//   out_counts: (n,) int64 — raw point count per file, -1 on read error
//   channels_out: 3 (xyz) or 4 (xyz + reflectance)
// Returns the number of files read successfully.
int64_t scanio_load_bins(const char** paths, int64_t n, float* out,
                         int64_t num_points, int64_t* out_counts,
                         int64_t channels_out, uint64_t seed,
                         int64_t num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int64_t> next{0};
  std::atomic<int64_t> ok{0};
  auto worker = [&]() {
    std::vector<float> buf;
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      const int64_t count = read_bin_file(paths[i], buf);
      out_counts[i] = count;
      float* dst = out + i * num_points * channels_out;
      if (count < 0) {
        std::memset(dst, 0, sizeof(float) * num_points * channels_out);
        continue;
      }
      sample_into(buf.data(), count, dst, num_points, seed + i, 4,
                  static_cast<int>(channels_out));
      ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  const int64_t n_threads = std::min<int64_t>(num_threads, n);
  threads.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Decode NCLT packed velodyne_sync records (uint16 x4 per point) into xyz
// meters (v * 0.005 - 100, ref nclt_dataset.py:34-41), sampled to num_points.
int64_t scanio_load_nclt(const char** paths, int64_t n, float* out,
                         int64_t num_points, int64_t* out_counts,
                         uint64_t seed, int64_t num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  if (num_threads <= 0) num_threads = 4;
  std::atomic<int64_t> next{0};
  std::atomic<int64_t> ok{0};
  auto worker = [&]() {
    std::vector<uint16_t> raw;
    std::vector<float> pts;
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + i * num_points * 3;
      FILE* f = std::fopen(paths[i], "rb");
      if (!f) {
        out_counts[i] = -1;
        std::memset(dst, 0, sizeof(float) * num_points * 3);
        continue;
      }
      std::fseek(f, 0, SEEK_END);
      const long bytes = std::ftell(f);
      std::fseek(f, 0, SEEK_SET);
      raw.resize(bytes / sizeof(uint16_t));
      const size_t got = std::fread(raw.data(), sizeof(uint16_t), raw.size(), f);
      std::fclose(f);
      const int64_t count = static_cast<int64_t>(got / 4);
      out_counts[i] = count;
      pts.resize(count * 3);
      for (int64_t p = 0; p < count; ++p) {
        pts[p * 3 + 0] = raw[p * 4 + 0] * 0.005f - 100.0f;
        pts[p * 3 + 1] = raw[p * 4 + 1] * 0.005f - 100.0f;
        pts[p * 3 + 2] = raw[p * 4 + 2] * 0.005f - 100.0f;
      }
      sample_into(pts.data(), count, dst, num_points, seed + i, 3, 3);
      ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  const int64_t n_threads = std::min<int64_t>(num_threads, n);
  for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
