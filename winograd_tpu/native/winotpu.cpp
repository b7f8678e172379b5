// winotpu — native C++ host-runtime library for winograd_tpu.
//
// TPU-native rebuild of the reference's C host utility layer
// (/root/reference/util.c): binary float32 blob IO (get_parameter,
// util.c:28-44), host transpose (util.c:15-26), microsecond wall clock
// (util.c:5-13) and the shift-aware differential output checker
// (util.c:46-63). Differences are deliberate fixes, not omissions:
//   * IO returns byte/element counts and NEVER exit()s (the reference
//     exits the process on a missing file).
//   * The checker RETURNS the violation count and max error instead of
//     printing and returning nothing (the reference's checker is declared
//     float but has no return statement).
// Exposed with a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cmath>
#include <ctime>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// Microsecond wall clock (CLOCK_REALTIME, like util.c:5-13).
uint64_t wt_time_us() {
  struct timespec ts;
  clock_gettime(CLOCK_REALTIME, &ts);
  return (uint64_t)ts.tv_sec * 1000000ull + (uint64_t)ts.tv_nsec / 1000ull;
}

// Read up to n float32 values from a raw little-endian blob.
// Returns the number of elements read, or -1 on open failure.
long long wt_read_f32(const char* path, float* out, long long n) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long long got = (long long)std::fread(out, sizeof(float), (size_t)n, f);
  std::fclose(f);
  return got;
}

// Write n float32 values as a raw blob. Returns elements written or -1.
long long wt_write_f32(const char* path, const float* data, long long n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  long long put = (long long)std::fwrite(data, sizeof(float), (size_t)n, f);
  std::fclose(f);
  return put;
}

// out[j*h + i] = in[i*w + j]  (util.c:15-26, without the malloc).
void wt_transpose_f32(const float* in, float* out, long long h, long long w) {
  for (long long i = 0; i < h; ++i)
    for (long long j = 0; j < w; ++j)
      out[j * h + i] = in[i * w + j];
}

// Shift-aware elementwise differential check (util.c:46-63).
// A is (side_a, side_a, channels) with the valid region at +shift in both
// spatial dims; B is dense (len, len, channels). Counts violations and
// reports the max abs error. NaN diffs count as violations and poison
// max_error (the reference's `> tol` comparison would silently pass NaN).
// Returns the violation count.
long long wt_output_checker(const float* a, const float* b, long long len,
                            long long channels, long long shift,
                            long long side_a, double tol, double* max_error) {
  long long count = 0;
  double max_err = 0.0;
  bool saw_nan = false;
  for (long long x = 0; x < len; ++x) {
    for (long long y = 0; y < len; ++y) {
      for (long long c = 0; c < channels; ++c) {
        double va = a[((x + shift) * side_a + (y + shift)) * channels + c];
        double vb = b[(x * len + y) * channels + c];
        double diff = std::fabs(va - vb);
        if (std::isnan(diff)) { saw_nan = true; ++count; continue; }
        if (diff > max_err) max_err = diff;
        if (!(diff <= tol)) ++count;
      }
    }
  }
  if (max_error) *max_error = saw_nan ? std::nan("") : max_err;
  return count;
}

// Parallel blob loader: read n files concurrently on a small thread pool
// (the reference loads its blobs serially on the main thread,
// util.c:28-44 / Kernel128_winograd.cu:216-252; artifact sets here are
// 10+ files per case, so overlap the IO). outs[i] must hold counts[i]
// floats. Returns the number of files fully read.
long long wt_read_many_f32(const char** paths, float** outs,
                           const long long* counts, long long n,
                           long long threads) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::atomic<long long> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      long long i = next.fetch_add(1);
      if (i >= n) return;
      if (wt_read_f32(paths[i], outs[i], counts[i]) == counts[i]) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve((size_t)threads);
  for (long long t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
