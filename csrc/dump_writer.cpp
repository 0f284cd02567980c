// Fast ASCII capture-dump serialization.
//
// The reference's per-rho dumps are 2M+ lines of "x y z" text written one
// ostream insertion at a time (VKT/ray_tracing__before/hello_vulkan.cpp:
// 1150-1259) — the dominant host-side cost of a save frame (SURVEY.md §3.5).
// This native writer formats with the same "%.6g"-equivalent (C++ default
// operator<< precision) into a large buffer and writes in 8 MB chunks.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

namespace {

// %.6g formatting of one float into buf; returns chars written.
inline int format_g6(float v, char* buf) {
  return std::snprintf(buf, 32, "%.6g", static_cast<double>(v));
}

}  // namespace

extern "C" {

// Write n_rows lines of "x y z\n" from a row-major (n_rows, 3) float array.
// Returns 0 on success, nonzero errno-style code on failure.
int trt_write_xyz(const char* path, const float* data, long n_rows) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return 1;

  const size_t kBuf = 8u << 20;
  char* buf = static_cast<char*>(std::malloc(kBuf));
  if (!buf) {
    std::fclose(f);
    return 2;
  }
  size_t used = 0;
  for (long i = 0; i < n_rows; ++i) {
    if (used + 128 > kBuf) {
      if (std::fwrite(buf, 1, used, f) != used) {
        std::free(buf);
        std::fclose(f);
        return 3;
      }
      used = 0;
    }
    const float* row = data + 3 * i;
    used += format_g6(row[0], buf + used);
    buf[used++] = ' ';
    used += format_g6(row[1], buf + used);
    buf[used++] = ' ';
    used += format_g6(row[2], buf + used);
    buf[used++] = '\n';
  }
  int rc = 0;
  if (used && std::fwrite(buf, 1, used, f) != used) rc = 3;
  std::free(buf);
  if (std::fclose(f) != 0) rc = rc ? rc : 4;
  return rc;
}

// Parse a whitespace-separated xyz text file into out (capacity cap_rows*3).
// Lines with parse failures or non-finite values become `lowest` sentinels
// (loadPoints semantics, before_second/hello_vulkan.cpp:542-549).
// Returns number of rows parsed, or -1 on IO error.
long trt_read_xyz(const char* path, float* out, long cap_rows, float lowest) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  long n = 0;
  while (n < cap_rows && std::fgets(line, sizeof(line), f)) {
    float x, y, z;
    int got = std::sscanf(line, "%f %f %f", &x, &y, &z);
    if (got != 3 || !std::isfinite(x) || !std::isfinite(y) ||
        !std::isfinite(z)) {
      x = y = z = lowest;
    }
    out[3 * n] = x;
    out[3 * n + 1] = y;
    out[3 * n + 2] = z;
    ++n;
  }
  std::fclose(f);
  return n;
}

}  // extern "C"
