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
// One whitespace token from *p (never crossing the newline). Returns:
// 0 = no token on this line; 1 = parsed (reference std::stof prefix
// semantics; a token containing "-nan" yields `lowest`, matching
// loadPoints, before_second/hello_vulkan.cpp:543-553); 2 = unparseable
// token (std::stof would throw and crash the reference; we store
// `lowest` for that component instead — the one deliberate deviation).
static int parse_tok(const char** p, float lowest, float* v) {
  const char* s = *p;
  while (*s == ' ' || *s == '\t' || *s == '\r') ++s;
  if (*s == '\0' || *s == '\n') { *p = s; return 0; }
  const char* e = s;
  while (*e && *e != ' ' && *e != '\t' && *e != '\r' && *e != '\n') ++e;
  *p = e;
  for (const char* q = s; q + 4 <= e; ++q) {
    if (q[0] == '-' && q[1] == 'n' && q[2] == 'a' && q[3] == 'n') {
      *v = lowest;
      return 1;
    }
  }
  char* endp = nullptr;
  float val = std::strtof(s, &endp);
  if (endp == s) { *v = lowest; return 2; }
  *v = val;
  return 1;
}

long trt_read_xyz(const char* path, float* out, long cap_rows, float lowest) {
  // Replicates loadPoints (before_second/hello_vulkan.cpp:532-560):
  // getline per row (no line-length cap: long lines parse from their
  // first 512 bytes, then the remainder is consumed, keeping the row
  // count = newline count); per-line `iss >> x >> y >> z` (< 3 tokens ->
  // whole row = lowest); per-token "-nan" -> lowest, else stof prefix
  // parse (keeps inf/+nan like the reference).
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  long n = 0;
  while (n < cap_rows && std::fgets(line, sizeof(line), f)) {
    float v[3];
    const char* p = line;
    int toks = 0;
    for (int c = 0; c < 3; ++c) {
      if (parse_tok(&p, lowest, &v[c]) == 0) break;
      ++toks;
    }
    if (toks != 3) v[0] = v[1] = v[2] = lowest;
    out[3 * n] = v[0];
    out[3 * n + 1] = v[1];
    out[3 * n + 2] = v[2];
    ++n;
    // consume the rest of an over-long line so one row = one newline
    if (!std::strchr(line, '\n')) {
      int ch;
      while ((ch = std::fgetc(f)) != EOF && ch != '\n') {}
    }
  }
  std::fclose(f);
  return n;
}

}  // extern "C"
