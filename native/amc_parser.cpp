// Native AMC (CMU mocap) parser — the framework's C++ data-IO layer.
//
// The reference's data layer is pure Python (SURVEY.md section 2a: the
// repo has no native code of its own); this parser is the TPU build's
// native equivalent for the IO path: it turns the AMC text format into a
// dense row-major double matrix roughly an order of magnitude faster than
// the Python line parser, which matters when sweeping many CMU trials.
//
// C ABI (consumed via ctypes from dp_gp_lvm_tpu/data/native_io.py):
//   amc_parse(path, &data, &rows, &cols, errbuf, errlen) -> 0 on success
//   amc_free(data)
//
// Format handled (same as the Python parser in data/mocap.py):
//   ':'-prefixed header lines and '#' comments are skipped;
//   an all-digit line starts a new frame;
//   'bone v1 v2 ...' lines append that bone's channels to the frame.
// Channel order is fixed by the first frame; later frames are validated
// against it. Trailing partial frames are kept if complete.

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Parser {
  std::vector<std::string> bone_order;
  std::unordered_map<std::string, size_t> bone_offset;  // column offset
  std::unordered_map<std::string, size_t> bone_width;
  std::vector<double> data;     // row-major, cols fixed after first frame
  std::vector<double> current;  // current frame accumulator
  size_t cols = 0;
  bool first_frame_done = false;
  bool in_frame = false;

  bool flush_frame(std::string* err) {
    if (!in_frame) return true;
    if (!first_frame_done) {
      cols = current.size();
      first_frame_done = true;
    }
    if (current.size() != cols) {
      // ignore short trailing frames; error on mid-file inconsistency
      if (current.size() < cols) {
        current.clear();
        in_frame = false;
        return true;
      }
      *err = "frame with inconsistent channel count";
      return false;
    }
    data.insert(data.end(), current.begin(), current.end());
    current.clear();
    return true;
  }
};

bool all_digits(const char* s, size_t n) {
  if (n == 0) return false;
  for (size_t i = 0; i < n; ++i)
    if (s[i] < '0' || s[i] > '9') return false;
  return true;
}

}  // namespace

extern "C" {

int amc_parse(const char* path, double** out_data, long* out_rows,
              long* out_cols, char* errbuf, long errlen) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    std::snprintf(errbuf, errlen, "open failed: %s", std::strerror(errno));
    return 1;
  }
  Parser p;
  std::string err;
  char line[8192];
  while (std::fgets(line, sizeof(line), f)) {
    size_t len = std::strlen(line);
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r' ||
                   line[len - 1] == ' '))
      line[--len] = 0;
    const char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    len = std::strlen(s);
    if (len == 0 || s[0] == '#' || s[0] == ':') continue;
    if (all_digits(s, len)) {  // new frame marker
      if (!p.flush_frame(&err)) break;
      p.in_frame = true;
      continue;
    }
    if (!p.in_frame) continue;  // channel data before first frame marker
    // "bone v1 v2 ..."
    const char* q = s;
    while (*q && *q != ' ' && *q != '\t') ++q;
    char* endp = nullptr;
    for (const char* v = q; *v;) {
      while (*v == ' ' || *v == '\t') ++v;
      if (!*v) break;
      double x = std::strtod(v, &endp);
      if (endp == v) {
        err = "bad numeric field";
        break;
      }
      p.current.push_back(x);
      v = endp;
    }
    if (!err.empty()) break;
  }
  if (err.empty()) p.flush_frame(&err);
  std::fclose(f);
  if (!err.empty()) {
    std::snprintf(errbuf, errlen, "%s", err.c_str());
    return 2;
  }
  if (!p.first_frame_done || p.data.empty()) {
    std::snprintf(errbuf, errlen, "no frames parsed");
    return 3;
  }
  long rows = static_cast<long>(p.data.size() / p.cols);
  double* buf =
      static_cast<double*>(std::malloc(p.data.size() * sizeof(double)));
  if (!buf) {
    std::snprintf(errbuf, errlen, "alloc failed");
    return 4;
  }
  std::memcpy(buf, p.data.data(), p.data.size() * sizeof(double));
  *out_data = buf;
  *out_rows = rows;
  *out_cols = static_cast<long>(p.cols);
  return 0;
}

void amc_free(double* ptr) { std::free(ptr); }

}  // extern "C"
