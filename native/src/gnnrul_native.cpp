// gnnrul_native — native data-pipeline runtime for the TPU framework.
//
// The reference repo's offline preprocessors (Data_Process/*.py) parse
// thousands of small whitespace/comma-separated text files (C-MAPSS txt
// tables, PHM2012/XJTU-SY per-snapshot CSVs) and slice stride-1 sliding
// windows in Python loops. This library is the native equivalent: a
// correctly-rounded float table parser, an OpenMP many-file reader, and a
// contiguous window extractor. Exposed over a plain C ABI for ctypes.
//
// Parsing contract: fields are parsed as IEEE double (strtod — correctly
// rounded, same as Python float()) then cast to float32, matching
// numpy.loadtxt semantics bit-for-bit. Separators: any run of spaces,
// tabs or commas. Blank lines and trailing separators are ignored.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <string>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Table {
  std::vector<double> data;  // full strtod precision; cast on copy-out
  int64_t rows = 0;
  int64_t cols = 0;
};

bool is_sep(char c) {
  return c == ' ' || c == '\t' || c == ',' || c == ';';
}
bool is_eol(char c) { return c == '\n' || c == '\r'; }

// Parse one whole file buffer into row-major float32. Column count is
// inferred from the first non-empty line; short/long rows fail the parse.
bool parse_buffer(const char* p, const char* end, Table* out) {
  out->data.clear();
  out->rows = 0;
  out->cols = 0;
  int64_t cur_cols = 0;
  while (p < end) {
    // Skip leading separators/newlines.
    while (p < end && (is_sep(*p) || is_eol(*p))) {
      if (is_eol(*p) && cur_cols > 0) {
        if (out->cols == 0) out->cols = cur_cols;
        if (cur_cols != out->cols) return false;
        out->rows++;
        cur_cols = 0;
      }
      ++p;
    }
    if (p >= end) break;
    char* next = nullptr;
    double v = strtod(p, &next);
    if (next == p) return false;  // not a number
    out->data.push_back(v);
    cur_cols++;
    p = next;
  }
  if (cur_cols > 0) {  // final line without trailing newline
    if (out->cols == 0) out->cols = cur_cols;
    if (cur_cols != out->cols) return false;
    out->rows++;
  }
  return out->rows * out->cols == static_cast<int64_t>(out->data.size());
}

// Advance past `n_lines` newline-terminated lines (CSV headers).
const char* skip_lines(const char* p, const char* end, int64_t n_lines) {
  while (n_lines > 0 && p < end) {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
    --n_lines;
  }
  return p;
}

bool read_file(const char* path, std::string* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) { fclose(f); return false; }
  buf->resize(static_cast<size_t>(size));
  size_t got = size ? fread(&(*buf)[0], 1, static_cast<size_t>(size), f) : 0;
  fclose(f);
  return got == static_cast<size_t>(size);
}

// Shared body for the stacked many-file parser (float32/float64 ABI
// entry points below).
template <typename T>
int64_t parse_tables_stacked_impl(const char** paths, int64_t n,
                                  int64_t skip_rows, int64_t rows,
                                  int64_t cols, T* out) {
  // Failure index is an atomic min so the early-stop read is race-free
  // and the reported file is deterministically the lowest failing index.
  std::atomic<int64_t> status{0};
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t i = 0; i < n; ++i) {
    // Early-stop only files ABOVE the recorded failure: every file below
    // it still gets checked, so the final status is the true minimum
    // failing index regardless of thread interleaving.
    int64_t s = status.load(std::memory_order_relaxed);
    if (s != 0 && s <= i) continue;
    std::string buf;
    Table t;
    bool ok = read_file(paths[i], &buf);
    if (ok) {
      const char* begin = skip_lines(buf.data(), buf.data() + buf.size(),
                                     skip_rows);
      ok = parse_buffer(begin, buf.data() + buf.size(), &t) &&
           t.rows == rows && t.cols == cols;
    }
    if (!ok) {
      int64_t prev = status.load(std::memory_order_relaxed);
      while ((prev == 0 || i + 1 < prev) &&
             !status.compare_exchange_weak(prev, i + 1)) {
      }
      continue;
    }
    T* dst = out + i * rows * cols;
    for (int64_t j = 0; j < rows * cols; ++j)
      dst[j] = static_cast<T>(t.data[j]);
  }
  return status.load();
}

}  // namespace

extern "C" {

// Parse one text table. On success returns a malloc'd row-major float32
// buffer (caller frees with gnnrul_free) and sets *rows/*cols; returns
// nullptr on any IO/parse error.
float* gnnrul_parse_table(const char* path, int64_t* rows, int64_t* cols) {
  std::string buf;
  if (!read_file(path, &buf)) return nullptr;
  Table t;
  if (!parse_buffer(buf.data(), buf.data() + buf.size(), &t)) return nullptr;
  float* out = static_cast<float*>(malloc(t.data.size() * sizeof(float)));
  if (!out) return nullptr;
  for (size_t i = 0; i < t.data.size(); ++i)
    out[i] = static_cast<float>(t.data[i]);
  *rows = t.rows;
  *cols = t.cols;
  return out;
}

void gnnrul_free(float* p) { free(p); }

// Parse `n` equally-shaped tables in parallel (OpenMP) into one
// preallocated (n, rows, cols) block. `skip_rows` drops leading lines
// (CSV headers). Returns 0 on success, the 1-based index of the first
// failing file otherwise (shape mismatch or parse error). Two dtype
// variants: float32 (np.loadtxt-equivalent two-step rounding) and
// float64 (pandas/Python-float-equivalent, for pipelines that normalize
// in double before the final float32 cast).
int64_t gnnrul_parse_tables_stacked(const char** paths, int64_t n,
                                    int64_t skip_rows, int64_t rows,
                                    int64_t cols, float* out) {
  return parse_tables_stacked_impl(paths, n, skip_rows, rows, cols, out);
}

int64_t gnnrul_parse_tables_stacked_f64(const char** paths, int64_t n,
                                        int64_t skip_rows, int64_t rows,
                                        int64_t cols, double* out) {
  return parse_tables_stacked_impl(paths, n, skip_rows, rows, cols, out);
}

// Extract stride-`stride` sliding windows of length `win` from a
// row-major (n, d) array into a preallocated (num_windows, win, d) block,
// where num_windows = (n - win) / stride + 1. Returns num_windows, or -1
// if n < win.
int64_t gnnrul_sliding_windows(const float* data, int64_t n, int64_t d,
                               int64_t win, int64_t stride, float* out) {
  if (n < win || win <= 0 || stride <= 0) return -1;
  int64_t num = (n - win) / stride + 1;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t w = 0; w < num; ++w) {
    memcpy(out + w * win * d, data + w * stride * d,
           win * d * sizeof(float));
  }
  return num;
}

// Windowed gather used by the CMAPSS/N-CMAPSS preprocessors: for each of
// `n_series` contiguous series (lengths in `lens`, concatenated in `data`
// of feature dim d), emit all stride-1 windows of length `win` plus the
// label at each window's final row (labels concatenated like data).
// Series shorter than `win` are skipped (reference behavior,
// Data_read_CMAPSS.py train path). Outputs must be preallocated to
// sum(max(0, len_i - win + 1)) windows. Returns total windows written.
int64_t gnnrul_window_series(const float* data, const float* labels,
                             const int64_t* lens, int64_t n_series,
                             int64_t d, int64_t win, float* out_x,
                             float* out_y) {
  // Prefix offsets so series can be processed independently.
  std::vector<int64_t> row_off(n_series + 1, 0), win_off(n_series + 1, 0);
  for (int64_t s = 0; s < n_series; ++s) {
    row_off[s + 1] = row_off[s] + lens[s];
    int64_t nw = lens[s] >= win ? lens[s] - win + 1 : 0;
    win_off[s + 1] = win_off[s] + nw;
  }
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t s = 0; s < n_series; ++s) {
    const float* src = data + row_off[s] * d;
    const float* lab = labels + row_off[s];
    int64_t nw = win_off[s + 1] - win_off[s];
    for (int64_t w = 0; w < nw; ++w) {
      memcpy(out_x + (win_off[s] + w) * win * d, src + w * d,
             win * d * sizeof(float));
      out_y[win_off[s] + w] = lab[w + win - 1];
    }
  }
  return win_off[n_series];
}

int gnnrul_abi_version() { return 1; }

}  // extern "C"
