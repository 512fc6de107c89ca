// fastload: native data-plane for the SENDv1 loader.
//
// The reference's startup hot spot is host-side: pandas CSV/TSV/SSV parsing
// and pure-Python wall-clock windowing (reference MFT/datasets.py:80-120,
// MFT/train.py:371-454; SURVEY.md §3 hot loop 5).  This library provides the
// TPU-native framework's equivalent of that layer as C++: a single-pass
// numeric table parser and the windowing kernel, exposed through a plain C ABI
// consumed via ctypes (multimodal_transformer_tpu/data/native_loader.py).
//
// Design notes:
//  * parse_table: one pass over the file; the header row is scanned for
//    column labels so the caller can apply the reference's label-slice
//    semantics (e.g. 'glove0':'glove299'); cells parse with strtof; non-
//    numeric cells (reference: NaN) become NaN for the scrub stage.
//  * window_counts/window_assign: reproduces the reference windowing loop
//    semantics exactly (timestamp <= current+size grouping, empty windows,
//    trailing-partial drop) but in O(T) native code.
//  * No global state; all buffers are caller-owned or malloc'd and released
//    with fastload_free.
//
// Build: make -C native  (produces libfastload.so)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- utilities

void fastload_free(void* p) { free(p); }

// Parse a delimited numeric table.
//   path:       file to read
//   delim:      ',' | '\t' | ' ' (space means "any whitespace run")
//   out_data:   malloc'd row-major [n_rows x n_cols] float32 (NaN on parse
//               failure)
//   out_header: malloc'd '\n'-joined column labels
// Returns 0 on success, negative on error.
int parse_table(const char* path, char delim, float** out_data,
                int64_t* n_rows, int64_t* n_cols, char** out_header) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (fread(&buf[0], 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return -2;
  }
  fclose(f);

  const char* p = buf.c_str();
  const char* end = p + buf.size();
  const bool ws = (delim == ' ');

  // header line
  const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
  if (!line_end) return -3;
  std::string header;
  int64_t cols = 0;
  {
    const char* q = p;
    while (q < line_end) {
      const char* tok_end = q;
      if (ws) {
        while (tok_end < line_end && !isspace((unsigned char)*tok_end))
          ++tok_end;
      } else {
        while (tok_end < line_end && *tok_end != delim) ++tok_end;
      }
      std::string tok(q, tok_end - q);
      if (!tok.empty() && tok.back() == '\r') tok.pop_back();
      if (!(ws && tok.empty())) {
        if (cols) header += '\n';
        header += tok;
        ++cols;
      }
      q = tok_end;
      if (ws) {
        while (q < line_end && isspace((unsigned char)*q) && *q != '\n') ++q;
      } else if (q < line_end && *q == delim) {
        ++q;
      }
    }
  }
  if (cols == 0) return -4;
  p = line_end + 1;

  std::vector<float> data;
  data.reserve(1024 * cols);
  int64_t rows = 0;
  while (p < end) {
    line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    // bound every parse to [p, le): strtof skips leading whitespace
    // INCLUDING '\r'/'\n', so an unbounded parse of a trailing empty cell
    // would steal the next line's first number (and parse it twice)
    const char* le = line_end;
    if (le > p && le[-1] == '\r') --le;
    if (le > p) {  // skip blank lines (pandas skip_blank_lines semantics)
      int64_t c = 0;
      const char* q = p;
      bool overflow = false;
      if (ws) {
        while (q < le && c < cols) {
          while (q < le && isspace((unsigned char)*q)) ++q;
          if (q >= le) break;
          char* next = nullptr;
          float v = strtof(q, &next);
          if (next == q) {  // unparseable token -> NaN, skip it
            v = NAN;
            while (q < le && !isspace((unsigned char)*q)) ++q;
          } else {
            q = next;
          }
          data.push_back(v);
          ++c;
        }
        while (q < le && isspace((unsigned char)*q)) ++q;
        overflow = (q < le);  // tokens beyond the header width remain
      } else {
        bool more = true;  // a non-blank line has at least one cell
        while (more && c < cols) {
          const char* cell_end =
              static_cast<const char*>(memchr(q, delim, le - q));
          more = (cell_end != nullptr);
          if (!more) cell_end = le;
          const char* cs = q;
          while (cs < cell_end && isspace((unsigned char)*cs)) ++cs;
          const char* ce = cell_end;
          while (ce > cs && isspace((unsigned char)ce[-1])) --ce;
          float v = NAN;  // empty/whitespace-only cell -> NaN (pandas)
          if (cs < ce) {
            std::string tok(cs, ce - cs);
            char* nend = nullptr;
            float parsed = strtof(tok.c_str(), &nend);
            if (nend != tok.c_str()) v = parsed;
          }
          data.push_back(v);
          ++c;
          q = cell_end + (more ? 1 : 0);
        }
        overflow = (more && c == cols);  // a delimiter after the last col
      }
      // a row WIDER than the header is malformed data the pandas path
      // fails loudly on; match it instead of silently dropping cells
      if (overflow) return -6;
      while (c < cols) {  // ragged (narrower) row -> pad NaN
        data.push_back(NAN);
        ++c;
      }
      ++rows;
    }
    p = line_end + 1;
  }

  float* out = static_cast<float*>(malloc(sizeof(float) * data.size()));
  if (!out) return -5;
  memcpy(out, data.data(), sizeof(float) * data.size());
  *out_data = out;
  *n_rows = rows;
  *n_cols = cols;
  char* h = static_cast<char*>(malloc(header.size() + 1));
  memcpy(h, header.c_str(), header.size() + 1);
  *out_header = h;
  return 0;
}

// Windowing assignment with the reference loop semantics
// (reference MFT/train.py:386-406): frame i belongs to window w if
// times[i] <= (w+1)*window_size when scanned sequentially; the trailing
// partial window is dropped.
//   times:       [n] float64 timestamps (monotone)
//   window_size: seconds per window
//   out_start/out_count: malloc'd [n_windows] frame ranges (count may be 0
//                        for empty windows)
// Returns n_windows (>= 0) or negative on error.
int64_t window_assign(const double* times, int64_t n, double window_size,
                      int64_t** out_start, int64_t** out_count) {
  std::vector<int64_t> starts, counts;
  double current = 0.0;
  int64_t start = 0, i = 0;
  while (i < n) {
    if (times[i] <= current + window_size) {
      ++i;
    } else {
      starts.push_back(start);
      counts.push_back(i - start);
      start = i;
      current += window_size;
    }
  }
  // trailing partial window intentionally dropped (reference never flushes it)
  int64_t nw = static_cast<int64_t>(starts.size());
  *out_start = static_cast<int64_t*>(malloc(sizeof(int64_t) * nw));
  *out_count = static_cast<int64_t*>(malloc(sizeof(int64_t) * nw));
  if (nw) {
    memcpy(*out_start, starts.data(), sizeof(int64_t) * nw);
    memcpy(*out_count, counts.data(), sizeof(int64_t) * nw);
  }
  return nw;
}

}  // extern "C"
