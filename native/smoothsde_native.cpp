// smoothsde-tpu native runtime: host-side data pipeline.
//
// The reference's native layer is its likelihood core (TMB C++); in this
// framework the likelihood runs on TPU via XLA, and the native layer
// instead covers the host runtime around it: ingesting large tracking
// datasets (CSV -> columnar float64), segmenting tracks by ID, and
// packing padded (n_tracks, track_len, dim) batches for the vmapped /
// mesh-sharded likelihood (smoothsde_tpu/parallel/batching.py). For
// multi-million-row GPS datasets this is the part Python is too slow
// for. Exposed through a plain C ABI consumed via ctypes
// (smoothsde_tpu/utils/native.py).
//
// Build: make -C native   (produces libsmoothsde_native.so)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSV loader
// ---------------------------------------------------------------------------
//
// Parses a delimited text file. Numeric cells -> float64 (empty / "NA" /
// "NaN" -> NaN). One designated column (id_col, -1 = none) is treated as
// a categorical track ID and factor-coded by order of sorted level
// strings (matching R's factor(), reference R/sde.R:117).
//
// Returns 0 on success. Ownership of out buffers transfers to the
// caller (free with smoothsde_free).

struct CsvResult {
  int64_t n_rows;
  int64_t n_cols;     // numeric columns (id excluded)
  double* values;     // row-major (n_rows, n_cols)
  int64_t* id_codes;  // (n_rows,) or nullptr
  int64_t n_levels;
  char* header;       // '\n'-joined numeric column names
  char* levels;       // '\n'-joined ID level names
};

static char* dup_joined(const std::vector<std::string>& parts) {
  std::string joined;
  for (size_t i = 0; i < parts.size(); ++i) {
    if (i) joined += '\n';
    joined += parts[i];
  }
  char* out = static_cast<char*>(std::malloc(joined.size() + 1));
  std::memcpy(out, joined.c_str(), joined.size() + 1);
  return out;
}

static double parse_cell(const char* s, size_t len) {
  while (len && (*s == ' ' || *s == '"')) { ++s; --len; }
  while (len && (s[len - 1] == ' ' || s[len - 1] == '"' || s[len - 1] == '\r'))
    --len;
  if (len == 0) return NAN;
  if ((len == 2 && std::strncmp(s, "NA", 2) == 0) ||
      (len == 3 && (std::strncmp(s, "NaN", 3) == 0 ||
                    std::strncmp(s, "nan", 3) == 0)))
    return NAN;
  char buf[64];
  size_t m = len < 63 ? len : 63;
  std::memcpy(buf, s, m);
  buf[m] = 0;
  char* end = nullptr;
  double v = std::strtod(buf, &end);
  if (end == buf) return NAN;
  return v;
}

int smoothsde_read_csv(const char* path, char delim, const char* id_name,
                       CsvResult* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return 2;
  }
  std::fclose(f);
  buf[size] = 0;

  // header
  char* p = buf.data();
  char* end = buf.data() + size;
  std::vector<std::string> names;
  int id_col = -1;
  {
    char* eol = static_cast<char*>(std::memchr(p, '\n', end - p));
    if (!eol) return 3;
    std::string line(p, eol - p);
    size_t start = 0;
    int col = 0;
    while (start <= line.size()) {
      size_t e = line.find(delim, start);
      if (e == std::string::npos) e = line.size();
      std::string name = line.substr(start, e - start);
      while (!name.empty() && (name.back() == '\r' || name.back() == '"' ||
                               name.back() == ' '))
        name.pop_back();
      while (!name.empty() && (name.front() == '"' || name.front() == ' '))
        name.erase(name.begin());
      if (id_name && name == id_name) id_col = col;
      names.push_back(name);
      ++col;
      if (e == line.size()) break;
      start = e + 1;
    }
    p = eol + 1;
  }
  const int n_cols_total = static_cast<int>(names.size());
  const int n_num = n_cols_total - (id_col >= 0 ? 1 : 0);

  std::vector<double> values;
  values.reserve(1 << 20);
  std::vector<std::string> id_strings;

  while (p < end) {
    char* eol = static_cast<char*>(std::memchr(p, '\n', end - p));
    if (!eol) eol = end;
    if (eol == p || (*p == '\r' && eol == p + 1)) {
      p = eol + 1;
      continue;
    }
    int col = 0;
    char* cs = p;
    while (col < n_cols_total && cs <= eol) {
      char* ce = static_cast<char*>(std::memchr(cs, delim, eol - cs));
      if (!ce || ce > eol) ce = eol;
      if (col == id_col) {
        size_t len = ce - cs;
        while (len && (cs[len - 1] == '\r' || cs[len - 1] == '"')) --len;
        const char* s = cs;
        while (len && *s == '"') { ++s; --len; }
        id_strings.emplace_back(s, len);
      } else {
        values.push_back(parse_cell(cs, ce - cs));
      }
      ++col;
      cs = ce + 1;
    }
    while (col < n_cols_total) {  // short row: pad with NaN
      if (col != id_col) values.push_back(NAN);
      ++col;
    }
    p = eol + 1;
  }

  const int64_t n_rows = n_num > 0
      ? static_cast<int64_t>(values.size()) / n_num
      : static_cast<int64_t>(id_strings.size());

  out->n_rows = n_rows;
  out->n_cols = n_num;
  out->values = static_cast<double*>(std::malloc(values.size() * sizeof(double)));
  std::memcpy(out->values, values.data(), values.size() * sizeof(double));

  std::vector<std::string> num_names;
  for (int c = 0; c < n_cols_total; ++c)
    if (c != id_col) num_names.push_back(names[c]);
  out->header = dup_joined(num_names);

  if (id_col >= 0) {
    // factor coding with sorted unique levels (R factor() semantics)
    std::vector<std::string> levels(id_strings.begin(), id_strings.end());
    std::sort(levels.begin(), levels.end());
    levels.erase(std::unique(levels.begin(), levels.end()), levels.end());
    std::unordered_map<std::string, int64_t> code;
    for (size_t i = 0; i < levels.size(); ++i) code[levels[i]] = i;
    out->id_codes =
        static_cast<int64_t*>(std::malloc(n_rows * sizeof(int64_t)));
    for (int64_t i = 0; i < n_rows; ++i)
      out->id_codes[i] = code[id_strings[i]];
    out->n_levels = static_cast<int64_t>(levels.size());
    out->levels = dup_joined(levels);
  } else {
    out->id_codes = nullptr;
    out->n_levels = 0;
    out->levels = nullptr;
  }
  return 0;
}

void smoothsde_free(void* ptr) { std::free(ptr); }

// ---------------------------------------------------------------------------
// Track segmentation & padded packing
// ---------------------------------------------------------------------------

// starts/lengths of consecutive equal-id runs. Returns run count.
int64_t smoothsde_track_segments(const int64_t* ids, int64_t n,
                                 int64_t* starts, int64_t* lengths) {
  if (n == 0) return 0;
  int64_t k = 0;
  int64_t s = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || ids[i] != ids[i - 1]) {
      starts[k] = s;
      lengths[k] = i - s;
      ++k;
      s = i;
    }
  }
  return k;
}

// Pack flat (n, d) rows into padded (K, L, d) batches; padding rows get
// NaN observations and linearly continued times (parallel/batching.py
// semantics).
void smoothsde_pack_tracks(const double* obs, const double* times,
                           const int64_t* starts, const int64_t* lengths,
                           int64_t K, int64_t L, int64_t d,
                           double* obs_out, double* times_out) {
  for (int64_t k = 0; k < K; ++k) {
    const int64_t s = starts[k];
    const int64_t len = lengths[k];
    for (int64_t i = 0; i < L; ++i) {
      double* orow = obs_out + (k * L + i) * d;
      if (i < len) {
        std::memcpy(orow, obs + (s + i) * d, d * sizeof(double));
        times_out[k * L + i] = times[s + i];
      } else {
        for (int64_t c = 0; c < d; ++c) orow[c] = NAN;
        times_out[k * L + i] = times[s + len - 1] + 1.0 + (i - len);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Cubic-regression-spline design evaluation
// ---------------------------------------------------------------------------
//
// Value-parameterized cr basis (Wood 2017 sec 5.3.1), matching
// smoothsde_tpu/formula/smooths.py::_cr_design, with linear
// extrapolation beyond the boundary knots. F is the (k, k) map from
// values-at-knots to second derivatives (rows 0 and k-1 zero).

void smoothsde_cr_design(const double* x, int64_t n, const double* knots,
                         int64_t k, const double* F, double* X_out) {
  const double lo = knots[0], hi = knots[k - 1];
  for (int64_t r = 0; r < n; ++r) {
    double xv = x[r];
    double slope_base = 0.0;
    bool extrapolate = xv < lo || xv > hi;
    double xb = xv < lo ? lo : (xv > hi ? hi : xv);
    // interval search
    int64_t j = 0;
    {
      int64_t a = 0, b = k - 1;
      while (b - a > 1) {
        int64_t m = (a + b) / 2;
        if (knots[m] <= xb) a = m; else b = m;
      }
      j = a;
    }
    const double h = knots[j + 1] - knots[j];
    double* row = X_out + r * k;
    std::memset(row, 0, k * sizeof(double));
    auto eval_at = [&](double xx, double* out_row) {
      const double am = (knots[j + 1] - xx) / h;
      const double ap = (xx - knots[j]) / h;
      const double cm =
          ((knots[j + 1] - xx) * (knots[j + 1] - xx) * (knots[j + 1] - xx) / h -
           h * (knots[j + 1] - xx)) / 6.0;
      const double cp =
          ((xx - knots[j]) * (xx - knots[j]) * (xx - knots[j]) / h -
           h * (xx - knots[j])) / 6.0;
      for (int64_t c = 0; c < k; ++c)
        out_row[c] = cm * F[j * k + c] + cp * F[(j + 1) * k + c];
      out_row[j] += am;
      out_row[j + 1] += ap;
    };
    if (!extrapolate) {
      eval_at(xb, row);
    } else {
      const double b0 = xb;
      const double dlt = 1e-6 * (hi - lo);
      const double sgn = xv < lo ? 1.0 : -1.0;
      std::vector<double> r0(k), r1(k);
      eval_at(b0, r0.data());
      eval_at(b0 + sgn * dlt, r1.data());
      for (int64_t c = 0; c < k; ++c) {
        const double slope = sgn * (r1[c] - r0[c]) / dlt;
        row[c] = r0[c] + (xv - b0) * slope;
      }
    }
    (void)slope_base;
  }
}

}  // extern "C"
