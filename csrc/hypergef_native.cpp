// Native host runtime for hypergef_tpu: MatrixMarket parsing, CSR
// construction, and ELL tile-plan building.
//
// Role parity with the reference's native layers: the data loader
// (reference include/dataloader/dataloader.hpp:22-180 + vendored
// mmio.hpp) and the CPU schedule builder (reference
// include/taskbalancer/balancer_kernel.cuh:229-259).  Implemented fresh
// for the TPU design: instead of the reference's chunk-pair task list,
// hg_build_ell emits the padded ELL gather tables consumed by the XLA
// and Pallas backends (see hypergef_tpu/sparse/planner.py, whose NumPy
// implementation this must match bit-for-bit — tested in
// tests/test_native.py).
//
// Plain C ABI, loaded via ctypes (hypergef_tpu/sparse/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cctype>
#include <string>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------
// MatrixMarket IO
// ---------------------------------------------------------------------
namespace {

struct MtxBanner {
  bool pattern = false;
  bool symmetric = false;
  bool complex_field = false;
  bool coordinate = true;
};

// Parse the banner + size line. Returns 0 on success.
int parse_header(FILE* f, MtxBanner* banner, int64_t* rows, int64_t* cols,
                 int64_t* entries) {
  char line[1024];
  if (!fgets(line, sizeof line, f)) return -1;
  if (strncmp(line, "%%MatrixMarket", 14) != 0) return -2;
  std::string l(line);
  for (auto& c : l) c = (char)tolower((unsigned char)c);
  banner->coordinate = l.find("coordinate") != std::string::npos;
  banner->pattern = l.find("pattern") != std::string::npos;
  banner->symmetric = l.find("symmetric") != std::string::npos ||
                      l.find("skew-symmetric") != std::string::npos ||
                      l.find("hermitian") != std::string::npos;
  banner->complex_field = l.find("complex") != std::string::npos;
  if (!banner->coordinate) return -3;  // dense array format unsupported
  // skip comment lines
  for (;;) {
    if (!fgets(line, sizeof line, f)) return -4;
    if (line[0] != '%') break;
  }
  long long r, c, e;
  if (sscanf(line, "%lld %lld %lld", &r, &c, &e) != 3) return -5;
  *rows = r;
  *cols = c;
  *entries = e;
  return 0;
}

}  // namespace

// Read just the header: rows, cols, entry count (pre-expansion).
int hg_read_mtx_header(const char* path, int64_t* rows, int64_t* cols,
                       int64_t* entries) {
  FILE* f = fopen(path, "r");
  if (!f) return -10;
  MtxBanner b;
  int rc = parse_header(f, &b, rows, cols, entries);
  fclose(f);
  return rc;
}

// Read the COO body into caller-allocated arrays of capacity `cap`
// (use 2*entries to cover symmetric expansion).  Returns the number of
// entries written (after symmetric expansion, 0-based), or <0 on error.
int64_t hg_read_mtx_coo(const char* path, int32_t* row_out, int32_t* col_out,
                        int64_t cap) {
  FILE* f = fopen(path, "r");
  if (!f) return -10;
  MtxBanner b;
  int64_t rows, cols, entries;
  int rc = parse_header(f, &b, &rows, &cols, &entries);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  int64_t n = 0;
  char line[1024];
  for (int64_t i = 0; i < entries; ++i) {
    if (!fgets(line, sizeof line, f)) {
      fclose(f);
      return -6;
    }
    long long r, c;
    // value field (if any) is ignored: H is a 0/1 incidence matrix
    if (sscanf(line, "%lld %lld", &r, &c) != 2) {
      fclose(f);
      return -7;
    }
    r -= 1;  // 1-based → 0-based
    c -= 1;
    if (n >= cap) {
      fclose(f);
      return -8;
    }
    row_out[n] = (int32_t)r;
    col_out[n] = (int32_t)c;
    ++n;
    if (b.symmetric && r != c) {
      if (n >= cap) {
        fclose(f);
        return -8;
      }
      row_out[n] = (int32_t)c;
      col_out[n] = (int32_t)r;
      ++n;
    }
  }
  fclose(f);
  return n;
}

// ---------------------------------------------------------------------
// COO → CSR (row-sorted, columns sorted within row, duplicates kept)
// ---------------------------------------------------------------------
int hg_coo_to_csr(const int32_t* row, const int32_t* col, int64_t nnz,
                  int64_t num_rows, int64_t* indptr, int32_t* indices) {
  std::vector<int64_t> count(num_rows + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) {
    if (row[k] < 0 || row[k] >= num_rows) return -1;
    count[row[k] + 1]++;
  }
  for (int64_t r = 0; r < num_rows; ++r) count[r + 1] += count[r];
  std::memcpy(indptr, count.data(), (num_rows + 1) * sizeof(int64_t));
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t k = 0; k < nnz; ++k) indices[cursor[row[k]]++] = col[k];
  for (int64_t r = 0; r < num_rows; ++r)
    std::sort(indices + indptr[r], indices + indptr[r + 1]);
  return 0;
}

// ---------------------------------------------------------------------
// ELL tile-plan construction (twin of planner.build_ell)
// ---------------------------------------------------------------------
int64_t hg_num_chunks(const int64_t* indptr, int64_t num_rows, int64_t ngs) {
  int64_t total = 0;
  for (int64_t r = 0; r < num_rows; ++r) {
    int64_t len = indptr[r + 1] - indptr[r];
    total += (len + ngs - 1) / ngs;
  }
  return total;
}

// Fill the padded ELL tables.  Caller allocates:
//   gather_idx [c_pad*ngs] zero-initialized
//   mask       [c_pad*ngs] zero-initialized
//   seg_ids    [c_pad]     pre-filled with num_rows (pad sentinel)
//   seg_ptr    [num_rows+1]
// Returns the number of live chunks.
int64_t hg_build_ell(const int64_t* indptr, const int32_t* indices,
                     int64_t num_rows, int64_t nnz, int64_t ngs,
                     int64_t c_pad, int32_t* gather_idx, float* mask,
                     int32_t* seg_ids, int64_t* seg_ptr) {
  (void)nnz;
  int64_t chunk = 0;
  seg_ptr[0] = 0;
  for (int64_t r = 0; r < num_rows; ++r) {
    int64_t lo = indptr[r], hi = indptr[r + 1];
    for (int64_t start = lo; start < hi; start += ngs) {
      if (chunk >= c_pad) return -1;
      int64_t size = std::min(ngs, hi - start);
      seg_ids[chunk] = (int32_t)r;
      int32_t* g = gather_idx + chunk * ngs;
      float* m = mask + chunk * ngs;
      for (int64_t k = 0; k < size; ++k) {
        g[k] = indices[start + k];
        m[k] = 1.0f;
      }
      ++chunk;
    }
    seg_ptr[r + 1] = chunk;
  }
  return chunk;
}

// ---------------------------------------------------------------------
// Community ordering (hypergraph label propagation)
// ---------------------------------------------------------------------
// Role parity with the reference's vendored-but-unused Rabbit Order
// subsystem (reference include/reorder/rabbit_order.hpp:267-753): a
// locality-creating vertex ordering.  On TPU this ordering is
// load-bearing — the multihot-MXU and BSR backends' cost scales with
// how tile-local each hyperedge's members are (see
// sparse/planner.py::TiledStage.fragmentation).  Implemented fresh as
// synchronous hypergraph label propagation:
//
//   labels v <- vertex id;  repeat iters times:
//     label(e) = mode over members' labels   (tie -> smallest label)
//     label(v) = mode over incident edges' labels (tie -> smallest)
//   order = vertices sorted by (final label, id)
//
// Deterministic; bit-identical to the NumPy twin in
// hypergef_tpu/sparse/reorder.py (tested in tests/test_native.py).

namespace {

// mode of vals[lo:hi) after sorting scratch; ties -> smallest value.
int32_t run_mode(std::vector<int32_t>& scratch) {
  if (scratch.empty()) return 0;
  std::sort(scratch.begin(), scratch.end());
  int32_t best = scratch[0], cur = scratch[0];
  int64_t best_n = 1, cur_n = 1;
  for (size_t i = 1; i < scratch.size(); ++i) {
    if (scratch[i] == cur) {
      ++cur_n;
    } else {
      cur = scratch[i];
      cur_n = 1;
    }
    if (cur_n > best_n) {
      best_n = cur_n;
      best = cur;
    }
  }
  return best;
}

}  // namespace

void hg_community_order(int64_t n, int64_t e, const int64_t* ht_indptr,
                        const int32_t* ht_vertex, const int64_t* h_indptr,
                        const int32_t* h_edge, int32_t iters,
                        int32_t* order_out) {
  std::vector<int32_t> vlab(n), elab(e > 0 ? e : 1, 0);
  for (int64_t v = 0; v < n; ++v) vlab[v] = (int32_t)v;
  std::vector<int32_t> scratch;
  for (int32_t it = 0; it < iters; ++it) {
    for (int64_t ed = 0; ed < e; ++ed) {
      scratch.clear();
      for (int64_t k = ht_indptr[ed]; k < ht_indptr[ed + 1]; ++k)
        scratch.push_back(vlab[ht_vertex[k]]);
      elab[ed] = scratch.empty() ? (int32_t)ed : run_mode(scratch);
    }
    for (int64_t v = 0; v < n; ++v) {
      scratch.clear();
      for (int64_t k = h_indptr[v]; k < h_indptr[v + 1]; ++k)
        scratch.push_back(elab[h_edge[k]]);
      if (!scratch.empty()) vlab[v] = run_mode(scratch);
    }
  }
  // stable order by (label, id)
  std::vector<int64_t> idx(n);
  for (int64_t v = 0; v < n; ++v) idx[v] = v;
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    return vlab[a] < vlab[b];
  });
  for (int64_t i = 0; i < n; ++i) order_out[i] = (int32_t)idx[i];
}

}  // extern "C"
