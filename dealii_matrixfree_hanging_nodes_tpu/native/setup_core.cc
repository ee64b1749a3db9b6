// Native setup core: the host-side mesh/DoF machinery that the reference
// consumes from deal.II's C++ library (L1/L2 setup). The TPU execution path
// is JAX/XLA/Pallas; this library accelerates the trace-time setup pass:
//
//  - hn_balance_flags: one 2:1-balance sweep over the active forest
//    (face + edge 1-irregularity, deal.II's rule) using a hash set of
//    packed (level, coord) keys.
//  - hn_dof_unique: entity-key dedup for DoF enumeration — sorts (key1,key2)
//    pairs and assigns dense global ids.
//
// Exposed with a plain C ABI for ctypes; built via native/Makefile.

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <unordered_set>
#include <vector>

namespace {

inline int64_t pack_key(int dim, int64_t level, const int64_t *coord) {
  int64_t key = level;
  for (int d = 0; d < dim; ++d) key = (key << 16) | coord[d];
  return key;
}

}  // namespace

extern "C" {

// One balance iteration. Returns the number of flagged cells; flags[i] = 1
// where the active cell must be refined (it is >= 2 levels coarser than a
// face/edge neighbor). Arrays: level[n], coord[n*dim] (C order).
int64_t hn_balance_flags(int32_t dim, int64_t n, const int64_t *level,
                         const int64_t *coord, uint8_t *flags) {
  std::unordered_set<int64_t> active;
  active.reserve(static_cast<size_t>(n) * 2);
  std::vector<int64_t> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    keys[i] = pack_key(dim, level[i], coord + i * dim);
    active.insert(keys[i]);
  }
  // key -> active index
  // (store index via a second pass: map from key to i using sorted vector)
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return keys[a] < keys[b]; });
  std::vector<int64_t> sorted_keys(n);
  for (int64_t i = 0; i < n; ++i) sorted_keys[i] = keys[order[i]];

  auto find_index = [&](int64_t key) -> int64_t {
    auto it = std::lower_bound(sorted_keys.begin(), sorted_keys.end(), key);
    if (it == sorted_keys.end() || *it != key) return -1;
    return order[it - sorted_keys.begin()];
  };

  // neighbor probe offsets: faces; in 3D also edges
  std::vector<std::array<int64_t, 3>> offsets;
  for (int d = 0; d < dim; ++d)
    for (int s = -1; s <= 1; s += 2) {
      std::array<int64_t, 3> o{0, 0, 0};
      o[d] = s;
      offsets.push_back(o);
    }
  if (dim == 3) {
    for (int e = 0; e < 3; ++e) {
      int a = (e == 0) ? 1 : 0, b = (e == 2) ? 1 : 2;
      for (int sa = -1; sa <= 1; sa += 2)
        for (int sb = -1; sb <= 1; sb += 2) {
          std::array<int64_t, 3> o{0, 0, 0};
          o[a] = sa;
          o[b] = sb;
          offsets.push_back(o);
        }
    }
  }

  std::memset(flags, 0, n);
  int64_t n_flagged = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t l = level[i];
    const int64_t lim = int64_t(1) << l;
    for (const auto &off : offsets) {
      int64_t nb[3];
      bool inside = true;
      for (int d = 0; d < dim; ++d) {
        nb[d] = coord[i * dim + d] + off[d];
        if (nb[d] < 0 || nb[d] >= lim) {
          inside = false;
          break;
        }
      }
      if (!inside) continue;
      // ancestors at levels l-2 .. 0 covering the neighbor slot
      for (int64_t up = 2; up <= l; ++up) {
        int64_t anc[3];
        for (int d = 0; d < dim; ++d) anc[d] = nb[d] >> up;
        const int64_t key = pack_key(dim, l - up, anc);
        if (active.count(key)) {
          const int64_t j = find_index(key);
          if (j >= 0 && !flags[j]) {
            flags[j] = 1;
            ++n_flagged;
          }
        }
      }
    }
  }
  return n_flagged;
}

namespace {

struct KeyEntry {
  int64_t k1, k2, idx;
};

// Shared dedup core: sort (k1, k2, idx) entries BY VALUE (the earlier
// index-indirect std::sort was cache-hostile: 2 random reads per comparison
// made the nref=8 DoF pass take minutes instead of seconds).
int64_t assign_dense_ids(std::vector<KeyEntry> &entries, int64_t *gid_out) {
  std::sort(entries.begin(), entries.end(),
            [](const KeyEntry &a, const KeyEntry &b) {
              if (a.k1 != b.k1) return a.k1 < b.k1;
              return a.k2 < b.k2;
            });
  int64_t next = -1, prev1 = 0, prev2 = 0;
  bool first = true;
  for (const auto &e : entries) {
    if (first || e.k1 != prev1 || e.k2 != prev2) {
      ++next;
      prev1 = e.k1;
      prev2 = e.k2;
      first = false;
    }
    gid_out[e.idx] = next;
  }
  return next + 1;
}

}  // namespace

// Entity-key dedup: assigns dense ids by sorted (key1, key2); returns n_dofs.
int64_t hn_dof_unique(int64_t n, const int64_t *key1, const int64_t *key2,
                      int64_t *gid_out) {
  std::vector<KeyEntry> entries(n);
  for (int64_t i = 0; i < n; ++i) entries[i] = {key1[i], key2[i], i};
  return assign_dense_ids(entries, gid_out);
}

// Full DoF distribution: builds the per-(cell, lattice-node) entity keys of
// dof_handler._distribute (17-bit coordinate / 19-bit marker fields per
// axis; DoFHandler docstring has the sharing rule) in one streaming pass and
// dedups them — replaces ~25 NumPy passes over [n_cells * n_loc] int64
// temporaries (the nref=8 setup wall). Returns n_dofs, or -1 on unsupported
// inputs (caller falls back to NumPy).
int64_t hn_distribute_dofs(int32_t dim, int32_t p, int64_t n_cells,
                           const int64_t *level, const int64_t *coord,
                           int64_t *gid_out) {
  if (dim < 1 || dim > 3 || p < 1) return -1;
  int64_t lmax = 0;
  for (int64_t i = 0; i < n_cells; ++i) lmax = std::max(lmax, level[i]);
  if (lmax > 15) return -1;
  if (((int64_t(1) << lmax) * (p + 1) + p) >= (int64_t(1) << 19)) return -1;

  const int n1 = p + 1;
  int64_t n_loc = 1;
  for (int d = 0; d < dim; ++d) n_loc *= n1;

  std::vector<KeyEntry> entries(static_cast<size_t>(n_cells) * n_loc);
  for (int64_t i = 0; i < n_cells; ++i) {
    const int64_t sz = int64_t(1) << (lmax - level[i]);
    const int64_t marker_base = sz * n1;
    int64_t base[3] = {0, 0, 0};
    for (int d = 0; d < dim; ++d) base[d] = coord[i * dim + d] * sz;
    for (int64_t l = 0; l < n_loc; ++l) {
      // lattice index per axis, x fastest (local_lattice order); key fold
      // order matches the Python loop: axis 0 ends up in the HIGH bits.
      int64_t k1 = 0, k2 = 0;
      int64_t rem = l;
      // compute per-axis in a==0..dim-1 order while folding high->low:
      // python does key = (key << W) | field_a for a = 0..dim-1, so field_0
      // occupies the highest field. Replicate exactly.
      for (int a = 0; a < dim; ++a) {
        // lattice index of axis a: (l / n1^a) % n1
        int64_t div = 1;
        for (int t = 0; t < a; ++t) div *= n1;
        const int64_t ia = (l / div) % n1;
        int64_t coord_a, marker_a;
        if (ia == 0) {
          coord_a = base[a];
          marker_a = 0;
        } else if (ia == p) {
          coord_a = base[a] + sz;
          marker_a = 0;
        } else {
          coord_a = base[a];
          marker_a = marker_base + ia;
        }
        k1 = (k1 << 17) | coord_a;
        k2 = (k2 << 19) | marker_a;
      }
      entries[static_cast<size_t>(i) * n_loc + l] = {k1, k2, i * n_loc + l};
      (void)rem;
    }
  }
  return assign_dense_ids(entries, gid_out);
}

}  // extern "C"
