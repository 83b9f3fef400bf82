// Native fold-partitioning kernel for cvmatrix_tpu.
//
// Groups row indices by integer fold label in one O(N) pass, preserving
// first-appearance key order (the reference Partitioner's dict semantics,
// /root/reference/cvmatrix/partitioner.py:89-107, is an insertion-ordered
// Python-loop build; this is its native equivalent for the common case of
// integer fold labels at N in the millions, where the Python loop and even
// the numpy sort-based path dominate host-side time).
//
// Built with plain g++ into a shared object and loaded via ctypes — no
// build-system dependency (see cvmatrix_tpu/native/loader.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Open-addressing hash table mapping label -> slot (dense key id).
struct Table {
  std::vector<int64_t> keys;
  std::vector<int64_t> slots;
  std::vector<uint8_t> used;
  uint64_t mask;

  explicit Table(uint64_t cap_pow2)
      : keys(cap_pow2), slots(cap_pow2), used(cap_pow2, 0), mask(cap_pow2 - 1) {}

  static uint64_t hash(int64_t k) {
    uint64_t x = static_cast<uint64_t>(k);
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    return x;
  }

  // Returns the dense id for `k`, assigning `next_id` if new (returns -1 via
  // `is_new` flag semantics: caller increments).
  int64_t lookup_or_insert(int64_t k, int64_t next_id, bool* is_new) {
    uint64_t i = hash(k) & mask;
    while (used[i]) {
      if (keys[i] == k) {
        *is_new = false;
        return slots[i];
      }
      i = (i + 1) & mask;
    }
    used[i] = 1;
    keys[i] = k;
    slots[i] = next_id;
    *is_new = true;
    return next_id;
  }
};

uint64_t next_pow2(uint64_t x) {
  uint64_t p = 1;
  while (p < x) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

// Groups `labels[0..n)` by value.
// Outputs:
//   out_ids[n]      : dense key id per row (first-appearance order)
//   out_keys[<=n]   : unique labels in first-appearance order
//   out_counts[<=n] : rows per key
// Returns the number of unique keys (>= 0), or -1 on error.
int64_t cvm_partition_i64(const int64_t* labels, int64_t n, int64_t* out_ids,
                          int64_t* out_keys, int64_t* out_counts) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  // No exception may cross the C ABI into ctypes (std::terminate would
  // abort the host process); an allocation failure is an error return,
  // honoring the caller's silent-NumPy-fallback contract.
  try {
    Table t(next_pow2(static_cast<uint64_t>(n) * 2));
    int64_t nkeys = 0;
    for (int64_t i = 0; i < n; ++i) {
      bool is_new = false;
      int64_t id = t.lookup_or_insert(labels[i], nkeys, &is_new);
      if (is_new) {
        out_keys[nkeys] = labels[i];
        out_counts[nkeys] = 0;
        ++nkeys;
      }
      out_ids[i] = id;
      ++out_counts[id];
    }
    return nkeys;
  } catch (...) {
    return -1;
  }
}

// Scatter pass: fills `out_indices` (grouped rows) given the dense ids and
// per-key offsets. `offsets` is modified in place (exclusive prefix sums in,
// end positions out).
void cvm_scatter_i64(const int64_t* ids, int64_t n, int64_t* offsets,
                     int64_t* out_indices) {
  for (int64_t i = 0; i < n; ++i) {
    out_indices[offsets[ids[i]]++] = i;
  }
}

}  // extern "C"
