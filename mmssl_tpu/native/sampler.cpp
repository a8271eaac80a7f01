// Native negative sampler.
//
// C++ implementation of the Data.sample() contract
// (reference: MMSSL/utility/load_data.py:153-191): for each user in a batch,
// one positive drawn uniformly from the user's train items and one negative
// drawn uniformly over the catalog with rejection against the user's train
// items.  Replaces the reference's per-user python loops (and the dead DGL
// sampling path) with a branch-light loop over a CSR-like padded layout;
// membership tests are binary searches over per-user sorted item lists.
//
// Built as a shared library via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// xoshiro256** — small, fast, seedable PRNG (public-domain algorithm).
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 seeding
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }
  inline uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // unbiased bounded draw (Lemire)
  inline uint32_t bounded(uint32_t n) {
    uint64_t m = (uint64_t)(uint32_t)next() * n;
    uint32_t l = (uint32_t)m;
    if (l < n) {
      uint32_t t = (0u - n) % n;
      while (l < t) {
        m = (uint64_t)(uint32_t)next() * n;
        l = (uint32_t)m;
      }
    }
    return (uint32_t)(m >> 32);
  }
};

struct SamplerState {
  int32_t n_users;
  int32_t max_deg;
  std::vector<int32_t> items;   // [n_users * max_deg], sorted per user
  std::vector<int32_t> counts;  // [n_users]
};

inline bool contains(const int32_t* begin, int32_t count, int32_t item) {
  // binary search over the user's sorted train items
  int32_t lo = 0, hi = count;
  while (lo < hi) {
    int32_t mid = (lo + hi) / 2;
    int32_t v = begin[mid];
    if (v == item) return true;
    if (v < item) lo = mid + 1; else hi = mid;
  }
  return false;
}

}  // namespace

extern "C" {

// Build state from the padded train matrix (pad value ignored via counts).
// Returns an opaque handle.
void* sampler_create(const int32_t* train_pad, const int32_t* counts,
                     int32_t n_users, int32_t max_deg) {
  auto* st = new SamplerState();
  st->n_users = n_users;
  st->max_deg = max_deg;
  st->items.assign(train_pad, train_pad + (size_t)n_users * max_deg);
  st->counts.assign(counts, counts + n_users);
  // sort each user's slice (only the first count entries are valid)
  for (int32_t u = 0; u < n_users; ++u) {
    int32_t* b = st->items.data() + (size_t)u * max_deg;
    int32_t c = st->counts[u];
    for (int32_t i = 1; i < c; ++i) {  // insertion sort; degrees are small
      int32_t key = b[i], j = i - 1;
      while (j >= 0 && b[j] > key) { b[j + 1] = b[j]; --j; }
      b[j + 1] = key;
    }
  }
  return st;
}

void sampler_destroy(void* handle) { delete static_cast<SamplerState*>(handle); }

// Sample positives and negatives for a user batch.
// users: [batch]; pos/neg out: [batch]. Returns 0 on success.
int32_t sampler_sample(void* handle, const int32_t* users, int32_t batch,
                       int32_t n_items, uint64_t seed,
                       int32_t* pos_out, int32_t* neg_out) {
  auto* st = static_cast<SamplerState*>(handle);
  Rng rng(seed);
  for (int32_t k = 0; k < batch; ++k) {
    int32_t u = users[k];
    if (u < 0 || u >= st->n_users) return -1;
    const int32_t* b = st->items.data() + (size_t)u * st->max_deg;
    int32_t c = st->counts[u];
    if (c <= 0) return -2;  // user with no train items cannot be sampled
    pos_out[k] = b[rng.bounded((uint32_t)c)];
    // rejection sampling for the negative; c < n_items guaranteed in practice
    int32_t neg;
    int32_t guard = 0;
    do {
      neg = (int32_t)rng.bounded((uint32_t)n_items);
      if (++guard > 1 << 20) return -3;  // degenerate catalog
    } while (contains(b, c, neg));
    neg_out[k] = neg;
  }
  return 0;
}

}  // extern "C"
