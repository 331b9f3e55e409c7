// tuple_engine: native offline dealer for curl_tpu correlated randomness.
//
// Role parity: the reference's TTP dealer generates tuples with torch on the
// dealer host (curl/mpc/provider/ttp_provider.py:256-306, a Python server).
// Here the dealer's hot loop — CSPRNG draws, additive/XOR share splitting,
// and mod-2^64 ring products for Beaver triples — is native, multithreaded
// C++ consumed via ctypes (curl_tpu/mpc/provider/native_engine.py). Shares
// live in Z_{2^64}, which unsigned overflow implements exactly.
//
// RNG: ChaCha20 in counter mode (IETF variant block function), keyed by a
// 64-bit dealer seed expanded through splitmix64. Each logical draw gets its
// own 64-bit stream id, so draws are independent and any block is random
// access — which is what makes the fill embarrassingly parallel.

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline uint32_t rotl32(uint32_t x, int n) { return (x << n) | (x >> (32 - n)); }

inline void quarter(uint32_t& a, uint32_t& b, uint32_t& c, uint32_t& d) {
  a += b; d ^= a; d = rotl32(d, 16);
  c += d; b ^= c; b = rotl32(b, 12);
  a += b; d ^= a; d = rotl32(d, 8);
  c += d; b ^= c; b = rotl32(b, 7);
}

// One ChaCha20 block: 16 output words from key (8 words), counter, nonce.
void chacha20_block(const uint32_t key[8], uint64_t counter, uint64_t nonce,
                    uint32_t out[16]) {
  uint32_t s[16] = {
      0x61707865u, 0x3320646eu, 0x79622d32u, 0x6b206574u,
      key[0], key[1], key[2], key[3],
      key[4], key[5], key[6], key[7],
      static_cast<uint32_t>(counter), static_cast<uint32_t>(counter >> 32),
      static_cast<uint32_t>(nonce), static_cast<uint32_t>(nonce >> 32)};
  uint32_t w[16];
  std::memcpy(w, s, sizeof(w));
  for (int i = 0; i < 10; ++i) {  // 20 rounds = 10 double-rounds
    quarter(w[0], w[4], w[8], w[12]);
    quarter(w[1], w[5], w[9], w[13]);
    quarter(w[2], w[6], w[10], w[14]);
    quarter(w[3], w[7], w[11], w[15]);
    quarter(w[0], w[5], w[10], w[15]);
    quarter(w[1], w[6], w[11], w[12]);
    quarter(w[2], w[7], w[8], w[13]);
    quarter(w[3], w[4], w[9], w[14]);
  }
  for (int i = 0; i < 16; ++i) out[i] = w[i] + s[i];
}

inline uint64_t splitmix64(uint64_t& x) {
  x += 0x9e3779b97f4a7c15ull;
  uint64_t z = x;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

void expand_key(uint64_t seed, uint32_t key[8]) {
  uint64_t s = seed;
  for (int i = 0; i < 4; ++i) {
    uint64_t v = splitmix64(s);
    key[2 * i] = static_cast<uint32_t>(v);
    key[2 * i + 1] = static_cast<uint32_t>(v >> 32);
  }
}

}  // namespace

extern "C" {

// Fill out[0..n) with uniform uint64 from stream (seed, stream).
void te_random_u64(uint64_t seed, uint64_t stream, uint64_t n, uint64_t* out) {
  uint32_t key[8];
  expand_key(seed, key);
  const uint64_t nblocks = (n + 7) / 8;  // 8 u64 per ChaCha block
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < static_cast<int64_t>(nblocks); ++b) {
    uint32_t blk[16];
    chacha20_block(key, static_cast<uint64_t>(b), stream, blk);
    const uint64_t base = static_cast<uint64_t>(b) * 8;
    const uint64_t lim = (base + 8 < n) ? 8 : n - base;
    for (uint64_t i = 0; i < lim; ++i) {
      out[base + i] = (static_cast<uint64_t>(blk[2 * i + 1]) << 32) |
                      static_cast<uint64_t>(blk[2 * i]);
    }
  }
}

// In-place mask to the top-justified k-bit range [0, 2^k): v >>= (64-k).
void te_mask_kbit(uint64_t* buf, uint64_t n, int k) {
  if (k >= 64) return;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i)
    buf[i] >>= (64 - k);
}

// Additive share split of v[0..n) into P planes at out (P x n, row-major):
// planes 1..P-1 ~ uniform, plane 0 = v - sum(others) (mod 2^64). The joint
// distribution equals PRZS + rank0-adds-v (tfp_provider.py:25-33).
void te_split_additive(const uint64_t* v, uint64_t n, int parties,
                       uint64_t seed, uint64_t stream, uint64_t* out) {
  for (int p = 1; p < parties; ++p)
    te_random_u64(seed, stream * 1000003ull + static_cast<uint64_t>(p), n,
                  out + static_cast<uint64_t>(p) * n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i) {
    uint64_t acc = 0;
    for (int p = 1; p < parties; ++p)
      acc += out[static_cast<uint64_t>(p) * n + i];
    out[i] = v[i] - acc;
  }
}

// XOR share split (binary sharing), same layout as te_split_additive.
void te_split_xor(const uint64_t* v, uint64_t n, int parties, uint64_t seed,
                  uint64_t stream, uint64_t* out) {
  for (int p = 1; p < parties; ++p)
    te_random_u64(seed, stream * 1000003ull + static_cast<uint64_t>(p), n,
                  out + static_cast<uint64_t>(p) * n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i) {
    uint64_t acc = 0;
    for (int p = 1; p < parties; ++p)
      acc ^= out[static_cast<uint64_t>(p) * n + i];
    out[i] = v[i] ^ acc;
  }
}

// Zero-sum planes: planes 1..P-1 uniform, plane 0 = -(sum of others).
void te_zero_planes(uint64_t n, int parties, uint64_t seed, uint64_t stream,
                    uint64_t* out) {
  for (int p = 1; p < parties; ++p)
    te_random_u64(seed, stream * 1000003ull + static_cast<uint64_t>(p), n,
                  out + static_cast<uint64_t>(p) * n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i) {
    uint64_t acc = 0;
    for (int p = 1; p < parties; ++p)
      acc += out[static_cast<uint64_t>(p) * n + i];
    out[i] = 0ull - acc;
  }
}

// Elementwise ring product c = a * b (mod 2^64).
void te_mul_u64(const uint64_t* a, const uint64_t* b, uint64_t n,
                uint64_t* c) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i) c[i] = a[i] * b[i];
}

// Ring matmul c[M,N] = a[M,K] @ b[K,N] (mod 2^64), blocked + parallel.
void te_matmul_u64(const uint64_t* a, const uint64_t* b, uint64_t M,
                   uint64_t K, uint64_t N, uint64_t* c) {
  std::memset(c, 0, M * N * sizeof(uint64_t));
  const uint64_t BK = 64;
#pragma omp parallel for schedule(static)
  for (int64_t m = 0; m < static_cast<int64_t>(M); ++m) {
    for (uint64_t k0 = 0; k0 < K; k0 += BK) {
      const uint64_t kend = (k0 + BK < K) ? k0 + BK : K;
      for (uint64_t k = k0; k < kend; ++k) {
        const uint64_t av = a[static_cast<uint64_t>(m) * K + k];
        const uint64_t* brow = b + k * N;
        uint64_t* crow = c + static_cast<uint64_t>(m) * N;
        for (uint64_t nn = 0; nn < N; ++nn) crow[nn] += av * brow[nn];
      }
    }
  }
}

// Signed wrap count over P planes (ring.count_wraps convention: two
// positives overflowing to negative -> +1, two negatives underflowing to
// positive -> -1, accumulated over a running sum). Output is int64 in u64.
void te_count_wraps(const uint64_t* planes, int parties, uint64_t n,
                    uint64_t* theta) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i) {
    int64_t prev = static_cast<int64_t>(planes[i]);
    int64_t wraps = 0;
    for (int p = 1; p < parties; ++p) {
      const int64_t cur =
          static_cast<int64_t>(planes[static_cast<uint64_t>(p) * n + i]);
      const int64_t next =
          static_cast<int64_t>(static_cast<uint64_t>(prev) +
                               static_cast<uint64_t>(cur));
      if (prev > 0 && cur > 0 && next < 0) ++wraps;
      if (prev < 0 && cur < 0 && next > 0) --wraps;
      prev = next;
    }
    theta[i] = static_cast<uint64_t>(wraps);
  }
}

// One-hot expansion: out[i, j] = (r[i] == j) for j in [0, L).
void te_one_hot(const uint64_t* r, uint64_t n, uint64_t L, uint64_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < static_cast<int64_t>(n); ++i) {
    uint64_t* row = out + static_cast<uint64_t>(i) * L;
    std::memset(row, 0, L * sizeof(uint64_t));
    if (r[i] < L) row[r[i]] = 1ull;
  }
}

int te_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
