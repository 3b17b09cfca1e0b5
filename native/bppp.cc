// Native host engine for the bppp_tpu framework.
//
// Role: the TPU-native rebuild's counterpart of the reference's native
// compute crates (k256 + merlin, SURVEY.md §2 rows 10-12). The JAX/TPU
// path owns batched proving/verifying; this C++ engine owns the host
// runtime around it: fast single-proof prove/verify (fixture generation,
// spot checks, low-latency single-shot serving), wire-format
// pack/unpack, and a CPU baseline. Exposed through a C ABI consumed via
// ctypes (bppp_tpu/native).
//
// Protocol semantics mirror /root/reference/src (wnla.rs, circuit.rs,
// range_proof/*.rs) — same math, same transcript bytes; the structure
// follows bppp_tpu/oracle/*.py (the Python twin used for cross-checks).
//
// NOT constant-time: host-side engine. The secret-blinded TPU prover and
// any production signing path must treat this as a vartime oracle.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <vector>

namespace bppp {

// ---------------------------------------------------------------------
// 256-bit integers (4x u64 little-endian words)
// ---------------------------------------------------------------------

struct U256 {
  uint64_t w[4];
  bool operator==(const U256 &o) const {
    return !((w[0] ^ o.w[0]) | (w[1] ^ o.w[1]) | (w[2] ^ o.w[2]) |
             (w[3] ^ o.w[3]));
  }
};

static const U256 ZERO{{0, 0, 0, 0}};
static const U256 ONE{{1, 0, 0, 0}};

// secp256k1 base field p = 2^256 - 2^32 - 977
static const U256 P{{0xFFFFFFFEFFFFFC2FULL, 0xFFFFFFFFFFFFFFFFULL,
                     0xFFFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL}};
// group order n
static const U256 N{{0xBFD25E8CD0364141ULL, 0xBAAEDCE6AF48A03BULL,
                     0xFFFFFFFFFFFFFFFEULL, 0xFFFFFFFFFFFFFFFFULL}};
// curve b = 7; generator
static const U256 B7{{7, 0, 0, 0}};
static const U256 GX{{0x59F2815B16F81798ULL, 0x029BFCDB2DCE28D9ULL,
                      0x55A06295CE870B07ULL, 0x79BE667EF9DCBBACULL}};
static const U256 GY{{0x9C47D08FFB10D4B8ULL, 0xFD17B448A6855419ULL,
                      0x5DA4FBFC0E1108A8ULL, 0x483ADA7726A3C465ULL}};

static inline int cmp(const U256 &a, const U256 &b) {
  for (int i = 3; i >= 0; --i) {
    if (a.w[i] < b.w[i]) return -1;
    if (a.w[i] > b.w[i]) return 1;
  }
  return 0;
}

static inline bool is_zero(const U256 &a) {
  return (a.w[0] | a.w[1] | a.w[2] | a.w[3]) == 0;
}

// a + b -> (sum, carry)
static inline uint64_t add_raw(U256 &r, const U256 &a, const U256 &b) {
  unsigned __int128 c = 0;
  for (int i = 0; i < 4; ++i) {
    c += (unsigned __int128)a.w[i] + b.w[i];
    r.w[i] = (uint64_t)c;
    c >>= 64;
  }
  return (uint64_t)c;
}

// a - b -> (diff, borrow)
static inline uint64_t sub_raw(U256 &r, const U256 &a, const U256 &b) {
  unsigned __int128 br = 0;
  for (int i = 0; i < 4; ++i) {
    unsigned __int128 d = (unsigned __int128)a.w[i] - b.w[i] - br;
    r.w[i] = (uint64_t)d;
    br = (d >> 64) & 1;
  }
  return (uint64_t)br;
}

static inline U256 add_mod(const U256 &a, const U256 &b, const U256 &m) {
  U256 r;
  uint64_t c = add_raw(r, a, b);
  if (c || cmp(r, m) >= 0) {
    U256 t;
    sub_raw(t, r, m);
    return t;
  }
  return r;
}

static inline U256 sub_mod(const U256 &a, const U256 &b, const U256 &m) {
  U256 r;
  if (sub_raw(r, a, b)) {
    U256 t;
    add_raw(t, r, m);
    return t;
  }
  return r;
}

// full 4x4 -> 8-word product
static inline void mul_wide(uint64_t out[8], const U256 &a, const U256 &b) {
  unsigned __int128 acc = 0;
  uint64_t tmp[8] = {0};
  for (int i = 0; i < 4; ++i) {
    unsigned __int128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      carry += (unsigned __int128)a.w[i] * b.w[j] + tmp[i + j];
      tmp[i + j] = (uint64_t)carry;
      carry >>= 64;
    }
    tmp[i + 4] = (uint64_t)carry;
  }
  (void)acc;
  std::memcpy(out, tmp, sizeof(tmp));
}

// reduce 8 words mod p via 2^256 = 2^32 + 977 (two folds + cond subs)
static U256 reduce_p(const uint64_t t[8]) {
  const uint64_t C = 0x1000003D1ULL;  // 2^32 + 977
  uint64_t r[5] = {t[0], t[1], t[2], t[3], 0};
  // fold hi*C into lo
  unsigned __int128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    carry += (unsigned __int128)t[4 + i] * C + r[i];
    r[i] = (uint64_t)carry;
    carry >>= 64;
  }
  r[4] = (uint64_t)carry;
  // second fold: r[4]*C
  carry = (unsigned __int128)r[4] * C + r[0];
  uint64_t s[4];
  s[0] = (uint64_t)carry;
  carry >>= 64;
  for (int i = 1; i < 4; ++i) {
    carry += r[i];
    s[i] = (uint64_t)carry;
    carry >>= 64;
  }
  U256 out{{s[0], s[1], s[2], s[3]}};
  if (carry) {  // one more tiny fold
    U256 add{{C, 0, 0, 0}};
    out = add_mod(out, add, P);
  } else if (cmp(out, P) >= 0) {
    U256 tt;
    sub_raw(tt, out, P);
    out = tt;
  }
  return out;
}

// reduce 8 words mod n via 2^256 = Cn (129 bits), three folds
static U256 reduce_n(const uint64_t t[8]) {
  // Cn = 2^256 - n
  static const uint64_t CN[3] = {0x402DA1732FC9BEBFULL, 0x4551231950B75FC4ULL,
                                 0x1ULL};
  uint64_t cur[8];
  std::memcpy(cur, t, sizeof(cur));
  int words = 8;
  while (words > 4) {
    int hi_words = words - 4;
    uint64_t lo[8] = {cur[0], cur[1], cur[2], cur[3], 0, 0, 0, 0};
    // prod = hi * CN  (hi_words x 3)
    uint64_t prod[8] = {0};
    for (int i = 0; i < hi_words; ++i) {
      unsigned __int128 carry = 0;
      for (int j = 0; j < 3; ++j) {
        carry += (unsigned __int128)cur[4 + i] * CN[j] + prod[i + j];
        prod[i + j] = (uint64_t)carry;
        carry >>= 64;
      }
      int k = i + 3;
      while (carry) {
        carry += prod[k];
        prod[k] = (uint64_t)carry;
        carry >>= 64;
        ++k;
      }
    }
    // cur = lo + prod
    unsigned __int128 carry = 0;
    int top = 0;
    for (int i = 0; i < 8; ++i) {
      carry += (unsigned __int128)lo[i] + prod[i];
      cur[i] = (uint64_t)carry;
      carry >>= 64;
      if (cur[i]) top = i;
    }
    words = top + 1 < 5 ? 5 : top + 1;  // at least consider word 4
    if (cur[4] == 0 && cur[5] == 0 && cur[6] == 0 && cur[7] == 0) words = 4;
  }
  U256 out{{cur[0], cur[1], cur[2], cur[3]}};
  while (cmp(out, N) >= 0) {
    U256 tt;
    sub_raw(tt, out, N);
    out = tt;
  }
  return out;
}

static inline U256 mul_p(const U256 &a, const U256 &b) {
  uint64_t t[8];
  mul_wide(t, a, b);
  return reduce_p(t);
}

static inline U256 mul_n(const U256 &a, const U256 &b) {
  uint64_t t[8];
  mul_wide(t, a, b);
  return reduce_n(t);
}

static U256 pow_mod(const U256 &x, const U256 &e, bool mod_p) {
  U256 acc = ONE;
  U256 base = x;
  for (int i = 0; i < 256; ++i) {
    int word = i / 64, bit = i % 64;
    if ((e.w[word] >> bit) & 1)
      acc = mod_p ? mul_p(acc, base) : mul_n(acc, base);
    base = mod_p ? mul_p(base, base) : mul_n(base, base);
  }
  return acc;
}

static U256 inv_p(const U256 &x) {
  U256 e = P;
  e.w[0] -= 2;
  return pow_mod(x, e, true);
}

static U256 inv_n(const U256 &x) {
  U256 e = N;
  e.w[0] -= 2;
  return pow_mod(x, e, false);
}

static U256 sqrt_p(const U256 &x) {  // p = 3 mod 4
  U256 e = P;
  // (p+1)/4
  unsigned __int128 c = (unsigned __int128)e.w[0] + 1;
  uint64_t t[4];
  for (int i = 0; i < 4; ++i) {
    t[i] = (uint64_t)c;
    c >>= 64;
    if (i < 3) c += e.w[i + 1];
  }
  // shift right by 2
  U256 q;
  for (int i = 0; i < 4; ++i) {
    q.w[i] = (t[i] >> 2) | (i < 3 ? (t[i + 1] << 62) : 0);
  }
  return pow_mod(x, q, true);
}

static void u256_to_be(uint8_t out[32], const U256 &a) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 8; ++j)
      out[31 - 8 * i - j] = (uint8_t)(a.w[i] >> (8 * j));
}

static U256 u256_from_be(const uint8_t in[32]) {
  U256 a = ZERO;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 8; ++j)
      a.w[i] |= (uint64_t)in[31 - 8 * i - j] << (8 * j);
  return a;
}

// ---------------------------------------------------------------------
// Jacobian points (z == 0 <=> identity) — mirrors oracle/curve.py
// ---------------------------------------------------------------------

struct Pt {
  U256 x, y, z;
  bool is_id() const { return is_zero(z); }
};

static const Pt PT_ID{ZERO, ONE, ZERO};
static const Pt PT_G{GX, GY, ONE};

static Pt pt_double(const Pt &p) {
  if (p.is_id() || is_zero(p.y)) return PT_ID;
  U256 A = mul_p(p.x, p.x);
  U256 Bb = mul_p(p.y, p.y);
  U256 C = mul_p(Bb, Bb);
  U256 t = add_mod(p.x, Bb, P);
  U256 D = sub_mod(sub_mod(mul_p(t, t), A, P), C, P);
  D = add_mod(D, D, P);
  U256 E = add_mod(add_mod(A, A, P), A, P);
  U256 F = mul_p(E, E);
  U256 X3 = sub_mod(F, add_mod(D, D, P), P);
  U256 C8 = add_mod(C, C, P);
  C8 = add_mod(C8, C8, P);
  C8 = add_mod(C8, C8, P);
  U256 Y3 = sub_mod(mul_p(E, sub_mod(D, X3, P)), C8, P);
  U256 Z3 = mul_p(add_mod(p.y, p.y, P), p.z);
  return Pt{X3, Y3, Z3};
}

static Pt pt_add(const Pt &p, const Pt &q) {
  if (p.is_id()) return q;
  if (q.is_id()) return p;
  U256 Z1Z1 = mul_p(p.z, p.z);
  U256 Z2Z2 = mul_p(q.z, q.z);
  U256 U1 = mul_p(p.x, Z2Z2);
  U256 U2 = mul_p(q.x, Z1Z1);
  U256 S1 = mul_p(p.y, mul_p(q.z, Z2Z2));
  U256 S2 = mul_p(q.y, mul_p(p.z, Z1Z1));
  U256 H = sub_mod(U2, U1, P);
  U256 r = sub_mod(S2, S1, P);
  if (is_zero(H)) {
    if (is_zero(r)) return pt_double(p);
    return PT_ID;
  }
  U256 HH = mul_p(H, H);
  U256 HHH = mul_p(H, HH);
  U256 V = mul_p(U1, HH);
  U256 rr = mul_p(r, r);
  U256 X3 = sub_mod(sub_mod(rr, HHH, P), add_mod(V, V, P), P);
  U256 Y3 = sub_mod(mul_p(r, sub_mod(V, X3, P)), mul_p(S1, HHH), P);
  U256 Z3 = mul_p(mul_p(p.z, q.z), H);
  return Pt{X3, Y3, Z3};
}

static Pt pt_neg(const Pt &p) {
  if (p.is_id()) return p;
  return Pt{p.x, sub_mod(ZERO, p.y, P), p.z};
}

// 4-bit fixed-window scalar multiply (vartime)
static Pt pt_mul(const Pt &p, const U256 &k) {
  Pt tab[16];
  tab[0] = PT_ID;
  tab[1] = p;
  for (int i = 2; i < 16; ++i) tab[i] = pt_add(tab[i - 1], p);
  Pt acc = PT_ID;
  bool started = false;
  for (int w = 63; w >= 0; --w) {
    int word = w / 16, nib = w % 16;
    unsigned d = (unsigned)((k.w[word] >> (4 * nib)) & 15);
    if (started) {
      acc = pt_double(acc);
      acc = pt_double(acc);
      acc = pt_double(acc);
      acc = pt_double(acc);
    }
    if (d) {
      acc = started ? pt_add(acc, tab[d]) : tab[d];
      started = true;
    } else if (!started) {
      continue;
    }
  }
  return acc;
}

static bool pt_eq(const Pt &p, const Pt &q) {
  if (p.is_id() || q.is_id()) return p.is_id() == q.is_id();
  U256 Z1Z1 = mul_p(p.z, p.z);
  U256 Z2Z2 = mul_p(q.z, q.z);
  if (!(mul_p(p.x, Z2Z2) == mul_p(q.x, Z1Z1))) return false;
  return mul_p(p.y, mul_p(q.z, Z2Z2)) == mul_p(q.y, mul_p(p.z, Z1Z1));
}

static void pt_to_bytes(uint8_t out[33], const Pt &p) {
  if (p.is_id()) {
    std::memset(out, 0, 33);
    return;
  }
  U256 zi = inv_p(p.z);
  U256 zi2 = mul_p(zi, zi);
  U256 ax = mul_p(p.x, zi2);
  U256 ay = mul_p(p.y, mul_p(zi2, zi));
  out[0] = 0x02 | (uint8_t)(ay.w[0] & 1);
  u256_to_be(out + 1, ax);
}

static bool pt_from_bytes(Pt &out, const uint8_t in[33]) {
  bool all_zero = true;
  for (int i = 0; i < 33; ++i) all_zero &= (in[i] == 0);
  if (all_zero) {
    out = PT_ID;
    return true;
  }
  if (in[0] != 2 && in[0] != 3) return false;
  U256 x = u256_from_be(in + 1);
  if (cmp(x, P) >= 0) return false;
  U256 rhs = add_mod(mul_p(mul_p(x, x), x), B7, P);
  U256 y = sqrt_p(rhs);
  if (!(mul_p(y, y) == rhs)) return false;
  if ((y.w[0] & 1) != (in[0] & 1)) y = sub_mod(ZERO, y, P);
  out = Pt{x, y, ONE};
  return true;
}

// ---------------------------------------------------------------------
// Keccak-f[1600] + STROBE-128 + Merlin — mirrors oracle/{keccak,strobe,merlin}.py
// ---------------------------------------------------------------------

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int ROT[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

static inline uint64_t rotl64(uint64_t v, int n) {
  return n == 0 ? v : (v << n) | (v >> (64 - n));
}

static void f1600(uint8_t state[200]) {
  uint64_t a[25];
  for (int i = 0; i < 25; ++i) {
    uint64_t v = 0;
    for (int j = 0; j < 8; ++j) v |= (uint64_t)state[8 * i + j] << (8 * j);
    a[i] = v;
  }
  for (int rnd = 0; rnd < 24; ++rnd) {
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int i = 0; i < 25; ++i) a[i] ^= d[i % 5];
    uint64_t b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(a[x + 5 * y], ROT[x + 5 * y]);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        a[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    a[0] ^= RC[rnd];
  }
  for (int i = 0; i < 25; ++i)
    for (int j = 0; j < 8; ++j) state[8 * i + j] = (uint8_t)(a[i] >> (8 * j));
}

struct Strobe {
  uint8_t state[200];
  int pos = 0, pos_begin = 0;
  uint8_t cur_flags = 0;
  static const int R = 166;
  enum { FI = 1, FA = 2, FC = 4, FT = 8, FM = 16, FK = 32 };

  explicit Strobe(const uint8_t *label, size_t label_len) {
    std::memset(state, 0, 200);
    const uint8_t pre[6] = {1, R + 2, 1, 0, 1, 96};
    std::memcpy(state, pre, 6);
    std::memcpy(state + 6, "STROBEv1.0.2", 12);
    f1600(state);
    meta_ad(label, label_len, false);
  }

  void run_f() {
    state[pos] ^= (uint8_t)pos_begin;
    state[pos + 1] ^= 0x04;
    state[R + 1] ^= 0x80;
    f1600(state);
    pos = 0;
    pos_begin = 0;
  }
  void absorb(const uint8_t *d, size_t len) {
    for (size_t i = 0; i < len; ++i) {
      state[pos++] ^= d[i];
      if (pos == R) run_f();
    }
  }
  void squeeze(uint8_t *out, size_t len) {
    for (size_t i = 0; i < len; ++i) {
      out[i] = state[pos];
      state[pos++] = 0;
      if (pos == R) run_f();
    }
  }
  void begin_op(uint8_t flags, bool more) {
    if (more) return;
    uint8_t hdr[2] = {(uint8_t)pos_begin, flags};
    pos_begin = pos + 1;
    cur_flags = flags;
    absorb(hdr, 2);
    if ((flags & (FC | FK)) && pos != 0) run_f();
  }
  void meta_ad(const uint8_t *d, size_t len, bool more) {
    begin_op(FM | FA, more);
    absorb(d, len);
  }
  void ad(const uint8_t *d, size_t len, bool more) {
    begin_op(FA, more);
    absorb(d, len);
  }
  void prf(uint8_t *out, size_t len) {
    begin_op(FI | FA | FC, false);
    squeeze(out, len);
  }
};

struct Transcript {
  Strobe strobe;
  explicit Transcript(const uint8_t *label, size_t len)
      : strobe((const uint8_t *)"Merlin v1.0", 11) {
    append((const uint8_t *)"dom-sep", 7, label, len);
  }
  void append(const uint8_t *label, size_t llen, const uint8_t *msg,
              size_t mlen) {
    uint8_t len_le[4] = {(uint8_t)mlen, (uint8_t)(mlen >> 8),
                         (uint8_t)(mlen >> 16), (uint8_t)(mlen >> 24)};
    strobe.meta_ad(label, llen, false);
    strobe.meta_ad(len_le, 4, true);
    strobe.ad(msg, mlen, false);
  }
  void append_u64(const char *label, uint64_t x) {
    uint8_t le[8];
    for (int i = 0; i < 8; ++i) le[i] = (uint8_t)(x >> (8 * i));
    append((const uint8_t *)label, std::strlen(label), le, 8);
  }
  void app_point(const char *label, const Pt &p) {
    uint8_t buf[33];
    pt_to_bytes(buf, p);
    append((const uint8_t *)label, std::strlen(label), buf, 33);
  }
  U256 challenge(const char *label) {
    uint8_t len_le[4] = {32, 0, 0, 0};
    strobe.meta_ad((const uint8_t *)label, std::strlen(label), false);
    strobe.meta_ad(len_le, 4, true);
    uint8_t buf[32];
    strobe.prf(buf, 32);
    U256 v = u256_from_be(buf);
    while (cmp(v, N) >= 0) {
      U256 t;
      sub_raw(t, v, N);
      v = t;
    }
    return v;
  }
};

// ---------------------------------------------------------------------
// vector helpers (util.rs twins)
// ---------------------------------------------------------------------

using SVec = std::vector<U256>;
using PVec = std::vector<Pt>;

static U256 sv_mul(const SVec &a, const SVec &b) {
  size_t m = std::max(a.size(), b.size());
  U256 acc = ZERO;
  for (size_t i = 0; i < m; ++i) {
    U256 x = i < a.size() ? a[i] : ZERO;
    U256 y = i < b.size() ? b[i] : ZERO;
    acc = add_mod(acc, mul_n(x, y), N);
  }
  return acc;
}

static U256 sv_weight_mul(const SVec &a, const SVec &b, const U256 &w) {
  size_t m = std::max(a.size(), b.size());
  U256 acc = ZERO, e = ONE;
  for (size_t i = 0; i < m; ++i) {
    e = mul_n(e, w);
    U256 x = i < a.size() ? a[i] : ZERO;
    U256 y = i < b.size() ? b[i] : ZERO;
    acc = add_mod(acc, mul_n(mul_n(x, y), e), N);
  }
  return acc;
}

static SVec sv_add(const SVec &a, const SVec &b) {
  size_t m = std::max(a.size(), b.size());
  SVec r(m);
  for (size_t i = 0; i < m; ++i)
    r[i] = add_mod(i < a.size() ? a[i] : ZERO, i < b.size() ? b[i] : ZERO, N);
  return r;
}

static SVec sv_sub(const SVec &a, const SVec &b) {
  size_t m = std::max(a.size(), b.size());
  SVec r(m);
  for (size_t i = 0; i < m; ++i)
    r[i] = sub_mod(i < a.size() ? a[i] : ZERO, i < b.size() ? b[i] : ZERO, N);
  return r;
}

static SVec sv_scale(const SVec &a, const U256 &s) {
  SVec r(a.size());
  for (size_t i = 0; i < a.size(); ++i) r[i] = mul_n(a[i], s);
  return r;
}

static SVec e_powers(const U256 &v, size_t n) {
  SVec r(n);
  U256 buf = ONE;
  for (size_t i = 0; i < n; ++i) {
    r[i] = buf;
    buf = mul_n(buf, v);
  }
  return r;
}

static Pt pv_mul(const PVec &pts, const SVec &s) {
  size_t m = std::max(pts.size(), s.size());
  Pt acc = PT_ID;
  for (size_t i = 0; i < m; ++i) {
    if (i >= pts.size() || i >= s.size()) continue;  // extend-with-default
    acc = pt_add(acc, pt_mul(pts[i], s[i]));
  }
  return acc;
}

template <typename T>
static void reduce_vec(const std::vector<T> &v, std::vector<T> &even,
                       std::vector<T> &odd) {
  even.clear();
  odd.clear();
  for (size_t i = 0; i < v.size(); ++i)
    (i % 2 ? odd : even).push_back(v[i]);
}

// ---------------------------------------------------------------------
// WNLA (wnla.rs twin)
// ---------------------------------------------------------------------

struct WnlaProof {
  PVec r, x;
  SVec l, n;
};

struct Wnla {
  Pt g;
  PVec g_vec, h_vec;
  SVec c;
  U256 rho, mu;

  Pt commit(const SVec &l, const SVec &n) const {
    U256 v = add_mod(sv_mul(c, l), sv_weight_mul(n, n, mu), N);
    return pt_add(pt_mul(g, v), pt_add(pv_mul(h_vec, l), pv_mul(g_vec, n)));
  }

  Wnla fold(const U256 &y) const {
    SVec c0, c1;
    PVec g0, g1, h0, h1;
    reduce_vec(c, c0, c1);
    reduce_vec(g_vec, g0, g1);
    reduce_vec(h_vec, h0, h1);
    PVec h_(std::max(h0.size(), h1.size()));
    for (size_t i = 0; i < h_.size(); ++i) {
      Pt a = i < h0.size() ? h0[i] : PT_ID;
      Pt b = i < h1.size() ? pt_mul(h1[i], y) : PT_ID;
      h_[i] = pt_add(a, b);
    }
    PVec g_(std::max(g0.size(), g1.size()));
    for (size_t i = 0; i < g_.size(); ++i) {
      Pt a = i < g0.size() ? pt_mul(g0[i], rho) : PT_ID;
      Pt b = i < g1.size() ? pt_mul(g1[i], y) : PT_ID;
      g_[i] = pt_add(a, b);
    }
    SVec c_ = sv_add(c0, sv_scale(c1, y));
    return Wnla{g, g_, h_, c_, mu, mul_n(mu, mu)};
  }

  bool verify(const Pt &com, Transcript &t, WnlaProof proof) const {
    if (proof.x.size() != proof.r.size()) return false;
    if (proof.x.empty()) return pt_eq(com, commit(proof.l, proof.n));
    t.app_point("wnla_com", com);
    t.app_point("wnla_x", proof.x.back());
    t.app_point("wnla_r", proof.r.back());
    t.append_u64("l.sz", h_vec.size());
    t.append_u64("n.sz", g_vec.size());
    U256 y = t.challenge("wnla_challenge");
    Wnla w = fold(y);
    U256 y2m1 = sub_mod(mul_n(y, y), ONE, N);
    Pt com_ = pt_add(com, pt_add(pt_mul(proof.x.back(), y),
                                 pt_mul(proof.r.back(), y2m1)));
    proof.x.pop_back();
    proof.r.pop_back();
    return w.verify(com_, t, proof);
  }

  WnlaProof prove(const Pt &com, Transcript &t, SVec l, SVec n) const {
    if (l.size() + n.size() < 6) return WnlaProof{{}, {}, l, n};
    U256 rho_inv = inv_n(rho);
    SVec c0, c1, l0, l1, n0, n1;
    PVec g0, g1, h0, h1;
    reduce_vec(c, c0, c1);
    reduce_vec(l, l0, l1);
    reduce_vec(n, n0, n1);
    reduce_vec(g_vec, g0, g1);
    reduce_vec(h_vec, h0, h1);
    U256 mu2 = mul_n(mu, mu);
    U256 two{{2, 0, 0, 0}};

    U256 vx = add_mod(
        mul_n(sv_weight_mul(n0, n1, mu2), mul_n(rho_inv, two)),
        add_mod(sv_mul(c0, l1), sv_mul(c1, l0), N), N);
    U256 vr = add_mod(sv_weight_mul(n1, n1, mu2), sv_mul(c1, l1), N);

    Pt x_pt = pt_add(
        pt_mul(g, vx),
        pt_add(pt_add(pv_mul(h0, l1), pv_mul(h1, l0)),
               pt_add(pv_mul(g0, sv_scale(n1, rho)),
                      pv_mul(g1, sv_scale(n0, rho_inv)))));
    Pt r_pt = pt_add(pt_mul(g, vr), pt_add(pv_mul(h1, l1), pv_mul(g1, n1)));

    t.app_point("wnla_com", com);
    t.app_point("wnla_x", x_pt);
    t.app_point("wnla_r", r_pt);
    t.append_u64("l.sz", l.size());
    t.append_u64("n.sz", n.size());
    U256 y = t.challenge("wnla_challenge");

    Wnla w = fold(y);
    SVec l_ = sv_add(l0, sv_scale(l1, y));
    SVec n_ = sv_add(sv_scale(n0, rho_inv), sv_scale(n1, y));
    WnlaProof proof = w.prove(w.commit(l_, n_), t, l_, n_);
    proof.r.push_back(r_pt);
    proof.x.push_back(x_pt);
    return proof;
  }
};

// ---------------------------------------------------------------------
// arithmetic circuit (circuit.rs twin)
// ---------------------------------------------------------------------

enum class PartType { LO, LL, LR, NO };

struct CircuitProof {
  Pt c_l, c_r, c_o, c_s;
  PVec r, x;
  SVec l, n;
};

struct Witness {
  std::vector<SVec> v;
  SVec s_v;
  SVec w_l, w_r, w_o;
};

struct Circuit {
  size_t dim_nm, dim_no, k, dim_nl, dim_nv, dim_nw;
  Pt g;
  PVec g_vec, h_vec;
  std::vector<SVec> W_m, W_l;  // rows
  SVec a_m, a_l;
  bool f_l, f_m;
  PVec g_vec_, h_vec_;
  // partition: returns -1 for none
  int (*partition)(const void *ctx, PartType, size_t);
  const void *part_ctx;

  int part(PartType t, size_t j) const { return partition(part_ctx, t, j); }

  U256 lin_coef(size_t i, const U256 &lam, const U256 &mu) const {
    U256 coef = ZERO;
    if (f_l) coef = add_mod(coef, pow_mod_n_small(lam, dim_nv * i), N);
    if (f_m) coef = add_mod(coef, pow_mod_n_small(mu, dim_nv * i + 1), N);
    return coef;
  }

  static U256 pow_mod_n_small(const U256 &x, size_t e) {
    U256 acc = ONE, base = x;
    while (e) {
      if (e & 1) acc = mul_n(acc, base);
      base = mul_n(base, base);
      e >>= 1;
    }
    return acc;
  }

  SVec collect_cl0(const U256 &lam, const U256 &mu) const {
    SVec c_l0(dim_nv - 1, ZERO);
    if (f_l) {
      SVec e = e_powers(lam, dim_nv);
      c_l0.assign(e.begin() + 1, e.end());
    }
    if (f_m) {
      SVec e = e_powers(mu, dim_nv);
      SVec tail(e.begin() + 1, e.end());
      c_l0 = sv_sub(c_l0, sv_scale(tail, mu));
    }
    return c_l0;
  }

  SVec collect_lambda(const U256 &lam, const U256 &mu) const {
    SVec lv = e_powers(lam, dim_nl);
    if (f_l && f_m) {
      SVec t1 = tensor(sv_scale(e_powers(lam, dim_nv), mu),
                       e_powers(pow_mod_n_small(mu, dim_nv), k));
      SVec t2 = tensor(e_powers(mu, dim_nv),
                       e_powers(pow_mod_n_small(lam, dim_nv), k));
      lv = sv_sub(lv, sv_add(t1, t2));
    }
    return lv;
  }

  static SVec tensor(const SVec &a, const SVec &b) {
    SVec r;
    r.reserve(a.size() * b.size());
    for (const auto &y : b)
      for (const auto &x : a) r.push_back(mul_n(x, y));
    return r;
  }

  static SVec vec_mat(const SVec &a, const std::vector<SVec> &m, size_t cols) {
    SVec r(cols, ZERO);
    for (size_t j = 0; j < cols; ++j) {
      U256 acc = ZERO;
      for (size_t i = 0; i < m.size() && i < a.size(); ++i)
        acc = add_mod(acc, mul_n(a[i], m[i][j]), N);
      r[j] = acc;
    }
    return r;
  }

  void collect_c(const SVec &lambda_vec, const SVec &mu_vec, const U256 &mu,
                 SVec out[6]) const {
    // slices
    auto slice = [&](const std::vector<SVec> &W, size_t lo, size_t hi) {
      std::vector<SVec> r;
      r.reserve(W.size());
      for (const auto &row : W) r.emplace_back(row.begin() + lo, row.begin() + hi);
      return r;
    };
    auto W_lnL = slice(W_l, 0, dim_nm), W_mnL = slice(W_m, 0, dim_nm);
    auto W_lnR = slice(W_l, dim_nm, 2 * dim_nm),
         W_mnR = slice(W_m, dim_nm, 2 * dim_nm);
    auto W_lO = slice(W_l, 2 * dim_nm, dim_nw),
         W_mO = slice(W_m, 2 * dim_nm, dim_nw);

    auto map_cols = [&](const std::vector<SVec> &W, PartType t, size_t size) {
      std::vector<SVec> r(W.size(), SVec(size, ZERO));
      for (size_t i = 0; i < W.size(); ++i)
        for (size_t j = 0; j < size; ++j) {
          int j_ = part(t, j);
          if (j_ >= 0) r[i][j] = W[i][j_];
        }
      return r;
    };
    auto M_lnO = map_cols(W_lO, PartType::NO, dim_nm);
    auto M_llL = map_cols(W_lO, PartType::LL, dim_nv);
    auto M_llR = map_cols(W_lO, PartType::LR, dim_nv);
    auto M_llO = map_cols(W_lO, PartType::LO, dim_nv);
    auto M_mnO = map_cols(W_mO, PartType::NO, dim_nm);
    auto M_mlL = map_cols(W_mO, PartType::LL, dim_nv);
    auto M_mlR = map_cols(W_mO, PartType::LR, dim_nv);
    auto M_mlO = map_cols(W_mO, PartType::LO, dim_nv);
    (void)M_mlR;
    (void)M_llR;

    U256 mu_i = inv_n(mu);
    SVec mu_inv_pows(dim_nm);
    U256 cur = ONE;
    for (size_t i = 0; i < dim_nm; ++i) {
      cur = mul_n(cur, mu_i);
      mu_inv_pows[i] = cur;
    }
    auto lam_minus_mu = [&](const std::vector<SVec> &Ml,
                            const std::vector<SVec> &Mm, size_t cols) {
      return sv_sub(vec_mat(lambda_vec, Ml, cols), vec_mat(mu_vec, Mm, cols));
    };
    auto had = [&](SVec v) {
      for (size_t i = 0; i < v.size(); ++i) v[i] = mul_n(v[i], mu_inv_pows[i]);
      return v;
    };
    out[0] = had(lam_minus_mu(W_lnL, W_mnL, dim_nm));          // c_nL
    out[1] = had(lam_minus_mu(W_lnR, W_mnR, dim_nm));          // c_nR
    out[2] = had(lam_minus_mu(M_lnO, M_mnO, dim_nm));          // c_nO
    out[3] = lam_minus_mu(M_llL, M_mlL, dim_nv);               // c_lL
    out[4] = lam_minus_mu(map_cols(W_lO, PartType::LR, dim_nv),
                          map_cols(W_mO, PartType::LR, dim_nv), dim_nv);  // c_lR
    out[5] = lam_minus_mu(M_llO, M_mlO, dim_nv);               // c_lO
  }

  Pt commit(const SVec &v, const U256 &s) const {
    SVec tail(v.begin() + 1, v.end());
    PVec htail(h_vec.begin() + 9, h_vec.end());
    return pt_add(pt_mul(g, v[0]),
                  pt_add(pt_mul(h_vec[0], s), pv_mul(htail, tail)));
  }

  static SVec cr_tau_vec(const U256 &tau, const U256 &tau_inv,
                         const U256 &tau2, const U256 &tau3, const U256 &beta) {
    SVec r(9);
    r[0] = ONE;
    r[1] = mul_n(tau_inv, beta);
    r[2] = mul_n(tau, beta);
    r[3] = mul_n(tau2, beta);
    r[4] = mul_n(tau3, beta);
    r[5] = mul_n(mul_n(tau, tau3), beta);
    r[6] = mul_n(mul_n(tau2, tau3), beta);
    r[7] = mul_n(mul_n(tau3, tau3), beta);
    r[8] = mul_n(mul_n(mul_n(tau3, tau3), tau), beta);
    return r;
  }

  bool verify(const PVec &v, Transcript &t, const CircuitProof &proof) const {
    t.app_point("commitment_cl", proof.c_l);
    t.app_point("commitment_cr", proof.c_r);
    t.app_point("commitment_co", proof.c_o);
    for (const auto &vv : v) t.app_point("commitment_v", vv);

    U256 rho = t.challenge("circuit_rho");
    U256 lam = t.challenge("circuit_lambda");
    U256 beta = t.challenge("circuit_beta");
    U256 delta = t.challenge("circuit_delta");
    U256 mu = mul_n(rho, rho);

    SVec lambda_vec = collect_lambda(lam, mu);
    SVec mu_vec = sv_scale(e_powers(mu, dim_nm), mu);
    SVec c6[6];
    collect_c(lambda_vec, mu_vec, mu, c6);
    SVec &c_nL = c6[0], &c_nR = c6[1], &c_nO = c6[2], &c_lL = c6[3],
         &c_lR = c6[4], &c_lO = c6[5];

    Pt v_ = PT_ID;
    for (size_t i = 0; i < k; ++i)
      v_ = pt_add(v_, pt_mul(v[i], lin_coef(i, lam, mu)));
    U256 two{{2, 0, 0, 0}};
    v_ = pt_mul(v_, two);

    t.app_point("commitment_cs", proof.c_s);
    U256 tau = t.challenge("circuit_tau");
    U256 tau_inv = inv_n(tau);
    U256 tau2 = mul_n(tau, tau);
    U256 tau3 = mul_n(tau2, tau);
    U256 delta_inv = inv_n(delta);

    SVec pn = sv_scale(c_nO, mul_n(tau3, delta_inv));
    pn = sv_sub(pn, sv_scale(c_nL, tau2));
    pn = sv_add(pn, sv_scale(c_nR, tau));

    U256 ps = add_mod(
        sv_weight_mul(pn, pn, mu),
        sub_mod(mul_n(mul_n(sv_mul(lambda_vec, a_l), tau3), two),
                mul_n(mul_n(sv_mul(mu_vec, a_m), tau3), two), N),
        N);

    Pt pt = pt_add(pt_mul(g, ps), pv_mul(g_vec, pn));
    SVec cr = cr_tau_vec(tau, tau_inv, tau2, tau3, beta);
    SVec c_l0 = collect_cl0(lam, mu);
    SVec cl = sv_scale(c_lO, mul_n(tau3, delta_inv));
    cl = sv_sub(cl, sv_scale(c_lL, tau2));
    cl = sv_add(cl, sv_scale(c_lR, tau));
    cl = sv_scale(cl, two);
    cl = sv_sub(cl, c_l0);

    SVec c_full = cr;
    c_full.insert(c_full.end(), cl.begin(), cl.end());
    size_t full_h = h_vec.size() + h_vec_.size();
    while (c_full.size() < full_h) c_full.push_back(ZERO);

    Pt com = pt_add(
        pt,
        pt_add(
            pt_add(pt_mul(proof.c_s, tau_inv),
                   pt_neg(pt_mul(proof.c_o, delta))),
            pt_add(pt_add(pt_mul(proof.c_l, tau),
                          pt_neg(pt_mul(proof.c_r, tau2))),
                   pt_mul(v_, tau3))));

    PVec gfull = g_vec;
    gfull.insert(gfull.end(), g_vec_.begin(), g_vec_.end());
    PVec hfull = h_vec;
    hfull.insert(hfull.end(), h_vec_.begin(), h_vec_.end());
    Wnla w{g, gfull, hfull, c_full, rho, mu};
    return w.verify(com, t, WnlaProof{proof.r, proof.x, proof.l, proof.n});
  }

  CircuitProof prove(const PVec &v, const Witness &wit, Transcript &t,
                     const SVec &blind) const {
    size_t bi = 0;
    auto draw = [&]() { return blind.at(bi++); };
    SVec ro(9, ZERO), rl(9, ZERO), rr(9, ZERO);
    for (int j : {0, 1, 2, 3, 5, 6, 7}) ro[j] = draw();
    for (int j : {0, 1, 2, 4, 5, 6}) rl[j] = draw();
    for (int j : {0, 1, 3, 4, 5}) rr[j] = draw();

    SVec nl = wit.w_l, nr = wit.w_r;
    auto part_vec = [&](PartType typ, size_t size) {
      SVec r(size, ZERO);
      for (size_t j = 0; j < size; ++j) {
        int i = part(typ, j);
        if (i >= 0) r[j] = wit.w_o[i];
      }
      return r;
    };
    SVec no = part_vec(PartType::NO, dim_nm);
    SVec lo = part_vec(PartType::LO, dim_nv);
    SVec ll = part_vec(PartType::LL, dim_nv);
    SVec lr = part_vec(PartType::LR, dim_nv);

    auto commit_cx = [&](const SVec &r_, const SVec &l_, const SVec &n_) {
      SVec rl_cat = r_;
      rl_cat.insert(rl_cat.end(), l_.begin(), l_.end());
      return pt_add(pv_mul(h_vec, rl_cat), pv_mul(g_vec, n_));
    };
    Pt co = commit_cx(ro, lo, no);
    Pt cl = commit_cx(rl, ll, nl);
    Pt cr = commit_cx(rr, lr, nr);

    t.app_point("commitment_cl", cl);
    t.app_point("commitment_cr", cr);
    t.app_point("commitment_co", co);
    for (const auto &vv : v) t.app_point("commitment_v", vv);

    U256 rho = t.challenge("circuit_rho");
    U256 lam = t.challenge("circuit_lambda");
    U256 beta = t.challenge("circuit_beta");
    U256 delta = t.challenge("circuit_delta");
    U256 mu = mul_n(rho, rho);
    U256 two{{2, 0, 0, 0}};

    SVec lambda_vec = collect_lambda(lam, mu);
    SVec mu_vec = sv_scale(e_powers(mu, dim_nm), mu);
    SVec c6[6];
    collect_c(lambda_vec, mu_vec, mu, c6);
    SVec &c_nL = c6[0], &c_nR = c6[1], &c_nO = c6[2], &c_lL = c6[3],
         &c_lR = c6[4], &c_lO = c6[5];

    SVec ls(dim_nv), ns(dim_nm);
    for (auto &x : ls) x = draw();
    for (auto &x : ns) x = draw();

    U256 v_0 = ZERO;
    for (size_t i = 0; i < k; ++i)
      v_0 = add_mod(v_0, mul_n(wit.v[i][0], lin_coef(i, lam, mu)), N);
    v_0 = mul_n(v_0, two);

    SVec rv(9, ZERO);
    for (size_t i = 0; i < k; ++i)
      rv[0] = add_mod(rv[0], mul_n(wit.s_v[i], lin_coef(i, lam, mu)), N);
    rv[0] = mul_n(rv[0], two);

    SVec v_1(dim_nv - 1, ZERO);
    for (size_t i = 0; i < k; ++i) {
      SVec tail(wit.v[i].begin() + 1, wit.v[i].end());
      v_1 = sv_add(v_1, sv_scale(tail, lin_coef(i, lam, mu)));
    }
    v_1 = sv_scale(v_1, two);

    SVec c_l0 = collect_cl0(lam, mu);
    U256 delta2 = mul_n(delta, delta);
    U256 delta_inv = inv_n(delta);
    SVec nl_cnr = sv_add(nl, c_nR);
    SVec nr_cnl = sv_add(nr, c_nL);

    U256 f_[8];
    f_[0] = sub_mod(ZERO, sv_weight_mul(ns, ns, mu), N);
    f_[1] = add_mod(sv_mul(c_l0, ls),
                    mul_n(mul_n(delta, two), sv_weight_mul(ns, no, mu)), N);
    f_[2] = sub_mod(
        sub_mod(sub_mod(sub_mod(ZERO, mul_n(sv_mul(c_lR, ls), two), N),
                        mul_n(sv_mul(c_l0, lo), delta), N),
                mul_n(sv_weight_mul(ns, nl_cnr, mu), two), N),
        mul_n(sv_weight_mul(no, no, mu), delta2), N);
    f_[3] = add_mod(
        add_mod(add_mod(mul_n(sv_mul(c_lL, ls), two),
                        mul_n(mul_n(sv_mul(c_lR, lo), delta), two), N),
                add_mod(sv_mul(c_l0, ll),
                        mul_n(sv_weight_mul(ns, nr_cnl, mu), two), N), N),
        mul_n(mul_n(sv_weight_mul(no, nl_cnr, mu), two), delta), N);
    f_[4] = sub_mod(
        sub_mod(
            sub_mod(
                sub_mod(sv_weight_mul(c_nR, c_nR, mu),
                        mul_n(mul_n(sv_mul(c_lO, ls), delta_inv), two), N),
                add_mod(mul_n(mul_n(sv_mul(c_lL, lo), delta), two),
                        add_mod(mul_n(sv_mul(c_lR, ll), two),
                                sv_mul(c_l0, lr), N), N), N),
            add_mod(mul_n(mul_n(sv_weight_mul(ns, c_nO, mu), delta_inv), two),
                    mul_n(mul_n(sv_weight_mul(no, nr_cnl, mu), delta), two),
                    N), N),
        sv_weight_mul(nl_cnr, nl_cnr, mu), N);
    f_[5] = sub_mod(
        sub_mod(
            sub_mod(
                add_mod(mul_n(mul_n(sv_weight_mul(c_nO, c_nR, mu), delta_inv),
                              two),
                        sv_weight_mul(c_nL, c_nL, mu), N),
                add_mod(mul_n(mul_n(sv_mul(c_lO, ll), delta_inv), two),
                        add_mod(mul_n(sv_mul(c_lL, lr), two),
                                mul_n(sv_mul(c_lR, v_1), two), N), N), N),
            mul_n(mul_n(sv_weight_mul(nl_cnr, c_nO, mu), delta_inv), two), N),
        sv_weight_mul(nr_cnl, nr_cnl, mu), N);
    f_[6] = add_mod(
        add_mod(
            sub_mod(ZERO,
                    mul_n(mul_n(sv_weight_mul(c_nO, c_nL, mu), delta_inv),
                          two), N),
            add_mod(mul_n(mul_n(sv_mul(c_nO, lr), delta_inv), two),
                    mul_n(sv_mul(c_lL, v_1), two), N), N),
        mul_n(mul_n(sv_weight_mul(nr_cnl, c_nO, mu), delta_inv), two), N);
    f_[7] = sub_mod(ZERO, mul_n(mul_n(sv_mul(c_lO, v_1), delta_inv), two), N);

    U256 beta_inv = inv_n(beta);
    SVec rs(9);
    rs[0] = add_mod(f_[1], mul_n(mul_n(ro[1], delta), beta), N);
    rs[1] = mul_n(f_[0], beta_inv);
    rs[2] = sub_mod(mul_n(add_mod(mul_n(ro[0], delta), f_[2], N), beta_inv),
                    rl[1], N);
    rs[3] = add_mod(mul_n(sub_mod(f_[3], rl[0], N), beta_inv),
                    add_mod(mul_n(ro[2], delta), rr[1], N), N);
    rs[4] = add_mod(mul_n(add_mod(f_[4], rr[0], N), beta_inv),
                    sub_mod(mul_n(ro[3], delta), rl[2], N), N);
    rs[5] = sub_mod(ZERO, mul_n(rv[0], beta_inv), N);
    rs[6] = add_mod(add_mod(mul_n(f_[5], beta_inv), mul_n(ro[5], delta), N),
                    sub_mod(rr[3], rl[4], N), N);
    rs[7] = add_mod(add_mod(mul_n(f_[6], beta_inv), rr[4], N),
                    sub_mod(mul_n(ro[6], delta), rl[5], N), N);
    rs[8] = add_mod(add_mod(mul_n(f_[7], beta_inv), mul_n(ro[7], delta), N),
                    sub_mod(rr[5], rl[6], N), N);

    Pt cs = commit_cx(rs, ls, ns);
    t.app_point("commitment_cs", cs);

    U256 tau = t.challenge("circuit_tau");
    U256 tau_inv = inv_n(tau);
    U256 tau2 = mul_n(tau, tau);
    U256 tau3 = mul_n(tau2, tau);

    auto cat = [](const SVec &a, const SVec &b) {
      SVec r = a;
      r.insert(r.end(), b.begin(), b.end());
      return r;
    };
    SVec l_vec = sv_scale(cat(rs, ls), tau_inv);
    l_vec = sv_sub(l_vec, sv_scale(cat(ro, lo), delta));
    l_vec = sv_add(l_vec, sv_scale(cat(rl, ll), tau));
    l_vec = sv_sub(l_vec, sv_scale(cat(rr, lr), tau2));
    l_vec = sv_add(l_vec, sv_scale(cat(rv, v_1), tau3));

    SVec pn = sv_scale(c_nO, mul_n(tau3, delta_inv));
    pn = sv_sub(pn, sv_scale(c_nL, tau2));
    pn = sv_add(pn, sv_scale(c_nR, tau));

    U256 ps = add_mod(
        sv_weight_mul(pn, pn, mu),
        sub_mod(mul_n(mul_n(sv_mul(lambda_vec, a_l), tau3), two),
                mul_n(mul_n(sv_mul(mu_vec, a_m), tau3), two), N),
        N);

    SVec n_tau = sv_scale(ns, tau_inv);
    n_tau = sv_sub(n_tau, sv_scale(no, delta));
    n_tau = sv_add(n_tau, sv_scale(nl, tau));
    n_tau = sv_sub(n_tau, sv_scale(nr, tau2));
    SVec n_vec = sv_add(pn, n_tau);

    SVec cr_t = cr_tau_vec(tau, tau_inv, tau2, tau3, beta);
    SVec cl_t = sv_scale(c_lO, mul_n(tau3, delta_inv));
    cl_t = sv_sub(cl_t, sv_scale(c_lL, tau2));
    cl_t = sv_add(cl_t, sv_scale(c_lR, tau));
    cl_t = sv_scale(cl_t, two);
    cl_t = sv_sub(cl_t, c_l0);
    SVec c_full = cat(cr_t, cl_t);

    U256 v_scalar = add_mod(ps, mul_n(tau3, v_0), N);
    Pt com = pt_add(pt_mul(g, v_scalar),
                    pt_add(pv_mul(h_vec, l_vec), pv_mul(g_vec, n_vec)));

    size_t full_h = h_vec.size() + h_vec_.size();
    while (l_vec.size() < full_h) {
      l_vec.push_back(ZERO);
      c_full.push_back(ZERO);
    }
    size_t full_g = g_vec.size() + g_vec_.size();
    while (n_vec.size() < full_g) n_vec.push_back(ZERO);

    PVec gfull = g_vec;
    gfull.insert(gfull.end(), g_vec_.begin(), g_vec_.end());
    PVec hfull = h_vec;
    hfull.insert(hfull.end(), h_vec_.begin(), h_vec_.end());
    Wnla w{g, gfull, hfull, c_full, rho, mu};
    WnlaProof wp = w.prove(com, t, l_vec, n_vec);
    return CircuitProof{cl, cr, co, cs, wp.r, wp.x, wp.l, wp.n};
  }
};

// ---------------------------------------------------------------------
// reciprocal + u64 (range_proof/*.rs twins)
// ---------------------------------------------------------------------

static int u64_partition(const void *, PartType t, size_t j) {
  if (t == PartType::LL && j < 16) return (int)j;
  return -1;
}

struct U64Proto {
  Pt g;
  PVec g_vec;  // 16
  PVec h_vec;  // 32

  Circuit make_circuit(const U256 &e) const {
    const size_t nm = 16, np_ = 16, nv = 17, nl = 17, nw = 48;
    Circuit c;
    c.dim_nm = nm;
    c.dim_no = np_;
    c.k = 1;
    c.dim_nl = nl;
    c.dim_nv = nv;
    c.dim_nw = nw;
    c.g = g;
    c.g_vec = g_vec;
    c.h_vec = PVec(h_vec.begin(), h_vec.begin() + 26);
    c.g_vec_ = {};
    c.h_vec_ = PVec(h_vec.begin() + 26, h_vec.end());
    c.f_l = true;
    c.f_m = false;
    c.partition = u64_partition;
    c.part_ctx = nullptr;
    c.a_m.assign(nm, ONE);
    c.a_l.assign(nl, ZERO);
    c.W_m.assign(nm, SVec(nw, ZERO));
    U256 neg_e = sub_mod(ZERO, e, N);
    for (size_t i = 0; i < nm; ++i) c.W_m[i][nm + i] = neg_e;
    c.W_l.assign(nl, SVec(nw, ZERO));
    U256 base{{16, 0, 0, 0}};
    U256 p = ONE;
    for (size_t i = 0; i < nm; ++i) {
      c.W_l[0][i] = sub_mod(ZERO, p, N);
      p = mul_n(p, base);
    }
    for (size_t i = 0; i < nm; ++i)
      for (size_t j = 0; j < nm; ++j)
        c.W_l[i + 1][j + nm] = (i == j) ? ZERO : ONE;
    for (size_t j = 0; j < np_; ++j) {
      U256 ej = e;
      U256 jj{{(uint64_t)j, 0, 0, 0}};
      ej = add_mod(ej, jj, N);
      U256 inv = sub_mod(ZERO, inv_n(ej), N);
      for (size_t i = 0; i < nm; ++i) c.W_l[i + 1][j + 2 * nm] = inv;
    }
    return c;
  }

  Pt commit_value(uint64_t x, const U256 &s) const {
    U256 xv{{x, 0, 0, 0}};
    return pt_add(pt_mul(g, xv), pt_mul(h_vec[0], s));
  }

  Pt commit_poles(const SVec &r, const U256 &s) const {
    PVec tail(h_vec.begin() + 9, h_vec.begin() + 26);
    return pt_add(pt_mul(h_vec[0], s), pv_mul(tail, r));
  }

  // proof wire layout (525 bytes):
  //   c_l c_r c_o c_s r_poles (5 x 33) | x[4] innermost-first (4 x 33) |
  //   r[4] innermost-first (4 x 33) | l[2] (2 x 32) | n[1] (32)
  bool prove(uint64_t x, const U256 &s, Transcript &t, const SVec &blind,
             uint8_t out[525]) const {
    t.app_point("reciprocal_commitment", commit_value(x, s));
    U256 e = t.challenge("reciprocal_challenge");

    SVec digits(16), m(16, ZERO), r(16);
    uint64_t xv = x;
    uint64_t counts[16] = {0};
    for (int i = 0; i < 16; ++i) {
      uint64_t d = (x >> (4 * i)) & 15;
      digits[i] = U256{{d, 0, 0, 0}};
      counts[d]++;
    }
    (void)xv;
    for (int i = 0; i < 16; ++i) m[i] = U256{{counts[i], 0, 0, 0}};
    for (int i = 0; i < 16; ++i) r[i] = inv_n(add_mod(digits[i], e, N));

    size_t bi = 0;
    U256 r_blind = blind.at(bi++);
    Pt r_com = commit_poles(r, r_blind);

    Circuit c = make_circuit(e);
    SVec v = digits;  // placeholder; real v = [x] + r
    v.clear();
    v.push_back(U256{{x, 0, 0, 0}});
    v.insert(v.end(), r.begin(), r.end());
    U256 s_v = add_mod(s, r_blind, N);
    Pt cc = c.commit(v, s_v);

    Witness wit;
    wit.v = {v};
    wit.s_v = {s_v};
    wit.w_l = digits;
    wit.w_r = r;
    wit.w_o = m;
    SVec cblind(blind.begin() + 1, blind.end());
    CircuitProof cp = c.prove({cc}, wit, t, cblind);

    if (cp.r.size() != 4 || cp.x.size() != 4 || cp.l.size() != 2 ||
        cp.n.size() != 1)
      return false;
    uint8_t *o = out;
    pt_to_bytes(o, cp.c_l); o += 33;
    pt_to_bytes(o, cp.c_r); o += 33;
    pt_to_bytes(o, cp.c_o); o += 33;
    pt_to_bytes(o, cp.c_s); o += 33;
    pt_to_bytes(o, r_com); o += 33;
    for (int i = 0; i < 4; ++i) { pt_to_bytes(o, cp.x[i]); o += 33; }
    for (int i = 0; i < 4; ++i) { pt_to_bytes(o, cp.r[i]); o += 33; }
    u256_to_be(o, cp.l[0]); o += 32;
    u256_to_be(o, cp.l[1]); o += 32;
    u256_to_be(o, cp.n[0]); o += 32;
    return true;
  }

  bool verify(const uint8_t v_bytes[33], Transcript &t,
              const uint8_t proof[525]) const {
    Pt V;
    if (!pt_from_bytes(V, v_bytes)) return false;
    const uint8_t *i = proof;
    CircuitProof cp;
    Pt r_com;
    if (!pt_from_bytes(cp.c_l, i)) return false; i += 33;
    if (!pt_from_bytes(cp.c_r, i)) return false; i += 33;
    if (!pt_from_bytes(cp.c_o, i)) return false; i += 33;
    if (!pt_from_bytes(cp.c_s, i)) return false; i += 33;
    if (!pt_from_bytes(r_com, i)) return false; i += 33;
    cp.x.resize(4);
    cp.r.resize(4);
    for (int j = 0; j < 4; ++j) {
      if (!pt_from_bytes(cp.x[j], i)) return false;
      i += 33;
    }
    for (int j = 0; j < 4; ++j) {
      if (!pt_from_bytes(cp.r[j], i)) return false;
      i += 33;
    }
    cp.l.resize(2);
    cp.n.resize(1);
    cp.l[0] = u256_from_be(i); i += 32;
    cp.l[1] = u256_from_be(i); i += 32;
    cp.n[0] = u256_from_be(i);
    if (cmp(cp.l[0], N) >= 0 || cmp(cp.l[1], N) >= 0 || cmp(cp.n[0], N) >= 0)
      return false;

    t.app_point("reciprocal_commitment", V);
    U256 e = t.challenge("reciprocal_challenge");
    Circuit c = make_circuit(e);
    Pt cc = pt_add(V, r_com);
    return c.verify({cc}, t, cp);
  }
};

}  // namespace bppp

// ---------------------------------------------------------------------
// C ABI (ctypes surface)
// ---------------------------------------------------------------------

using namespace bppp;

static void read_points(PVec &out, const uint8_t *buf, size_t n) {
  out.resize(n);
  for (size_t i = 0; i < n; ++i) {
    if (!pt_from_bytes(out[i], buf + 33 * i))
      throw std::runtime_error("bad point");
  }
}

extern "C" {

// label: transcript label; generators as SEC1 bytes; s/blind as BE scalars.
// Returns 0 on success.
int bppp_u64_prove(const uint8_t *label, uint32_t label_len,
                   const uint8_t *g, const uint8_t *g_vec,
                   const uint8_t *h_vec, uint64_t x, const uint8_t *s,
                   const uint8_t *blind /* 52 * 32 bytes */,
                   uint8_t *out_proof /* 525 */,
                   uint8_t *out_commitment /* 33 */) {
  try {
    U64Proto proto;
    if (!pt_from_bytes(proto.g, g)) return 1;
    read_points(proto.g_vec, g_vec, 16);
    read_points(proto.h_vec, h_vec, 32);
    U256 sv = u256_from_be(s);
    SVec bl(52);
    for (int i = 0; i < 52; ++i) bl[i] = u256_from_be(blind + 32 * i);
    Transcript t(label, label_len);
    Pt V = proto.commit_value(x, sv);
    pt_to_bytes(out_commitment, V);
    return proto.prove(x, sv, t, bl, out_proof) ? 0 : 2;
  } catch (...) {
    return 3;
  }
}

int bppp_u64_verify(const uint8_t *label, uint32_t label_len,
                    const uint8_t *g, const uint8_t *g_vec,
                    const uint8_t *h_vec, const uint8_t *v_commitment,
                    const uint8_t *proof /* 525 */) {
  try {
    U64Proto proto;
    if (!pt_from_bytes(proto.g, g)) return 0;
    read_points(proto.g_vec, g_vec, 16);
    read_points(proto.h_vec, h_vec, 32);
    Transcript t(label, label_len);
    return proto.verify(v_commitment, t, proof) ? 1 : 0;
  } catch (...) {
    return 0;
  }
}

// Merlin transcript probe (cross-check vs oracle): absorb one message,
// emit one 32-byte challenge.
void bppp_merlin_probe(const uint8_t *label, uint32_t label_len,
                       const uint8_t *msg_label, uint32_t msg_label_len,
                       const uint8_t *msg, uint32_t msg_len,
                       const uint8_t *ch_label, uint32_t ch_label_len,
                       uint8_t *out32) {
  Transcript t(label, label_len);
  t.append(msg_label, msg_label_len, msg, msg_len);
  uint8_t len_le[4] = {32, 0, 0, 0};
  t.strobe.meta_ad(ch_label, ch_label_len, false);
  t.strobe.meta_ad(len_le, 4, true);
  t.strobe.prf(out32, 32);
}

// Field op probes for unit tests
void bppp_fn_mul(const uint8_t *a, const uint8_t *b, uint8_t *out) {
  U256 r = mul_n(u256_from_be(a), u256_from_be(b));
  u256_to_be(out, r);
}
void bppp_fp_mul(const uint8_t *a, const uint8_t *b, uint8_t *out) {
  U256 r = mul_p(u256_from_be(a), u256_from_be(b));
  u256_to_be(out, r);
}
void bppp_fn_inv(const uint8_t *a, uint8_t *out) {
  u256_to_be(out, inv_n(u256_from_be(a)));
}
void bppp_pt_mul(const uint8_t *p, const uint8_t *k, uint8_t *out) {
  Pt pt;
  if (!pt_from_bytes(pt, p)) {
    std::memset(out, 0xFF, 33);
    return;
  }
  pt_to_bytes(out, pt_mul(pt, u256_from_be(k)));
}

}  // extern "C"
