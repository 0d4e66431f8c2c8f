// Native host-side kernels for the TPU-FHE framework (client/keygen path).
//
// Role parity: the reference's entire runtime is C++ (OpenFHE); in this
// framework the TPU executes the homomorphic ops, while the host-side
// client operations - key generation NTTs over dozens of primes, and the
// Garner mixed-radix CRT used by decode - run natively here (numpy is the
// fallback, ~10x slower at ring 2^16+).
//
// Build: g++ -O3 -march=native -shared -fPIC fhe_host.cpp -o libfhehost.so
// Loaded via ctypes (fhe_sorting_tpu/core/native.py); no pybind11 needed.

#include <cstdint>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

static inline u64 mulmod(u64 a, u64 b, u64 p) {
    return (u64)(((u128)a * b) % p);
}

extern "C" {

// In-place forward negacyclic NTT (Cooley-Tukey, natural -> bit-reversed)
// for `batch` rows of length n.  psi_rev: bit-reversed twiddles, length n.
void host_ntt_batch(u64* data, const u64* psi_rev, u64 p, long n, long batch) {
    for (long b = 0; b < batch; ++b) {
        u64* a = data + b * n;
        for (long m = 1, t = n >> 1; m < n; m <<= 1, t >>= 1) {
            for (long i = 0; i < m; ++i) {
                u64 S = psi_rev[m + i];
                long j1 = 2 * i * t;
                for (long j = j1; j < j1 + t; ++j) {
                    u64 U = a[j];
                    u64 V = mulmod(a[j + t], S, p);
                    u64 add = U + V;
                    a[j] = add >= p ? add - p : add;
                    a[j + t] = U >= V ? U - V : U + p - V;
                }
            }
        }
    }
}

// In-place inverse NTT (Gentleman-Sande, bit-reversed -> natural).
void host_intt_batch(u64* data, const u64* ipsi_rev, u64 n_inv, u64 p,
                     long n, long batch) {
    for (long b = 0; b < batch; ++b) {
        u64* a = data + b * n;
        for (long m = n >> 1, t = 1; m >= 1; m >>= 1, t <<= 1) {
            for (long i = 0; i < m; ++i) {
                u64 S = ipsi_rev[m + i];
                long j1 = 2 * i * t;
                for (long j = j1; j < j1 + t; ++j) {
                    u64 U = a[j];
                    u64 V = a[j + t];
                    u64 add = U + V;
                    a[j] = add >= p ? add - p : add;
                    u64 sub = U >= V ? U - V : U + p - V;
                    a[j + t] = mulmod(sub, S, p);
                }
            }
        }
        for (long j = 0; j < n; ++j) a[j] = mulmod(a[j], n_inv, p);
    }
}

// Garner mixed-radix digits: res[L][n] canonical residues -> v[L][n] with
// value = sum_i v[i] * prod_{k<i} q_k.  minv[i] = (prod_{k<i} q_k)^{-1} mod
// q_i, pm[i*L + j] = (prod_{k<j} q_k) mod q_i.
void garner_digits(const u64* res, long L, long n, const u64* primes,
                   const u64* minv, const u64* pm, u64* v) {
    for (long col = 0; col < n; ++col) {
        for (long i = 0; i < L; ++i) {
            u64 qi = primes[i];
            u64 t = res[i * n + col] % qi;
            u64 acc = 0;
            for (long j = 0; j < i; ++j) {
                acc = (acc + mulmod(v[j * n + col] % qi, pm[i * L + j], qi)) % qi;
            }
            t = (t + qi - acc) % qi;
            v[i * n + col] = i ? mulmod(t, minv[i], qi) : t;
        }
    }
}

// Pointwise b[i] = (c0[i] + c1[i] * s[i]) mod p  (decrypt inner product).
void pointwise_muladd(const u64* c0, const u64* c1, const u64* s, u64 p,
                      long n, u64* out) {
    for (long i = 0; i < n; ++i) {
        out[i] = (c0[i] + (u64)(((u128)c1[i] * s[i]) % p)) % p;
    }
}

}  // extern "C"
