// Native host codec: exact CRT reconstruction of RNS residue vectors.
//
// The decode path of the engine (ckks/encoder.py residues_to_values) needs,
// per coefficient, the exact centered integer
//     u = sum_i r_i * w_i  mod Q,   centered to (-Q/2, Q/2],
// then u / scale as a double.  The reference delegated this to the
// closed-source desilofhe engine's C++ decrypt/decode (engine_context.py:59-63);
// here it is the framework's own native component, driven from Python via
// ctypes (no pybind11 in this image).
//
// Representation: little-endian u64 limb vectors.  Per-coefficient work is
// O(L * limbs(Q)) schoolbook multiply-accumulate with a final binary
// shift-subtract reduction; the centered result is tiny (message * scale),
// so the double conversion reads the low limbs only.
//
// Build: g++ -O3 -shared -fPIC crt_codec.cpp -o libcrtcodec.so

#include <cstdint>
#include <cstring>
#include <cmath>

using u64 = std::uint64_t;
using u32 = std::uint32_t;
#ifdef __SIZEOF_INT128__
using u128 = unsigned __int128;
#else
#error "need __int128"
#endif

namespace {

// acc += w * m   (w: nw limbs; acc: na limbs, na >= nw+1)
inline void mac_bigint(u64* acc, int na, const u64* w, int nw, u64 m) {
    u128 carry = 0;
    for (int i = 0; i < nw; ++i) {
        u128 t = (u128)w[i] * m + acc[i] + carry;
        acc[i] = (u64)t;
        carry = t >> 64;
    }
    for (int i = nw; i < na && carry; ++i) {
        u128 t = (u128)acc[i] + carry;
        acc[i] = (u64)t;
        carry = t >> 64;
    }
}

// limb i of (b << bits), b having nb limbs
inline u64 shifted_limb(const u64* b, int nb, int bits, int i) {
    int ls = bits / 64, bs = bits % 64;
    int j = i - ls;
    u64 lo = (j >= 0 && j < nb) ? b[j] : 0;
    if (!bs) return lo;
    u64 hi = (j - 1 >= 0 && j - 1 < nb) ? b[j - 1] : 0;
    return (lo << bs) | (hi >> (64 - bs));
}

// a (na limbs) vs (b << bits): -1 / 0 / +1
inline int cmp_shifted(const u64* a, int na, const u64* b, int nb, int bits) {
    int eff = nb + bits / 64 + 1;
    int top = eff > na ? eff : na;
    for (int i = top - 1; i >= 0; --i) {
        u64 av = (i < na) ? a[i] : 0;
        u64 bv = shifted_limb(b, nb, bits, i);
        if (av != bv) return av > bv ? 1 : -1;
    }
    return 0;
}

// a -= (b << bits); caller guarantees a >= (b << bits)
inline void sub_shifted(u64* a, int na, const u64* b, int nb, int bits) {
    u64 borrow = 0;
    for (int i = 0; i < na; ++i) {
        u64 bv = shifted_limb(b, nb, bits, i);
        u128 t = (u128)a[i] - bv - borrow;
        a[i] = (u64)t;
        borrow = (t >> 64) ? 1 : 0;
    }
}

}  // namespace

extern "C" {

// residues:  [L, N] u32 (C order)
// weights:   [L, nq] u64 little-endian limbs of w_i = (Q/q_i)*inv_i mod Q
// q_limbs:   [nq] u64 limbs of Q;  half_limbs: [nq] limbs of Q/2
// out:       [N] double, centered value / scale
// scale_num/scale_den: the declared scale as a ratio of doubles
//            (value = centered / (scale_num/scale_den))
void crt_centered_to_double(const u32* residues, int L, int N,
                            const u64* weights, int nq, const u64* q_limbs,
                            const u64* half_limbs, double inv_scale,
                            double* out) {
    int na = nq + 1;
    u64* acc = new u64[na];
    for (int k = 0; k < N; ++k) {
        std::memset(acc, 0, sizeof(u64) * na);
        for (int i = 0; i < L; ++i) {
            u64 r = residues[(size_t)i * N + k];
            if (r) mac_bigint(acc, na, weights + (size_t)i * nq, nq, r);
        }
        // reduce acc (< L*2^32*Q <= Q << 64ish) mod Q by shift-subtract
        for (int bits = 64 + 32; bits >= 0; --bits) {
            if (cmp_shifted(acc, na, q_limbs, nq, bits) >= 0)
                sub_shifted(acc, na, q_limbs, nq, bits);
        }
        // centered: if acc > Q/2: acc -= Q (report negative)
        bool neg = false;
        if (cmp_shifted(acc, na, half_limbs, nq, 0) > 0) {
            // acc = Q - acc  (magnitude), negative sign
            u64* tmp = new u64[na];
            std::memset(tmp, 0, sizeof(u64) * na);
            for (int i = 0; i < nq; ++i) tmp[i] = q_limbs[i];
            // tmp -= acc
            u128 borrow = 0;
            for (int i = 0; i < na; ++i) {
                u128 t = (u128)tmp[i] - acc[i] - (u64)borrow;
                tmp[i] = (u64)t;
                borrow = (t >> 64) ? 1 : 0;
            }
            std::memcpy(acc, tmp, sizeof(u64) * na);
            delete[] tmp;
            neg = true;
        }
        // to double (top 3 limbs suffice: |centered| << 2^192 for any sane ct)
        long double v = 0.0L;
        for (int i = na - 1; i >= 0; --i) v = v * 18446744073709551616.0L + acc[i];
        double d = (double)(v * (long double)inv_scale);
        out[k] = neg ? -d : d;
    }
    delete[] acc;
}

}  // extern "C"
