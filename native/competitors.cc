// Benchmark-only competitor codec: FPC.
//
// Reimplementation of the FPC predictive compressor for IEEE doubles from
// the published algorithm description (Burtscher & Ratanaworabhan, "FPC: A
// High-Speed Compressor for Double-Precision Floating-Point Data", IEEE
// Trans. Computers 58(1), 2009): an FCM and a DFCM hash-table predictor
// race per value, the better prediction is XOR'd with the actual bits, and
// the residual is stored as (4-bit code | leading-zero-byte count) plus the
// non-zero low bytes.  The reference benchmark links the author sources as
// a vendored submodule (/root/reference/src/benchmark/benchmark.cc:1196-1253
// "fpc"); this file is an independent implementation — the container byte
// layout is ours, since only the speed/ratio character matters for the
// competitor measurement, not stream interchange.
//
// C ABI (ctypes-friendly, see ndzip_tpu/competitors.py):
//   fpc_bound(n)                       -> worst-case compressed bytes
//   fpc_compress(in, n, out, level)    -> compressed bytes written
//   fpc_decompress(in, clen, out, n, level) -> values decoded (n on success)
// `level` is the log2 of the predictor-table entry count (FPC's table-size
// tunable; the paper sweeps 10..26).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int leading_zero_bytes(uint64_t x) {
    if (x == 0) return 8;
    return __builtin_clzll(x) >> 3;
}

struct predictor_state {
    std::vector<uint64_t> fcm, dfcm;
    uint64_t fhash = 0, dhash = 0, last = 0, mask;

    explicit predictor_state(int level)
        : fcm(size_t(1) << level, 0), dfcm(size_t(1) << level, 0),
          mask((uint64_t(1) << level) - 1) {}

    // Returns both predictions for the NEXT value, then call advance(v).
    inline void predict(uint64_t &pf, uint64_t &pd) const {
        pf = fcm[fhash];
        pd = dfcm[dhash] + last;
    }

    inline void advance(uint64_t v) {
        fcm[fhash] = v;
        fhash = ((fhash << 6) ^ (v >> 48)) & mask;
        uint64_t d = v - last;
        dfcm[dhash] = d;
        dhash = ((dhash << 2) ^ (d >> 40)) & mask;
        last = v;
    }
};

}  // namespace

extern "C" {

size_t fpc_bound(size_t n) {
    // 4-bit code per value (packed in pairs) + up to 8 residual bytes each.
    return (n + 1) / 2 + n * 8 + 16;
}

size_t fpc_compress(const double *in, size_t n, uint8_t *out, int level) {
    if (level < 1 || level > 28) return (size_t)-1;
    predictor_state st(level);
    size_t ncodes = (n + 1) / 2;
    uint8_t *codes = out;
    uint8_t *data = out + ncodes;
    std::memset(codes, 0, ncodes);
    size_t dpos = 0;
    for (size_t i = 0; i < n; i++) {
        uint64_t v;
        std::memcpy(&v, in + i, 8);
        uint64_t pf, pd;
        st.predict(pf, pd);
        st.advance(v);
        uint64_t xf = v ^ pf, xd = v ^ pd;
        int use_d = xd < xf;
        uint64_t r = use_d ? xd : xf;
        int z = leading_zero_bytes(r);
        // 3-bit zero-byte field: 0..6 literal, 7 means all 8 bytes zero
        // (a 7-byte-zero residual downgrades to 6, writing 2 bytes — the
        // same rarely-taken-bucket folding the paper applies to z == 4).
        if (z == 7) z = 6;
        int zfield = (z == 8) ? 7 : z;
        codes[i >> 1] |= uint8_t(((use_d << 3) | zfield) << ((i & 1) * 4));
        int nres = (z == 8) ? 0 : 8 - z;
        // one unaligned 8-byte store, advance by the live byte count
        // (fpc_bound leaves room for the overhang)
        std::memcpy(data + dpos, &r, 8);
        dpos += nres;
    }
    return ncodes + dpos;
}

size_t fpc_decompress(const uint8_t *in, size_t comp_len, double *out,
                      size_t n, int level) {
    if (level < 1 || level > 28) return (size_t)-1;
    predictor_state st(level);
    size_t ncodes = (n + 1) / 2;
    if (comp_len < ncodes) return (size_t)-1;
    const uint8_t *codes = in;
    const uint8_t *data = in + ncodes;
    size_t dpos = 0, dmax = comp_len - ncodes;
    for (size_t i = 0; i < n; i++) {
        int code = (codes[i >> 1] >> ((i & 1) * 4)) & 0xf;
        int use_d = code >> 3;
        int zfield = code & 7;
        int nres = (zfield == 7) ? 0 : 8 - zfield;
        if (dpos + nres > dmax) return (size_t)-1;
        // one unaligned 8-byte load masked to the live bytes (the encoder's
        // bound guarantees 8 readable bytes past every residual start)
        uint64_t r;
        std::memcpy(&r, data + dpos, 8);
        r &= (nres == 8) ? ~uint64_t(0) : ((uint64_t(1) << (8 * nres)) - 1);
        dpos += nres;
        uint64_t pf, pd;
        st.predict(pf, pd);
        uint64_t v = r ^ (use_d ? pd : pf);
        st.advance(v);
        std::memcpy(out + i, &v, 8);
    }
    return n;
}

}  // extern "C"
