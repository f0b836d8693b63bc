// Benchmark-only competitor codecs: FPC and pFPC.
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
//
// pFPC (Burtscher & Ratanaworabhan, "pFPC: A Parallel Compressor for
// Floating-Point Data", DCC 2009) parallelizes FPC by splitting the value
// stream into chunks compressed by independent predictor states, one
// thread per chunk group.  The reference benchmark vendors the author
// sources ("pfpc", benchmark.cc:1196-1253); here the same FPC core runs
// over `threads` contiguous chunks under std::thread, with a small
// chunk-table container of our own design (interchange does not matter
// for the competitor measurement, speed/ratio character does):
//   pfpc_bound(n, threads)             -> worst-case compressed bytes
//   pfpc_compress(in, n, out, level, threads)  -> bytes written
//   pfpc_decompress(in, clen, out, n, level)   -> values decoded
// (the thread count is recorded in the stream, so decompression spawns
// the encoder's layout regardless of the caller's machine).

#include <cstdint>
#include <cstring>
#include <thread>
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

// --- pFPC: chunk-parallel FPC ---------------------------------------------
//
// Stream layout: u64 nchunks | u64 chunk_vals | u64 comp_bytes[nchunks] |
// concatenated per-chunk FPC streams (each self-contained: fresh predictor
// tables, so chunks decode independently and in parallel).

static inline size_t pfpc_chunk_vals(size_t n, int threads) {
    if (threads < 1) threads = 1;
    size_t c = (n + size_t(threads) - 1) / size_t(threads);
    return c ? c : 1;
}

size_t pfpc_bound(size_t n, int threads) {
    size_t cv = pfpc_chunk_vals(n, threads);
    size_t nchunks = n ? (n + cv - 1) / cv : 0;
    return 16 + nchunks * 8 + nchunks * fpc_bound(cv);
}

size_t pfpc_compress(const double *in, size_t n, uint8_t *out, int level,
                     int threads) {
    if (level < 1 || level > 28) return (size_t)-1;
    size_t cv = pfpc_chunk_vals(n, threads);
    size_t nchunks = n ? (n + cv - 1) / cv : 0;
    uint64_t hdr[2] = {nchunks, cv};
    std::memcpy(out, hdr, 16);
    uint64_t *table = reinterpret_cast<uint64_t *>(out + 16);
    uint8_t *streams = out + 16 + nchunks * 8;
    size_t slot = fpc_bound(cv);  // scratch stride before compaction
    std::vector<std::thread> pool;
    pool.reserve(nchunks);
    for (size_t c = 0; c < nchunks; c++) {
        pool.emplace_back([=]() {
            size_t lo = c * cv;
            size_t cn = (lo + cv <= n) ? cv : n - lo;
            table[c] = fpc_compress(in + lo, cn, streams + c * slot, level);
        });
    }
    for (auto &t : pool) t.join();
    // compact the per-chunk streams tight (serial memmove; bandwidth-bound)
    size_t pos = 0;
    for (size_t c = 0; c < nchunks; c++) {
        if (table[c] == (uint64_t)-1) return (size_t)-1;
        std::memmove(streams + pos, streams + c * slot, table[c]);
        pos += table[c];
    }
    return 16 + nchunks * 8 + pos;
}

size_t pfpc_decompress(const uint8_t *in, size_t comp_len, double *out,
                       size_t n, int level) {
    if (level < 1 || level > 28) return (size_t)-1;
    if (comp_len < 16) return (size_t)-1;
    uint64_t hdr[2];
    std::memcpy(hdr, in, 16);
    size_t nchunks = hdr[0], cv = hdr[1];
    if (cv == 0 || nchunks != (n ? (n + cv - 1) / cv : 0)) return (size_t)-1;
    if (comp_len < 16 + nchunks * 8) return (size_t)-1;
    const uint64_t *table = reinterpret_cast<const uint64_t *>(in + 16);
    const uint8_t *streams = in + 16 + nchunks * 8;
    size_t avail = comp_len - 16 - nchunks * 8;
    std::vector<size_t> offs(nchunks + 1, 0);
    for (size_t c = 0; c < nchunks; c++) offs[c + 1] = offs[c] + table[c];
    if (offs[nchunks] > avail) return (size_t)-1;
    std::vector<size_t> got(nchunks, 0);
    std::vector<std::thread> pool;
    pool.reserve(nchunks);
    for (size_t c = 0; c < nchunks; c++) {
        pool.emplace_back([=, &offs, &got]() {
            size_t lo = c * cv;
            size_t cn = (lo + cv <= n) ? cv : n - lo;
            got[c] = fpc_decompress(streams + offs[c], table[c], out + lo,
                                    cn, level);
        });
    }
    for (auto &t : pool) t.join();
    for (size_t c = 0; c < nchunks; c++) {
        size_t lo = c * cv;
        size_t cn = (lo + cv <= n) ? cv : n - lo;
        if (got[c] != cn) return (size_t)-1;
    }
    return n;
}

}  // extern "C"
