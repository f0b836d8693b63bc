// ndzip_tpu native CPU codec — a from-scratch C++17 implementation of the
// ndzip stream format (bit-identical to the reference serial codec,
// /root/reference/src/ndzip/cpu_codec.inl:580-659), exposed through a C ABI
// for ctypes.
//
// Design notes (deliberately different from the reference implementation):
//  * The 32x32 / 64x64 bit transpose is the portable butterfly network
//    (5/6 mask-shift rounds) instead of AVX2 movemask sequences; gcc
//    auto-vectorizes the rounds.
//  * The multi-threaded compressor is a chunked two-pass design: batches of
//    blocks are compressed in parallel into fixed-stride scratch, then the
//    batch is written at the (sequentially known) stream offset — instead of
//    the reference's priority-queue ordered-writer pipeline
//    (cpu_codec.inl:700-887).  Streams stay byte-identical to serial.
//  * Decompression is embarrassingly parallel via the offset table.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t HC_SIZE = 4096;

constexpr uint32_t side_length(int dims) { return dims == 1 ? 4096 : dims == 2 ? 64 : 16; }

template <typename B> constexpr int bits_of = int(sizeof(B) * 8);

template <typename B> inline B rotl1(B v) { return B(v << 1) | B(v >> (bits_of<B> - 1)); }
template <typename B> inline B rotr1(B v) { return B(v >> 1) | B(v << (bits_of<B> - 1)); }
template <typename B> inline B complement_negative(B v) {
    return (v >> (bits_of<B> - 1)) ? B(v ^ (~B{0} >> 1)) : v;
}

// ---------------------------------------------------------------- transform

template <typename B> inline void diff_line(B* x, uint32_t n, uint32_t s) {
    for (uint32_t i = n - 1; i >= 1; --i) x[i * s] = B(x[i * s] - x[(i - 1) * s]);
}

template <typename B> inline void prefix_line(B* x, uint32_t n, uint32_t s) {
    for (uint32_t i = 1; i < n; ++i) x[i * s] = B(x[i * s] + x[(i - 1) * s]);
}

// forward: rotate-left-1, per-axis forward difference (axis order as
// common.hh:469-501), complement-negative
template <typename B> void block_transform(B* x, int dims) {
    const uint32_t n = side_length(dims);
    for (uint32_t i = 0; i < HC_SIZE; ++i) x[i] = rotl1(x[i]);
    if (dims == 1) {
        diff_line(x, n, 1);
    } else if (dims == 2) {
        for (uint32_t i = 0; i < n * n; i += n) diff_line(x + i, n, 1);
        for (uint32_t i = 0; i < n; ++i) diff_line(x + i, n, n);
    } else {
        for (uint32_t i = 0; i < n * n * n; i += n * n)
            for (uint32_t j = 0; j < n; ++j) diff_line(x + i + j, n, n);
        for (uint32_t i = 0; i < n * n * n; i += n) diff_line(x + i, n, 1);
        for (uint32_t i = 0; i < n * n; ++i) diff_line(x + i, n, n * n);
    }
    for (uint32_t i = 0; i < HC_SIZE; ++i) x[i] = complement_negative(x[i]);
}

template <typename B> void inverse_block_transform(B* x, int dims) {
    const uint32_t n = side_length(dims);
    for (uint32_t i = 0; i < HC_SIZE; ++i) x[i] = complement_negative(x[i]);
    if (dims == 1) {
        prefix_line(x, n, 1);
    } else if (dims == 2) {
        for (uint32_t i = 0; i < n; ++i) prefix_line(x + i, n, n);
        for (uint32_t i = 0; i < n * n; i += n) prefix_line(x + i, n, 1);
    } else {
        for (uint32_t i = 0; i < n * n; ++i) prefix_line(x + i, n, n * n);
        for (uint32_t i = 0; i < n * n * n; i += n) prefix_line(x + i, n, 1);
        for (uint32_t i = 0; i < n * n * n; i += n * n)
            for (uint32_t j = 0; j < n; ++j) prefix_line(x + i + j, n, n);
    }
    for (uint32_t i = 0; i < HC_SIZE; ++i) x[i] = rotr1(x[i]);
}

// ---------------------------------------------------------------- transpose

// butterfly bit-matrix transpose; matches transpose_bits_trivial
// (cpu_codec.inl:355-363) bit-for-bit
template <typename B> inline void transpose_bits(B* a) {
    constexpr int W = bits_of<B>;
    B m = B(~B{0}) >> (W / 2);
    for (int j = W / 2; j; j >>= 1) {
        for (int k = 0; k < W; k = (k + j + 1) & ~j) {
            B t = B(a[k] ^ (a[k + j] >> j)) & m;
            a[k] = B(a[k] ^ t);
            a[k + j] = B(a[k + j] ^ (t << j));
        }
        if (j > 1) m = B(m ^ (m << (j >> 1)));
    }
}

// ---------------------------------------------------------------- chunk codec

// heads first, compacted nonzero transposed words after (cpu_codec.inl:541-559)
template <typename B> size_t zero_bit_encode(const B* cube, B* out) {
    constexpr uint32_t W = bits_of<B>;
    constexpr uint32_t heads_n = HC_SIZE / W;
    size_t body = heads_n;
    for (uint32_t c = 0; c < heads_n; ++c) {
        const B* in = cube + c * W;
        B head = 0;
        for (uint32_t j = 0; j < W; ++j) head |= in[j];
        out[c] = head;
        if (head != 0) {
            B t[W];
            std::memcpy(t, in, sizeof t);
            transpose_bits(t);
            for (uint32_t i = 0; i < W; ++i)
                if (t[i] != 0) out[body++] = t[i];
        }
    }
    return body;
}

template <typename B> size_t zero_bit_decode(const B* in, B* cube) {
    constexpr uint32_t W = bits_of<B>;
    constexpr uint32_t heads_n = HC_SIZE / W;
    size_t body = heads_n;
    for (uint32_t c = 0; c < heads_n; ++c) {
        B head = in[c];
        B* dst = cube + c * W;
        if (head == 0) {
            std::memset(dst, 0, W * sizeof(B));
        } else {
            B t[W];
            for (uint32_t i = 0; i < W; ++i)
                t[i] = (head >> (W - 1 - i)) & B{1} ? in[body++] : B{0};
            transpose_bits(t);
            std::memcpy(dst, t, sizeof t);
        }
    }
    return body;
}

// ---------------------------------------------------------------- geometry

struct Extent {
    int dims;
    uint64_t e[3];
    uint64_t elements() const {
        uint64_t n = 1;
        for (int d = 0; d < dims; ++d) n *= e[d];
        return n;
    }
};

static uint64_t num_hypercubes(const Extent& s) {
    uint64_t n = 1;
    for (int d = 0; d < s.dims; ++d) n *= s.e[d] / side_length(s.dims);
    return n;
}

template <typename B, typename Fn>
static void for_each_border_slice(const Extent& s, Fn&& fn) {
    const uint32_t side = side_length(s.dims);
    for (int d = 0; d < s.dims; ++d) {
        if (s.e[d] / side == 0) {
            fn(0, s.elements());
            return;
        }
    }
    int sdwb = -1;
    for (int d = 0; d < s.dims; ++d)
        if (s.e[d] % side != 0) sdwb = d;
    if (sdwb < 0) return;

    uint64_t pos[3] = {0, 0, 0};
    // iterative recursion over at most 3 dims
    struct Rec {
        const Extent& s;
        uint32_t side;
        int sdwb;
        Fn& fn;
        uint64_t (&pos)[3];
        void operator()(int d) {
            uint64_t border_begin = s.e[d] / side * side;
            if (d < sdwb) {
                for (uint64_t p = 0; p < border_begin; ++p) {
                    pos[d] = p;
                    (*this)(d + 1);
                }
                pos[d] = 0;
            }
            if (border_begin < s.e[d]) {
                uint64_t off = 0, end = 0;
                for (int k = 0; k < s.dims; ++k) {
                    uint64_t pb = (k == d) ? border_begin : pos[k];
                    uint64_t pe = (k == d) ? s.e[d] : pos[k];
                    off = off * s.e[k] + pb;
                    end = end * s.e[k] + pe;
                }
                fn(off, end - off);
            }
        }
    } rec{s, side, sdwb, fn, pos};
    rec(0);
}

// gather one hypercube (row-major) from the grid
template <typename B>
static void load_hypercube(const B* data, const Extent& s, const uint64_t* origin, B* cube) {
    const uint32_t side = side_length(s.dims);
    if (s.dims == 1) {
        std::memcpy(cube, data + origin[0], side * sizeof(B));
    } else if (s.dims == 2) {
        const uint64_t stride = s.e[1];
        const B* src = data + origin[0] * stride + origin[1];
        for (uint32_t i = 0; i < side; ++i)
            std::memcpy(cube + i * side, src + i * stride, side * sizeof(B));
    } else {
        const uint64_t s1 = s.e[2], s0 = s.e[1] * s.e[2];
        const B* src = data + origin[0] * s0 + origin[1] * s1 + origin[2];
        for (uint32_t i = 0; i < side; ++i)
            for (uint32_t j = 0; j < side; ++j)
                std::memcpy(cube + (i * side + j) * side, src + i * s0 + j * s1, side * sizeof(B));
    }
}

template <typename B>
static void store_hypercube(const B* cube, B* data, const Extent& s, const uint64_t* origin) {
    const uint32_t side = side_length(s.dims);
    if (s.dims == 1) {
        std::memcpy(data + origin[0], cube, side * sizeof(B));
    } else if (s.dims == 2) {
        const uint64_t stride = s.e[1];
        B* dst = data + origin[0] * stride + origin[1];
        for (uint32_t i = 0; i < side; ++i)
            std::memcpy(dst + i * stride, cube + i * side, side * sizeof(B));
    } else {
        const uint64_t s1 = s.e[2], s0 = s.e[1] * s.e[2];
        B* dst = data + origin[0] * s0 + origin[1] * s1 + origin[2];
        for (uint32_t i = 0; i < side; ++i)
            for (uint32_t j = 0; j < side; ++j)
                std::memcpy(dst + i * s0 + j * s1, cube + (i * side + j) * side, side * sizeof(B));
    }
}

static void hc_origin(const Extent& s, uint64_t index, uint64_t* origin) {
    const uint32_t side = side_length(s.dims);
    uint64_t grid[3];
    for (int d = 0; d < s.dims; ++d) grid[d] = s.e[d] / side;
    for (int d = s.dims - 1; d >= 0; --d) {
        origin[d] = (index % grid[d]) * side;
        index /= grid[d];
    }
}

// ---------------------------------------------------------------- streams

static size_t header_words_impl(uint64_t num_hc, int word_bytes) {
    uint64_t bytes = num_hc * 4;
    return (bytes + word_bytes - 1) / word_bytes;
}

template <typename B> struct StreamLayout {
    uint64_t num_hc;
    size_t header_words() const { return header_words_impl(num_hc, sizeof(B)); }
    static constexpr size_t block_bound = HC_SIZE / bits_of<B> * (bits_of<B> + 1);
};

// ---------------------------------------------------------------- compress

template <typename B>
static size_t compress_impl(const B* data, const Extent& size, B* stream, int threads) {
    StreamLayout<B> layout{num_hypercubes(size)};
    const uint64_t num_hc = layout.num_hc;
    uint32_t* header = reinterpret_cast<uint32_t*>(stream);
    std::memset(header, 0, layout.header_words() * sizeof(B));
    B* hc_base = stream + layout.header_words();

    size_t offset = 0;  // words after all emitted blocks
    if (threads <= 1) {
        std::vector<B> cube(HC_SIZE);
        for (uint64_t h = 0; h < num_hc; ++h) {
            uint64_t origin[3];
            hc_origin(size, h, origin);
            load_hypercube(data, size, origin, cube.data());
            block_transform(cube.data(), size.dims);
            offset += zero_bit_encode(cube.data(), hc_base + offset);
            header[h] = uint32_t(offset);
        }
    } else {
        // chunked two-pass: per batch, parallel encode into fixed-stride
        // scratch, then parallel ordered copy-out
        const uint64_t batch = std::max<uint64_t>(1, uint64_t(threads) * 16);
        std::vector<B> scratch(batch * layout.block_bound);
        std::vector<uint32_t> lens(batch);
        for (uint64_t b0 = 0; b0 < num_hc; b0 += batch) {
            const uint64_t nb = std::min<uint64_t>(batch, num_hc - b0);
            std::atomic<uint64_t> next{0};
            auto worker = [&] {
                std::vector<B> cube(HC_SIZE);
                for (;;) {
                    uint64_t i = next.fetch_add(1);
                    if (i >= nb) break;
                    uint64_t origin[3];
                    hc_origin(size, b0 + i, origin);
                    load_hypercube(data, size, origin, cube.data());
                    block_transform(cube.data(), size.dims);
                    lens[i] = uint32_t(
                            zero_bit_encode(cube.data(), scratch.data() + i * layout.block_bound));
                }
            };
            std::vector<std::thread> pool;
            for (int t = 1; t < threads; ++t) pool.emplace_back(worker);
            worker();
            for (auto& t : pool) t.join();
            // sequential offsets; copies could be parallelized further but
            // memcpy saturates bandwidth quickly
            for (uint64_t i = 0; i < nb; ++i) {
                std::memcpy(hc_base + offset, scratch.data() + i * layout.block_bound,
                        lens[i] * sizeof(B));
                offset += lens[i];
                header[b0 + i] = uint32_t(offset);
            }
        }
    }

    B* border = hc_base + offset;
    size_t border_len = 0;
    for_each_border_slice<B>(size, [&](uint64_t off, uint64_t count) {
        std::memcpy(border + border_len, data + off, count * sizeof(B));
        border_len += count;
    });
    return layout.header_words() + offset + border_len;
}

template <typename B>
static size_t decompress_impl(const B* stream, B* data, const Extent& size, int threads) {
    StreamLayout<B> layout{num_hypercubes(size)};
    const uint64_t num_hc = layout.num_hc;
    const uint32_t* header = reinterpret_cast<const uint32_t*>(stream);
    const B* hc_base = stream + layout.header_words();

    auto decode_one = [&](uint64_t h, B* cube) {
        size_t start = h == 0 ? 0 : header[h - 1];
        zero_bit_decode(hc_base + start, cube);
        inverse_block_transform(cube, size.dims);
        uint64_t origin[3];
        hc_origin(size, h, origin);
        store_hypercube(cube, data, size, origin);
    };

    if (threads <= 1 || num_hc < 2) {
        std::vector<B> cube(HC_SIZE);
        for (uint64_t h = 0; h < num_hc; ++h) decode_one(h, cube.data());
    } else {
        std::atomic<uint64_t> next{0};
        auto worker = [&] {
            std::vector<B> cube(HC_SIZE);
            for (;;) {
                uint64_t h = next.fetch_add(1);
                if (h >= num_hc) break;
                decode_one(h, cube.data());
            }
        };
        std::vector<std::thread> pool;
        for (int t = 1; t < threads; ++t) pool.emplace_back(worker);
        worker();
        for (auto& t : pool) t.join();
    }

    size_t body_words = num_hc ? header[num_hc - 1] : 0;
    const B* border = hc_base + body_words;
    size_t border_len = 0;
    for_each_border_slice<B>(size, [&](uint64_t off, uint64_t count) {
        std::memcpy(data + off, border + border_len, count * sizeof(B));
        border_len += count;
    });
    return layout.header_words() + body_words + border_len;
}

static int resolve_threads(int threads) {
    if (threads == 0) threads = int(std::thread::hardware_concurrency());
    return std::max(threads, 1);
}

}  // namespace

extern "C" {

// All entry points: word_bits in {32, 64}; shape = dims first-major extents;
// stream buffers are uint32-typed; returns length in *words* of the profile
// word type (reference semantics) or (size_t)-1 on error.

size_t ndzip_compressed_bound_words(int word_bits, int dims, const uint64_t* shape) {
    if (dims < 1 || dims > 3) return size_t(-1);
    Extent s{dims, {0, 0, 0}};
    for (int d = 0; d < dims; ++d) s.e[d] = shape[d];
    uint64_t num_hc = num_hypercubes(s);
    uint64_t border = 0;
    {
        uint64_t cube = 1, all = 1;
        for (int d = 0; d < dims; ++d) {
            cube *= s.e[d] / side_length(dims) * side_length(dims);
            all *= s.e[d];
        }
        border = all - cube;
    }
    size_t block_bound = word_bits == 32 ? StreamLayout<uint32_t>::block_bound
                                         : StreamLayout<uint64_t>::block_bound;
    return header_words_impl(num_hc, word_bits / 8) + num_hc * block_bound + border;
}

size_t ndzip_compress(int word_bits, int dims, const uint64_t* shape, const void* data,
        void* stream, int threads) {
    if (dims < 1 || dims > 3) return size_t(-1);
    Extent s{dims, {0, 0, 0}};
    for (int d = 0; d < dims; ++d) s.e[d] = shape[d];
    threads = resolve_threads(threads);
    if (word_bits == 32)
        return compress_impl(static_cast<const uint32_t*>(data), s,
                static_cast<uint32_t*>(stream), threads);
    if (word_bits == 64)
        return compress_impl(static_cast<const uint64_t*>(data), s,
                static_cast<uint64_t*>(stream), threads);
    return size_t(-1);
}

size_t ndzip_decompress(int word_bits, int dims, const uint64_t* shape, const void* stream,
        void* data, int threads) {
    if (dims < 1 || dims > 3) return size_t(-1);
    Extent s{dims, {0, 0, 0}};
    for (int d = 0; d < dims; ++d) s.e[d] = shape[d];
    threads = resolve_threads(threads);
    if (word_bits == 32)
        return decompress_impl(static_cast<const uint32_t*>(stream), static_cast<uint32_t*>(data),
                s, threads);
    if (word_bits == 64)
        return decompress_impl(static_cast<const uint64_t*>(stream), static_cast<uint64_t*>(data),
                s, threads);
    return size_t(-1);
}

}  // extern "C"
