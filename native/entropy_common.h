// Shared host entropy utilities: MSB-first bit reader + two-level Huffman
// LUTs. Used by the MP3 and AAC entropy stages (each a native mirror of the
// corresponding symphonia_tpu/codecs/ Python decoder).
#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

// ---------------------------------------------------------------------------
// Bit reader (MSB-first) with peeking for LUT codebook decode.
// ---------------------------------------------------------------------------

struct Bits {
    const uint8_t* data;
    int64_t len;
    int64_t pos;
    uint64_t buf;
    int cnt;
    bool error;

    Bits(const uint8_t* d, int64_t n) : data(d), len(n), pos(0), buf(0), cnt(0), error(false) {}

    inline void fill() {
        if (pos + 8 <= len && cnt < 56) {
            // Bulk refill: one unaligned 8-byte big-endian load, shift in
            // as many whole bytes as fit.
            int nbytes = (63 - cnt) >> 3;
            uint64_t w;
            memcpy(&w, data + pos, 8);
            w = __builtin_bswap64(w);
            buf = (buf << (nbytes * 8)) | (w >> (64 - nbytes * 8));
            pos += nbytes;
            cnt += nbytes * 8;
            return;
        }
        while (cnt <= 56 && pos < len) { buf = (buf << 8) | data[pos++]; cnt += 8; }
    }
    inline uint32_t read(int n) {
        if (n == 0) return 0;
        if (cnt < n) { fill(); if (cnt < n) { error = true; return 0; } }
        cnt -= n;
        uint32_t v = (uint32_t)((buf >> cnt) & ((1ULL << n) - 1));
        buf &= (1ULL << cnt) - 1;
        return v;
    }
    inline uint32_t peek(int n) {
        if (cnt < n) fill();
        if (cnt >= n) return (uint32_t)((buf >> (cnt - n)) & ((1ULL << n) - 1));
        // Pad with zeros at end of stream.
        return (uint32_t)((buf << (n - cnt)) & ((1ULL << n) - 1));
    }
    inline void consume(int n) {
        if (cnt < n) { fill(); if (cnt < n) { error = true; cnt = 0; buf = 0; return; } }
        cnt -= n;
        buf &= (1ULL << cnt) - 1;
    }
    inline int64_t bits_read() const { return pos * 8 - cnt; }
    inline void ignore(int64_t n) { while (n > 32) { read(32); n -= 32; } if (n > 0) read((int)n); }
};

// ---------------------------------------------------------------------------
// Two-level LUT codebooks
// ---------------------------------------------------------------------------

constexpr int kRootBits = 10;

struct Lut {
    // Root: value>=0 -> leaf (payload | len<<16); value<0 -> ~subtable idx.
    std::vector<int32_t> root;
    struct Sub { int bits; std::vector<int32_t> e; };
    std::vector<Sub> subs;
    int max_len = 0;
    int min_fast = kRootBits;  // bits needed buffered for the fast path

    void build(const uint32_t* codes, const uint8_t* lens, const uint16_t* values, int n) {
        root.assign(1 << kRootBits, -1 - 0x7FFFFFF);  // invalid
        max_len = 0;
        for (int i = 0; i < n; i++) if (lens[i] > max_len) max_len = lens[i];
        min_fast = max_len > kRootBits ? max_len : kRootBits;
        // First pass: leaves with len <= root bits.
        for (int i = 0; i < n; i++) {
            int l = lens[i];
            if (l == 0 || l > kRootBits) continue;
            uint32_t base = codes[i] << (kRootBits - l);
            for (uint32_t k = 0; k < (1u << (kRootBits - l)); k++)
                root[base + k] = (int32_t)values[i] | (l << 16);
        }
        // Longer codes: group by root prefix.
        int sub_bits = max_len - kRootBits;
        if (sub_bits <= 0) return;
        for (int i = 0; i < n; i++) {
            int l = lens[i];
            if (l <= kRootBits) continue;
            uint32_t pre = codes[i] >> (l - kRootBits);
            int sub_idx;
            if (root[pre] < 0 && root[pre] != -1 - 0x7FFFFFF) {
                sub_idx = -root[pre] - 1;
            } else {
                sub_idx = (int)subs.size();
                subs.push_back(Sub{sub_bits, std::vector<int32_t>((size_t)1 << sub_bits, -1)});
                root[pre] = -sub_idx - 1;
            }
            Sub& s = subs[sub_idx];
            int rem = l - kRootBits;
            uint32_t rem_code = codes[i] & ((1u << rem) - 1);
            uint32_t base = rem_code << (sub_bits - rem);
            for (uint32_t k = 0; k < (1u << (sub_bits - rem)); k++)
                s.e[base + k] = (int32_t)values[i] | (l << 16);
        }
    }

    // Returns value; consumes bits. Sets *err on invalid prefix.
    inline int decode(Bits& bs, bool* err) const {
        // Fast path: one refill check buffers the longest code, then root
        // and sub lookups are pure register/L1 operations.
        if (bs.cnt < min_fast) bs.fill();
        if (bs.cnt >= min_fast) {
            uint32_t idx = (uint32_t)(bs.buf >> (bs.cnt - kRootBits)) &
                           ((1u << kRootBits) - 1);
            int32_t e = root[idx];
            if (e >= 0) {
                bs.cnt -= e >> 16;
                bs.buf &= (1ULL << bs.cnt) - 1;
                return e & 0xFFFF;
            }
            if (e == -1 - 0x7FFFFFF) { *err = true; return 0; }
            const Sub& s = subs[-e - 1];
            uint32_t idx2 = (uint32_t)(bs.buf >> (bs.cnt - kRootBits - s.bits)) &
                            ((1u << s.bits) - 1);
            int32_t e2 = s.e[idx2];
            if (e2 < 0) { *err = true; return 0; }
            bs.cnt -= e2 >> 16;
            bs.buf &= (1ULL << bs.cnt) - 1;
            return e2 & 0xFFFF;
        }
        // Near stream end: zero-padded peeks.
        uint32_t idx = bs.peek(kRootBits);
        int32_t e = root[idx];
        if (e >= 0) { bs.consume(e >> 16); return e & 0xFFFF; }
        if (e == -1 - 0x7FFFFFF) { *err = true; return 0; }
        const Sub& s = subs[-e - 1];
        uint32_t idx2 = bs.peek(kRootBits + s.bits) & ((1u << s.bits) - 1);
        int32_t e2 = s.e[idx2];
        if (e2 < 0) { *err = true; return 0; }
        bs.consume(e2 >> 16);
        return e2 & 0xFFFF;
    }
};

// FFT-based DCT-IV for the per-packet synthesis paths (sh_vorbis_decode_pcm,
// sh_aac_stream_decode_pcm).
// Computes d[k] = sum_j x[j] cos(pi/n (j+1/2)(k+1/2)) — the same half-scale
// DCT-IV ops/imdct_host.imdct_dct4 gets from pocketfft (whose type-4 DCT
// returns 2x this sum, which imdct_dct4 then halves) — via an M = n/2
// complex FFT in double precision:
//   u[m] = x[2m] + i x[n-1-2m];  v = u * e^{-i pi (4m+1)/(4n)}
//   V = FFT_M(v);  w[k] = V[k] * e^{-i pi k / n}
//   d[2k] = Re w[k];  d[n-1-2k] = -Im w[k]
struct Dct4Plan {
    int n = 0, M = 0;
    std::vector<int> bitrev;                      // [M]
    std::vector<double> stw;                      // per-stage contiguous
    std::vector<size_t> stw_off;                  //   twiddles (re,im pairs)
    std::vector<double> pre_re, pre_im;           // [M]
    std::vector<double> post_re, post_im;         // [M]
    std::vector<double> re, im, d;                // scratch [M],[M],[n]

    void init(int n_) {
        n = n_;
        M = n / 2;
        bitrev.assign(M, 0);
        int bits = 0;
        while ((1 << bits) < M) bits++;
        for (int i = 0; i < M; i++) {
            int r = 0;
            for (int b = 0; b < bits; b++) r |= ((i >> b) & 1) << (bits - 1 - b);
            bitrev[i] = r;
        }
        // Per-stage contiguous twiddle tables (split re/im halves) so the
        // butterfly inner loop reads sequentially and auto-vectorizes.
        stw.clear();
        stw_off.assign(bits + 1, 0);
        for (int len = 2, s = 1; len <= M; len <<= 1, s++) {
            int half = len >> 1;
            stw_off[s] = stw.size();
            for (int k = 0; k < half; k++)
                stw.push_back(std::cos(-2.0 * M_PI * k / len));
            for (int k = 0; k < half; k++)
                stw.push_back(std::sin(-2.0 * M_PI * k / len));
        }
        pre_re.resize(M); pre_im.resize(M);
        post_re.resize(M); post_im.resize(M);
        for (int m = 0; m < M; m++) {
            double a = -M_PI * (4.0 * m + 1.0) / (4.0 * n);
            pre_re[m] = std::cos(a);
            pre_im[m] = std::sin(a);
        }
        for (int k = 0; k < M; k++) {
            double a = -M_PI * k / n;
            post_re[k] = std::cos(a);
            post_im[k] = std::sin(a);
        }
        re.resize(M); im.resize(M); d.resize(n);
    }

    void fft() {
        double* r = re.data();
        double* i_ = im.data();
        for (int i = 0; i < M; i++) {
            int j = bitrev[i];
            if (j > i) { std::swap(r[i], r[j]); std::swap(i_[i], i_[j]); }
        }
        for (int len = 2, s = 1; len <= M; len <<= 1, s++) {
            int half = len >> 1;
            const double* wr = stw.data() + stw_off[s];
            const double* wi = wr + half;
            for (int base = 0; base < M; base += len) {
                // The four spans are pairwise disjoint (a/b are the two
                // halves of one butterfly block; re/im are separate
                // vectors) — restrict removes the aliasing version check.
                double* __restrict ra = r + base;
                double* __restrict rb = ra + half;
                double* __restrict ia = i_ + base;
                double* __restrict ib = ia + half;
                for (int k = 0; k < half; k++) {
                    double xr = rb[k] * wr[k] - ib[k] * wi[k];
                    double xi = rb[k] * wi[k] + ib[k] * wr[k];
                    rb[k] = ra[k] - xr; ib[k] = ia[k] - xi;
                    ra[k] += xr; ia[k] += xi;
                }
            }
        }
    }

    // x: n float32 spectral bins -> d: n doubles (half-scale DCT-IV).
    void dct4_half(const float* x) {
        for (int m = 0; m < M; m++) {
            double ur = x[2 * m], ui = x[n - 1 - 2 * m];
            re[m] = ur * pre_re[m] - ui * pre_im[m];
            im[m] = ur * pre_im[m] + ui * pre_re[m];
        }
        fft();
        for (int k = 0; k < M; k++) {
            double wr = re[k] * post_re[k] - im[k] * post_im[k];
            double wi = re[k] * post_im[k] + im[k] * post_re[k];
            d[2 * k] = wr;
            d[n - 1 - 2 * k] = -wi;
        }
    }
};

// Single-precision twin of Dct4Plan: same structure, float arithmetic
// (twiddles computed in double, stored f32). Used by the AAC per-packet
// PCM synthesis where the parity bound is 4e-6 x stream peak vs the f32
// pocketfft oracle — an f32 radix-2 FFT lands ~1e-6 x peak, well inside,
// at twice the vector width of the double plan. Vorbis keeps the double
// plan (its bound is tighter).
struct Dct4PlanF {
    int n = 0, M = 0;
    std::vector<int> bitrev;
    std::vector<float> stw;
    std::vector<size_t> stw_off;
    std::vector<float> pre_re, pre_im;
    std::vector<float> post_re, post_im;
    std::vector<float> re, im, d;

    void init(int n_) {
        n = n_;
        M = n / 2;
        bitrev.assign(M, 0);
        int bits = 0;
        while ((1 << bits) < M) bits++;
        for (int i = 0; i < M; i++) {
            int r = 0;
            for (int b = 0; b < bits; b++) r |= ((i >> b) & 1) << (bits - 1 - b);
            bitrev[i] = r;
        }
        stw.clear();
        stw_off.assign(bits + 1, 0);
        for (int len = 2, s = 1; len <= M; len <<= 1, s++) {
            int half = len >> 1;
            stw_off[s] = stw.size();
            for (int k = 0; k < half; k++)
                stw.push_back((float)std::cos(-2.0 * M_PI * k / len));
            for (int k = 0; k < half; k++)
                stw.push_back((float)std::sin(-2.0 * M_PI * k / len));
        }
        pre_re.resize(M); pre_im.resize(M);
        post_re.resize(M); post_im.resize(M);
        for (int m = 0; m < M; m++) {
            double a = -M_PI * (4.0 * m + 1.0) / (4.0 * n);
            pre_re[m] = (float)std::cos(a);
            pre_im[m] = (float)std::sin(a);
        }
        for (int k = 0; k < M; k++) {
            double a = -M_PI * k / n;
            post_re[k] = (float)std::cos(a);
            post_im[k] = (float)std::sin(a);
        }
        re.resize(M); im.resize(M); d.resize(n);
    }

    void fft() {
        float* r = re.data();
        float* i_ = im.data();
        for (int i = 0; i < M; i++) {
            int j = bitrev[i];
            if (j > i) { std::swap(r[i], r[j]); std::swap(i_[i], i_[j]); }
        }
        for (int len = 2, s = 1; len <= M; len <<= 1, s++) {
            int half = len >> 1;
            const float* wr = stw.data() + stw_off[s];
            const float* wi = wr + half;
            for (int base = 0; base < M; base += len) {
                float* __restrict ra = r + base;
                float* __restrict rb = ra + half;
                float* __restrict ia = i_ + base;
                float* __restrict ib = ia + half;
                for (int k = 0; k < half; k++) {
                    float xr = rb[k] * wr[k] - ib[k] * wi[k];
                    float xi = rb[k] * wi[k] + ib[k] * wr[k];
                    rb[k] = ra[k] - xr; ib[k] = ia[k] - xi;
                    ra[k] += xr; ia[k] += xi;
                }
            }
        }
    }

    // x: n float32 spectral bins -> d: n floats (half-scale DCT-IV).
    void dct4_half(const float* x) {
        for (int m = 0; m < M; m++) {
            float ur = x[2 * m], ui = x[n - 1 - 2 * m];
            re[m] = ur * pre_re[m] - ui * pre_im[m];
            im[m] = ur * pre_im[m] + ui * pre_re[m];
        }
        fft();
        for (int k = 0; k < M; k++) {
            float wr = re[k] * post_re[k] - im[k] * post_im[k];
            float wi = re[k] * post_im[k] + im[k] * post_re[k];
            d[2 * k] = wr;
            d[n - 1 - 2 * k] = -wi;
        }
    }
};
