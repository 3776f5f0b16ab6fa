// Vorbis host entropy stage.
//
// Native mirror of symphonia_tpu/codecs/vorbis.py decode_spectra (itself
// the analog of symphonia-codec-vorbis/src/lib.rs:146-332): per audio
// packet — mode/window select, floor 0/1 decode, residue 0/1/2 partitioned
// VQ decode, inverse coupling, floor synthesis and the floor x residue dot
// product. Emits per-packet per-channel spectra ready for the batched
// device IMDCT stage (ops/vorbis_dense.decode_packets_dense).
//
// The setup header (codebooks incl. VQ tables, floors, residues, mappings,
// modes) is serialized by symphonia_tpu/native.py vorbis_open() into a
// flat blob parsed here once per stream.
//
// Vorbis packs bits LSB-first; codewords are still matched MSB-of-codeword
// first, so the LUT is built over bit-reversed codeword prefixes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <unordered_map>
#include <vector>

#include "entropy_common.h"  // Dct4Plan (shared with the AAC PCM path)

// Cycle-level profiling, compile-gated like aac_entropy.cpp's
// (-DSH_VORBIS_PROF). Slots:
//   0 total decode   1 floor_read      2 residue_core  3 decode_partition
//   4 coupling       5 floor synth+dot
//   6 # residue codewords  7 # classbook codewords  8 # VQ float adds
//   9 # packets           10 # floor1 posts decoded
#ifdef SH_VORBIS_PROF
#include <x86intrin.h>
namespace {
uint64_t g_vprof[16];
}
extern "C" const uint64_t* sh_vorbis_prof() { return g_vprof; }
extern "C" void sh_vorbis_prof_reset() { memset(g_vprof, 0, sizeof(g_vprof)); }
#define VPROF_START(x) uint64_t _t_##x = __rdtsc()
#define VPROF_STOP(x, i) g_vprof[i] += __rdtsc() - _t_##x
#define VPROF_COUNT(i, n) g_vprof[i] += (uint64_t)(n)
#else
#define VPROF_START(x)
#define VPROF_STOP(x, i)
#define VPROF_COUNT(i, n)
#endif

namespace {

// ---------------------------------------------------------------------------
// LSB-first bit reader
// ---------------------------------------------------------------------------

struct BitsRtl {
    const uint8_t* data;
    int64_t len;
    int64_t pos;
    uint64_t buf;   // next bits in the LOW positions
    int cnt;
    bool error;

    BitsRtl(const uint8_t* d, int64_t n)
        : data(d), len(n), pos(0), buf(0), cnt(0), error(false) {}

    inline void fill() {
        // Bulk path: one 8-byte load inserts every whole byte that fits
        // (take <= 7 so the mask shift stays < 64). Invariant: bits >= cnt
        // of buf are zero (peek zero-pads at EOS through this).
        if (pos + 8 <= len) {
            uint64_t w;
            memcpy(&w, data + pos, 8);
            int take = (63 - cnt) >> 3;
            w &= (1ULL << (take * 8)) - 1;
            buf |= w << cnt;
            pos += take;
            cnt += take * 8;
            return;
        }
        while (cnt <= 56 && pos < len) {
            buf |= (uint64_t)data[pos++] << cnt;
            cnt += 8;
        }
    }
    inline uint32_t read(int n) {
        if (n == 0) return 0;
        if (cnt < n) { fill(); if (cnt < n) { error = true; return 0; } }
        uint32_t v = (uint32_t)(buf & ((n >= 64 ? 0 : (1ULL << n)) - 1));
        buf >>= n;
        cnt -= n;
        return v;
    }
    inline uint32_t peek(int n) {
        if (cnt < n) fill();
        return (uint32_t)(buf & ((1ULL << n) - 1));  // zero-padded at EOS
    }
    inline void consume(int n) {
        if (cnt < n) { fill(); if (cnt < n) { error = true; buf = 0; cnt = 0; return; } }
        buf >>= n;
        cnt -= n;
    }
    inline int64_t bits_left() const { return (len - pos) * 8 + cnt; }
};

inline int ilog(uint32_t x) {
    int n = 0;
    while (x) { n++; x >>= 1; }
    return n;
}

// ---------------------------------------------------------------------------
// LSB-first two-level LUT codebook
// ---------------------------------------------------------------------------

constexpr int kRootBitsR = 10;
// Total subtable-entry cap per codebook (4M entries = 16 MB). Legitimate
// encoder books with per-prefix sizing use a few thousand entries; only
// crafted Kraft-packed deep trees approach this.
constexpr size_t kMaxSubEntries = (size_t)4 << 20;

struct LutRtl {
    std::vector<int32_t> root;   // >=0: value | len<<20; else ~subtable
    struct Sub { int bits; std::vector<int32_t> e; };
    std::vector<Sub> subs;
    int max_len = 0;
    static constexpr int32_t kInvalid = -1 - 0x7FFFFFF;

    static uint32_t revbits(uint32_t c, int l) {
        uint32_t r = 0;
        for (int i = 0; i < l; i++) { r = (r << 1) | (c & 1); c >>= 1; }
        return r;
    }

    // Builds the two-level LUT; returns false when the table would exceed
    // the subtable memory cap (a Kraft-valid hostile codebook can pack
    // thousands of deep prefixes — callers treat false as a parse failure
    // and fall back to the bounded Python multi-level LUT / tree walk).
    bool build(const uint32_t* codes, const int32_t* lens,
               const int32_t* values, int n) {
        root.assign(1 << kRootBitsR, kInvalid);
        subs.clear();
        max_len = 0;
        for (int i = 0; i < n; i++) if (lens[i] > max_len) max_len = lens[i];
        if (max_len > 32) return false;
        // Pass 1: each subtable is sized by the longest codeword under its
        // own 10-bit prefix (not the global max), and the total subtable
        // memory is capped — real encoder books stay well under it.
        std::unordered_map<uint32_t, int> local_max;
        if (max_len > kRootBitsR) {
            for (int i = 0; i < n; i++) {
                int l = lens[i];
                if (l <= kRootBitsR) continue;
                uint32_t pat = revbits(codes[i], l);
                uint32_t pre = pat & ((1u << kRootBitsR) - 1);
                int& m = local_max[pre];
                if (l - kRootBitsR > m) m = l - kRootBitsR;
            }
            size_t total = 0;
            for (auto& kv : local_max) total += (size_t)1 << kv.second;
            if (total > kMaxSubEntries) return false;
        }
        for (int i = 0; i < n; i++) {
            int l = lens[i];
            if (l == 0) continue;
            // Stream pattern: bit j of the pattern is codeword bit (l-1-j).
            uint32_t pat = revbits(codes[i], l);
            if (l <= kRootBitsR) {
                // All indices whose low l bits equal pat.
                for (uint32_t k = 0; k < (1u << (kRootBitsR - l)); k++)
                    root[(k << l) | pat] = values[i] | (l << 20);
            } else {
                uint32_t pre = pat & ((1u << kRootBitsR) - 1);
                int sub_idx;
                if (root[pre] < 0 && root[pre] != kInvalid) {
                    sub_idx = -root[pre] - 1;
                } else {
                    int sub_bits = local_max[pre];
                    sub_idx = (int)subs.size();
                    subs.push_back(Sub{sub_bits,
                                       std::vector<int32_t>((size_t)1 << sub_bits, kInvalid)});
                    root[pre] = -sub_idx - 1;
                }
                Sub& s = subs[sub_idx];
                int rem = l - kRootBitsR;
                uint32_t rem_pat = pat >> kRootBitsR;
                for (uint32_t k = 0; k < (1u << (s.bits - rem)); k++)
                    s.e[(k << rem) | rem_pat] = values[i] | (l << 20);
            }
        }
        return true;
    }

    inline int decode(BitsRtl& bs, bool* err) const {
        // One conditional refill covers root probe + subtable probe +
        // consume (max codeword 32 bits); buf's zero-pad invariant makes
        // the raw probes equal to peek() at EOS.
        if (bs.cnt < 32) bs.fill();
        uint32_t idx = (uint32_t)bs.buf & ((1u << kRootBitsR) - 1);
        int32_t e = root[idx];
        int l;
        int32_t val;
        if (e >= 0) {
            l = e >> 20;
            val = e & 0xFFFFF;
        } else if (e == kInvalid) {
            *err = true;
            return 0;
        } else {
            const Sub& s = subs[-e - 1];
            uint32_t idx2 =
                (uint32_t)((bs.buf >> kRootBitsR) & ((1ULL << s.bits) - 1));
            int32_t e2 = s.e[idx2];
            if (e2 < 0) { *err = true; return 0; }
            l = e2 >> 20;
            val = e2 & 0xFFFFF;
        }
        if (l > bs.cnt) {  // matched into EOS zero-pad
            *err = true;
            bs.error = true;
            bs.buf = 0;
            bs.cnt = 0;
            return 0;
        }
        bs.buf >>= l;
        bs.cnt -= l;
        return val;
    }
};

// ---------------------------------------------------------------------------
// Setup structures (deserialized from the Python blob)
// ---------------------------------------------------------------------------

struct Cb {
    LutRtl lut;
    int dims = 0;
    std::vector<float> vq;  // [entries, dims], empty if none
    int vq_entries = 0;
};

struct Floor0 {
    int order, rate, bark_map_size, amplitude_bits;
    double amplitude_offset;
    std::vector<int32_t> books;
    std::vector<int32_t> bark_map;  // per n2, lazily built
    int bark_n2 = -1;
};

struct Floor1 {
    int multiplier;
    std::vector<int32_t> partition_class_list, class_dims, class_subclass_bits,
        class_masterbooks, x_list, sort_order, low_neighbors, high_neighbors;
    std::vector<std::vector<int32_t>> subclass_books;
};

struct Floor {
    int kind;
    Floor0 f0;
    Floor1 f1;
};

struct Residue {
    int kind, begin, end, partition_size, classifications, classbook;
    std::vector<std::vector<int32_t>> books;  // [class][8]
};

struct Mapping {
    std::vector<std::pair<int32_t, int32_t>> coupling_steps;
    std::vector<int32_t> mux, submap_floor, submap_residue;
};

struct Ctx {
    int n_channels, sample_rate, bs0, bs1;
    std::vector<Cb> codebooks;
    std::vector<Floor> floors;
    std::vector<Residue> residues;
    std::vector<Mapping> mappings;
    std::vector<std::pair<int32_t, int32_t>> modes;  // (block_flag, mapping)
    float inverse_db[256];
    // scratch
    std::vector<float> residue_buf;   // [n_ch, n2max]
    std::vector<float> flat_buf;      // [n_ch * n2max]
    std::vector<int64_t> floor1_y;    // posts
    std::vector<int64_t> classes_buf;
    // per-packet synthesis state (sh_vorbis_decode_pcm); lazily built
    bool synth_init = false;
    int prev_flag = -1;               // -1 = no previous block (fresh/reset)
    std::vector<float> overlap;       // [n_ch, bs1/2]
    std::vector<float> win0, win0r, win1, win1r;  // window slopes + reversed
    Dct4Plan plan0, plan1;
    std::vector<float> ybuf;          // [bs1] imdct output scratch
    std::vector<float> spec_scratch;  // [n_ch, bs1/2] spectra for pcm path
};

struct Reader {
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;
    int32_t i32() {
        if (p + 4 > end) { ok = false; return 0; }
        int32_t v;
        memcpy(&v, p, 4);
        p += 4;
        return v;
    }
    float f32() {
        if (p + 4 > end) { ok = false; return 0; }
        float v;
        memcpy(&v, p, 4);
        p += 4;
        return v;
    }
    void vec(std::vector<int32_t>& out) {
        int n = i32();
        out.resize(ok && n >= 0 ? n : 0);
        for (auto& v : out) v = i32();
    }
};

const int kFloor1Range[5] = {0, 256, 128, 86, 64};

// ---------------------------------------------------------------------------
// Floor 1 (vorbis.py floor1_read_channel / floor1_synthesis)
// ---------------------------------------------------------------------------

static bool floor1_read(BitsRtl& br, Ctx& C, Floor1& f, int64_t* y) {
    if (!br.read(1)) return false;
    int rng = kFloor1Range[f.multiplier];
    int bits = ilog(rng - 1);
    int n = (int)f.x_list.size();
    for (int i = 0; i < n; i++) y[i] = 0;
    y[0] = br.read(bits);
    y[1] = br.read(bits);
    int offset = 2;
    bool err = false;
    for (int32_t cls : f.partition_class_list) {
        int cdim = f.class_dims[cls];
        int cbits = f.class_subclass_bits[cls];
        int csub = (1 << cbits) - 1;
        int cval = 0;
        if (cbits) {
            int mb = f.class_masterbooks[cls];
            cval = C.codebooks[mb].lut.decode(br, &err);
        }
        for (int j = 0; j < cdim; j++) {
            int book = f.subclass_books[cls][cval & csub];
            cval >>= cbits;
            if (book >= 0) y[offset + j] = C.codebooks[book].lut.decode(br, &err);
        }
        offset += cdim;
        if (err || br.error) return false;  // mirrors EndOfStream -> unused
    }
    return true;
}

static int render_point(int x0, int64_t y0, int x1, int64_t y1, int x) {
    int64_t dy = y1 - y0;
    int adx = x1 - x0;
    int64_t ady = dy < 0 ? -dy : dy;
    int64_t err = ady * (x - x0);
    int64_t off = err / adx;
    return (int)(dy < 0 ? y0 - off : y0 + off);
}

static void render_line(int x0, int64_t y0, int x1, int64_t y1, float* v,
                        int vlen, const float* db) {
    if (x1 <= x0) return;
    int64_t dy = y1 - y0;
    int adx = x1 - x0;
    int64_t ady = dy < 0 ? -dy : dy;
    int64_t base = ady / adx;
    if (dy < 0) base = -base;
    int64_t babs = base < 0 ? -base : base;
    ady -= babs * adx;
    int64_t sy = dy < 0 ? base - 1 : base + 1;
    if (x0 < vlen) {
        int64_t yc = y0 < 0 ? 0 : (y0 > 255 ? 255 : y0);
        v[x0] = db[yc];
    }
    int64_t y = y0, err = 0;
    int xe = x1 < vlen ? x1 : vlen;
    for (int x = x0 + 1; x < xe; x++) {
        err += ady;
        if (err >= adx) { err -= adx; y += sy; }
        else y += base;
        int64_t yc = y < 0 ? 0 : (y > 255 ? 255 : y);
        v[x] = db[yc];
    }
}

static void floor1_synth(const int64_t* y, Ctx& C, Floor1& f, int n2,
                         float* out) {
    int rng = kFloor1Range[f.multiplier];
    int n = (int)f.x_list.size();
    std::vector<int64_t> final_y(n);
    std::vector<uint8_t> step2(n, 0);
    final_y[0] = y[0];
    final_y[1] = y[1];
    step2[0] = step2[1] = 1;
    for (int i = 2; i < n; i++) {
        int low = f.low_neighbors[i], high = f.high_neighbors[i];
        int pred = render_point(f.x_list[low], final_y[low], f.x_list[high],
                                final_y[high], f.x_list[i]);
        int64_t val = y[i];
        int highroom = rng - pred, lowroom = pred;
        int room = 2 * (highroom < lowroom ? highroom : lowroom);
        if (val) {
            step2[low] = step2[high] = step2[i] = 1;
            if (val >= room)
                final_y[i] = highroom > lowroom ? val - lowroom + pred
                                                : pred - (val - highroom) - 1;
            else if (val & 1)
                final_y[i] = pred - ((val + 1) >> 1);
            else
                final_y[i] = pred + (val >> 1);
        } else {
            step2[i] = 0;
            final_y[i] = pred;
        }
    }
    for (int i = 0; i < n; i++) {
        if (final_y[i] < 0) final_y[i] = 0;
        if (final_y[i] > rng - 1) final_y[i] = rng - 1;
    }
    const float* db = C.inverse_db;
    int mult = f.multiplier;
    for (int i = 0; i < n2; i++) out[i] = 0.0f;
    int hx = 0;
    int64_t hy = 0;
    int lx = 0;
    int64_t ly = final_y[f.sort_order[0]] * mult;
    for (size_t k = 1; k < f.sort_order.size(); k++) {
        int idx = f.sort_order[k];
        if (!step2[idx]) continue;
        hx = f.x_list[idx];
        hy = final_y[idx] * mult;
        render_line(lx, ly, hx < n2 ? hx : n2, hy, out, n2, db);
        lx = hx;
        ly = hy;
    }
    if (hx < n2) {
        int64_t yc = ly < 255 ? ly : 255;
        float v = db[yc];
        for (int i = hx; i < n2; i++) out[i] = v;
    }
}

// ---------------------------------------------------------------------------
// Floor 0 (vorbis.py floor0_read_channel / floor0_synthesis)
// ---------------------------------------------------------------------------

static double bark(double x) {
    return 13.1 * atan(0.00074 * x) + 2.24 * atan(1.85e-8 * x * x) + 1e-4 * x;
}

static void floor0_bark_map(Floor0& f, int n2) {
    if (f.bark_n2 == n2) return;
    f.bark_map.resize(n2);
    double c = f.bark_map_size / bark(0.5 * f.rate);
    for (int i = 0; i < n2; i++) {
        int64_t m = (int64_t)floor(bark((double)f.rate / (2.0 * n2) * i) * c);
        f.bark_map[i] = (int32_t)(m < f.bark_map_size - 1 ? m : f.bark_map_size - 1);
    }
    f.bark_n2 = n2;
}

static bool floor0_read(BitsRtl& br, Ctx& C, Floor0& f, int64_t* amplitude,
                        std::vector<double>& two_cos) {
    int64_t amp = br.read(f.amplitude_bits);
    if (amp == 0 || br.error) return false;
    int bidx = (int)br.read(ilog((uint32_t)f.books.size()));
    if (bidx >= (int)f.books.size()) return false;
    Cb& cb = C.codebooks[f.books[bidx]];
    if (cb.vq.empty()) return false;
    two_cos.clear();
    double last = 0.0;
    bool err = false;
    while ((int)two_cos.size() < f.order) {
        int entry = cb.lut.decode(br, &err);
        if (err || br.error) return false;
        const float* vec = &cb.vq[(size_t)entry * cb.dims];
        int take = f.order - (int)two_cos.size();
        if (take > cb.dims) take = cb.dims;
        double v = last;
        for (int i = 0; i < take; i++) {
            v = (double)vec[i] + last;
            two_cos.push_back(v);
        }
        last = v;
    }
    for (auto& v : two_cos) v = 2.0 * cos(v);
    *amplitude = amp;
    return true;
}

static bool floor0_synth(int64_t amplitude, const std::vector<double>& tc,
                         Floor0& f, int n2, float* out) {
    floor0_bark_map(f, n2);
    int order = f.order;
    int i = 0;
    while (i < n2) {
        int cond = f.bark_map[i];
        double omega = M_PI * cond / f.bark_map_size;
        double cos_omega = cos(omega);
        double tco = 2.0 * cos_omega;
        int pairs = order / 2;
        double p = 1.0, q = 1.0;
        for (int k = 0; k < pairs; k++) {
            p *= tc[2 * k + 1] - tco;
            q *= tc[2 * k] - tco;
        }
        if (order & 1) {
            q *= tc[order - 1] - tco;
            p = p * p * (1.0 - cos_omega * cos_omega);
            q = q * q * 0.25;
        } else {
            p = p * p * ((1.0 - cos_omega) / 2.0);
            q = q * q * ((1.0 + cos_omega) / 2.0);
        }
        if (p + q == 0.0) return false;
        double a = (double)amplitude * f.amplitude_offset;
        double b = sqrt(p + q) * (double)((1 << f.amplitude_bits) - 1);
        float val = (float)exp(0.11512925 * (a / b - f.amplitude_offset));
        while (i < n2 && f.bark_map[i] == cond) out[i++] = val;
    }
    return true;
}

// ---------------------------------------------------------------------------
// Residue (vorbis.py residue_decode / _residue_core / _decode_partition)
// ---------------------------------------------------------------------------

static void decode_partition(BitsRtl& br, const Residue& R, Cb& cb, float* v,
                             int offset, bool* err) {
    VPROF_START(dp);
    int dims = cb.dims;
    int psize = R.partition_size;
    if (dims <= 0) { *err = true; return; }
    if (R.kind == 0) {
        int step = psize / dims;
        for (int i = 0; i < step; i++) {
            int entry = cb.lut.decode(br, err);
            if (*err || br.error) return;
            const float* vec = &cb.vq[(size_t)entry * dims];
            for (int d = 0; d < dims; d++) v[offset + i + d * step] += vec[d];
        }
        VPROF_COUNT(6, step);
        VPROF_COUNT(8, (uint64_t)step * dims);
    } else {
        // Only the last codeword can be partial; split it off so the hot
        // loop adds unconditionally with the dims known small.
        int n_full = psize / dims;
        int rem = psize - n_full * dims;
        float* dst = v + offset;
        const float* vq = cb.vq.data();
        if (dims == 2) {
            for (int i = 0; i < n_full; i++) {
                int entry = cb.lut.decode(br, err);
                if (*err || br.error) return;
                const float* vec = vq + (size_t)entry * 2;
                dst[0] += vec[0];
                dst[1] += vec[1];
                dst += 2;
            }
        } else if (dims == 4) {
            for (int i = 0; i < n_full; i++) {
                int entry = cb.lut.decode(br, err);
                if (*err || br.error) return;
                const float* vec = vq + (size_t)entry * 4;
                dst[0] += vec[0];
                dst[1] += vec[1];
                dst[2] += vec[2];
                dst[3] += vec[3];
                dst += 4;
            }
        } else {
            for (int i = 0; i < n_full; i++) {
                int entry = cb.lut.decode(br, err);
                if (*err || br.error) return;
                const float* vec = vq + (size_t)entry * dims;
                for (int d = 0; d < dims; d++) dst[d] += vec[d];
                dst += dims;
            }
        }
        if (rem) {
            int entry = cb.lut.decode(br, err);
            if (*err || br.error) return;
            const float* vec = vq + (size_t)entry * dims;
            for (int d = 0; d < rem; d++) dst[d] += vec[d];
        }
        VPROF_COUNT(6, n_full + (rem ? 1 : 0));
        VPROF_COUNT(8, (uint64_t)n_full * dims + rem);
    }
    VPROF_STOP(dp, 3);
}

static void residue_core_inner(BitsRtl& br, Ctx& C, const Residue& R,
                               float** vectors, const uint8_t* do_not_decode,
                               int n_ch, int n) {
    int begin = R.begin < n ? R.begin : n;
    int end = R.end < n ? R.end : n;
    int n_to_read = end - begin;
    if (n_to_read <= 0) return;
    if (R.classifications <= 0 || R.partition_size <= 0 ||
        R.classbook < 0 || R.classbook >= (int)C.codebooks.size())
        return;
    Cb& classbook = C.codebooks[R.classbook];
    int cw = classbook.dims;
    if (cw <= 0) return;
    int parts = n_to_read / R.partition_size;
    C.classes_buf.assign((size_t)n_ch * (parts + cw), 0);
    int64_t* classes = C.classes_buf.data();
    bool err = false;
    for (int pass = 0; pass < 8; pass++) {
        int pc = 0;
        while (pc < parts) {
            if (pass == 0) {
                for (int j = 0; j < n_ch; j++) {
                    if (do_not_decode[j]) continue;
                    int64_t temp = classbook.lut.decode(br, &err);
                    if (err || br.error) return;
                    VPROF_COUNT(7, 1);
                    for (int i = cw - 1; i >= 0; i--) {
                        classes[(size_t)j * (parts + cw) + pc + i] =
                            temp % R.classifications;
                        temp /= R.classifications;
                    }
                }
            }
            for (int k = 0; k < cw; k++) {
                if (pc >= parts) break;
                for (int j = 0; j < n_ch; j++) {
                    if (do_not_decode[j]) continue;
                    int vqclass = (int)classes[(size_t)j * (parts + cw) + pc];
                    int book = R.books[vqclass][pass];
                    if (book < 0) continue;
                    Cb& cb = C.codebooks[book];
                    if (cb.vq.empty()) return;  // invalid; abandon like oracle
                    int off = begin + pc * R.partition_size;
                    decode_partition(br, R, cb, vectors[j], off, &err);
                    if (err || br.error) return;
                }
                pc += 1;
            }
        }
    }
}

static void residue_core(BitsRtl& br, Ctx& C, const Residue& R,
                         float** vectors, const uint8_t* do_not_decode,
                         int n_ch, int n) {
    VPROF_START(rc);
    residue_core_inner(br, C, R, vectors, do_not_decode, n_ch, n);
    VPROF_STOP(rc, 2);
}

}  // namespace

// ---------------------------------------------------------------------------
// Native setup-header parser (vorbis_setup.py read_ident_header /
// read_setup_header; spec §4.2). sh_vorbis_open_hdrs parses the raw ident
// + setup packets directly — construction avoids the Python parse and the
// serialize round-trip entirely. Contract: the native parser may be
// STRICTER than the Python one (any nullptr return falls back to the
// Python parse, which then accepts or raises the precise DecodeError),
// but it must never accept a stream the Python parser rejects, and every
// accepted stream must produce identical structures. VQ table math runs
// in double with FMA contraction disabled so the tables are bit-identical
// to numpy's separately-rounded mults*delta+min (+cumsum) pipeline.
// ---------------------------------------------------------------------------

extern "C" int32_t sh_codebook_assign(const int32_t* lengths, int64_t n,
                                      uint32_t* codes);

namespace {

float g_inverse_db[256];
bool g_tables_set = false;

inline double f32_unpack(uint32_t x) {
    double m = (double)(x & 0x1FFFFF);
    int e = (int)((x & 0x7FE00000) >> 21);
    if (x & 0x80000000) m = -m;
    return ldexp(m, e - 788);
}

// base^d <= lim, overflow-safe.
inline bool pow_le(int64_t base, int d, int64_t lim) {
    __int128 r = 1;
    for (int i = 0; i < d; i++) {
        r *= base;
        if (r > lim) return false;
    }
    return true;
}

// Largest v with v^dims <= entries (spec §9.2.3; the float seed can be
// off by one either way, the loops pin the unique fixed point).
inline int64_t lookup1_vals(int64_t entries, int dims) {
    int64_t v = (int64_t)pow((double)entries, 1.0 / dims);
    while (pow_le(v + 1, dims, entries)) v++;
    while (v > 0 && !pow_le(v, dims, entries)) v--;
    return v;
}

// numpy pipeline twin: t = m*delta (round), + min (round); cumsum in
// double; each element cast to f32. fp-contract=off keeps the two
// roundings (g++ otherwise fuses a*b+c into one-rounding FMA).
__attribute__((optimize("fp-contract=off")))
static void build_vq(Cb& cb, int64_t entries, int dims, int lookup,
                     int64_t lv, const std::vector<double>& mults,
                     double minv, double delta, int seq) {
    cb.vq_entries = (int)entries;
    cb.vq.assign((size_t)entries * dims, 0.0f);
    for (int64_t e = 0; e < entries; e++) {
        float* out = &cb.vq[(size_t)e * dims];
        double acc = 0.0;
        int64_t q = e;
        for (int d = 0; d < dims; d++) {
            double m;
            if (lookup == 1) {
                int64_t idx = lv ? q % lv : 0;
                q = lv ? q / lv : 0;
                m = mults[idx];
            } else {
                m = mults[(size_t)e * dims + d];
            }
            double t = m * delta;
            double v = t + minv;
            if (seq) {
                acc = acc + v;
                out[d] = (float)acc;
            } else {
                out[d] = (float)v;
            }
        }
    }
}

static bool parse_codebook(BitsRtl& br, Cb& cb, std::vector<int32_t>& lens,
                           std::vector<uint32_t>& codes,
                           std::vector<int32_t>& vals,
                           std::vector<double>& mults) {
    if (br.read(24) != 0x564342) return false;
    int dims = (int)br.read(16);
    int64_t entries = br.read(24);
    if (br.error) return false;
    // Bounds mirrored from vorbis_setup.py (reference codebook.rs:232).
    if (dims == 0 || dims > 32 || entries > 128 * 1024) return false;
    lens.assign(entries, 0);
    int ordered = (int)br.read(1);
    if (!ordered) {
        int sparse = (int)br.read(1);
        if (sparse) {
            for (int64_t i = 0; i < entries; i++) {
                if (br.error) return false;
                if (br.read(1)) lens[i] = (int32_t)br.read(5) + 1;
            }
        } else {
            if ((int64_t)entries * 5 > br.bits_left()) return false;
            for (int64_t i = 0; i < entries; i++)
                lens[i] = (int32_t)br.read(5) + 1;
        }
    } else {
        int64_t cur = 0;
        int32_t cur_len = (int32_t)br.read(5) + 1;
        while (cur < entries) {
            if (br.error) return false;
            int64_t num = br.read(ilog((uint32_t)(entries - cur)));
            if (cur + num > entries) return false;
            for (int64_t i = 0; i < num; i++) lens[cur + i] = cur_len;
            cur += num;
            cur_len += 1;
        }
    }
    if (br.error) return false;
    codes.assign(entries, 0);
    if (sh_codebook_assign(lens.data(), entries, codes.data()) != 0)
        return false;
    vals.resize(entries);
    for (int64_t i = 0; i < entries; i++) vals[i] = (int32_t)i;
    cb.dims = dims;
    if (!cb.lut.build(codes.data(), lens.data(), vals.data(), (int)entries))
        return false;
    cb.vq.clear();
    cb.vq_entries = 0;
    int lookup = (int)br.read(4);
    if (lookup == 1 || lookup == 2) {
        double minv = f32_unpack(br.read(32));
        double delta = f32_unpack(br.read(32));
        int value_bits = (int)br.read(4) + 1;
        int seq = (int)br.read(1);
        if (br.error) return false;
        int64_t lv = 0, count;
        if (lookup == 1) {
            lv = lookup1_vals(entries, dims);
            count = lv;
        } else {
            count = entries * dims;
        }
        if (count * value_bits > br.bits_left()) return false;
        mults.resize(count);
        for (int64_t i = 0; i < count; i++)
            mults[i] = (double)br.read(value_bits);
        if (br.error) return false;
        build_vq(cb, entries, dims, lookup, lv, mults, minv, delta, seq);
    } else if (lookup != 0) {
        return false;
    }
    return !br.error;
}

static bool parse_floor(BitsRtl& br, Floor& fl, int n_books) {
    int ftype = (int)br.read(16);
    if (br.error) return false;
    if (ftype == 0) {
        fl.kind = 0;
        Floor0& f = fl.f0;
        f.order = (int)br.read(8);
        f.rate = (int)br.read(16);
        f.bark_map_size = (int)br.read(16);
        f.amplitude_bits = (int)br.read(6);
        f.amplitude_offset = (double)br.read(8);
        int num_books = (int)br.read(4) + 1;
        f.books.resize(num_books);
        for (auto& b : f.books) b = (int32_t)br.read(8);
        if (br.error) return false;
        for (auto b : f.books)
            if (b >= n_books) return false;
        if (f.order < 1) return false;
        f.bark_n2 = -1;
        return true;
    }
    if (ftype != 1) return false;
    fl.kind = 1;
    Floor1& f = fl.f1;
    int partitions = (int)br.read(5);
    f.partition_class_list.resize(partitions);
    int max_class = -1;
    for (auto& c : f.partition_class_list) {
        c = (int32_t)br.read(4);
        if (c > max_class) max_class = c;
    }
    f.class_dims.clear();
    f.class_subclass_bits.clear();
    f.class_masterbooks.clear();
    f.subclass_books.clear();
    for (int k = 0; k <= max_class; k++) {
        int d = (int)br.read(3) + 1;
        int s = (int)br.read(2);
        int mb = s ? (int)br.read(8) : -1;
        if (br.error) return false;
        if (mb >= n_books) return false;
        std::vector<int32_t> bl(1 << s);
        for (auto& b : bl) {
            b = (int32_t)br.read(8) - 1;
            if (b >= n_books) return false;
        }
        if (br.error) return false;
        f.class_dims.push_back(d);
        f.class_subclass_bits.push_back(s);
        f.class_masterbooks.push_back(mb);
        f.subclass_books.push_back(std::move(bl));
    }
    f.multiplier = (int)br.read(2) + 1;
    int rangebits = (int)br.read(4);
    f.x_list.clear();
    f.x_list.push_back(0);
    f.x_list.push_back(1 << rangebits);
    for (int p = 0; p < partitions; p++)
        for (int j = 0; j < f.class_dims[f.partition_class_list[p]]; j++)
            f.x_list.push_back((int32_t)br.read(rangebits));
    if (br.error) return false;
    int n = (int)f.x_list.size();
    if (n > 65) return false;
    for (int i = 0; i < n; i++)
        for (int j = i + 1; j < n; j++)
            if (f.x_list[i] == f.x_list[j]) return false;
    f.sort_order.resize(n);
    for (int i = 0; i < n; i++) f.sort_order[i] = i;
    std::sort(f.sort_order.begin(), f.sort_order.end(),
              [&](int32_t a, int32_t b) { return f.x_list[a] < f.x_list[b]; });
    f.low_neighbors.clear();
    f.high_neighbors.clear();
    for (int i = 0; i < n; i++) {
        int low = 0, high = 1;
        if (i >= 2) {
            int64_t lx = -1, hx = 1 << 30;
            for (int j = 0; j < i; j++) {
                if (f.x_list[j] > lx && f.x_list[j] < f.x_list[i]) {
                    lx = f.x_list[j];
                    low = j;
                }
                if (f.x_list[j] < hx && f.x_list[j] > f.x_list[i]) {
                    hx = f.x_list[j];
                    high = j;
                }
            }
        }
        f.low_neighbors.push_back(low);
        f.high_neighbors.push_back(high);
    }
    return true;
}

static bool parse_residue(BitsRtl& br, Residue& R, int n_books) {
    R.kind = (int)br.read(16);
    if (br.error || R.kind > 2) return false;
    R.begin = (int)br.read(24);
    R.end = (int)br.read(24);
    R.partition_size = (int)br.read(24) + 1;
    R.classifications = (int)br.read(6) + 1;
    R.classbook = (int)br.read(8);
    if (br.error || R.classbook >= n_books) return false;
    int cascade[64];
    for (int c = 0; c < R.classifications; c++) {
        int low = (int)br.read(3);
        int high = br.read(1) ? (int)br.read(5) : 0;
        cascade[c] = (high << 3) | low;
    }
    if (br.error) return false;
    R.books.assign(R.classifications, std::vector<int32_t>(8, -1));
    for (int c = 0; c < R.classifications; c++)
        for (int p = 0; p < 8; p++)
            if (cascade[c] & (1 << p)) {
                int b = (int)br.read(8);
                if (br.error || b >= n_books) return false;
                R.books[c][p] = b;
            }
    return true;
}

static bool parse_mapping(BitsRtl& br, Mapping& M, int n_ch, int n_floors,
                          int n_res) {
    if (br.read(16) != 0 || br.error) return false;
    int submaps = br.read(1) ? (int)br.read(4) + 1 : 1;
    M.coupling_steps.clear();
    if (br.read(1)) {
        int steps = (int)br.read(8) + 1;
        int bits = ilog((uint32_t)(n_ch - 1));
        for (int s = 0; s < steps; s++) {
            int mag = (int)br.read(bits);
            int ang = (int)br.read(bits);
            if (br.error) return false;
            if (mag == ang || mag >= n_ch || ang >= n_ch) return false;
            M.coupling_steps.push_back({mag, ang});
        }
    }
    if (br.read(2) != 0 || br.error) return false;
    M.mux.assign(n_ch, 0);
    if (submaps > 1) {
        for (auto& m : M.mux) {
            m = (int32_t)br.read(4);
            if (m >= submaps) return false;
        }
    }
    M.submap_floor.clear();
    M.submap_residue.clear();
    for (int s = 0; s < submaps; s++) {
        br.read(8);  // unused time config
        int fl = (int)br.read(8);
        int rs = (int)br.read(8);
        if (br.error) return false;
        if (fl >= n_floors || rs >= n_res) return false;
        M.submap_floor.push_back(fl);
        M.submap_residue.push_back(rs);
    }
    return true;
}

}  // namespace

extern "C" {

// Register spec tables computed on the Python side (byte-identical with
// the oracle's): the 256-entry floor1 inverse dB table.
void sh_vorbis_set_tables(const float* inverse_db) {
    memcpy(g_inverse_db, inverse_db, sizeof(g_inverse_db));
    g_tables_set = true;
}

// Parse raw ident + setup header packets into a decode context. Returns
// nullptr on ANY validation failure or unsupported shape — the caller
// falls back to the Python parse path (vorbis_setup.py), which raises
// the precise error or serializes via sh_vorbis_open.
void* sh_vorbis_open_hdrs(const uint8_t* id_data, int64_t id_len,
                          const uint8_t* su_data, int64_t su_len) {
    if (!g_tables_set) return nullptr;
    if (id_len < 30 || id_data[0] != 1 || memcmp(id_data + 1, "vorbis", 6))
        return nullptr;
    BitsRtl ib(id_data + 7, id_len - 7);
    if (ib.read(32) != 0) return nullptr;  // version
    int n_ch = (int)ib.read(8);
    uint32_t rate = ib.read(32);
    ib.read(32);  // bitrate_maximum
    ib.read(32);  // bitrate_nominal
    ib.read(32);  // bitrate_minimum
    int bs0e = (int)ib.read(4);
    int bs1e = (int)ib.read(4);
    if (!(6 <= bs0e && bs0e <= 13 && bs0e <= bs1e && bs1e <= 13))
        return nullptr;
    if (n_ch == 0 || rate == 0 || !ib.read(1) || ib.error) return nullptr;
    // The decode submap walk uses a chans[64] scratch; larger channel
    // counts take the Python path.
    if (n_ch > 64) return nullptr;
    // Rates >= 2^31 would go negative through the int context field and
    // skew the floor0 bark map; the Python path (whose serializer packs
    // '<i' and errors) keeps the exact oracle behavior for such streams.
    if (rate > 0x7FFFFFFFu) return nullptr;

    if (su_len < 7 || su_data[0] != 5 || memcmp(su_data + 1, "vorbis", 6))
        return nullptr;
    std::unique_ptr<Ctx> C(new Ctx());
    C->n_channels = n_ch;
    C->sample_rate = (int)rate;
    C->bs0 = 1 << bs0e;
    C->bs1 = 1 << bs1e;
    memcpy(C->inverse_db, g_inverse_db, sizeof(C->inverse_db));

    BitsRtl br(su_data + 7, su_len - 7);
    int n_books = (int)br.read(8) + 1;
    if (br.error) return nullptr;
    C->codebooks.resize(n_books);
    std::vector<int32_t> lens, vals;
    std::vector<uint32_t> codes;
    std::vector<double> mults;
    for (auto& cb : C->codebooks)
        if (!parse_codebook(br, cb, lens, codes, vals, mults)) return nullptr;
    int n_time = (int)br.read(6) + 1;
    for (int i = 0; i < n_time; i++)
        if (br.read(16) != 0 || br.error) return nullptr;
    int n_floors = (int)br.read(6) + 1;
    if (br.error) return nullptr;
    C->floors.resize(n_floors);
    for (auto& fl : C->floors)
        if (!parse_floor(br, fl, n_books)) return nullptr;
    int n_res = (int)br.read(6) + 1;
    if (br.error) return nullptr;
    C->residues.resize(n_res);
    for (auto& R : C->residues)
        if (!parse_residue(br, R, n_books)) return nullptr;
    int n_maps = (int)br.read(6) + 1;
    if (br.error) return nullptr;
    C->mappings.resize(n_maps);
    for (auto& M : C->mappings)
        if (!parse_mapping(br, M, n_ch, n_floors, n_res)) return nullptr;
    int n_modes = (int)br.read(6) + 1;
    if (br.error) return nullptr;
    for (int i = 0; i < n_modes; i++) {
        int bf = (int)br.read(1);
        if (br.read(16) != 0 || br.read(16) != 0) return nullptr;
        int mp = (int)br.read(8);
        if (br.error || mp >= n_maps) return nullptr;
        C->modes.push_back({bf, mp});
    }
    if (!br.read(1) || br.error) return nullptr;  // framing bit
    return C.release();
}

void* sh_vorbis_open(const uint8_t* blob, int64_t blob_len) {
    Reader r{blob, blob + blob_len};
    if (r.i32() != 0x56535450) return nullptr;  // 'VSTP'
    if (r.i32() != 1) return nullptr;
    Ctx* C = new Ctx();
    C->n_channels = r.i32();
    C->sample_rate = r.i32();
    C->bs0 = r.i32();
    C->bs1 = r.i32();
    // The decode submap walk uses a chans[64] scratch; refuse larger
    // channel counts (callers fall back to the Python decode path).
    if (C->n_channels > 64) { delete C; return nullptr; }
    for (int i = 0; i < 256; i++) C->inverse_db[i] = r.f32();
    int n_cb = r.i32();
    C->codebooks.resize(r.ok && n_cb >= 0 ? n_cb : 0);
    for (auto& cb : C->codebooks) {
        cb.dims = r.i32();
        int n = r.i32();
        std::vector<uint32_t> codes(n);
        std::vector<int32_t> lens(n), vals(n);
        for (int i = 0; i < n; i++) {
            codes[i] = (uint32_t)r.i32();
            lens[i] = r.i32();
            vals[i] = r.i32();
        }
        if (!r.ok) { delete C; return nullptr; }
        if (!cb.lut.build(codes.data(), lens.data(), vals.data(), n)) {
            delete C;
            return nullptr;
        }
        cb.vq_entries = r.i32();
        if (cb.vq_entries > 0) {
            cb.vq.resize((size_t)cb.vq_entries * cb.dims);
            for (auto& v : cb.vq) v = r.f32();
        }
    }
    int n_fl = r.i32();
    C->floors.resize(r.ok && n_fl >= 0 ? n_fl : 0);
    for (auto& fl : C->floors) {
        fl.kind = r.i32();
        if (fl.kind == 0) {
            fl.f0.order = r.i32();
            fl.f0.rate = r.i32();
            fl.f0.bark_map_size = r.i32();
            fl.f0.amplitude_bits = r.i32();
            fl.f0.amplitude_offset = (double)r.i32();
            r.vec(fl.f0.books);
        } else {
            fl.f1.multiplier = r.i32();
            r.vec(fl.f1.partition_class_list);
            r.vec(fl.f1.class_dims);
            r.vec(fl.f1.class_subclass_bits);
            r.vec(fl.f1.class_masterbooks);
            int nsb = r.i32();
            fl.f1.subclass_books.resize(r.ok && nsb >= 0 ? nsb : 0);
            for (auto& sb : fl.f1.subclass_books) r.vec(sb);
            r.vec(fl.f1.x_list);
            r.vec(fl.f1.sort_order);
            r.vec(fl.f1.low_neighbors);
            r.vec(fl.f1.high_neighbors);
        }
    }
    int n_res = r.i32();
    C->residues.resize(r.ok && n_res >= 0 ? n_res : 0);
    for (auto& R : C->residues) {
        R.kind = r.i32();
        R.begin = r.i32();
        R.end = r.i32();
        R.partition_size = r.i32();
        R.classifications = r.i32();
        R.classbook = r.i32();
        int nc = r.i32();
        R.books.resize(r.ok && nc >= 0 ? nc : 0);
        for (auto& b : R.books) r.vec(b);
    }
    int n_map = r.i32();
    C->mappings.resize(r.ok && n_map >= 0 ? n_map : 0);
    for (auto& M : C->mappings) {
        int ncs = r.i32();
        for (int i = 0; i < ncs; i++) {
            int a = r.i32(), b = r.i32();
            M.coupling_steps.push_back({a, b});
        }
        r.vec(M.mux);
        r.vec(M.submap_floor);
        r.vec(M.submap_residue);
    }
    int n_modes = r.i32();
    for (int i = 0; i < n_modes; i++) {
        int bf = r.i32(), mp = r.i32();
        C->modes.push_back({bf, mp});
    }
    if (!r.ok) { delete C; return nullptr; }
    return C;
}

void sh_vorbis_close(void* ctx) { delete (Ctx*)ctx; }

// Mode block flags (for the OGG mapper's packet-duration table). Fills
// up to 64 entries; returns the mode count.
int32_t sh_vorbis_mode_flags(void* ctx, int32_t* flags) {
    Ctx& C = *(Ctx*)ctx;
    int n = (int)C.modes.size();
    for (int i = 0; i < n && i < 64; i++) flags[i] = C.modes[i].first;
    return n;
}

// Decode n_pkts audio packets into spectra [n_pkts, n_ch, bs1/2] (each
// packet's first n2 bins are valid; the rest stay zero). flags[p] gets the
// block flag; status[p] 0 ok / <0 skip (mirrors the oracle raising
// DecodeError).
int32_t sh_vorbis_decode(
    void* ctx, const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_pkts,
    float* spectra, int32_t* flags, int32_t* status) {
    Ctx& C = *(Ctx*)ctx;
    int n_ch = C.n_channels;
    int n2max = C.bs1 / 2;
    C.residue_buf.resize((size_t)n_ch * n2max);
    C.flat_buf.resize((size_t)n_ch * n2max);
    // Persistent scratch (grow-only): fresh vectors would heap-allocate
    // per call, a real cost on the one-packet-per-call per-packet path.
    static thread_local std::vector<float> floor_curve;
    static thread_local std::vector<float*> vecs;
    static thread_local std::vector<uint8_t> dnd;
    static thread_local std::vector<int64_t> y1;
    static thread_local std::vector<uint8_t> f1_used;
    static thread_local std::vector<int64_t> f0_amp;
    static thread_local std::vector<std::vector<double>> f0_coeffs;
    if ((int)floor_curve.size() < n2max) floor_curve.resize(n2max);
    if ((int)vecs.size() < n_ch) {
        vecs.resize(n_ch);
        dnd.resize(n_ch);
        y1.resize((size_t)n_ch * 256);
        f1_used.resize(n_ch);
        f0_amp.resize(n_ch);
        f0_coeffs.resize(n_ch);
    }

    VPROF_START(tot);
    for (int32_t p = 0; p < n_pkts; p++) {
        status[p] = 0;
        flags[p] = 0;
        float* out = spectra + (size_t)p * n_ch * n2max;
        memset(out, 0, (size_t)n_ch * n2max * sizeof(float));
        if (offsets[p] < 0 || offsets[p] + sizes[p] > data_len || sizes[p] <= 0) {
            status[p] = -1;
            continue;
        }
        BitsRtl br(data + offsets[p], sizes[p]);
        if (br.read(1)) { status[p] = -2; continue; }  // not audio
        int n_modes = (int)C.modes.size();
        int mode_idx = n_modes > 1 ? (int)br.read(ilog(n_modes - 1)) : 0;
        if (mode_idx >= n_modes) { status[p] = -3; continue; }
        int block_flag = C.modes[mode_idx].first;
        const Mapping& M = C.mappings[C.modes[mode_idx].second];
        int bs = block_flag ? C.bs1 : C.bs0;
        int n2 = bs / 2;
        flags[p] = block_flag;
        if (block_flag) { br.read(1); br.read(1); }

        // Floor decode per channel.
        VPROF_COUNT(9, 1);
        VPROF_START(fr);
        for (int ch = 0; ch < n_ch; ch++) {
            Floor& fl = C.floors[M.submap_floor[M.mux[ch]]];
            if (fl.kind == 1)
                f1_used[ch] = floor1_read(br, C, fl.f1, &y1[(size_t)ch * 256]);
            else
                f1_used[ch] = floor0_read(br, C, fl.f0, &f0_amp[ch], f0_coeffs[ch]);
        }
        VPROF_STOP(fr, 1);
        for (int ch = 0; ch < n_ch; ch++) dnd[ch] = !f1_used[ch];
        for (auto& cs : M.coupling_steps) {
            if (!(dnd[cs.first] && dnd[cs.second])) {
                dnd[cs.first] = 0;
                dnd[cs.second] = 0;
            }
        }

        // Residue decode per submap.
        float* residues = C.residue_buf.data();
        memset(residues, 0, (size_t)n_ch * n2max * sizeof(float));
        int n_submaps = (int)M.submap_residue.size();
        for (int sm = 0; sm < n_submaps; sm++) {
            int nc = 0;
            int chans[64];
            for (int ch = 0; ch < n_ch; ch++)
                if (M.mux[ch] == sm) chans[nc++] = ch;
            const Residue& R = C.residues[M.submap_residue[sm]];
            if (R.kind == 2) {
                bool all_dnd = true;
                for (int i = 0; i < nc; i++) all_dnd &= dnd[chans[i]] != 0;
                if (!all_dnd) {
                    float* flat = C.flat_buf.data();
                    memset(flat, 0, (size_t)nc * n2 * sizeof(float));
                    float* fv[1] = {flat};
                    uint8_t fdnd[1] = {0};
                    residue_core(br, C, R, fv, fdnd, 1, nc * n2);
                    // Deinterleave [n2, nc] -> per channel rows.
                    for (int i = 0; i < nc; i++) {
                        float* dst = residues + (size_t)chans[i] * n2max;
                        for (int k = 0; k < n2; k++) dst[k] = flat[(size_t)k * nc + i];
                    }
                }
            } else {
                for (int i = 0; i < nc; i++) {
                    vecs[i] = residues + (size_t)chans[i] * n2max;
                    // dnd view for this submap
                }
                std::vector<uint8_t> sub_dnd(nc);
                for (int i = 0; i < nc; i++) sub_dnd[i] = dnd[chans[i]];
                residue_core(br, C, R, vecs.data(), sub_dnd.data(), nc, n2);
            }
        }

        // Inverse coupling, reverse step order (spec §4.3.4).
        VPROF_START(cp);
        for (auto it = M.coupling_steps.rbegin(); it != M.coupling_steps.rend();
             ++it) {
            float* m = residues + (size_t)it->first * n2max;
            float* a = residues + (size_t)it->second * n2max;
            for (int k = 0; k < n2; k++) {
                float mv = m[k], av = a[k], nm, na;
                if (mv > 0) {
                    if (av > 0) { nm = mv; na = mv - av; }
                    else { na = mv; nm = mv + av; }
                } else {
                    if (av > 0) { nm = mv; na = mv + av; }
                    else { na = mv; nm = mv - av; }
                }
                m[k] = nm;
                a[k] = na;
            }
        }
        VPROF_STOP(cp, 4);

        // Floor synthesis + dot product.
        VPROF_START(fs);
        for (int ch = 0; ch < n_ch; ch++) {
            if (!f1_used[ch]) continue;
            Floor& fl = C.floors[M.submap_floor[M.mux[ch]]];
            if (fl.kind == 1) {
                floor1_synth(&y1[(size_t)ch * 256], C, fl.f1, n2,
                             floor_curve.data());
            } else {
                if (!floor0_synth(f0_amp[ch], f0_coeffs[ch], fl.f0, n2,
                                  floor_curve.data())) { status[p] = -4; break; }
            }
            float* dst = out + (size_t)ch * n2max;
            const float* rsd = residues + (size_t)ch * n2max;
            for (int k = 0; k < n2; k++) dst[k] = floor_curve[k] * rsd[k];
        }
        VPROF_STOP(fs, 5);
    }
    VPROF_STOP(tot, 0);
    return 0;
}

// Vorbis channel order -> positioned output order (spec §4.3.9; mirrors
// codecs/vorbis.py _CHANNEL_MAP). Identity for n_ch > 8.
static const int kChMap3[] = {0, 2, 1};
static const int kChMap5[] = {0, 2, 1, 3, 4};
static const int kChMap6[] = {0, 2, 1, 4, 5, 3};
static const int kChMap7[] = {0, 2, 1, 5, 6, 4, 3};
static const int kChMap8[] = {0, 2, 1, 6, 7, 4, 5, 3};

static const int* ch_map(int n_ch) {
    switch (n_ch) {
        case 3: return kChMap3;
        case 5: return kChMap5;
        case 6: return kChMap6;
        case 7: return kChMap7;
        case 8: return kChMap8;
        default: return nullptr;  // identity
    }
}

// Window slope of length bs/2 (spec §4.3.1; vorbis.py vorbis_window):
// sin(pi/2 * sin^2(pi (i+0.5) / bs)).
static void make_window(int bs, std::vector<float>& w, std::vector<float>& wr) {
    int h = bs / 2;
    w.resize(h);
    wr.resize(h);
    for (int i = 0; i < h; i++) {
        double s = std::sin(M_PI / 2.0 * (i + 0.5) / h);
        w[i] = (float)std::sin(M_PI / 2.0 * s * s);
    }
    for (int i = 0; i < h; i++) wr[i] = w[h - 1 - i];
}

static void synth_prepare(Ctx& C) {
    if (C.synth_init) return;
    make_window(C.bs0, C.win0, C.win0r);
    make_window(C.bs1, C.win1, C.win1r);
    C.plan0.init(C.bs0 / 2);
    C.plan1.init(C.bs1 / 2);
    C.overlap.assign((size_t)C.n_channels * (C.bs1 / 2), 0.0f);
    C.ybuf.resize(C.bs1);
    C.spec_scratch.resize((size_t)C.n_channels * (C.bs1 / 2));
    C.synth_init = true;
}

// Full per-packet decode: entropy/floor/residue (sh_vorbis_decode) +
// IMDCT + windowed overlap-add + channel reorder (codecs/vorbis.py
// VorbisDsp.synth_all / VorbisDecoder.decode). PCM rows are written in
// positioned output order at stride pcm_stride. *out_n gets the frame
// count, *first 1 when this is the first block after open/reset (its
// output is not valid audio; the caller truncates, lib.rs:318-326).
// status: 0 ok, <0 = the sh_vorbis_decode skip statuses. The lapping
// state (overlap + previous block flag) lives in the context; callers
// must route EVERY packet of the stream through this entry (or reset).
int32_t sh_vorbis_decode_pcm(
    void* ctx, const uint8_t* data, int64_t size,
    float* pcm, int64_t pcm_stride,
    int32_t* out_n, int32_t* first, int32_t* status) {
    Ctx& C = *(Ctx*)ctx;
    synth_prepare(C);
    int n_ch = C.n_channels;
    int n2max = C.bs1 / 2;
    int64_t off = 0;
    int64_t sz = size;
    int32_t flag = 0;
    *out_n = 0;
    *first = 0;
    sh_vorbis_decode(ctx, data, size, &off, &sz, 1, C.spec_scratch.data(),
                     &flag, status);
    if (*status != 0) return 0;

    bool is_first = C.prev_flag < 0;
    bool cur = flag != 0;
    bool prev = is_first ? cur : C.prev_flag != 0;
    int bs = cur ? C.bs1 : C.bs0;
    int n2 = bs / 2;
    int prev_bs = prev ? C.bs1 : C.bs0;
    int out_len = (prev_bs + bs) / 4;
    // Lap window: long only when both blocks are long (synth_all's wbs).
    const std::vector<float>& win = (cur && prev) ? C.win1 : C.win0;
    const std::vector<float>& winr = (cur && prev) ? C.win1r : C.win0r;
    const int* map = ch_map(n_ch);
    Dct4Plan& P = cur ? C.plan1 : C.plan0;

    for (int ch = 0; ch < n_ch; ch++) {
        P.dct4_half(C.spec_scratch.data() + (size_t)ch * n2max);
        // IMDCT assembly (ops/imdct_host.imdct_dct4): y[:h]=d[h:],
        // y[h:h+n]=-d[::-1], y[h+n:]=-d[:h] with n = n2, h = n2/2.
        float* y = C.ybuf.data();
        const double* d = P.d.data();
        int h = n2 / 2;
        for (int i = 0; i < h; i++) y[i] = (float)d[h + i];
        for (int i = 0; i < n2; i++) y[h + i] = (float)(-d[n2 - 1 - i]);
        for (int i = 0; i < h; i++) y[h + n2 + i] = (float)(-d[i]);

        float* ov = C.overlap.data() + (size_t)ch * n2max;
        float* out = pcm + (size_t)(map ? map[ch] : ch) * pcm_stride;
        if (prev == cur) {
            for (int k = 0; k < n2; k++)
                out[k] = ov[k] * winr[k] + y[k] * win[k];
        } else if (prev && !cur) {
            int start = (C.bs1 - C.bs0) / 4;
            int half0 = C.bs0 / 2;
            for (int k = 0; k < start; k++) out[k] = ov[k];
            for (int k = 0; k < half0; k++)
                out[start + k] = ov[start + k] * winr[k] + y[k] * win[k];
        } else {
            int start = (C.bs1 - C.bs0) / 4;
            int half0 = C.bs0 / 2;
            for (int k = 0; k < half0; k++)
                out[k] = ov[k] * winr[k] + y[start + k] * win[k];
            for (int k = half0; k < out_len; k++)
                out[k] = y[start + k];
        }
        // overlap[:n2] = y[n2:]
        memcpy(ov, y + n2, (size_t)n2 * sizeof(float));
    }
    C.prev_flag = cur ? 1 : 0;
    *out_n = out_len;
    *first = is_first ? 1 : 0;
    return 0;
}

// Clear the lapping state (decoder reset / post-seek; vorbis lib.rs:336).
void sh_vorbis_reset(void* ctx) {
    Ctx& C = *(Ctx*)ctx;
    C.prev_flag = -1;
    if (C.synth_init)
        std::fill(C.overlap.begin(), C.overlap.end(), 0.0f);
}

}  // extern "C"
