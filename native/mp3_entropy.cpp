// MP3 (Layer III) host entropy stage.
//
// Native mirror of symphonia_tpu/codecs/mpa_layer3.py (itself the analog of
// symphonia-bundle-mp3/src/layer3/): frame header + side info + bit
// reservoir + scalefactors + Huffman spectrum + requantize + joint stereo +
// short-block reorder. Emits per-granule-channel float spectra ready for
// the batched device dense stage (ops/mp3_dense.mp3_dense_batch_jax).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

#include "entropy_common.h"
#include "mp3_tables.h"

// Cycle profiler, compile-gated (-DSH_MP3_PROF): 0 total, 1 frame setup
// (header/side-info/reservoir), 2 scalefactors, 3 huffman, 4 requant+
// stereo+reorder.
#ifdef SH_MP3_PROF
#include <x86intrin.h>
namespace {
uint64_t g_mprof[8];
}
extern "C" const uint64_t* sh_mp3_prof() { return g_mprof; }
extern "C" void sh_mp3_prof_reset() { memset(g_mprof, 0, sizeof(g_mprof)); }
#define MPROF_START(x) uint64_t _t_##x = __rdtsc()
#define MPROF_STOP(x, i) g_mprof[i] += __rdtsc() - _t_##x
#else
#define MPROF_START(x)
#define MPROF_STOP(x, i)
#endif

#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__) \
    && defined(__AVX512DQ__)
#define SH_MP3_SIMD 1
#include <x86intrin.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// Bit reader (MSB-first) with peeking for LUT codebook decode.
// ---------------------------------------------------------------------------


// ---------------------------------------------------------------------------
// Two-level LUT codebooks
// ---------------------------------------------------------------------------


struct Mp3Tables {
    Lut big[18];      // tables 0..15 (0/4/14 empty), 16: codes16, 17: codes24
    Lut quads[2];
    // Single-probe 12-bit fast tables for the Huffman hot loop (84% of the
    // host stage when walked through the generic Lut): entry = len<<8 |
    // value, -1 = miss (code longer than 12 bits, or invalid prefix) ->
    // generic Lut path. Every quad code and every big-value code of the
    // small tables fits; only tables 13/15/16/24's long codes miss.
    struct Fast { int32_t t[1 << 12]; };
    Fast fbig[18];
    Fast fquad[2];
#ifdef SH_MP3_SIMD
    // Concatenated copy of fbig for the 8-lane engine's per-lane-offset
    // gather probes (table ti lives at [ti << 12, (ti+1) << 12)).
    int32_t simd[18 << 12];
#endif
    float pow43[8207];
    uint32_t pow43_bits[16];  // f32 bit patterns of pow43[0..15] (fast path)
    float is_ratio_m1[7][2];
    float is_ratio_m2[2][32][2];
    const int32_t kPretab[22] = {0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,3,2,0};

    static void fill_fast(Fast& f, const uint32_t* codes, const uint8_t* lens,
                          const uint16_t* vals, int n) {
        for (int k = 0; k < (1 << 12); k++) f.t[k] = -1;
        for (int i = 0; i < n; i++) {
            int len = lens[i];
            if (len == 0 || len > 12) continue;
            int32_t packed = (len << 8) | vals[i];
            uint32_t base = codes[i] << (12 - len);
            for (uint32_t k = 0; k < (1u << (12 - len)); k++)
                f.t[base + k] = packed;
        }
    }

    void make(int ti, const uint32_t* codes, const uint8_t* lens, int n,
              int wrap) {
        std::vector<uint16_t> vals(n);
        for (int i = 0; i < n; i++) vals[i] = (uint16_t)(((i / wrap) << 4) | (i % wrap));
        big[ti].build(codes, lens, vals.data(), n);
        fill_fast(fbig[ti], codes, lens, vals.data(), n);
    }

    Mp3Tables() {
        make(1, kCodes1, kBits1, 4, 2);
        make(2, kCodes2, kBits2, 9, 3);
        make(3, kCodes3, kBits3, 9, 3);
        make(5, kCodes5, kBits5, 16, 4);
        make(6, kCodes6, kBits6, 16, 4);
        make(7, kCodes7, kBits7, 36, 6);
        make(8, kCodes8, kBits8, 36, 6);
        make(9, kCodes9, kBits9, 36, 6);
        make(10, kCodes10, kBits10, 64, 8);
        make(11, kCodes11, kBits11, 64, 8);
        make(12, kCodes12, kBits12, 64, 8);
        make(13, kCodes13, kBits13, 256, 16);
        make(15, kCodes15, kBits15, 256, 16);
        make(16, kCodes16, kBits16, 256, 16);
        make(17, kCodes24, kBits24, 256, 16);
        {
            std::vector<uint16_t> v(16);
            for (int i = 0; i < 16; i++) v[i] = (uint16_t)i;
            quads[0].build(kQuadsCodesA, kQuadsBitsA, v.data(), 16);
            quads[1].build(kQuadsCodesB, kQuadsBitsB, v.data(), 16);
            fill_fast(fquad[0], kQuadsCodesA, kQuadsBitsA, v.data(), 16);
            fill_fast(fquad[1], kQuadsCodesB, kQuadsBitsB, v.data(), 16);
        }
#ifdef SH_MP3_SIMD
        for (int t = 0; t < 18; t++)
            memcpy(simd + ((size_t)t << 12), fbig[t].t, sizeof(fbig[t].t));
#endif
        for (int i = 0; i < 8207; i++) pow43[i] = (float)pow((double)i, 4.0 / 3.0);
        memcpy(pow43_bits, pow43, sizeof(pow43_bits));
        for (int p = 0; p < 7; p++) {
            double r = tan(p * M_PI / 12.0);
            is_ratio_m1[p][0] = (float)(r / (1.0 + r));
            is_ratio_m1[p][1] = (float)(1.0 / (1.0 + r));
        }
        is_ratio_m1[6][0] = 1.0f; is_ratio_m1[6][1] = 0.0f;
        double scales[2] = {1.0 / sqrt(sqrt(2.0)), 1.0 / sqrt(2.0)};
        for (int s = 0; s < 2; s++)
            for (int p = 0; p < 32; p++) {
                if (p & 1) { is_ratio_m2[s][p][0] = (float)pow(scales[s], (p + 1) / 2.0); is_ratio_m2[s][p][1] = 1.0f; }
                else { is_ratio_m2[s][p][0] = 1.0f; is_ratio_m2[s][p][1] = (float)pow(scales[s], p / 2.0); }
            }
    }
};

const Mp3Tables kT;

// ---------------------------------------------------------------------------
// Header / side info
// ---------------------------------------------------------------------------

struct Hdr {
    int version;  // 1, 2, 3(2.5)
    int layer;
    int64_t bitrate;
    int sample_rate, sr_idx;
    int channel_mode;  // 0 stereo 1 joint 2 dual 3 mono
    int mode_ext;
    bool crc, padding;
    int frame_size;
    int n_ch() const { return channel_mode == 3 ? 1 : 2; }
    bool mpeg1() const { return version == 1; }
    bool intensity() const { return channel_mode == 1 && (mode_ext & 1); }
    bool mid_side() const { return channel_mode == 1 && (mode_ext & 2); }
    int side_len() const { return mpeg1() ? (n_ch() == 1 ? 17 : 32) : (n_ch() == 1 ? 9 : 17); }
};

bool parse_hdr(const uint8_t* d, Hdr* h) {
    uint32_t w = (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3];
    if (((w >> 21) & 0x7FF) != 0x7FF) return false;
    int vb = (w >> 19) & 3;
    if (vb == 1) return false;
    h->version = vb == 3 ? 1 : (vb == 2 ? 2 : 3);
    int lb = (w >> 17) & 3;
    if (lb != 1) return false;  // Layer III only here
    h->layer = 3;
    h->crc = !((w >> 16) & 1);
    int bi = (w >> 12) & 0xF;
    if (bi == 0 || bi == 15) return false;
    int ri = (w >> 10) & 3;
    if (ri == 3) return false;
    h->padding = (w >> 9) & 1;
    h->channel_mode = (w >> 6) & 3;
    h->mode_ext = (w >> 4) & 3;
    if ((w & 3) == 2) return false;
    static const int rates[3][3] = {{44100, 48000, 32000}, {22050, 24000, 16000}, {11025, 12000, 8000}};
    h->sample_rate = rates[h->version - 1][ri];
    h->bitrate = (h->version == 1 ? kBitRatesMpeg1L3 : kBitRatesMpeg2L23)[bi];
    static const int sfb_row[3][3] = {{0, 1, 2}, {3, 4, 5}, {6, 7, 8}};
    h->sr_idx = sfb_row[h->version - 1][ri];
    int spf = h->version == 1 ? 1152 : 576;
    h->frame_size = (int)(spf / 8 * h->bitrate / h->sample_rate) + (h->padding ? 1 : 0);
    return true;
}

struct GrChan {
    int part23, big_values, global_gain, scalefac_compress;
    int block_type;  // 0 long 1 start 2 short 3 end
    bool mixed;
    int table_select[3], subblock_gain[3];
    int region1_start, region2_start;
    bool preflag, scalefac_scale;
    int count1table;
    int scalefacs[40];
    int rzero;
};

bool read_side_info(Bits& bs, const Hdr& h, int* main_data_begin, bool scfsi[2][4],
                    GrChan gr[2][2]) {
    int n_ch = h.n_ch();
    const int32_t* sfb_long = kSfbLong + h.sr_idx * 23;
    if (h.mpeg1()) {
        *main_data_begin = bs.read(9);
        bs.read(n_ch == 1 ? 5 : 3);
        for (int ch = 0; ch < n_ch; ch++)
            for (int i = 0; i < 4; i++) scfsi[ch][i] = bs.read(1);
    } else {
        *main_data_begin = bs.read(8);
        bs.read(n_ch == 1 ? 1 : 2);
        for (int ch = 0; ch < 2; ch++) for (int i = 0; i < 4; i++) scfsi[ch][i] = false;
    }
    int n_gr = h.mpeg1() ? 2 : 1;
    for (int g = 0; g < n_gr; g++)
        for (int ch = 0; ch < n_ch; ch++) {
            GrChan& c = gr[g][ch];
            memset(c.scalefacs, 0, sizeof(c.scalefacs));
            c.part23 = bs.read(12);
            c.big_values = bs.read(9);
            if (c.big_values > 288) return false;
            c.global_gain = bs.read(8);
            c.scalefac_compress = bs.read(h.mpeg1() ? 4 : 9);
            bool wsf = bs.read(1);
            if (wsf) {
                int bt = bs.read(2);
                bool mixed = bs.read(1);
                if (bt == 0) return false;
                c.block_type = bt == 1 ? 1 : (bt == 2 ? 2 : 3);
                c.mixed = mixed && c.block_type == 2;
                c.table_select[0] = bs.read(5);
                c.table_select[1] = bs.read(5);
                c.table_select[2] = 0;
                for (int i = 0; i < 3; i++) c.subblock_gain[i] = bs.read(3);
                if (h.version == 3) {
                    int r0 = (c.block_type == 2 && !c.mixed) ? 6 : 8;
                    c.region1_start = sfb_long[r0];
                } else if (h.mpeg1() || bt == 2) {
                    c.region1_start = 36;
                } else {
                    c.region1_start = 54;
                }
                c.region2_start = 576;
            } else {
                c.block_type = 0;
                c.mixed = false;
                for (int i = 0; i < 3; i++) c.table_select[i] = bs.read(5);
                for (int i = 0; i < 3; i++) c.subblock_gain[i] = 0;
                int r0 = bs.read(4) + 1;
                int r01 = bs.read(3) + r0 + 1;
                c.region1_start = sfb_long[r0];
                c.region2_start = r01 <= 22 ? sfb_long[r01] : 576;
            }
            c.preflag = h.mpeg1() ? bs.read(1) : false;
            c.scalefac_scale = bs.read(1);
            c.count1table = bs.read(1);
        }
    return !bs.error;
}

int read_scf_mpeg1(Bits& bs, int g, int ch, bool scfsi[2][4], GrChan gr[2][2]) {
    GrChan& c = gr[g][ch];
    int slen1 = kSlen[c.scalefac_compress * 2];
    int slen2 = kSlen[c.scalefac_compress * 2 + 1];
    int bits = 0;
    if (c.block_type == 2) {
        int n_sfb = c.mixed ? 8 + 9 : 18;
        if (slen1) { for (int i = 0; i < n_sfb; i++) c.scalefacs[i] = bs.read(slen1); bits += n_sfb * slen1; }
        if (slen2) { for (int i = n_sfb; i < n_sfb + 18; i++) c.scalefacs[i] = bs.read(slen2); bits += 18 * slen2; }
    } else {
        static const int ranges[4][2] = {{0, 6}, {6, 11}, {11, 16}, {16, 21}};
        for (int i = 0; i < 4; i++) {
            int slen = i < 2 ? slen1 : slen2;
            if (g > 0 && scfsi[ch][i]) {
                for (int s = ranges[i][0]; s < ranges[i][1]; s++)
                    c.scalefacs[s] = gr[0][ch].scalefacs[s];
            } else if (slen) {
                for (int s = ranges[i][0]; s < ranges[i][1]; s++) c.scalefacs[s] = bs.read(slen);
                bits += slen * (ranges[i][1] - ranges[i][0]);
            }
        }
    }
    return bits;
}

int read_scf_mpeg2(Bits& bs, bool is_intensity, GrChan& c) {
    int block_index = (c.block_type == 2 && c.mixed) ? 2 : (c.block_type == 2 ? 1 : 0);
    int slens[4];
    const int32_t* nsfb;
    if (is_intensity) {
        int sfc = c.scalefac_compress >> 1;
        if (sfc < 180) {
            slens[0] = sfc / 36; slens[1] = (sfc % 36) / 6; slens[2] = (sfc % 36) % 6; slens[3] = 0;
            nsfb = kNsfb + (0 * 3 + block_index) * 4;
        } else if (sfc < 244) {
            slens[0] = ((sfc - 180) % 64) >> 4; slens[1] = ((sfc - 180) % 16) >> 2; slens[2] = (sfc - 180) % 4; slens[3] = 0;
            nsfb = kNsfb + (1 * 3 + block_index) * 4;
        } else {
            slens[0] = (sfc - 244) / 3; slens[1] = (sfc - 244) % 3; slens[2] = 0; slens[3] = 0;
            nsfb = kNsfb + (2 * 3 + block_index) * 4;
        }
    } else {
        int sfc = c.scalefac_compress;
        c.preflag = sfc >= 500;
        if (sfc < 400) {
            slens[0] = (sfc >> 4) / 5; slens[1] = (sfc >> 4) % 5; slens[2] = (sfc % 16) >> 2; slens[3] = sfc % 4;
            nsfb = kNsfb + (3 * 3 + block_index) * 4;
        } else if (sfc < 500) {
            slens[0] = ((sfc - 400) >> 2) / 5; slens[1] = ((sfc - 400) >> 2) % 5; slens[2] = (sfc - 400) % 4; slens[3] = 0;
            nsfb = kNsfb + (4 * 3 + block_index) * 4;
        } else {
            slens[0] = (sfc - 500) / 3; slens[1] = (sfc - 500) % 3; slens[2] = 0; slens[3] = 0;
            nsfb = kNsfb + (5 * 3 + block_index) * 4;
        }
    }
    int bits = 0, start = 0;
    for (int i = 0; i < 4; i++) {
        int slen = slens[i], n = nsfb[i];
        if (slen) {
            for (int s = start; s < start + n; s++) c.scalefacs[s] = bs.read(slen);
            bits += slen * n;
        }
        start += n;
    }
    return bits;
}

// Huffman spectrum (requantize.rs:47 mirror). The hot loops keep the bit
// window in registers and decode through the 12-bit single-probe fast
// tables; the generic Lut runs only on misses (long codes of tables
// 13/15/16/24) and near the buffer tail.
bool read_huffman(Bits& bs, GrChan& c, int part3, float* buf) {
    memset(buf, 0, 576 * sizeof(float));
    if (part3 == 0) { c.rzero = 0; return true; }
    int64_t start_bits = bs.bits_read();
    int i = 0;
    int bvlen = 2 * c.big_values;
    bool err = false;
    int regions[3] = {
        c.region1_start < bvlen ? c.region1_start : bvlen,
        c.region2_start < bvlen ? c.region2_start : bvlen,
        bvlen < 576 ? bvlen : 576,
    };
    uint64_t w = bs.buf;
    int cnt = bs.cnt;
    int64_t pos = bs.pos;
    MPROF_START(bigv);
    for (int r = 0; r < 3; r++) {
        int ts = c.table_select[r];
        int linbits = kLinbits[ts];
        if (ts == 0 || ts == 4 || ts == 14) { if (i < regions[r]) i = regions[r]; continue; }
        int ti = ts <= 15 ? ts : (ts <= 23 ? 16 : 17);
        const Lut* cb = &kT.big[ti];
        const int32_t* ft = kT.fbig[ti].t;
        while (i < regions[r] && pos * 8 - cnt - start_bits < part3) {
            if (cnt < 32 && pos + 8 <= bs.len) {
                int nbytes = (63 - cnt) >> 3;
                uint64_t v;
                memcpy(&v, bs.data + pos, 8);
                v = __builtin_bswap64(v);
                w = (w << (nbytes * 8)) | (v >> (64 - nbytes * 8));
                pos += nbytes;
                cnt += nbytes * 8;
            }
#ifdef SH_MP3_PROF
            g_mprof[7]++;
#endif
            int32_t e = cnt >= 32 ? ft[(uint32_t)(w >> (cnt - 12)) & 4095] : -1;
            int x, y;
            if (__builtin_expect(e >= 0, 1)) {
                x = (e >> 4) & 15;
                y = e & 15;
                if (__builtin_expect(((x == 15) | (y == 15)) & (linbits != 0),
                                     0)) {
                    // Escape magnitudes: rare, run through the guarded
                    // reader (linbits <= 13 each plus signs).
                    cnt -= e >> 8;
                    w &= (1ULL << cnt) - 1;
                    bs.buf = w; bs.cnt = cnt; bs.pos = pos;
                    if (x == 15) x += bs.read(linbits);
                    if (x) buf[i] = bs.read(1) ? -kT.pow43[x] : kT.pow43[x];
                    i++;
                    if (y == 15) y += bs.read(linbits);
                    if (y) buf[i] = bs.read(1) ? -kT.pow43[y] : kT.pow43[y];
                    i++;
                    w = bs.buf; cnt = bs.cnt; pos = bs.pos;
                    continue;
                }
                // Branchless pair emit: consume the code and the 0-2 sign
                // bits, build the f32 bit patterns directly (absent values
                // store +0.0, identical to the memset fill).
                cnt -= e >> 8;
                uint32_t hx = x != 0, hy = y != 0;
                cnt -= hx;
                uint32_t bx = kT.pow43_bits[x]
                              | (((uint32_t)(w >> cnt) & hx) << 31);
                memcpy(&buf[i], &bx, 4);
                cnt -= hy;
                uint32_t by = kT.pow43_bits[y]
                              | (((uint32_t)(w >> cnt) & hy) << 31);
                memcpy(&buf[i + 1], &by, 4);
                w &= (1ULL << cnt) - 1;
                i += 2;
                continue;
            }
            // Long code or buffer tail: generic guarded path.
            bs.buf = w; bs.cnt = cnt; bs.pos = pos;
            int v = cb->decode(bs, &err);
            if (err || bs.error) return false;
            x = v >> 4;
            y = v & 0xF;
            if (x) {
                if (x == 15 && linbits) x += bs.read(linbits);
                buf[i] = bs.read(1) ? -kT.pow43[x] : kT.pow43[x];
            }
            i++;
            if (y) {
                if (y == 15 && linbits) y += bs.read(linbits);
                buf[i] = bs.read(1) ? -kT.pow43[y] : kT.pow43[y];
            }
            i++;
            w = bs.buf; cnt = bs.cnt; pos = bs.pos;
        }
    }
    MPROF_STOP(bigv, 5);
    MPROF_START(c1);
    const Lut& cb1 = kT.quads[c.count1table];
    const int32_t* fq = kT.fquad[c.count1table].t;
    while (i <= 572 && pos * 8 - cnt - start_bits < part3) {
        if (cnt < 32 && pos + 8 <= bs.len) {
            int nbytes = (63 - cnt) >> 3;
            uint64_t v;
            memcpy(&v, bs.data + pos, 8);
            v = __builtin_bswap64(v);
            w = (w << (nbytes * 8)) | (v >> (64 - nbytes * 8));
            pos += nbytes;
            cnt += nbytes * 8;
        }
        int32_t e = cnt >= 32 ? fq[(uint32_t)(w >> (cnt - 12)) & 4095] : -1;
        if (__builtin_expect(e >= 0, 1)) {
            cnt -= e >> 8;
            uint32_t v = (uint32_t)e & 15;
            for (int j = 0; j < 4; j++) {
                uint32_t present = (v >> (3 - j)) & 1;
                cnt -= present;
                uint32_t b = present * 0x3F800000u  // +-1.0f
                             | (((uint32_t)(w >> cnt) & present) << 31);
                memcpy(&buf[i + j], &b, 4);
            }
            w &= (1ULL << cnt) - 1;
            i += 4;
            continue;
        }
        bs.buf = w; bs.cnt = cnt; bs.pos = pos;
        int v = cb1.decode(bs, &err);
        if (err || bs.error) return false;
        static const int offs[4] = {0x8, 0x4, 0x2, 0x1};
        for (int j = 0; j < 4; j++)
            if (v & offs[j]) buf[i + j] = bs.read(1) ? -1.0f : 1.0f;
        i += 4;
        w = bs.buf; cnt = bs.cnt; pos = bs.pos;
    }
    MPROF_STOP(c1, 6);
    bs.buf = w; bs.cnt = cnt; bs.pos = pos;
    int64_t bits_read = bs.bits_read() - start_bits;
    if (bits_read < part3) bs.ignore(part3 - bits_read);
    else if (bits_read > part3 && i > bvlen) { i -= 4; for (int j = 0; j < 4; j++) buf[i + j] = 0; }
    c.rzero = i;
    return true;
}

void requantize(const Hdr& h, GrChan& c, float* buf) {
    int a = c.global_gain - 210;
    int shift = c.scalefac_scale ? 2 : 1;
    auto req_long = [&](const int32_t* bands, int n_bands) {
        for (int i = 0; i < n_bands; i++) {
            int s = bands[i], e = bands[i + 1];
            if (s >= c.rzero) break;
            int pre = c.preflag ? kT.kPretab[i] : 0;
            int b = (c.scalefacs[i] + pre) << shift;
            float m = (float)pow(2.0, 0.25 * (a - b));
            int end = e < c.rzero ? e : c.rzero;
            for (int k = s; k < end; k++) buf[k] *= m;
        }
    };
    auto req_short = [&](const int32_t* bands, int n_entries, int sw) {
        for (int i = 0; i < n_entries - 1; i++) {
            int s = bands[i], e = bands[i + 1];
            if (s >= c.rzero) break;
            int b = c.scalefacs[sw + i] << shift;
            int aa = a - 8 * c.subblock_gain[i % 3];
            float m = (float)pow(2.0, 0.25 * (aa - b));
            int end = e < c.rzero ? e : c.rzero;
            for (int k = s; k < end; k++) buf[k] *= m;
        }
    };
    if (c.block_type == 2 && !c.mixed) {
        req_short(kSfbShort + h.sr_idx * 40, 40, 0);
    } else if (c.block_type == 2) {
        const int32_t* bands = kSfbMixed[h.sr_idx];
        int len = kSfbMixedLen[h.sr_idx];
        int sw = kSfbMixedSwitch[h.sr_idx];
        req_long(bands, sw);
        req_short(bands + sw, len - sw, sw);
    } else {
        req_long(kSfbLong + h.sr_idx * 23, 22);
    }
}

void reorder(const Hdr& h, GrChan& c, float* buf) {
    if (c.block_type != 2) return;
    const int32_t* bands;
    int n, start_idx;
    if (c.mixed) {
        int sw = kSfbMixedSwitch[h.sr_idx];
        bands = kSfbMixed[h.sr_idx] + sw;
        n = kSfbMixedLen[h.sr_idx] - sw;
    } else {
        bands = kSfbShort + h.sr_idx * 40;
        n = 40;
    }
    float tmp[576];
    int start = bands[0];
    int i = start;
    for (int bi = 0; bi + 3 < n; bi += 3) {
        int s0 = bands[bi], s1 = bands[bi + 1], s2 = bands[bi + 2], s3 = bands[bi + 3];
        if (s0 >= c.rzero) break;
        int w = s1 - s0;
        for (int k = 0; k < w; k++) {
            tmp[i++] = buf[s0 + k];
            tmp[i++] = buf[s1 + k];
            tmp[i++] = buf[s2 + k];
        }
    }
    memcpy(buf + start, tmp + start, (i - start) * sizeof(float));
    if (c.rzero < i) c.rzero = i;
}

bool band_zero(const float* p, int n) { for (int i = 0; i < n; i++) if (p[i] != 0) return false; return true; }

void mid_side(float* c0, float* c1, int n) {
    const float s = (float)(1.0 / sqrt(2.0));
    for (int i = 0; i < n; i++) {
        float l = (c0[i] + c1[i]) * s, r = (c0[i] - c1[i]) * s;
        c0[i] = l; c1[i] = r;
    }
}

void apply_intensity(int pos, const float (*table)[2], int inv_pos, bool ms,
                     float* c0, float* c1, int n) {
    if (pos < inv_pos) {
        float kl = table[pos][0], kr = table[pos][1];
        for (int i = 0; i < n; i++) { float v = c0[i]; c0[i] = kl * v; c1[i] = kr * v; }
    } else if (ms) {
        mid_side(c0, c1, n);
    }
}

void stereo(const Hdr& h, GrChan gr[2], float* ch0, float* ch1) {
    if (h.channel_mode != 1) return;
    bool ms = h.mid_side(), inten = h.intensity();
    if (!ms && !inten) return;
    GrChan& c1 = gr[1];
    int end = gr[0].rzero > c1.rzero ? gr[0].rzero : c1.rzero;
    const float (*table)[2];
    int inv_pos;
    if (h.mpeg1()) { table = kT.is_ratio_m1; inv_pos = 7; }
    else { table = kT.is_ratio_m2[c1.scalefac_compress & 1]; inv_pos = 31; }
    int bound = end;
    if (inten) {
        if (c1.block_type == 2) {
            const int32_t* short_bands;
            const int32_t* long_bands = nullptr;
            int n_short, sfi, n_long = 0;
            if (c1.mixed) {
                int sw = kSfbMixedSwitch[h.sr_idx];
                int len = kSfbMixedLen[h.sr_idx];
                short_bands = kSfbMixed[h.sr_idx] + sw;
                n_short = len - sw;
                long_bands = kSfbMixed[h.sr_idx];
                n_long = sw + 1;
                sfi = len - 1;
            } else {
                short_bands = kSfbShort + h.sr_idx * 40;
                n_short = 40;
                sfi = 39;
            }
            int is_pos[39];
            for (int i = 0; i < 36; i++) is_pos[i] = c1.scalefacs[i];
            for (int i = 36; i < 39; i++) is_pos[i] = c1.scalefacs[i - 3];
            bool wz[3] = {true, true, true};
            bool found = false;
            for (int bi = (n_short - 1) / 3 * 3 - 3; bi >= 0; bi -= 3) {
                int s[4] = {short_bands[bi], short_bands[bi + 1], short_bands[bi + 2], short_bands[bi + 3]};
                for (int w = 2; w >= 0; w--) {
                    int lo = s[w], hi = s[w + 1];
                    wz[w] = wz[w] && band_zero(ch1 + lo, hi - lo);
                    if (wz[w]) apply_intensity(is_pos[sfi - 1], table, inv_pos, ms, ch0 + lo, ch1 + lo, hi - lo);
                    else if (ms) mid_side(ch0 + lo, ch1 + lo, hi - lo);
                    sfi--;
                }
                bound = s[0];
                found = !wz[0] && !wz[1] && !wz[2];
                if (found) break;
            }
            if (!found && long_bands) {
                for (int i = n_long - 2; i >= 0; i--) {
                    int s = long_bands[i], e = long_bands[i + 1];
                    if (!band_zero(ch1 + s, e - s)) break;
                    apply_intensity(is_pos[sfi - 1], table, inv_pos, ms, ch0 + s, ch1 + s, e - s);
                    sfi--;
                    bound = s;
                }
            }
        } else {
            const int32_t* bands = kSfbLong + h.sr_idx * 23;
            int is_pos[22];
            for (int i = 0; i < 22; i++) is_pos[i] = c1.scalefacs[i];
            is_pos[21] = is_pos[20];
            for (int i = 21; i >= 0; i--) {
                int s = bands[i], e = bands[i + 1];
                bool z = s >= c1.rzero || band_zero(ch1 + s, e - s);
                if (!z) break;
                apply_intensity(is_pos[i], table, inv_pos, ms, ch0 + s, ch1 + s, e - s);
                bound = s;
            }
        }
    }
    if (ms && bound > 0) mid_side(ch0, ch1, bound);
    if (inten || ms) { gr[0].rzero = end; gr[1].rzero = end; }
}


// ---------------------------------------------------------------------------
// 8-lane AVX-512 gather engine for the big-values Huffman stage.
//
// Lanes are FRAMES: granule-channels within a frame are bit-sequential
// (an overrunning count1 partition leaves the reader PAST the granule
// boundary, so the next scalefactor read is path-dependent — granule
// starts cannot be precomputed). Each lane walks its frame's
// granule-channels with the scalar machinery (scalefactors, count1 quads,
// epilogue — measured 0.3-5% of the stage) and hands the big-values pair
// spans (80% of the stage) to the vector burst. Spans are STATIC per
// granule-channel (region boundaries come from side info), unlike AAC's
// dynamic section plans.
//
// The burst keeps per-lane bit windows LEFT-aligned in ZMM lanes with the
// phase-locked all-lane refill (see symphonia_host.cpp), probes the
// concatenated 12-bit fast tables with one gather, decodes linbits
// escapes and sign bits in-vector, and emits both values of a pair as
// signed int16 quants in one 32-bit scatter (pair spans start even).
// A vectorized pass then materializes f32 +-|q|^(4/3) from the same
// pow43 table the scalar path reads — bit-identical output.
// Freeze/service reasons: span or budget boundary (scalar advance),
// fast-table miss (codes > 12 bits), segment-tail reads (guarded Bits).
#ifdef SH_MP3_SIMD

struct Mp3FrameJob {
    int64_t seg_ofs, seg_len;
    Hdr h;
    bool scfsi[2][4];
    GrChan gr[2][2];
    int n_gr, n_ch, qslot;  // qslot: granule index into the qbuf arena
    int fidx;
    int status;  // 0 ok so far; <0 mirrors the scalar statuses
};

struct Mp3Lane {
    Mp3FrameJob* job = nullptr;
    Bits br{nullptr, 0};
    const uint8_t* seg = nullptr;
    int64_t seg_len = 0;
    int gc = 0;  // granule-channel cursor: g = gc / n_ch, ch = gc % n_ch
    bool gc_open = false;  // mid-granule (spans built, scf consumed)
    int64_t huff_start = 0, part3 = 0;
    struct Span { int end_i, ti, linbits; bool skip; };
    Span spans[3];
    int n_spans = 0, si = 0;
    int i = 0, bvlen = 0;
    int16_t* q = nullptr;
    GrChan* c = nullptr;
};

// Scalar decode of ONE big-values pair through the guarded two-level Lut
// (fast-table miss or segment tail). Mirrors the generic path of
// read_huffman exactly; emits signed int16 quants.
static int mp3_service_pair(Mp3Lane& L) {
    const Mp3Lane::Span& S = L.spans[L.si];
    bool err = false;
    int v = kT.big[S.ti].decode(L.br, &err);
    if (err || L.br.error) return 0;
    int x = v >> 4, y = v & 0xF;
    int16_t qx = 0, qy = 0;
    if (x) {
        if (x == 15 && S.linbits) x += L.br.read(S.linbits);
        qx = (int16_t)(L.br.read(1) ? -x : x);
    }
    if (y) {
        if (y == 15 && S.linbits) y += L.br.read(S.linbits);
        qy = (int16_t)(L.br.read(1) ? -y : y);
    }
    L.q[L.i] = qx;
    L.q[L.i + 1] = qy;
    L.i += 2;
    return 1;
}

// count1 quads + part3 under/overrun epilogue for the current
// granule-channel (mirrors the tail of read_huffman; int16 emission).
// Returns false on an invalid-prefix decode error (frame status -5);
// stream-tail bit errors propagate through br.error to the next
// scalefactor read, like the scalar path.
static bool mp3_lane_count1_epilogue(Mp3Lane& L) {
    Bits& bs = L.br;
    const Lut& cb1 = kT.quads[L.c->count1table];
    bool err = false;
    int64_t bits_read = bs.bits_read() - L.huff_start;
    while (L.i <= 572 && bits_read < L.part3) {
        int v = cb1.decode(bs, &err);
        if (err || bs.error) return false;
        static const int offs[4] = {0x8, 0x4, 0x2, 0x1};
        for (int j = 0; j < 4; j++) {
            int16_t val = 0;
            if (v & offs[j]) val = (int16_t)(bs.read(1) ? -1 : 1);
            L.q[L.i + j] = val;
        }
        L.i += 4;
        bits_read = bs.bits_read() - L.huff_start;
    }
    if (bits_read < L.part3) {
        bs.ignore(L.part3 - bits_read);
    } else if (bits_read > L.part3 && L.i > L.bvlen) {
        L.i -= 4;
        for (int j = 0; j < 4; j++) L.q[L.i + j] = 0;
    }
    L.c->rzero = L.i;
    return true;
}

// Advance a lane to its next vector-ready position: mid pair span, within
// the part3 budget. Runs scalefactors / count1 / epilogues / frame loads
// as needed. Returns false when the job queue is exhausted for this lane.
static bool mp3_lane_ready(Mp3Lane& L, Mp3FrameJob* jobs, int n_jobs,
                           int* next_job, const uint8_t* arena,
                           int16_t* qbufs) {
    for (;;) {
        if (!L.job) {
            int j = (*next_job)++;
            if (j >= n_jobs) return false;
            L.job = &jobs[j];
            L.seg = arena + L.job->seg_ofs;
            L.seg_len = L.job->seg_len;
            L.br = Bits(L.seg, L.seg_len);
            L.gc = 0;
            L.gc_open = false;
        }
        Mp3FrameJob& J = *L.job;
        if (J.status != 0 || L.gc >= J.n_gr * J.n_ch) {
            L.job = nullptr;
            continue;
        }
        if (!L.gc_open) {
            int g = L.gc / J.n_ch, ch = L.gc % J.n_ch;
            L.c = &J.gr[g][ch];
            GrChan& c = *L.c;
            int part2 = J.h.mpeg1()
                            ? read_scf_mpeg1(L.br, g, ch, J.scfsi, J.gr)
                            : read_scf_mpeg2(L.br, (ch == 1) && J.h.intensity(), c);
            int64_t part3 = (int64_t)c.part23 - part2;
            if (part3 < 0 || L.br.error) {
                J.status = -5;
                L.job = nullptr;
                continue;
            }
            L.q = qbufs + ((size_t)(J.qslot + g) * 2 + ch) * 576;
            if (part3 == 0) {
                c.rzero = 0;
                L.gc++;
                continue;
            }
            L.huff_start = L.br.bits_read();
            L.part3 = part3;
            L.bvlen = 2 * c.big_values;
            int regions[3] = {
                c.region1_start < L.bvlen ? c.region1_start : L.bvlen,
                c.region2_start < L.bvlen ? c.region2_start : L.bvlen,
                L.bvlen < 576 ? L.bvlen : 576,
            };
            L.n_spans = 0;
            int cur = 0;
            for (int r = 0; r < 3; r++) {
                if (regions[r] <= cur) continue;
                int ts = J.gr[g][ch].table_select[r];
                bool skip = (ts == 0 || ts == 4 || ts == 14);
                int ti = ts <= 15 ? ts : (ts <= 23 ? 16 : 17);
                L.spans[L.n_spans++] = Mp3Lane::Span{
                    regions[r], ti, skip ? 0 : kLinbits[ts], skip};
                cur = regions[r];
            }
            L.si = 0;
            L.i = 0;
            L.gc_open = true;
        }
        // Mid-granule: walk spans mirroring the scalar region loop (skip
        // regions jump i even after budget exhaustion; decode regions
        // no-op then).
        if (L.si >= L.n_spans) {
            bool ok = mp3_lane_count1_epilogue(L);
            if (!ok) { L.job->status = -5; L.job = nullptr; continue; }
            L.gc_open = false;
            L.gc++;
            continue;
        }
        const Mp3Lane::Span& S = L.spans[L.si];
        if (S.skip) {
            if (L.i < S.end_i) L.i = S.end_i;
            L.si++;
            continue;
        }
        if (L.i >= S.end_i ||
            L.br.bits_read() - L.huff_start >= L.part3) {
            L.si++;
            continue;
        }
        return true;
    }
}

// Vectorized f32 materialization: buf[i] = sign(q) * pow43[|q|], the same
// table values (and exact sign flip) the scalar emit produces.
static void mp3_dequant_gc(const int16_t* q, float* buf) {
    for (int i = 0; i < 576; i += 16) {
        __m256i q16 = _mm256_loadu_si256((const __m256i*)(q + i));
        __m512i qi = _mm512_cvtepi16_epi32(q16);
        __m512i mag = _mm512_abs_epi32(qi);
        __m512 p = _mm512_i32gather_ps(mag, kT.pow43, 4);
        __m512i bits = _mm512_castps_si512(p);
        bits = _mm512_or_si512(
            bits, _mm512_and_si512(qi, _mm512_set1_epi32(0x80000000u)));
        _mm512_storeu_si512((void*)(buf + i), bits);
    }
}

// The 8-lane burst. Decodes every job's big-values spectrum into qbufs;
// scalar machinery runs in the service path between spans/granules.
static void mp3_huffman_simd8(Mp3FrameJob* jobs, int n_jobs,
                              const uint8_t* arena, int16_t* qbufs) {
    constexpr int K = 8;
    Mp3Lane lanes[K];
    int next_job = 0;
    alignas(64) int64_t buf_a[K], cnt_a[K], pos_a[K], i_a[K], end_a[K];
    alignas(64) int64_t tofs_a[K], lin_a[K], lim_a[K], q_a[K], segend_a[K];
    uint8_t reason[K] = {0};  // 1 = service one pair (miss/tail)
    __mmask8 dead = 0;

    auto sync_from_lane = [&](int l) {
        Mp3Lane& L = lanes[l];
        buf_a[l] = (int64_t)L.br.buf;
        cnt_a[l] = L.br.cnt;
        pos_a[l] = (int64_t)(L.seg + L.br.pos);
        i_a[l] = L.i;
        end_a[l] = L.spans[L.si].end_i;
        tofs_a[l] = (int64_t)L.spans[L.si].ti << 12;
        lin_a[l] = L.spans[L.si].linbits;
        lim_a[l] = ((int64_t)(L.seg - arena) << 3) + L.huff_start + L.part3;
        q_a[l] = (int64_t)L.q;
        segend_a[l] = (int64_t)(L.seg + L.seg_len);
    };
    auto sync_to_lane = [&](int l) {
        Mp3Lane& L = lanes[l];
        L.br.pos = pos_a[l] - (int64_t)L.seg;
        L.br.cnt = (int)cnt_a[l];
        L.br.buf = (uint64_t)buf_a[l];
        L.br.error = false;
        L.i = (int)i_a[l];
    };

    for (int l = 0; l < K; l++) {
        if (mp3_lane_ready(lanes[l], jobs, n_jobs, &next_job, arena, qbufs))
            sync_from_lane(l);
        else
            dead |= (__mmask8)(1u << l);
    }
    if (dead == 0xFF) return;

    const __m512i vz = _mm512_setzero_si512();
    const __m512i v1 = _mm512_set1_epi64(1);
    const __m512i v8 = _mm512_set1_epi64(8);
    const __m512i v15 = _mm512_set1_epi64(15);
    const __m512i v40 = _mm512_set1_epi64(40);
    const __m512i v63 = _mm512_set1_epi64(63);
    const __m512i v64 = _mm512_set1_epi64(64);
    const __m512i vall1 = _mm512_set1_epi64(-1);
    const __m512i bsw = _mm512_broadcast_i32x4(
        _mm_set_epi8(8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7));
    const int64_t arena8 = (int64_t)arena << 3;

    for (;;) {
        // Load committed state (windows ride left-aligned like the AAC
        // engine: constant-shift probe, single-shift consume).
        __m512i cntv = _mm512_load_si512(cnt_a);
        __m512i topv = _mm512_sllv_epi64(_mm512_load_si512(buf_a),
                                         _mm512_sub_epi64(v64, cntv));
        __m512i posv = _mm512_load_si512(pos_a);
        __m512i iv = _mm512_load_si512(i_a);
        __m512i endv = _mm512_load_si512(end_a);
        __m512i tofsv = _mm512_load_si512(tofs_a);
        __m512i linv = _mm512_load_si512(lin_a);
        __m512i limv = _mm512_load_si512(lim_a);
        __m512i qv = _mm512_load_si512(q_a);
        __m512i segendv = _mm512_load_si512(segend_a);
        __mmask8 linm = _mm512_test_epi64_mask(linv, vall1);
        __mmask8 freeze = 0;
        __mmask8 advance = 0;

        for (;;) {
            __mmask8 act = (__mmask8)(0xFF & ~dead & ~freeze & ~advance);
            // (0) span end / part3 budget out -> scalar advance.
            __m512i bitsv = _mm512_sub_epi64(
                _mm512_sub_epi64(_mm512_slli_epi64(posv, 3),
                                 _mm512_set1_epi64(arena8)),
                cntv);
            __mmask8 adv = _mm512_mask_cmpge_epi64_mask(act, bitsv, limv) |
                           _mm512_mask_cmpge_epi64_mask(act, iv, endv);
            advance |= adv;
            act &= ~adv;
            if (!act) break;
            // (1) phase-locked all-lane refill; segment tails freeze.
            __mmask8 need = _mm512_mask_cmplt_epi64_mask(act, cntv, v40);
            if (need) {
                __mmask8 tailm = _mm512_mask_cmpgt_epi64_mask(
                    act, _mm512_add_epi64(posv, v8), segendv);
                __mmask8 tf = need & tailm;
                if (tf) {
                    for (int l = 0; l < K; l++)
                        if ((tf >> l) & 1) reason[l] = 1;
                    freeze |= tf;
                    act &= ~tf;
                    if (!act) break;
                }
                __mmask8 rf = act & ~tailm;
                if (rf) {
                    __m512i w =
                        _mm512_mask_i64gather_epi64(vz, rf, posv, nullptr, 1);
                    w = _mm512_shuffle_epi8(w, bsw);
                    __m512i nbytes =
                        _mm512_srli_epi64(_mm512_sub_epi64(v63, cntv), 3);
                    __m512i nbits = _mm512_slli_epi64(nbytes, 3);
                    __m512i wk = _mm512_and_si512(
                        w, _mm512_sllv_epi64(vall1,
                                             _mm512_sub_epi64(v64, nbits)));
                    __m512i merged =
                        _mm512_or_si512(topv, _mm512_srlv_epi64(wk, cntv));
                    topv = _mm512_mask_mov_epi64(topv, rf, merged);
                    posv = _mm512_mask_add_epi64(posv, rf, posv, nbytes);
                    cntv = _mm512_mask_add_epi64(cntv, rf, cntv, nbits);
                }
            }
            // (2) probe the concatenated 12-bit fast tables.
            __m512i idx = _mm512_add_epi64(_mm512_srli_epi64(topv, 52),
                                           tofsv);
            __m256i e32 = _mm512_mask_i64gather_epi32(
                _mm256_setzero_si256(), act, idx, kT.simd, 4);
            __m512i e64 = _mm512_cvtepi32_epi64(e32);
            __mmask8 miss = _mm512_mask_cmplt_epi64_mask(act, e64, vz);
            if (miss) {
                for (int l = 0; l < K; l++)
                    if ((miss >> l) & 1) reason[l] = 1;
                freeze |= miss;
                act &= ~miss;
                if (!act) break;
            }
            // (3) consume the code, split the pair.
            __m512i len = _mm512_and_si512(_mm512_srli_epi64(e64, 8), v15);
            __m512i x = _mm512_and_si512(_mm512_srli_epi64(e64, 4), v15);
            __m512i y = _mm512_and_si512(e64, v15);
            __m512i top2 = _mm512_sllv_epi64(topv, len);
            __m512i cnt2 = _mm512_sub_epi64(cntv, len);
            // (4) x: linbits escape (x == 15 on a linbits table), sign.
            __mmask8 ex = _mm512_mask_cmpeq_epi64_mask(linm & act, x, v15);
            __m512i lbx = _mm512_maskz_mov_epi64(ex, linv);
            __m512i xl =
                _mm512_srlv_epi64(top2, _mm512_sub_epi64(v64, lbx));
            top2 = _mm512_sllv_epi64(top2, lbx);
            cnt2 = _mm512_sub_epi64(cnt2, lbx);
            __m512i xt = _mm512_add_epi64(x, xl);
            __mmask8 sxm = _mm512_mask_cmpneq_epi64_mask(act, xt, vz);
            __m512i sx =
                _mm512_maskz_mov_epi64(sxm, _mm512_srli_epi64(top2, 63));
            __m512i one = _mm512_maskz_mov_epi64(sxm, v1);
            top2 = _mm512_sllv_epi64(top2, one);
            cnt2 = _mm512_sub_epi64(cnt2, one);
            __m512i mx = _mm512_sub_epi64(vz, sx);
            __m512i qx = _mm512_sub_epi64(_mm512_xor_si512(xt, mx), mx);
            // (5) y: same sequence.
            __mmask8 ey = _mm512_mask_cmpeq_epi64_mask(linm & act, y, v15);
            __m512i lby = _mm512_maskz_mov_epi64(ey, linv);
            __m512i yl =
                _mm512_srlv_epi64(top2, _mm512_sub_epi64(v64, lby));
            top2 = _mm512_sllv_epi64(top2, lby);
            cnt2 = _mm512_sub_epi64(cnt2, lby);
            __m512i yt = _mm512_add_epi64(y, yl);
            __mmask8 sym = _mm512_mask_cmpneq_epi64_mask(act, yt, vz);
            __m512i sy =
                _mm512_maskz_mov_epi64(sym, _mm512_srli_epi64(top2, 63));
            __m512i oney = _mm512_maskz_mov_epi64(sym, v1);
            top2 = _mm512_sllv_epi64(top2, oney);
            cnt2 = _mm512_sub_epi64(cnt2, oney);
            __m512i my = _mm512_sub_epi64(vz, sy);
            __m512i qy = _mm512_sub_epi64(_mm512_xor_si512(yt, my), my);
            // (6) commit + emit the pair as one 32-bit scatter (pair
            // spans start even -> 4-byte aligned).
            cntv = _mm512_mask_mov_epi64(cntv, act, cnt2);
            topv = _mm512_mask_mov_epi64(topv, act, top2);
            __m512i val = _mm512_or_si512(
                _mm512_and_si512(qx, _mm512_set1_epi64(0xFFFF)),
                _mm512_slli_epi64(_mm512_and_si512(qy,
                                                   _mm512_set1_epi64(0xFFFF)),
                                  16));
            __m512i dst = _mm512_add_epi64(qv, _mm512_slli_epi64(iv, 1));
            _mm512_mask_i64scatter_epi32(nullptr, act, dst,
                                         _mm512_cvtepi64_epi32(val), 1);
            iv = _mm512_mask_add_epi64(iv, act, iv, _mm512_set1_epi64(2));
            if (freeze | advance) break;
        }
        // Spill + scalar service.
        _mm512_store_si512(
            buf_a, _mm512_and_si512(
                       _mm512_srlv_epi64(topv, _mm512_sub_epi64(v64, cntv)),
                       _mm512_mask_mov_epi64(vall1,
                                             _mm512_cmpeq_epi64_mask(cntv, vz),
                                             vz)));
        _mm512_store_si512(cnt_a, cntv);
        _mm512_store_si512(pos_a, posv);
        _mm512_store_si512(i_a, iv);
        __mmask8 todo = (__mmask8)((freeze | advance) & ~dead);
        for (int l = 0; l < K; l++) {
            if (!((todo >> l) & 1)) continue;
            Mp3Lane& L = lanes[l];
            sync_to_lane(l);
            if (reason[l]) {
                reason[l] = 0;
                // Budget gate first: the vector loop may freeze a lane
                // that is simultaneously past its budget.
                if (L.br.bits_read() - L.huff_start < L.part3 &&
                    L.i < L.spans[L.si].end_i) {
                    if (!mp3_service_pair(L)) {
                        L.job->status = -5;
                        L.job = nullptr;
                    }
                }
            }
            if (mp3_lane_ready(L, jobs, n_jobs, &next_job, arena, qbufs))
                sync_from_lane(l);
            else
                dead |= (__mmask8)(1u << l);
        }
        if (dead == 0xFF) return;
    }
}

#endif  // SH_MP3_SIMD


#ifdef SH_MP3_SIMD
// Engine driver: sequential frame prep (reservoir semantics are inherently
// serial), 8-lane Huffman burst, then per-granule dequant + prep passes.
// Output-identical to the scalar path below, except that the max_granules
// cutoff counts prepped frames rather than successfully decoded ones (the
// wrappers always pass max_granules >= 2 * n_frames, so the cutoff never
// binds in practice).
static int32_t mp3_extract_simd(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    float* spectra, int32_t* bt_out, int32_t* mixed_out, int32_t* gr_frame,
    int32_t* status, int32_t max_granules, int32_t prep_flags) {
    (void)data_len;
    std::vector<uint8_t> reservoir;
    reservoir.reserve(2048);
    std::vector<uint8_t> arena;
    arena.reserve((size_t)data_len + 512 * (size_t)n_frames + 16);
    std::vector<Mp3FrameJob> jobs;
    jobs.reserve(n_frames);
    int32_t slots = 0;
    for (int32_t f = 0; f < n_frames; f++) {
        status[f] = 0;
        const uint8_t* fd = data + offsets[f];
        int64_t flen = sizes[f];
        Mp3FrameJob J;
        J.fidx = f;
        J.status = 0;
        if (flen < 4 || !parse_hdr(fd, &J.h) || J.h.frame_size > flen) {
            status[f] = -1;
            continue;
        }
        int pos = 4 + (J.h.crc ? 2 : 0);
        int side_len = J.h.side_len();
        Bits sb(fd + pos, side_len);
        int main_data_begin;
        if (!read_side_info(sb, J.h, &main_data_begin, J.scfsi, J.gr)) {
            status[f] = -2;
            continue;
        }
        const uint8_t* md = fd + pos + side_len;
        int64_t md_len = J.h.frame_size - pos - side_len;
        if (md_len < 0) {
            status[f] = -3;
            continue;
        }
        if (main_data_begin > (int)reservoir.size()) {
            reservoir.insert(reservoir.end(), md, md + md_len);
            if (reservoir.size() > 511)
                reservoir.erase(reservoir.begin(), reservoir.end() - 511);
            status[f] = -4;
            continue;
        }
        J.n_gr = J.h.mpeg1() ? 2 : 1;
        J.n_ch = J.h.n_ch();
        if (slots + J.n_gr > max_granules) break;
        J.seg_ofs = (int64_t)arena.size();
        arena.insert(arena.end(), reservoir.end() - main_data_begin,
                     reservoir.end());
        arena.insert(arena.end(), md, md + md_len);
        J.seg_len = (int64_t)arena.size() - J.seg_ofs;
        reservoir.insert(reservoir.end(), md, md + md_len);
        if (reservoir.size() > 511)
            reservoir.erase(reservoir.begin(), reservoir.end() - 511);
        J.qslot = slots;
        slots += J.n_gr;
        jobs.push_back(J);
    }
    if (jobs.empty()) return 0;

    std::vector<int16_t> qbufs((size_t)slots * 2 * 576, 0);
    mp3_huffman_simd8(jobs.data(), (int)jobs.size(), arena.data(),
                      qbufs.data());

    int32_t g_out = 0;
    for (Mp3FrameJob& J : jobs) {
        if (J.status != 0) {
            status[J.fidx] = J.status;
            continue;
        }
        for (int g = 0; g < J.n_gr; g++) {
            float* s0 = spectra + ((int64_t)(g_out + g) * 2 + 0) * 576;
            float* s1 = spectra + ((int64_t)(g_out + g) * 2 + 1) * 576;
            mp3_dequant_gc(&qbufs[((size_t)(J.qslot + g) * 2 + 0) * 576], s0);
            if (J.n_ch == 2)
                mp3_dequant_gc(&qbufs[((size_t)(J.qslot + g) * 2 + 1) * 576],
                               s1);
            else
                memset(s1, 0, 576 * sizeof(float));
            if (prep_flags & 1)
                for (int ch = 0; ch < J.n_ch; ch++)
                    requantize(J.h, J.gr[g][ch], ch == 0 ? s0 : s1);
            if ((prep_flags & 2) && J.n_ch == 2) stereo(J.h, J.gr[g], s0, s1);
            if (prep_flags & 4)
                for (int ch = 0; ch < J.n_ch; ch++)
                    reorder(J.h, J.gr[g][ch], ch == 0 ? s0 : s1);
            bt_out[(g_out + g) * 2 + 0] = J.gr[g][0].block_type;
            bt_out[(g_out + g) * 2 + 1] =
                J.n_ch == 2 ? J.gr[g][1].block_type : 0;
            mixed_out[(g_out + g) * 2 + 0] = J.gr[g][0].mixed ? 1 : 0;
            mixed_out[(g_out + g) * 2 + 1] =
                J.n_ch == 2 && J.gr[g][1].mixed ? 1 : 0;
            gr_frame[g_out + g] = J.fidx;
        }
        g_out += J.n_gr;
    }
    return g_out;
}
#endif  // SH_MP3_SIMD

}  // namespace

extern "C" {

// Decode the Layer III entropy + prep stages for a sequence of frames.
//
// Outputs, granule-major (granule = frame-local granule; lanes [G, 2]):
//   spectra [max_granules, 2, 576] f32 — reordered, stereo-decoded spectra
//   bt / mixed [max_granules, 2] i32
//   gr_frame [max_granules] i32 — source frame index (for timestamps)
//   status [n_frames] i32 — 0 ok, <0 skipped (reservoir underflow etc.)
// Returns number of granules written.
int32_t sh_mp3_extract(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    float* spectra, int32_t* bt_out, int32_t* mixed_out, int32_t* gr_frame,
    int32_t* status, int32_t max_granules, int32_t prep_flags) {
    // prep_flags bit0: requantize, bit1: stereo, bit2: reorder (all on = 7).
#ifdef SH_MP3_SIMD
    {
        // SYMPHONIA_TPU_MP3_ENGINE=scalar forces the scalar path (testing /
        // A-B measurement); both engines are bit-identical.
        static const bool scalar_forced = [] {
            const char* e = getenv("SYMPHONIA_TPU_MP3_ENGINE");
            return e && strcmp(e, "scalar") == 0;
        }();
        if (!scalar_forced && n_frames >= 8 &&
            __builtin_cpu_supports("avx512f") &&
            __builtin_cpu_supports("avx512bw") &&
            __builtin_cpu_supports("avx512vl") &&
            __builtin_cpu_supports("avx512dq"))
            return mp3_extract_simd(data, data_len, offsets, sizes, n_frames,
                                    spectra, bt_out, mixed_out, gr_frame,
                                    status, max_granules, prep_flags);
    }
#endif
    std::vector<uint8_t> reservoir;
    reservoir.reserve(2048);
    int32_t g_out = 0;

    MPROF_START(tot);
    for (int32_t f = 0; f < n_frames; f++) {
        MPROF_START(setup);
        status[f] = 0;
        const uint8_t* fd = data + offsets[f];
        int64_t flen = sizes[f];
        Hdr h;
        if (flen < 4 || !parse_hdr(fd, &h) || h.frame_size > flen) { status[f] = -1; continue; }
        int pos = 4 + (h.crc ? 2 : 0);
        int side_len = h.side_len();
        Bits sb(fd + pos, side_len);
        int main_data_begin;
        bool scfsi[2][4];
        GrChan gr[2][2];
        if (!read_side_info(sb, h, &main_data_begin, scfsi, gr)) { status[f] = -2; continue; }
        const uint8_t* md = fd + pos + side_len;
        int64_t md_len = h.frame_size - pos - side_len;
        if (md_len < 0) { status[f] = -3; continue; }

        if (main_data_begin > (int)reservoir.size()) {
            reservoir.insert(reservoir.end(), md, md + md_len);
            if (reservoir.size() > 511) reservoir.erase(reservoir.begin(), reservoir.end() - 511);
            status[f] = -4;  // reservoir underflow: skip frame
            continue;
        }
        std::vector<uint8_t> buf(reservoir.end() - main_data_begin, reservoir.end());
        buf.insert(buf.end(), md, md + md_len);
        reservoir.insert(reservoir.end(), md, md + md_len);
        if (reservoir.size() > 511) reservoir.erase(reservoir.begin(), reservoir.end() - 511);

        MPROF_STOP(setup, 1);
        int n_gr = h.mpeg1() ? 2 : 1;
        int n_ch = h.n_ch();
        if (g_out + n_gr > max_granules) break;
        Bits bs(buf.data(), (int64_t)buf.size());
        bool frame_ok = true;
        for (int g = 0; g < n_gr && frame_ok; g++) {
            float* s0 = spectra + ((int64_t)(g_out + g) * 2 + 0) * 576;
            float* s1 = spectra + ((int64_t)(g_out + g) * 2 + 1) * 576;
            memset(s1, 0, 576 * sizeof(float));
            for (int ch = 0; ch < n_ch && frame_ok; ch++) {
                GrChan& c = gr[g][ch];
                int64_t start = bs.bits_read();
                MPROF_START(scf);
                int part2 = h.mpeg1() ? read_scf_mpeg1(bs, g, ch, scfsi, gr)
                                      : read_scf_mpeg2(bs, (ch == 1) && h.intensity(), c);
                MPROF_STOP(scf, 2);
                int part3 = c.part23 - part2;
                if (part3 < 0 || bs.error) { frame_ok = false; break; }
                float* dst = ch == 0 ? s0 : s1;
                MPROF_START(huf);
                bool hok = read_huffman(bs, c, part3, dst);
                MPROF_STOP(huf, 3);
                if (!hok) { frame_ok = false; break; }
                MPROF_START(rq);
                if (prep_flags & 1) requantize(h, c, dst);
                MPROF_STOP(rq, 4);
                (void)start;
            }
            if (!frame_ok) break;
            MPROF_START(st);
            if ((prep_flags & 2) && n_ch == 2) stereo(h, gr[g], s0, s1);
            if (prep_flags & 4)
                for (int ch = 0; ch < n_ch; ch++) reorder(h, gr[g][ch], ch == 0 ? s0 : s1);
            MPROF_STOP(st, 4);
            bt_out[(g_out + g) * 2 + 0] = gr[g][0].block_type;
            bt_out[(g_out + g) * 2 + 1] = n_ch == 2 ? gr[g][1].block_type : 0;
            mixed_out[(g_out + g) * 2 + 0] = gr[g][0].mixed ? 1 : 0;
            mixed_out[(g_out + g) * 2 + 1] = n_ch == 2 && gr[g][1].mixed ? 1 : 0;
            gr_frame[g_out + g] = f;
        }
        if (!frame_ok) { status[f] = -5; continue; }
        g_out += n_gr;
    }
    MPROF_STOP(tot, 0);
    return g_out;
}

// ---------------------------------------------------------------------------
// Stateful per-packet stream API (the per-packet AudioDecoder fast path).
// Carries the bit reservoir across calls so each packet decodes exactly
// once — no windowed re-extraction — and fuses the dense stage
// (native/mp3_dense.cpp) behind one ctypes call per packet.
// ---------------------------------------------------------------------------

int32_t sh_mp3_dense_granule(const float* x, int32_t bt, int32_t mixed,
                             float* hybrid_tail, float* synth_tail,
                             float* out);

struct Mp3Stream {
    std::vector<uint8_t> reservoir;
};

void* sh_mp3_stream_open() { return new Mp3Stream(); }
void sh_mp3_stream_close(void* p) { delete (Mp3Stream*)p; }
void sh_mp3_stream_reset(void* p) {
    ((Mp3Stream*)p)->reservoir.clear();
}

// Decode ONE frame against the carried reservoir straight to PCM.
// pcm is [2][2*576] (channel-major), hybrid_tail [2][32*18], synth_tail
// [2][480] — all caller-owned, tails updated in place only if the whole
// frame decodes. Returns the granule count, or a negative status with the
// same codes (and the same reservoir bookkeeping) as sh_mp3_extract: md
// bytes are added for decoded (+n), underflowed (-4) and partially
// decoded (-5) frames, skipped for unparseable ones (-1/-2/-3), keeping
// a Python-oracle reservoir maintained in parallel bit-identical.
int32_t sh_mp3_stream_decode(void* p, const uint8_t* fd, int64_t flen,
                             float* pcm, float* hybrid_tail,
                             float* synth_tail) {
    Mp3Stream* ctx = (Mp3Stream*)p;
    std::vector<uint8_t>& reservoir = ctx->reservoir;
    Hdr h;
    if (flen < 4 || !parse_hdr(fd, &h) || h.frame_size > flen) return -1;
    int pos = 4 + (h.crc ? 2 : 0);
    int side_len = h.side_len();
    Bits sb(fd + pos, side_len);
    int main_data_begin;
    bool scfsi[2][4];
    GrChan gr[2][2];
    if (!read_side_info(sb, h, &main_data_begin, scfsi, gr)) return -2;
    const uint8_t* md = fd + pos + side_len;
    int64_t md_len = h.frame_size - pos - side_len;
    if (md_len < 0) return -3;

    bool underflow = main_data_begin > (int)reservoir.size();
    std::vector<uint8_t> buf;
    if (!underflow) {
        buf.assign(reservoir.end() - main_data_begin, reservoir.end());
        buf.insert(buf.end(), md, md + md_len);
    }
    reservoir.insert(reservoir.end(), md, md + md_len);
    if (reservoir.size() > 511)
        reservoir.erase(reservoir.begin(), reservoir.end() - 511);
    if (underflow) return -4;

    int n_gr = h.mpeg1() ? 2 : 1;
    int n_ch = h.n_ch();
    // Entropy for every granule first; the dense tails are only touched
    // once the whole frame is known-good (a fallback re-decode must see
    // untouched state).
    float spec[2][2][576];
    Bits bs(buf.data(), (int64_t)buf.size());
    for (int g = 0; g < n_gr; g++) {
        float* s0 = spec[g][0];
        float* s1 = spec[g][1];
        memset(s1, 0, sizeof(spec[g][1]));
        for (int ch = 0; ch < n_ch; ch++) {
            GrChan& c = gr[g][ch];
            int part2 = h.mpeg1() ? read_scf_mpeg1(bs, g, ch, scfsi, gr)
                                  : read_scf_mpeg2(bs, (ch == 1) && h.intensity(), c);
            int part3 = c.part23 - part2;
            if (part3 < 0 || bs.error) return -5;
            float* dst = ch == 0 ? s0 : s1;
            if (!read_huffman(bs, c, part3, dst)) return -5;
            requantize(h, c, dst);
        }
        if (n_ch == 2) stereo(h, gr[g], s0, s1);
        for (int ch = 0; ch < n_ch; ch++)
            reorder(h, gr[g][ch], ch == 0 ? s0 : s1);
    }
    for (int g = 0; g < n_gr; g++)
        for (int ch = 0; ch < n_ch; ch++) {
            int rc = sh_mp3_dense_granule(
                spec[g][ch], gr[g][ch].block_type, gr[g][ch].mixed ? 1 : 0,
                hybrid_tail + ch * 32 * 18, synth_tail + ch * 480,
                // Fixed [2][2*576] channel-major rows: n_gr=1 (LSF) must
                // still stride full rows or ch 1 lands in row 0's tail.
                pcm + ch * (2 * 576) + g * 576);
            if (rc != 0) return -6;
        }
    return n_gr;
}

}  // extern "C"
