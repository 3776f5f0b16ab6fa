// MP3 (Layer III) host entropy stage.
//
// Native mirror of symphonia_tpu/codecs/mpa_layer3.py (itself the analog of
// symphonia-bundle-mp3/src/layer3/): frame header + side info + bit
// reservoir + scalefactors + Huffman spectrum + requantize + joint stereo +
// short-block reorder. Emits per-granule-channel float spectra ready for
// the batched device dense stage (ops/mp3_dense.mp3_dense_batch_jax).

#include <cstdint>
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

}  // extern "C"
