// AAC-LC host entropy stage.
//
// Native mirror of symphonia_tpu/codecs/aac.py (itself the analog of
// symphonia-codec-aac/src/aac/): raw_data_block element loop SCE/CPE/LFE/
// DSE/FIL; per ICS: window info, section data, scalefactors, spectral
// Huffman quads/pairs with escapes, PNS noise, pulse, TNS; CPE mid-side +
// intensity stereo. Emits per-frame per-channel dequantized coefficient
// vectors (post pulse/TNS) ready for the batched device IMDCT stage
// (ops/aac_dense.imdct_frames).
//
// Spectrum/scalefactor codebooks are registered at runtime from the same
// aac_tables.npz data the Python decoder uses (sh_aac_set_codebook).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)
#include <immintrin.h>
#endif

#include "entropy_common.h"

// Cycle-level profiling, compile-gated so the production token stream is
// untouched (this file is codegen-sensitive; see CLAUDE.md). Build a
// variant .so with -DSH_AAC_PROF and read the counters via sh_aac_prof():
//   0 total extract  1 vector burst    2 fixup+lane_to_hot  3 pre_spectrum
//   4 dequant_runs   5 (unused)        6 pns/prevshape pass 7 final drain
//   8 burst iters    9 emitted lanes (popcnt act)          10 freezes
//  11 quad_scalar   12 build_runs (incl. fused plan emit)  13 finalize
//  14 joint+synth   15 tail drain
//  16-20: pre_spectrum sub-shares (ics_info, section_data, scale_factors,
//  pulse, tns) — overlap slot 3.
#ifdef SH_AAC_PROF
#include <x86intrin.h>
namespace {
uint64_t g_prof[24];
}
extern "C" const uint64_t* sh_aac_prof() { return g_prof; }
extern "C" void sh_aac_prof_reset() { memset(g_prof, 0, sizeof(g_prof)); }
#define PROF_START(x) uint64_t _t_##x = __rdtsc()
#define PROF_STOP(x, i) g_prof[i] += __rdtsc() - _t_##x
#define PROF_COUNT(i, n) g_prof[i] += (uint64_t)(n)
#else
#define PROF_START(x)
#define PROF_STOP(x, i)
#define PROF_COUNT(i, n)
#endif

namespace {

constexpr int MAX_WINDOWS = 8;
constexpr int MAX_SFBS = 64;

constexpr int ONLY_LONG = 0;
constexpr int LONG_START = 1;
constexpr int EIGHT_SHORT = 2;
constexpr int LONG_STOP = 3;

constexpr int ZERO_HCB = 0;
constexpr int NOISE_HCB = 13;
constexpr int INTENSITY_HCB2 = 14;
constexpr int INTENSITY_HCB = 15;
constexpr int RESERVED_HCB = 12;

const int kTnsMaxLongBands[12] = {31, 31, 34, 40, 42, 51, 46, 46, 42, 42, 42, 39};
const int kTnsMaxShortBands[12] = {9, 9, 10, 14, 14, 14, 14, 14, 14, 14, 14, 14};

// Registered codebooks: 0 = scalefactor, 1..11 = spectrum.
Lut g_books[12];
bool g_book_set[12] = {false};

// Scalefactor fast table: 12-bit prefix -> (len << 8 | value), -1 = take
// the generic Lut (codes up to 19 bits exist, but the short codes around
// the +-0 diff dominate real scalefactor streams).
int32_t g_scf_fast[1 << 12];

// Pre-packed single-level fast tables for the spectral hot loops: entry < 0
// means "take the generic path" (code longer than the root, invalid prefix,
// or an escape-coded value). Pair books pack
//   len[30:27] nz[26:25] xa[24:19] xneg[18] ya[17:12] yneg[11]
// and quad books pack
//   len[30:27] nz[26:24] (mag[1:0] neg[2]) x4 in [23:12].
struct FastBook { int bits; int32_t tbl[1 << 12]; };
FastBook g_fast[12];

// 13-bit fast tables for the AVX-512 gather engine: pair books 5..11 at
// element offsets (cb-5) << 13 and quad books 1..4 at (cb+6) << 13, all
// concatenated behind one gather base (a plan entry's table "pointer" is
// the element offset). 13 bits covers every codeword of books
// 1-4/6/7/8/10/11 and all but the rare longest codes of 5 and 9 (those
// fall to the scalar assist, like stream tails). 64-bit entries pre-pack
// the signed values; layouts are documented at the table build in
// sh_aac_set_codebook. -1 = assist.
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__) \
    && defined(__AVX512CD__) && defined(__AVX512DQ__)
#define SH_AAC_SIMD 1
constexpr int FB_SIMD = 13;
int64_t g_simd_tbl[11 << FB_SIMD];
#endif

struct Tables {
    float pow43[8192];
    float normal_scf[256];
    float intensity_scf[256];
    Tables() {
        for (int i = 0; i < 8192; i++) pow43[i] = (float)pow((double)i, 4.0 / 3.0);
        for (int i = 0; i < 256; i++) normal_scf[i] = (float)exp2(0.25 * (i - 56 - 100));
        for (int i = 0; i < 256; i++) intensity_scf[i] = (float)exp2(-0.25 * (i - 155));
    }
};
const Tables& tables() { static Tables t; return t; }

constexpr double kIquant2 = 2.51984209978974632953;  // 2^(4/3)

struct Lcg {
    uint32_t state = 0x1F2E3D4C;
    inline int32_t next() {
        state = state * 1664525u + 1013904223u;
        return (int32_t)state;
    }
};

inline void realign(Bits& bs) {
    int off = (int)(bs.bits_read() & 7);
    if (off) bs.consume(8 - off);
}

// ---------------------------------------------------------------------------
// Fast-table codeword emission (shared by the scalar and interleaved
// engines; both must produce bit-identical output).
//
// The serial bitstream loops emit SIGNED int16 quantized values into a
// scratch lane; the dequantization (sign * |q|^(4/3) * scale) runs as one
// vectorized pass per ICS afterwards (dequant_run) — it was a measurable
// share of the per-codeword critical path.
// ---------------------------------------------------------------------------

// Decode one packed quad entry: consumes len+nz bits from (buf, cnt), writes
// 4 signed quantized values.
static inline void emit_fast_quad(int32_t e, uint64_t& buf, int& cnt,
                                  int16_t* out) {
    int len = (e >> 27) & 15;
    int nz = (e >> 24) & 7;
    cnt -= len + nz;
    uint32_t signs = (uint32_t)(buf >> cnt) & ((1u << nz) - 1);
    buf &= (1ULL << cnt) - 1;
    int digits = (e >> 12) & 0xFFF;
    // Branchless: each nonzero unsigned digit takes the next sign bit
    // MSB-first; signed books carry neg in bit 2.
    int left = nz;
    for (int j = 0; j < 4; j++) {
        int d = (digits >> (j * 3)) & 7;
        int mag = d & 3;
        int take = (int)(mag != 0) & (int)(left > 0);
        left -= take;
        int32_t sbit = (int32_t)((signs >> (left & 31)) & (uint32_t)take);
        int32_t neg = (int32_t)((uint32_t)d >> 2) | sbit;
        // q = neg ? -mag : mag
        out[j] = (int16_t)((mag ^ -neg) + neg);
    }
}

// Decode one packed pair entry: consumes len+nz bits, writes 2 values.
static inline void emit_fast_pair(int32_t e, uint64_t& buf, int& cnt,
                                  int16_t* out) {
    int len = (e >> 27) & 15;
    int nz = (e >> 25) & 3;
    cnt -= len + nz;
    uint32_t signs = (uint32_t)(buf >> cnt) & ((1u << nz) - 1);
    buf &= (1ULL << cnt) - 1;
    int xa = (e >> 19) & 63;
    int ya = (e >> 12) & 63;
    // Branchless sign resolution: x's stream sign (if any) is bit nz-1,
    // y's is bit 0; entry-borne signs for the signed books are in the
    // entry itself.
    int32_t xs = (int32_t)(((uint32_t)e >> 18) & 1)
        | (int32_t)(((signs >> ((nz - 1) & 31)) & 1u) & (uint32_t)(xa != 0));
    int32_t ys = (int32_t)(((uint32_t)e >> 11) & 1)
        | (int32_t)((signs & 1u) & (uint32_t)(ya != 0));
    out[0] = (int16_t)((xa ^ -xs) + xs);
    out[1] = (int16_t)((ya ^ -ys) + ys);
}

// Dequantize one run: out[i] = sign(q) * |q|^(4/3) * scale. AVX-512 path
// keeps pow43[0..63] register-resident (covers every non-escape codeword);
// escape magnitudes (<8192) take a masked gather.
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)
static void dequant_run(const int16_t* q, float* out, int n, float scale,
                        const float* pow43) {
    const __m512 t0 = _mm512_loadu_ps(pow43 + 0);
    const __m512 t1 = _mm512_loadu_ps(pow43 + 16);
    const __m512 t2 = _mm512_loadu_ps(pow43 + 32);
    const __m512 t3 = _mm512_loadu_ps(pow43 + 48);
    const __m512 vs = _mm512_set1_ps(scale);
    const __m512i v63 = _mm512_set1_epi32(63);
    for (int i = 0; i < n; i += 16) {
        __mmask16 m = n - i >= 16 ? (__mmask16)0xFFFF
                                  : (__mmask16)((1u << (n - i)) - 1);
        __m256i qh = _mm256_maskz_loadu_epi16(m, q + i);
        __m512i qi = _mm512_cvtepi16_epi32(qh);
        __m512i aq = _mm512_abs_epi32(qi);
        __m512 lo = _mm512_permutex2var_ps(t0, aq, t1);
        __m512 hi = _mm512_permutex2var_ps(t2, aq, t3);
        __mmask16 b5 = _mm512_test_epi32_mask(aq, _mm512_set1_epi32(32));
        __m512 mag = _mm512_mask_blend_ps(b5, lo, hi);
        __mmask16 big = _mm512_cmpgt_epi32_mask(aq, v63);
        if (big)
            mag = _mm512_mask_i32gather_ps(mag, big, aq, pow43, 4);
        __m512 v = _mm512_mul_ps(mag, vs);
        // Apply q's sign by flipping the float sign bit.
        __m512i sgn = _mm512_and_epi32(qi, _mm512_set1_epi32(0x80000000u));
        v = _mm512_castsi512_ps(
            _mm512_xor_epi32(_mm512_castps_si512(v), sgn));
        _mm512_mask_storeu_ps(out + i, m, v);
    }
}
#else
static void dequant_run(const int16_t* q, float* out, int n, float scale,
                        const float* pow43) {
    for (int i = 0; i < n; i++) {
        int v = q[i];
        int a = v < 0 ? -v : v;
        float f = pow43[a] * scale;
        out[i] = v < 0 ? -f : f;
    }
}
#endif

// ---------------------------------------------------------------------------
// ICS
// ---------------------------------------------------------------------------

struct IcsInfo {
    int window_sequence = ONLY_LONG;
    int prev_window_sequence = ONLY_LONG;
    bool window_shape = false;
    bool prev_window_shape = false;
    bool scale_factor_grouping[7] = {false};
    int group_start[MAX_WINDOWS] = {0};
    int window_groups = 1;
    int num_windows = 1;
    int max_sfb = 0;
    bool long_win = true;

    // aac.py IcsInfo.decode
    int decode(Bits& br) {
        prev_window_sequence = window_sequence;
        prev_window_shape = window_shape;
        if (br.read(1)) return -20;  // ics reserved bit set
        window_sequence = (int)br.read(2);
        window_shape = br.read(1) != 0;
        window_groups = 1;
        memset(group_start, 0, sizeof(group_start));
        if (window_sequence == EIGHT_SHORT) {
            long_win = false;
            num_windows = 8;
            max_sfb = (int)br.read(4);
            for (int i = 0; i < 7; i++) {
                bool grouped = br.read(1) != 0;
                scale_factor_grouping[i] = grouped;
                if (!grouped) group_start[window_groups++] = i + 1;
            }
        } else {
            long_win = true;
            num_windows = 1;
            max_sfb = (int)br.read(6);
            if (br.read(1)) return -21;  // LTP unsupported
        }
        return 0;
    }

    int get_group_start(int g) const {
        if (g == 0) return 0;
        if (g >= window_groups) return long_win ? 1 : 8;
        return group_start[g];
    }

    void copy_from_common(const IcsInfo& o) {
        int ps = window_sequence;
        bool psh = window_shape;
        *this = o;
        prev_window_sequence = ps;
        prev_window_shape = psh;
    }
};

struct TnsFilter {
    int length = 0;
    int order = 0;
    bool direction = false;
    float coef[21];
};

struct Ics {
    IcsInfo info;
    const int32_t* bands_long;
    int n_bands_long;   // entries incl. terminator
    const int32_t* bands_short;
    int n_bands_short;
    int global_gain = 0;
    int32_t sfb_cb[MAX_WINDOWS][MAX_SFBS];
    float scales[MAX_WINDOWS][MAX_SFBS];
    float* coeffs = nullptr;  // decodes in place into the caller's output
    int16_t* qbuf = nullptr;  // signed quantized values, also in the
                              // caller's output (device dequant handoff)
    bool had_noise = false;    // any NOISE_HCB band this ICS
    bool has_intensity = false;  // any intensity band this ICS
    // TNS state (per frame)
    bool has_tns = false;
    int tns_n_filt[MAX_WINDOWS];
    TnsFilter tns_filters[MAX_WINDOWS][4];
    // Pulse (per frame)
    bool has_pulse = false;
    int pulse_start_sfb = 0;
    int pulse_n = 0;
    int pulse_off[4], pulse_amp[4];

    const int32_t* get_bands(int* n) const {
        if (info.long_win) { *n = n_bands_long; return bands_long; }
        *n = n_bands_short; return bands_short;
    }

    // aac.py decode_section_data
    int decode_section_data(Bits& br) {
        // No full-array clear: sections fill [g][0..max_sfb) exactly, and
        // every reader is bounded by window_groups/max_sfb.
        int sect_bits = info.long_win ? 5 : 3;
        int esc = (1 << sect_bits) - 1;
        has_intensity = false;
        for (int g = 0; g < info.window_groups; g++) {
            int k = 0, l = 0;
            while (k < info.max_sfb) {
                if (l >= MAX_SFBS) return -22;
                int cb = (int)br.read(4);
                if (cb == RESERVED_HCB) return -23;
                if (cb == INTENSITY_HCB || cb == INTENSITY_HCB2)
                    has_intensity = true;
                int length = 0;
                for (;;) {
                    int incr = (int)br.read(sect_bits);
                    length += incr;
                    if (incr < esc) break;
                }
                if (k + length > info.max_sfb) return -24;
                for (int i = 0; i < length; i++) sfb_cb[g][k + i] = cb;
                k += length;
                l++;
                if (br.error) return -25;
            }
        }
        return 0;
    }

    // aac.py decode_scale_factors
    int decode_scale_factors(Bits& br) {
        bool noise_pcm_flag = true;
        int scf_intensity = 155;
        int scf_noise = global_gain - 90 + 100;
        int scf_normal = global_gain;
        const Tables& t = tables();
        const Lut& scf = g_books[0];
        for (int g = 0; g < info.window_groups; g++)
            memset(scales[g], 0, sizeof(scales[0]));
        bool err = false;
        // Register-resident bit window across the band loop: per-band
        // Lut::decode calls re-touched the reader every few bits and were
        // a measurable share of the multi-frame engines' scalar fixups.
        uint64_t buf = br.buf;
        int cnt = br.cnt;
        int64_t pos = br.pos;
        auto sdec = [&]() -> int {
            if (cnt < 32 && pos + 8 <= br.len) {
                int nbytes = (63 - cnt) >> 3;
                uint64_t w;
                memcpy(&w, br.data + pos, 8);
                w = __builtin_bswap64(w);
                buf = (buf << (nbytes * 8)) | (w >> (64 - nbytes * 8));
                pos += nbytes;
                cnt += nbytes * 8;
            }
            if (cnt >= 12) {
                int32_t e = g_scf_fast[(uint32_t)(buf >> (cnt - 12)) & 4095];
                if (e >= 0) {
                    cnt -= e >> 8;
                    buf &= (1ULL << cnt) - 1;
                    return e & 255;
                }
            }
            br.buf = buf; br.cnt = cnt; br.pos = pos;
            int v = scf.decode(br, &err);
            buf = br.buf; cnt = br.cnt; pos = br.pos;
            return v;
        };
        for (int g = 0; g < info.window_groups; g++) {
            for (int sfb = 0; sfb < info.max_sfb; sfb++) {
                int cb = sfb_cb[g][sfb];
                if (cb == ZERO_HCB) {
                    scales[g][sfb] = 0.0f;
                } else if (cb == INTENSITY_HCB || cb == INTENSITY_HCB2) {
                    scf_intensity += sdec() - 60;
                    if (err || scf_intensity < 0 || scf_intensity >= 256) return -26;
                    scales[g][sfb] = t.intensity_scf[scf_intensity];
                } else if (cb == NOISE_HCB) {
                    if (noise_pcm_flag) {
                        noise_pcm_flag = false;
                        br.buf = buf; br.cnt = cnt; br.pos = pos;
                        scf_noise += (int)br.read(9) - 256;
                        buf = br.buf; cnt = br.cnt; pos = br.pos;
                    } else {
                        scf_noise += sdec() - 60;
                    }
                    if (err || scf_noise < 0 || scf_noise >= 256) return -27;
                    scales[g][sfb] = t.normal_scf[scf_noise];
                } else {
                    scf_normal += sdec() - 60;
                    if (err || scf_normal < 0 || scf_normal >= 256) return -28;
                    scales[g][sfb] = t.normal_scf[scf_normal];
                }
            }
        }
        br.buf = buf; br.cnt = cnt; br.pos = pos;
        return br.error ? -29 : 0;
    }

    // aac.py decode_pulse
    int decode_pulse(Bits& br) {
        has_pulse = false;
        if (!br.read(1)) return 0;
        pulse_n = (int)br.read(2) + 1;
        pulse_start_sfb = (int)br.read(6);
        for (int i = 0; i < pulse_n; i++) {
            pulse_off[i] = (int)br.read(5);
            pulse_amp[i] = (int)br.read(4);
        }
        has_pulse = true;
        if (!info.long_win) return -30;  // pulse data in short window
        return 0;
    }

    // aac.py synth_pulse. noinline/cold: this file's codegen is
    // perf-sensitive (see header notes) and pulse synthesis is rare —
    // keeping it out-of-line was A/B-verified neutral where inlining the
    // f32 powf version cost ~4% on pulse-free content.
    __attribute__((noinline, cold)) void synth_pulse() {
        if (!has_pulse) return;
        int nb;
        const int32_t* bands = get_bands(&nb);
        if (pulse_start_sfb >= nb - 1) return;
        int k = bands[pulse_start_sfb];
        int band = pulse_start_sfb;
        for (int p = 0; p < pulse_n; p++) {
            k += pulse_off[p];
            if (k >= 1024) return;
            while (bands[band + 1] <= k) band++;
            // f32 pow throughout: the oracle (NEP-50 float32 ** scalar)
            // and the reference (ics/pulse.rs f32::powf) both requantize
            // in single precision — double pow here diverges by 1 ulp.
            float scale = scales[0][band];
            float base = coeffs[k];
            if (base != 0.0f)
                base = (base > 0 ? 1.0f : -1.0f) * powf(fabsf(base), 0.75f);
            base = base > 0 ? base + (float)pulse_amp[p]
                            : base - (float)pulse_amp[p];
            float sign = base > 0 ? 1.0f : (base < 0 ? -1.0f : 0.0f);
            coeffs[k] = sign * powf(fabsf(base), (float)(4.0 / 3.0)) * scale;
        }
    }

    // aac.py decode_tns
    int decode_tns(Bits& br) {
        has_tns = false;
        if (!br.read(1)) return 0;
        has_tns = true;
        int max_order = info.long_win ? 12 : 7;
        for (int w = 0; w < info.num_windows; w++) {
            int n_filt = (int)br.read(info.long_win ? 2 : 1);
            tns_n_filt[w] = n_filt;
            bool coef_res = n_filt ? br.read(1) != 0 : false;
            for (int fi = 0; fi < n_filt; fi++) {
                TnsFilter& f = tns_filters[w][fi];
                f.length = (int)br.read(info.long_win ? 6 : 4);
                f.order = (int)br.read(info.long_win ? 5 : 3);
                if (f.order > max_order) return -31;
                f.direction = false;
                if (f.order) {
                    f.direction = br.read(1) != 0;
                    int compress = (int)br.read(1);
                    int bits = (coef_res ? 4 : 3) - compress;
                    int sign_mask = 1 << (bits - 1);
                    double fac_base = coef_res ? 8.0 : 4.0;
                    double iqfac = (fac_base - 0.5) / (M_PI / 2);
                    double iqfac_m = (fac_base + 0.5) / (M_PI / 2);
                    float tmp[21];
                    for (int i = 0; i < f.order; i++) {
                        int v = (int)br.read(bits);
                        double c = (v & sign_mask) ? (double)(v - (1 << bits)) : (double)v;
                        tmp[i] = (float)sin(c / (c >= 0 ? iqfac : iqfac_m));
                    }
                    // Levinson-style expansion to LPC coefficients.
                    float coef[21] = {0}, b[21] = {0};
                    for (int m = 1; m <= f.order; m++) {
                        for (int i = 1; i < m; i++)
                            b[i] = coef[i - 1] + tmp[m - 1] * coef[m - i - 1];
                        for (int i = 0; i < m - 1; i++) coef[i] = b[i + 1];
                        coef[m - 1] = tmp[m - 1];
                    }
                    memcpy(f.coef, coef, sizeof(coef));
                }
            }
        }
        return br.error ? -32 : 0;
    }

    // aac.py synth_tns
    void synth_tns(int rate_idx) {
        if (!has_tns) return;
        int nb;
        const int32_t* bands = get_bands(&nb);
        int tmb = info.long_win ? kTnsMaxLongBands[rate_idx]
                                : kTnsMaxShortBands[rate_idx];
        if (tmb > info.max_sfb) tmb = info.max_sfb;
        for (int w = 0; w < info.num_windows; w++) {
            int bottom = nb - 1;
            for (int fi = 0; fi < tns_n_filt[w]; fi++) {
                const TnsFilter& f = tns_filters[w][fi];
                int top = bottom;
                bottom = top - f.length;
                if (bottom < 0) bottom = 0;
                if (f.order == 0) continue;
                int start = w * 128 + bands[bottom < tmb ? bottom : tmb];
                int end = w * 128 + bands[top < tmb ? top : tmb];
                const float* lpc = f.coef;
                float* c = coeffs;
                if (!f.direction) {
                    for (int m = 0, i = start; i < end; i++, m++) {
                        int jn = f.order < m ? f.order : m;
                        for (int j = 0; j < jn; j++) c[i] -= c[i - j - 1] * lpc[j];
                    }
                } else {
                    for (int m = 0, i = end - 1; i >= start; i--, m++) {
                        int jn = f.order < m ? f.order : m;
                        for (int j = 0; j < jn; j++) c[i] -= c[i + j + 1] * lpc[j];
                    }
                }
            }
        }
    }

    // Flat spectral decode plan: one entry per (group, sfb, window) band
    // that carries codewords (or noise). Shared by both engines.
    struct Run { int32_t cb, start, end; float scale; };

    // When `plan` is non-null (SIMD engine), also emit the packed span plan
    // in the same walk — adjacent same-book pair runs merge on the fly and
    // the ICS-complete marker closes the plan. Noise runs only set has_pns:
    // flagged frames are re-decoded sequentially afterwards (the fast
    // engines' draw values are discarded), so the draws themselves are
    // skipped here. Entry format is documented at the extract_simd8 plan
    // declaration.
    int build_runs(Run* runs, int64_t* plan = nullptr,
                   bool* has_pns = nullptr) {
        int nb;
        const int32_t* bands = get_bands(&nb);
        had_noise = false;
        int n_runs = 0;
        int pn = 0;
        int pend_cb = -1, pend_start = 0, pend_end = 0, pend_ri = 0;
        auto plan_flush = [&] {
            if (pend_cb < 0) return;
            int64_t e = (int64_t)pend_start | ((int64_t)pend_end << 11)
                        | ((int64_t)pend_ri << 22);
            // Table offset: pair books at (cb-5)<<13, quad books decoded
            // in-vector too at (cb+6)<<13 (the engine branches on the
            // offset). The only plan marker left is ICS-complete.
            int tofs = pend_cb <= 4 ? (pend_cb + 6) << 13
                                    : (pend_cb - 5) << 13;
            e |= (int64_t)tofs << 32;
            plan[pn++] = e;
            pend_cb = -1;
        };
        auto plan_add = [&](int cb, int start, int end) {
            if (cb == NOISE_HCB) {
                plan_flush();
                *has_pns = true;
                return;
            }
            if (cb == pend_cb && start == pend_end) {
                pend_end = end;
                pend_ri = n_runs;
                return;
            }
            plan_flush();
            pend_cb = cb;
            pend_start = start;
            pend_end = end;
            pend_ri = n_runs;
        };
        if (info.long_win) {
            // Long windows: run starts ascend, so zero only the gaps the
            // decode won't write (zero/intensity bands + the tail) instead
            // of the whole 4 KB lane — the memset was a measurable share of
            // the stage's memory traffic.
            int cursor = 0;
            for (int sfb = 0; sfb < info.max_sfb; sfb++) {
                int start = bands[sfb], end = bands[sfb + 1];
                int cb_idx = sfb_cb[0][sfb];
                if (cb_idx == ZERO_HCB || cb_idx == RESERVED_HCB ||
                    cb_idx == INTENSITY_HCB || cb_idx == INTENSITY_HCB2)
                    continue;
                if (cursor < start)
                    memset(coeffs + cursor, 0,
                           (size_t)(start - cursor) * sizeof(float));
                cursor = end;
                if (cb_idx == NOISE_HCB) had_noise = true;
                if (plan) plan_add(cb_idx, start, end);
                runs[n_runs++] = Run{cb_idx, start, end, scales[0][sfb]};
            }
            if (cursor < 1024)
                memset(coeffs + cursor, 0,
                       (size_t)(1024 - cursor) * sizeof(float));
        } else {
            memset(coeffs, 0, 1024 * sizeof(float));
            for (int g = 0; g < info.window_groups; g++) {
                int cur_w = info.get_group_start(g);
                int next_w = info.get_group_start(g + 1);
                for (int sfb = 0; sfb < info.max_sfb; sfb++) {
                    int start = bands[sfb], end = bands[sfb + 1];
                    int cb_idx = sfb_cb[g][sfb];
                    float scale = scales[g][sfb];
                    for (int w = cur_w; w < next_w; w++) {
                        int o = w * 128;
                        if (cb_idx == ZERO_HCB || cb_idx == RESERVED_HCB ||
                            cb_idx == INTENSITY_HCB || cb_idx == INTENSITY_HCB2)
                            continue;
                        if (cb_idx == NOISE_HCB) had_noise = true;
                        if (plan) plan_add(cb_idx, o + start, o + end);
                        runs[n_runs++] = Run{cb_idx, o + start, o + end, scale};
                    }
                }
            }
        }
        if (plan) {
            plan_flush();
            plan[pn] = ((int64_t)n_runs << 22) | (int64_t{1} << 63);
        }
        return n_runs;
    }

    // aac.py decode_spectrum + helpers. Bands are collected into a flat
    // plan first, then executed in one loop that keeps the bitstream state
    // in registers across band boundaries (per-band calls would reload and
    // write back the reader for every few codewords).
    int decode_spectrum(Bits& br, Lcg& lcg) {
        Run runs[MAX_WINDOWS * MAX_SFBS];
        int n_runs = build_runs(runs);

        uint64_t buf = br.buf;
        int cnt = br.cnt;
        int64_t pos = br.pos;
        for (int ri = 0; ri < n_runs; ri++) {
            const Run& R = runs[ri];
            if (R.cb == NOISE_HCB) {
                // Draws only from the LCG; independent of the bit reader.
                int r = decode_noise(lcg, R.scale, R.start, R.end);
                if (r < 0) { br.buf = buf; br.cnt = cnt; br.pos = pos; return r; }
                continue;
            }
            const int32_t* fr = g_fast[R.cb].tbl;
            const int fb = g_fast[R.cb].bits;
            const uint32_t fbmask = (1u << fb) - 1;
            if (R.cb <= 4) {
                for (int i = R.start; i < R.end; i += 4) {
                    if (cnt < 32 && pos + 8 <= br.len) {
                        int nbytes = (63 - cnt) >> 3;
                        uint64_t w;
                        memcpy(&w, br.data + pos, 8);
                        w = __builtin_bswap64(w);
                        buf = (buf << (nbytes * 8)) | (w >> (64 - nbytes * 8));
                        pos += nbytes;
                        cnt += nbytes * 8;
                    }
                    int32_t e = cnt >= 32 ? fr[(uint32_t)(buf >> (cnt - fb)) & fbmask] : -1;
                    if (e < 0) {
                        br.buf = buf; br.cnt = cnt; br.pos = pos;
                        int r = decode_one_quad(br, R.cb, i);
                        if (r < 0) return r;
                        buf = br.buf; cnt = br.cnt; pos = br.pos;
                        continue;
                    }
                    emit_fast_quad(e, buf, cnt, &qbuf[i]);
                }
            } else {
                for (int i = R.start; i < R.end; i += 2) {
                    if (cnt < 32 && pos + 8 <= br.len) {
                        int nbytes = (63 - cnt) >> 3;
                        uint64_t w;
                        memcpy(&w, br.data + pos, 8);
                        w = __builtin_bswap64(w);
                        buf = (buf << (nbytes * 8)) | (w >> (64 - nbytes * 8));
                        pos += nbytes;
                        cnt += nbytes * 8;
                    }
                    int32_t e = cnt >= 32 ? fr[(uint32_t)(buf >> (cnt - fb)) & fbmask] : -1;
                    if (e < 0 || (e & 1)) {
                        br.buf = buf; br.cnt = cnt; br.pos = pos;
                        int r = e < 0 ? decode_one_pair(br, R.cb, i)
                                      : decode_escape_pair(br, e, i);
                        if (r < 0) return r;
                        buf = br.buf; cnt = br.cnt; pos = br.pos;
                        continue;
                    }
                    emit_fast_pair(e, buf, cnt, &qbuf[i]);
                }
            }
        }
        br.buf = buf; br.cnt = cnt; br.pos = pos;
        if (br.error) return -33;
        dequant_runs(runs, n_runs);
        return 0;
    }

    // Vectorized dequantization of every coded (non-noise) run.
#ifdef SH_AAC_PROF
    void dequant_runs(const Run* runs, int n_runs) {
        PROF_START(dq);
        dequant_runs_inner(runs, n_runs);
        PROF_STOP(dq, 4);
    }
    void dequant_runs_inner(const Run* runs, int n_runs) {
#else
    void dequant_runs(const Run* runs, int n_runs) {
#endif
        const float* pow43 = tables().pow43;
        for (int ri = 0; ri < n_runs; ri++) {
            const Run& R = runs[ri];
            if (R.cb == NOISE_HCB) continue;
            dequant_run(qbuf + R.start, coeffs + R.start, R.end - R.start,
                        R.scale, pow43);
        }
    }

    // Band-walk dequantization (same output as dequant_runs, but reads
    // sfb_cb/scales directly so it can run at ELEMENT completion, after
    // the shared runs array has been reused by the pair's second ICS).
    void dequant_bands() {
        PROF_START(dqb);
        const float* pow43 = tables().pow43;
        int nb;
        const int32_t* bands = get_bands(&nb);
        if (info.long_win) {
            for (int sfb = 0; sfb < info.max_sfb; sfb++) {
                int cb = sfb_cb[0][sfb];
                if (cb == ZERO_HCB || cb == RESERVED_HCB || cb == NOISE_HCB ||
                    cb == INTENSITY_HCB || cb == INTENSITY_HCB2)
                    continue;
                dequant_run(qbuf + bands[sfb], coeffs + bands[sfb],
                            bands[sfb + 1] - bands[sfb], scales[0][sfb],
                            pow43);
            }
            PROF_STOP(dqb, 4);
            return;
        }
        for (int g = 0; g < info.window_groups; g++) {
            int cur_w = info.get_group_start(g);
            int next_w = info.get_group_start(g + 1);
            for (int sfb = 0; sfb < info.max_sfb; sfb++) {
                int cb = sfb_cb[g][sfb];
                if (cb == ZERO_HCB || cb == RESERVED_HCB || cb == NOISE_HCB ||
                    cb == INTENSITY_HCB || cb == INTENSITY_HCB2)
                    continue;
                for (int w = cur_w; w < next_w; w++) {
                    int o = w * 128;
                    dequant_run(qbuf + o + bands[sfb], coeffs + o + bands[sfb],
                                bands[sfb + 1] - bands[sfb], scales[g][sfb],
                                pow43);
                }
            }
        }
        PROF_STOP(dqb, 4);
    }

    int decode_noise(Lcg& lcg, float scale, int start, int end) {
        double energy = 0.0;
        for (int i = start; i < end; i++) {
            float v = (float)(int16_t)(lcg.next() >> 16);
            coeffs[i] = v;
            energy += (double)v * v;
        }
        if (energy > 0) {
            float k = (float)(scale / sqrt(energy));
            for (int i = start; i < end; i++) coeffs[i] *= k;
        }
        return 0;
    }

    int decode_one_quad(Bits& br, int cb_idx, int i) {
        const Lut& cb = g_books[cb_idx];
        bool is_signed = cb_idx == 1 || cb_idx == 2;
        bool err = false;
        int code = cb.decode(br, &err);
        if (err) return -34;
        int q[4] = {(code >> 6) & 3, (code >> 4) & 3, (code >> 2) & 3, code & 3};
        if (is_signed) {
            for (int j = 0; j < 4; j++) qbuf[i + j] = (int16_t)(q[j] - 1);
        } else {
            // One batched read for all sign bits (MSB-first order). Zero
            // digits are written explicitly: with gap-only lane zeroing the
            // band is not pre-cleared.
            int nz = (q[0] != 0) + (q[1] != 0) + (q[2] != 0) + (q[3] != 0);
            uint32_t signs = nz ? br.read(nz) : 0;
            for (int j = 0; j < 4; j++) {
                if (q[j]) {
                    nz--;
                    qbuf[i + j] = (int16_t)((signs >> nz) & 1 ? -q[j] : q[j]);
                } else {
                    qbuf[i + j] = 0;
                }
            }
        }
        return 0;
    }

    // Codeword values    // Codeword values are pre-split at build time (sh_aac_set_codebook):
    // signed books pack (x+4, y+4) in 4-bit fields, unsigned in 5-bit.
    static void pair_value(int cb_idx, int code, int* x, int* y) {
        if (cb_idx == 5 || cb_idx == 6) { *x = (code >> 4) - 4; *y = (code & 15) - 4; }
        else { *x = code >> 5; *y = code & 31; }
    }

    static int read_escape(Bits& br, int* out) {
        // Leading-ones count from one peek (the prefix is at most 8 ones
        // for a valid escape, so a 16-bit window always suffices).
        uint32_t p = br.peek(16);
        uint32_t inv = (~p << 16) & 0xFFFF0000u;
        int n = inv ? __builtin_clz(inv) : 16;
        if (n >= 9 || br.error) return -35;
        br.consume(n + 1);
        *out = (1 << (n + 4)) + (int)br.read(n + 4);
        return 0;
    }

    // cb11 escape continuation for a fast-table entry with bit 0 set: the
    // codeword fit the table, but one or both magnitudes are 16 and carry
    // an escape-coded value after the sign bits.
    int decode_escape_pair(Bits& br, int32_t e, int i) {
        int len = (e >> 27) & 15;
        int nz = (e >> 25) & 3;
        br.consume(len);
        uint32_t signs = nz ? br.read(nz) : 0;
        int x = (e >> 19) & 63;
        int y = (e >> 12) & 63;
        // Escaped magnitudes (16) are nonzero by construction, so the sign
        // layout matches the non-escape case: x's sign (if any) is the MSB.
        int sx = 0, sy = 0;
        if (x && y) { sx = (signs >> 1) & 1; sy = signs & 1; }
        else if (x) sx = signs & 1;
        else if (y) sy = signs & 1;
        if (x == 16) { if (read_escape(br, &x) < 0) return -35; }
        if (y == 16) { if (read_escape(br, &y) < 0) return -35; }
        qbuf[i] = (int16_t)(sx ? -x : x);
        qbuf[i + 1] = (int16_t)(sy ? -y : y);
        return 0;
    }

    int decode_one_pair(Bits& br, int cb_idx, int i) {
        const Lut& cb = g_books[cb_idx];
        bool is_signed = cb_idx == 5 || cb_idx == 6;
        bool escape = cb_idx == 11;
        bool err = false;
        int code = cb.decode(br, &err);
        if (err) return -36;
        int x, y;
        pair_value(cb_idx, code, &x, &y);
        if (is_signed) {
            qbuf[i] = (int16_t)x;
            qbuf[i + 1] = (int16_t)y;
        } else {
            // One batched read for both sign bits (MSB-first order).
            int nz = (x != 0) + (y != 0);
            uint32_t signs = nz ? br.read(nz) : 0;
            int sx = 0, sy = 0;
            if (x && y) { sx = (signs >> 1) & 1; sy = signs & 1; }
            else if (x) sx = signs & 1;
            else if (y) sy = signs & 1;
            if (escape && x == 16) { if (read_escape(br, &x) < 0) return -35; }
            if (escape && y == 16) { if (read_escape(br, &y) < 0) return -35; }
            qbuf[i] = (int16_t)(sx ? -x : x);
            qbuf[i + 1] = (int16_t)(sy ? -y : y);
        }
        return 0;
    }

    // aac.py Ics.decode, split before the spectrum so the interleaved
    // engine can take over run execution (decode == pre_spectrum +
    // decode_spectrum).
#ifdef SH_AAC_PROF
    int decode_pre_spectrum(Bits& br, bool common_window) {
        PROF_START(ps);
        int r_ = decode_pre_spectrum_inner(br, common_window);
        PROF_STOP(ps, 3);
        return r_;
    }
    int decode_pre_spectrum_inner(Bits& br, bool common_window) {
#else
    int decode_pre_spectrum(Bits& br, bool common_window) {
#endif
        global_gain = (int)br.read(8);
        if (!common_window) {
            PROF_START(pi);
            int r = info.decode(br);
            PROF_STOP(pi, 16);
            if (r < 0) return r;
            int nb;
            get_bands(&nb);
            if (info.max_sfb + 1 > nb) return -37;
        }
        int r;
        PROF_START(pd);
        r = decode_section_data(br);
        PROF_STOP(pd, 17);
        if (r < 0) return r;
        PROF_START(psf);
        r = decode_scale_factors(br);
        PROF_STOP(psf, 18);
        if (r < 0) return r;
        PROF_START(pp);
        r = decode_pulse(br);
        PROF_STOP(pp, 19);
        if (r < 0) return r;
        PROF_START(pt);
        r = decode_tns(br);
        PROF_STOP(pt, 20);
        if (r < 0) return r;
        if (br.read(1)) return -38;  // gain control unsupported
        return 0;
    }

    int decode(Bits& br, Lcg& lcg, bool common_window) {
        int r = decode_pre_spectrum(br, common_window);
        if (r < 0) return r;
        if ((r = decode_spectrum(br, lcg)) < 0) return r;
        return 0;
    }
};

// ---------------------------------------------------------------------------
// Channel pair (aac.py ChannelPair)
// ---------------------------------------------------------------------------

struct ChannelPair {
    bool is_pair = false;
    int channel = 0;
    Ics ics0, ics1;
    Lcg lcg;
    bool ms_used[MAX_WINDOWS][MAX_SFBS];
    bool initialized = false;

    int decode_sce(Bits& br) { return ics0.decode(br, lcg, false); }

    // CPE header up to (excluding) the first ICS: common_window flag, the
    // shared ics_info, and the MS mask. Returns ms_mask via out-param.
    int decode_cpe_header(Bits& br, bool* common_window_out, int* ms_mask_out) {
        bool common_window = br.read(1) != 0;
        int ms_mask = 0;
        if (common_window) {
            int r = ics0.info.decode(br);
            if (r < 0) return r;
            int nb;
            ics0.get_bands(&nb);
            if (ics0.info.max_sfb + 1 > nb) return -37;
            ms_mask = (int)br.read(2);
            IcsInfo& info = ics0.info;
            if (ms_mask == 0 || ms_mask == 2) {
                for (int g = 0; g < MAX_WINDOWS; g++)
                    for (int s = 0; s < MAX_SFBS; s++) ms_used[g][s] = ms_mask == 2;
            } else if (ms_mask == 1) {
                memset(ms_used, 0, sizeof(ms_used));
                for (int g = 0; g < info.window_groups; g++)
                    for (int sfb = 0; sfb < info.max_sfb; sfb++)
                        ms_used[g][sfb] = br.read(1) != 0;
            } else {
                return -39;
            }
            ics1.info.copy_from_common(ics0.info);
        }
        *common_window_out = common_window;
        *ms_mask_out = ms_mask;
        return 0;
    }

    int decode_cpe(Bits& br) {
        bool common_window;
        int ms_mask;
        int r = decode_cpe_header(br, &common_window, &ms_mask);
        if (r < 0) return r;
        if ((r = ics0.decode(br, lcg, common_window)) < 0) return r;
        if ((r = ics1.decode(br, lcg, common_window)) < 0) return r;
        joint_postproc(common_window, ms_mask);
        return 0;
    }

    // Mid-side + intensity stereo application after both ICS decode.
    void joint_postproc(bool common_window, int ms_mask) {
        if (common_window) {
            IcsInfo& info = ics0.info;
            int nb;
            const int32_t* bands = ics0.get_bands(&nb);
            int g = 0;
            for (int w = 0; w < info.num_windows; w++) {
                if (w > 0 && !info.scale_factor_grouping[w - 1]) g++;
                for (int sfb = 0; sfb < info.max_sfb; sfb++) {
                    int start = w * 128 + bands[sfb];
                    int end = w * 128 + bands[sfb + 1];
                    int cb1 = ics1.sfb_cb[g][sfb];
                    if (cb1 == INTENSITY_HCB || cb1 == INTENSITY_HCB2) {
                        bool invert = ms_mask == 1 && ms_used[g][sfb];
                        float direction = cb1 == INTENSITY_HCB ? 1.0f : -1.0f;
                        float factor = invert ? -1.0f : 1.0f;
                        float scale = direction * factor * ics1.scales[g][sfb];
                        for (int i = start; i < end; i++)
                            ics1.coeffs[i] = scale * ics0.coeffs[i];
                    } else if (ics0.sfb_cb[g][sfb] == NOISE_HCB || cb1 == NOISE_HCB) {
                        // no joint coding over noise bands
                    } else if (ms_used[g][sfb]) {
                        for (int i = start; i < end; i++) {
                            float mid = ics0.coeffs[i], side = ics1.coeffs[i];
                            ics0.coeffs[i] = mid + side;
                            ics1.coeffs[i] = mid - side;
                        }
                    }
                }
            }
        }
    }
};

// ---------------------------------------------------------------------------
// Scalar per-frame decode (shared by the sequential engine and the PNS
// re-decode pass of the interleaved engine).
// ---------------------------------------------------------------------------

struct FrameOut {
    float* coeffs_out;
    int16_t* qbuf_out;   // [F, max_ch, 1024] quantized values (in place)
    float* scales_out;   // [F, max_ch, 64] per-band scales (fast lanes)
    int32_t* deq_out;    // 1 = coeffs valid (host dequant), 0 = qbuf+scales
    int32_t *seq_out, *shape_out, *prevshape_out, *nch_out, *status;
    int32_t max_ch;
    int32_t rate_idx;
    const int32_t* bands_long; int32_t n_bands_long;
    const int32_t* bands_short; int32_t n_bands_short;
};

static void decode_frame_scalar(
    const uint8_t* data, int64_t data_len, int64_t off, int64_t size,
    int32_t f, std::vector<ChannelPair>& pairs, const FrameOut& O) {
    O.nch_out[f] = 0;
    O.status[f] = 0;
    if (off < 0 || off + size > data_len) {
        O.status[f] = -1;
        return;
    }
    Bits br(data + off, size);
    int cur_pair = 0, cur_ch = 0, rc = 0;
    while ((int64_t)br.bits_read() + 3 < size * 8 && rc == 0) {
        int eid = (int)br.read(3);
        if (br.error) { rc = -2; break; }
        if (eid == 7) break;  // END
        if (eid == 0 || eid == 3) {  // SCE / LFE
            br.read(4);
            if ((size_t)cur_pair >= pairs.size()) pairs.emplace_back();
            ChannelPair& p = pairs[cur_pair];
            if (!p.initialized) {
                p.is_pair = false; p.channel = cur_ch; p.initialized = true;
                p.ics0.bands_long = O.bands_long; p.ics0.n_bands_long = O.n_bands_long;
                p.ics0.bands_short = O.bands_short; p.ics0.n_bands_short = O.n_bands_short;
                p.ics1 = p.ics0;
            } else if (p.is_pair || p.channel != cur_ch) { rc = -3; break; }
            if (cur_ch + 1 > O.max_ch) { rc = -4; break; }
            p.ics0.coeffs =
                O.coeffs_out + ((int64_t)f * O.max_ch + cur_ch) * 1024;
            p.ics0.qbuf =
                O.qbuf_out + ((int64_t)f * O.max_ch + cur_ch) * 1024;
            rc = p.decode_sce(br);
            cur_pair++; cur_ch++;
        } else if (eid == 1) {  // CPE
            br.read(4);
            if ((size_t)cur_pair >= pairs.size()) pairs.emplace_back();
            ChannelPair& p = pairs[cur_pair];
            if (!p.initialized) {
                p.is_pair = true; p.channel = cur_ch; p.initialized = true;
                p.ics0.bands_long = O.bands_long; p.ics0.n_bands_long = O.n_bands_long;
                p.ics0.bands_short = O.bands_short; p.ics0.n_bands_short = O.n_bands_short;
                p.ics1 = p.ics0;
            } else if (!p.is_pair || p.channel != cur_ch) { rc = -3; break; }
            if (cur_ch + 2 > O.max_ch) { rc = -4; break; }
            p.ics0.coeffs =
                O.coeffs_out + ((int64_t)f * O.max_ch + cur_ch) * 1024;
            p.ics1.coeffs =
                O.coeffs_out + ((int64_t)f * O.max_ch + cur_ch + 1) * 1024;
            p.ics0.qbuf =
                O.qbuf_out + ((int64_t)f * O.max_ch + cur_ch) * 1024;
            p.ics1.qbuf =
                O.qbuf_out + ((int64_t)f * O.max_ch + cur_ch + 1) * 1024;
            rc = p.decode_cpe(br);
            cur_pair++; cur_ch += 2;
        } else if (eid == 4) {  // DSE
            br.read(4);
            int align = (int)br.read(1);
            int count = (int)br.read(8);
            if (count == 255) count += (int)br.read(8);
            if (align) realign(br);
            br.ignore((int64_t)count * 8);
        } else if (eid == 6) {  // FIL
            int count = (int)br.read(4);
            if (count == 15) count += (int)br.read(8) - 1;
            if (count > 0) {
                br.read(4);  // extension type (SBR payloads skipped)
                br.ignore(4);
                br.ignore((int64_t)(count - 1) * 8);
            }
        } else {  // CCE / PCE unsupported
            rc = -5;
        }
        if (br.error) rc = -2;
    }
    if (rc < 0) { O.status[f] = rc; return; }
    // Emit channels: pulse + TNS synthesis, then coefficients.
    int ch_out = 0;
    for (int pi = 0; pi < cur_pair; pi++) {
        ChannelPair& p = pairs[pi];
        Ics* chans[2] = {&p.ics0, p.is_pair ? &p.ics1 : nullptr};
        for (int c = 0; c < 2 && chans[c]; c++) {
            Ics& ics = *chans[c];
            ics.synth_pulse();
            ics.synth_tns(O.rate_idx);
            // Coefficients were decoded in place into the output lane.
            int64_t lane = ((int64_t)f * O.max_ch + ch_out);
            O.seq_out[lane] = ics.info.window_sequence;
            O.shape_out[lane] = ics.info.window_shape ? 1 : 0;
            O.prevshape_out[lane] = ics.info.prev_window_shape ? 1 : 0;
            ch_out++;
        }
    }
    O.nch_out[f] = ch_out;
}

// ---------------------------------------------------------------------------
// Interleaved multi-frame engine.
//
// ADTS frames are independent bitstreams, so K of them decode concurrently
// in one scalar loop: each lane owns a bit cursor and the round-robin inner
// loop gives the CPU K independent dependency chains where the sequential
// engine is latency-bound on one (buf -> table load -> cnt -> buf). Header
// parse, quad runs, PNS, and escapes stay scalar inside lane_advance; the
// hot loop handles only fast-table pair codewords (the bulk of real
// content).
//
// Cross-frame couplings handled outside the lanes:
//  * PNS: the LCG is persistent decoder state; lanes decode with a scratch
//    LCG and flag frames containing NOISE_HCB, which are then re-decoded
//    sequentially with the persistent LCG (draws happen only in noise
//    bands, so the sequence matches the fully-sequential engine).
//  * prev_window_shape: filled in a final pass from the previous good
//    frame's shape per channel.
// ---------------------------------------------------------------------------

struct LaneCtx {
    Bits br{nullptr, 0};
    int fidx = -1;
    int status = 0;
    int phase = 0;       // 0 = element walk, 1 = spectrum runs
    int64_t frame_bits = 0;
    int cur_ch = 0;      // output channel cursor within the frame
    ChannelPair pair;    // current element's decode state (reset per element)
    bool common_window = false;
    int ms_mask = 0;
    int ics_idx = 0;     // which ICS of a CPE is executing
    int elem_ch0 = 0;    // first output channel of the current element
    // Spectrum run execution.
    Ics* ics = nullptr;
    Ics::Run runs[MAX_WINDOWS * MAX_SFBS];
    int n_runs = 0, ri = 0;
    // Hot pair-run state.
    int i = 0, end = 0;
    const int32_t* tbl = nullptr;
    float scale = 0.0f;
    int cb = 0;
    Lcg lcg;             // scratch; frames with PNS are re-decoded
    bool has_pns = false;
    // Element-layout record for this frame: (is_pair << 6) | first_channel
    // per SCE/LFE/CPE, validated post-hoc by finalize_layout. Keeping the
    // element walk free of any vector machinery measurably matters: an
    // in-walk std::vector check cost ~15% on the whole stage (codegen, not
    // the executed instructions — this file is alignment/layout sensitive;
    // A/B any refactor with tools/microbench discipline before landing).
    uint8_t elems[64];
    int n_elems = 0;
    // SIMD-engine mode: lane_advance returns right after build_runs (fresh
    // ICS) instead of executing runs; the vector engine owns run execution
    // via span plans that build_runs emits into `plan` (the lane's row of
    // the engine's plan array) in the same walk, and re-enters with
    // ri == n_runs to trigger the ICS-complete block (dequant + next ICS /
    // element / frame).
    bool simd = false;
    int64_t* plan = nullptr;
};

// Cross-frame element-layout consistency (the sequential engine's
// persistent-pairs check at aac_entropy.cpp decode_frame_scalar): the first
// frame to complete defines the layout; a frame whose walk differs gets -3
// and callers fall back to the oracle for it.

#ifdef SH_AAC_PROF
static void finalize_layout_inner(LaneCtx&, std::vector<uint8_t>&,
                                  const FrameOut&);
static void finalize_layout(LaneCtx& L, std::vector<uint8_t>& layout,
                            const FrameOut& O) {
    PROF_START(fl);
    finalize_layout_inner(L, layout, O);
    PROF_STOP(fl, 13);
}
static void finalize_layout_inner(
#else
static __attribute__((noinline)) void finalize_layout(
#endif
    LaneCtx& L, std::vector<uint8_t>& layout, const FrameOut& O) {
    int n = L.n_elems;
    int common = (size_t)n < layout.size() ? n : (int)layout.size();
    for (int i = 0; i < common; i++) {
        if (L.elems[i] != layout[i]) {
            O.status[L.fidx] = -3;
            O.nch_out[L.fidx] = 0;
            return;
        }
    }
    for (int i = (int)layout.size(); i < n; i++) layout.push_back(L.elems[i]);
}

// Shared multi-frame-engine tail: PNS re-decode (sequential with the
// persistent decoder LCG — draws happen only in noise bands, so skipping
// non-PNS frames preserves the fully-sequential engine's sequence) and the
// prev_window_shape chain across good frames, per channel.
static void pns_prevshape_pass(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    const FrameOut& O, const uint8_t* pns) {
    std::vector<ChannelPair> pairs;
    for (int f = 0; f < n_frames; f++) {
        if (!pns[f]) continue;
        decode_frame_scalar(data, data_len, offsets[f], sizes[f], f, pairs,
                            O);
        // The sequential re-decode made coeffs authoritative again.
        for (int c = 0; c < O.max_ch; c++)
            O.deq_out[(int64_t)f * O.max_ch + c] = 1;
    }
    int32_t carry[64] = {0};
    for (int f = 0; f < n_frames; f++) {
        if (O.status[f] != 0) continue;
        int nc = O.nch_out[f] < 64 ? O.nch_out[f] : 64;
        for (int c = 0; c < nc; c++) {
            int64_t lane = (int64_t)f * O.max_ch + c;
            O.prevshape_out[lane] = carry[c];
            carry[c] = O.shape_out[lane];
        }
    }
}

// Scalar execution of one quad run (books 1-4) on a lane's bit reader.
#ifdef SH_AAC_PROF
static int run_quad_scalar_inner(Ics& ics, Bits& br, const Ics::Run& R);
static int run_quad_scalar(Ics& ics, Bits& br, const Ics::Run& R) {
    PROF_START(qs);
    int r_ = run_quad_scalar_inner(ics, br, R);
    PROF_STOP(qs, 11);
    return r_;
}
static int run_quad_scalar_inner(Ics& ics, Bits& br, const Ics::Run& R) {
#else
static int run_quad_scalar(Ics& ics, Bits& br, const Ics::Run& R) {
#endif
    const int32_t* fr = g_fast[R.cb].tbl;
    for (int i = R.start; i < R.end; i += 4) {
        if (br.cnt < 32) br.fill();
        int32_t e = br.cnt >= 32
            ? fr[(uint32_t)(br.buf >> (br.cnt - 12)) & 4095] : -1;
        if (e < 0) {
            int r = ics.decode_one_quad(br, R.cb, i);
            if (r < 0) return r;
            continue;
        }
        emit_fast_quad(e, br.buf, br.cnt, &ics.qbuf[i]);
    }
    return 0;
}

// Advance a lane until it is inside a fast-decodable pair run (returns
// true) or the frame completes / errors (returns false; lane output and
// status are final).
static bool lane_advance(LaneCtx& L, const FrameOut& O) {
    Bits& br = L.br;
    for (;;) {
        if (L.status < 0) {
            O.status[L.fidx] = L.status;
            O.nch_out[L.fidx] = 0;
            return false;
        }
        if (L.phase == 1) {
            // Execute/skip runs until a pair run is ready.
            Ics& ics = *L.ics;
            while (L.ri < L.n_runs) {
                const Ics::Run& R = L.runs[L.ri];
                if (R.cb == NOISE_HCB) {
                    L.has_pns = true;
                    ics.decode_noise(L.lcg, R.scale, R.start, R.end);
                    L.ri++;
                    continue;
                }
                if (R.cb <= 4) {
                    Ics::Run RR = R;  // merge adjacent same-book quad runs
                    while (L.ri + 1 < L.n_runs &&
                           L.runs[L.ri + 1].cb == RR.cb &&
                           L.runs[L.ri + 1].start == RR.end)
                        RR.end = L.runs[++L.ri].end;
                    int r = run_quad_scalar(ics, br, RR);
                    if (r < 0) { L.status = r; break; }
                    L.ri++;
                    continue;
                }
                // Pair run: hand to the hot loop. Runs are per scalefactor
                // band (dequant needs the per-band scale) but the codebook
                // only changes per section, so adjacent contiguous runs of
                // the same book merge into one decode span — run
                // transitions, not codewords, dominate the interleaved
                // engine's overhead (~34k lane exits vs ~217k codewords on
                // dense content). dequant_runs still sees the original
                // per-band runs.
                L.tbl = g_fast[R.cb].tbl;
                L.scale = R.scale;
                L.cb = R.cb;
                L.i = R.start;
                int end = R.end;
                while (L.ri + 1 < L.n_runs &&
                       L.runs[L.ri + 1].cb == R.cb &&
                       L.runs[L.ri + 1].start == end)
                    end = L.runs[++L.ri].end;
                L.end = end;
                if (L.i < L.end) return true;
                L.ri++;
            }
            if (L.status < 0) continue;
            if (br.error) { L.status = -33; continue; }
            // ICS complete. Dequantization is deferred to element
            // completion (dequant_bands) so the device-dequant handoff can
            // decide with the pair's joint-coding flags known.
            if (L.pair.is_pair && L.ics_idx == 0) {
                L.ics_idx = 1;
                L.ics = &L.pair.ics1;
                int r = L.pair.ics1.decode_pre_spectrum(br, L.common_window);
                if (r < 0 || br.error) { L.status = r < 0 ? r : -2; continue; }
                PROF_START(br1);
                L.n_runs = L.pair.ics1.build_runs(
                    L.runs, L.simd ? L.plan : nullptr, &L.has_pns);
                PROF_STOP(br1, 12);
                L.ri = 0;
                if (L.simd) return true;  // fresh ICS: caller builds a plan
                continue;
            }
            // Element complete: joint stereo, synthesis, emission. Plain
            // long-window channels (no pulse/TNS/PNS, no joint coding)
            // skip host dequantization entirely — the device dequantizes
            // their int16 quants through the same pow43 table (an
            // IEEE-identical f32 multiply), selected by deq_out = 0. The
            // per-band scales row is exactly Ics::scales[0] (zero on
            // uncoded bands, so stale quants there dequantize to +0.0).
            PROF_START(js);
            bool joint = L.pair.is_pair && L.common_window &&
                         (L.ms_mask != 0 || L.pair.ics1.has_intensity);
            Ics* chans[2] = {&L.pair.ics0,
                             L.pair.is_pair ? &L.pair.ics1 : nullptr};
            for (int c = 0; c < 2 && chans[c]; c++) {
                Ics& ics2 = *chans[c];
                int64_t lane = ((int64_t)L.fidx * O.max_ch + L.elem_ch0 + c);
                if (ics2.info.long_win && !joint && !ics2.has_pulse &&
                    !ics2.has_tns && !ics2.had_noise &&
                    !ics2.has_intensity) {
                    memcpy(O.scales_out + lane * 64, ics2.scales[0],
                           64 * sizeof(float));
                    O.deq_out[lane] = 0;
                } else {
                    ics2.dequant_bands();
                }
            }
            if (joint)
                L.pair.joint_postproc(L.common_window, L.ms_mask);
            for (int c = 0; c < 2 && chans[c]; c++) {
                Ics& ics2 = *chans[c];
                ics2.synth_pulse();
                ics2.synth_tns(O.rate_idx);
                int64_t lane = ((int64_t)L.fidx * O.max_ch + L.elem_ch0 + c);
                O.seq_out[lane] = ics2.info.window_sequence;
                O.shape_out[lane] = ics2.info.window_shape ? 1 : 0;
                O.prevshape_out[lane] = 0;  // chained in a final pass
            }
            PROF_STOP(js, 14);
            L.phase = 0;
            continue;
        }
        // Element walk.
        if ((int64_t)br.bits_read() + 3 >= L.frame_bits) {
            O.status[L.fidx] = 0;
            O.nch_out[L.fidx] = L.cur_ch;
            return false;
        }
        int eid = (int)br.read(3);
        if (br.error) { L.status = -2; continue; }
        if (eid == 7) {  // END
            O.status[L.fidx] = 0;
            O.nch_out[L.fidx] = L.cur_ch;
            return false;
        }
        if (eid == 0 || eid == 3 || eid == 1) {  // SCE / LFE / CPE
            br.read(4);
            bool is_pair = eid == 1;
            int want = is_pair ? 2 : 1;
            if (L.cur_ch + want > O.max_ch || L.n_elems >= 64) {
                L.status = -4;
                continue;
            }
            L.elems[L.n_elems++] =
                (uint8_t)(((int)is_pair << 6) | L.cur_ch);
            ChannelPair& p = L.pair;
            p.is_pair = is_pair;
            p.channel = L.cur_ch;
            p.ics0.info = IcsInfo();
            p.ics1.info = IcsInfo();
            p.ics0.coeffs =
                O.coeffs_out + ((int64_t)L.fidx * O.max_ch + L.cur_ch) * 1024;
            p.ics1.coeffs = is_pair
                ? O.coeffs_out +
                  ((int64_t)L.fidx * O.max_ch + L.cur_ch + 1) * 1024
                : nullptr;
            p.ics0.qbuf =
                O.qbuf_out + ((int64_t)L.fidx * O.max_ch + L.cur_ch) * 1024;
            p.ics1.qbuf = is_pair
                ? O.qbuf_out +
                  ((int64_t)L.fidx * O.max_ch + L.cur_ch + 1) * 1024
                : nullptr;
            L.elem_ch0 = L.cur_ch;
            L.cur_ch += want;
            L.common_window = false;
            L.ms_mask = 0;
            int r = 0;
            if (is_pair) {
                r = p.decode_cpe_header(br, &L.common_window, &L.ms_mask);
                if (r < 0) { L.status = r; continue; }
            }
            r = p.ics0.decode_pre_spectrum(br, L.common_window);
            if (r < 0 || br.error) { L.status = r < 0 ? r : -2; continue; }
            L.ics = &p.ics0;
            L.ics_idx = 0;
            PROF_START(br0);
            L.n_runs = p.ics0.build_runs(
                L.runs, L.simd ? L.plan : nullptr, &L.has_pns);
            PROF_STOP(br0, 12);
            L.ri = 0;
            L.phase = 1;
            if (L.simd) return true;  // fresh ICS: caller builds a plan
            continue;
        }
        if (eid == 4) {  // DSE
            br.read(4);
            int align = (int)br.read(1);
            int count = (int)br.read(8);
            if (count == 255) count += (int)br.read(8);
            if (align) realign(br);
            br.ignore((int64_t)count * 8);
            if (br.error) L.status = -2;
            continue;
        }
        if (eid == 6) {  // FIL
            int count = (int)br.read(4);
            if (count == 15) count += (int)br.read(8) - 1;
            if (count > 0) {
                br.read(4);
                br.ignore(4);
                br.ignore((int64_t)(count - 1) * 8);
            }
            if (br.error) L.status = -2;
            continue;
        }
        L.status = -5;  // CCE / PCE unsupported
    }
}

// One fast pair codeword on a lane. 0 = decoded, 1 = run finished,
// 2 = needs the scalar path (long code or stream tail). Per-codeword lane
// rotation beats burst decoding here: the rotation itself provides the
// instruction-level parallelism (independent bitstream chains); a burst
// serializes on one lane's chain again (measured 2.4 -> 3.2 ms).
static inline int lane_step(LaneCtx& L, const float* pow43) {
    Bits& br = L.br;
    if (br.cnt < 32) {
        if (br.pos + 8 > br.len)
            return 2;  // near stream end: byte-wise fill via scalar path
        int nbytes = (63 - br.cnt) >> 3;
        uint64_t w;
        memcpy(&w, br.data + br.pos, 8);
        w = __builtin_bswap64(w);
        br.buf = (br.buf << (nbytes * 8)) | (w >> (64 - nbytes * 8));
        br.pos += nbytes;
        br.cnt += nbytes * 8;
    }
    int32_t e = L.tbl[(uint32_t)(br.buf >> (br.cnt - 12)) & 4095];
    if (e < 0) return 2;
    if (e & 1) {  // cb11 escape continuation (lane br is already synced)
        int r = L.ics->decode_escape_pair(br, e, L.i);
        if (r < 0) { L.status = r; return 1; }
        L.i += 2;
        return L.i < L.end ? 0 : 1;
    }
    emit_fast_pair(e, br.buf, br.cnt, &L.ics->qbuf[L.i]);
    L.i += 2;
    return L.i < L.end ? 0 : 1;
}

static void extract_ilp(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    const FrameOut& O) {
    constexpr int K = 4;
    std::vector<LaneCtx> lanes(K);
    std::vector<uint8_t> layout;
    std::vector<uint8_t> pns(n_frames, 0);
    int next = 0;
    const float* pow43 = tables().pow43;

    auto init_bands = [&](LaneCtx& L) {
        for (Ics* ics : {&L.pair.ics0, &L.pair.ics1}) {
            ics->bands_long = O.bands_long;
            ics->n_bands_long = O.n_bands_long;
            ics->bands_short = O.bands_short;
            ics->n_bands_short = O.n_bands_short;
        }
    };
    // Load the next frame into a lane and advance it until hot; frames with
    // no pair runs complete inside. Returns false when frames are exhausted.
    auto feed = [&](LaneCtx& L) -> bool {
        for (;;) {
            if (L.fidx >= 0) {
                if (L.has_pns) pns[L.fidx] = 1;
                finalize_layout(L, layout, O);
            }
            if (next >= n_frames) return false;
            int f = next++;
            L.fidx = f;
            L.status = 0;
            L.phase = 0;
            L.cur_ch = 0;
            L.n_elems = 0;
            L.has_pns = false;
            L.lcg = Lcg();
            init_bands(L);
            if (offsets[f] < 0 || offsets[f] + sizes[f] > data_len) {
                O.status[f] = -1;
                O.nch_out[f] = 0;
                continue;
            }
            L.br = Bits(data + offsets[f], sizes[f]);
            L.frame_bits = sizes[f] * 8;
            if (lane_advance(L, O)) return true;
        }
    };

    LaneCtx* act[K];
    int n_act = 0;
    for (int k = 0; k < K; k++)
        if (feed(lanes[k])) act[n_act++] = &lanes[k];

    // ------------------------------------------------------------------
    // Burst rotation: while all K lanes are hot, their bitstream cursors
    // and run bounds live in compact parallel locals (one stack cache
    // line) instead of being re-read from the ~27KB LaneCtx structs every
    // codeword — four of those are 4x the L1 and the pointer-chased
    // rotation measured 32 cyc per pair codeword against the ~9 cyc
    // register-resident ceiling (tools/microbench/vlc_interleave.cpp).
    // Run/frame transitions, escapes, long codes and stream tails exit to
    // lane_exit (cold), which syncs LaneCtx, advances, and reloads.
    // ------------------------------------------------------------------
    if (n_act == K) {
        uint64_t hbuf[K];
        int hcnt[K], hi[K], hend[K];
        int64_t hpos[K], hlen[K];
        const uint8_t* hdata[K];
        const int32_t* htbl[K];
        int16_t* hq[K];
        auto load_hot = [&](int k) {
            LaneCtx& L = *act[k];
            hbuf[k] = L.br.buf; hcnt[k] = L.br.cnt; hpos[k] = L.br.pos;
            hlen[k] = L.br.len; hdata[k] = L.br.data;
            htbl[k] = L.tbl; hi[k] = L.i; hend[k] = L.end;
            hq[k] = L.ics->qbuf;
        };
        auto store_hot = [&](int k) {
            LaneCtx& L = *act[k];
            L.br.buf = hbuf[k]; L.br.cnt = hcnt[k]; L.br.pos = hpos[k];
            L.i = hi[k];
        };
        // Exit the fast rotation for lane k. e >= 0: escape codeword
        // (fast-table entry, bit 0 set); e == -1: long code or byte-wise
        // stream tail (generic single-pair decode); e == INT32_MIN: run
        // complete, no assist. Returns false when the lane dies.
        auto lane_exit = [&](int k, int32_t e) -> bool {
            LaneCtx& L = *act[k];
            store_hot(k);
            if (e != INT32_MIN) {
                int r = e >= 0 ? L.ics->decode_escape_pair(L.br, e, L.i)
                               : L.ics->decode_one_pair(L.br, L.cb, L.i);
                if (r < 0) L.status = r;
                else L.i += 2;
                if (L.status >= 0 && L.i < L.end) { load_hot(k); return true; }
            }
            if (L.status >= 0) L.ri++;  // current run consumed
            if (lane_advance(L, O) || feed(L)) { load_hot(k); return true; }
            return false;
        };
        // Light run advance on run completion: pair -> pair within the same
        // ICS (optionally across NOISE runs, which read no spectral bits)
        // needs no bit-cursor sync — only the table pointer and span move.
        // Full store/reload transitions measured ~130 cyc each at ~34k per
        // call, a quarter of the whole stage. Returns false when the next
        // step needs the generic path (quad run / ICS complete / error).
        auto advance_run = [&](int k) -> bool {
            LaneCtx& L = *act[k];
            int ri = L.ri + 1;
            for (;;) {
                if (ri >= L.n_runs) { L.ri = ri - 1; return false; }
                const Ics::Run& R = L.runs[ri];
                if (R.cb == NOISE_HCB) {
                    L.has_pns = true;
                    L.ics->decode_noise(L.lcg, R.scale, R.start, R.end);
                    ri++;
                    continue;
                }
                if (R.cb <= 4) { L.ri = ri - 1; return false; }
                int cb = R.cb, end = R.end;
                while (ri + 1 < L.n_runs && L.runs[ri + 1].cb == cb &&
                       L.runs[ri + 1].start == end)
                    end = L.runs[++ri].end;
                L.ri = ri;
                L.cb = cb;
                L.tbl = g_fast[cb].tbl;
                L.scale = R.scale;
                L.i = R.start;
                L.end = end;
                htbl[k] = L.tbl;
                hi[k] = R.start;
                hend[k] = end;
                return true;
            }
        };
        for (int k = 0; k < K; k++) load_hot(k);
        int dead = -1;
        while (dead < 0) {
            #pragma GCC unroll 4
            for (int k = 0; k < K; k++) {
                if (hcnt[k] < 32) {
                    if (__builtin_expect(hpos[k] + 8 > hlen[k], 0)) {  // stream tail
                        if (!lane_exit(k, -1)) { dead = k; break; }
                        continue;
                    }
                    int nbytes = (63 - hcnt[k]) >> 3;
                    uint64_t w;
                    memcpy(&w, hdata[k] + hpos[k], 8);
                    w = __builtin_bswap64(w);
                    hbuf[k] = (hbuf[k] << (nbytes * 8)) |
                              (w >> (64 - nbytes * 8));
                    hpos[k] += nbytes;
                    hcnt[k] += nbytes * 8;
                }
                int32_t e =
                    htbl[k][(uint32_t)(hbuf[k] >> (hcnt[k] - 12)) & 4095];
                if (__builtin_expect(e < 0 || (e & 1), 0)) {
                    if (e >= 0 && hpos[k] + 8 <= hlen[k]) {
                        // Inline cb11 escape continuation (mirrors
                        // Ics::decode_escape_pair bit for bit): one refill
                        // guarantees >= 56 window bits, enough for the
                        // worst case len+signs + 2 escapes (14+21+21).
                        // The full-exit assist costs ~190 cyc and escapes
                        // are ~4% of codewords on dense content.
                        if (hcnt[k] < 56) {  // nbytes == 0 would shift by 64
                            int nbytes = (63 - hcnt[k]) >> 3;
                            uint64_t w;
                            memcpy(&w, hdata[k] + hpos[k], 8);
                            w = __builtin_bswap64(w);
                            hbuf[k] = (hbuf[k] << (nbytes * 8)) |
                                      (w >> (64 - nbytes * 8));
                            hpos[k] += nbytes;
                            hcnt[k] += nbytes * 8;
                        }
                        int len = (e >> 27) & 15, nz = (e >> 25) & 3;
                        hcnt[k] -= len + nz;
                        uint32_t signs =
                            (uint32_t)(hbuf[k] >> hcnt[k]) & ((1u << nz) - 1);
                        int x = (e >> 19) & 63, y = (e >> 12) & 63;
                        int sx = 0, sy = 0;
                        if (x && y) { sx = (signs >> 1) & 1; sy = signs & 1; }
                        else if (x) sx = signs & 1;
                        else if (y) sy = signs & 1;
                        bool bad = false;
                        for (int esc = 0; esc < 2; esc++) {
                            int* v = esc ? &y : &x;
                            if (*v != 16) continue;
                            uint32_t p =
                                (uint32_t)(hbuf[k] >> (hcnt[k] - 16)) & 0xFFFF;
                            uint32_t inv = (~p << 16) & 0xFFFF0000u;
                            int nn = inv ? __builtin_clz(inv) : 16;
                            if (nn >= 9) { bad = true; break; }
                            hcnt[k] -= nn + 1;
                            hcnt[k] -= nn + 4;
                            *v = (1 << (nn + 4)) +
                                 (int)((hbuf[k] >> hcnt[k]) &
                                       ((1u << (nn + 4)) - 1));
                        }
                        if (__builtin_expect(bad, 0)) {
                            LaneCtx& L = *act[k];
                            store_hot(k);
                            L.status = -35;
                            if (!lane_exit(k, INT32_MIN)) { dead = k; break; }
                            continue;
                        }
                        hbuf[k] &= (1ULL << hcnt[k]) - 1;
                        hq[k][hi[k]] = (int16_t)(sx ? -x : x);
                        hq[k][hi[k] + 1] = (int16_t)(sy ? -y : y);
                        hi[k] += 2;
                        if (hi[k] >= hend[k]) {
                            if (advance_run(k)) continue;
                            if (!lane_exit(k, INT32_MIN)) { dead = k; break; }
                        }
                        continue;
                    }
                    if (!lane_exit(k, e < 0 ? -1 : e)) { dead = k; break; }
                    continue;
                }
                emit_fast_pair(e, hbuf[k], hcnt[k], hq[k] + hi[k]);
                hi[k] += 2;
                if (__builtin_expect(hi[k] >= hend[k], 0)) {
                    if (advance_run(k)) continue;
                    if (!lane_exit(k, INT32_MIN)) { dead = k; break; }
                }
            }
        }
        // Frames exhausted: sync the survivors and drop the dead lane; the
        // generic rotation below drains the remaining <K lanes.
        for (int k = 0; k < K; k++)
            if (k != dead) store_hot(k);
        act[dead] = act[--n_act];
    }

    while (n_act) {
        for (int k = 0; k < n_act; k++) {
            LaneCtx& L = *act[k];
            int s = lane_step(L, pow43);
            if (s == 0) continue;
            if (s == 2) {
                int r = L.ics->decode_one_pair(L.br, L.cb, L.i);
                if (r < 0) L.status = r;
                else L.i += 2;
                if (L.status >= 0 && L.i < L.end) continue;
            }
            if (L.status >= 0) L.ri++;  // current run consumed
            if (!lane_advance(L, O) && !feed(L)) {
                act[k] = act[--n_act];
                k--;
            }
        }
    }
    for (int k = 0; k < K; k++) {
        LaneCtx& L = lanes[k];
        if (L.fidx < 0) continue;
        if (L.has_pns) pns[L.fidx] = 1;
        finalize_layout(L, layout, O);
    }

    pns_prevshape_pass(data, data_len, offsets, sizes, n_frames, O,
                       pns.data());
}

#ifdef SH_AAC_SIMD
// ---------------------------------------------------------------------------
// 8-lane AVX-512 gather engine.
//
// Eight frames decode concurrently with ALL per-lane state in ZMM lanes:
// bit window, bit count, byte cursor, qbuf index, span end, and a per-lane
// table offset into the concatenated 13-bit pair tables (g_simd_tbl). Run
// transitions happen IN-VECTOR via masked gathers from pre-built span plans
// (one (start,end,tblofs) triple per merged same-book span of an ICS), and
// cb11 escape continuations decode in-vector too — the scalar ILP engine
// plateaus at ~24 cyc/codeword because of exactly these events
// (tools/microbench/README.md), while this engine's model measures ~9.
//
// Everything the vector can't do exits to the scalar machinery: quad runs,
// ICS/element/frame boundaries (lane_advance/feed with LaneCtx.simd set, so
// lane_advance returns at each fresh ICS for plan building), codes longer
// than 13 bits, stream tails, and corrupt escapes. Output is bit-identical
// to the scalar engines (same packed-entry emission; PNS re-decode and
// prev_window_shape chain shared via pns_prevshape_pass).
// ---------------------------------------------------------------------------
static void extract_simd8(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    const FrameOut& O) {
    constexpr int K = 8;
    constexpr int PM = MAX_WINDOWS * MAX_SFBS + 2;  // spans + end marker
    std::vector<LaneCtx> lanes(K);
    std::vector<uint8_t> layout;
    std::vector<uint8_t> pns(n_frames, 0);
    int next = 0;
    for (auto& L : lanes) L.simd = true;

    auto init_bands = [&](LaneCtx& L) {
        for (Ics* ics : {&L.pair.ics0, &L.pair.ics1}) {
            ics->bands_long = O.bands_long;
            ics->n_bands_long = O.n_bands_long;
            ics->bands_short = O.bands_short;
            ics->n_bands_short = O.n_bands_short;
        }
    };
    auto feed = [&](LaneCtx& L) -> bool {
        for (;;) {
            if (L.fidx >= 0) {
                if (L.has_pns) pns[L.fidx] = 1;
                finalize_layout(L, layout, O);
            }
            if (next >= n_frames) return false;
            int f = next++;
            L.fidx = f;
            L.status = 0;
            L.phase = 0;
            L.cur_ch = 0;
            L.n_elems = 0;
            L.has_pns = false;
            L.lcg = Lcg();
            init_bands(L);
            if (offsets[f] < 0 || offsets[f] + sizes[f] > data_len) {
                O.status[f] = -1;
                O.nch_out[f] = 0;
                continue;
            }
            L.br = Bits(data + offsets[f], sizes[f]);
            L.frame_bits = sizes[f] * 8;
            if (lane_advance(L, O)) return true;  // fresh ICS (simd mode)
        }
    };

    // Per-lane span plans, one packed int64 per span so the in-vector
    // advance needs a single gather (the loop is gather-throughput-bound):
    //   [10:0] start  [21:11] end  [31:22] last run index the span covers
    //   (generic-engine handover).
    // Spans (sign bit clear) carry the table offset in [51:32] — pair
    // books at (cb-5)<<13, quad books at (cb+6)<<13, both decoded
    // in-vector. The only marker (sign bit set) is ICS-complete. Emitted
    // by build_runs (same walk as the run list) through each lane's
    // LaneCtx::plan pointer.
    std::vector<int64_t> plan(K * PM);
    for (int l = 0; l < K; l++) lanes[l].plan = &plan[l * PM];

    // Committed lane state (vector registers spill here around fixups).
    alignas(64) int64_t buf_a[K], cnt_a[K], pos_a[K], i_a[K], end_a[K],
        tofs_a[K], pri_a[K];
    int64_t fbase[K], fend[K];
    int16_t* hq[K];
    uint8_t reason[K] = {0};  // 1 tail/miss (assist), 2 bad escape, 3 plan
    bool lane_live[K] = {false};

    auto sync_to_ctx = [&](int l) {
        LaneCtx& L = lanes[l];
        L.br.buf = (uint64_t)buf_a[l];
        L.br.cnt = (int)cnt_a[l];
        L.br.pos = pos_a[l] - fbase[l];
        L.i = (int)i_a[l];
    };
    auto sync_from_ctx = [&](int l) {
        LaneCtx& L = lanes[l];
        buf_a[l] = (int64_t)L.br.buf;
        cnt_a[l] = L.br.cnt;
        pos_a[l] = fbase[l] + L.br.pos;
        i_a[l] = L.i;
    };

    // Walk lane l's plan (L.br synced) until it sits on a decode span
    // (true — pair or quad, both run in-vector) or frames run out (false):
    // ICS-complete markers advance ICS/element/frame via lane_advance/feed
    // and rebuild the plan.
    auto lane_to_hot = [&](int l) -> bool {
        LaneCtx& L = lanes[l];
        for (;;) {
            if (L.status < 0) {
                if (!(lane_advance(L, O) || feed(L))) return false;
                fbase[l] = offsets[L.fidx];
                fend[l] = offsets[L.fidx] + sizes[L.fidx];
                pri_a[l] = 0;
                sync_from_ctx(l);
                continue;
            }
            int64_t e = plan[l * PM + pri_a[l]];
            int start = (int)(e & 0x7FF);
            int end = (int)((e >> 11) & 0x7FF);
            int ri = (int)((e >> 22) & 0x3FF);
            if (e >= 0) {  // decode span (pair or quad)
                int32_t t = (int32_t)((e >> 32) & 0xFFFFF);
                i_a[l] = start;
                end_a[l] = end;
                tofs_a[l] = t;
                int book = t >> FB_SIMD;
                L.cb = book >= 7 ? book - 6 : book + 5;
                L.tbl = g_fast[L.cb].tbl;
                L.ri = ri;
                L.i = start;
                L.end = end;
                hq[l] = L.ics->qbuf;
                return true;
            }
            // ICS complete -> dequant + next ICS/elem/frame
            L.ri = ri;
            if (!(lane_advance(L, O) || feed(L))) return false;
            fbase[l] = offsets[L.fidx];
            fend[l] = offsets[L.fidx] + sizes[L.fidx];
            pri_a[l] = 0;
            sync_from_ctx(l);
        }
    };

    bool died = false;
    for (int l = 0; l < K; l++) {
        if (!feed(lanes[l])) { died = true; continue; }
        lane_live[l] = true;
        fbase[l] = offsets[lanes[l].fidx];
        fend[l] = offsets[lanes[l].fidx] + sizes[lanes[l].fidx];
        pri_a[l] = 0;
        sync_from_ctx(l);
        if (!lane_to_hot(l)) { lane_live[l] = false; died = true; }
    }

    if (!died) {
        const __m512i vz = _mm512_setzero_si512();
        const __m512i v1 = _mm512_set1_epi64(1);
        const __m512i v8 = _mm512_set1_epi64(8);
        const __m512i v32 = _mm512_set1_epi64(32);
        const __m512i v56 = _mm512_set1_epi64(56);
        const __m512i v63 = _mm512_set1_epi64(63);
        const __m512i v64 = _mm512_set1_epi64(64);
        const __m512i bsw = _mm512_broadcast_i32x4(
            _mm_set_epi8(8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7));
        __m512i lanebase;
        {
            int64_t lb[K];
            for (int l = 0; l < K; l++) lb[l] = (int64_t)l * PM;
            lanebase = _mm512_loadu_si512(lb);
        }
        // The bit window rides LEFT-aligned in topv (next bit = bit 63,
        // bits below the cntv valid ones are zero): the probe index is a
        // constant shift off the loop-carried chain, consumption is one
        // variable shift, and no post-consume masking is needed. The spill
        // arrays stay right-aligned (scalar Bits form); conversion happens
        // at the vector load/store boundary only.
        const __m512i vall1 = _mm512_set1_epi64(-1);
        // negmask LUT indexed by sx + 2*sy: which int16 halves to negate.
        const __m512i negtbl = _mm512_set_epi64(
            0, 0, 0, 0, 0xFFFFFFFFLL, 0xFFFF0000LL, 0xFFFFLL, 0);
        // Quad negmask LUT (16 entries, vpermi2q): bit j of the index
        // negates int8 field j. Loaded inside the rare gated quad block
        // rather than held live across the hot loop (register pressure).
        static const int64_t kQuadNeg[16] = {
            0x00000000, 0x000000FF, 0x0000FF00, 0x0000FFFF,
            0x00FF0000, 0x00FF00FF, 0x00FFFF00, 0x00FFFFFF,
            int64_t(0xFF000000), int64_t(0xFF0000FF),
            int64_t(0xFF00FF00), int64_t(0xFF00FFFF),
            int64_t(0xFFFF0000), int64_t(0xFFFF00FF),
            int64_t(0xFFFFFF00), int64_t(0xFFFFFFFF)};
        const __m512i v7_13 = _mm512_set1_epi64(7 << FB_SIMD);
        __m512i cntv = _mm512_load_si512(cnt_a);
        __m512i topv = _mm512_sllv_epi64(_mm512_load_si512(buf_a),
                                         _mm512_sub_epi64(v64, cntv));
        __m512i posv = _mm512_load_si512(pos_a);
        __m512i iv = _mm512_load_si512(i_a);
        __m512i endv = _mm512_load_si512(end_a);
        __m512i tofsv = _mm512_load_si512(tofs_a);
        __m512i priv_ = _mm512_load_si512(pri_a);
        __m512i lenv = _mm512_loadu_si512(fend);
        __m512i hqv = _mm512_loadu_si512((const void*)hq);

        auto refill = [&](__mmask8 m) {
            __m512i w = _mm512_mask_i64gather_epi64(vz, m, posv, data, 1);
            w = _mm512_shuffle_epi8(w, bsw);
            __m512i nbytes =
                _mm512_srli_epi64(_mm512_sub_epi64(v63, cntv), 3);
            __m512i nbits = _mm512_slli_epi64(nbytes, 3);
            // Deposit the top nbits of w right below the valid bits.
            __m512i wk = _mm512_and_si512(
                w, _mm512_sllv_epi64(vall1, _mm512_sub_epi64(v64, nbits)));
            __m512i merged =
                _mm512_or_si512(topv, _mm512_srlv_epi64(wk, cntv));
            topv = _mm512_mask_mov_epi64(topv, m, merged);
            posv = _mm512_mask_add_epi64(posv, m, posv, nbytes);
            cntv = _mm512_mask_add_epi64(cntv, m, cntv, nbits);
        };

        for (;;) {
            __mmask8 freeze = 0;
            PROF_START(vb);
            for (;;) {
                PROF_COUNT(8, 1);
                // (1) when ANY lane runs below 32 window bits, top up EVERY
                // lane: with 8 lanes draining at independent phases a
                // per-lane trigger fires nearly every iteration and the
                // loop pays one gather per codeword; the all-lane top-up
                // phase-locks the lanes (early top-ups are no-ops — the
                // refill's nbytes is per-lane). Starving stream tails exit.
                __mmask8 need = _mm512_cmplt_epi64_mask(cntv, v32);
                __mmask8 act = 0xFF;
                if (need) {
                    __mmask8 tailm = _mm512_cmpgt_epi64_mask(
                        _mm512_add_epi64(posv, v8), lenv);
                    __mmask8 tf = need & tailm;
                    if (tf) {
                        for (int l = 0; l < K; l++)
                            if ((tf >> l) & 1) reason[l] = 1;
                        freeze |= tf;
                        act &= ~tf;
                    }
                    __mmask8 rf = act & ~tailm;
                    if (rf) refill(rf);
                }
                // (2) probe the concatenated 13-bit tables.
                __m512i idx = _mm512_add_epi64(
                    _mm512_srli_epi64(topv, 64 - FB_SIMD), tofsv);
                __m512i e64 = _mm512_mask_i64gather_epi64(
                    vz, act, idx, g_simd_tbl, 8);
                __mmask8 miss =
                    _mm512_mask_cmplt_epi64_mask(act, e64, vz);
                if (miss) {
                    for (int l = 0; l < K; l++)
                        if ((miss >> l) & 1) reason[l] = 1;
                    freeze |= miss;
                    act &= ~miss;
                }
                // Lanes sitting on quad spans (table offsets >= 7<<13)
                // take the gated quad path in step (7); bit 37 belongs to
                // their value bytes, so the escape test must exclude them.
                __mmask8 qm = _mm512_mask_cmpge_epi64_mask(act, tofsv,
                                                           v7_13);
                // (3) escape lanes need up to 56 window bits up front.
                __mmask8 esc = _mm512_mask_test_epi64_mask(
                    act & ~qm, e64, _mm512_set1_epi64(int64_t{1} << 37));
                if (esc) {
                    __mmask8 need2 =
                        _mm512_mask_cmplt_epi64_mask(esc, cntv, v56);
                    __mmask8 t2 = _mm512_mask_cmpgt_epi64_mask(
                        need2, _mm512_add_epi64(posv, v8), lenv);
                    if (t2) {
                        for (int l = 0; l < K; l++)
                            if ((t2 >> l) & 1) reason[l] = 1;
                        freeze |= t2;
                        act &= ~t2;
                        esc &= ~t2;
                        need2 &= ~t2;
                    }
                    if (need2) refill(need2);
                }
                // (4) consume len + sign bits; apply the stream signs to
                // the pre-packed int16 pair with one xor+psubw negation.
                // The loop-carried chain is just lentot -> sllv -> (probe).
                __m512i lentot = _mm512_and_si512(
                    _mm512_srli_epi64(e64, 32), _mm512_set1_epi64(31));
                __m512i top2 = _mm512_sllv_epi64(topv, lentot);
                __m512i cnt2 = _mm512_sub_epi64(cntv, lentot);
                __m512i sx = _mm512_and_si512(
                    _mm512_srlv_epi64(
                        topv, _mm512_and_si512(_mm512_srli_epi64(e64, 38),
                                               _mm512_set1_epi64(127))),
                    v1);
                __m512i sy = _mm512_and_si512(
                    _mm512_srlv_epi64(
                        topv, _mm512_and_si512(_mm512_srli_epi64(e64, 45),
                                               _mm512_set1_epi64(127))),
                    v1);
                // negmask per 16-bit half from (sx, sy) via a 4-entry LUT.
                __m512i negm = _mm512_permutexvar_epi64(
                    _mm512_add_epi64(sx, _mm512_add_epi64(sy, sy)),
                    negtbl);
                __m512i val = _mm512_sub_epi16(_mm512_xor_si512(e64, negm),
                                               negm);
                // (5) in-vector cb11 escape continuations, x then y. The
                // escape field holds +-16 with the stream sign already
                // applied; the decoded magnitude replaces it, negated by
                // the same sign.
                if (esc) {
                    const __m512i vFFFF = _mm512_set1_epi64(0xFFFF);
                    for (int which = 0; which < 2; which++) {
                        __mmask8 m = _mm512_mask_test_epi64_mask(
                            esc & act, e64,
                            _mm512_set1_epi64(int64_t{1} << (52 + which)));
                        if (!m) continue;
                        // Escape prefix = leading ones of the current
                        // window top (top2 is already past len+signs).
                        __m512i opnd = _mm512_and_si512(
                            _mm512_xor_si512(top2, vall1),
                            _mm512_slli_epi64(vFFFF, 48));
                        __m512i n = _mm512_lzcnt_epi64(opnd);
                        __mmask8 bad = _mm512_mask_cmpge_epi64_mask(
                            m, n, _mm512_set1_epi64(9));
                        if (bad) {
                            for (int l = 0; l < K; l++)
                                if ((bad >> l) & 1) reason[l] = 2;
                            freeze |= bad;
                            act &= ~bad;
                            esc &= ~bad;
                            m &= ~bad;
                        }
                        if (!m) continue;
                        __m512i n4 = _mm512_add_epi64(n,
                                                      _mm512_set1_epi64(4));
                        __m512i adv =
                            _mm512_add_epi64(_mm512_add_epi64(n, v1), n4);
                        cnt2 = _mm512_mask_sub_epi64(cnt2, m, cnt2, adv);
                        __m512i mant = _mm512_srlv_epi64(
                            _mm512_sllv_epi64(top2,
                                              _mm512_add_epi64(n, v1)),
                            _mm512_sub_epi64(v64, n4));
                        top2 = _mm512_mask_sllv_epi64(top2, m, top2, adv);
                        __m512i mag = _mm512_add_epi64(
                            _mm512_sllv_epi64(v1, n4), mant);
                        // sign of the +-16 field: bit 15 (x) / bit 31 (y).
                        __m512i s = _mm512_and_si512(
                            _mm512_srli_epi64(val, 15 + 16 * which), v1);
                        __m512i sv = _mm512_add_epi64(
                            _mm512_xor_si512(mag, _mm512_sub_epi64(vz, s)),
                            s);
                        __m512i fld = _mm512_and_si512(sv, vFFFF);
                        if (which == 0) {
                            val = _mm512_mask_or_epi64(
                                val, m,
                                _mm512_andnot_si512(vFFFF, val), fld);
                        } else {
                            val = _mm512_mask_or_epi64(
                                val, m,
                                _mm512_andnot_si512(
                                    _mm512_slli_epi64(vFFFF, 16), val),
                                _mm512_slli_epi64(fld, 16));
                        }
                    }
                }
                // Quad lanes (gated): the stream-sign group is read
                // from the PRE-consume window, so this must run before
                // the state commit.
                if (qm) {
                    __m512i dstq = _mm512_add_epi64(
                        hqv, _mm512_slli_epi64(iv, 1));
                    __m512i lenq = _mm512_and_si512(
                        _mm512_srli_epi64(e64, 38), _mm512_set1_epi64(63));
                    __m512i nzq = _mm512_sub_epi64(lentot, lenq);
                    __m512i signsq = _mm512_srlv_epi64(
                        _mm512_sllv_epi64(topv, lenq),
                        _mm512_sub_epi64(v64, nzq));
                    __m512i s0 = _mm512_and_si512(
                        _mm512_srlv_epi64(
                            signsq,
                            _mm512_and_si512(_mm512_srli_epi64(e64, 44),
                                             _mm512_set1_epi64(3))),
                        v1);
                    __m512i s1 = _mm512_and_si512(
                        _mm512_srlv_epi64(
                            signsq,
                            _mm512_and_si512(_mm512_srli_epi64(e64, 46),
                                             _mm512_set1_epi64(3))),
                        v1);
                    __m512i s2 = _mm512_and_si512(
                        _mm512_srlv_epi64(
                            signsq,
                            _mm512_and_si512(_mm512_srli_epi64(e64, 48),
                                             _mm512_set1_epi64(3))),
                        v1);
                    __m512i s3 = _mm512_and_si512(
                        _mm512_srlv_epi64(
                            signsq,
                            _mm512_and_si512(_mm512_srli_epi64(e64, 50),
                                             _mm512_set1_epi64(3))),
                        v1);
                    __m512i idx16 = _mm512_or_si512(
                        _mm512_or_si512(s0, _mm512_slli_epi64(s1, 1)),
                        _mm512_or_si512(_mm512_slli_epi64(s2, 2),
                                        _mm512_slli_epi64(s3, 3)));
                    __m512i negm8 = _mm512_permutex2var_epi64(
                        _mm512_loadu_si512(kQuadNeg), idx16,
                        _mm512_loadu_si512(kQuadNeg + 8));
                    __m512i v8q = _mm512_sub_epi8(
                        _mm512_xor_si512(e64, negm8), negm8);
                    __m512i qw = _mm512_cvtepi8_epi16(
                        _mm512_cvtepi64_epi32(v8q));
                    _mm512_mask_i64scatter_epi64(nullptr, qm, dstq, qw, 1);
                }
                // (6) state commit.
                cntv = _mm512_mask_mov_epi64(cntv, act, cnt2);
                topv = _mm512_mask_mov_epi64(topv, act, top2);
                // (7) emit. Pair lanes: both int16 values as one aligned
                // 32-bit scatter (span starts are multiples of 4, i steps
                // by 2). Quad lanes: four int8 entry values get the 4-bit
                // stream-sign group applied via a 16-entry negmask LUT,
                // sign-extend to 4 int16s (vpmovqd + vpmovsxbw keeps lane
                // order) and leave as one aligned 64-bit scatter, i
                // stepping by 4. Lanes scatter into disjoint qbufs.
                __m512i dst = _mm512_add_epi64(hqv,
                                               _mm512_slli_epi64(iv, 1));
                _mm512_mask_i64scatter_epi32(
                    nullptr, act & ~qm, dst, _mm512_cvtepi64_epi32(val), 1);
                // (8) span cursors + in-vector plan advance.
                __m512i stepv = _mm512_mask_mov_epi64(
                    _mm512_set1_epi64(2), qm, _mm512_set1_epi64(4));
                iv = _mm512_mask_add_epi64(iv, act, iv, stepv);
                __mmask8 fin =
                    _mm512_mask_cmpge_epi64_mask(act, iv, endv);
                if (fin) {
                    priv_ = _mm512_mask_add_epi64(priv_, fin, priv_, v1);
                    __m512i pidx = _mm512_add_epi64(lanebase, priv_);
                    __m512i nse = _mm512_mask_i64gather_epi64(
                        vz, fin, pidx, plan.data(), 8);
                    __mmask8 marker =
                        _mm512_mask_cmplt_epi64_mask(fin, nse, vz);
                    if (marker) {
                        for (int l = 0; l < K; l++)
                            if ((marker >> l) & 1) reason[l] = 3;
                        freeze |= marker;
                    }
                    __mmask8 ok = fin & ~marker;
                    const __m512i v7FF = _mm512_set1_epi64(0x7FF);
                    iv = _mm512_mask_and_epi64(iv, ok, nse, v7FF);
                    endv = _mm512_mask_and_epi64(
                        endv, ok, _mm512_srli_epi64(nse, 11), v7FF);
                    tofsv = _mm512_mask_and_epi64(
                        tofsv, ok, _mm512_srli_epi64(nse, 32),
                        _mm512_set1_epi64(0xFFFFF));
                }
                PROF_COUNT(9, __builtin_popcount(act));
                if (freeze) break;
            }
            PROF_STOP(vb, 1);
            PROF_COUNT(10, 1);
            PROF_START(fx);
            // Fixup: spill, resolve each frozen lane scalar, reload.
            _mm512_store_si512(
                buf_a,
                _mm512_srlv_epi64(topv, _mm512_sub_epi64(v64, cntv)));
            _mm512_store_si512(cnt_a, cntv);
            _mm512_store_si512(pos_a, posv);
            _mm512_store_si512(i_a, iv);
            _mm512_store_si512(end_a, endv);
            _mm512_store_si512(tofs_a, tofsv);
            _mm512_store_si512(pri_a, priv_);
            for (int l = 0; l < K; l++) {
                if (!reason[l]) continue;
                LaneCtx& L = lanes[l];
                sync_to_ctx(l);
                if (reason[l] == 1) {  // stream tail or long code
                    PROF_START(td);
                    int book = (int)(tofs_a[l] >> FB_SIMD);
                    if (book >= 7) {
                        // Quad span at the buffer tail / invalid prefix:
                        // finish the span through the guarded scalar path
                        // and advance the plan.
                        Ics::Run RR{book - 6, L.i, (int)end_a[l], 0.0f};
                        int rq = run_quad_scalar(*L.ics, L.br, RR);
                        if (rq < 0) L.status = rq;
                        else if (L.br.error) L.status = -33;
                        L.i = (int)end_a[l];
                        sync_from_ctx(l);
                        if (L.status >= 0) pri_a[l]++;
                        PROF_STOP(td, 15);
                        reason[l] = 0;
                        if (!lane_to_hot(l)) { lane_live[l] = false; died = true; }
                        continue;
                    }
                    L.cb = book + 5;
                    // A long code mid-stream needs one scalar pair and the
                    // vector resumes; in the last 8 bytes of the frame the
                    // vector would re-freeze per codeword, so drain the
                    // span scalar while the cursor stays in the tail —
                    // through the 12-bit fast table (Bits::fill is fully
                    // guarded), with the generic walk only for misses.
                    const int32_t* fr = g_fast[L.cb].tbl;
                    do {
                        Bits& tb = L.br;
                        if (tb.cnt < 32) tb.fill();
                        int32_t e = tb.cnt >= 32
                            ? fr[(uint32_t)(tb.buf >> (tb.cnt - 12)) & 4095]
                            : -1;
                        int r = 0;
                        if (e < 0)
                            r = L.ics->decode_one_pair(tb, L.cb, L.i);
                        else if (e & 1)
                            r = L.ics->decode_escape_pair(tb, e, L.i);
                        else
                            emit_fast_pair(e, tb.buf, tb.cnt,
                                           &L.ics->qbuf[L.i]);
                        if (r < 0) L.status = r;
                        else L.i += 2;
                    } while (L.status >= 0 && L.i < (int)end_a[l] &&
                             L.br.pos + 8 > L.br.len);
                    PROF_STOP(td, 15);
                    sync_from_ctx(l);
                    if (L.status >= 0 && L.i < (int)end_a[l]) {
                        reason[l] = 0;
                        continue;  // still inside the span
                    }
                    if (L.status >= 0) pri_a[l]++;
                } else if (reason[l] == 2) {
                    L.status = -35;  // corrupt escape prefix
                }
                reason[l] = 0;
                if (!lane_to_hot(l)) { lane_live[l] = false; died = true; }
            }
            if (died) break;
            cntv = _mm512_load_si512(cnt_a);
            topv = _mm512_sllv_epi64(_mm512_load_si512(buf_a),
                                     _mm512_sub_epi64(v64, cntv));
            posv = _mm512_load_si512(pos_a);
            iv = _mm512_load_si512(i_a);
            endv = _mm512_load_si512(end_a);
            tofsv = _mm512_load_si512(tofs_a);
            priv_ = _mm512_load_si512(pri_a);
            lenv = _mm512_loadu_si512(fend);
            hqv = _mm512_loadu_si512((const void*)hq);
            PROF_STOP(fx, 2);
        }
    }

    // Frames exhausted: hand surviving lanes (mid-span state in the spill
    // arrays) to the scalar rotation to drain.
    PROF_START(dr);
    LaneCtx* act2[K];
    int n_act = 0;
    const float* pow43 = tables().pow43;
    for (int l = 0; l < K; l++) {
        if (!lane_live[l]) continue;
        LaneCtx& L = lanes[l];
        sync_to_ctx(l);
        L.simd = false;
        L.ri = (int)((plan[l * PM + pri_a[l]] >> 22) & 0x3FF);
        int book = (int)(tofs_a[l] >> FB_SIMD);
        if (book >= 7) {
            // Mid-quad-span handover: finish the span scalar, then let the
            // rotation continue from the next run (the rotation's hot loop
            // decodes pairs only).
            Ics::Run RR{book - 6, L.i, (int)end_a[l], 0.0f};
            int rq = run_quad_scalar(*L.ics, L.br, RR);
            if (rq < 0) L.status = rq;
            else if (L.br.error) L.status = -33;
            if (L.status >= 0) L.ri++;
            if (lane_advance(L, O) || feed(L))
                act2[n_act++] = &L;
            continue;
        }
        L.cb = book + 5;
        L.tbl = g_fast[L.cb].tbl;
        L.end = (int)end_a[l];
        act2[n_act++] = &L;
    }
    for (auto& L : lanes) L.simd = false;
    while (n_act) {
        for (int k = 0; k < n_act; k++) {
            LaneCtx& L = *act2[k];
            int s = lane_step(L, pow43);
            if (s == 0) continue;
            if (s == 2) {
                int r = L.ics->decode_one_pair(L.br, L.cb, L.i);
                if (r < 0) L.status = r;
                else L.i += 2;
                if (L.status >= 0 && L.i < L.end) continue;
            }
            if (L.status >= 0) L.ri++;  // current run consumed
            if (!lane_advance(L, O) && !feed(L)) {
                act2[k] = act2[--n_act];
                k--;
            }
        }
    }
    for (int l = 0; l < K; l++) {
        LaneCtx& L = lanes[l];
        if (L.fidx < 0) continue;
        if (L.has_pns) pns[L.fidx] = 1;
        finalize_layout(L, layout, O);
    }
    PROF_STOP(dr, 7);
    PROF_START(pp);
    pns_prevshape_pass(data, data_len, offsets, sizes, n_frames, O,
                       pns.data());
    PROF_STOP(pp, 6);
}
#endif  // SH_AAC_SIMD

}  // namespace

extern "C" {

// Register a Huffman codebook. idx 0 = scalefactor book, 1..11 = spectrum
// books (identity values 0..n-1, matching aac.py spectrum_codebook).
void sh_aac_set_codebook(int32_t idx, int32_t n, const uint32_t* codes,
                         const int32_t* lens) {
    if (idx < 0 || idx > 11) return;
    std::vector<uint8_t> l8(n);
    std::vector<uint16_t> vals(n);
    for (int i = 0; i < n; i++) {
        l8[i] = (uint8_t)lens[i];
        // Pre-split the codeword index into its tuple digits so the decode
        // hot loop needs no integer divisions (aac.py aac_quad/_pair_value).
        uint16_t v;
        if (idx >= 1 && idx <= 4) {
            v = (uint16_t)(((i / 27) << 6) | (((i / 9) % 3) << 4) |
                           (((i / 3) % 3) << 2) | (i % 3));
        } else if (idx == 5 || idx == 6) {
            v = (uint16_t)(((i / 9) << 4) | (i % 9));       // x,y biased by +4
        } else if (idx == 7 || idx == 8) {
            v = (uint16_t)(((i / 8) << 5) | (i % 8));
        } else if (idx == 9 || idx == 10) {
            v = (uint16_t)(((i / 13) << 5) | (i % 13));
        } else if (idx == 11) {
            v = (uint16_t)(((i / 17) << 5) | (i % 17));
        } else {
            v = (uint16_t)i;  // scalefactor book: raw index
        }
        vals[i] = v;
    }
    g_books[idx].build(codes, l8.data(), vals.data(), n);
    g_book_set[idx] = true;
    if (idx == 0) {
        for (int i = 0; i < (1 << 12); i++) g_scf_fast[i] = -1;
        for (int i = 0; i < n; i++) {
            int l = lens[i];
            if (l == 0 || l > 12) continue;
            int32_t packed = (l << 8) | i;
            uint32_t base = codes[i] << (12 - l);
            for (uint32_t k = 0; k < (1u << (12 - l)); k++)
                g_scf_fast[base + k] = packed;
        }
    }

    // Build the packed fast table (spectral books only): 12-bit lookups
    // cover every non-escape codeword of most books in one probe. Width is
    // uniformly 12 for every spectral book (short codes replicate) so the
    // interleaved engine can use one shift for all lanes.
    const int fb = 12;
    g_fast[idx].bits = fb;
    int32_t* fr = g_fast[idx].tbl;
    for (int i = 0; i < (1 << fb); i++) fr[i] = -1;
    if (idx >= 1) {
        for (int i = 0; i < n; i++) {
            int l = lens[i];
            if (l == 0 || l > fb) continue;
            int32_t v = vals[i];
            int32_t packed;
            if (idx <= 4) {  // quads
                int q[4] = {(v >> 6) & 3, (v >> 4) & 3, (v >> 2) & 3, v & 3};
                bool is_signed = idx == 1 || idx == 2;
                int nz = 0;
                int32_t digits = 0;
                for (int j = 0; j < 4; j++) {
                    int mag, neg;
                    if (is_signed) { mag = q[j] == 1 ? 0 : 1; neg = q[j] == 0; }
                    else { mag = q[j]; neg = 0; nz += q[j] != 0; }
                    digits |= ((neg << 2) | mag) << (j * 3);
                }
                if (is_signed) nz = 0;
                packed = (l << 27) | (nz << 24) | (digits << 12);
            } else {  // pairs
                int x, y;
                if (idx == 5 || idx == 6) { x = (v >> 4) - 4; y = (v & 15) - 4; }
                else { x = v >> 5; y = v & 31; }
                int xa = x < 0 ? -x : x, ya = y < 0 ? -y : y;
                int xneg = x < 0, yneg = y < 0;
                int nz = (idx == 5 || idx == 6) ? 0 : (x != 0) + (y != 0);
                packed = (l << 27) | (nz << 25) | (xa << 19) | (xneg << 18)
                         | (ya << 12) | (yneg << 11);
                // cb11 escape codewords (magnitude 16) stay in the fast
                // table: bit 0 flags the inline escape continuation.
                if (idx == 11 && (x == 16 || y == 16)) packed |= 1;
            }
            uint32_t base = codes[i] << (fb - l);
            for (uint32_t k = 0; k < (1u << (fb - l)); k++)
                fr[base + k] = packed;
        }
    }
#ifdef SH_AAC_SIMD
    // Quad books (1..4) pack 64-bit entries for the in-vector quad path
    // (sharing the pair layout's [36:32] lentot and clear [37] esc bit so
    // the loop's shared steps need no branching):
    //   [31:0]  four int8 values in decode order (entry signs applied for
    //           books 1/2; magnitudes for 3/4)
    //   [36:32] lentot = len + nz
    //   [37]    0 (no escapes in quad books)
    //   [43:38] len (stream sign bits sit right after the codeword)
    //   [51:44] four 2-bit stream-sign shifts: nonzero value j's sign is
    //           bit (nz-1-rank_j) of the nz-bit sign group; zero values
    //           store 0 (negating a zero is harmless)
    //   [63]    set = invalid prefix (assist)
    if (idx >= 1 && idx <= 4) {
        int64_t* sr = g_simd_tbl + ((idx + 6) << FB_SIMD);
        for (int i = 0; i < (1 << FB_SIMD); i++) sr[i] = -1;
        for (int i = 0; i < n; i++) {
            int l = lens[i];
            if (l == 0 || l > FB_SIMD) continue;
            uint16_t v = vals[i];
            int q[4] = {(v >> 6) & 3, (v >> 4) & 3, (v >> 2) & 3, v & 3};
            bool is_signed = idx == 1 || idx == 2;
            int sq[4];
            int nz = 0;
            for (int j = 0; j < 4; j++) {
                if (is_signed) {
                    // digit 0 -> -1, 1 -> 0, 2 -> +1 (matches g_fast's
                    // mag/neg packing above).
                    sq[j] = q[j] - 1;
                } else {
                    sq[j] = q[j];
                    if (q[j]) nz++;
                }
            }
            int64_t packed = ((int64_t)(l + nz) << 32)
                             | ((int64_t)l << 38);
            int rank = 0;
            for (int j = 0; j < 4; j++) {
                packed |= (int64_t)(uint8_t)(int8_t)sq[j] << (8 * j);
                int sh = 0;
                if (!is_signed && q[j]) { sh = nz - 1 - rank; rank++; }
                packed |= (int64_t)sh << (44 + 2 * j);
            }
            uint32_t base = codes[i] << (FB_SIMD - l);
            for (uint32_t k = 0; k < (1u << (FB_SIMD - l)); k++)
                sr[base + k] = packed;
        }
    }
    // 64-bit SIMD table entries carry the pair PRE-PACKED as two int16
    // fields with entry-borne signs (books 5/6) already applied, so the
    // vector loop's value path is one xor+psubw negation by the stream
    // signs and the low 32 bits scatter as-is:
    //   [31:0]  x | y<<16 (int16 each, entry signs applied)
    //   [36:32] lentot = len + nz
    //   [37]    escape continuation needed (cb11, either magnitude 16)
    //   [44:38] x stream-sign shift: 63-len when x takes a sign bit, 127
    //           otherwise (srlv of the window top by it yields the bit or 0)
    //   [51:45] y stream-sign shift: 63-(len+nz-1) or 127
    //   [52]    x field is an escape magnitude (|x| == 16)
    //   [53]    y field is an escape magnitude
    //   [63]    set = invalid prefix / code longer than the probe (assist)
    if (idx >= 5) {
        int64_t* sr = g_simd_tbl + ((idx - 5) << FB_SIMD);
        for (int i = 0; i < (1 << FB_SIMD); i++) sr[i] = -1;
        for (int i = 0; i < n; i++) {
            int l = lens[i];
            if (l == 0 || l > FB_SIMD) continue;
            uint16_t v = vals[i];
            int x, y;
            if (idx == 5 || idx == 6) { x = (v >> 4) - 4; y = (v & 15) - 4; }
            else { x = v >> 5; y = v & 31; }
            bool hx = idx >= 7 && x != 0;  // unsigned books: stream signs
            bool hy = idx >= 7 && y != 0;
            int nz = (int)hx + (int)hy;
            bool exf = idx == 11 && x == 16;
            bool eyf = idx == 11 && y == 16;
            int64_t packed =
                (int64_t)(uint16_t)(int16_t)x
                | ((int64_t)(uint16_t)(int16_t)y << 16)
                | ((int64_t)(l + nz) << 32)
                | ((int64_t)(exf || eyf) << 37)
                | ((int64_t)(hx ? 63 - l : 127) << 38)
                | ((int64_t)(hy ? 63 - (l + nz - 1) : 127) << 45)
                | ((int64_t)exf << 52) | ((int64_t)eyf << 53);
            uint32_t base = codes[i] << (FB_SIMD - l);
            for (uint32_t k = 0; k < (1u << (FB_SIMD - l)); k++)
                sr[base + k] = packed;
        }
    }
#endif
}

// Parse + dequantize a sequence of AAC raw_data_blocks (one per frame).
//
// frames are located by offsets[f] / sizes[f] within data (the ADTS/MP4
// demuxer's packet table). Outputs, per frame:
//   coeffs   [max_frames, max_ch, 1024] f32 — post pulse/TNS/joint-stereo,
//            valid only where deq == 1 (host dequantized)
//   qbuf     [max_frames, max_ch, 1024] i16 — quantized values (always
//            written; the working decode buffer)
//   scales   [max_frames, max_ch, 64]  f32 — per-band scales for deq == 0
//            lanes (zero on uncoded bands)
//   deq      [max_frames, max_ch] — 0: device dequantizes qbuf via the
//            shared pow43 table (bit-identical f32 multiply); caller must
//            initialize to 1 (the scalar engine leaves it untouched)
//   seq      [max_frames, max_ch] window_sequence
//   shape    [max_frames, max_ch] window_shape (0/1)
//   prevshape[max_frames, max_ch]
//   nch      [max_frames] channels emitted
//   status   [max_frames] 0 ok / negative error
// Returns number of frames processed (= n_frames).
int32_t sh_aac_extract(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    int32_t rate_idx,
    const int32_t* bands_long, int32_t n_bands_long,
    const int32_t* bands_short, int32_t n_bands_short,
    int32_t max_ch,
    float* coeffs_out, int16_t* qbuf_out, float* scales_out,
    int32_t* deq_out, int32_t* seq_out, int32_t* shape_out,
    int32_t* prevshape_out, int32_t* nch_out, int32_t* status) {
    FrameOut O{coeffs_out, qbuf_out, scales_out, deq_out,
               seq_out, shape_out, prevshape_out, nch_out,
               status, max_ch, rate_idx,
               bands_long, n_bands_long, bands_short, n_bands_short};
    PROF_START(tot);
#ifdef SH_AAC_PROF
    struct ProfTot {
        uint64_t t0;
        ~ProfTot() { g_prof[0] += __rdtsc() - t0; }
    } _pt{_t_tot};
#endif
    if (n_frames >= 4) {
#ifdef SH_AAC_SIMD
        // SYMPHONIA_TPU_AAC_ENGINE=ilp forces the scalar interleaved
        // engine (testing / A-B measurement); both are bit-identical.
        static const bool force_ilp = [] {
            const char* e = getenv("SYMPHONIA_TPU_AAC_ENGINE");
            return e && strcmp(e, "ilp") == 0;
        }();
        if (n_frames >= 8 && !force_ilp)
            extract_simd8(data, data_len, offsets, sizes, n_frames, O);
        else
            extract_ilp(data, data_len, offsets, sizes, n_frames, O);
#else
        extract_ilp(data, data_len, offsets, sizes, n_frames, O);
#endif
        return n_frames;
    }
    std::vector<ChannelPair> pairs;
    pairs.reserve(4);
    for (int32_t f = 0; f < n_frames; f++)
        decode_frame_scalar(data, data_len, offsets[f], sizes[f], f, pairs,
                            O);
    return n_frames;
}

// ---------------------------------------------------------------------------
// Stateful per-packet stream API (the per-packet AudioDecoder fast path).
// The persistent ChannelPair vector carries the PNS LCG, window-shape and
// element-layout state across calls — one frame per call decodes exactly
// like one frame of a batch walk (decode_frame_scalar is the parity-tested
// scalar engine).
// ---------------------------------------------------------------------------

struct AacStream {
    std::vector<ChannelPair> pairs;
    // Per-packet PCM synthesis scratch (sh_aac_stream_decode_pcm).
    Dct4PlanF plan_long, plan_short;  // n = 1024 / 128 (f32: parity bound 4e-6 x peak)
    bool plans_init = false;
    std::vector<float> coeffs, scales;
    std::vector<int16_t> qbuf;
    std::vector<int32_t> deq, seq, shape, prevshape;
};

// Window tables for the PCM synthesis, registered from Python so they are
// byte-identical to the oracle's (aac.py kbd_window/sine_window; the
// reference generates them in window.rs). Index [shape]: 0 sine, 1 KBD.
static float g_aac_win_long[2][1024];
static float g_aac_win_short[2][128];
static bool g_aac_win_set = false;

void sh_aac_set_windows(const float* sine_long, const float* kbd_long,
                        const float* sine_short, const float* kbd_short) {
    memcpy(g_aac_win_long[0], sine_long, sizeof(g_aac_win_long[0]));
    memcpy(g_aac_win_long[1], kbd_long, sizeof(g_aac_win_long[1]));
    memcpy(g_aac_win_short[0], sine_short, sizeof(g_aac_win_short[0]));
    memcpy(g_aac_win_short[1], kbd_short, sizeof(g_aac_win_short[1]));
    g_aac_win_set = true;
}

void* sh_aac_stream_open() { return new AacStream(); }
void sh_aac_stream_close(void* p) { delete (AacStream*)p; }
void sh_aac_stream_reset(void* p) { ((AacStream*)p)->pairs.clear(); }

// Decode ONE raw_data_block; outputs are the single-frame slices of the
// sh_aac_extract layout (coeffs [max_ch,1024], qbuf, scales [max_ch,64],
// deq/seq/shape/prevshape [max_ch], nch/status scalars). deq must be
// pre-set to 1 by the caller, like the batch entry.
int32_t sh_aac_stream_decode(
    void* p, const uint8_t* data, int64_t len,
    int32_t rate_idx,
    const int32_t* bands_long, int32_t n_bands_long,
    const int32_t* bands_short, int32_t n_bands_short,
    int32_t max_ch,
    float* coeffs_out, int16_t* qbuf_out, float* scales_out,
    int32_t* deq_out, int32_t* seq_out, int32_t* shape_out,
    int32_t* prevshape_out, int32_t* nch_out, int32_t* status) {
    FrameOut O{coeffs_out, qbuf_out, scales_out, deq_out,
               seq_out, shape_out, prevshape_out, nch_out,
               status, max_ch, rate_idx,
               bands_long, n_bands_long, bands_short, n_bands_short};
    decode_frame_scalar(data, len, 0, len, 0, ((AacStream*)p)->pairs, O);
    return status[0];
}

// Full per-packet decode: raw_data_block -> PCM (entropy + dequant +
// pulse/TNS/PNS/joint via decode_frame_scalar, then IMDCT + window +
// overlap-add mirroring aac.py AacDsp.synth). ``delay`` is the Python-
// owned OLA state [max_ch, 1024], updated in place ONLY on full success —
// a failed or channel-mismatched frame leaves it valid for the Python
// fallback path (which shares the same buffer). The C++ DCT-IV runs in
// double (shared Dct4Plan) vs pocketfft f32 in the oracle: PCM parity is
// ~1 ulp of the frame's peak, bounded in TestAacNativePcmPath.
int32_t sh_aac_stream_decode_pcm(
    void* p, const uint8_t* data, int64_t len,
    int32_t rate_idx,
    const int32_t* bands_long, int32_t n_bands_long,
    const int32_t* bands_short, int32_t n_bands_short,
    int32_t max_ch,
    float* delay, float* pcm_out, int32_t* shape_out,
    int32_t* nch_out, int32_t* status) {
    AacStream& S = *(AacStream*)p;
    *nch_out = 0;
    if (!g_aac_win_set) { *status = -90; return -90; }
    if (!S.plans_init) {
        S.plan_long.init(1024);
        S.plan_short.init(128);
        S.plans_init = true;
    }
    S.coeffs.resize((size_t)max_ch * 1024);
    S.qbuf.resize((size_t)max_ch * 1024);
    S.scales.resize((size_t)max_ch * 64);
    S.deq.assign(max_ch, 1);
    S.seq.resize(max_ch);
    S.shape.resize(max_ch);
    S.prevshape.resize(max_ch);
    int32_t nch = 0;
    *status = 0;
    FrameOut O{S.coeffs.data(), S.qbuf.data(), S.scales.data(), S.deq.data(),
               S.seq.data(), S.shape.data(), S.prevshape.data(), &nch,
               status, max_ch, rate_idx,
               bands_long, n_bands_long, bands_short, n_bands_short};
    decode_frame_scalar(data, len, 0, len, 0, S.pairs, O);
    *nch_out = nch;
    if (*status != 0) return *status;
    if (nch != max_ch) return 0;  // caller falls back; delay untouched

    constexpr int P0 = 512 - 64, P1 = 512 + 64;
    float pcm[2048];
    float sh[1152];
    for (int ch = 0; ch < max_ch; ch++) {
        const float* cf = S.coeffs.data() + (size_t)ch * 1024;
        float* dl = delay + (size_t)ch * 1024;
        float* dst = pcm_out + (size_t)ch * 1024;
        int sq = S.seq[ch];
        const float* long_win = g_aac_win_long[S.shape[ch] ? 1 : 0];
        const float* short_win = g_aac_win_short[S.shape[ch] ? 1 : 0];
        const float* prev_long = g_aac_win_long[S.prevshape[ch] ? 1 : 0];
        const float* prev_short = g_aac_win_short[S.prevshape[ch] ? 1 : 0];

        if (sq != EIGHT_SHORT) {
            // imdct_dct4(coeffs) * 1/2048: y[:h]=d[h:], y[h:h+n]=-d[rev],
            // y[h+n:]=-d[:h] with n=1024, h=512 (ops/imdct_host).
            S.plan_long.dct4_half(cf);
            const float* d = S.plan_long.d.data();
            const float sc = 1.0f / 2048.0f;
            for (int i = 0; i < 512; i++) pcm[i] = (float)(d[512 + i] * sc);
            for (int i = 0; i < 1024; i++)
                pcm[512 + i] = (float)(-d[1023 - i] * sc);
            for (int i = 0; i < 512; i++)
                pcm[1536 + i] = (float)(-d[i] * sc);
        } else {
            const float sc = 1.0f / 256.0f;
            for (int w = 0; w < 8; w++) {
                S.plan_short.dct4_half(cf + w * 128);
                const float* d = S.plan_short.d.data();
                float* pw = pcm + w * 256;
                for (int i = 0; i < 64; i++) pw[i] = (float)(d[64 + i] * sc);
                for (int i = 0; i < 128; i++)
                    pw[64 + i] = (float)(-d[127 - i] * sc);
                for (int i = 0; i < 64; i++)
                    pw[192 + i] = (float)(-d[i] * sc);
            }
            memset(sh, 0, sizeof(sh));
            for (int w = 0; w < 8; w++) {
                const float* src = pcm + w * 256;
                float* s0 = sh + w * 128;
                if (w == 0) {
                    for (int i = 0; i < 128; i++) s0[i] = src[i] * prev_short[i];
                    for (int i = 0; i < 128; i++)
                        s0[128 + i] = src[128 + i] * short_win[127 - i];
                } else {
                    for (int i = 0; i < 128; i++) s0[i] += src[i] * short_win[i];
                    for (int i = 0; i < 128; i++)
                        s0[128 + i] += src[128 + i] * short_win[127 - i];
                }
            }
        }

        if (sq == ONLY_LONG || sq == LONG_START) {
            for (int i = 0; i < 1024; i++) dst[i] = dl[i] + pcm[i] * prev_long[i];
        } else if (sq == EIGHT_SHORT) {
            for (int i = 0; i < P0; i++) dst[i] = dl[i];
            for (int i = P0; i < 1024; i++) dst[i] = dl[i] + sh[i - P0];
        } else {  // LONG_STOP
            for (int i = 0; i < P0; i++) dst[i] = dl[i];
            for (int i = P0; i < P1; i++)
                dst[i] = dl[i] + pcm[i] * prev_short[i - P0];
            for (int i = P1; i < 1024; i++) dst[i] = dl[i] + pcm[i];
        }

        if (sq == ONLY_LONG || sq == LONG_STOP) {
            for (int i = 0; i < 1024; i++)
                dl[i] = pcm[1024 + i] * long_win[1023 - i];
        } else if (sq == EIGHT_SHORT) {
            for (int i = 0; i < P1; i++) dl[i] = sh[P1 + i];
            memset(dl + P1, 0, (1024 - P1) * sizeof(float));
        } else {  // LONG_START
            for (int i = 0; i < P0; i++) dl[i] = pcm[1024 + i];
            for (int i = 0; i < P1 - P0; i++)
                dl[P0 + i] = pcm[1024 + P0 + i] * short_win[127 - i];
            memset(dl + P1, 0, (1024 - P1) * sizeof(float));
        }
        shape_out[ch] = S.shape[ch];
    }
    return 0;
}

}  // extern "C"
