// MPEG-1/2 Layer I / Layer II bitstream stage.
//
// Native mirror of symphonia_tpu/codecs/mpa_layer12.py decode_layer1 /
// decode_layer2 (the analogs of symphonia-bundle-mp3 layer1/mod.rs:62 and
// layer2/mod.rs:219) up to the subband sample matrix: bit allocation,
// scalefactors (L2 scfsi sharing + grouped quantization classes, ISO
// 11172-3 Tables 3-B.2/3-B.4), linear dequantization, intensity-stereo
// bound. The 32-band polyphase synthesis stays in numpy (already
// vectorized). Float semantics mirror the Python oracle exactly: f64
// intermediates, f32 stores, and the Layer 1 factor table rounded to f32
// before widening. Any bit-reader error or invalid allocation returns a
// negative status and the caller falls back to the Python path, so
// malformed-input behavior (exception types included) is identical.

#include <cstdint>
#include <cstring>

#include "entropy_common.h"

namespace {

// Layer 2 quantization classes (Table 3-B.4): c, d, grouping, bits, nlevels.
struct QuantClass {
    double c, d;
    int grouping, bits, nlevels;
};
const QuantClass kQuant[17] = {
    {4.0 / 3, 0.5, 1, 5, 3},
    {8.0 / 5, 0.5, 1, 7, 5},
    {8.0 / 7, 0.25, 0, 3, 7},
    {16.0 / 9, 0.5, 1, 10, 9},
    {16.0 / 15, 0.125, 0, 4, 15},
    {32.0 / 31, 0.0625, 0, 5, 31},
    {64.0 / 63, 0.03125, 0, 6, 63},
    {128.0 / 127, 0.015625, 0, 7, 127},
    {256.0 / 255, 0.0078125, 0, 8, 255},
    {512.0 / 511, 0.00390625, 0, 9, 511},
    {1024.0 / 1023, 0.001953125, 0, 10, 1023},
    {2048.0 / 2047, 0.0009765625, 0, 11, 2047},
    {4096.0 / 4095, 0.00048828125, 0, 12, 4095},
    {8192.0 / 8191, 0.000244140625, 0, 13, 8191},
    {16384.0 / 16383, 0.0001220703125, 0, 14, 16383},
    {32768.0 / 32767, 0.00006103515625, 0, 15, 32767},
    {65536.0 / 65535, 0.000030517578125, 0, 16, 65535},
};

// Sub-band quantization info (Tables 3-B.2a-d): nbal + class-index rows.
const int kNbal[8] = {2, 2, 3, 3, 4, 4, 4, 4};
const int kClasses[8][16] = {
    {0, 0, 1, 16},
    {0, 0, 1, 3},
    {0, 0, 1, 3, 4, 5, 6, 7},
    {0, 0, 1, 2, 3, 4, 5, 16},
    {0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14},
    {0, 0, 1, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 16},
    {0, 0, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16},
};

inline int32_t sign_extend_inv(uint32_t v, int bits) {
    // Python _sign_extend: invert MSB then sign-extend.
    v ^= 1u << (bits - 1);
    if (v & (1u << (bits - 1))) return (int32_t)v - (1 << bits);
    return (int32_t)v;
}

// Grouped-codeword decode LUTs (classes 0/1/3: 3/5/9 levels packed base-n
// into 5/7/10 bits). The runtime div/mod pair per triplet was ~40% of the
// Layer II extract; the level values are also precomputed (identical
// double expression, so output is bit-exact).
uint8_t g_lut3[32][3], g_lut5[128][3], g_lut9[1024][3];
double g_val3[3], g_val5[5], g_val9[9];
// 1 / 2^(bits_eff-1) for the ungrouped path (exact powers of two: the
// multiply is IEEE-identical to the former division).
double g_inv_pow2[17];
bool g_lut_init = false;

void init_grouped_lut() {
    struct {
        uint8_t (*lut)[3];
        int lut_len;
        double* val;
        int nlevels, bits_eff;
        const QuantClass* q;
    } specs[3] = {
        {g_lut3, 32, g_val3, 3, 2, &kQuant[0]},
        {g_lut5, 128, g_val5, 5, 3, &kQuant[1]},
        {g_lut9, 1024, g_val9, 9, 4, &kQuant[3]},
    };
    for (auto& s : specs) {
        for (int cw = 0; cw < s.lut_len; cw++) {
            int c = cw;
            for (int i = 0; i < 3; i++) {
                int lv = c % s.nlevels;
                c /= s.nlevels;
                s.lut[cw][i] = (uint8_t)(lv < s.nlevels ? lv : 0);
            }
        }
        double div = (double)(1 << (s.bits_eff - 1));
        for (int lv = 0; lv < s.nlevels; lv++)
            s.val[lv] =
                s.q->c * (sign_extend_inv(lv, s.bits_eff) / div + s.q->d);
    }
    for (int b = 1; b <= 16; b++)
        g_inv_pow2[b] = 1.0 / (double)(1 << (b - 1));
    g_lut_init = true;
}

}  // namespace

// Shared 32-band polyphase from mp3_dense.cpp (tables registered there
// via sh_mp3_set_dense; returns nonzero while unset).
extern "C" int32_t sh_mp3_polyphase(const float* S, int32_t T, float* resp);

extern "C" {

// Layer I (mpa_layer12.py decode_layer1). data starts after header/CRC.
// samples is [2][384] f32, pre-zeroed by the caller. Returns 0 ok,
// -1 bit error, -2 invalid allocation.
int32_t sh_mpa_l1_extract(const uint8_t* data, int64_t data_len,
                          int32_t n_ch, int32_t bound,
                          const double* sf_table, float* samples) {
    Bits br(data, data_len);
    float factor[16] = {0};
    for (int i = 2; i < 16; i++) {
        double a = (double)(1 << i);
        double b = (double)(1 << (i - 1));
        factor[i] = (float)((a / (a - 1.0)) / b);
    }
    int alloc[2][32] = {{0}};
    for (int sb = 0; sb < bound; sb++)
        for (int ch = 0; ch < n_ch; ch++) {
            uint32_t bits = br.read(4);
            if (bits > 0xE) return br.error ? -1 : -2;
            alloc[ch][sb] = bits ? (int)bits + 1 : 0;
        }
    for (int sb = bound; sb < 32; sb++) {
        uint32_t bits = br.read(4);
        if (bits > 0xE) return br.error ? -1 : -2;
        alloc[0][sb] = alloc[1][sb] = bits ? (int)bits + 1 : 0;
    }
    float scf[2][32] = {{0}};
    for (int sb = 0; sb < 32; sb++)
        for (int ch = 0; ch < n_ch; ch++)
            if (alloc[ch][sb]) scf[ch][sb] = (float)sf_table[br.read(6)];
    if (br.error) return -1;
    for (int s = 0; s < 12; s++) {
        for (int sb = 0; sb < bound; sb++)
            for (int ch = 0; ch < n_ch; ch++) {
                int bits = alloc[ch][sb];
                if (!bits) continue;
                uint32_t raw = br.read(bits);
                double v = (double)factor[bits] *
                           (sign_extend_inv(raw, bits) + 1);
                // The oracle's np.float32 * python-float stays float32
                // (NEP 50 weak-scalar promotion): multiply in f32.
                samples[ch * 384 + 12 * sb + s] = scf[ch][sb] * (float)v;
            }
        for (int sb = bound; sb < 32; sb++) {
            int bits = alloc[0][sb];
            if (!bits) continue;
            uint32_t raw = br.read(bits);
            double v =
                (double)factor[bits] * (sign_extend_inv(raw, bits) + 1);
            for (int ch = 0; ch < n_ch; ch++)
                samples[ch * 384 + 12 * sb + s] = scf[ch][sb] * (float)v;
        }
    }
    return br.error ? -1 : 0;
}

// Layer II (mpa_layer12.py decode_layer2). band_rows is the per-subband
// row into the 3-B.2 tables; samples is [2][1152] f32, pre-zeroed.
int32_t sh_mpa_l2_extract(const uint8_t* data, int64_t data_len,
                          int32_t n_ch, int32_t bound, int32_t sblimit,
                          const int32_t* band_rows, const double* sf_table,
                          float* samples) {
    Bits br(data, data_len);
    int alloc[2][32] = {{0}};
    for (int sb = 0; sb < bound; sb++) {
        int nbal = kNbal[band_rows[sb]];
        for (int ch = 0; ch < n_ch; ch++)
            alloc[ch][sb] = (int)br.read(nbal);
    }
    for (int sb = bound; sb < sblimit; sb++) {
        int nbal = kNbal[band_rows[sb]];
        int v = (int)br.read(nbal);
        alloc[0][sb] = alloc[1][sb] = v;
    }
    int scfsi[2][32] = {{0}};
    for (int sb = 0; sb < sblimit; sb++)
        for (int ch = 0; ch < n_ch; ch++)
            if (alloc[ch][sb]) scfsi[ch][sb] = (int)br.read(2);
    int scalefacs[2][3][32] = {{{0}}};
    for (int sb = 0; sb < sblimit; sb++)
        for (int ch = 0; ch < n_ch; ch++) {
            if (!alloc[ch][sb]) continue;
            int i0 = (int)br.read(6), i1 = i0, i2 = i0;
            switch (scfsi[ch][sb]) {
                case 0:
                    i1 = (int)br.read(6);
                    i2 = (int)br.read(6);
                    break;
                case 1:
                    i2 = (int)br.read(6);
                    break;
                case 3:
                    i1 = (int)br.read(6);
                    i2 = i1;
                    break;
            }
            scalefacs[ch][0][sb] = i0;
            scalefacs[ch][1][sb] = i1;
            scalefacs[ch][2][sb] = i2;
        }
    if (br.error) return -1;

    if (!g_lut_init) init_grouped_lut();
    auto dequant_triplet = [&](int class_idx, int row, double* out) {
        const QuantClass& q = kQuant[kClasses[row][class_idx]];
        if (q.grouping) {
            uint32_t cw = br.read(q.bits);
            const uint8_t* r;
            const double* val;
            if (q.nlevels == 3) {
                r = g_lut3[cw];
                val = g_val3;
            } else if (q.nlevels == 5) {
                r = g_lut5[cw];
                val = g_val5;
            } else {
                r = g_lut9[cw];
                val = g_val9;
            }
            out[0] = val[r[0]];
            out[1] = val[r[1]];
            out[2] = val[r[2]];
        } else {
            const double inv = g_inv_pow2[q.bits];
            for (int i = 0; i < 3; i++) {
                int raw = (int)br.read(q.bits);
                out[i] = q.c * (sign_extend_inv(raw, q.bits) * inv + q.d);
            }
        }
    };

    for (int gr = 0; gr < 12; gr++) {
        for (int sb = 0; sb < bound; sb++) {
            int row = band_rows[sb];
            for (int ch = 0; ch < n_ch; ch++) {
                int ci = alloc[ch][sb];
                if (!ci) continue;
                double t[3];
                dequant_triplet(ci, row, t);
                double sf = sf_table[scalefacs[ch][gr / 4][sb]];
                float* dst = samples + ch * 1152 + 36 * sb + 3 * gr;
                dst[0] = (float)(sf * t[0]);
                dst[1] = (float)(sf * t[1]);
                dst[2] = (float)(sf * t[2]);
            }
        }
        for (int sb = bound; sb < sblimit; sb++) {
            int row = band_rows[sb];
            int ci = alloc[0][sb];
            if (!ci) continue;
            double t[3];
            dequant_triplet(ci, row, t);
            for (int ch = 0; ch < n_ch; ch++) {
                double sf = sf_table[scalefacs[ch][gr / 4][sb]];
                float* dst = samples + ch * 1152 + 36 * sb + 3 * gr;
                dst[0] = (float)(sf * t[0]);
                dst[1] = (float)(sf * t[1]);
                dst[2] = (float)(sf * t[2]);
            }
        }
    }
    return br.error ? -1 : 0;
}

// Fused per-packet Layer I/II decode (VERDICT r3 #1): one call does the
// bitstream stage + 32-band polyphase + carried 480-sample synthesis tail,
// mirroring codecs/mpa_layer12.py decode_layer1/2 + _synthesize exactly
// (analog of symphonia-bundle-mp3 layer2/mod.rs:219 + synthesis.rs:158).
// synth_tail is the Python-owned [2][480] f32 state (updated in place ONLY
// on success, so any negative status lets the caller fall back to the
// Python path with state continuity intact); pcm is [2][1152] f32.
// Returns samples-per-channel (384 or 1152), or a negative status:
// -1 bit error, -2 invalid allocation, -3 dense tables unregistered.
int32_t sh_l12_stream_decode(int32_t layer, const uint8_t* data,
                             int64_t data_len, int32_t n_ch, int32_t bound,
                             int32_t sblimit, const int32_t* band_rows,
                             const double* sf_table, float* synth_tail,
                             float* pcm) {
    const int T = layer == 1 ? 12 : 36;
    const int out_len = 32 * T;
    float samples[2 * 1152];
    std::memset(samples, 0, sizeof(float) * 2 * out_len);
    int rc = layer == 1
                 ? sh_mpa_l1_extract(data, data_len, n_ch, bound, sf_table,
                                     samples)
                 : sh_mpa_l2_extract(data, data_len, n_ch, bound, sblimit,
                                     band_rows, sf_table, samples);
    if (rc < 0) return rc;
    float S[36][32];
    float resp[(36 + 15) * 32];
    float newt[480];
    for (int ch = 0; ch < n_ch; ch++) {
        // Extract layout is subband-major [32][T] per channel; the
        // polyphase consumes time-major [T][32].
        const float* src = samples + ch * out_len;
        for (int sb = 0; sb < 32; sb++)
            for (int t = 0; t < T; t++) S[t][sb] = src[sb * T + t];
        if (sh_mp3_polyphase(&S[0][0], T, resp) != 0) return -3;
        float* tail = synth_tail + ch * 480;
        float* out = pcm + ch * 1152;
        const int k = out_len < 480 ? out_len : 480;
        for (int i = 0; i < k; i++) out[i] = resp[i] + tail[i];
        for (int i = k; i < out_len; i++) out[i] = resp[i];
        std::memcpy(newt, resp + out_len, 480 * sizeof(float));
        if (out_len < 480) {
            // Layer I frames (384) are shorter than the tail: superpose
            // the unconsumed remainder (_synthesize's carry fix).
            for (int j = 0; j < 480 - out_len; j++)
                newt[j] += tail[out_len + j];
        }
        std::memcpy(tail, newt, 480 * sizeof(float));
    }
    return out_len;
}

}  // extern "C"
