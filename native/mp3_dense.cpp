// MP3 per-granule dense stage for the per-packet decoder fast path.
//
// Mirrors ops/mp3_dense.py's numpy oracle (granule_dense_np): antialias
// butterflies, hybrid IMDCT-as-matmul, frequency inversion, and the 32-band
// polyphase (matrixing + windowed FIR) with carried hybrid/synthesis tails.
// Analog of symphonia-bundle-mp3 layer3/hybrid_synthesis.rs:218-824 +
// synthesis.rs:158-348, restructured as the same linear operators the
// device pipeline uses. Tables are registered once from Python
// (sh_mp3_set_dense) so the numeric source of truth stays in
// ops/mp3_dense.py; float arithmetic is f32 like the oracle (parity is
// asserted at 1e-6-level tolerance, not bit-exactness, because BLAS
// summation order differs).

#include <cstdint>
#include <cstring>

namespace {

typedef float v16sf __attribute__((vector_size(64)));

float g_T[4][36][18];     // hybrid matrices per block type
float g_Tt[4][18][36];    // ... transposed (broadcast-FMA layout)
float g_N[64][32];        // polyphase matrixing
float g_Nt[32][64];       // ... transposed
float g_W[16][32];        // synthesis window (reshaped D)
int32_t g_qidx[16][32];   // v[64] tap selection
float g_cs[8], g_ca[8];   // antialias butterflies
bool g_set = false;

constexpr int BLOCK_LONG = 0;
constexpr int BLOCK_SHORT = 2;

// [T,32] subband samples -> [(T+15)*32] response (polyphase_response_np).
void polyphase_resp(const float* S, int T, float* resp) {
    // V[t][q] = sum_sb S[t][sb] * N[q][sb], accumulated broadcast-FMA
    // style (per-q accumulators; no float reduction, so the q loop
    // vectorizes without -ffast-math). Four t-rows share each g_Nt load
    // with their 4x64 accumulator tile in registers (16 zmm): the
    // one-row form streamed V through memory every subband and measured
    // 2.5x slower (10.1 -> 4 us at T=36).
    float V[48][64];
    int t = 0;
    for (; t + 4 <= T; t += 4) {
        const float* s0 = S + t * 32;
        const float* s1 = s0 + 32;
        const float* s2 = s1 + 32;
        const float* s3 = s2 + 32;
        float a0[64] = {0.f}, a1[64] = {0.f}, a2[64] = {0.f},
              a3[64] = {0.f};
        for (int sb = 0; sb < 32; sb++) {
            const float x0 = s0[sb], x1 = s1[sb], x2 = s2[sb], x3 = s3[sb];
            const float* __restrict n = g_Nt[sb];
            for (int q = 0; q < 64; q++) {
                const float nq = n[q];
                a0[q] += nq * x0;
                a1[q] += nq * x1;
                a2[q] += nq * x2;
                a3[q] += nq * x3;
            }
        }
        std::memcpy(V[t], a0, sizeof(a0));
        std::memcpy(V[t + 1], a1, sizeof(a1));
        std::memcpy(V[t + 2], a2, sizeof(a2));
        std::memcpy(V[t + 3], a3, sizeof(a3));
    }
    for (; t < T; t++) {
        const float* s = S + t * 32;
        float acc[64] = {0.f};
        for (int sb = 0; sb < 32; sb++) {
            const float x = s[sb];
            const float* __restrict n = g_Nt[sb];
            for (int q = 0; q < 64; q++) acc[q] += n[q] * x;
        }
        std::memcpy(V[t], acc, sizeof(acc));
    }
    for (int m = 0; m < T + 15; m++) {
        float* o = resp + m * 32;
        int k0 = m - T + 1 > 0 ? m - T + 1 : 0;
        int k1 = m + 1 < 16 ? m + 1 : 16;
        // qidx[k][i] = i + 32*(k&1): even taps read V's lower half, odd
        // taps the upper. Forced 16-wide vectors: gcc's auto-vectorizer
        // scalarized this loop (the k-parity pointer select defeated its
        // cost model) and the FIR was 10.3 of the 12.5 us polyphase.
        // Element order per lane is unchanged, so output is bit-identical.
        v16sf acc0 = {0.f}, acc1 = {0.f};
        for (int k = k0; k < k1; k++) {
            const float* v = V[m - k] + ((k & 1) << 5);
            const float* w = g_W[k];
            v16sf vv0, vv1, wv0, wv1;
            std::memcpy(&vv0, v, 64);
            std::memcpy(&vv1, v + 16, 64);
            std::memcpy(&wv0, w, 64);
            std::memcpy(&wv1, w + 16, 64);
            acc0 += wv0 * vv0;
            acc1 += wv1 * vv1;
        }
        std::memcpy(o, &acc0, 64);
        std::memcpy(o + 16, &acc1, 64);
    }
}

}  // namespace

extern "C" {

void sh_mp3_set_dense(const float* T4, const float* N, const float* W,
                      const int32_t* qidx, const float* cs, const float* ca) {
    std::memcpy(g_T, T4, sizeof(g_T));
    std::memcpy(g_N, N, sizeof(g_N));
    for (int bt = 0; bt < 4; bt++)
        for (int i = 0; i < 36; i++)
            for (int k = 0; k < 18; k++) g_Tt[bt][k][i] = g_T[bt][i][k];
    for (int q = 0; q < 64; q++)
        for (int sb = 0; sb < 32; sb++) g_Nt[sb][q] = g_N[q][sb];
    std::memcpy(g_W, W, sizeof(g_W));
    std::memcpy(g_qidx, qidx, sizeof(g_qidx));
    std::memcpy(g_cs, cs, sizeof(g_cs));
    std::memcpy(g_ca, ca, sizeof(g_ca));
    g_set = true;
}

int32_t sh_mp3_dense_ready() { return g_set ? 1 : 0; }

// One granule-channel: x[576] (reordered, stereo-decoded) -> out[576] PCM,
// updating hybrid_tail[32*18] and synth_tail[480] in place.
int32_t sh_mp3_dense_granule(const float* x, int32_t bt, int32_t mixed,
                             float* hybrid_tail, float* synth_tail,
                             float* out) {
    if (!g_set || bt < 0 || bt > 3) return -1;
    // Antialias (independent boundary butterflies).
    float xb[32][18];
    std::memcpy(xb, x, sizeof(xb));
    int n_bounds = (bt == BLOCK_SHORT && !mixed) ? 0
                   : (bt == BLOCK_SHORT ? 1 : 31);
    for (int b = 1; b <= n_bounds; b++) {
        for (int j = 0; j < 8; j++) {
            float lo = xb[b - 1][17 - j];
            float hi = xb[b][j];
            xb[b - 1][17 - j] = lo * g_cs[j] - hi * g_ca[j];
            xb[b][j] = hi * g_cs[j] + lo * g_ca[j];
        }
    }
    // Hybrid synthesis + OLA + frequency inversion -> S[t][sb] (transposed
    // into the layout polyphase_resp consumes).
    float S[18][32];
    for (int sb = 0; sb < 32; sb++) {
        int use_bt = (bt == BLOCK_SHORT && mixed && sb < 2) ? BLOCK_LONG : bt;
        const float (*Tt)[36] = g_Tt[use_bt];
        const float* xs = xb[sb];
        float tmp[36] = {0.f};
        for (int k = 0; k < 18; k++) {
            const float x = xs[k];
            const float* col = Tt[k];
            for (int i = 0; i < 36; i++) tmp[i] += col[i] * x;
        }
        float* ht = hybrid_tail + sb * 18;
        for (int t = 0; t < 18; t++) {
            float v = tmp[t] + ht[t];
            if ((sb & 1) && (t & 1)) v = -v;
            S[t][sb] = v;
        }
        for (int t = 0; t < 18; t++) ht[t] = tmp[18 + t];
    }
    float resp[(18 + 15) * 32];
    polyphase_resp(&S[0][0], 18, resp);
    for (int i = 0; i < 480; i++) out[i] = resp[i] + synth_tail[i];
    for (int i = 480; i < 576; i++) out[i] = resp[i];
    std::memcpy(synth_tail, resp + 576, 480 * sizeof(float));
    return 0;
}

// Generic Layer I/II entry: S[T][32] subband samples (already dequantized,
// time-major) -> resp[(T+15)*32]; caller handles the carried tail
// superposition (codecs/mpa_layer12.py).
int32_t sh_mp3_polyphase(const float* S, int32_t T, float* resp) {
    if (!g_set || T < 1 || T > 48) return -1;
    polyphase_resp(S, T, resp);
    return 0;
}

}  // extern "C"
