// ADPCM inner recurrences (IMA + MS).
//
// Native mirrors of the two per-sample loops in
// symphonia_tpu/codecs/adpcm.py (the analogs of symphonia-codec-adpcm
// common_ima.rs / codec_ms.rs). Only the pure-computation loops live here —
// block parsing, validation, and every error path stay in Python, so the
// native fast path cannot diverge from the oracle's failure behavior.
// Both recurrences are state-serial within a block (the step index /
// delta adaptation), which is why they are scalar host code.

#include <cstdint>

namespace {

const int32_t kImaStep[89] = {
    7,     8,     9,     10,    11,    12,    13,    14,    16,    17,
    19,    21,    23,    25,    28,    31,    34,    37,    41,    45,
    50,    55,    60,    66,    73,    80,    88,    97,    107,   118,
    130,   143,   157,   173,   190,   209,   230,   253,   279,   307,
    337,   371,   408,   449,   494,   544,   598,   658,   724,   796,
    876,   963,   1060,  1166,  1282,  1411,  1552,  1707,  1878,  2066,
    2272,  2499,  2749,  3024,  3327,  3660,  4026,  4428,  4871,  5358,
    5894,  6484,  7132,  7845,  8630,  9493,  10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767};

const int32_t kImaIndex[8] = {-1, -1, -1, -1, 2, 4, 6, 8};

const int32_t kMsAdapt[16] = {230, 230, 230, 230, 307, 409, 512, 614,
                              768, 614, 512, 409, 307, 230, 230, 230};

inline int32_t clamp16(int64_t v) {
    return v < -32768 ? -32768 : (v > 32767 ? 32767 : (int32_t)v);
}

}  // namespace

extern "C" {

// IMA recurrence (adpcm.py ima_decode_nibbles): n nibble values ->
// n int16-range samples. idx must be pre-clamped to [0, 88] (the Python
// caller validates headers).
void sh_ima_decode_nibbles(const uint8_t* nibbles, int64_t n, int32_t pred,
                           int32_t idx, int32_t* out) {
    for (int64_t i = 0; i < n; i++) {
        int nib = nibbles[i] & 0xF;
        int32_t step = kImaStep[idx];
        int32_t diff = step >> 3;
        if (nib & 1) diff += step >> 2;
        if (nib & 2) diff += step >> 1;
        if (nib & 4) diff += step;
        pred = clamp16((int64_t)pred + ((nib & 8) ? -diff : diff));
        idx += kImaIndex[nib & 7];
        idx = idx < 0 ? 0 : (idx > 88 ? 88 : idx);
        out[i] = pred;
    }
}

// MS ADPCM recurrence (adpcm.py decode_ms_block inner loop): nibbles
// alternate across channels sample-by-sample; out is [n_ch, frames] and
// writes start at column 2 (columns 0/1 hold the header samples s2/s1).
// Floor divisions mirror Python's // via arithmetic shifts.
void sh_ms_decode_nibbles(const uint8_t* nibbles, int64_t n, int32_t n_ch,
                          const int32_t* c1, const int32_t* c2,
                          int64_t* delta, int64_t* s1, int64_t* s2,
                          int32_t* out, int64_t frames) {
    for (int64_t i = 0; i < n; i++) {
        int32_t c = (int32_t)(i % n_ch);
        int nib = nibbles[i] & 0xF;
        int64_t signed_ = (nib & 8) ? nib - 16 : nib;
        int64_t pred64 = ((s1[c] * c1[c] + s2[c] * c2[c]) >> 8) +
                         signed_ * delta[c];
        int32_t pred = clamp16(pred64);
        out[c * frames + 2 + i / n_ch] = pred;
        s2[c] = s1[c];
        s1[c] = pred;
        // Wrap the adaptation product at 32 bits (mirrors codec_ms.rs:96
        // i32 release semantics and the Python oracle).
        int64_t d = (int64_t)(int32_t)(uint32_t)(kMsAdapt[nib] *
                                                 (int64_t)delta[c]) >> 8;
        delta[c] = d < 16 ? 16 : d;
    }
}

}  // extern "C"
