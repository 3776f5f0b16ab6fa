// ALAC (Apple Lossless) host decoder.
//
// Native mirror of symphonia_tpu/codecs/alac.py (itself the analog of
// symphonia-codec-alac lib.rs:268-657): SCE/CPE element loop, adaptive
// Rice residuals with zero-run signalling, the adaptive FIR predictor
// with sign-driven coefficient updates, mid-side decorrelation, shifted
// tail bits, and uncompressed frames. Bit-exact: all arithmetic wraps at
// 32 bits like the reference; the Python decoder remains the oracle and
// the fallback (the wrapper re-runs any errored packet through Python so
// malformed-input behavior — exception types included — is identical).
//
// ALAC's predictor is sample-sequential with data-dependent coefficient
// updates (the hardest shape to vectorize, SURVEY.md §2.2) — so unlike
// FLAC/MP3/AAC this stage stays scalar; moving the per-sample loops from
// Python to C++ is what restores reference-parity throughput.

#include <cstdint>
#include <cstring>
#include <new>

#include "entropy_common.h"

namespace {

inline int32_t wrap32(int64_t x) { return (int32_t)(uint32_t)x; }

inline int32_t clip_msbs(int64_t val, int num) {
    return wrap32((uint64_t)val << num) >> num;
}

inline int leading_zeros32(uint32_t v) {
    return v ? __builtin_clz(v) : 32;
}

inline int lg3a(uint32_t val) { return 31 - leading_zeros32((val >> 9) + 3); }

// ALAC's modified Rice read (alac.py read_rice_code / lib.rs:612-657).
inline uint32_t read_rice_code(Bits& br, int k, int bps) {
    int prefix = 0;
    while (prefix <= 8) {
        if (br.read(1) == 0) break;
        prefix++;
    }
    if (prefix > 8) return br.read(bps);
    if (k > 1) {
        uint32_t value = ((uint32_t)prefix << k) - prefix;
        uint32_t suffix = br.read(k - 1);
        if (suffix > 0) return value + (suffix << 1) + br.read(1) - 1;
        return value;
    }
    if (k == 1) return (uint32_t)prefix;
    return 0;
}

// Fast path: one refill bounds the worst case (9 prefix bits + a 32-bit
// escape value = 41), then the prefix comes from one clz over the
// left-aligned window instead of up to nine per-bit reads each paying a
// refill check. Bit-exact with read_rice_code; falls back to it near the
// end of the stream (where padding-zero semantics matter).
inline uint32_t read_rice_fast(Bits& br, int k, int bps) {
    if (br.cnt < 41) {
        br.fill();
        if (br.cnt < 41) return read_rice_code(br, k, bps);
    }
    uint64_t w = br.buf << (64 - br.cnt);
    int ones = __builtin_clzll(~w | 1);
    uint32_t ret;
    int used;
    if (ones > 8) {
        ret = bps ? (uint32_t)((w << 9) >> (64 - bps)) : 0;
        used = 9 + bps;
    } else if (k > 1) {
        used = ones + 1;
        uint32_t value = ((uint32_t)ones << k) - ones;
        uint32_t suffix = (uint32_t)((w << used) >> (64 - (k - 1)));
        if (suffix > 0) {
            uint32_t extra = (uint32_t)((w << (used + k - 1)) >> 63);
            ret = value + (suffix << 1) + extra - 1;
            used += k;
        } else {
            ret = value;
            used += k - 1;
        }
    } else {
        ret = k == 1 ? (uint32_t)ones : 0;
        used = ones + 1;
    }
    br.cnt -= used;
    br.buf &= (1ULL << br.cnt) - 1;
    return ret;
}

inline int32_t rice_to_signed(uint32_t val) {
    return (int32_t)((val >> 1) ^ (uint32_t)(-(int32_t)(val & 1)));
}

inline int32_t read_signed(Bits& br, int n) {
    uint32_t v = br.read(n);
    return (int32_t)(v << (32 - n)) >> (32 - n);
}

struct ElemChan {
    int bps, kb;
    uint32_t mb0;
    int mode, shift;
    uint32_t pb_factor;
    int lpc_order;
    int32_t coeffs[32];
    bool bad = false;

    ElemChan(Bits& br, int cfg_pb, int cfg_mb, int cfg_kb, int bps_)
        : bps(bps_), kb(cfg_kb), mb0((uint32_t)cfg_mb) {
        mode = (int)br.read(4);
        shift = (int)br.read(4);
        pb_factor = (br.read(3) * (uint32_t)cfg_pb) >> 2;
        lpc_order = (int)br.read(5);
        for (int i = 0; i < lpc_order; i++) coeffs[i] = read_signed(br, 16);
        if (0 < mode && mode < 15) bad = true;
    }

    void read_residuals(Bits& br, int32_t* out, int n) {
        uint32_t mb = mb0;
        uint32_t sign_toggle = 0;
        int zero_run_end = 0;
        for (int i = 0; i < n; i++) {
            if (i < zero_run_end) { out[i] = 0; continue; }
            int k = lg3a(mb);
            uint32_t val =
                read_rice_fast(br, k < kb ? k : kb, bps) + sign_toggle;
            out[i] = rice_to_signed(val);
            if (val > 0xFFFF)
                mb = 0xFFFF;
            else
                mb = (uint32_t)(mb + pb_factor * (uint64_t)val -
                                (((uint64_t)pb_factor * mb) >> 9));
            sign_toggle = 0;
            if (mb < 128 && i + 1 < n) {
                int zk = leading_zeros32(mb) - 24 + (int)((mb + 16) >> 6);
                uint32_t zeros =
                    read_rice_fast(br, zk < kb ? zk : kb, 16);
                if (zeros < 0xFFFF) sign_toggle = 1;
                mb = 0;
                int64_t zre = (int64_t)i + 1 + zeros;
                zero_run_end = zre > n ? n : (int)zre;
            }
        }
    }

    // The adaptive-predictor main loop, with the order as a compile-time
    // constant where it matters: the per-sample coefficient updates force
    // coeffs through memory in the generic form, while a fixed ORDER lets
    // the compiler keep them in registers and fully unroll the dot +
    // update loops (~2x on order-4/8 content; arithmetic is identical).
    template <int ORDER>
    void predict_main(int32_t* o, int n, int order_rt) {
        const int order = ORDER > 0 ? ORDER : order_rt;
        const int clip = 32 - bps;
        const int shift_ = shift;
        const int32_t round_add = (1 << shift_) >> 1;
        int32_t c[ORDER > 0 ? ORDER : 32];
        for (int j = 0; j < order; j++) c[j] = coeffs[j];
        if (1 + order >= n) return;
        // Sliding sample history h[0..order] = o[i-order-1 .. i-1]: with a
        // fixed ORDER the compiler keeps it in registers, removing the
        // order+1 reloads per sample the pointer walk paid.
        int32_t h[(ORDER > 0 ? ORDER : 32) + 1];
        for (int j = 0; j <= order; j++) h[j] = o[j];
        for (int i = 1 + order; i < n; i++) {
            int64_t res = o[i];
            const int32_t past0 = h[0];
            // Identical to the chained wrap32 form: addition mod 2^32 is
            // associative, so unsigned accumulation frees the compiler to
            // run the tap multiplies in parallel off the o[i-1] chain.
            uint32_t accu = 0;
            for (int j = 0; j < order; j++)
                accu += (uint32_t)c[order - 1 - j] *
                        ((uint32_t)h[1 + j] - (uint32_t)past0);
            int32_t val = wrap32((int64_t)(int32_t)accu + round_add) >>
                          shift_;
            int32_t cur = clip_msbs(
                (int64_t)wrap32((int64_t)res + past0 + val), clip);
            o[i] = cur;
            if (res != 0) {
                if (res > 0) {
                    for (int j = 0; j < order; j++) {
                        int32_t d = past0 - h[1 + j];
                        int sign = (d > 0) - (d < 0);
                        c[order - 1 - j] -= sign;
                        res -= (1 + j) * (((int64_t)sign * d) >> shift_);
                        if (res <= 0) break;
                    }
                } else {
                    for (int j = 0; j < order; j++) {
                        int32_t d = past0 - h[1 + j];
                        int sign = (d > 0) - (d < 0);
                        c[order - 1 - j] += sign;
                        res -= (1 + j) * (((int64_t)-sign * d) >> shift_);
                        if (res >= 0) break;
                    }
                }
            }
            for (int j = 0; j < order; j++) h[j] = h[j + 1];
            h[order] = cur;
        }
    }

    void predict(int32_t* o, int n) {
        if (lpc_order == 0 || n == 0) return;
        int clip = 32 - bps;
        if (lpc_order == 31 || mode == 15)
            for (int i = 1; i < n; i++)
                o[i] = clip_msbs((int64_t)o[i] + o[i - 1], clip);
        int order = lpc_order;
        int warm = 1 + order < n ? 1 + order : n;
        for (int i = 1; i < warm; i++)
            o[i] = clip_msbs((int64_t)o[i] + o[i - 1], clip);
        switch (order) {
            case 1: predict_main<1>(o, n, order); break;
            case 2: predict_main<2>(o, n, order); break;
            case 3: predict_main<3>(o, n, order); break;
            case 4: predict_main<4>(o, n, order); break;
            case 5: predict_main<5>(o, n, order); break;
            case 6: predict_main<6>(o, n, order); break;
            case 7: predict_main<7>(o, n, order); break;
            case 8: predict_main<8>(o, n, order); break;
            default: predict_main<0>(o, n, order); break;
        }
    }
};

void decorrelate_mid_side(int32_t* o0, int32_t* o1, int n, int32_t weight,
                          int shift) {
    for (int i = 0; i < n; i++) {
        int32_t a = wrap32((int64_t)o0[i] + o1[i] -
                           (wrap32((int64_t)o1[i] * weight) >> shift));
        int32_t b = wrap32((int64_t)a - o1[i]);
        o0[i] = a;
        o1[i] = b;
    }
}

// Scratch holds one element's shifted tail bits (frame_length <= 65536).
thread_local int32_t g_tail[2 * 4096 * 16];

// Decode one SCE/LFE/CPE element. Returns num_samples >= 0, or a negative
// error (-20.. mirror alac.py's DecodeError conditions; -1 = bit error).
int decode_element(Bits& br, int32_t* o0, int32_t* o1, int frame_length,
                   int bit_depth, int pb, int mb, int kb) {
    bool is_cpe = o1 != nullptr;
    br.read(4);  // element instance tag
    if (br.read(12) != 0) return -21;
    bool is_partial = br.read(1);
    int shift = 8 * (int)br.read(2);
    bool is_uncompressed = br.read(1);
    if (shift >= 24 || shift >= bit_depth) return -22;
    int64_t num_samples = is_partial ? (int64_t)br.read(32) : frame_length;
    if (num_samples > frame_length) return -23;
    if (br.error) return -1;
    int n = (int)num_samples;

    if (!is_uncompressed) {
        int bps = bit_depth - shift + (is_cpe ? 1 : 0);
        if (bps > 32) return -24;
        int ms_shift = (int)br.read(8);
        int32_t ms_weight = read_signed(br, 8);
        if (!is_cpe && (ms_shift || ms_weight)) return -25;
        ElemChan e0(br, pb, mb, kb, bps);
        if (e0.bad) return -26;
        ElemChan* e1p = nullptr;
        alignas(8) char e1buf[sizeof(ElemChan)];
        if (is_cpe) {
            e1p = new (e1buf) ElemChan(br, pb, mb, kb, bps);
            if (e1p->bad) return -26;
        }
        if (br.error) return -1;
        int tail_count = 0;
        if (shift > 0) {
            tail_count = (is_cpe ? 2 : 1) * n;
            for (int i = 0; i < tail_count; i++)
                g_tail[i] = (int32_t)br.read(shift);
        }
        e0.read_residuals(br, o0, n);
        e0.predict(o0, n);
        if (is_cpe) {
            e1p->read_residuals(br, o1, n);
            e1p->predict(o1, n);
            if (ms_weight != 0) {
                if (ms_shift > 31) return -27;
                decorrelate_mid_side(o0, o1, n, ms_weight, ms_shift);
            }
        }
        if (br.error) return -1;
        if (shift > 0) {
            if (is_cpe) {
                for (int i = 0; i < n; i++) {
                    o0[i] = (int32_t)(((int64_t)o0[i] << shift) |
                                      g_tail[2 * i]);
                    o1[i] = (int32_t)(((int64_t)o1[i] << shift) |
                                      g_tail[2 * i + 1]);
                }
            } else {
                for (int i = 0; i < n; i++)
                    o0[i] = (int32_t)(((int64_t)o0[i] << shift) | g_tail[i]);
            }
        }
    } else {
        if (is_cpe) {
            for (int i = 0; i < n; i++) {
                o0[i] = read_signed(br, bit_depth);
                o1[i] = read_signed(br, bit_depth);
            }
        } else {
            for (int i = 0; i < n; i++) o0[i] = read_signed(br, bit_depth);
        }
        if (br.error) return -1;
    }
    return n;
}

}  // namespace

extern "C" {

// Decode one ALAC packet into planar int32 samples (alac.py
// AlacDecoder.decode). out is [num_channels][frame_length] int32, planes
// in OUTPUT order; chmap maps decode order -> output plane. Returns the
// element-reported frame count (>= 0) or a negative error — the caller
// falls back to the Python decoder on error so malformed-input behavior
// is identical to the oracle.
int32_t sh_alac_decode(const uint8_t* data, int64_t data_len,
                       int32_t frame_length, int32_t bit_depth, int32_t pb,
                       int32_t mb, int32_t kb, int32_t num_channels,
                       const int32_t* chmap, int32_t* out) {
    if (frame_length <= 0 || frame_length > 4096 * 16) return -30;
    Bits br(data, data_len);
    int next_ch = 0;
    int num_frames = 0;
    for (;;) {
        uint32_t tag = br.read(3);
        if (br.error) return -1;
        if (tag == 7) break;  // END
        if (tag == 0 || tag == 3) {  // SCE / LFE
            if (next_ch + 1 > num_channels) break;
            int r = decode_element(
                br, out + (int64_t)chmap[next_ch] * frame_length, nullptr,
                frame_length, bit_depth, pb, mb, kb);
            if (r < 0) return r;
            num_frames = r;
            next_ch += 1;
        } else if (tag == 1) {  // CPE
            if (next_ch + 2 > num_channels) break;
            int r = decode_element(
                br, out + (int64_t)chmap[next_ch] * frame_length,
                out + (int64_t)chmap[next_ch + 1] * frame_length,
                frame_length, bit_depth, pb, mb, kb);
            if (r < 0) return r;
            num_frames = r;
            next_ch += 2;
        } else if (tag == 4) {  // DSE
            br.read(4);
            uint32_t align = br.read(1);
            uint32_t count = br.read(8);
            if (count == 255) count += br.read(8);
            if (align && (br.bits_read() & 7)) br.ignore(8 - (br.bits_read() & 7));
            br.ignore(8 * (int64_t)count);
            if (br.error) return -1;
        } else if (tag == 6) {  // FIL
            uint32_t count = br.read(4);
            if (count == 15) count += br.read(8) - 1;
            br.ignore(8 * (int64_t)count);
            if (br.error) return -1;
        } else {  // CCE / PCE
            return -28;
        }
        if (next_ch >= num_channels) break;
    }
    return num_frames;
}

}  // extern "C"
