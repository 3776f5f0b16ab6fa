// symphonia_tpu native host library.
//
// TPU-native re-expression of the reference's host-side hot loops: the
// byte/bit-level pre-scan stages that feed the batched device kernels
// (SURVEY.md §7 Phase A). Implements:
//
//  * table-driven CRC-8/16/32 (symphonia-core/src/checksum/)
//  * FLAC frame-boundary scan: 14-bit sync + header CRC-8 validation +
//    frame CRC-16 span confirmation (bundle-flac parser.rs semantics)
//  * FLAC frame entropy extraction: header + subframe headers + Rice
//    residual decode into dense int32 tensors laid out for the device
//    LPC-reconstruction kernel (bundle-flac decoder.rs:341-660)
//
// Exposed with a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC tables
// ---------------------------------------------------------------------------

struct CrcTables {
    uint8_t crc8[256];
    uint16_t crc16[256];
    uint32_t crc32[256];
    CrcTables() {
        for (int i = 0; i < 256; i++) {
            uint32_t c8 = i;
            for (int b = 0; b < 8; b++) c8 = (c8 & 0x80) ? ((c8 << 1) ^ 0x07) : (c8 << 1);
            crc8[i] = (uint8_t)c8;
            uint32_t c16 = i << 8;
            for (int b = 0; b < 8; b++) c16 = (c16 & 0x8000) ? ((c16 << 1) ^ 0x8005) : (c16 << 1);
            crc16[i] = (uint16_t)c16;
            uint32_t c32 = (uint32_t)i << 24;
            for (int b = 0; b < 8; b++) c32 = (c32 & 0x80000000u) ? ((c32 << 1) ^ 0x04C11DB7u) : (c32 << 1);
            crc32[i] = c32;
        }
    }
};

const CrcTables kCrc;

uint8_t crc8_buf(const uint8_t* p, int64_t n, uint8_t init) {
    uint8_t c = init;
    for (int64_t i = 0; i < n; i++) c = kCrc.crc8[c ^ p[i]];
    return c;
}
uint8_t crc8_buf(const uint8_t* p, int64_t n) {
    uint8_t c = 0;
    for (int64_t i = 0; i < n; i++) c = kCrc.crc8[c ^ p[i]];
    return c;
}

uint16_t crc16_buf(const uint8_t* p, int64_t n, uint16_t c = 0) {
    for (int64_t i = 0; i < n; i++) c = (uint16_t)((c << 8) ^ kCrc.crc16[((c >> 8) ^ p[i]) & 0xFF]);
    return c;
}

uint32_t crc32_buf(const uint8_t* p, int64_t n, uint32_t c = 0) {
    for (int64_t i = 0; i < n; i++) c = (c << 8) ^ kCrc.crc32[((c >> 24) ^ p[i]) & 0xFF];
    return c;
}

// ---------------------------------------------------------------------------
// MSB-first bit reader
// ---------------------------------------------------------------------------

struct BitReader {
    // Windowed MSB-first reader: an absolute bit cursor plus unaligned
    // 64-bit big-endian window loads — branch-light for the Rice hot loop.
    const uint8_t* data;
    int64_t len;      // bytes
    int64_t bitlen;   // bits
    int64_t bitpos;
    bool error;

    BitReader(const uint8_t* d, int64_t n)
        : data(d), len(n), bitlen(n * 8), bitpos(0), error(false) {}

    // 64 bits starting at bitpos, left-aligned; zero-padded past the end.
    inline uint64_t window() const {
        int64_t byte = bitpos >> 3;
        uint64_t w;
        if (byte + 8 <= len) {
            memcpy(&w, data + byte, 8);
            w = __builtin_bswap64(w);
        } else {
            w = 0;
            for (int i = 0; i < 8; i++)
                w = (w << 8) | (byte + i < len ? data[byte + i] : 0);
        }
        return w << (bitpos & 7);
    }

    inline uint64_t read(int nbits) {
        if (nbits == 0) return 0;
        if (bitpos + nbits > bitlen) { error = true; bitpos = bitlen; return 0; }
        uint64_t v = window() >> (64 - nbits);
        bitpos += nbits;
        return v;
    }

    inline int64_t read_signed(int nbits) {
        uint64_t v = read(nbits);
        if (nbits && (v & (1ULL << (nbits - 1)))) return (int64_t)v - (1LL << nbits);
        return (int64_t)v;
    }

    inline uint32_t read_unary_zeros() {
        uint32_t zeros = 0;
        for (;;) {
            uint64_t w = window();
            // window() yields only 64 - (bitpos & 7) REAL bits; the low
            // (bitpos & 7) bits are zero padding from the alignment shift.
            // Advancing by a full 64 on an all-zero window would skip up to
            // 7 unexamined bits (possibly the terminating 1) — advance only
            // over the bits actually inspected.
            int valid = (int)(64 - (bitpos & 7));
            if (bitpos + valid > bitlen) valid = (int)(bitlen - bitpos);
            if (w != 0) {
                int lz = __builtin_clzll(w);
                if (lz >= valid || bitpos + lz + 1 > bitlen) {
                    error = true; bitpos = bitlen; return zeros;
                }
                bitpos += lz + 1;
                return zeros + lz;
            }
            if (valid <= 0) { error = true; bitpos = bitlen; return zeros; }
            zeros += valid;
            bitpos += valid;
        }
    }

    inline int64_t bits_read() const { return bitpos; }
};

// ---------------------------------------------------------------------------
// FLAC frame header parse (common/flac.py mirror)
// ---------------------------------------------------------------------------

static const int8_t kFixedCoefs[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

struct FlacHeader {
    int block_size;
    int sample_rate;     // 0 = from streaminfo
    int assignment;      // 0 indep, 1 L/S, 2 R/S, 3 M/S
    int n_channels;
    int bits;            // 0 = from streaminfo
    int header_len;
    int64_t seq;
    bool variable;
};

static const int kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                    256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
static const int kSampleRates[16] = {0, 88200, 176400, 192000, 8000, 16000, 22050,
                                     24000, 32000, 44100, 48000, 96000, -1, -2, -3, -4};
static const int kSampleSizes[8] = {0, 8, 12, -1, 16, 20, 24, 32};

bool parse_flac_header(const uint8_t* d, int64_t len, int si_channels, int si_bits,
                       int si_rate, int si_block_max, FlacHeader* out) {
    if (len < 6) return false;
    if (d[0] != 0xFF || (d[1] & 0xFC) != 0xF8) return false;
    bool variable = d[1] & 0x01;
    int bs_code = d[2] >> 4;
    int sr_code = d[2] & 0xF;
    if (bs_code == 0 || sr_code == 0xF) return false;
    int ch_code = d[3] >> 4;
    int ss_code = (d[3] >> 1) & 0x7;
    if (d[3] & 1) return false;
    if (ss_code == 3) return false;
    if (ch_code > 0xA) return false;
    int64_t pos = 4;
    // UTF-8-style number.
    uint8_t b0 = d[pos++];
    int64_t seq = 0;
    if ((b0 & 0x80) == 0) {
        seq = b0;
    } else {
        int n_extra = 0; uint8_t mask = 0x40;
        while (b0 & mask) { n_extra++; mask >>= 1; }
        if (n_extra == 0 || n_extra > 6) return false;
        seq = b0 & (mask - 1);
        for (int i = 0; i < n_extra; i++) {
            if (pos >= len) return false;
            uint8_t b = d[pos++];
            if ((b & 0xC0) != 0x80) return false;
            seq = (seq << 6) | (b & 0x3F);
        }
    }
    int block_size;
    if (bs_code == 6) { if (pos + 1 > len) return false; block_size = d[pos] + 1; pos += 1; }
    else if (bs_code == 7) { if (pos + 2 > len) return false; block_size = (d[pos] << 8 | d[pos + 1]) + 1; pos += 2; }
    else block_size = kBlockSizes[bs_code];
    int rate;
    if (sr_code == 0) rate = 0;
    else if (sr_code == 12) { if (pos + 1 > len) return false; rate = d[pos] * 1000; pos += 1; }
    else if (sr_code == 13) { if (pos + 2 > len) return false; rate = d[pos] << 8 | d[pos + 1]; pos += 2; }
    else if (sr_code == 14) { if (pos + 2 > len) return false; rate = (d[pos] << 8 | d[pos + 1]) * 10; pos += 2; }
    else rate = kSampleRates[sr_code];
    if (pos + 1 > len) return false;
    if (crc8_buf(d, pos) != d[pos]) return false;
    pos += 1;

    int n_channels = (ch_code <= 7) ? ch_code + 1 : 2;
    int assignment = (ch_code <= 7) ? 0 : (ch_code - 7);  // 1=LS, 2=RS, 3=MS
    int bits = kSampleSizes[ss_code];

    // Cross-check against STREAMINFO.
    if (si_channels && n_channels != si_channels) return false;
    if (bits && si_bits && bits != si_bits) return false;
    if (rate && si_rate && rate != si_rate) return false;
    if (si_block_max && block_size > si_block_max) return false;

    out->block_size = block_size;
    out->sample_rate = rate;
    out->assignment = assignment;
    out->n_channels = n_channels;
    out->bits = bits;
    out->header_len = (int)pos;
    out->seq = seq;
    out->variable = variable;
    return true;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// CRC exports
// ---------------------------------------------------------------------------

uint32_t sh_crc8(const uint8_t* p, int64_t n) { return crc8_buf(p, n); }
uint32_t sh_crc8_init(const uint8_t* p, int64_t n, uint32_t init) {
    return crc8_buf(p, n, (uint8_t)init);
}
uint32_t sh_crc16(const uint8_t* p, int64_t n, uint32_t init) { return crc16_buf(p, n, (uint16_t)init); }
uint32_t sh_crc32(const uint8_t* p, int64_t n, uint32_t init) { return crc32_buf(p, n, init); }

// ---------------------------------------------------------------------------
// FLAC frame scan: returns number of frame start offsets written.
// ---------------------------------------------------------------------------

int64_t sh_flac_scan(const uint8_t* data, int64_t len,
                     int32_t si_channels, int32_t si_bits, int32_t si_rate,
                     int32_t si_block_max,
                     int64_t* out_offsets, int64_t cap) {
    if (len < 2 || cap < 1) return 0;
    int64_t n = 0;
    out_offsets[n++] = 0;
    FlacHeader h;
    // Header-valid candidates whose chain CRC failed since the last accepted
    // start: used to re-anchor past a corrupt frame (a pure CRC chain would
    // drop every frame after one corruption; parser.rs re-syncs instead).
    int64_t tent[64];
    int n_tent = 0;
    for (int64_t c = 1; c + 1 < len && n < cap; c++) {
        if (data[c] != 0xFF || (data[c + 1] & 0xFC) != 0xF8) continue;
        if (c <= out_offsets[n - 1]) continue;
        int64_t avail = len - c < 16 ? len - c : 16;
        if (!parse_flac_header(data + c, avail, si_channels, si_bits, si_rate,
                               si_block_max, &h))
            continue;
        int64_t prev = out_offsets[n - 1];
        if (c - prev < 6) continue;
        uint16_t expect = (uint16_t)((data[c - 2] << 8) | data[c - 1]);
        if (crc16_buf(data + prev, c - 2 - prev) == expect) {
            out_offsets[n++] = c;
            n_tent = 0;
            continue;
        }
        bool anchored = false;
        for (int t = 0; t < n_tent; t++) {
            if (c - tent[t] >= 6 &&
                crc16_buf(data + tent[t], c - 2 - tent[t]) == expect) {
                out_offsets[n++] = tent[t];
                if (n < cap) out_offsets[n++] = c;
                n_tent = 0;
                anchored = true;
                break;
            }
        }
        if (!anchored && n_tent < 64) tent[n_tent++] = c;
    }
    return n;
}

// ---------------------------------------------------------------------------
// FLAC frame entropy extraction.
//
// Layout matches ops/flac_dense.pack_parsed_frames: residual tensor
// res[f, ch, n] holds warmups at [0, order) and residuals after; constant /
// verbatim subframes become order-0 lanes with the payload in res.
// status[f]: 0 ok, <0 error code.
// ---------------------------------------------------------------------------

static int64_t extract_one_frame(
    const uint8_t* fd, int64_t flen,
    int32_t si_channels, int32_t si_bits, int32_t si_rate, int32_t si_block_max,
    int32_t max_ch, int32_t n_max, int64_t lane0,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out, int32_t* block_out, int32_t* assign_out,
    int32_t* bps_out) {
    // Parses one frame at fd; fills the frame's lanes starting at lane0.
    // Returns total bytes consumed (incl. the trailing CRC-16), or a
    // negative status code.
    FlacHeader h;
    if (!parse_flac_header(fd, flen < 16 ? flen : 16, si_channels, si_bits,
                           si_rate, si_block_max, &h))
        return -1;
    int bps = h.bits ? h.bits : si_bits;
    int bs = h.block_size;
    if (bs > n_max || h.n_channels > max_ch) return -2;
    *block_out = bs;
    *assign_out = h.assignment;
    *bps_out = bps;

    BitReader br(fd, flen);
    for (int64_t skip = (int64_t)h.header_len * 8; skip > 0;) {
        int s = skip > 32 ? 32 : (int)skip;
        br.read(s);
        skip -= s;
    }

    for (int ch = 0; ch < h.n_channels; ch++) {
        if (br.error) return -11;
        int ch_bps = bps;
        if ((h.assignment == 1 && ch == 1) || (h.assignment == 2 && ch == 0) ||
            (h.assignment == 3 && ch == 1))
            ch_bps += 1;
        int64_t lane = lane0 + ch;
        int32_t* lres = res + lane * n_max;
        int32_t* lcoef = coefs + lane * 32;
        memset(lcoef, 0, 32 * sizeof(int32_t));

        if (br.read(1) != 0) return -3;
        int sf_type = (int)br.read(6);
        int wasted = 0;
        if (br.read(1)) wasted = (int)br.read_unary_zeros() + 1;
        int eff = ch_bps - wasted;
        if (eff <= 0) return -4;
        wasted_out[lane] = wasted;
        shift_out[lane] = 0;
        order_out[lane] = 0;

        if (sf_type == 0) {  // constant
            int32_t v = (int32_t)br.read_signed(eff);
            for (int i = 0; i < bs; i++) lres[i] = v;
            continue;
        }
        if (sf_type == 1) {  // verbatim
            for (int i = 0; i < bs; i++) lres[i] = (int32_t)br.read_signed(eff);
            continue;
        }
        int order;
        if (sf_type >= 0x20) {  // LPC
            order = (sf_type & 0x1F) + 1;
            // Warmup count may not exceed the block size: lres has bs (<=
            // n_max) valid slots, and order 32 with a tiny STREAMINFO
            // block_len_max would write out of bounds.
            if (order > bs) return -12;
            for (int i = 0; i < order; i++) lres[i] = (int32_t)br.read_signed(eff);
            int prec = (int)br.read(4);
            if (prec == 0xF) return -5;
            prec += 1;
            int shift = (int)br.read_signed(5);
            if (shift < 0) return -6;
            shift_out[lane] = shift;
            for (int i = 0; i < order; i++) lcoef[i] = (int32_t)br.read_signed(prec);
        } else if ((sf_type & 0x38) == 0x08 && (sf_type & 0x7) <= 4) {  // fixed
            order = sf_type & 0x7;
            if (order > bs) return -12;
            for (int i = 0; i < order; i++) lres[i] = (int32_t)br.read_signed(eff);
            for (int i = 0; i < order; i++) lcoef[i] = kFixedCoefs[order][i];
        } else {
            return -7;
        }
        order_out[lane] = order;

        // Rice residual (decoder.rs:513-660).
        int method = (int)br.read(2);
        if (method > 1) return -8;
        int pbits = method == 0 ? 4 : 5;
        int escape = (1 << pbits) - 1;
        int part_order = (int)br.read(4);
        int n_parts = 1 << part_order;
        int part_len = bs >> part_order;
        if (part_len * n_parts != bs || part_len <= 0 ||
            (part_len < order && n_parts == 1)) return -9;
        int idx = order;
        for (int p = 0; p < n_parts && !br.error; p++) {
            int cnt = part_len - (p == 0 ? order : 0);
            if (cnt < 0) return -10;
            int param = (int)br.read(pbits);
            if (param == escape) {
                int raw = (int)br.read(5);
                for (int i = 0; i < cnt; i++)
                    lres[idx++] = raw ? (int32_t)br.read_signed(raw) : 0;
            } else {
                // Persistent cached window: keep up to 64 left-aligned bits
                // in a register and refill only when the next code might not
                // fit, instead of reloading per symbol. `valid` counts bits
                // remaining in `w`; refills are plain unaligned 8-byte loads
                // well inside the buffer, with a per-symbol fallback near
                // stream end or for pathological >56-bit codes.
                int i = 0;
                int64_t bp = br.bitpos;
                while (i < cnt && (bp >> 3) + 16 <= br.len) {
                    uint64_t w;
                    memcpy(&w, br.data + (bp >> 3), 8);
                    w = __builtin_bswap64(w) << (bp & 7);
                    int valid = 64 - (int)(bp & 7);
                    for (; i < cnt; i++) {
                        int lz = w ? __builtin_clzll(w) : 64;
                        int need = lz + 1 + param;
                        if (need > valid) break;  // refill (or fall back)
                        uint64_t rem = param
                            ? (w << (lz + 1)) >> (64 - param) : 0;
                        uint64_t v = ((uint64_t)lz << param) | rem;
                        w <<= need;
                        valid -= need;
                        bp += need;
                        lres[idx++] = (int32_t)((v >> 1) ^ (~(v & 1) + 1));
                    }
                    if (i < cnt && valid == 64 - (int)(bp & 7)) break;
                }
                br.bitpos = bp;
                if (br.bitpos > br.bitlen) { br.error = true; }
                for (; i < cnt && !br.error; i++) {
                    uint64_t q = br.read_unary_zeros();
                    uint64_t v = (q << param) | (param ? br.read(param) : 0);
                    lres[idx++] = (int32_t)((v >> 1) ^ (~(v & 1) + 1));
                }
            }
        }
    }
    if (br.error) return -11;
    // Byte-align + 16-bit frame CRC.
    int64_t consumed = (br.bits_read() + 7) / 8 + 2;
    if (consumed > flen) return -12;
    return consumed;
}

int32_t sh_flac_extract(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    int32_t si_channels, int32_t si_bits, int32_t si_rate, int32_t si_block_max,
    int32_t max_ch, int32_t n_max,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out, int32_t* block_out, int32_t* assign_out,
    int32_t* bps_out, int32_t* status) {
    for (int32_t f = 0; f < n_frames; f++) {
        int64_t r = extract_one_frame(
            data + offsets[f], sizes[f], si_channels, si_bits, si_rate,
            si_block_max, max_ch, n_max, (int64_t)f * max_ch,
            res, coefs, order_out, shift_out, wasted_out,
            block_out + f, assign_out + f, bps_out + f);
        status[f] = r < 0 ? (int32_t)r : 0;
    }
    return 0;
}

// Single-pass demux + extract: parses frames sequentially (the entropy
// parse itself determines each frame's end, so no sync scan or CRC pass is
// needed — the sequential-decode framing of bundle-flac). Returns the
// number of frames; out_offsets[f] records each frame's byte offset.
int32_t sh_flac_stream_extract(
    const uint8_t* data, int64_t data_len,
    int32_t si_channels, int32_t si_bits, int32_t si_rate, int32_t si_block_max,
    int32_t max_ch, int32_t n_max, int32_t max_frames,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out, int32_t* block_out, int32_t* assign_out,
    int32_t* bps_out, int64_t* out_offsets) {
    int64_t pos = 0;
    int32_t f = 0;
    while (pos + 6 <= data_len && f < max_frames) {
        int64_t r = extract_one_frame(
            data + pos, data_len - pos, si_channels, si_bits, si_rate,
            si_block_max, max_ch, n_max, (int64_t)f * max_ch,
            res, coefs, order_out, shift_out, wasted_out,
            block_out + f, assign_out + f, bps_out + f);
        if (r < 0) {
            // Lost sync: scan forward for the next plausible frame header.
            int64_t c = pos + 1;
            FlacHeader h;
            for (; c + 16 <= data_len; c++) {
                if (data[c] == 0xFF && (data[c + 1] & 0xFC) == 0xF8 &&
                    parse_flac_header(data + c, 16, si_channels, si_bits,
                                      si_rate, si_block_max, &h))
                    break;
            }
            if (c + 16 > data_len) break;
            pos = c;
            continue;
        }
        out_offsets[f] = pos;
        pos += r;
        f++;
    }
    return f;
}

// Per-packet full-frame decode (the per-packet AudioDecoder fast path):
// entropy via extract_one_frame, then the integer predictor recurrence +
// stereo decorrelation in int64 (decoder.rs:663,716 semantics; constant/
// verbatim subframes come through as order-0 recurrences). Writes
// pcm[C][n_max] int32; meta = {block_size, bps, consumed_bytes}. Callers
// gate on streams whose residuals fit int32 (bits_per_sample <= 25, the
// same criterion as the batch device path). Returns 0, or a negative
// extract status; -20 = CRC-16 mismatch (when verify_crc).
}  // extern "C" (paused: templates need C++ linkage)

// FLAC LPC with a compile-time order where it matters: coefficients and
// the sample history live in registers (the generic pointer-walk reloads
// order+1 values per sample), and the dot unrolls fully. Arithmetic is
// identical to the reference recurrence (decoder.rs:716): int64
// accumulator, (acc >> sh) quantized prediction, int64 sample chain. The
// wasted-bits shift is folded into the store (history keeps the
// UNSHIFTED value — the reference shifts after prediction too).
template <int ORDER>
static void flac_predict_t(const int32_t* r, const int32_t* c_in, int sh,
                           int wasted, int block, int order_rt, int64_t* xs) {
    const int order = ORDER > 0 ? ORDER : order_rt;
    int64_t c[ORDER > 0 ? ORDER : 32];
    for (int j = 0; j < order; j++) c[j] = c_in[j];
    int64_t h[ORDER > 0 ? ORDER : 32];  // h[j] = unshifted xs[i-1-j]
    const int lim = order < block ? order : block;
    for (int i = 0; i < lim; i++) xs[i] = (int64_t)r[i] << wasted;
    for (int j = 0; j < order; j++)
        h[j] = (order - 1 - j) < lim ? (int64_t)r[order - 1 - j] : 0;
    for (int i = order; i < block; i++) {
        int64_t acc = 0;
        for (int j = 0; j < order; j++) acc += c[j] * h[j];
        int64_t v = (int64_t)r[i] + (acc >> sh);
        xs[i] = v << wasted;
        for (int j = (ORDER > 0 ? ORDER : order_rt) - 1; j > 0; j--)
            h[j] = h[j - 1];
        if (order > 0) h[0] = v;
    }
}

extern "C" {

int32_t sh_flac_decode_frame(
    const uint8_t* fd, int64_t flen,
    int32_t si_channels, int32_t si_bits, int32_t si_rate, int32_t si_block_max,
    int32_t max_ch, int32_t n_max, int32_t verify_crc,
    int32_t* pcm, int32_t* meta) {
    // Persistent scratch (grow-only): a fresh std::vector would memset
    // ~100 KB per call, a large share of the per-packet budget.
    static thread_local std::vector<int32_t> res;
    static thread_local std::vector<int64_t> x;
    if ((int64_t)res.size() < (int64_t)max_ch * n_max)
        res.resize((size_t)max_ch * n_max);
    int32_t coefs[8 * 32], order[8], shift[8], wasted[8];
    int32_t block, assign, bps;
    if (max_ch > 8) return -13;
    int64_t consumed = extract_one_frame(
        fd, flen, si_channels, si_bits, si_rate, si_block_max, max_ch, n_max,
        0, res.data(), coefs, order, shift, wasted, &block, &assign, &bps);
    if (consumed < 0) return (int32_t)consumed;
    if (verify_crc) {
        uint16_t expect = (uint16_t)((fd[consumed - 2] << 8) | fd[consumed - 1]);
        if (crc16_buf(fd, consumed - 2) != expect) return -20;
    }
    FlacHeader h;
    parse_flac_header(fd, flen < 16 ? flen : 16, si_channels, si_bits,
                      si_rate, si_block_max, &h);
    int n_ch = h.n_channels;
    if ((int64_t)x.size() < (int64_t)n_ch * block)
        x.resize((size_t)n_ch * block);
    for (int ch = 0; ch < n_ch; ch++) {
        const int32_t* r = res.data() + (size_t)ch * n_max;
        const int32_t* c = coefs + ch * 32;
        int o = order[ch];
        int sh = shift[ch];
        int w = wasted[ch];
        int64_t* xs = x.data() + (size_t)ch * block;
        switch (o) {
            case 0:
                for (int i = 0; i < block; i++) xs[i] = (int64_t)r[i] << w;
                break;
            case 1: flac_predict_t<1>(r, c, sh, w, block, o, xs); break;
            case 2: flac_predict_t<2>(r, c, sh, w, block, o, xs); break;
            case 3: flac_predict_t<3>(r, c, sh, w, block, o, xs); break;
            case 4: flac_predict_t<4>(r, c, sh, w, block, o, xs); break;
            case 5: flac_predict_t<5>(r, c, sh, w, block, o, xs); break;
            case 6: flac_predict_t<6>(r, c, sh, w, block, o, xs); break;
            case 7: flac_predict_t<7>(r, c, sh, w, block, o, xs); break;
            case 8: flac_predict_t<8>(r, c, sh, w, block, o, xs); break;
            case 9: flac_predict_t<9>(r, c, sh, w, block, o, xs); break;
            case 10: flac_predict_t<10>(r, c, sh, w, block, o, xs); break;
            case 11: flac_predict_t<11>(r, c, sh, w, block, o, xs); break;
            case 12: flac_predict_t<12>(r, c, sh, w, block, o, xs); break;
            default: {
                // Orders 13-32 (rare): direct xs walk — a register history
                // this wide spills and measures slower than the reloads.
                const int lim = o < block ? o : block;
                for (int i = 0; i < lim; i++) xs[i] = r[i];
                for (int i = o; i < block; i++) {
                    int64_t acc = 0;
                    for (int j = 0; j < o; j++)
                        acc += (int64_t)c[j] * xs[i - 1 - j];
                    xs[i] = (int64_t)r[i] + (acc >> sh);
                }
                if (w)
                    for (int i = 0; i < block; i++) xs[i] <<= w;
                break;
            }
        }
    }
    // Decorrelate (decoder.rs:32-83) fused with the int32 downcast:
    // 0=independent, 1=left/side, 2=right/side, 3=mid/side. These loops
    // auto-vectorize (int64 lanes -> packed int32 stores).
    if (n_ch == 2 && assign != 0) {
        const int64_t* a = x.data();
        const int64_t* b = x.data() + block;
        int32_t* oa = pcm;
        int32_t* ob = pcm + n_max;
        if (assign == 1) {
            for (int i = 0; i < block; i++) {
                oa[i] = (int32_t)a[i];
                ob[i] = (int32_t)(a[i] - b[i]);
            }
        } else if (assign == 2) {
            for (int i = 0; i < block; i++) {
                oa[i] = (int32_t)(a[i] + b[i]);
                ob[i] = (int32_t)b[i];
            }
        } else {
            for (int i = 0; i < block; i++) {
                int64_t m2 = (a[i] << 1) | (b[i] & 1);
                int64_t s = b[i];
                oa[i] = (int32_t)((m2 + s) >> 1);
                ob[i] = (int32_t)((m2 - s) >> 1);
            }
        }
    } else {
        for (int ch = 0; ch < n_ch; ch++) {
            const int64_t* xs = x.data() + (size_t)ch * block;
            int32_t* o = pcm + (size_t)ch * n_max;
            for (int i = 0; i < block; i++) o[i] = (int32_t)xs[i];
        }
    }
    meta[0] = block;
    meta[1] = bps;
    meta[2] = (int32_t)consumed;
    return 0;
}

// Canonical Vorbis codeword assignment: exact mirror of
// core/io/codebook.py::from_lengths_canonical (spec left-aligned
// branch-splitting; analog of symphonia-codec-vorbis codebook.rs
// synthesis). Hot at decoder construction: ~40 books per Vorbis setup.
// Returns 0 ok, 1 over-specified, 2 under-specified, 3 invalid length.
// codes[i] is the right-aligned codeword for entries with lengths[i]>0.
int32_t sh_codebook_assign(const int32_t* lengths, int64_t n,
                           uint32_t* codes) {
    uint64_t available[33] = {0};
    bool first = true;
    int64_t used = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t ln = lengths[i];
        if (ln == 0) continue;
        if (ln < 1 || ln > 32) return 3;
        uint64_t code_aligned;
        if (first) {
            code_aligned = 0;
            for (int j = 1; j <= ln; j++) available[j] = 1ull << (32 - j);
            first = false;
        } else {
            int y = ln;
            while (y > 0 && available[y] == 0) y--;
            if (y == 0) return 1;
            code_aligned = available[y];
            available[y] = 0;
            for (int j = y + 1; j <= ln; j++)
                available[j] = code_aligned + (1ull << (32 - j));
        }
        codes[i] = (uint32_t)(code_aligned >> (32 - ln));
        used++;
    }
    if (used > 1) {
        for (int j = 1; j <= 32; j++)
            if (available[j]) return 2;
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// SIMD (AVX-512) 8-lane FLAC extraction.
//
// Frames are independent after the offset scan, so eight frames decode in
// parallel — one per 64-bit SIMD lane. Headers, warmups, coefficients and
// partition bookkeeping run scalar per lane (they are a tiny fraction of
// the bits); the Rice residual hot loop runs vectorized: gather the eight
// bit windows, byteswap, align, lzcnt, fuse quotient+remainder, zigzag and
// scatter — one residual per lane per iteration. Lanes that hit a
// partition boundary, an escape, a long unary run, or end-of-frame drop to
// the scalar state machine and rejoin.
// ---------------------------------------------------------------------------

#if defined(__AVX512F__) && defined(__AVX512CD__) && defined(__AVX512BW__)
#define SH_HAVE_AVX512 1
#include <immintrin.h>

// Cycle-level profiling, compile-gated like aac_entropy.cpp's (-DSH_FLAC_PROF):
//   0 total extract_simd  1 vector burst  2 scalar service
//   3 lane_advance        4 burst iters   5 lane-iterations (popcnt run)
#ifdef SH_FLAC_PROF
#include <x86intrin.h>
namespace {
uint64_t g_fprof[8];
}
extern "C" const uint64_t* sh_flac_prof() { return g_fprof; }
extern "C" void sh_flac_prof_reset() { memset(g_fprof, 0, sizeof(g_fprof)); }
#define FPROF_START(x) uint64_t _t_##x = __rdtsc()
#define FPROF_STOP(x, i) g_fprof[i] += __rdtsc() - _t_##x
#define FPROF_COUNT(i, n) g_fprof[i] += (uint64_t)(n)
#else
#define FPROF_START(x)
#define FPROF_STOP(x, i)
#define FPROF_COUNT(i, n)
#endif

namespace {

struct LaneSM {
    // One frame's scalar parsing state; pauses whenever it enters a Rice
    // partition body (the vector core takes over from there).
    const uint8_t* data;
    int64_t data_len;
    int64_t frame_off;
    BitReader br;        // relative to data + frame_off
    FlacHeader h;
    int bps;
    int bs;
    int ch;              // current channel being parsed
    int32_t* lres;       // current channel's residual row
    int idx;             // next residual slot
    // residual-section state
    int pbits, escape, n_parts, part_len, cur_part, order;
    int cnt_left, param;
    int fidx;            // frame index (for per-frame outputs)
    bool in_residual;
    LaneSM() : br(nullptr, 0) {}
};

// Advance a lane's scalar state machine until it is inside a decodable Rice
// partition (returns 0, cnt_left > 0), the frame completes (returns 1), or
// a parse error occurs (returns the negative code). Mirrors
// extract_one_frame exactly.
#ifdef SH_FLAC_PROF
static int lane_advance_inner(
    LaneSM& L,
    int32_t si_bits, int32_t max_ch, int32_t n_max,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out);
static int lane_advance(
    LaneSM& L,
    int32_t si_bits, int32_t max_ch, int32_t n_max,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out) {
    FPROF_START(la);
    int r_ = lane_advance_inner(L, si_bits, max_ch, n_max, res, coefs,
                                order_out, shift_out, wasted_out);
    FPROF_STOP(la, 3);
    return r_;
}
static int lane_advance_inner(
    LaneSM& L,
    int32_t si_bits, int32_t max_ch, int32_t n_max,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out) {
#else
static int lane_advance(
    LaneSM& L,
    int32_t si_bits, int32_t max_ch, int32_t n_max,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out) {
#endif
    BitReader& br = L.br;
    for (;;) {
        if (br.error) return -11;
        if (L.in_residual) {
            // Move to the next partition (or finish the channel).
            while (++L.cur_part < L.n_parts) {
                int cnt = L.part_len - (L.cur_part == 0 ? L.order : 0);
                if (cnt < 0) return -10;
                int param = (int)br.read(L.pbits);
                if (param == L.escape) {
                    int raw = (int)br.read(5);
                    for (int i = 0; i < cnt && !br.error; i++)
                        L.lres[L.idx++] = raw ? (int32_t)br.read_signed(raw) : 0;
                    continue;
                }
                if (cnt == 0) continue;
                L.cnt_left = cnt;
                L.param = param;
                return 0;
            }
            L.in_residual = false;
            L.ch++;
            continue;
        }
        if (L.ch >= L.h.n_channels) {
            // Frame complete: byte-align + CRC16.
            return 1;
        }
        // --- subframe header (extract_one_frame:297-344) ---
        int ch = L.ch;
        int ch_bps = L.bps;
        if ((L.h.assignment == 1 && ch == 1) || (L.h.assignment == 2 && ch == 0) ||
            (L.h.assignment == 3 && ch == 1))
            ch_bps += 1;
        int64_t lane = (int64_t)L.fidx * max_ch + ch;
        L.lres = res + lane * n_max;
        int32_t* lcoef = coefs + lane * 32;
        memset(lcoef, 0, 32 * sizeof(int32_t));

        if (br.read(1) != 0) return -3;
        int sf_type = (int)br.read(6);
        int wasted = 0;
        if (br.read(1)) wasted = (int)br.read_unary_zeros() + 1;
        int eff = ch_bps - wasted;
        if (eff <= 0) return -4;
        wasted_out[lane] = wasted;
        shift_out[lane] = 0;
        order_out[lane] = 0;

        if (sf_type == 0) {
            int32_t v = (int32_t)br.read_signed(eff);
            for (int i = 0; i < L.bs; i++) L.lres[i] = v;
            L.ch++;
            continue;
        }
        if (sf_type == 1) {
            for (int i = 0; i < L.bs; i++) L.lres[i] = (int32_t)br.read_signed(eff);
            L.ch++;
            continue;
        }
        int order;
        if (sf_type >= 0x20) {
            order = (sf_type & 0x1F) + 1;
            if (order > L.bs) return -12;  // see extract_one_frame
            for (int i = 0; i < order; i++) L.lres[i] = (int32_t)br.read_signed(eff);
            int prec = (int)br.read(4);
            if (prec == 0xF) return -5;
            prec += 1;
            int shift = (int)br.read_signed(5);
            if (shift < 0) return -6;
            shift_out[lane] = shift;
            for (int i = 0; i < order; i++) lcoef[i] = (int32_t)br.read_signed(prec);
        } else if ((sf_type & 0x38) == 0x08 && (sf_type & 0x7) <= 4) {
            order = sf_type & 0x7;
            if (order > L.bs) return -12;
            for (int i = 0; i < order; i++) L.lres[i] = (int32_t)br.read_signed(eff);
            for (int i = 0; i < order; i++) lcoef[i] = kFixedCoefs[order][i];
        } else {
            return -7;
        }
        order_out[lane] = order;

        int method = (int)br.read(2);
        if (method > 1) return -8;
        L.pbits = method == 0 ? 4 : 5;
        L.escape = (1 << L.pbits) - 1;
        int part_order = (int)br.read(4);
        L.n_parts = 1 << part_order;
        L.part_len = L.bs >> part_order;
        if (L.part_len * L.n_parts != L.bs || L.part_len <= 0 ||
            (L.part_len < order && L.n_parts == 1)) return -9;
        L.order = order;
        L.idx = order;
        L.cur_part = -1;
        L.in_residual = true;
    }
}

// Decode one Rice code scalar at the lane's current position (long-unary /
// near-end fallback for the vector core).
static inline void lane_scalar_code(LaneSM& L) {
    uint64_t q = L.br.read_unary_zeros();
    uint64_t v = (q << L.param) | (L.param ? L.br.read(L.param) : 0);
    L.lres[L.idx++] = (int32_t)((v >> 1) ^ (~(v & 1) + 1));
    L.cnt_left--;
}

}  // namespace

extern "C" {

int32_t sh_flac_has_simd(void) { return 1; }

// Fast frame-boundary scan: AVX-512 sync-byte search + header parse +
// sequence-number chain filter (instead of the scalar scan's CRC-16 span
// confirmation — false sync positives would need a valid CRC-8 header AND
// the exact next frame/sample number to slip through; any that do are
// caught downstream by extraction status codes and the Python fallback).
int64_t sh_flac_scan_fast(
    const uint8_t* data, int64_t len,
    int32_t si_channels, int32_t si_bits, int32_t si_rate, int32_t si_block_max,
    int64_t* out_offsets, int64_t cap) {
    if (len < 6 || cap < 1) return 0;
    int64_t n = 0;
    FlacHeader h;
    // The buffer starts at the first frame by contract.
    if (!parse_flac_header(data, len < 16 ? len : 16, si_channels, si_bits,
                           si_rate, si_block_max, &h))
        return sh_flac_scan(data, len, si_channels, si_bits, si_rate,
                            si_block_max, out_offsets, cap);
    out_offsets[n++] = 0;
    int64_t expect_seq = h.seq + (h.variable ? h.block_size : 1);
    int64_t min_next = 6;  // a frame is at least a few bytes

    int64_t c = 0;
    const __m512i vff = _mm512_set1_epi8((char)0xFF);
    while (c + 65 <= len && n < cap) {
        __m512i blk = _mm512_loadu_si512(data + c);
        uint64_t m = _mm512_cmpeq_epi8_mask(blk, vff);
        while (m) {
            int b = __builtin_ctzll(m);
            m &= m - 1;
            int64_t p = c + b;
            if (p < min_next || p + 2 > len) continue;
            if ((data[p + 1] & 0xFC) != 0xF8) continue;
            int64_t avail = len - p < 16 ? len - p : 16;
            if (!parse_flac_header(data + p, avail, si_channels, si_bits,
                                   si_rate, si_block_max, &h))
                continue;
            if (h.seq != expect_seq) continue;
            out_offsets[n++] = p;
            expect_seq += h.variable ? h.block_size : 1;
            min_next = p + 6;
            if (n >= cap) break;
        }
        c += 64;
    }
    // Scalar tail.
    for (; c + 2 <= len && n < cap; c++) {
        if (data[c] != 0xFF || (data[c + 1] & 0xFC) != 0xF8) continue;
        if (c < min_next) continue;
        int64_t avail = len - c < 16 ? len - c : 16;
        if (!parse_flac_header(data + c, avail, si_channels, si_bits,
                               si_rate, si_block_max, &h))
            continue;
        if (h.seq != expect_seq) continue;
        out_offsets[n++] = c;
        expect_seq += h.variable ? h.block_size : 1;
        min_next = c + 6;
    }
    return n;
}

// Same contract as sh_flac_extract, but decodes 8 frames concurrently.
int32_t sh_flac_extract_simd(
    const uint8_t* data, int64_t data_len,
    const int64_t* offsets, const int64_t* sizes, int32_t n_frames,
    int32_t si_channels, int32_t si_bits, int32_t si_rate, int32_t si_block_max,
    int32_t max_ch, int32_t n_max,
    int32_t* res, int32_t* coefs, int32_t* order_out, int32_t* shift_out,
    int32_t* wasted_out, int32_t* block_out, int32_t* assign_out,
    int32_t* bps_out, int32_t* status) {
    FPROF_START(tot);
#ifdef SH_FLAC_PROF
    struct FProfTot {
        uint64_t t0;
        ~FProfTot() { g_fprof[0] += __rdtsc() - t0; }
    } _fpt{_t_tot};
#endif
    LaneSM lanes[8];
    int lane_frame[8];            // frame index owned by each lane (-1 idle)
    int32_t next_frame = 0;

    // SoA mirrors of the vector-core state.
    alignas(64) int64_t bp[8];     // absolute bit position in data
    alignas(64) int64_t outaddr[8];// absolute byte address of next residual
    alignas(64) int64_t vparam[8];
    alignas(64) int64_t vcnt[8];
    for (int i = 0; i < 8; i++) lane_frame[i] = -1;

    auto load_frame = [&](int li) -> bool {
        // Assign the next unprocessed frame to lane li and advance it to
        // its first partition; frames that error or complete without
        // entering a partition are finalized inline.
        for (;;) {
            if (next_frame >= n_frames) { lane_frame[li] = -1; return false; }
            int f = next_frame++;
            LaneSM& L = lanes[li];
            L.data = data;
            L.data_len = data_len;
            L.frame_off = offsets[f];
            L.br = BitReader(data + offsets[f], sizes[f]);
            L.fidx = f;
            status[f] = 0;
            if (!parse_flac_header(data + offsets[f],
                                   sizes[f] < 16 ? sizes[f] : 16,
                                   si_channels, si_bits, si_rate, si_block_max,
                                   &L.h)) { status[f] = -1; continue; }
            L.bps = L.h.bits ? L.h.bits : si_bits;
            L.bs = L.h.block_size;
            if (L.bs > n_max || L.h.n_channels > max_ch) { status[f] = -2; continue; }
            block_out[f] = L.bs;
            assign_out[f] = L.h.assignment;
            bps_out[f] = L.bps;
            for (int64_t skip = (int64_t)L.h.header_len * 8; skip > 0;) {
                int s = skip > 32 ? 32 : (int)skip;
                L.br.read(s);
                skip -= s;
            }
            L.ch = 0;
            L.in_residual = false;
            L.cnt_left = 0;
            int r = lane_advance(L, si_bits, max_ch, n_max, res, coefs,
                                 order_out, shift_out, wasted_out);
            if (r == 0) {
                lane_frame[li] = f;
                bp[li] = L.frame_off * 8 + L.br.bitpos;
                outaddr[li] = (int64_t)(uintptr_t)(L.lres + L.idx);
                vparam[li] = L.param;
                vcnt[li] = L.cnt_left;
                return true;
            }
            if (r < 0) { status[f] = r; continue; }
            // r == 1: frame had only constant/verbatim/escape content.
            int64_t consumed = (L.br.bits_read() + 7) / 8 + 2;
            if (consumed > (int64_t)sizes[f]) status[f] = -12;
            continue;
        }
    };

    for (int i = 0; i < 8; i++) load_frame(i);

    const __m512i vbyterev = _mm512_set_epi8(
        8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7,
        8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7,
        8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7,
        8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7);
    (void)vbyterev;  // per-64-bit byteswap via shuffle pattern below

    const __m512i bswap_pat = _mm512_broadcast_i32x4(_mm_set_epi8(
        8, 9, 10, 11, 12, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6, 7));

    for (;;) {
        __mmask8 active = 0;
        for (int i = 0; i < 8; i++)
            if (lane_frame[i] >= 0) active |= (1 << i);
        if (!active) break;

        // Vector core: run until some lane needs scalar service. The bit
        // window rides LEFT-aligned per lane (next bit = bit 63, zeros
        // below the cnt valid bits), refilled by gather only when below 26
        // bits, so the loop-carried chain is lzcnt -> shift, not a gather.
        __m512i vbp = _mm512_load_epi64(bp);
        __m512i vad = _mm512_load_epi64(outaddr);
        __m512i vpr = _mm512_load_epi64(vparam);
        __m512i vct = _mm512_load_epi64(vcnt);
        const __m512i vz = _mm512_setzero_si512();
        const __m512i v1 = _mm512_set1_epi64(1);
        const __m512i v8 = _mm512_set1_epi64(8);
        const __m512i v26 = _mm512_set1_epi64(26);
        const __m512i v63 = _mm512_set1_epi64(63);
        const __m512i v64 = _mm512_set1_epi64(64);
        const __m512i vall1 = _mm512_set1_epi64(-1);
        const __m512i vdlen = _mm512_set1_epi64(data_len);

        // Seed the windows; lanes too close to the buffer end for an
        // unguarded 8-byte load go straight to scalar service.
        __m512i vbyte = _mm512_srai_epi64(vbp, 3);
        __mmask8 run = _mm512_mask_cmple_epi64_mask(
            active, _mm512_add_epi64(vbyte, v8), vdlen);
        __mmask8 freeze = active & ~run;
        __m512i vw = _mm512_mask_i64gather_epi64(vz, run, vbyte, data, 1);
        vw = _mm512_shuffle_epi8(vw, bswap_pat);
        __m512i vsh = _mm512_and_epi64(vbp, _mm512_set1_epi64(7));
        __m512i topv = _mm512_sllv_epi64(vw, vsh);
        __m512i cntv = _mm512_sub_epi64(v64, vsh);
        __m512i posv = _mm512_add_epi64(vbyte, v8);

        FPROF_START(vb);
        // Seed-frozen lanes (buffer tail) wait for scalar service without
        // stalling the burst: healthy lanes keep decoding and the tail
        // lanes get serviced at the next (new-freeze) break.
        __mmask8 svc_pending = freeze;
        freeze = 0;
        if (run) {
            for (;;) {
                FPROF_COUNT(4, 1);
                FPROF_COUNT(5, __builtin_popcount(run));
                // When ANY lane runs low, top up EVERY running lane: with 8
                // lanes draining at independent phases a per-lane trigger
                // fires nearly every iteration (measured 88%) and the loop
                // still pays one gather per code; the all-lane top-up
                // phase-locks the lanes so the block fires every ~3
                // iterations. Early top-ups are safe — nbytes is per-lane
                // ((63-cnt)>>3, 0 for full windows).
                __mmask8 need = _mm512_mask_cmplt_epi64_mask(run, cntv, v26);
                if (need) {
                    FPROF_COUNT(6, 1);
                    __mmask8 tail = _mm512_mask_cmpgt_epi64_mask(
                        run, _mm512_add_epi64(posv, v8), vdlen);
                    __mmask8 tf = need & tail;  // starving at buffer tail
                    if (tf) {
                        freeze |= tf;
                        run &= ~tf;
                    }
                    __mmask8 rf = run & ~tail;
                    if (rf) {
                        __m512i w = _mm512_mask_i64gather_epi64(
                            vz, rf, posv, data, 1);
                        w = _mm512_shuffle_epi8(w, bswap_pat);
                        __m512i nbytes = _mm512_srli_epi64(
                            _mm512_sub_epi64(v63, cntv), 3);
                        __m512i nbits = _mm512_slli_epi64(nbytes, 3);
                        __m512i wk = _mm512_and_si512(
                            w, _mm512_sllv_epi64(
                                   vall1, _mm512_sub_epi64(v64, nbits)));
                        __m512i merged = _mm512_or_si512(
                            topv, _mm512_srlv_epi64(wk, cntv));
                        topv = _mm512_mask_mov_epi64(topv, rf, merged);
                        posv = _mm512_mask_add_epi64(posv, rf, posv,
                                                     nbytes);
                        cntv = _mm512_mask_add_epi64(cntv, rf, cntv,
                                                     nbits);
                    }
                }
                __m512i vlz = _mm512_lzcnt_epi64(topv);
                __m512i vneed =
                    _mm512_add_epi64(_mm512_add_epi64(vlz, v1), vpr);
                __mmask8 fit =
                    _mm512_mask_cmple_epi64_mask(run, vneed, cntv);
                __mmask8 unfit = run & ~fit;
                if (unfit) {
                    freeze |= unfit;
                    run &= ~unfit;
                }
                // value = (lz << param) | rem
                __m512i vtop =
                    _mm512_sllv_epi64(topv, _mm512_add_epi64(vlz, v1));
                __m512i vrem =
                    _mm512_srlv_epi64(vtop, _mm512_sub_epi64(v64, vpr));
                __m512i vval =
                    _mm512_or_epi64(_mm512_sllv_epi64(vlz, vpr), vrem);
                // zigzag: (v >> 1) ^ -(v & 1)
                __m512i vhalf = _mm512_srli_epi64(vval, 1);
                __m512i vsign =
                    _mm512_sub_epi64(vz, _mm512_and_epi64(vval, v1));
                __m512i vres = _mm512_xor_epi64(vhalf, vsign);
                _mm512_mask_i64scatter_epi32(nullptr, run, vad,
                                             _mm512_cvtepi64_epi32(vres), 1);
                topv = _mm512_mask_sllv_epi64(topv, run, topv, vneed);
                cntv = _mm512_mask_sub_epi64(cntv, run, cntv, vneed);
                vad = _mm512_mask_add_epi64(vad, run, vad,
                                            _mm512_set1_epi64(4));
                vct = _mm512_mask_sub_epi64(vct, run, vct, v1);
                __mmask8 done = _mm512_mask_cmple_epi64_mask(run, vct, vz);
                if (done) {
                    freeze |= done;
                    run &= ~done;
                }
                if (freeze) break;
                if (!run) break;
            }
        }
        freeze |= svc_pending;
        FPROF_STOP(vb, 1);
        FPROF_START(sv);
        // pos*8 - cnt reconstructs each lane's absolute bit position
        // exactly, for seeded and unseeded lanes alike.
        vbp = _mm512_mask_sub_epi64(vbp, active, _mm512_slli_epi64(posv, 3),
                                    cntv);
        _mm512_store_epi64(bp, vbp);
        _mm512_store_epi64(outaddr, vad);
        _mm512_store_epi64(vcnt, vct);

        // Scalar service for the frozen lanes only: partition exhausted,
        // long unary, or near end-of-buffer.
        for (int i = 0; i < 8; i++) {
            if (lane_frame[i] < 0 || !((freeze >> i) & 1)) continue;
            LaneSM& L = lanes[i];
            // Write back vector state.
            L.br.bitpos = bp[i] - L.frame_off * 8;
            L.idx = (int)(((int32_t*)(uintptr_t)outaddr[i]) - L.lres);
            L.cnt_left = (int)vcnt[i];
            if (L.cnt_left > 0) {
                // Blocked on a long code or buffer tail: one scalar step.
                lane_scalar_code(L);
            }
            if (L.cnt_left > 0 && !L.br.error) {
                bp[i] = L.frame_off * 8 + L.br.bitpos;
                outaddr[i] = (int64_t)(uintptr_t)(L.lres + L.idx);
                vcnt[i] = L.cnt_left;
                continue;
            }
            // Partition done (or error): advance the state machine.
            int f = lane_frame[i];
            int r = L.br.error ? -11
                               : lane_advance(L, si_bits, max_ch, n_max, res,
                                              coefs, order_out, shift_out,
                                              wasted_out);
            if (r == 0) {
                bp[i] = L.frame_off * 8 + L.br.bitpos;
                outaddr[i] = (int64_t)(uintptr_t)(L.lres + L.idx);
                vparam[i] = L.param;
                vcnt[i] = L.cnt_left;
                continue;
            }
            if (r < 0) status[f] = r;
            else {
                int64_t consumed = (L.br.bits_read() + 7) / 8 + 2;
                if (consumed > (int64_t)sizes[f]) status[f] = -12;
            }
            load_frame(i);
        }
        FPROF_STOP(sv, 2);
    }
    return 0;
}

}  // extern "C"

#else
extern "C" {
int32_t sh_flac_has_simd(void) { return 0; }
}
#endif
