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
        if (crc16_buf(data + prev, c - 2 - prev) != expect) continue;
        out_offsets[n++] = c;
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
    static const int8_t kFixedCoefs[5][4] = {
        {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

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

}  // extern "C"
