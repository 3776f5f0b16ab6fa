// Ceiling test for 8-lane AVX-512 VLC decode: per iteration each of 8 lanes
// decodes one pair codeword: gather window refill + table gather + vector
// field extraction + int16 emit via scatter-free transpose (store to lane
// scratch via 8 scalar extracts — the realistic cheap option).
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <chrono>
#include <vector>
#include <immintrin.h>
using namespace std;

static int32_t tbl[11*4096];  // all books concatenated (176 KB, L2)

int main() {
    for (int i = 0; i < 11*4096; i++) {
        int len = 4 + (i % 6), nz = i % 3;
        int xa = i % 13, ya = (i >> 4) % 13;
        tbl[i] = (len << 27) | (nz << 25) | (xa << 19) | (ya << 12);
    }
    // per-lane book table offsets (lanes decode different books)
    __m512i tblofs;
    {
        int64_t o[8];
        for (int l = 0; l < 8; l++) o[l] = (int64_t)((l * 7) % 11) * 4096;
        tblofs = _mm512_loadu_si512(o);
    }
    const size_t BYTES = 1 << 20;
    vector<uint8_t> stream(8 * (BYTES + 16));
    for (auto& b : stream) b = rand() & 255;
    alignas(64) int16_t out[8][4096];
    const long NCW = 1000000;  // total codewords (8 lanes x NCW/8 steps)

    // lane state vectors
    __m512i buf = _mm512_setzero_si512();            // 8 x u64 windows
    __m512i cnt = _mm512_setzero_si512();            // 8 x i64 bit counts
    __m512i pos;                                      // 8 x i64 byte pos
    {
        int64_t p0[8];
        for (int l = 0; l < 8; l++) p0[l] = (int64_t)l * BYTES;
        pos = _mm512_loadu_si512(p0);
    }

    auto t0 = chrono::steady_clock::now();
    const __m512i v32 = _mm512_set1_epi64(32);
    const __m512i v63s = _mm512_set1_epi64(63);
    const __m512i mask12 = _mm512_set1_epi64(4095);
    for (long n = 0; n < NCW / 8; n++) {
        // refill lanes with cnt < 32: gather 8 bytes at pos, bswap, merge
        __mmask8 need = _mm512_cmplt_epi64_mask(cnt, v32);
        if (need) {
            __m512i w = _mm512_mask_i64gather_epi64(_mm512_setzero_si512(), need,
                                                    pos, stream.data(), 1);
            // bswap64 via shuffle_epi8
            const __m512i bsw = _mm512_broadcast_i32x4(_mm_set_epi8(8,9,10,11,12,13,14,15,0,1,2,3,4,5,6,7));
            w = _mm512_shuffle_epi8(w, bsw);
            __m512i nbytes = _mm512_srli_epi64(_mm512_sub_epi64(v63s, cnt), 3);
            __m512i nbits = _mm512_slli_epi64(nbytes, 3);
            __m512i merged = _mm512_or_si512(_mm512_sllv_epi64(buf, nbits),
                                             _mm512_srlv_epi64(w, _mm512_sub_epi64(_mm512_set1_epi64(64), nbits)));
            buf = _mm512_mask_mov_epi64(buf, need, merged);
            pos = _mm512_mask_add_epi64(pos, need, pos, nbytes);
            cnt = _mm512_mask_add_epi64(cnt, need, cnt, nbits);
        }
        // idx = (buf >> (cnt-12)) & 4095
        __m512i sh = _mm512_sub_epi64(cnt, _mm512_set1_epi64(12));
        __m512i idx = _mm512_and_si512(_mm512_srlv_epi64(buf, sh), mask12);
        // gather table entries (8 x i32 via i64 indices)
        __m256i e = _mm512_i64gather_epi32(_mm512_add_epi64(idx, tblofs), tbl, 4);
        __m512i e64 = _mm512_cvtepi32_epi64(e);
        // len+nz consume
        __m512i len = _mm512_and_si512(_mm512_srli_epi64(e64, 27), _mm512_set1_epi64(15));
        __m512i nz  = _mm512_and_si512(_mm512_srli_epi64(e64, 25), _mm512_set1_epi64(3));
        cnt = _mm512_sub_epi64(cnt, _mm512_add_epi64(len, nz));
        // signs
        __m512i signs = _mm512_and_si512(_mm512_srlv_epi64(buf, cnt),
                                         _mm512_sub_epi64(_mm512_sllv_epi64(_mm512_set1_epi64(1), nz), _mm512_set1_epi64(1)));
        buf = _mm512_and_si512(buf, _mm512_sub_epi64(_mm512_sllv_epi64(_mm512_set1_epi64(1), cnt), _mm512_set1_epi64(1)));
        __m512i xa = _mm512_and_si512(_mm512_srli_epi64(e64, 19), _mm512_set1_epi64(63));
        __m512i ya = _mm512_and_si512(_mm512_srli_epi64(e64, 12), _mm512_set1_epi64(63));
        // apply stream signs branchlessly (approximate op count)
        __m512i xs = _mm512_and_si512(_mm512_srlv_epi64(signs, _mm512_sub_epi64(nz, _mm512_set1_epi64(1))), _mm512_set1_epi64(1));
        __m512i ys = _mm512_and_si512(signs, _mm512_set1_epi64(1));
        __m512i xv = _mm512_sub_epi64(_mm512_xor_si512(xa, _mm512_sub_epi64(_mm512_setzero_si512(), xs)), _mm512_sub_epi64(_mm512_setzero_si512(), xs));
        __m512i yv = _mm512_sub_epi64(_mm512_xor_si512(ya, _mm512_sub_epi64(_mm512_setzero_si512(), ys)), _mm512_sub_epi64(_mm512_setzero_si512(), ys));
        // emit: extract 8 lanes' (x, y) to per-lane buffers (scalar stores)
        alignas(64) int64_t xs_a[8], ys_a[8];
        _mm512_store_si512(xs_a, xv);
        _mm512_store_si512(ys_a, yv);
        int o = (int)(n & 2047);
        for (int l = 0; l < 8; l++) {
            out[l][2 * o] = (int16_t)xs_a[l];
            out[l][2 * o + 1] = (int16_t)ys_a[l];
        }
        // Wrap each lane's cursor within its own 512 KB region (keep the
        // per-lane base bits so gathers stay on independent streams).
        {
            const __m512i basebits = _mm512_set_epi64(
                7ll << 20, 6ll << 20, 5ll << 20, 4ll << 20,
                3ll << 20, 2ll << 20, 1ll << 20, 0);
            pos = _mm512_or_si512(basebits,
                                  _mm512_and_si512(pos, _mm512_set1_epi64(0x7FFFF)));
        }
    }
    auto t1 = chrono::steady_clock::now();
    double dt = chrono::duration<double>(t1 - t0).count();
    volatile int16_t sink = out[0][0];
    (void)sink;
    printf("simd8: %.2f cyc/cw @2.1GHz (%.1f Mcw/s)\n", dt / NCW * 2.1e9, NCW / dt / 1e6);
    return 0;
}
