// Ceiling test for 8-lane AVX-512 VLC decode WITH in-vector run advance:
// like vlc_simd8.cpp plus, per iteration, finished lanes load their next
// (start, end, table) triple from per-lane pre-flattened run plans via
// masked gathers (runs are ~10 codewords, so this block runs nearly every
// iteration in steady state).
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
    // Pre-flattened pair-run plan per lane: (start, end, tblofs) triples.
    const int PM = 512;
    static int32_t plan_start[8 * 512], plan_end[8 * 512], plan_tbl[8 * 512];
    for (int l = 0; l < 8; l++)
        for (int k = 0; k < PM; k++) {
            plan_start[l * PM + k] = (k * 10) & 1023;
            plan_end[l * PM + k] = ((k * 10) & 1023) + 8 + (k % 5) * 2;
            plan_tbl[l * PM + k] = ((l + k) % 11) * 4096;
        }
    __m512i pri = _mm512_setzero_si512();
    __m512i cur_i, cur_end;
    {
        int64_t a[8], b[8];
        for (int l = 0; l < 8; l++) { a[l] = 0; b[l] = 8; }
        cur_i = _mm512_loadu_si512(a);
        cur_end = _mm512_loadu_si512(b);
    }
    __m512i lanebase;
    {
        int64_t lb[8];
        for (int l = 0; l < 8; l++) lb[l] = l * PM;
        lanebase = _mm512_loadu_si512(lb);
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
        alignas(64) int64_t i_a[8];
        _mm512_store_si512(i_a, cur_i);
        for (int l = 0; l < 8; l++) {
            out[l][i_a[l] & 4095] = (int16_t)xs_a[l];
            out[l][(i_a[l] + 1) & 4095] = (int16_t)ys_a[l];
        }
        // In-vector run advance for lanes whose run just finished.
        cur_i = _mm512_add_epi64(cur_i, _mm512_set1_epi64(2));
        __mmask8 fin = _mm512_cmpge_epi64_mask(cur_i, cur_end);
        if (fin) {
            pri = _mm512_mask_add_epi64(pri, fin, pri, _mm512_set1_epi64(1));
            __m512i pidx = _mm512_add_epi64(lanebase, pri);
            __m256i ns = _mm512_mask_i64gather_epi32(_mm256_setzero_si256(), fin, pidx, plan_start, 4);
            __m256i ne = _mm512_mask_i64gather_epi32(_mm256_setzero_si256(), fin, pidx, plan_end, 4);
            __m256i nt = _mm512_mask_i64gather_epi32(_mm256_setzero_si256(), fin, pidx, plan_tbl, 4);
            cur_i = _mm512_mask_mov_epi64(cur_i, fin, _mm512_cvtepi32_epi64(ns));
            cur_end = _mm512_mask_mov_epi64(cur_end, fin, _mm512_cvtepi32_epi64(ne));
            tblofs = _mm512_mask_mov_epi64(tblofs, fin, _mm512_cvtepi32_epi64(nt));
            // wrap pri to stay inside the synthetic plan
            pri = _mm512_and_si512(pri, _mm512_set1_epi64(PM - 1));
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
