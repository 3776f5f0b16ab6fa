// Ceiling test: decode N synthetic pair codewords from (a) one stream with
// the scalar loop, (b) 4/8 interleaved streams with register-resident state.
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <chrono>
#include <vector>
using namespace std;

static int32_t tbl[4096];
static float pow43t[8192];

int main() {
    // Fake fast table: entry for each 12-bit prefix; codeword lens 4..9.
    for (int i = 0; i < 4096; i++) {
        int len = 4 + (i % 6);
        int nz = i % 3;
        int xa = i % 13, ya = (i >> 4) % 13;
        tbl[i] = (len << 27) | (nz << 25) | (xa << 19) | (ya << 12);
    }
    for (int i = 0; i < 8192; i++) pow43t[i] = (float)i;
    const int NS = 8;
    const size_t BYTES = 1 << 20;
    vector<vector<uint8_t>> streams(NS, vector<uint8_t>(BYTES + 16));
    for (auto& s : streams) for (auto& b : s) b = rand() & 255;
    vector<float> out(1 << 16);
    const long NCW = 1000000;

    auto scalar = [&](int si) {
        uint64_t buf = 0; int cnt = 0; int64_t pos = 0;
        const uint8_t* data = streams[si].data();
        float* o = out.data();
        double t0 = chrono::duration<double>(chrono::steady_clock::now().time_since_epoch()).count();
        for (long n = 0; n < NCW; n++) {
            if (cnt < 32) {
                int nb = (63 - cnt) >> 3;
                uint64_t w; memcpy(&w, data + pos, 8);
                w = __builtin_bswap64(w);
                buf = (buf << (nb * 8)) | (w >> (64 - nb * 8));
                pos += nb; cnt += nb * 8;
                if (pos > (int64_t)BYTES - 16) pos = 0;
            }
            int32_t e = tbl[(uint32_t)(buf >> (cnt - 12)) & 4095];
            int len = (e >> 27) & 15, nz = (e >> 25) & 3;
            cnt -= len + nz;
            uint32_t signs = (uint32_t)(buf >> cnt) & ((1u << nz) - 1);
            buf &= (1ULL << cnt) - 1;
            int xa = (e >> 19) & 63, ya = (e >> 12) & 63;
            uint32_t xs = ((e >> 18) & 1) | (((signs >> ((nz - 1) & 31)) & 1u) & (uint32_t)(xa != 0));
            uint32_t ys = ((e >> 11) & 1) | ((signs & 1u) & (uint32_t)(ya != 0));
            float vx = pow43t[xa] * 1.5f, vy = pow43t[ya] * 1.5f;
            uint32_t bx, by; memcpy(&bx, &vx, 4); memcpy(&by, &vy, 4);
            bx ^= xs << 31; by ^= ys << 31;
            memcpy(&o[(2 * n) & 65534], &bx, 4);
            memcpy(&o[(2 * n + 1) & 65534], &by, 4);
        }
        double t1 = chrono::duration<double>(chrono::steady_clock::now().time_since_epoch()).count();
        return (t1 - t0) / NCW * 2.1e9;  // cycles per codeword @2.1GHz
    };

    // interleaved L lanes, register state via locals array (compiler unrolls)
    auto inter = [&](int L) {
        uint64_t buf[8] = {0}; int cnt[8] = {0}; int64_t pos[8] = {0};
        const uint8_t* data[8];
        for (int k = 0; k < 8; k++) data[k] = streams[k].data();
        float* o = out.data();
        double t0 = chrono::duration<double>(chrono::steady_clock::now().time_since_epoch()).count();
        for (long n = 0; n < NCW / L; n++) {
            #pragma GCC unroll 8
            for (int k = 0; k < L; k++) {
                if (cnt[k] < 32) {
                    int nb = (63 - cnt[k]) >> 3;
                    uint64_t w; memcpy(&w, data[k] + pos[k], 8);
                    w = __builtin_bswap64(w);
                    buf[k] = (buf[k] << (nb * 8)) | (w >> (64 - nb * 8));
                    pos[k] += nb; cnt[k] += nb * 8;
                    if (pos[k] > (int64_t)BYTES - 16) pos[k] = 0;
                }
                int32_t e = tbl[(uint32_t)(buf[k] >> (cnt[k] - 12)) & 4095];
                int len = (e >> 27) & 15, nz = (e >> 25) & 3;
                cnt[k] -= len + nz;
                uint32_t signs = (uint32_t)(buf[k] >> cnt[k]) & ((1u << nz) - 1);
                buf[k] &= (1ULL << cnt[k]) - 1;
                int xa = (e >> 19) & 63, ya = (e >> 12) & 63;
                uint32_t xs = ((e >> 18) & 1) | (((signs >> ((nz - 1) & 31)) & 1u) & (uint32_t)(xa != 0));
                uint32_t ys = ((e >> 11) & 1) | ((signs & 1u) & (uint32_t)(ya != 0));
                float vx = pow43t[xa] * 1.5f, vy = pow43t[ya] * 1.5f;
                uint32_t bx, by; memcpy(&bx, &vx, 4); memcpy(&by, &vy, 4);
                bx ^= xs << 31; by ^= ys << 31;
                memcpy(&o[(2 * (n * L + k)) & 65534], &bx, 4);
                memcpy(&o[(2 * (n * L + k) + 1) & 65534], &by, 4);
            }
        }
        double t1 = chrono::duration<double>(chrono::steady_clock::now().time_since_epoch()).count();
        return (t1 - t0) / NCW * 2.1e9;
    };

    double best = 1e9; for (int r = 0; r < 5; r++) { double c = scalar(0); if (c < best) best = c; }
    printf("scalar        : %.1f cyc/cw\n", best);
    for (int L : {2, 4, 6, 8}) {
        best = 1e9; for (int r = 0; r < 5; r++) { double c = inter(L); if (c < best) best = c; }
        printf("interleaved %d : %.1f cyc/cw\n", L, best);
    }
    return 0;
}
