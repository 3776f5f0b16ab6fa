"""TPU (jax) FLAC dense-stage tests: the batched LPC scan and decorrelation
must be bit-exact against the scalar numpy/Python oracle, and the full
device pipeline must reproduce fixture files exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from symphonia_tpu.codecs.flac import (
    FlacDecoder,
    lpc_reconstruct,
    parse_frame,
    reconstruct_frame,
)
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.flac import FlacReader
from symphonia_tpu.ops.flac_dense import (
    decode_packed,
    lpc_reconstruct_batch,
    pack_parsed_frames,
)
from symphonia_tpu.ops.i64emu import (
    i64_from_i32,
    i64_mul_i32,
    i64_shr_to_i32,
    i64_sum_products,
)

from flac_builder import build_flac_file, random_walk


class TestI64Emu:
    def test_mul_exact_random(self):
        rng = np.random.default_rng(0)
        a = rng.integers(-(2**31), 2**31, size=2000, dtype=np.int64).astype(np.int32)
        b = rng.integers(-(2**31), 2**31, size=2000, dtype=np.int64).astype(np.int32)
        hi, lo = i64_mul_i32(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(hi, dtype=np.int64) * (1 << 32) + np.asarray(lo, dtype=np.uint32)
        expect = a.astype(np.int64) * b.astype(np.int64)
        np.testing.assert_array_equal(got, expect)

    def test_mul_edge_cases(self):
        cases = [
            (0, 0), (1, 1), (-1, -1), (-1, 1),
            (2**31 - 1, 2**31 - 1), (-(2**31), -(2**31)),
            (-(2**31), 2**31 - 1), (0x7FFF, -0x8000),
        ]
        a = np.array([c[0] for c in cases], dtype=np.int64).astype(np.int32)
        b = np.array([c[1] for c in cases], dtype=np.int64).astype(np.int32)
        hi, lo = i64_mul_i32(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(hi, dtype=np.int64) * (1 << 32) + np.asarray(lo, dtype=np.uint32)
        np.testing.assert_array_equal(got, a.astype(np.int64) * b.astype(np.int64))

    def test_sum_products_flac_ranges(self):
        rng = np.random.default_rng(1)
        L, O = 64, 32
        c = rng.integers(-(2**14), 2**14, size=(L, O)).astype(np.int32)
        x = rng.integers(-(2**25), 2**25, size=(L, O)).astype(np.int32)
        hi, lo = i64_sum_products(jnp.asarray(c), jnp.asarray(x), axis=1)
        got = np.asarray(hi, dtype=np.int64) * (1 << 32) + np.asarray(lo, dtype=np.uint32)
        expect = (c.astype(np.int64) * x.astype(np.int64)).sum(axis=1)
        np.testing.assert_array_equal(got, expect)

    def test_shr(self):
        rng = np.random.default_rng(2)
        vals = rng.integers(-(2**45), 2**45, size=500)
        shifts = rng.integers(0, 31, size=500)
        # Keep only cases where result fits int32 (the FLAC guarantee).
        res = vals >> shifts
        mask = (res >= -(2**31)) & (res < 2**31)
        vals, shifts, res = vals[mask], shifts[mask], res[mask]
        hi = (vals >> 32).astype(np.int32)
        lo = (vals & 0xFFFFFFFF).astype(np.uint32)
        got = i64_shr_to_i32(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(shifts.astype(np.int32))
        )
        np.testing.assert_array_equal(np.asarray(got), res.astype(np.int32))


class TestLpcScanVsOracle:
    def test_random_lpc_lanes(self):
        rng = np.random.default_rng(3)
        L, N = 16, 256
        res = np.zeros((L, N), dtype=np.int32)
        coefs = np.zeros((L, 32), dtype=np.int32)
        orders = np.zeros(L, dtype=np.int32)
        shifts = np.zeros(L, dtype=np.int32)
        oracle = np.zeros((L, N), dtype=np.int64)
        for l in range(L):
            k = int(rng.integers(1, 33))
            sh = int(rng.integers(0, 15))
            c = rng.integers(-(2**14), 2**14, size=k)
            warm = rng.integers(-(2**15), 2**15, size=k)
            # Small residuals keep the signal in 16-bit range (conformant
            # streams guarantee bounded samples).
            r = rng.integers(-50, 50, size=N - k)
            # Clamp the signal by redoing forward prediction from a bounded
            # signal instead: generate x bounded, compute residual exactly.
            x = np.clip(np.cumsum(rng.integers(-100, 101, size=N)), -30000, 30000)
            x[:k] = warm
            r = np.empty(N - k, dtype=np.int64)
            for i in range(k, N):
                acc = sum(int(c[j]) * int(x[i - 1 - j]) for j in range(k))
                r[i - k] = int(x[i]) - (acc >> sh)
            orders[l] = k
            shifts[l] = sh
            coefs[l, :k] = c
            res[l, :k] = warm
            res[l, k:] = r
            oracle[l] = lpc_reconstruct(x[:k], r, c, sh)
        got = lpc_reconstruct_batch(
            jnp.asarray(res), jnp.asarray(coefs), jnp.asarray(orders),
            jnp.asarray(shifts), N,
        )
        np.testing.assert_array_equal(np.asarray(got), oracle.astype(np.int32))


class TestDevicePipelineVsOracle:
    @pytest.mark.parametrize(
        "mode,kind,kw",
        [
            ("independent", "fixed", dict(order=2)),
            ("mid_side", "fixed", dict(order=3)),
            ("left_side", "lpc", dict(lpc_coefs=[700, -300, 100, 22], lpc_shift=9, lpc_precision=12)),
            ("right_side", "lpc", dict(lpc_coefs=list(range(1, 13)), lpc_shift=8, lpc_precision=12)),
            ("mid_side", "verbatim", dict()),
            ("independent", "constant", dict()),
        ],
    )
    def test_full_pipeline(self, mode, kind, kw):
        ch = random_walk(2048, 16, seed=hash((mode, kind)) % 2**31, ch=2)
        if kind == "constant":
            ch = [np.full(2048, 55, np.int64), np.full(2048, -7, np.int64)]
        data = build_flac_file(ch, block_size=512, stereo_mode=mode, kind=kind, **kw)
        reader = FlacReader(MediaSourceStream(data))
        si = reader.stream_info
        frames = []
        pkts = []
        while True:
            p = reader.next_packet()
            if p is None:
                break
            pkts.append(p)
            frames.append(parse_frame(p.data, si))
        # Oracle
        oracle = np.concatenate([reconstruct_frame(f) for f in frames], axis=1)
        # Device
        packed = pack_parsed_frames(frames)
        out = decode_packed(packed)
        got = np.concatenate(
            [out[i, :, : frames[i].header.block_size] for i in range(len(frames))],
            axis=1,
        )
        np.testing.assert_array_equal(got, oracle.astype(np.int32))
        np.testing.assert_array_equal(got, np.stack(ch).astype(np.int32))

    def test_wasted_bits_device(self):
        ch = [c << 3 for c in random_walk(1024, 13, seed=77)]
        data = build_flac_file(ch, block_size=256, kind="fixed", order=2, wasted=3)
        reader = FlacReader(MediaSourceStream(data))
        frames = []
        while True:
            p = reader.next_packet()
            if p is None:
                break
            frames.append(parse_frame(p.data, reader.stream_info))
        packed = pack_parsed_frames(frames)
        out = decode_packed(packed)
        got = np.concatenate(
            [out[i, :, : frames[i].header.block_size] for i in range(len(frames))],
            axis=1,
        )
        np.testing.assert_array_equal(got[0], np.asarray(ch[0], dtype=np.int32))


class TestRiceDeviceKernel:
    """Device FLAC Rice entropy prototype (ops/rice_device.py, VERDICT r1
    #4 measurement artifact): kernel vs scalar oracle, exact."""

    def test_kernel_matches_oracle_and_values(self):
        from symphonia_tpu.ops.rice_device import (make_test_streams,
                                                   pack_bits_u32,
                                                   rice_decode_lanes,
                                                   rice_decode_oracle)

        B, n, k = 16, 64, 4
        data, cur, vals = make_test_streams(B, n, k, seed=3)
        out, _ = rice_decode_lanes(pack_bits_u32(data),
                                   np.asarray(cur, np.int32),
                                   np.full(B, k, np.int32), n)
        np.testing.assert_array_equal(np.asarray(out), vals)
        oracle = rice_decode_oracle(data, cur, np.full(B, k), n)
        np.testing.assert_array_equal(oracle, vals)
