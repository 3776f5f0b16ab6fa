"""MP1/MP2 decode tests: crafted bitstreams with known quantized samples,
checked against an independent spec-formula dequantizer + direct polyphase
synthesis."""

import numpy as np
import pytest

from symphonia_tpu.codecs.mpa import MpaDecoder
from symphonia_tpu.codecs.mpa_common import parse_header, tables
from symphonia_tpu.core.audio import Channels
from symphonia_tpu.core.codecs import AudioCodecParameters
from symphonia_tpu.core.packet import Packet
from symphonia_tpu.ops import mp3_dense as md

from mp3_builder import BitWriter


def direct_synthesis(subband: np.ndarray, state_v=None):
    """Direct ISO polyphase (the validated spec loop from test_mp3)."""
    N = md.polyphase_matrix()
    D = md.synthesis_window()
    T = subband.shape[1]
    v_hist = state_v if state_v is not None else np.zeros((16, 64), np.float32)
    out = []
    S = subband.T
    for t in range(T):
        v_hist = np.roll(v_hist, 1, axis=0)
        v_hist[0] = N @ S[t]
        o = np.zeros(32, np.float32)
        for k in range(16):
            sel = v_hist[k][:32] if k % 2 == 0 else v_hist[k][32:]
            o += sel * D[k]
        out.append(o)
    return np.concatenate(out), v_hist


def build_l1_frame(raws, allocs, sf_indices, n_ch=1):
    """Layer 1 mono/stereo frame. raws[ch][sb][s], allocs[ch][sb] in bits
    (0 or 2..15), sf_indices[ch][sb]."""
    bw = BitWriter()
    for sb in range(32):
        for ch in range(n_ch):
            bits = allocs[ch][sb]
            bw.write(bits - 1 if bits else 0, 4)
    for sb in range(32):
        for ch in range(n_ch):
            if allocs[ch][sb]:
                bw.write(sf_indices[ch][sb], 6)
    for s in range(12):
        for sb in range(32):
            for ch in range(n_ch):
                bits = allocs[ch][sb]
                if bits:
                    bw.write(raws[ch][sb][s], bits)
    body = bw.pad_to_bytes()
    # Header: MPEG1 layer 1, 448kbps@44100 -> frame size 4*(12*448000/44100)=484
    hdr = bytes([0xFF, 0xFF, (13 << 4) | (0 << 2), 0xC0 if n_ch == 1 else 0x00])
    h = parse_header(int.from_bytes(hdr, "big"))
    assert h.layer == 1
    frame = hdr + body
    assert len(frame) <= h.frame_size, (len(frame), h.frame_size)
    return frame + bytes(h.frame_size - len(frame)), h


def l1_dequant(raw, bits):
    inv = raw ^ (1 << (bits - 1))
    a = inv - (1 << bits) if inv & (1 << (bits - 1)) else inv
    f = (2**bits / (2**bits - 1)) * 2.0 ** (-bits + 1)
    return f * (a + 1)


class TestLayer1:
    def test_crafted_frame(self):
        rng = np.random.default_rng(0)
        allocs = [[0] * 32]
        raws = [[[0] * 12 for _ in range(32)]]
        sfi = [[0] * 32]
        sf_table = tables()["layer12_scalefactors"]
        for sb in range(0, 12):
            bits = int(rng.integers(2, 16))
            allocs[0][sb] = bits
            sfi[0][sb] = int(rng.integers(0, 40))
            for s in range(12):
                raws[0][sb][s] = int(rng.integers(0, 1 << bits))
        frame, h = build_l1_frame(raws, allocs, sfi)

        params = AudioCodecParameters(codec="mp1", sample_rate=44100,
                                      channels=Channels.from_count(1))
        dec = MpaDecoder(params)
        out = dec.decode(Packet(0, 0, 384, frame)).planes()

        # Independent expectation.
        sub = np.zeros((32, 12), np.float32)
        for sb in range(32):
            bits = allocs[0][sb]
            if bits:
                for s in range(12):
                    sub[sb, s] = float(sf_table[sfi[0][sb]]) * l1_dequant(
                        raws[0][sb][s], bits
                    )
        expect, _ = direct_synthesis(sub)
        np.testing.assert_allclose(out[0], expect, atol=1e-5)

    def test_stereo(self):
        rng = np.random.default_rng(1)
        allocs = [[0] * 32, [0] * 32]
        raws = [[[0] * 12 for _ in range(32)] for _ in range(2)]
        sfi = [[0] * 32, [0] * 32]
        for ch in range(2):
            for sb in range(4):
                allocs[ch][sb] = 4
                sfi[ch][sb] = 10 + ch
                for s in range(12):
                    raws[ch][sb][s] = int(rng.integers(0, 16))
        frame, h = build_l1_frame(raws, allocs, sfi, n_ch=2)
        params = AudioCodecParameters(codec="mp1", sample_rate=44100,
                                      channels=Channels.from_count(2))
        dec = MpaDecoder(params)
        out = dec.decode(Packet(0, 0, 384, frame))
        assert out.planes().shape == (2, 384)
        assert np.abs(out.planes()).max() > 0


def build_l2_frame(alloc_vals, sf0, samples_raw, grouping_cw=None):
    """Layer 2 mono frame at 384kbps/44100 (sb_info row 1, sblimit 30).

    alloc_vals[sb]: allocation index; scalefactors all scfsi=2 (one index
    per subband); samples_raw[(sb, gr)] -> list of 3 raws or a grouped
    codeword.
    """
    from symphonia_tpu.codecs.mpa_layer12 import QUANT_CLASS, SB_INFO, SB_QUANT_INFO

    sblimit, rows = SB_INFO[1]
    bw = BitWriter()
    for sb in range(sblimit):
        nbal = SB_QUANT_INFO[rows[sb]][0]
        bw.write(alloc_vals[sb], nbal)
    for sb in range(sblimit):
        if alloc_vals[sb]:
            bw.write(2, 2)  # scfsi = 2: one scalefactor for all
    for sb in range(sblimit):
        if alloc_vals[sb]:
            bw.write(sf0[sb], 6)
    for gr in range(12):
        for sb in range(sblimit):
            ci = alloc_vals[sb]
            if not ci:
                continue
            c, d, grouping, bits, nlevels = QUANT_CLASS[SB_QUANT_INFO[rows[sb]][1][ci]]
            if grouping:
                bw.write(samples_raw[(sb, gr)], bits)
            else:
                for r in samples_raw[(sb, gr)]:
                    bw.write(r, bits)
    body = bw.pad_to_bytes()
    hdr = bytes([0xFF, 0xFD, (14 << 4) | 0, 0xC0])
    h = parse_header(int.from_bytes(hdr, "big"))
    assert h.layer == 2 and h.duration == 1152
    frame = hdr + body
    assert len(frame) <= h.frame_size
    return frame + bytes(h.frame_size - len(frame)), h


class TestLayer2:
    def test_crafted_frame_with_grouping(self):
        from symphonia_tpu.codecs.mpa_layer12 import QUANT_CLASS, SB_INFO, SB_QUANT_INFO

        rng = np.random.default_rng(2)
        sblimit, rows = SB_INFO[1]
        sf_table = tables()["layer12_scalefactors"]
        alloc_vals = [0] * sblimit
        sf0 = [0] * sblimit
        samples_raw = {}
        for sb in [0, 1, 5, 12, 23]:
            nbal, classes = SB_QUANT_INFO[rows[sb]]
            alloc_vals[sb] = int(rng.integers(1, 1 << nbal))
            sf0[sb] = int(rng.integers(0, 40))
            c, d, grouping, bits, nlevels = QUANT_CLASS[classes[alloc_vals[sb]]]
            for gr in range(12):
                if grouping:
                    samples_raw[(sb, gr)] = int(rng.integers(0, nlevels**3))
                else:
                    samples_raw[(sb, gr)] = [
                        int(rng.integers(0, nlevels + 1)) for _ in range(3)
                    ]
        frame, h = build_l2_frame(alloc_vals, sf0, samples_raw)

        params = AudioCodecParameters(codec="mp2", sample_rate=44100,
                                      channels=Channels.from_count(1))
        dec = MpaDecoder(params)
        out = dec.decode(Packet(0, 0, 1152, frame)).planes()

        # Independent expectation.
        sub = np.zeros((32, 36), np.float32)
        for sb in range(sblimit):
            ci = alloc_vals[sb]
            if not ci:
                continue
            c, d, grouping, bits, nlevels = QUANT_CLASS[SB_QUANT_INFO[rows[sb]][1][ci]]
            beff = {3: 2, 5: 3, 9: 4}[nlevels] if grouping else bits
            for gr in range(12):
                if grouping:
                    cw = samples_raw[(sb, gr)]
                    raw3 = [cw % nlevels, (cw // nlevels) % nlevels,
                            cw // nlevels // nlevels]
                else:
                    raw3 = samples_raw[(sb, gr)]
                for i, r in enumerate(raw3):
                    inv = r ^ (1 << (beff - 1))
                    a = inv - (1 << beff) if inv & (1 << (beff - 1)) else inv
                    s = a / float(1 << (beff - 1))
                    sub[sb, 3 * gr + i] = float(sf_table[sf0[sb]]) * c * (s + d)
        expect, _ = direct_synthesis(sub)
        np.testing.assert_allclose(out[0], expect, atol=1e-5)


class TestNativeL12Parity:
    """The native bitstream stage (native/mpa_layer12.cpp) must match the
    Python loops bit-for-bit across quantization classes and scfsi modes."""

    def test_l2_matches_python(self):
        from symphonia_tpu import native as nat
        from symphonia_tpu.codecs.mpa_layer12 import (QUANT_CLASS, SB_INFO,
                                                      SB_QUANT_INFO)

        if not nat.available():
            pytest.skip("native library unavailable")
        orig = nat.mpa_l12_extract
        try:
            for seed in range(6):
                rng = np.random.default_rng(seed)
                sblimit, rows = SB_INFO[1]
                alloc_vals = [0] * sblimit
                sf0 = [0] * sblimit
                samples_raw = {}
                for sb in range(sblimit):
                    nbal, classes = SB_QUANT_INFO[rows[sb]]
                    alloc_vals[sb] = int(rng.integers(0, 1 << nbal))
                    sf0[sb] = int(rng.integers(0, 60))
                    if not alloc_vals[sb]:
                        continue
                    _, _, grouping, bits, nlevels = QUANT_CLASS[
                        SB_QUANT_INFO[rows[sb]][1][alloc_vals[sb]]]
                    for gr in range(12):
                        if grouping:
                            samples_raw[(sb, gr)] = int(
                                rng.integers(0, nlevels ** 3))
                        else:
                            samples_raw[(sb, gr)] = [
                                int(rng.integers(0, nlevels + 1))
                                for _ in range(3)]
                frame, _h = build_l2_frame(alloc_vals, sf0, samples_raw)
                params = AudioCodecParameters(
                    codec="mp2", sample_rate=44100,
                    channels=Channels.from_count(1))
                dec = MpaDecoder(params)
                fast = np.asarray(
                    dec.decode(Packet(0, 0, 1152, frame)).planes()).copy()
                nat.mpa_l12_extract = lambda *a, **k: None
                dec2 = MpaDecoder(params)
                slow = np.asarray(
                    dec2.decode(Packet(0, 0, 1152, frame)).planes()).copy()
                nat.mpa_l12_extract = orig
                np.testing.assert_array_equal(fast, slow)
        finally:
            nat.mpa_l12_extract = orig

    def test_l1_matches_python(self):
        from symphonia_tpu import native as nat

        if not nat.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        allocs = [[int(rng.choice([0, 2, 4, 8, 15])) for _ in range(32)]]
        raws = [[[int(rng.integers(0, 1 << allocs[0][sb]))
                  if allocs[0][sb] else 0 for _ in range(12)]
                 for sb in range(32)]]
        sfi = [[int(rng.integers(0, 60)) for _ in range(32)]]
        frame, _h = build_l1_frame(raws, allocs, sfi)
        params = AudioCodecParameters(codec="mp1", sample_rate=44100,
                                      channels=Channels.from_count(1))
        orig = nat.mpa_l12_extract
        try:
            dec = MpaDecoder(params)
            fast = np.asarray(
                dec.decode(Packet(0, 0, 384, frame)).planes()).copy()
            nat.mpa_l12_extract = lambda *a, **k: None
            dec2 = MpaDecoder(params)
            slow = np.asarray(
                dec2.decode(Packet(0, 0, 384, frame)).planes()).copy()
        finally:
            nat.mpa_l12_extract = orig
        np.testing.assert_array_equal(fast, slow)


class TestL12BatchPath:
    """batch.decode_bytes routes Layer I/II through the native bitstream
    stage + the batched device polyphase (l12_dense_batch_jax)."""

    def _l2_stream(self, n_frames=10, seed=1):
        from symphonia_tpu.codecs.mpa_layer12 import (QUANT_CLASS, SB_INFO,
                                                      SB_QUANT_INFO)

        rng = np.random.default_rng(seed)
        frames = []
        for _f in range(n_frames):
            sblimit, rows = SB_INFO[1]
            alloc_vals = [0] * sblimit
            sf0 = [0] * sblimit
            samples_raw = {}
            for sb in range(sblimit):
                nbal, _cls = SB_QUANT_INFO[rows[sb]]
                alloc_vals[sb] = int(rng.integers(0, 1 << nbal))
                sf0[sb] = int(rng.integers(0, 60))
                if not alloc_vals[sb]:
                    continue
                _, _, grouping, _b, nlevels = QUANT_CLASS[
                    SB_QUANT_INFO[rows[sb]][1][alloc_vals[sb]]]
                for gr in range(12):
                    samples_raw[(sb, gr)] = (
                        int(rng.integers(0, nlevels ** 3)) if grouping
                        else [int(rng.integers(0, nlevels + 1))
                              for _ in range(3)])
            frame, _h = build_l2_frame(alloc_vals, sf0, samples_raw)
            frames.append(frame)
        return b"".join(frames)

    @staticmethod
    def _decode_spying_device(data):
        """batch.decode_bytes with an engagement assertion: the batched
        device polyphase (l12_dense_batch_jax) must actually run — mp1/mp2
        once silently fell through to the sequential loop, making the
        batch-vs-sequential comparison vacuous."""
        from symphonia_tpu import batch
        from symphonia_tpu.ops import mp3_dense as MD

        calls = []
        real = MD.l12_dense_batch_jax
        MD.l12_dense_batch_jax = lambda *a, **k: (
            calls.append(1), real(*a, **k))[1]
        try:
            out = batch.decode_bytes(data)
        finally:
            MD.l12_dense_batch_jax = real
        assert calls, "L12 device batch path was not engaged"
        return out

    def test_l2_batch_matches_sequential(self):
        from symphonia_tpu import native
        from symphonia_tpu.batch import _fallback_decode

        if not native.available():
            pytest.skip("native library unavailable")
        data = self._l2_stream()
        out = self._decode_spying_device(data)
        ref = _fallback_decode(data, True)
        assert out.samples.shape == ref.samples.shape
        np.testing.assert_allclose(out.samples, ref.samples, atol=2e-5)

    def test_l1_batch_matches_sequential(self):
        from symphonia_tpu import native
        from symphonia_tpu.batch import _fallback_decode

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(9)
        frames = []
        for _f in range(8):
            allocs = [[int(rng.choice([0, 2, 4, 8, 15]))
                       for _ in range(32)]]
            raws = [[[int(rng.integers(0, 1 << allocs[0][sb]))
                      if allocs[0][sb] else 0 for _ in range(12)]
                     for sb in range(32)]]
            sfi = [[int(rng.integers(0, 60)) for _ in range(32)]]
            frame, _h = build_l1_frame(raws, allocs, sfi)
            frames.append(frame)
        data = b"".join(frames)
        out = self._decode_spying_device(data)
        ref = _fallback_decode(data, True)
        assert out.samples.shape == ref.samples.shape
        np.testing.assert_allclose(out.samples, ref.samples, atol=2e-5)

    def test_l1_sequential_tail_carry_matches_oneshot(self):
        """Layer I frames (384 samples) are shorter than the 480-sample
        polyphase tail: chained per-frame synthesis must superpose the
        carried remainder onto the frame after next (regression: the
        remainder was dropped, a ~-40 dB error on every L1 stream)."""
        from symphonia_tpu.codecs.mpa_layer12 import (Layer12State,
                                                      _synthesize)
        from symphonia_tpu.ops.mp3_dense import polyphase_response_np

        rng = np.random.default_rng(0)
        T, nfr = 12, 5
        frames = [rng.standard_normal((32, T)).astype(np.float32)
                  for _ in range(nfr)]
        st = Layer12State()
        chained = np.concatenate(
            [_synthesize(f.reshape(-1), T, st, 0) for f in frames])
        full = polyphase_response_np(
            np.concatenate(frames, axis=1))[: 32 * T * nfr]
        np.testing.assert_allclose(chained, full, atol=1e-4)
