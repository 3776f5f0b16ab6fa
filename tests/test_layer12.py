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


def build_l2_frame(alloc_vals, sf0, samples_raw, grouping_cw=None, n_ch=1,
                   mpeg2=False, sb_row=None):
    """Layer 2 frame: MPEG1 384kbps/44100 (sb_info row 1, sblimit 30),
    MPEG2 160kbps/22050 (sb_info row 4, the 13818-3 LSF table), or
    sb_row=0: MPEG1 128kbps (table 3-B.2a, sblimit 27 — the 56-80 kbps
    per-channel class).

    alloc_vals[sb] (mono) or alloc_vals[ch][sb]: allocation index;
    scalefactors all scfsi=2 (one index per subband); samples_raw keyed
    (sb, gr) (mono) or (ch, sb, gr) -> list of 3 raws or a grouped
    codeword.
    """
    from symphonia_tpu.codecs.mpa_layer12 import QUANT_CLASS, SB_INFO, SB_QUANT_INFO

    if sb_row is None:
        sb_row = 4 if mpeg2 else 1
    sblimit, rows = SB_INFO[sb_row]
    if n_ch == 1:
        alloc_vals = [alloc_vals]
        sf0 = [sf0]
        samples_raw = {(0, sb, gr): v for (sb, gr), v in samples_raw.items()}
    bw = BitWriter()
    for sb in range(sblimit):
        nbal = SB_QUANT_INFO[rows[sb]][0]
        for ch in range(n_ch):
            bw.write(alloc_vals[ch][sb], nbal)
    for sb in range(sblimit):
        for ch in range(n_ch):
            if alloc_vals[ch][sb]:
                bw.write(2, 2)  # scfsi = 2: one scalefactor for all
    for sb in range(sblimit):
        for ch in range(n_ch):
            if alloc_vals[ch][sb]:
                bw.write(sf0[ch][sb], 6)
    for gr in range(12):
        for sb in range(sblimit):
            for ch in range(n_ch):
                ci = alloc_vals[ch][sb]
                if not ci:
                    continue
                c, d, grouping, bits, nlevels = QUANT_CLASS[
                    SB_QUANT_INFO[rows[sb]][1][ci]]
                if grouping:
                    bw.write(samples_raw[(ch, sb, gr)], bits)
                else:
                    for r in samples_raw[(ch, sb, gr)]:
                        bw.write(r, bits)
    body = bw.pad_to_bytes()
    mode = 0xC0 if n_ch == 1 else 0x00
    if mpeg2:
        hdr = bytes([0xFF, 0xF5, (14 << 4) | 0, mode])
    elif sb_row == 0:
        # 128 kbps (index 8): 64 kbps/ch stereo or 128 kbps mono — both
        # land in _find_sb_info's 48k<per_ch<=80k (stereo) / >80k @44.1k
        # ... so use 64 kbps mono (index 4) for mono callers.
        bidx = 8 if n_ch == 2 else 4
        hdr = bytes([0xFF, 0xFD, (bidx << 4) | 0, mode])
    elif sb_row in (2, 3):
        # <=48 kbps/ch classes (tables 3-B.2c/d): 48 kbps mono (index 2)
        # or 96 kbps stereo (index 6); sb_row 3 is the 32 kHz variant.
        bidx = 6 if n_ch == 2 else 2
        rate_bits = 2 if sb_row == 3 else 0
        hdr = bytes([0xFF, 0xFD, (bidx << 4) | (rate_bits << 2), mode])
    else:
        hdr = bytes([0xFF, 0xFD, (14 << 4) | 0, mode])
    h = parse_header(int.from_bytes(hdr, "big"))
    from symphonia_tpu.codecs.mpa_layer12 import _find_sb_info
    assert _find_sb_info(h)[0] == sblimit, "header does not select sb_row"
    assert h.layer == 2 and h.duration == 1152
    assert h.n_channels == n_ch
    frame = hdr + body
    assert len(frame) <= h.frame_size, (len(frame), h.frame_size)
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

    def test_sb_info_row0_high_bands_all_paths(self):
        """Table 3-B.2a (sblimit 27, 56-80 kbps/ch): bands 23-26 use class
        row 0. A truncated SB_INFO row 0 crashed the Python path with a
        raw IndexError on ANY such stream while the fused native path
        decoded via its zero-padded rows array — regression for both the
        crash and the Python/native parity."""
        from symphonia_tpu.codecs.mpa_layer12 import QUANT_CLASS, SB_INFO, SB_QUANT_INFO

        rng = np.random.default_rng(9)
        sblimit, rows = SB_INFO[0]
        assert sblimit == 27 and len(rows) == 27
        alloc_vals = [0] * sblimit
        sf0 = [0] * sblimit
        samples_raw = {}
        for sb in [0, 11, 23, 24, 25, 26]:
            nbal, classes = SB_QUANT_INFO[rows[sb]]
            # Small classes only: the 64 kbps frame is 208 bytes.
            alloc_vals[sb] = int(rng.integers(1, min(3, 1 << nbal)))
            sf0[sb] = int(rng.integers(0, 40))
            c, d, grouping, bits, nlevels = QUANT_CLASS[classes[alloc_vals[sb]]]
            for gr in range(12):
                if grouping:
                    samples_raw[(sb, gr)] = int(rng.integers(0, nlevels**3))
                else:
                    samples_raw[(sb, gr)] = [
                        int(rng.integers(0, nlevels + 1)) for _ in range(3)]
        frame, h = build_l2_frame(alloc_vals, sf0, samples_raw, sb_row=0)
        assert h.bitrate // h.n_channels == 64000

        params = AudioCodecParameters(codec="mp2", sample_rate=h.sample_rate,
                                      channels=Channels.from_count(1))
        outs = {}
        for fused, extract in [(True, True), (False, True), (False, False)]:
            with _force_l12_path(fused, extract):
                dec = MpaDecoder(params)
                outs[(fused, extract)] = np.asarray(
                    dec.decode(Packet(0, 0, 1152, frame)).planes()).copy()
        np.testing.assert_array_equal(outs[(True, True)], outs[(False, True)])
        np.testing.assert_array_equal(outs[(False, True)], outs[(False, False)])
        assert np.abs(outs[(True, True)]).max() > 0  # bands actually decoded


import contextlib


@contextlib.contextmanager
def _force_l12_path(fused: bool, extract: bool):
    """Disable the fused per-packet path and/or the native extract stage
    so decoders constructed inside the context take a specific path
    (fused C++ / extract-C++ + Python synthesize / pure Python)."""
    from symphonia_tpu import native as nat

    orig_caller = nat.l12_stream_caller
    orig_extract = nat.mpa_l12_extract
    try:
        if not fused:
            nat.l12_stream_caller = lambda *a, **k: None
        if not extract:
            nat.mpa_l12_extract = lambda *a, **k: None
        yield
    finally:
        nat.l12_stream_caller = orig_caller
        nat.mpa_l12_extract = orig_extract


def _rand_l2_frame(seed, n_ch=1, mpeg2=False, sb_row=None):
    from symphonia_tpu.codecs.mpa_layer12 import (QUANT_CLASS, SB_INFO,
                                                  SB_QUANT_INFO)

    rng = np.random.default_rng(seed)
    if sb_row is None:
        sb_row = 4 if mpeg2 else 1
    sblimit, rows = SB_INFO[sb_row]
    alloc_vals = [[0] * sblimit for _ in range(n_ch)]
    sf0 = [[0] * sblimit for _ in range(n_ch)]
    samples_raw = {}
    # Stereo doubles the payload: restrict coded subbands so the frame
    # fits the fixed frame size. The low-bitrate rows (0: 64 kbps/ch,
    # 2/3: <=48 kbps/ch) carry 2-5x smaller frames — code only a few
    # bands (spread across the full range so high-band nbal fields are
    # exercised) with small quant classes.
    small = sb_row in (0, 2, 3)
    if small:
        coded = set(int(s) for s in
                    rng.choice(sblimit, size=min(4, sblimit), replace=False))
    else:
        coded = set(range(sblimit if n_ch == 1 else 12))
    for sb in range(sblimit):
        nbal, classes = SB_QUANT_INFO[rows[sb]]
        for ch in range(n_ch):
            if sb not in coded or nbal == 0:
                continue
            hi = min(4, 1 << nbal) if small else (1 << nbal)
            alloc_vals[ch][sb] = int(rng.integers(0, hi))
            sf0[ch][sb] = int(rng.integers(0, 60))
            if not alloc_vals[ch][sb]:
                continue
            _, _, grouping, bits, nlevels = QUANT_CLASS[
                classes[alloc_vals[ch][sb]]]
            for gr in range(12):
                if grouping:
                    samples_raw[(ch, sb, gr)] = int(
                        rng.integers(0, nlevels ** 3))
                else:
                    samples_raw[(ch, sb, gr)] = [
                        int(rng.integers(0, nlevels + 1)) for _ in range(3)]
    if n_ch == 1:
        alloc_vals, sf0 = alloc_vals[0], sf0[0]
        samples_raw = {(sb, gr): v
                       for (ch, sb, gr), v in samples_raw.items()}
    return build_l2_frame(alloc_vals, sf0, samples_raw, n_ch=n_ch,
                          mpeg2=mpeg2, sb_row=sb_row)


def _decode_stream(frames, h, fused, extract):
    """Decode a list of frames through MpaDecoder on a forced path."""
    codec = "mp1" if h.layer == 1 else "mp2"
    params = AudioCodecParameters(codec=codec, sample_rate=h.sample_rate,
                                  channels=Channels.from_count(h.n_channels))
    with _force_l12_path(fused, extract):
        dec = MpaDecoder(params)
        out = [np.asarray(dec.decode(
            Packet(0, i * h.duration, h.duration, f)).planes()).copy()
               for i, f in enumerate(frames)]
    return np.concatenate(out, axis=1)


class TestNativeL12Parity:
    """The native bitstream stage (native/mpa_layer12.cpp) must match the
    Python loops bit-for-bit across quantization classes and scfsi modes.
    The fused per-packet path (sh_l12_stream_decode) is disabled here so
    the extract-stage comparison is not vacuous."""

    def test_l2_matches_python(self):
        from symphonia_tpu import native as nat

        if not nat.available():
            pytest.skip("native library unavailable")
        for seed in range(6):
            frame, h = _rand_l2_frame(seed)
            fast = _decode_stream([frame], h, fused=False, extract=True)
            slow = _decode_stream([frame], h, fused=False, extract=False)
            np.testing.assert_array_equal(fast, slow)

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
        frame, h = build_l1_frame(raws, allocs, sfi)
        fast = _decode_stream([frame], h, fused=False, extract=True)
        slow = _decode_stream([frame], h, fused=False, extract=False)
        np.testing.assert_array_equal(fast, slow)


class TestFusedL12Parity:
    """The fused per-packet path (native/mpa_layer12.cpp
    sh_l12_stream_decode: extract + polyphase + carried tail in one call)
    must be bit-identical to the non-fused native path (extract-C++ +
    _synthesize via sh_mp3_polyphase — same arithmetic, same order) across
    layers, channel counts, and MPEG versions, including the carried
    480-sample tail across frames."""

    def _frames_l2(self, n, n_ch=1, mpeg2=False):
        frames = []
        for seed in range(n):
            f, h = _rand_l2_frame(100 + seed, n_ch=n_ch, mpeg2=mpeg2)
            frames.append(f)
        return frames, h

    def _check(self, frames, h):
        fused = _decode_stream(frames, h, fused=True, extract=True)
        semi = _decode_stream(frames, h, fused=False, extract=True)
        np.testing.assert_array_equal(fused, semi)
        # Pure Python differs only in polyphase summation order.
        pure = _decode_stream(frames, h, fused=False, extract=False)
        np.testing.assert_allclose(fused, pure, atol=2e-4)

    def test_l2_mono_stream(self):
        self._check(*self._frames_l2(4))

    @pytest.mark.parametrize("n_ch", [1, 2])
    @pytest.mark.parametrize("sb_row", [0, 1, 2, 3])
    def test_l2_sb_row_matrix(self, sb_row, n_ch):
        """Every MPEG-1 bit-allocation table row x channel count through
        all three decode paths. Rows 2/3 (<=48 kbps/ch, tables 3-B.2c/d)
        previously had zero coverage — the same class of gap where the
        row-0 truncation bug lived (a table row no fixture selected)."""
        frames = []
        h = None
        for seed in range(4):
            f, h = _rand_l2_frame(200 + 10 * sb_row + seed, n_ch=n_ch,
                                  sb_row=sb_row)
            frames.append(f)
        self._check(frames, h)

    def test_l2_stereo_stream(self):
        self._check(*self._frames_l2(4, n_ch=2))

    def test_l2_mpeg2_stereo_stream(self):
        self._check(*self._frames_l2(4, n_ch=2, mpeg2=True))

    def test_l1_stereo_stream(self):
        rng = np.random.default_rng(3)
        frames = []
        for _ in range(5):
            allocs = [[int(rng.choice([0, 2, 4, 8, 15])) if sb < 12 else 0
                       for sb in range(32)] for _ in range(2)]
            raws = [[[int(rng.integers(0, 1 << allocs[ch][sb]))
                      if allocs[ch][sb] else 0 for _ in range(12)]
                     for sb in range(32)] for ch in range(2)]
            sfi = [[int(rng.integers(0, 60)) for _ in range(32)]
                   for _ in range(2)]
            f, h = build_l1_frame(raws, allocs, sfi, n_ch=2)
            frames.append(f)
        self._check(frames, h)

    def test_mid_stream_fallback_continuity(self):
        """The Python fallback shares the fused path's tail state: forcing
        frames through different paths mid-stream must still produce the
        all-fused output bit-for-bit (the C++ touches synth_tails only on
        success, and both paths run the same polyphase)."""
        frames, h = self._frames_l2(5)
        want = _decode_stream(frames, h, fused=True, extract=True)
        params = AudioCodecParameters(codec="mp2", sample_rate=h.sample_rate,
                                      channels=Channels.from_count(1))
        dec = MpaDecoder(params)
        out = []
        for i, f in enumerate(frames):
            if i == 2:  # force one frame down the Python path
                dec._l12_state.stream = False
            out.append(np.asarray(dec.decode(
                Packet(0, i * h.duration, h.duration, f)).planes()).copy())
            if i == 2:
                dec._l12_state.stream = None  # re-probe the fused path
        got = np.concatenate(out, axis=1)
        np.testing.assert_array_equal(got, want)

    def test_fused_path_engaged(self):
        """Guard against silent fallback: after a decode, the state's
        stream caller must be live (not False) and the config cache
        populated — proves sh_l12_stream_decode actually ran."""
        from symphonia_tpu import native as nat

        if not nat.available():
            pytest.skip("native library unavailable")
        frames, h = self._frames_l2(1)
        params = AudioCodecParameters(codec="mp2", sample_rate=h.sample_rate,
                                      channels=Channels.from_count(1))
        dec = MpaDecoder(params)
        dec.decode(Packet(0, 0, h.duration, frames[0]))
        st = dec._l12_state
        assert st.stream and st._cfg, "fused L12 path was not engaged"


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
