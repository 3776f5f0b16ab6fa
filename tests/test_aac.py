"""AAC-LC decode tests: bitstream roundtrip against an independent minimal
encoder + float64 reference synthesis, ADTS demux, window-sequence
transitions, stereo, and table sanity checks."""

import numpy as np
import pytest

import symphonia_tpu as sym
from symphonia_tpu.codecs.aac import (
    AacDecoder,
    Dsp,
    imdct_matrix_scaled,
    kbd_window,
    normal_scf_table,
    sine_window,
    spectrum_codebook,
    subband_info,
)
from symphonia_tpu.common.mpeg import AudioSpecificConfig
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.adts import AdtsReader

from aac_builder import (
    build_adts,
    build_raw_block,
    build_raw_block_elements,
    random_quant_spectrum,
    reference_synthesis,
)

RATE = 44100
MAX_SFB = 40
GAIN = 140  # scale = 2^((140-156)/4) = 2^-4


def decode_adts(data: bytes):
    r = AdtsReader(MediaSourceStream(data))
    track = r.default_track()
    dec = AacDecoder(track.codec_params)
    outs = []
    while True:
        p = r.next_packet()
        if p is None:
            break
        outs.append(dec.decode(p).planes().copy())
    return np.concatenate(outs, axis=1), track


class TestMonoLong:
    def test_roundtrip_vs_reference_synthesis(self):
        rng = np.random.default_rng(0)
        quants = [random_quant_spectrum(rng, MAX_SFB, RATE) for _ in range(6)]
        frames = [
            build_raw_block([q], [0], MAX_SFB, GAIN, RATE) for q in quants
        ]
        data = build_adts(frames, RATE, 1)
        ours, track = decode_adts(data)
        assert track.codec_params.sample_rate == RATE
        scale = float(normal_scf_table()[GAIN])
        expect = reference_synthesis(quants, [0] * 6, scale, RATE, MAX_SFB)
        assert ours.shape[1] == len(expect)
        np.testing.assert_allclose(ours[0], expect, atol=2e-5)

    def test_escape_values(self):
        rng = np.random.default_rng(1)
        q = np.zeros(1024, dtype=np.int64)
        q[:8] = [100, -500, 17, -16, 2000, -8000, 15, 1]
        frames = [build_raw_block([q], [0], MAX_SFB, GAIN, RATE)]
        data = build_adts(frames, RATE, 1)
        ours, _ = decode_adts(data)
        scale = float(normal_scf_table()[GAIN])
        expect = reference_synthesis([q], [0], scale, RATE, MAX_SFB)
        np.testing.assert_allclose(ours[0], expect, atol=2e-4)


class TestWindowSequences:
    def test_long_start_short_stop_chain(self):
        rng = np.random.default_rng(2)
        seqs = [0, 1, 2, 2, 3, 0]
        quants = [random_quant_spectrum(rng, 12, RATE, seq) for seq in seqs]
        frames = [
            build_raw_block([q], [s], 12, GAIN, RATE)
            for q, s in zip(quants, seqs)
        ]
        data = build_adts(frames, RATE, 1)
        ours, _ = decode_adts(data)
        scale = float(normal_scf_table()[GAIN])
        expect = reference_synthesis(quants, seqs, scale, RATE, 12)
        np.testing.assert_allclose(ours[0], expect, atol=2e-5)


class TestStereo:
    def test_cpe_independent(self):
        rng = np.random.default_rng(3)
        n_frames = 4
        ql = [random_quant_spectrum(rng, MAX_SFB, RATE) for _ in range(n_frames)]
        qr = [random_quant_spectrum(rng, MAX_SFB, RATE) for _ in range(n_frames)]
        frames = [
            build_raw_block([a, b], [0, 0], MAX_SFB, GAIN, RATE)
            for a, b in zip(ql, qr)
        ]
        data = build_adts(frames, RATE, 2)
        ours, track = decode_adts(data)
        assert track.codec_params.channels.count == 2
        scale = float(normal_scf_table()[GAIN])
        el = reference_synthesis(ql, [0] * n_frames, scale, RATE, MAX_SFB)
        er = reference_synthesis(qr, [0] * n_frames, scale, RATE, MAX_SFB)
        np.testing.assert_allclose(ours[0], el, atol=2e-5)
        np.testing.assert_allclose(ours[1], er, atol=2e-5)


class TestAdts:
    def test_probe(self):
        rng = np.random.default_rng(4)
        q = random_quant_spectrum(rng, MAX_SFB, RATE)
        data = build_adts(
            [build_raw_block([q], [0], MAX_SFB, GAIN, RATE)] * 3, RATE, 1
        )
        probed = sym.get_probe().probe(MediaSourceStream(data))
        assert isinstance(probed.format, AdtsReader)

    def test_seek(self):
        rng = np.random.default_rng(5)
        frames = [
            build_raw_block([random_quant_spectrum(rng, MAX_SFB, RATE)], [0],
                            MAX_SFB, GAIN, RATE)
            for _ in range(5)
        ]
        r = AdtsReader(MediaSourceStream(build_adts(frames, RATE, 1)))
        seeked = r.seek("accurate", sym.SeekTo(ts=2500))
        assert seeked.actual_ts == 2048
        assert r.next_packet().ts == 2048

    def test_resync_past_mid_stream_garbage(self):
        """A corrupt span between frames must not drop the rest of the
        stream, and the re-sync walk must stay sub-quadratic (it hops
        between precomputed 0xFF candidates)."""
        import time

        rng = np.random.default_rng(6)
        frames = [
            build_raw_block([random_quant_spectrum(rng, MAX_SFB, RATE)], [0],
                            MAX_SFB, GAIN, RATE)
            for _ in range(6)
        ]
        clean = build_adts(frames, RATE, 1)
        r = AdtsReader(MediaSourceStream(clean))
        n_clean = len(r.packet_table().sizes)
        # Split at a frame boundary (2nd frame header) and inject garbage
        # rich in 0xFF bytes (worst case for the candidate walk).
        hdr2 = clean.index(b"\xff\xf1", 2)
        garbage = bytes(rng.choice([0xFF, 0x00, 0xAA], size=200_000,
                                   p=[0.5, 0.25, 0.25]).astype(np.uint8))
        dirty = clean[:hdr2] + garbage + clean[hdr2:]
        t0 = time.monotonic()
        r2 = AdtsReader(MediaSourceStream(dirty))
        elapsed = time.monotonic() - t0
        n_dirty = len(r2.packet_table().sizes)
        assert n_dirty >= n_clean - 1  # at most the boundary frame lost
        assert elapsed < 5.0


class TestAscParsing:
    def test_basic_lc(self):
        asc = AudioSpecificConfig.read(AudioSpecificConfig.build(2, 44100, 2))
        assert asc.object_type == 2
        assert asc.sample_rate == 44100
        assert asc.n_channels == 2
        assert asc.samples == 1024


class TestTables:
    def test_kbd_window_princen_bradley(self):
        w = kbd_window(1024, 4.0)
        np.testing.assert_allclose(w**2 + w[::-1] ** 2, np.ones(1024), atol=1e-5)

    def test_sine_window(self):
        w = sine_window(128)
        np.testing.assert_allclose(w**2 + w[::-1] ** 2, np.ones(128), atol=1e-6)

    def test_subband_info(self):
        idx, lb, sb = subband_info(44100)
        assert idx == 4
        assert lb[-1] == 1024 and sb[-1] == 128

    def test_codebooks_build(self):
        for n in range(1, 12):
            cb = spectrum_codebook(n)
            assert len(cb) > 0

    def test_imdct_scale(self):
        # Unit impulse spectrum: output magnitude bounded by 1/N_in scale.
        m = imdct_matrix_scaled(1024)
        assert m.shape == (2048, 1024)
        assert abs(m).max() <= 1.0 / 2048 + 1e-9


class TestAacBatchDecoder:
    def test_matches_per_packet_decoder(self):
        from symphonia_tpu.batch import AacBatchDecoder

        rng = np.random.default_rng(50)
        seqs = [0, 1, 2, 2, 3, 0, 1, 2, 3, 0]
        from aac_builder import build_adts, build_raw_block, random_quant_spectrum

        quants = [random_quant_spectrum(rng, 12, RATE, s) for s in seqs]
        frames = [build_raw_block([q], [s], 12, GAIN, RATE)
                  for q, s in zip(quants, seqs)]
        data = build_adts(frames, RATE, 1)
        ref, _ = decode_adts(data)
        batch = AacBatchDecoder().decode_bytes(data)
        n = min(ref.shape[1], batch.samples.shape[1])
        np.testing.assert_allclose(batch.samples[:, :n], ref[:, :n], atol=1e-5)

    def test_stereo_cpe(self):
        from symphonia_tpu.batch import AacBatchDecoder
        from aac_builder import build_adts, build_raw_block, random_quant_spectrum

        rng = np.random.default_rng(51)
        frames = [
            build_raw_block(
                [random_quant_spectrum(rng, MAX_SFB, RATE),
                 random_quant_spectrum(rng, MAX_SFB, RATE)],
                [0, 0], MAX_SFB, GAIN, RATE)
            for _ in range(4)
        ]
        data = build_adts(frames, RATE, 2)
        ref, _ = decode_adts(data)
        batch = AacBatchDecoder().decode_bytes(data)
        n = min(ref.shape[1], batch.samples.shape[1])
        np.testing.assert_allclose(batch.samples[:, :n], ref[:, :n], atol=1e-5)


class TestNativeEntropy:
    """Native C++ entropy stage (native/aac_entropy.cpp) vs the Python
    oracle decoder — exact coefficient match expected."""

    def _compare(self, frames, rate, n_ch):
        from symphonia_tpu import native

        if not native.available():
            pytest.skip("native lib unavailable")
        data = build_adts(frames, rate, n_ch)
        r = AdtsReader(MediaSourceStream(data))
        dec = AacDecoder(r.default_track().codec_params)
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(bytes(p.data))
        py = [dec.decode_coeffs(p) for p in pkts]
        buf = b"".join(pkts)
        offs = np.cumsum([0] + [len(p) for p in pkts[:-1]]).astype(np.int64)
        szs = np.array([len(p) for p in pkts], np.int64)
        ri, bl, bs = subband_info(rate)
        out = native.aac_extract(buf, offs, szs, ri, bl, bs, n_ch)
        assert (out["status"] == 0).all()
        assert (out["nch"] == n_ch).all()
        # Handoff lanes (deq == 0) carry quants; reconstruct with the host
        # twin of the device dequant (bit-identical pow43 multiply).
        full = native.aac_dequant_host(out, bl)
        for f, chans in enumerate(py):
            for c, (coeffs, seq, shape, prev_shape) in enumerate(chans):
                assert out["seq"][f, c] == seq
                assert out["shape"][f, c] == int(shape)
                assert out["prev_shape"][f, c] == int(prev_shape)
                np.testing.assert_array_equal(full[f, c], coeffs)

    def test_intensity_outside_joint_not_handed_off(self):
        """Regression: intensity bands store nonzero scales over qbuf
        positions the decode never writes, so a channel with intensity
        sections must not take the device-dequant handoff even outside
        the joint-stereo path (CPE without common_window)."""
        from symphonia_tpu import native

        if not native.available():
            import pytest
            pytest.skip("native library unavailable")
        spec0 = np.zeros(1024, np.int64)
        spec0[0:12] = [3, -2, 1, 4, -1, 2, 1, -3, 2, 1, -1, 2]
        spec1 = np.zeros(1024, np.int64)
        spec1[0:4] = [1, -1, 2, 1]
        frames = [build_raw_block([spec0.copy(), spec1.copy()], [0, 0], 12,
                                  GAIN, RATE, common_window=False,
                                  special_books1={5: 14})
                  for _ in range(10)]
        data = build_adts(frames, RATE, 2)
        r = AdtsReader(MediaSourceStream(data))
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(bytes(p.data))
        buf = b"".join(pkts)
        szs = np.array([len(p) for p in pkts], np.int64)
        offs = np.zeros(len(pkts), np.int64)
        np.cumsum(szs[:-1], out=offs[1:])
        ri, bl, bs = subband_info(RATE)
        out = native.aac_extract(buf, offs, szs, ri, bl, bs, 2)
        assert (out["status"] == 0).all()
        assert (out["deq"][:, 1] == 1).all()  # intensity channel kept host-side
        full = native.aac_dequant_host(out, bl)
        dec = AacDecoder(r.default_track().codec_params)
        ref = dec.decode_coeffs(pkts[0])
        for f in range(len(pkts)):
            for c in range(2):
                np.testing.assert_array_equal(full[f, c], ref[c][0])

    def test_mono_window_chain(self):
        rng = np.random.default_rng(60)
        seqs = [0, 1, 2, 2, 3, 0, 1, 2, 3, 0]
        frames = [
            build_raw_block([random_quant_spectrum(rng, 12, RATE, s)], [s],
                            12, GAIN, RATE)
            for s in seqs
        ]
        self._compare(frames, RATE, 1)

    def test_stereo_cpe(self):
        rng = np.random.default_rng(61)
        frames = [
            build_raw_block(
                [random_quant_spectrum(rng, MAX_SFB, RATE),
                 random_quant_spectrum(rng, MAX_SFB, RATE)],
                [0, 0], MAX_SFB, GAIN, RATE)
            for _ in range(6)
        ]
        self._compare(frames, RATE, 2)

    def test_escapes(self):
        q = np.zeros(1024, dtype=np.int64)
        q[:8] = [100, -500, 17, -16, 2000, -8000, 15, 1]
        frames = [build_raw_block([q], [0], MAX_SFB, GAIN, RATE)]
        self._compare(frames, RATE, 1)


class TestBatchedOla:
    def test_matches_sequential_chain(self):
        from symphonia_tpu.ops.aac_dense import (
            imdct_frames, window_ola_batch, window_ola_chain,
        )

        rng = np.random.default_rng(70)
        seqs = [0, 1, 2, 2, 3, 0, 0, 1, 2, 3, 0, 1, 2, 2, 2, 3]
        shapes = [bool(rng.integers(0, 2)) for _ in seqs]
        prevs = [False] + shapes[:-1]
        coeffs = (rng.standard_normal((len(seqs), 1024)) * 0.1).astype(np.float32)
        pcms = imdct_frames(coeffs, np.asarray(seqs))
        a = window_ola_chain(pcms, seqs, shapes, prevs)
        b = window_ola_batch(pcms, seqs, shapes, prevs)
        np.testing.assert_array_equal(a, b)


class TestNativeEntropySpecialBands(TestNativeEntropy):
    """PNS / MS / intensity coverage for the native engines — in particular
    the interleaved engine's PNS handling (scratch-LCG decode + sequential
    re-decode of flagged frames must equal the oracle's persistent LCG)."""

    def test_pns_cross_frame_lcg(self):
        rng = np.random.default_rng(70)
        frames = []
        for f in range(10):
            q = random_quant_spectrum(rng, 20, RATE)
            # Noise bands on some frames only: the LCG must advance only on
            # noise draws, in frame order.
            special = {3: 13, 7: 13} if f % 3 != 1 else None
            frames.append(build_raw_block([q], [0], 20, GAIN, RATE,
                                          special_books0=special))
        self._compare(frames, RATE, 1)

    def test_common_window_ms_all(self):
        rng = np.random.default_rng(71)
        frames = [
            build_raw_block(
                [random_quant_spectrum(rng, 20, RATE),
                 random_quant_spectrum(rng, 20, RATE)],
                [0, 0], 20, GAIN, RATE, common_window=True, ms_mask=2)
            for _ in range(5)
        ]
        self._compare(frames, RATE, 2)

    def test_common_window_ms_per_band_and_intensity(self):
        rng = np.random.default_rng(72)
        frames = [
            build_raw_block(
                [random_quant_spectrum(rng, 20, RATE),
                 random_quant_spectrum(rng, 20, RATE)],
                [0, 0], 20, GAIN, RATE, common_window=True, ms_mask=1,
                ms_used={1, 4, 9}, special_books1={5: 15, 11: 14})
            for _ in range(5)
        ]
        self._compare(frames, RATE, 2)

    def test_pulse_long_window(self):
        """pulse_data synthesis (requant + amplitude-toward-sign + dequant)
        — native vs oracle exact, pulses landing on zero, positive and
        negative base coefficients."""
        rng = np.random.default_rng(74)
        frames = []
        for f in range(6):
            q = random_quant_spectrum(rng, 20, RATE)
            pulse = (2, [(0, 3), (5, 1), (17, 15), (31, 7)]) if f % 2 == 0 \
                else (0, [(2, 9)])
            frames.append(build_raw_block([q], [0], 20, GAIN, RATE,
                                          pulse0=pulse))
        self._compare(frames, RATE, 1)

    def test_tns_long_and_short_windows(self):
        """TNS all-pole filters: both directions, coef_res 0/1, compress
        0/1, multiple filters per window, eight-short windows — native vs
        oracle exact (f32 Levinson expansion + in-order filter loop)."""
        rng = np.random.default_rng(75)
        frames = []
        for f in range(8):
            if f % 2 == 0:
                q = random_quant_spectrum(rng, 20, RATE)
                tns = [[{"coef_res": 1, "length": 10, "order": 4,
                         "direction": 0, "compress": 0,
                         "coefs": [3, 14, 7, 9]},
                        {"length": 6, "order": 2, "direction": 1,
                         "compress": 1, "coefs": [5, 2]}]]
                frames.append(build_raw_block([q], [0], 20, GAIN, RATE,
                                              tns0=tns))
            else:
                q = random_quant_spectrum(rng, 8, RATE, seq=2)
                tns = [([{"coef_res": 0, "length": 5, "order": 3,
                          "direction": w % 2, "compress": 0,
                          "coefs": [2, 6, 1]}] if w % 3 != 1 else [])
                       for w in range(8)]
                frames.append(build_raw_block([q], [2], 8, GAIN, RATE,
                                              tns0=tns))
        self._compare(frames, RATE, 1)

    def test_pns_with_ms_noise_exclusion(self):
        rng = np.random.default_rng(73)
        frames = [
            build_raw_block(
                [random_quant_spectrum(rng, 20, RATE),
                 random_quant_spectrum(rng, 20, RATE)],
                [0, 0], 20, GAIN, RATE, common_window=True, ms_mask=2,
                special_books0={6: 13}, special_books1={6: 13, 12: 13})
            for _ in range(6)
        ]
        self._compare(frames, RATE, 2)


class TestDeviceDequantLookup:
    def test_pow43_lookup_exact_full_range(self):
        """The row-gather + one-hot formulation (ops.aac_dense._pow43_lookup)
        must reproduce the pow43 table bit-exactly for every index 0..8191
        (the unselected lanes contribute exact +0.0 products)."""
        import jax.numpy as jnp
        from symphonia_tpu.native import aac_pow43
        from symphonia_tpu.ops.aac_dense import _pow43_lookup

        mags = jnp.asarray(np.arange(8192, dtype=np.int32).reshape(8, 1024))
        got = np.asarray(_pow43_lookup(jnp, mags)).reshape(-1)
        np.testing.assert_array_equal(got, aac_pow43())

    def test_dequant_jax_matches_numpy_twin(self):
        """_dequant_jax == the host-twin arithmetic (pow43[|q|] * scale,
        IEEE f32 multiply + sign flip) including escape-range magnitudes."""
        import jax.numpy as jnp
        from symphonia_tpu.codecs.aac import subband_info
        from symphonia_tpu.native import aac_pow43, aac_sfb_map
        from symphonia_tpu.ops.aac_dense import _dequant_jax

        rng = np.random.default_rng(5)
        _, bl, _ = subband_info(44100)
        n = 6
        qbuf = rng.integers(-200, 201, size=(n, 1024)).astype(np.int16)
        qbuf[0, :16] = [8191, -8191, 64, -64, 63, -63, 127, -128, 1, -1, 0,
                        8190, -4096, 4095, 2048, -2047]
        scales = np.abs(rng.standard_normal((n, 64)) * 0.01).astype(np.float32)
        deq = np.zeros(n, np.int32)
        deq[3] = 1  # pass-through lane
        coeffs = rng.standard_normal((n, 1024)).astype(np.float32)

        fn = _dequant_jax(tuple(int(b) for b in bl))
        got = np.asarray(fn(jnp.asarray(coeffs), jnp.asarray(qbuf),
                            jnp.asarray(scales), jnp.asarray(deq)))

        pow43 = aac_pow43()
        smap = aac_sfb_map(np.asarray(bl))
        q = qbuf.astype(np.int32)
        v = pow43[np.minimum(np.abs(q), 8191)] * scales[:, smap]
        v = np.where(q < 0, -v, v).astype(np.float32)
        expect = np.where((deq == 0)[:, None], v, coeffs)
        np.testing.assert_array_equal(got, expect)


class TestSurroundLayouts:
    """Multi-element raw_data_blocks (channel configs 6 and 7): the
    SCE/CPE/LFE element loop beyond mono/stereo, the native per-packet
    path at >2 channels, and the config->layout mapping
    (mpeg/audio/mod.rs:201-213 — config 7 is EIGHT channels)."""

    def _stream_5p1(self, n_frames=8, seed=11):
        rng = np.random.default_rng(seed)
        frames = []
        for f in range(n_frames):
            seqs = [[0, 1, 2, 3][(f + c) % 4] for c in range(6)]
            quants = [random_quant_spectrum(rng, 14, RATE, seq=s)
                      for s in seqs]
            frames.append(build_raw_block_elements(
                ("sce", "cpe", "cpe", "lfe"), quants, seqs, 14, GAIN, RATE))
        return build_adts(frames, RATE, 6)

    def test_5p1_track_layout(self):
        from symphonia_tpu.core.audio import Position

        r = AdtsReader(MediaSourceStream(self._stream_5p1(2)))
        ch = r.default_track().codec_params.channels
        assert ch.count == 6
        assert ch.mask == (Position.STEREO | Position.FRONT_CENTER
                           | Position.LFE1 | Position.REAR_LEFT
                           | Position.REAR_RIGHT)

    def test_5p1_native_matches_oracle(self, monkeypatch):
        from symphonia_tpu import native

        data = self._stream_5p1()
        monkeypatch.delenv("SYMPHONIA_TPU_AAC_STREAM", raising=False)
        r = AdtsReader(MediaSourceStream(data))
        dec = AacDecoder(r.default_track().codec_params)
        outs = []
        while (p := r.next_packet()) is not None:
            outs.append(dec.decode(p).planes().copy())
        a = np.concatenate(outs, axis=1)
        if native.available():
            # Engagement proof: a silent fallback would flip _native off.
            assert dec._native
        monkeypatch.setenv("SYMPHONIA_TPU_AAC_STREAM", "off")
        b, _ = decode_adts(data)
        assert a.shape == b.shape == (6, 8 * 1024)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() <= 1e-4 * scale

    def test_config7_is_eight_channels(self):
        """ADTS channel config 7 -> 8 channels, 7.1-wide positions."""
        from symphonia_tpu.core.audio import Position

        rng = np.random.default_rng(3)
        quants = [random_quant_spectrum(rng, 20, RATE) for _ in range(8)]
        frame = build_raw_block_elements(
            ("sce", "cpe", "cpe", "cpe", "lfe"), quants, [0] * 8, 20,
            GAIN, RATE)
        data = build_adts([frame] * 3, RATE, 7)
        r = AdtsReader(MediaSourceStream(data))
        ch = r.default_track().codec_params.channels
        assert ch.count == 8
        assert ch.mask & Position.FRONT_LEFT_CENTER
        out, _ = decode_adts(data)
        assert out.shape == (8, 3 * 1024)


class TestPerPacketNativeStream:
    """Per-packet native fast path (sh_aac_stream_decode, persistent
    ChannelPair state) vs the Python oracle decoder — full PCM, covering
    cross-packet PNS LCG chaining, short windows and MS stereo."""

    def _decode_forced(self, data, monkeypatch, mode):
        if mode == "off":
            monkeypatch.setenv("SYMPHONIA_TPU_AAC_STREAM", "off")
        else:
            monkeypatch.delenv("SYMPHONIA_TPU_AAC_STREAM", raising=False)
        out, _ = decode_adts(data)
        return out

    @pytest.mark.parametrize("content", ["pns_mono", "ms_stereo",
                                         "short_windows", "pulse_tns"])
    def test_stream_matches_oracle(self, content, monkeypatch):
        from symphonia_tpu import native

        if native.aac_stream_open(0, [0, 4], [0, 4], 1) is None:
            pytest.skip("native AAC stream unavailable")
        rng = np.random.default_rng(99)
        frames = []
        for f in range(12):
            if content == "pns_mono":
                q = random_quant_spectrum(rng, 20, RATE)
                special = {3: 13, 7: 13} if f % 3 != 1 else None
                frames.append(build_raw_block([q], [0], 20, GAIN, RATE,
                                              special_books0=special))
            elif content == "ms_stereo":
                frames.append(build_raw_block(
                    [random_quant_spectrum(rng, 20, RATE),
                     random_quant_spectrum(rng, 20, RATE)],
                    [0, 0], 20, GAIN, RATE, common_window=True, ms_mask=2))
            elif content == "pulse_tns":
                q = random_quant_spectrum(rng, 20, RATE)
                pulse = (1, [(3, 4), (9, 2)]) if f % 2 == 0 else None
                tns = [[{"coef_res": 1, "length": 12, "order": 3,
                         "direction": f % 2, "compress": 0,
                         "coefs": [4, 11, 6]}]] if f % 3 != 2 else None
                frames.append(build_raw_block([q], [0], 20, GAIN, RATE,
                                              pulse0=pulse, tns0=tns))
            else:
                seq = [0, 1, 2, 3][f % 4]  # long/start/short/stop cycle
                q = random_quant_spectrum(rng, 14 if seq == 2 else 20, RATE,
                                          short=(seq == 2)) \
                    if "short" in random_quant_spectrum.__code__.co_varnames \
                    else random_quant_spectrum(rng, 14, RATE)
                frames.append(build_raw_block([q], [seq], 14, GAIN, RATE))
        n_ch = 2 if content == "ms_stereo" else 1
        data = build_adts(frames, RATE, n_ch)
        a = self._decode_forced(data, monkeypatch, "on")
        b = self._decode_forced(data, monkeypatch, "off")
        assert a.shape == b.shape
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() <= 1e-4 * scale, np.abs(a - b).max()


class TestAacNativePcmPath:
    """Full-C++ per-packet decode (sh_aac_stream_decode_pcm: entropy +
    dequant + IMDCT + window/OLA). The C++ DCT-IV runs in double vs
    pocketfft f32 in the oracle, so PCM parity is a tight per-frame bound
    scaled by the stream's peak (the entropy/dequant stage itself stays
    exact and is asserted elsewhere)."""

    ATOL = 4e-6  # ~a few ulp of the (post-gain) signal scale

    def _stream(self, shapes=None, seqs=None, n=12, seed=5):
        rng = np.random.default_rng(seed)
        frames = []
        for f in range(n):
            seq = seqs[f % len(seqs)] if seqs else [0, 1, 2, 3][f % 4]
            shape = shapes[f % len(shapes)] if shapes else 0
            q = random_quant_spectrum(rng, 14, RATE, seq=seq)
            frames.append(build_raw_block([q], [seq], 14, GAIN, RATE,
                                          shape=shape))
        return build_adts(frames, RATE, 1)

    def _pair(self, data, monkeypatch):
        from symphonia_tpu import native

        monkeypatch.delenv("SYMPHONIA_TPU_AAC_STREAM", raising=False)
        r = AdtsReader(MediaSourceStream(data))
        track = r.default_track()
        dec_n = AacDecoder(track.codec_params)
        # Open the native context eagerly (decode() opens lazily).
        dec_n._native = native.aac_stream_open(
            dec_n.rate_idx, dec_n.bands_long, dec_n.bands_short,
            dec_n.spec.num_channels) or False
        monkeypatch.setenv("SYMPHONIA_TPU_AAC_STREAM", "off")
        dec_o = AacDecoder(track.codec_params)
        return r, dec_n, dec_o

    @pytest.mark.parametrize("shapes", [[1], [0, 1], [1, 0, 1, 1]])
    def test_kbd_and_shape_transitions(self, shapes, monkeypatch):
        """KBD windows + sine<->KBD prev-shape transitions across all four
        window sequences — previously zero synthetic shape coverage."""
        from symphonia_tpu import native

        if native.aac_stream_open(0, [0, 4], [0, 4], 1) is None:
            pytest.skip("native AAC stream unavailable")
        data = self._stream(shapes=shapes)
        r, dec_n, dec_o = self._pair(data, monkeypatch)
        if not (dec_n._native and dec_n._native.has_pcm):
            pytest.skip("native AAC pcm unavailable")
        peak = 1e-3
        while True:
            p = r.next_packet()
            if p is None:
                break
            a = dec_n.decode(p).planes()
            b = dec_o.decode(p).planes()
            assert a.shape == b.shape
            peak = max(peak, float(np.abs(b).max()))
            np.testing.assert_allclose(a, b, rtol=0, atol=self.ATOL * peak)
        # No silent fallback: the native context stayed engaged.
        assert dec_n._native

    def test_midstream_fallback_keeps_delay_continuity(self, monkeypatch):
        """When the native PCM path dies mid-stream, the Python fallback
        continues from the same OLA delay buffer (updated in place by
        C++) — output stays in parity with an all-oracle decode."""
        from symphonia_tpu import native

        if native.aac_stream_open(0, [0, 4], [0, 4], 1) is None:
            pytest.skip("native AAC stream unavailable")
        data = self._stream(shapes=[0], seqs=[0, 1, 2, 3], n=10, seed=7)
        r, dec_n, dec_o = self._pair(data, monkeypatch)
        if not (dec_n._native and dec_n._native.has_pcm):
            pytest.skip("native AAC pcm unavailable")
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(p)
        real_pcm = native.aac_stream_decode_pcm
        peak = 1e-3
        for i, p in enumerate(pkts):
            if i == 5:
                # Simulate a native failure: next call returns None.
                monkeypatch.setattr(native, "aac_stream_decode_pcm",
                                    lambda *a, **k: None)
            a = dec_n.decode(p).planes()
            b = dec_o.decode(p).planes()
            peak = max(peak, float(np.abs(b).max()))
            np.testing.assert_allclose(a, b, rtol=0, atol=self.ATOL * peak,
                                       err_msg=f"packet {i}")
        assert dec_n._native is False  # switched permanently
        monkeypatch.setattr(native, "aac_stream_decode_pcm", real_pcm)

    def test_reset_restarts_cleanly(self, monkeypatch):
        from symphonia_tpu import native

        if native.aac_stream_open(0, [0, 4], [0, 4], 1) is None:
            pytest.skip("native AAC stream unavailable")
        data = self._stream(shapes=[0, 1], n=8, seed=11)
        r, dec_n, _ = self._pair(data, monkeypatch)
        if not (dec_n._native and dec_n._native.has_pcm):
            pytest.skip("native AAC pcm unavailable")
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(p)
        first = [dec_n.decode(p).planes().copy() for p in pkts]
        dec_n.reset()
        second = [dec_n.decode(p).planes().copy() for p in pkts]
        for a, b in zip(first, second):
            np.testing.assert_array_equal(a, b)
