"""MP3 decode tests: real-file differential tests vs SDL_mixer (drmp3), a
synthetic MPEG1 stream cross-checked against the same reference decoder,
and unit tests of the dense-stage math vs analytical spec formulas
(SURVEY.md §4 test model)."""

import os
import pathlib

import numpy as np
import pytest

import symphonia_tpu as sym
from symphonia_tpu.codecs.mpa import MpaDecoder
from symphonia_tpu.codecs.mpa_common import parse_header, try_parse_header
from symphonia_tpu.core.errors import DecodeError
from symphonia_tpu.core.formats import FormatOptions
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.mpa import MpaReader
from symphonia_tpu.ops import mp3_dense as md

from mp3_builder import build_mpeg1_l3_stream, build_mpeg2_l3_frame

HOUSE_MP3 = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"


def our_decode(data: bytes, gapless: bool = False):
    r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=gapless))
    dec = MpaDecoder(r.default_track().codec_params)
    outs = []
    while True:
        p = r.next_packet()
        if p is None:
            break
        outs.append(dec.decode(p).planes().copy())
    return np.concatenate(outs, axis=1), r


def sdl_decode(path_or_bytes, rate: int, channels: int):
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame

    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=channels)
    if isinstance(path_or_bytes, bytes):
        import io

        snd = pygame.mixer.Sound(io.BytesIO(path_or_bytes))
    else:
        snd = pygame.mixer.Sound(path_or_bytes)
    raw = np.frombuffer(snd.get_raw(), dtype=np.int16).astype(np.float32) / 32768.0
    return raw.reshape(-1, channels).T


class TestRealFiles:
    def test_house_lo_vs_reference(self):
        with open(HOUSE_MP3, "rb") as f:
            data = f.read()
        ours, r = our_decode(data)
        h = r.header
        assert (h.version, h.sample_rate, h.n_channels) == (3, 11025, 1)
        ref = sdl_decode(HOUSE_MP3, h.sample_rate, h.n_channels)
        n = min(ours.shape[1], ref.shape[1])
        diff = np.abs(ours[:, :n] - ref[:, :n])
        # Reference output is s16-quantized: agree within 1 LSB + epsilon.
        assert diff.max() < 4.0 / 32768.0, diff.max()

    def test_probe_finds_mpa(self):
        with open(HOUSE_MP3, "rb") as f:
            data = f.read()
        probed = sym.get_probe().probe(MediaSourceStream(data))
        assert isinstance(probed.format, MpaReader)

    def test_seek(self):
        with open(HOUSE_MP3, "rb") as f:
            data = f.read()
        r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
        seeked = r.seek("coarse", sym.SeekTo(ts=5760))
        pkt = r.next_packet()
        assert pkt.ts == seeked.actual_ts


class TestSyntheticMpeg1:
    @pytest.mark.parametrize("n_ch", [1, 2])
    def test_vs_reference_decoder(self, n_ch):
        data = build_mpeg1_l3_stream(20, n_ch=n_ch, seed=n_ch)
        ours, r = our_decode(data)
        assert r.header.version == 1 and r.header.sample_rate == 44100
        ref = sdl_decode(data, 44100, n_ch)
        n = min(ours.shape[1], ref.shape[1])
        assert n >= 1152 * 18
        clipped = np.clip(ours[:, :n], -1.0, 32767.0 / 32768.0)
        diff = np.abs(clipped - ref[:, :n])
        assert diff.max() < 4.0 / 32768.0, diff.max()

    def test_header_parse(self):
        data = build_mpeg1_l3_stream(2, n_ch=2)
        h = try_parse_header(data, 0)
        assert h.version == 1 and h.layer == 3
        assert h.n_channels == 2
        assert h.frame_size == 144 * 128000 // 44100
        assert h.duration == 1152


class TestDenseMath:
    def test_imdct36_matrix_vs_analytic(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(18).astype(np.float32)
        T = md.hybrid_matrices()
        # Long window: y[i] = w[i] * sum_k x[k] cos(pi/72 (2i+19)(2k+1))
        w = md.imdct_windows()[md.BLOCK_LONG]
        expect = np.array(
            [
                w[i] * sum(
                    x[k] * np.cos(np.pi / 72 * (2 * i + 19) * (2 * k + 1))
                    for k in range(18)
                )
                for i in range(36)
            ]
        )
        got = T[md.BLOCK_LONG] @ x
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_short_matrix_vs_analytic(self):
        """Short block = 3 interleaved 12-point IMDCTs, windowed, overlaid
        at offsets 6, 12, 18 (hybrid_synthesis.rs imdct12_win)."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal(18).astype(np.float32)
        w = md.imdct_windows()[md.BLOCK_SHORT][:12]
        expect = np.zeros(36)
        for win in range(3):
            xw = x[win::3]
            y = np.array(
                [
                    sum(xw[k] * np.cos(np.pi / 24 * (2 * i + 7) * (2 * k + 1))
                        for k in range(6))
                    for i in range(12)
                ]
            )
            expect[6 + 6 * win : 18 + 6 * win] += y * w
        got = md.hybrid_matrices()[md.BLOCK_SHORT] @ x
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_polyphase_matches_direct_spec(self):
        """Superposition response == direct spec algorithm with V FIFO."""
        rng = np.random.default_rng(2)
        n_gran = 4
        subband = [rng.standard_normal((32, 18)).astype(np.float32) for _ in range(n_gran)]
        # Direct: spec algorithm with a 1024-sample V history.
        N = md.polyphase_matrix()
        D = md.synthesis_window()
        v_hist = np.zeros((16, 64), dtype=np.float32)
        direct = []
        for g in range(n_gran):
            S = subband[g].T  # [18, 32]
            for t in range(18):
                v_hist = np.roll(v_hist, 1, axis=0)
                v_hist[0] = N @ S[t]
                out = np.zeros(32, dtype=np.float32)
                for k in range(16):
                    sel = v_hist[k][:32] if k % 2 == 0 else v_hist[k][32:]
                    out += sel * D[k]
                direct.append(out)
        direct = np.concatenate(direct)
        # Superposition path.
        resp = [md.polyphase_response_np(sb) for sb in subband]
        ours = np.zeros(576 * n_gran + 480, dtype=np.float32)
        for g, r in enumerate(resp):
            ours[576 * g : 576 * g + 1056] += r
        np.testing.assert_allclose(ours[: 576 * n_gran], direct, atol=1e-4)

    def test_antialias_energy_preserving(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((32, 18)).astype(np.float32)
        y = md.antialias_np(x, 31)
        # cs^2 + ca^2 = 1: butterflies are rotations -> energy preserved.
        np.testing.assert_allclose(
            (x**2).sum(), (y**2).sum(), rtol=1e-5
        )

    def test_freq_inversion_mask(self):
        m = md.freq_inversion_mask()
        assert m[0, 1] == 1.0  # even subband untouched
        assert m[1, 1] == -1.0  # odd subband, odd sample negated
        assert m[1, 0] == 1.0


class TestGapless:
    def test_gapless_trims_applied(self):
        with open(HOUSE_MP3, "rb") as f:
            data = f.read()
        full, r1 = our_decode(data, gapless=False)
        trimmed, r2 = our_decode(data, gapless=True)
        t = r2.default_track()
        assert trimmed.shape[1] == full.shape[1] - t.delay - t.padding
        if t.delay:
            np.testing.assert_allclose(
                trimmed[:, :1000], full[:, t.delay : t.delay + 1000]
            )


class TestJaxDenseBatch:
    def test_matches_stateful_oracle(self):
        """Superposition device pipeline == stateful numpy chain."""
        import jax.numpy as jnp
        from symphonia_tpu.ops.mp3_dense import (
            GranuleDenseState,
            granule_dense_np,
            mp3_dense_batch_jax,
        )

        rng = np.random.default_rng(11)
        G, C = 6, 2
        x = (rng.standard_normal((G, C, 576)) * 0.1).astype(np.float32)
        bt = rng.integers(0, 4, size=(G, C)).astype(np.int32)
        # Stereo frames share block types across channels in practice, but
        # the math doesn't require it. 'mixed' only with short blocks.
        mixed = (bt == 2) & (rng.random((G, C)) < 0.5)

        # Oracle: sequential per channel.
        states = [GranuleDenseState() for _ in range(C)]
        expect = np.zeros((G, C, 576), np.float32)
        for g in range(G):
            for c in range(C):
                expect[g, c] = granule_dense_np(
                    x[g, c].copy(), int(bt[g, c]), bool(mixed[g, c]), states[c]
                )

        pcm, ht, st = mp3_dense_batch_jax(
            jnp.asarray(x), jnp.asarray(bt), jnp.asarray(mixed)
        )
        np.testing.assert_allclose(np.asarray(pcm), expect, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(ht), np.stack([s.hybrid_tail for s in states]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(st), np.stack([s.synth_tail for s in states]), atol=2e-5
        )

    def test_streaming_chain_equivalence(self):
        """Two chained batch calls == one combined call."""
        import jax.numpy as jnp
        from symphonia_tpu.ops.mp3_dense import mp3_dense_batch_jax

        rng = np.random.default_rng(12)
        G, C = 8, 1
        x = (rng.standard_normal((G, C, 576)) * 0.1).astype(np.float32)
        bt = np.zeros((G, C), np.int32)
        mixed = np.zeros((G, C), bool)
        full, _, _ = mp3_dense_batch_jax(jnp.asarray(x), jnp.asarray(bt), jnp.asarray(mixed))
        a, ht, st = mp3_dense_batch_jax(jnp.asarray(x[:3]), jnp.asarray(bt[:3]), jnp.asarray(mixed[:3]))
        b, _, _ = mp3_dense_batch_jax(jnp.asarray(x[3:]), jnp.asarray(bt[3:]), jnp.asarray(mixed[3:]), ht, st)
        got = np.concatenate([np.asarray(a), np.asarray(b)], axis=0)
        np.testing.assert_allclose(got, np.asarray(full), atol=1e-6)


class TestMp3BatchDecoder:
    def test_matches_sequential_decoder(self):
        import pytest
        from symphonia_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        from symphonia_tpu.batch import Mp3BatchDecoder

        with open(HOUSE_MP3, "rb") as f:
            data = f.read()
        ours, r = our_decode(data, gapless=False)
        batch = Mp3BatchDecoder(gapless=False).decode_bytes(data)
        n = min(ours.shape[1], batch.samples.shape[1])
        np.testing.assert_allclose(batch.samples[:, :n], ours[:, :n], atol=2e-5)

    def test_native_entropy_exact_vs_python(self):
        import pytest
        from symphonia_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        from symphonia_tpu.codecs.mpa import Layer3State, decode_layer3_frame
        from symphonia_tpu.codecs.mpa_common import parse_header as ph
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.ops.mp3_dense import GranuleDenseState, granule_dense_np

        data = build_mpeg1_l3_stream(8, n_ch=2, seed=7)
        r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
        out = native.mp3_extract(r._buf, r._offsets, r._sizes, max_granules=40)
        assert (out["status"] == 0).all()
        st = Layer3State()
        pcm_py = []
        for o, s in zip(r._offsets, r._sizes):
            frame = r._buf[o : o + s]
            pcm_py.append(decode_layer3_frame(ph(int.from_bytes(frame[:4], "big")), frame, st))
        pcm_py = np.concatenate(pcm_py, axis=1)
        ds = [GranuleDenseState(), GranuleDenseState()]
        chans = [[], []]
        for g in range(out["n_granules"]):
            for c in range(2):
                chans[c].append(
                    granule_dense_np(out["spectra"][g, c].copy(),
                                     int(out["bt"][g, c]),
                                     bool(out["mixed"][g, c]), ds[c])
                )
        pcm_nat = np.stack([np.concatenate(c) for c in chans])
        n = min(pcm_nat.shape[1], pcm_py.shape[1])
        np.testing.assert_array_equal(pcm_nat[:, :n], pcm_py[:, :n])

    def test_native_entropy_exact_all_tables(self):
        """Stress the native Huffman fast path across the table landscape:
        linbits escapes (tables 16/20/24/30), codes longer than the 12-bit
        probe (tables 13/15 -> generic-path misses), and count1 table A —
        bit-exact against the Python oracle (builder mirrors the decoder's
        own spec tables)."""
        import pytest
        from symphonia_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        from mp3_builder import build_mpeg1_l3_frame, big_table_encoder
        from symphonia_tpu.codecs.mpa_common import parse_header as ph
        from symphonia_tpu.core.io import MediaSourceStream

        rng = np.random.default_rng(21)
        frames = []
        tables = [1, 2, 5, 7, 10, 13, 15, 16, 20, 24, 30]
        for fi, ts in enumerate(tables):
            _, linbits = big_table_encoder(ts)
            # Magnitude cap per table family (wrap-1 for small tables, 15 +
            # escape range when linbits exist).
            caps = {1: 1, 2: 2, 5: 3, 7: 5, 10: 7, 13: 15, 15: 15}
            cap = caps.get(ts, 15 + (1 << linbits) - 1)
            gspecs = []
            for _gr in range(2):
                chans = []
                for _ch in range(2):
                    bigs = []
                    for _ in range(16):
                        x = int(rng.integers(0, cap + 1))
                        y = int(rng.integers(0, cap + 1))
                        if x:
                            x *= int(rng.choice([-1, 1]))
                        if y:
                            y *= int(rng.choice([-1, 1]))
                        bigs.append((x, y))
                    quads = [tuple(int(v) for v in rng.integers(-1, 2, size=4))
                             for _ in range(int(rng.integers(2, 10)))]
                    chans.append({
                        "big_pairs": bigs,
                        "quad_pattern": quads,
                        "big_table": ts,
                        "count1table": int(fi % 2),  # exercise A and B
                        "global_gain": 200,
                    })
                gspecs.append(chans)
            frames.append(build_mpeg1_l3_frame(gspecs, n_ch=2,
                                               bitrate_idx=14))
        data = b"".join(frames)
        r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
        assert len(r._offsets) == len(tables)
        out = native.mp3_extract(r._buf, r._offsets, r._sizes,
                                 max_granules=4 * len(tables),
                                 prep_flags=0)
        assert (out["status"] == 0).all()
        from symphonia_tpu.codecs import mpa_layer3 as l3
        from symphonia_tpu.core.io import BitReaderLtr

        gi = 0
        for o, sz in zip(r._offsets, r._sizes):
            frame = bytes(r._buf[o:o + sz])
            hdr = ph(int.from_bytes(frame[:4], "big"))
            pos = 4 + (2 if hdr.has_crc else 0)
            side_len = hdr.side_info_len()
            fd = l3.read_side_info(BitReaderLtr(frame[pos:pos + side_len]),
                                   hdr)
            assert fd.main_data_begin == 0
            mbr = BitReaderLtr(frame[pos + side_len:hdr.frame_size])
            for g in range(2):
                for c in range(2):
                    gc = fd.granules[g][c]
                    part2 = l3.read_scale_factors_mpeg1(mbr, g, c, fd)
                    spec = l3.read_huffman_samples(
                        mbr, gc, gc.part2_3_length - part2)
                    np.testing.assert_array_equal(
                        out["spectra"][gi + g, c], spec,
                        err_msg=f"granule {gi+g} ch {c} "
                                f"(table {tables[gi // 2]})")
            gi += 2

    def test_native_joint_stereo_parity(self):
        """Joint-stereo (mid-side / intensity / both) spectra parity:
        native stereo() (stereo.rs:143-340 mirror) vs the Python oracle,
        bit-exact after requantize+stereo+reorder (prep_flags=7)."""
        import pytest
        from symphonia_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        from mp3_builder import build_mpeg1_l3_frame
        from symphonia_tpu.codecs import mpa_layer3 as l3
        from symphonia_tpu.codecs.mpa_common import parse_header as ph
        from symphonia_tpu.core.io import BitReaderLtr, MediaSourceStream

        rng = np.random.default_rng(5)
        frames = []
        modes = [2, 1, 3, 2, 1, 3]  # MS, intensity, both
        for mode_ext in modes:
            gspecs = []
            for _gr in range(2):
                chans = []
                for ch in range(2):
                    # ch1 sparser so an intensity zero-partition exists.
                    n_big = 30 if ch == 0 else 12
                    bigs = [(int(rng.integers(-5, 6)), int(rng.integers(-5, 6)))
                            for _ in range(n_big)]
                    quads = ([tuple(int(v) for v in rng.integers(-1, 2, size=4))
                              for _ in range(4)] if ch == 0 else [])
                    chans.append({"big_pairs": bigs, "quad_pattern": quads,
                                  "big_table": 7, "global_gain": 195})
                gspecs.append(chans)
            frames.append(build_mpeg1_l3_frame(
                gspecs, n_ch=2, bitrate_idx=12, channel_mode=1,
                mode_ext=mode_ext))
        data = b"".join(frames)
        r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
        assert len(r._offsets) == len(modes)
        out = native.mp3_extract(r._buf, r._offsets, r._sizes,
                                 max_granules=4 * len(modes), prep_flags=7)
        assert (out["status"] == 0).all()
        gi = 0
        for o, sz in zip(r._offsets, r._sizes):
            frame = bytes(r._buf[o:o + sz])
            hdr = ph(int.from_bytes(frame[:4], "big"))
            assert hdr.is_intensity_stereo or hdr.is_mid_side
            pos = 4 + (2 if hdr.has_crc else 0)
            side_len = hdr.side_info_len()
            fd = l3.read_side_info(BitReaderLtr(frame[pos:pos + side_len]),
                                   hdr)
            mbr = BitReaderLtr(frame[pos + side_len:hdr.frame_size])
            for g in range(2):
                spectra = []
                for c in range(2):
                    gc = fd.granules[g][c]
                    part2 = l3.read_scale_factors_mpeg1(mbr, g, c, fd)
                    spec = l3.read_huffman_samples(
                        mbr, gc, gc.part2_3_length - part2)
                    l3.requantize(hdr, gc, spec)
                    spectra.append(spec)
                l3.stereo(hdr, fd.granules[g], spectra[0], spectra[1])
                for c in range(2):
                    l3.reorder(hdr, fd.granules[g][c], spectra[c])
                    np.testing.assert_array_equal(
                        out["spectra"][gi + g, c], spectra[c],
                        err_msg=f"granule {gi+g} ch {c} mode_ext")
            gi += 2

    def test_native_mpeg2_intensity_parity(self):
        """MPEG2 (LSF) intensity stereo: the is_ratio_m2 tables and the
        read_scf_mpeg2 intensity branch (stereo.rs MPEG2 half) had no
        coverage — house_lo is MPEG2.5 mono. Native vs Python oracle,
        bit-exact spectra, across scalefac_compress values (even = scale
        2^-1/4 table, odd = 2^-1/2) and plain MS."""
        import pytest
        from symphonia_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        from mp3_builder import build_mpeg2_l3_frame
        from symphonia_tpu.codecs import mpa_layer3 as l3
        from symphonia_tpu.codecs.mpa_common import parse_header as ph
        from symphonia_tpu.core.io import BitReaderLtr, MediaSourceStream

        rng = np.random.default_rng(9)
        cases = [(1, 0), (1, 2), (3, 4), (2, 0), (1, 6)]  # (mode_ext, sfc)
        frames = []
        for mode_ext, sfc in cases:
            specs = []
            for ch in range(2):
                n_big = 26 if ch == 0 else 10
                specs.append({
                    "big_pairs": [(int(rng.integers(-5, 6)),
                                   int(rng.integers(-5, 6)))
                                  for _ in range(n_big)],
                    "quad_pattern": ([(1, 0, -1, 1)] if ch == 0 else []),
                    "big_table": 7,
                    "global_gain": 190,
                })
            frames.append(build_mpeg2_l3_frame(
                specs, n_ch=2, channel_mode=1, mode_ext=mode_ext,
                scalefac_compress=sfc, bitrate_idx=12))
        data = b"".join(frames)
        r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
        assert len(r._offsets) == len(cases)
        out = native.mp3_extract(r._buf, r._offsets, r._sizes,
                                 max_granules=2 * len(cases), prep_flags=7)
        assert (out["status"] == 0).all()
        gi = 0
        for o, sz in zip(r._offsets, r._sizes):
            frame = bytes(r._buf[o:o + sz])
            hdr = ph(int.from_bytes(frame[:4], "big"))
            assert not hdr.is_mpeg1
            pos = 4 + (2 if hdr.has_crc else 0)
            side_len = hdr.side_info_len()
            fd = l3.read_side_info(BitReaderLtr(frame[pos:pos + side_len]),
                                   hdr)
            mbr = BitReaderLtr(frame[pos + side_len:hdr.frame_size])
            spectra = []
            for c in range(2):
                gc = fd.granules[0][c]
                part2 = l3.read_scale_factors_mpeg2(
                    mbr, (c == 1) and hdr.is_intensity_stereo, gc)
                spec = l3.read_huffman_samples(
                    mbr, gc, gc.part2_3_length - part2)
                l3.requantize(hdr, gc, spec)
                spectra.append(spec)
            l3.stereo(hdr, fd.granules[0], spectra[0], spectra[1])
            for c in range(2):
                l3.reorder(hdr, fd.granules[0][c], spectra[c])
                np.testing.assert_array_equal(
                    out["spectra"][gi, c], spectra[c],
                    err_msg=f"mpeg2 granule {gi} ch {c}")
            gi += 1


class TestMpaStreaming:
    """MpaStreamReader: frame-at-a-time over the MSS window on pipes, with
    gapless trims preserved (delay at head, LAME padding at EOF)."""

    def test_pipe_parity_with_bulk(self):
        from test_flac import _FwdPipe
        from symphonia_tpu.formats.mpa import MpaReader, MpaStreamReader

        data = pathlib.Path(HOUSE_MP3).read_bytes()
        r0 = MpaReader(MediaSourceStream(data))
        bulk = []
        while True:
            p = r0.next_packet()
            if p is None:
                break
            bulk.append(p)
        r = MpaStreamReader(MediaSourceStream(_FwdPipe(data)))
        got = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            got.append(p)
        assert [(p.ts, p.dur, p.trim_start, p.trim_end, p.data) for p in got] \
            == [(p.ts, p.dur, p.trim_start, p.trim_end, p.data) for p in bulk]

    def test_probe_routes_pipe(self):
        import symphonia_tpu as sym
        from test_flac import _FwdPipe
        from symphonia_tpu.formats.mpa import MpaStreamReader

        data = pathlib.Path(HOUSE_MP3).read_bytes()
        probed = sym.get_probe().probe(MediaSourceStream(_FwdPipe(data)))
        assert isinstance(probed.format, MpaStreamReader)


class TestMp3EngineParity:
    """The 8-lane AVX-512 engine (n_frames >= 8) must be bit-identical to
    the scalar path across content shapes. The engine choice is cached per
    process, so each runs in a subprocess."""

    def test_engines_bit_identical(self, tmp_path):
        import os
        import subprocess
        import sys as _sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tdir = os.path.dirname(os.path.abspath(__file__))
        gen = tmp_path / "gen.py"
        gen.write_text(
            """
import pathlib, sys, pickle
sys.path.insert(0, %r); sys.path.insert(0, %r)
import numpy as np
from mp3_builder import (big_table_encoder, build_mpeg1_l3_frame,
                         build_mpeg1_l3_stream, build_mpeg2_l3_frame)
rng = np.random.default_rng(77)
cases = [build_mpeg1_l3_stream(12, n_ch=2, seed=3),
         build_mpeg1_l3_stream(9, n_ch=1, seed=4)]
# All-table landscape incl. linbits escapes and >12-bit codes.
frames = []
for fi, ts in enumerate([1, 2, 5, 7, 10, 13, 15, 16, 20, 24, 30]):
    _, linbits = big_table_encoder(ts)
    caps = {1: 1, 2: 2, 5: 3, 7: 5, 10: 7, 13: 15, 15: 15}
    cap = caps.get(ts, 15 + (1 << linbits) - 1)
    gspecs = []
    for _gr in range(2):
        chans = []
        for _ch in range(2):
            bigs = [(int(rng.integers(-cap, cap + 1)),
                     int(rng.integers(-cap, cap + 1))) for _ in range(16)]
            quads = [tuple(int(v) for v in rng.integers(-1, 2, size=4))
                     for _ in range(int(rng.integers(2, 10)))]
            chans.append({"big_pairs": bigs, "quad_pattern": quads,
                          "big_table": ts, "count1table": int(fi %% 2),
                          "global_gain": 200})
        gspecs.append(chans)
    frames.append(build_mpeg1_l3_frame(gspecs, n_ch=2, bitrate_idx=14))
cases.append(b"".join(frames))
# MPEG2 LSF frames (1 granule, 9-bit scalefac_compress path).
m2 = []
for f in range(10):
    gspecs = [{"big_pairs": [(int(rng.integers(-3, 4)),
                              int(rng.integers(-3, 4))) for _ in range(12)],
               "quad_pattern": [(1, 0, -1, 1)] * 3, "big_table": 5,
               "count1table": 0, "global_gain": 190}
              for _ in range(2)]
    m2.append(build_mpeg2_l3_frame(gspecs, n_ch=2))
cases.append(b"".join(m2))
cases.append(pathlib.Path("/opt/venv/lib/python3.12/site-packages/pygame/examples/"
                  "data/house_lo.mp3").read_bytes())
pathlib.Path(sys.argv[1]).write_bytes(pickle.dumps(cases))
"""
            % (root, tdir)
        )
        run = tmp_path / "run.py"
        run.write_text(
            """
import pathlib, sys, pickle
sys.path.insert(0, %r)
import numpy as np
from symphonia_tpu import native
from symphonia_tpu.core.formats import FormatOptions
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.mpa import MpaReader
cases = pickle.loads(pathlib.Path(sys.argv[1]).read_bytes())
outs = []
for data in cases:
    r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
    o = native.mp3_extract(r._buf, r._offsets, r._sizes,
                           max_granules=2 * len(r._offsets) + 2)
    n = o["n_granules"]
    outs.append((n, o["spectra"][:n].tobytes(), o["bt"][:n].tobytes(),
                 o["mixed"][:n].tobytes(), o["gr_frame"][:n].tobytes(),
                 o["status"].tobytes()))
pickle.dump(outs, open(sys.argv[2], "wb"))
"""
            % root
        )
        import pickle

        cases_p = tmp_path / "cases.pkl"
        subprocess.run([_sys.executable, str(gen), str(cases_p)], check=True)
        results = {}
        for mode in ("simd", "scalar"):
            env = dict(os.environ)
            if mode == "scalar":
                env["SYMPHONIA_TPU_MP3_ENGINE"] = "scalar"
            else:
                env.pop("SYMPHONIA_TPU_MP3_ENGINE", None)
            out_p = tmp_path / f"out_{mode}.pkl"
            subprocess.run(
                [_sys.executable, str(run), str(cases_p), str(out_p)],
                check=True, env=env)
            results[mode] = pickle.loads(pathlib.Path(out_p).read_bytes())
        assert len(results["simd"]) == len(results["scalar"]) == 5
        for i, (a, b) in enumerate(zip(results["simd"], results["scalar"])):
            assert a[0] > 0, f"case {i}: no granules decoded"
            assert a == b, f"case {i}: engine outputs differ"


class TestPerPacketNativeStream:
    """The per-packet AudioDecoder fast path (sh_mp3_stream_decode: C++
    carried reservoir + fused dense stage) vs the pure-Python oracle
    path, over real MPEG2.5 mono and synthetic MPEG1 stereo streams."""

    def _decode_forced(self, data, monkeypatch, mode):
        if mode == "off":
            monkeypatch.setenv("SYMPHONIA_TPU_MP3_STREAM", "off")
        else:
            monkeypatch.delenv("SYMPHONIA_TPU_MP3_STREAM", raising=False)
        r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
        dec = MpaDecoder(r.default_track().codec_params)
        outs = []
        n_native = 0
        while True:
            p = r.next_packet()
            if p is None:
                break
            try:
                outs.append(dec.decode(p).planes().copy())
            except DecodeError:
                continue
        if mode != "off":
            n_native = 1 if dec._l3.stream else 0
        return np.concatenate(outs, axis=1), n_native

    @pytest.mark.parametrize("content",
                             ["house", "mpeg1_stereo", "mpeg2_stereo",
                              "mpeg1_mono", "mpeg25_stereo"])
    def test_stream_matches_oracle(self, content, monkeypatch):
        from symphonia_tpu import native

        if native.mp3_stream_open() is None:
            pytest.skip("native stream API unavailable")
        if content == "house":
            with open(HOUSE_MP3, "rb") as f:
                data = f.read()
        elif content == "mpeg2_stereo":
            # Regression: n_gr=1 stereo previously wrote channel 1 into
            # row 0's tail (fixed [2][2*576] stride bug) — ch 1 came back
            # as uninitialized memory on the native path.
            rng = np.random.default_rng(3)
            fr = []
            for _ in range(8):
                gspecs = [{"big_pairs": [(int(rng.integers(-3, 4)),
                                          int(rng.integers(-3, 4)))
                                         for _ in range(40)],
                           "quad_pattern": [(1, 0, -1, 1)] * 3,
                           "big_table": 5, "count1table": 0,
                           "global_gain": 190} for _ in range(2)]
                fr.append(build_mpeg2_l3_frame(gspecs, n_ch=2))
            data = b"".join(fr)
        elif content == "mpeg25_stereo":
            # MPEG2.5 stereo: completes the version x n_ch matrix (house
            # covers 2.5 mono; the stride bug taught that native parity
            # must span every (n_gr, n_ch) header combination).
            rng = np.random.default_rng(11)
            fr = []
            for _ in range(8):
                gspecs = [{"big_pairs": [(int(rng.integers(-3, 4)),
                                          int(rng.integers(-3, 4)))
                                         for _ in range(30)],
                           "quad_pattern": [(0, 1, -1, 0)] * 4,
                           "big_table": 5, "count1table": 0,
                           "global_gain": 188} for _ in range(2)]
                fr.append(build_mpeg2_l3_frame(gspecs, n_ch=2, version=2.5))
            data = b"".join(fr)
        elif content == "mpeg1_mono":
            data = build_mpeg1_l3_stream(24, n_ch=1, seed=13)
        else:
            data = build_mpeg1_l3_stream(24, n_ch=2, seed=7)
        a, used_native = self._decode_forced(data, monkeypatch, "on")
        b, _ = self._decode_forced(data, monkeypatch, "off")
        assert used_native == 1
        assert a.shape == b.shape
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() <= 1e-4 * scale, np.abs(a - b).max()

    def test_native_dense_granule_parity(self):
        """sh_mp3_dense_granule vs granule_dense_np over chained granules
        of every block type, shared carried state."""
        from symphonia_tpu import native

        if native._load() is None or not native._mp3_ensure_dense(native._load()):
            pytest.skip("native dense stage unavailable")
        rng = np.random.default_rng(5)
        s_py = md.GranuleDenseState()
        s_nat = md.GranuleDenseState()
        for it in range(40):
            bt = int(rng.integers(0, 4))
            mixed = bool(bt == md.BLOCK_SHORT and rng.random() < 0.5)
            x = (rng.standard_normal(576) * 0.5).astype(np.float32)
            a = md.granule_dense_np(x.copy(), bt, mixed, s_py)
            b = native.mp3_dense_granule(x, bt, mixed, s_nat.hybrid_tail,
                                         s_nat.synth_tail)
            assert b is not None
            scale = max(np.abs(a).max(), 1e-3)
            assert np.abs(a - b).max() <= 2e-5 * scale, it

    def test_state_interop_mid_stream(self, monkeypatch):
        """The native and Python paths share dense-tail/reservoir state:
        disabling the native context mid-stream must keep PCM continuous
        (no reset glitch) within float tolerance."""
        from symphonia_tpu import native

        if native.mp3_stream_open() is None:
            pytest.skip("native stream API unavailable")
        monkeypatch.delenv("SYMPHONIA_TPU_MP3_STREAM", raising=False)
        data = build_mpeg1_l3_stream(24, n_ch=2, seed=11)
        ref, _ = self._decode_forced(data, monkeypatch, "off")

        r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
        dec = MpaDecoder(r.default_track().codec_params)
        outs = []
        i = 0
        while True:
            p = r.next_packet()
            if p is None:
                break
            if i == 12:
                # Kill the native context mid-stream: subsequent packets
                # take the Python path against the SAME carried state.
                dec._l3.stream = False
            try:
                outs.append(dec.decode(p).planes().copy())
            except DecodeError:
                continue
            i += 1
        got = np.concatenate(outs, axis=1)
        assert got.shape == ref.shape
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(got - ref).max() <= 1e-4 * scale


class TestImpossibleLamePadding:
    """A LAME tag whose delay+padding exceeds the actual decoded total
    (truncated stream vs its tag): the reader sanitizes padding to 0 for
    the per-packet trims, and the batch path must agree (it used to trim
    with the raw padding and return a different length)."""

    def _with_xing(self, data: bytes, enc_delay_extra=0, padding_field=2529):
        r = MpaReader(MediaSourceStream(data), FormatOptions())
        fs = int(r._sizes[0])
        hdr = data[int(r._offsets[0]) : int(r._offsets[0]) + 4]
        trim = (enc_delay_extra << 12) | padding_field
        tag = (b"Xing" + (1).to_bytes(4, "big")
               + len(r._offsets).to_bytes(4, "big")
               + b"LAME3.100" + bytes(12) + trim.to_bytes(3, "big"))
        side = 17  # MPEG1 mono side-info length
        body = bytearray(fs - 4)
        body[side : side + len(tag)] = tag
        assert side + len(tag) <= len(body)
        return bytes(hdr) + bytes(body) + data

    def test_batch_matches_packet_path(self):
        from symphonia_tpu.batch import Mp3BatchDecoder

        data = self._with_xing(build_mpeg1_l3_stream(2, n_ch=1, seed=9))
        pkt, r = our_decode(data, gapless=True)
        t = r.default_track()
        assert t.delay == 529 and t.padding == 0  # sanitized: 2000 > total
        batch = Mp3BatchDecoder(gapless=True).decode_bytes(data)
        assert batch.samples.shape[1] == pkt.shape[1]


class TestFallbackSkipsCorruptPackets:
    def test_corrupt_mid_frame_does_not_abort(self):
        """One recoverable corrupt packet must not abort _fallback_decode
        (the reference loop and play.py skip per packet)."""
        from symphonia_tpu.batch import _fallback_decode

        data = bytearray(build_mpeg1_l3_stream(8, n_ch=1, seed=12))
        r = MpaReader(MediaSourceStream(bytes(data)), FormatOptions())
        # Corrupt frame 4's payload: force main_data_begin != 0 so the
        # decoder raises 'bit reservoir underflow' for that packet.
        off = int(r._offsets[4])
        data[off + 4] = 0xFF  # first side-info byte: main_data_begin
        out = _fallback_decode(bytes(data), gapless=False)
        assert out.samples.shape[1] >= 7 * 1152
