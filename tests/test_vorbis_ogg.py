"""OGG demux + Vorbis decode tests: differential vs SDL (stb_vorbis), page
parsing, mapper behavior, metadata, and seek."""

import io
import os
import pathlib

import numpy as np
import pytest

import symphonia_tpu as sym
from symphonia_tpu.codecs.vorbis import VorbisDecoder, floor1_synthesis, _render_point
from symphonia_tpu.codecs.vorbis_setup import float32_unpack, ilog, lookup1_values
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.ogg import OggReader, parse_page

HOUSE_OGG = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"


def our_decode(data: bytes):
    r = OggReader(MediaSourceStream(data))
    track = r.default_track()
    dec = VorbisDecoder(track.codec_params)
    outs = []
    while True:
        p = r.next_packet()
        if p is None:
            break
        buf = dec.decode(p)
        if len(buf):
            outs.append(buf.planes().copy())
    return np.concatenate(outs, axis=1), r, track


def sdl_decode(path: str, rate: int, channels: int):
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame

    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=channels)
    raw = np.frombuffer(pygame.mixer.Sound(path).get_raw(), dtype=np.int16)
    return (raw.astype(np.float32) / 32768.0).reshape(-1, channels).T


class TestVorbisEndToEnd:
    def test_house_lo_vs_reference(self):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        ours, r, track = our_decode(data)
        assert track.codec_params.codec == "vorbis"
        ref = sdl_decode(HOUSE_OGG, track.codec_params.sample_rate,
                         track.codec_params.channels.count)
        n = min(ours.shape[1], ref.shape[1])
        assert n == track.num_frames  # sample-count parity incl. end trim
        clipped = np.clip(ours[:, :n], -1.0, 32767.0 / 32768.0)
        diff = np.abs(clipped - ref[:, :n])
        assert diff.max() < 4.0 / 32768.0, diff.max()

    def test_probe_finds_ogg(self):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        probed = sym.get_probe().probe(MediaSourceStream(data))
        assert isinstance(probed.format, OggReader)

    def test_metadata_comment(self):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        r = OggReader(MediaSourceStream(data))
        rev = r.metadata().current()
        assert rev is not None and rev.vendor is not None

    def test_seek_and_redecode(self):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        full, r, track = our_decode(data)
        r2 = OggReader(MediaSourceStream(data))
        dec = VorbisDecoder(track.codec_params)
        seeked = r2.seek("accurate", sym.SeekTo(ts=30000))
        dec.reset()
        outs = []
        ts0 = None
        while True:
            p = r2.next_packet()
            if p is None:
                break
            buf = dec.decode(p)
            if len(buf):
                if ts0 is None:
                    ts0 = p.ts
                outs.append(buf.planes().copy())
        got = np.concatenate(outs, axis=1)
        ref = full[:, ts0 : ts0 + got.shape[1]]
        np.testing.assert_allclose(got[:, : ref.shape[1]], ref, atol=1e-6)


class TestOggPage:
    def test_roundtrip_page(self):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        page, nxt = parse_page(data, 0)
        assert page.header_type & 0x02  # BOS
        assert page.packets and page.packets[0][:7] == b"\x01vorbis"
        # CRC corruption must be caught.
        bad = bytearray(data[:nxt])
        bad[-1] ^= 0xFF
        from symphonia_tpu.core.errors import DecodeError

        with pytest.raises(DecodeError):
            parse_page(bytes(bad), 0)


class TestVorbisPrimitives:
    def test_ilog(self):
        assert ilog(0) == 0
        assert ilog(1) == 1
        assert ilog(2) == 2
        assert ilog(3) == 2
        assert ilog(4) == 3
        assert ilog(7) == 3

    def test_float32_unpack(self):
        # 1.0 = mantissa 1, exponent 788.
        assert float32_unpack((788 << 21) | 1) == 1.0
        assert float32_unpack((788 << 21) | 1 | 0x80000000) == -1.0
        assert float32_unpack((787 << 21) | 2) == 1.0

    def test_lookup1_values(self):
        assert lookup1_values(8, 3) == 2  # 2^3 = 8
        assert lookup1_values(26, 3) == 2
        assert lookup1_values(27, 3) == 3
        assert lookup1_values(16, 2) == 4

    def test_render_point(self):
        assert _render_point(0, 0, 10, 10, 5) == 5
        assert _render_point(0, 10, 10, 0, 5) == 5
        assert _render_point(0, 0, 4, 2, 1) == 0

    def test_imdct_matrix_matches_analytic(self):
        from symphonia_tpu.codecs.vorbis import imdct_matrix

        rng = np.random.default_rng(0)
        x = rng.standard_normal(16).astype(np.float32)
        got = imdct_matrix(32) @ x
        n_in, n_out = 16, 32
        expect = np.array(
            [
                sum(
                    x[j] * np.cos(np.pi / (2 * n_out) * (2 * i + 1 + n_in) * (2 * j + 1))
                    for j in range(n_in)
                )
                for i in range(n_out)
            ]
        )
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_window_shape(self):
        from symphonia_tpu.codecs.vorbis import vorbis_window

        w = vorbis_window(512)
        assert len(w) == 256
        # Princen-Bradley: w[i]^2 + w[len-1-i]^2 == 1 across the lap.
        np.testing.assert_allclose(w**2 + w[::-1] ** 2, np.ones(256), atol=1e-6)


class TestChainedStreams:
    def test_chained_raises_reset_required(self):
        from symphonia_tpu.core.errors import ResetRequired

        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        chained = data + data  # two physical streams back to back
        r = OggReader(MediaSourceStream(chained))
        n1 = 0
        saw_reset = False
        while True:
            try:
                p = r.next_packet()
            except ResetRequired:
                saw_reset = True
                break
            if p is None:
                break
            n1 += 1
        assert saw_reset and n1 > 0
        # After the reset, the second stream's packets are available.
        dec = VorbisDecoder(r.default_track().codec_params)
        n2 = 0
        while True:
            p = r.next_packet()
            if p is None:
                break
            dec.decode(p)
            n2 += 1
        assert n2 == n1


class TestVorbisBatchDecoder:
    def test_matches_per_packet_decoder(self):
        from symphonia_tpu.batch import VorbisBatchDecoder

        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        full, r, track = our_decode(data)
        batch = VorbisBatchDecoder().decode_bytes(data)
        n = min(full.shape[1], batch.samples.shape[1])
        assert n > 0.95 * full.shape[1]
        np.testing.assert_allclose(batch.samples[:, :n], full[:, :n], atol=1e-5)


class TestNativeVorbisEntropy:
    """Native C++ entropy stage (native/vorbis_entropy.cpp) vs the Python
    oracle — exact spectra match expected."""

    def test_house_exact(self):
        from symphonia_tpu import native

        if not native.available():
            pytest.skip("native lib unavailable")
        data = pathlib.Path(HOUSE_OGG).read_bytes()
        r = OggReader(MediaSourceStream(data))
        dec = VorbisDecoder(r.default_track().codec_params)
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(bytes(p.data))
        out = native.vorbis_decode_spectra(dec, pkts)
        assert out is not None
        spectra, flags, status = out
        assert (status == 0).all()
        for i, p in enumerate(pkts):
            sp, fl = dec.decode_spectra(p)
            assert fl == bool(flags[i])
            np.testing.assert_array_equal(spectra[i, :, : sp.shape[1]], sp)

    def test_batch_uses_native(self):
        from symphonia_tpu.batch import VorbisBatchDecoder

        data = pathlib.Path(HOUSE_OGG).read_bytes()
        out = VorbisBatchDecoder().decode_bytes(data)
        assert out.samples.shape[0] >= 1
        assert out.samples.shape[1] > 50000
        # Cross-check a stretch against the per-packet streaming decoder.
        import symphonia_tpu as sym
        from symphonia_tpu.core.io import MediaSourceStream as MSS

        probed = sym.get_probe().probe(MSS(data))
        dec = sym.get_codecs().make_audio_decoder(
            probed.format.default_track().codec_params)
        bufs = []
        while sum(b.shape[1] for b in bufs) < 30000:
            pkt = probed.format.next_packet()
            if pkt is None:
                break
            bufs.append(dec.decode(pkt).planes().copy())
        ref = np.concatenate(bufs, axis=1)
        n = min(ref.shape[1], out.samples.shape[1])
        np.testing.assert_allclose(out.samples[:, :n], ref[:, :n], atol=1e-6)


from conftest import ForwardPipe as _Pipe  # noqa: E402



class TestOggStreaming:
    """OggStreamReader: incremental page reading (demuxer.rs:134),
    bounded memory on unseekable sources, and granule-bisection seek
    (demuxer.rs:163-304) — parity with the read-all table path."""

    def _bulk_packets(self, data):
        r = OggReader(MediaSourceStream(data))
        out = []
        while True:
            p = r.next_packet()
            if p is None:
                return out
            out.append(p)

    def test_pipe_decode_bounded_memory_parity(self):
        from symphonia_tpu.formats.ogg import OggStreamReader

        data = pathlib.Path(HOUSE_OGG).read_bytes()
        mss = MediaSourceStream(_Pipe(data))
        r = OggStreamReader(mss)
        got, max_win = [], 0
        while True:
            p = r.next_packet()
            max_win = max(max_win, len(mss._buf))
            if p is None:
                break
            got.append(p)
        bulk = self._bulk_packets(data)
        assert [p.data for p in got] == [p.data for p in bulk]
        assert [(p.ts, p.dur, p.trim_start, p.trim_end) for p in got] == \
               [(p.ts, p.dur, p.trim_start, p.trim_end) for p in bulk]
        # O(window) memory: far below the 193 kB file.
        assert max_win < 128 * 1024

    def test_probe_routes_pipe_to_streaming(self):
        from symphonia_tpu.formats.ogg import OggStreamReader

        data = pathlib.Path(HOUSE_OGG).read_bytes()
        probed = sym.get_probe().probe(MediaSourceStream(_Pipe(data)))
        assert isinstance(probed.format, OggStreamReader)
        assert probed.format.default_track().codec_params.codec == "vorbis"

    def test_bisection_seek_parity(self):
        from symphonia_tpu.core.formats import SeekMode, SeekTo
        from symphonia_tpu.formats.ogg import OggStreamReader

        data = pathlib.Path(HOUSE_OGG).read_bytes()
        bulk = self._bulk_packets(data)
        total = bulk[-1].ts + bulk[-1].dur
        by_data = {p.data: p for p in bulk}
        r = OggStreamReader(MediaSourceStream(data))
        for frac in (0.0, 0.15, 0.4, 0.62, 0.9, 0.99):
            ts = int(total * frac)
            seeked = r.seek(SeekMode.ACCURATE, SeekTo(ts=ts))
            assert seeked.actual_ts <= ts
            # Timestamps after seek match the table path exactly (the
            # mapper is primed with the pre-landing packet's block size).
            p1 = r.next_packet()
            p2 = r.next_packet()
            assert p1.ts <= ts
            assert by_data[p1.data].ts == p1.ts
            assert by_data[p2.data].ts == p2.ts

    def test_seek_then_decode_matches_bulk_tail(self):
        from symphonia_tpu.core.formats import SeekMode, SeekTo
        from symphonia_tpu.formats.ogg import OggStreamReader

        data = pathlib.Path(HOUSE_OGG).read_bytes()
        bulk = self._bulk_packets(data)
        total = bulk[-1].ts + bulk[-1].dur
        # Full reference decode.
        r0 = OggReader(MediaSourceStream(data))
        dec = VorbisDecoder(r0.default_track().codec_params)
        full = []
        while True:
            p = r0.next_packet()
            if p is None:
                break
            buf = dec.decode(p)
            if buf.frames:
                full.append(buf.planes().copy())
        full = np.concatenate(full, axis=1)

        ts = int(total * 0.5)
        r = OggStreamReader(MediaSourceStream(data))
        seeked = r.seek(SeekMode.ACCURATE, SeekTo(ts=ts))
        dec2 = VorbisDecoder(r.default_track().codec_params)
        out, t0 = [], None
        while True:
            p = r.next_packet()
            if p is None:
                break
            buf = dec2.decode(p)
            if buf.frames:
                if t0 is None:
                    t0 = p.ts
                out.append(buf.planes().copy())
        out = np.concatenate(out, axis=1)
        ref = full[:, t0 : t0 + out.shape[1]]
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_chained_pipe_same_serial(self):
        """Chained physical streams on a pipe (serials repeat across chains
        in file concatenation): each boundary raises ResetRequired and the
        stream continues; memory stays bounded by the MSS window."""
        from symphonia_tpu.core.errors import ResetRequired
        from symphonia_tpu.formats.ogg import OggStreamReader

        data = pathlib.Path(HOUSE_OGG).read_bytes() * 4
        mss = MediaSourceStream(_Pipe(data))
        r = OggStreamReader(mss)
        n = resets = max_win = 0
        while True:
            try:
                p = r.next_packet()
            except ResetRequired:
                resets += 1
                continue
            max_win = max(max_win, len(mss._buf))
            if p is None:
                break
            n += 1
        assert resets == 3
        assert n == 307 * 4
        # Bounded by the MSS compaction policy (4 x RETAIN + readahead).
        assert max_win <= 4 * 64 * 1024 + 96 * 1024

    def test_seek_to_zero_preserves_leading_trim(self):
        """seek(ts=0) must re-apply the first-page leading trim (header
        pages carry granule 0, so the landing point is after them)."""
        from symphonia_tpu.core.formats import SeekMode, SeekTo
        from symphonia_tpu.formats.ogg import OggReader, OggStreamReader, parse_page

        raw = pathlib.Path(HOUSE_OGG).read_bytes()
        # Rewrite the first audio page's granule 100 samples early to
        # synthesize encoder pre-roll, fixing up the CRC.
        from symphonia_tpu.core.checksum import crc32_buf

        out = bytearray()
        pos = 0
        patched = False
        while pos < len(raw):
            page, nxt = parse_page(raw, pos)
            blob = bytearray(raw[pos:nxt])
            if not patched and page.granule > 0:
                g = page.granule - 100
                blob[6:14] = g.to_bytes(8, "little", signed=True)
                blob[22:26] = b"\x00" * 4
                crc = crc32_buf(bytes(blob))
                blob[22:26] = crc.to_bytes(4, "little")
                patched = True
            out += blob
            pos = nxt
        data = bytes(out)

        def trims(reader):
            total = 0
            while True:
                p = reader.next_packet()
                if p is None:
                    return total
                total += p.trim_start

        bulk_trim = trims(OggReader(MediaSourceStream(data)))
        assert bulk_trim == 100
        r = OggStreamReader(MediaSourceStream(data))
        assert trims(r) == 100
        r.seek(SeekMode.ACCURATE, SeekTo(ts=0))
        assert trims(r) == 100  # trim survives a seek back to the start

    def test_pipe_forward_seek(self):
        from symphonia_tpu.core.errors import SeekError
        from symphonia_tpu.core.formats import SeekMode, SeekTo
        from symphonia_tpu.formats.ogg import OggStreamReader

        data = pathlib.Path(HOUSE_OGG).read_bytes()
        r = OggStreamReader(MediaSourceStream(_Pipe(data)))
        s = r.seek(SeekMode.ACCURATE, SeekTo(ts=30000))
        p = r.next_packet()
        assert p.ts <= 30000 and s.actual_ts == p.ts
        with pytest.raises(SeekError):
            r.seek(SeekMode.ACCURATE, SeekTo(ts=100))  # backward on a pipe


class TestPerPacketNativeVorbis:
    """Per-packet native fast path (persistent sh_vorbis context inside
    VorbisDecoder.decode_spectra) vs the Python oracle path."""

    def test_stream_matches_oracle(self, monkeypatch):
        from symphonia_tpu import native

        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        monkeypatch.delenv("SYMPHONIA_TPU_VORBIS_STREAM", raising=False)
        a, r, _ = our_decode(data)
        # The native context must actually have engaged (or be unavailable).
        dec_probe = VorbisDecoder(r.default_track().codec_params)
        if native.vorbis_stream_open(dec_probe) is None:
            pytest.skip("native vorbis unavailable")
        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        b, _, _ = our_decode(data)
        assert a.shape == b.shape
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() <= 1e-4 * scale


class TestSynthAllParity:
    """synth_all (vectorized per-packet lapping) must be bit-identical to
    the per-channel synth across every block-flag transition."""

    def test_bit_identical(self):
        import numpy as np

        from symphonia_tpu.codecs.vorbis import VorbisDsp

        rng = np.random.default_rng(12)
        bs0, bs1, n_ch = 256, 2048, 2
        a = VorbisDsp(n_ch, bs0, bs1)
        b = VorbisDsp(n_ch, bs0, bs1)
        prev = None
        for flag in [False, False, True, True, False, True, False]:
            n2 = (bs1 if flag else bs0) // 2
            spec = rng.standard_normal((n_ch, n2)).astype(np.float32)
            pf = flag if prev is None else prev
            outs_a = np.stack([a.synth(c, spec[c], flag, pf)
                               for c in range(n_ch)])
            outs_b = b.synth_all(spec, flag, pf)
            np.testing.assert_array_equal(outs_a, outs_b)
            np.testing.assert_array_equal(a.overlap, b.overlap)
            prev = flag


class TestNativeSetupParser:
    """sh_vorbis_open_hdrs (native/vorbis_entropy.cpp) parses the raw
    ident+setup packets in C++. Contract: never accept a setup the Python
    parser rejects, and every accepted stream must decode bit-identically
    to a context built from the Python-parsed + serialized structures."""

    @staticmethod
    def _ctx_pair(params):
        """(raw-header stream, serialize-path stream) for the same codec
        params, or (None, None) when the native lib is unavailable."""
        from symphonia_tpu import native
        from symphonia_tpu.codecs.vorbis import VorbisDecoder
        dec1 = VorbisDecoder(params)
        if not dec1._native:
            return None, None
        dec2 = VorbisDecoder(params)
        _ = dec2.setup  # force the Python parse
        dec2._raw_headers = None  # then deny the native parser
        s2 = native.vorbis_stream_open(dec2)
        return dec1._native, s2

    def _assert_parity(self, params, pkts):
        import numpy as np
        from symphonia_tpu import native
        s1, s2 = self._ctx_pair(params)
        if s1 is None:
            pytest.skip("native lib unavailable")
        assert s2 is not None
        for p in pkts:
            r1 = native.vorbis_stream_decode(s1, p)
            r2 = native.vorbis_stream_decode(s2, p)
            assert (r1 is None) == (r2 is None)
            if r1 is not None:
                assert np.array_equal(r1[0], r2[0])
                assert r1[1] == r2[1]

    def test_house_parity(self):
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.ogg import OggReader
        rdr = OggReader(MediaSourceStream(pathlib.Path(HOUSE_OGG).read_bytes()))
        params = rdr.tracks()[0].codec_params
        pkts = []
        while True:
            p = rdr.next_packet()
            if p is None:
                break
            pkts.append(bytes(p.data))
        assert pkts
        self._assert_parity(params, pkts)

    def test_stereo_builder_parity(self):
        """Coupling + residue 2 + two block sizes + floor0 (VQ cumsum)."""
        import vorbis_builder as vb
        from symphonia_tpu.core.audio import Channels
        from symphonia_tpu.core.codecs import AudioCodecParameters
        extra, pkts, _ = vb.build_stream_stereo(24, seed=11)
        params = AudioCodecParameters(
            codec="vorbis", sample_rate=vb.RATE,
            channels=Channels.from_count(2), extra_data=extra)
        self._assert_parity(params, pkts)

    def test_lazy_setup_not_parsed_on_native_path(self):
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.ogg import OggReader
        from symphonia_tpu.codecs.vorbis import VorbisDecoder
        rdr = OggReader(MediaSourceStream(pathlib.Path(HOUSE_OGG).read_bytes()))
        dec = VorbisDecoder(rdr.tracks()[0].codec_params)
        if not dec._native:
            pytest.skip("native lib unavailable")
        assert dec._setup is None
        # ... and the property still parses on demand for oracle paths.
        assert len(dec.setup.codebooks) > 0
        assert dec._setup is not None

    def test_mutated_setups_accept_subset(self):
        """Property sweep: mutate the real setup packet; whenever the
        native parser accepts, the Python parser must accept too AND a
        few decoded packets must match the serialize-path context
        bit-for-bit (identical parsed structures)."""
        import numpy as np
        from symphonia_tpu import native
        from symphonia_tpu.codecs.vorbis_setup import (read_ident_header,
                                                       read_setup_header)
        from symphonia_tpu.core.errors import DecodeError, EndOfStream
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.ogg import OggReader

        lib = native._load()
        if lib is None or not hasattr(lib, "sh_vorbis_open_hdrs"):
            pytest.skip("native lib unavailable")
        native._vorbis_register_tables(lib)
        rdr = OggReader(MediaSourceStream(pathlib.Path(HOUSE_OGG).read_bytes()))
        dec_params = rdr.tracks()[0].codec_params
        pkts = []
        while len(pkts) < 12:
            p = rdr.next_packet()
            if p is None:
                break
            pkts.append(bytes(p.data))
        from symphonia_tpu.codecs.vorbis import VorbisDecoder
        probe = VorbisDecoder(dec_params)
        ident_data, setup_data = probe._raw_headers
        ident = read_ident_header(ident_data)

        rng = np.random.default_rng(777)
        accepted = rejected = 0
        for _ in range(400):
            mut = bytearray(setup_data)
            for _ in range(int(rng.integers(1, 4))):
                mut[int(rng.integers(7, len(mut)))] = int(rng.integers(256))
            mut = bytes(mut)
            ctx = lib.sh_vorbis_open_hdrs(ident_data, len(ident_data),
                                          mut, len(mut))
            if not ctx:
                rejected += 1
                continue
            accepted += 1
            try:
                try:
                    setup = read_setup_header(mut, ident)
                except (DecodeError, EndOfStream) as e:
                    pytest.fail(f"native accepted, python rejected: {e}")
                blob = native._vorbis_serialize(ident, setup)
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                ctx2 = lib.sh_vorbis_open(native._u8ptr(b), len(b))
                assert ctx2, "serialize-path open failed on accepted mutant"
                try:
                    n_ch = ident.n_channels
                    n2max = (1 << ident.bs1_exp) // 2
                    spec = np.empty((1, n_ch, n2max), np.float32)
                    spec2 = np.empty((1, n_ch, n2max), np.float32)
                    offs = np.zeros(1, np.int64)
                    import ctypes as ct
                    i64p = ct.POINTER(ct.c_int64)
                    i32p = ct.POINTER(ct.c_int32)
                    f32p = ct.POINTER(ct.c_float)
                    flags = np.empty(1, np.int32)
                    status = np.empty(1, np.int32)
                    for p in pkts:
                        sizes = np.array([len(p)], np.int64)
                        for c, s in ((ctx, spec), (ctx2, spec2)):
                            lib.sh_vorbis_decode(
                                c, p, len(p),
                                offs.ctypes.data_as(i64p),
                                sizes.ctypes.data_as(i64p), 1,
                                s.ctypes.data_as(f32p),
                                flags.ctypes.data_as(i32p),
                                status.ctypes.data_as(i32p))
                        assert np.array_equal(spec, spec2)
                finally:
                    lib.sh_vorbis_close(ctx2)
            finally:
                lib.sh_vorbis_close(ctx)
        # The sweep must exercise both outcomes to mean anything.
        assert rejected > 0 and accepted > 0, (accepted, rejected)


class TestDeepCodebookLutBound:
    """A Kraft-exact codebook can pack ~1024 deep 10-bit prefixes, each
    carrying a 32-bit codeword chain: the native two-level LUT would need
    ~16 GiB of subtables (per-prefix sizing alone doesn't save it). The
    builder caps total subtable entries and fails the parse, so hostile
    setups fall back to the bounded Python multi-level LUT / tree walk.
    Regression for an OOM reachable at OGG probe time via the native
    setup skim."""

    @staticmethod
    def _hostile_setup() -> bytes:
        from vorbis_builder import BitWriterLsb
        # Per 10-bit prefix: one len-11 code (first half) + a full binary
        # chain 12..32 plus a second len-32 (second half) = 2^-10 exactly.
        group = [11] + list(range(12, 33)) + [32]
        lens = group * 1024                      # Kraft sums to exactly 1
        bw = BitWriterLsb()
        bw.write(0, 8)                           # 1 codebook
        bw.write(0x564342, 24)
        bw.write(1, 16)                          # dims
        bw.write(len(lens), 24)                  # 23552 entries (< 128k)
        bw.write(0, 1)                           # not ordered
        bw.write(0, 1)                           # not sparse
        for ln in lens:
            bw.write(ln - 1, 5)
        bw.write(0, 4)                           # lookup 0
        return b"\x05vorbis" + bw.to_bytes()

    def test_native_open_rejects_bounded(self):
        import resource

        from symphonia_tpu import native
        from vorbis_builder import build_ident_header

        lib = native._load()
        if lib is None or not hasattr(lib, "sh_vorbis_open_hdrs"):
            pytest.skip("native lib unavailable")
        native._vorbis_register_tables(lib)
        ident = build_ident_header()
        setup = self._hostile_setup()
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        ctx = lib.sh_vorbis_open_hdrs(ident, len(ident), setup, len(setup))
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert not ctx
        # ru_maxrss is KiB on Linux; the pre-fix allocation was >= 68 MB
        # for a much smaller probe book (16 GiB for this one).
        assert rss1 - rss0 < 64 * 1024, (rss0, rss1)


class TestCodebookBounds:
    """Reference codebook.rs:232-245 bounds: dims 0 (would divide by zero
    in lookup1_values), dims > 32, entries > 128k are all DecodeErrors."""

    @staticmethod
    def _setup_with_codebook(dims, entries):
        from vorbis_builder import BitWriterLsb
        bw = BitWriterLsb()
        bw.write(0, 8)             # 1 codebook
        bw.write(0x564342, 24)
        bw.write(dims, 16)
        bw.write(entries, 24)
        bw.write(0, 1)             # not ordered
        bw.write(0, 1)             # not sparse
        for _ in range(min(entries, 4)):
            bw.write(0, 5)         # lengths (never reached on reject)
        return b"\x05vorbis" + bw.to_bytes()

    def test_rejected(self):
        import pytest
        from symphonia_tpu.codecs.vorbis_setup import (IdentHeader,
                                                       read_setup_header)
        from symphonia_tpu.core.errors import DecodeError
        ident = IdentHeader(1, 44100, 8, 8)
        for dims, entries in [(0, 4), (33, 4), (2, 128 * 1024 + 1)]:
            with pytest.raises(DecodeError):
                read_setup_header(self._setup_with_codebook(dims, entries),
                                  ident)
            with pytest.raises(DecodeError):
                read_setup_header(self._setup_with_codebook(dims, entries),
                                  ident, skim=True)


class TestSetupSkim:
    """The skim parse must walk the exact same bit layout as the full
    parse: identical floors/residues/mappings/modes on real setups."""

    def test_skim_matches_full(self):
        from symphonia_tpu.codecs.vorbis import VorbisDecoder
        from symphonia_tpu.codecs.vorbis_setup import (read_ident_header,
                                                       read_setup_header)

        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        _, r, _ = our_decode(data)
        extra = r.default_track().codec_params.extra_data
        ident_data, setup_data = VorbisDecoder._split_headers(extra)
        ident = read_ident_header(ident_data)
        full = read_setup_header(setup_data, ident)
        skim = read_setup_header(setup_data, ident, skim=True)
        assert [m.block_flag for m in skim.modes] == \
               [m.block_flag for m in full.modes]
        assert [m.mapping for m in skim.modes] == \
               [m.mapping for m in full.modes]
        assert len(skim.codebooks) == len(full.codebooks)
        assert len(skim.floors) == len(full.floors)
        assert len(skim.residues) == len(full.residues)


class TestFloor0Residue0:
    """Floor type 0 (LSP) + residue type 0 via the mirror builder
    (tests/vorbis_builder.py) — no real-world fixture uses either path
    (house_lo.ogg is floor 1 / residue 2). Covers setup parsing,
    floor0_read_channel VQ accumulation, LSP curve synthesis, residue-0
    stride-interleaved partitions, and native-vs-oracle parity."""

    def _make_decoder(self, extra):
        from symphonia_tpu.core.codecs import AudioCodecParameters

        params = AudioCodecParameters()
        params.codec = "vorbis"
        params.extra_data = extra
        return VorbisDecoder(params)

    def test_oracle_structure(self, monkeypatch):
        import vorbis_builder as vb

        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        extra, pkts, info = vb.build_stream(10, seed=42)
        dec = self._make_decoder(extra)
        assert dec.setup.floors[0].kind == 0
        assert dec.setup.residues[0].kind == 0
        for pkt, (amp, fe, ce, pe) in zip(pkts, info):
            spectra, block_flag = dec.decode_spectra(pkt)
            assert not block_flag
            assert spectra.shape == (1, vb.N2)
            if amp == 0:
                np.testing.assert_array_equal(spectra, 0.0)
                continue
            res = vb.expected_residue(ce, pe)
            # spectra = positive LSP curve * residue: zero pattern and
            # signs must match the independently reconstructed residue.
            np.testing.assert_array_equal(spectra[0] == 0.0, res == 0.0)
            np.testing.assert_array_equal(np.sign(spectra[0]), np.sign(res))

    def test_floor0_curve_matches_spec_pseudocode(self, monkeypatch):
        """floor0_synthesis vs a direct scalar transcription of the spec
        §6.2.3 pseudocode (independent loop structure)."""
        from symphonia_tpu.codecs.vorbis import floor0_synthesis, _bark_map
        import vorbis_builder as vb

        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        extra, pkts, info = vb.build_stream(4, seed=7)
        dec = self._make_decoder(extra)
        cfg = dec.setup.floors[0].f0
        amp, fe, _, _ = info[0]
        # Reconstruct the 2cos coefficient vector the decoder derives.
        last = 0.0
        coeffs = []
        for e in fe:
            vec = vb.f0_vq(e) + last
            coeffs.extend(vec.tolist())
            last = float(vec[-1])
        tc = 2.0 * np.cos(np.asarray(coeffs[: vb.ORDER], dtype=np.float64))
        got = floor0_synthesis(amp, tc, cfg, vb.N2)

        m = _bark_map(vb.N2, cfg.rate, cfg.bark_map_size)
        expect = np.empty(vb.N2, dtype=np.float32)
        i = 0
        while i < vb.N2:
            omega = np.pi * m[i] / cfg.bark_map_size
            cos_w = np.cos(omega)
            p, q = 1.0, 1.0
            for j in range(cfg.order // 2):
                p *= tc[2 * j + 1] - 2.0 * cos_w
                q *= tc[2 * j] - 2.0 * cos_w
            if cfg.order % 2:
                q *= tc[cfg.order - 1] - 2.0 * cos_w
                p = p * p * (1.0 - cos_w * cos_w)
                q = q * q * 0.25
            else:
                p = p * p * (1.0 - cos_w) / 2.0
                q = q * q * (1.0 + cos_w) / 2.0
            lin = np.exp(
                0.11512925
                * (amp * cfg.amplitude_offset
                   / (((1 << cfg.amplitude_bits) - 1) * np.sqrt(p + q))
                   - cfg.amplitude_offset)
            ).astype(np.float32)
            j = i
            while j < vb.N2 and m[j] == m[i]:
                expect[j] = lin
                j += 1
            i = j
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_native_matches_oracle(self, monkeypatch):
        """Native stream context vs the Python oracle on floor0/residue0
        packets — exact spectra equality, and native must engage."""
        from symphonia_tpu import native
        import vorbis_builder as vb

        extra, pkts, _ = vb.build_stream(12, seed=5)
        monkeypatch.delenv("SYMPHONIA_TPU_VORBIS_STREAM", raising=False)
        dec_n = self._make_decoder(extra)
        if not dec_n._native:
            pytest.skip("native vorbis unavailable")
        # Assert per-packet native engagement (no silent fallback).
        for pkt in pkts:
            assert native.vorbis_stream_decode(dec_n._native, pkt) is not None
        dec_n = self._make_decoder(extra)
        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        dec_o = self._make_decoder(extra)
        for pkt in pkts:
            a, fa = dec_n.decode_spectra(pkt)
            b, fb = dec_o.decode_spectra(pkt)
            assert fa == fb
            np.testing.assert_array_equal(a, b)


class TestVorbisStereoCoupling:
    """Stereo square-polar coupling + residue type 2 + two block sizes via
    the builder's stereo variant — house_lo.ogg (mono, residue 1, single
    short mode) covers none of these paths."""

    def _make_decoder(self, extra):
        from symphonia_tpu.core.codecs import AudioCodecParameters

        params = AudioCodecParameters()
        params.codec = "vorbis"
        params.extra_data = extra
        return VorbisDecoder(params)

    def test_oracle_structure(self, monkeypatch):
        import vorbis_builder as vb

        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        extra, pkts, info = vb.build_stream_stereo(14, seed=21)
        dec = self._make_decoder(extra)
        assert dec.setup.residues[0].kind == 2
        assert dec.setup.mappings[0].coupling_steps == [(0, 1)]
        saw_long = saw_short = saw_dead_floor = False
        for pkt, (long_block, amps, fe, ce, pe) in zip(pkts, info):
            spectra, block_flag = dec.decode_spectra(pkt)
            assert block_flag == long_block
            n2 = vb.N2_LONG if long_block else vb.N2
            assert spectra.shape == (2, n2)
            saw_long |= long_block
            saw_short |= not long_block
            if amps == (0, 0):
                np.testing.assert_array_equal(spectra, 0.0)
                continue
            res = vb.expected_stereo_residue(long_block, ce, pe)
            for ch in range(2):
                if amps[ch] == 0:
                    saw_dead_floor = True
                    np.testing.assert_array_equal(spectra[ch], 0.0)
                else:
                    # positive LSP curve * post-coupling residue
                    np.testing.assert_array_equal(spectra[ch] == 0.0,
                                                  res[ch] == 0.0)
                    np.testing.assert_array_equal(np.sign(spectra[ch]),
                                                  np.sign(res[ch]))
        assert saw_long and saw_short and saw_dead_floor

    def test_native_matches_oracle(self, monkeypatch):
        from symphonia_tpu import native
        import vorbis_builder as vb

        extra, pkts, _ = vb.build_stream_stereo(16, seed=77)
        monkeypatch.delenv("SYMPHONIA_TPU_VORBIS_STREAM", raising=False)
        dec_n = self._make_decoder(extra)
        if not dec_n._native:
            pytest.skip("native vorbis unavailable")
        for pkt in pkts:
            assert native.vorbis_stream_decode(dec_n._native, pkt) is not None
        dec_n = self._make_decoder(extra)
        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        dec_o = self._make_decoder(extra)
        for pkt in pkts:
            a, fa = dec_n.decode_spectra(pkt)
            b, fb = dec_o.decode_spectra(pkt)
            assert fa == fb
            np.testing.assert_array_equal(a, b)


class TestNativePcmPath:
    """Full-native per-packet decode (sh_vorbis_decode_pcm: entropy +
    IMDCT + windowed OLA + channel reorder in C++). The C++ DCT-IV runs
    in double precision vs pocketfft's float32 in the oracle, so PCM
    parity is a last-ulp bound scaled by the packet's peak, not bit-exact; exact
    entropy-stage parity is asserted separately in
    TestVorbisStereoCoupling/TestFloor0Residue0."""

    # DCT rounding error scales with the spectrum magnitude, not the
    # sample magnitude: bound |diff| by ~1e-6 x the packet's peak.
    ATOL = 1e-6

    def _decoders(self, params, monkeypatch):
        monkeypatch.delenv("SYMPHONIA_TPU_VORBIS_STREAM", raising=False)
        dec_n = VorbisDecoder(params)
        if not dec_n._native or not dec_n._native.has_pcm:
            pytest.skip("native vorbis pcm unavailable")
        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        dec_o = VorbisDecoder(params)
        assert not dec_o._native
        return dec_n, dec_o

    def _tame_stereo_stream(self, flags, seed):
        """Builder stereo packets rejection-sampled to finite, moderate
        spectra (the raw builder's floor-0 curves routinely overflow to
        inf, where double-vs-float32 DCT garbage legitimately diverges).
        ``flags`` fixes the block-size sequence so both long<->short
        lapping transitions are exercised deterministically."""
        import vorbis_builder as vb
        from symphonia_tpu.core.codecs import AudioCodecParameters

        rng = np.random.default_rng(seed)
        extra = vb.build_ident_header_stereo() + vb.build_setup_header_stereo()
        params = AudioCodecParameters()
        params.codec = "vorbis"
        params.extra_data = extra
        prior = os.environ.get("SYMPHONIA_TPU_VORBIS_STREAM")
        os.environ["SYMPHONIA_TPU_VORBIS_STREAM"] = "off"
        try:
            scratch = VorbisDecoder(params)
        finally:
            if prior is None:
                del os.environ["SYMPHONIA_TPU_VORBIS_STREAM"]
            else:
                os.environ["SYMPHONIA_TPU_VORBIS_STREAM"] = prior
        pkts = []
        for long_block in flags:
            for _ in range(200):
                amps = (int(rng.integers(1, 5)), int(rng.integers(1, 5)))
                fe = tuple(
                    (int(rng.integers(0, 16)), int(rng.integers(0, 16)))
                    for _ in range(2)
                )
                parts = vb.n_parts_stereo(long_block)
                ce = [int(rng.integers(0, 4)) for _ in range(parts // 2)]
                pe = [[int(rng.integers(0, 16)) for _ in range(4)]
                      for _ in range(parts)]
                pkt = vb.build_audio_packet_stereo(
                    long_block, amps, fe, ce, pe)
                spectra, _bf = scratch.decode_spectra(pkt)
                if np.isfinite(spectra).all() and np.abs(spectra).max() < 1e3:
                    pkts.append(pkt)
                    break
            else:
                raise AssertionError("no tame packet found")
        return params, pkts

    def _assert_parity(self, dec_n, dec_o, pkt):
        bn = dec_n.decode(pkt)
        bo = dec_o.decode(pkt)
        assert len(bn) == len(bo)
        if len(bn):
            o = bo.planes()
            atol = self.ATOL * max(1.0, float(np.abs(o).max()))
            np.testing.assert_allclose(bn.planes(), o, rtol=0, atol=atol)

    def test_house_lo_parity_and_engagement(self, monkeypatch):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        r = OggReader(MediaSourceStream(data))
        params = r.default_track().codec_params
        dec_n, dec_o = self._decoders(params, monkeypatch)
        n = 0
        while True:
            p = r.next_packet()
            if p is None:
                break
            self._assert_parity(dec_n, dec_o, p)
            n += 1
        assert n > 100
        # The Python dsp state was never touched -> every packet took the
        # native path (no silent fallback).
        assert dec_n.dsp.prev_block_flag is None
        assert dec_o.dsp.prev_block_flag is not None

    def test_stereo_dual_blocksize_parity(self, monkeypatch):
        """Stereo + coupling + both block sizes: all three lapping
        branches (long->long, long->short, short->long) in the C++ OLA."""
        from symphonia_tpu.core.packet import Packet

        flags = [False, False, True, True, False, True,
                 False, False, True, True, True, False]
        params, pkts = self._tame_stereo_stream(flags, seed=9)
        dec_n, dec_o = self._decoders(params, monkeypatch)
        for i, pkt in enumerate(pkts):
            self._assert_parity(dec_n, dec_o, Packet(0, i, 0, pkt))
        assert dec_n.dsp.prev_block_flag is None

    def test_reset_clears_lapping_state(self, monkeypatch):
        from symphonia_tpu.core.packet import Packet

        params, pkts = self._tame_stereo_stream(
            [False, True, False, True, True, False, True, False], seed=3)
        dec_n, dec_o = self._decoders(params, monkeypatch)
        for i, pkt in enumerate(pkts[:4]):
            self._assert_parity(dec_n, dec_o, Packet(0, i, 0, pkt))
        dec_n.reset()
        dec_o.reset()
        # First packet after reset has no overlap partner on either path.
        assert len(dec_n.decode(Packet(0, 0, 0, pkts[4]))) == 0
        assert len(dec_o.decode(Packet(0, 0, 0, pkts[4]))) == 0
        for i, pkt in enumerate(pkts[5:]):
            self._assert_parity(dec_n, dec_o, Packet(0, i, 0, pkt))

    def test_no_midstream_native_engagement(self, monkeypatch):
        """If the native engine only becomes available after some packets
        decoded through the Python dsp, it must NOT engage mid-stream:
        a fresh native context would mislabel the next packet as first
        and lap against a zeroed overlap buffer."""
        from symphonia_tpu.core.packet import Packet

        params, pkts = self._tame_stereo_stream(
            [False, True, False, True, True], seed=11)
        monkeypatch.setenv("SYMPHONIA_TPU_VORBIS_STREAM", "off")
        dec = VorbisDecoder(params)
        oracle = VorbisDecoder(params)
        for i, pkt in enumerate(pkts[:2]):
            dec.decode(Packet(0, i, 0, pkt))
            oracle.decode(Packet(0, i, 0, pkt))
        # Native turns loadable mid-stream (late-succeeding _open_native).
        monkeypatch.delenv("SYMPHONIA_TPU_VORBIS_STREAM")
        dec._native = None
        for i, pkt in enumerate(pkts[2:]):
            a = dec.decode(Packet(0, i, 0, pkt))
            b = oracle.decode(Packet(0, i, 0, pkt))
            assert len(a) == len(b)
            np.testing.assert_array_equal(a.planes(), b.planes())
        # After a reset both lapping states are fresh: engaging is fine.
        dec.reset()
        if dec._native and dec._native.has_pcm:
            assert len(dec.decode(Packet(0, 0, 0, pkts[0]))) == 0
            assert dec.dsp.prev_block_flag is None

    def test_malformed_packet_identical_behavior(self, monkeypatch):
        """A packet the native engine rejects raises the same DecodeError
        via the Python fallback, leaves the native lapping state
        untouched, and the stream continues in parity."""
        from symphonia_tpu.core.errors import DecodeError
        from symphonia_tpu.core.packet import Packet

        params, pkts = self._tame_stereo_stream(
            [False, True, True, False, True, False, False, True], seed=5)
        dec_n, dec_o = self._decoders(params, monkeypatch)
        for i, pkt in enumerate(pkts[:3]):
            self._assert_parity(dec_n, dec_o, Packet(0, i, 0, pkt))
        bad = Packet(0, 99, 0, b"\x01not-audio-packet")
        with pytest.raises(DecodeError):
            dec_n.decode(bad)
        with pytest.raises(DecodeError):
            dec_o.decode(bad)
        for i, pkt in enumerate(pkts[3:]):
            self._assert_parity(dec_n, dec_o, Packet(0, i, 0, pkt))


def _ogg_page(serial, seqno, granule, packets, header_type=0):
    """Build one OGG page (page.rs:144-331); each packet must be <255*255."""
    from symphonia_tpu.core.checksum import crc32_buf

    lacing = b""
    body = b""
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing += bytes([255])
            n -= 255
        lacing += bytes([n])
        body += p
    head = (b"OggS\x00" + bytes([header_type])
            + granule.to_bytes(8, "little", signed=True)
            + serial.to_bytes(4, "little") + seqno.to_bytes(4, "little")
            + b"\x00" * 4 + bytes([len(lacing)]) + lacing)
    blob = bytearray(head + body)
    blob[22:26] = crc32_buf(bytes(blob)).to_bytes(4, "little")
    return bytes(blob)


class TestOggOpus:
    """Opus mapper (mappings/opus.rs): id/tags headers, TOC packet
    durations, pre-skip -> Track.delay (opus.rs:62)."""

    PRE_SKIP = 312

    def _stream(self):
        head = (b"OpusHead" + bytes([1, 2])
                + self.PRE_SKIP.to_bytes(2, "little")
                + (48000).to_bytes(4, "little") + b"\x00\x00" + b"\x00")
        tags = (b"OpusTags" + (4).to_bytes(4, "little") + b"test"
                + (1).to_bytes(4, "little")
                + (12).to_bytes(4, "little") + b"TITLE=OpusIt")
        # TOC 0x10: config 2 (SILK NB 40 ms = 1920 @48k), code 0 (1 frame).
        pkt = bytes([0x10]) + b"\x11" * 10
        pages = [
            _ogg_page(7, 0, 0, [head], header_type=0x02),
            _ogg_page(7, 1, 0, [tags]),
            _ogg_page(7, 2, self.PRE_SKIP + 1920, [pkt]),
            _ogg_page(7, 3, self.PRE_SKIP + 3840, [pkt], header_type=0x04),
        ]
        return b"".join(pages)

    def test_demux_and_delay(self):
        import symphonia_tpu as sym
        from symphonia_tpu.formats.ogg import OggReader

        data = self._stream()
        probed = sym.get_probe().probe(MediaSourceStream(data))
        t = probed.format.default_track()
        p = t.codec_params
        assert p.codec == "opus"
        assert p.sample_rate == 48000 and p.channels.count == 2
        assert p.extra_data.startswith(b"OpusHead")
        assert t.delay == self.PRE_SKIP
        rev = probed.format.metadata().current()
        assert rev is not None and rev.get("track_title") == "OpusIt"
        pkts = []
        while True:
            pk = probed.format.next_packet()
            if pk is None:
                break
            pkts.append(pk)
        assert len(pkts) == 2
        assert all(pk.dur == 1920 for pk in pkts)
        # Granule time is kept raw (logical.rs:230): the stream starts at
        # t = pre_skip, surfaced as Track.start_ts.
        assert t.start_ts == self.PRE_SKIP
        assert [pk.ts for pk in pkts] == [self.PRE_SKIP,
                                          self.PRE_SKIP + 1920]
        assert t.num_frames == 2 * 1920
        # No decoder ships for Opus, matching the reference stub.
        from symphonia_tpu.core.errors import Unsupported
        import pytest as _pytest

        with _pytest.raises(Unsupported):
            sym.get_codecs().make_audio_decoder(p)

    def test_streaming_reader_parity(self):
        from symphonia_tpu.formats.ogg import OggReader, OggStreamReader

        data = self._stream()
        bulk = OggReader(MediaSourceStream(data))
        stream = OggStreamReader(MediaSourceStream(data))
        assert stream.tracks()[0].delay == self.PRE_SKIP
        while True:
            a = bulk.next_packet()
            b = stream.next_packet()
            assert (a is None) == (b is None)
            if a is None:
                break
            assert (a.data, a.ts, a.dur) == (b.data, b.ts, b.dur)


class TestOggFlac:
    """FLAC-in-OGG mapper (mappings/flac.rs): id packet parse, header
    absorption, frame durations from frame headers, decode parity with
    the native FLAC container."""

    def _stream(self, channels, rate, bps, block_size):
        import sys
        sys.path.insert(0, "tests") if "tests" not in sys.path[0] else None
        from flac_builder import (build_streaminfo, encode_frame, md5_of)

        n = len(channels[0])
        md5 = md5_of(channels, bps)
        si = build_streaminfo(block_size, rate, len(channels), bps, n, md5)
        # Mapping id packet: 0x7F FLAC maj min nhdr 'fLaC' block hdr + SI.
        idpkt = (b"\x7fFLAC\x01\x00" + (1).to_bytes(2, "big") + b"fLaC"
                 + bytes([0x00]) + len(si).to_bytes(3, "big") + si)
        # Vorbis-comment header packet (block type 4, last-header flag).
        body = (4).to_bytes(4, "little") + b"test" + (0).to_bytes(4, "little")
        vc = bytes([0x84]) + len(body).to_bytes(3, "big") + body
        frames = []
        for i, start in enumerate(range(0, n, block_size)):
            chunk = [c[start:start + block_size] for c in channels]
            frames.append(encode_frame(chunk, i, bps, "independent",
                                       kind="fixed", order=2))
        pages = [_ogg_page(9, 0, 0, [idpkt], header_type=0x02),
                 _ogg_page(9, 1, 0, [vc])]
        done = 0
        for i, f in enumerate(frames):
            done += min(block_size, n - done)
            last = i == len(frames) - 1
            pages.append(_ogg_page(9, 2 + i, done, [f],
                                   header_type=0x04 if last else 0))
        return b"".join(pages)

    def test_flac_in_ogg_decodes_bit_exact(self):
        import symphonia_tpu as sym
        from flac_builder import random_walk

        rate, bps, bsz = 22050, 16, 256
        channels = random_walk(1024, bps, seed=11, ch=2)
        data = self._stream(channels, rate, bps, bsz)
        probed = sym.get_probe().probe(MediaSourceStream(data))
        t = probed.format.default_track()
        assert t.codec_params.codec == "flac"
        assert t.codec_params.sample_rate == rate
        assert t.num_frames == 1024
        dec = sym.get_codecs().make_audio_decoder(t.codec_params)
        outs = []
        while True:
            p = probed.format.next_packet()
            if p is None:
                break
            outs.append(dec.decode(p).planes().copy())
        got = np.concatenate(outs, axis=1)
        expect = np.stack([c.astype(np.int32) for c in channels])
        np.testing.assert_array_equal(got, expect)


class TestOggMultiplexed:
    """Grouped (multiplexed) physical streams expose every logical stream
    as a track (demuxer.rs:416-427); packets surface in physical page
    order and callers filter by track id."""

    @staticmethod
    def _remux_two_streams(data: bytes):
        """Duplicate a single-logical-stream OGG into two interleaved
        logical streams (serials patched on the raw page bytes so lacing
        and spanning packets are preserved)."""
        from symphonia_tpu.core.checksum import crc32_buf

        raw_pages = []
        pos = 0
        while pos < len(data):
            _, nxt = parse_page(data, pos)
            raw_pages.append(data[pos:nxt])
            pos = nxt

        def with_serial(raw: bytes, serial: int) -> bytes:
            blob = bytearray(raw)
            blob[14:18] = serial.to_bytes(4, "little")
            blob[22:26] = b"\x00" * 4
            blob[22:26] = crc32_buf(bytes(blob)).to_bytes(4, "little")
            return bytes(blob)

        out = b""
        for raw in raw_pages:
            out += with_serial(raw, 0xAAAA) + with_serial(raw, 0xBBBB)
        return out

    def test_two_tracks_decode_bit_exact(self):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        single, _, strack = our_decode(data)
        muxed = self._remux_two_streams(data)
        r = OggReader(MediaSourceStream(muxed))
        tracks = r.tracks()
        assert [t.id for t in tracks] == [0, 1]
        for t in tracks:
            assert t.codec_params.codec == "vorbis"
            assert t.num_frames == strack.num_frames
        decs = [VorbisDecoder(t.codec_params) for t in tracks]
        outs = [[], []]
        seen = set()
        while True:
            p = r.next_packet()
            if p is None:
                break
            seen.add(p.track_id)
            buf = decs[p.track_id].decode(p)
            if len(buf):
                outs[p.track_id].append(buf.planes().copy())
        assert seen == {0, 1}
        for tid in (0, 1):
            got = np.concatenate(outs[tid], axis=1)
            np.testing.assert_array_equal(got, single)

    def test_seek_targets_chosen_track(self):
        from symphonia_tpu.core.formats import SeekMode, SeekTo

        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        muxed = self._remux_two_streams(data)
        r = OggReader(MediaSourceStream(muxed))
        t1 = r.tracks()[1]
        target = t1.num_frames // 2
        res = r.seek(SeekMode.ACCURATE, SeekTo(ts=target, track_id=1))
        assert res.track_id == 1
        assert res.actual_ts <= target
        # Both streams resume near the target in page order.
        p = r.next_packet()
        assert p is not None
        assert abs(p.ts - target) < 8192


class TestOggRobustness:
    """Review-found hardening: taxonomy guards in mappers, non-quadratic
    page resync, corrupt sibling logical streams skipped."""

    def _vorbis_pages(self, serial=11):
        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        return data

    def test_truncated_opushead_taxonomy(self):
        from symphonia_tpu.core.errors import DecodeError, Unsupported
        from symphonia_tpu.formats.ogg import OggReader

        # 9-byte OpusHead: prefix matches, fields truncated.
        pages = [_ogg_page(7, 0, 0, [b"OpusHead\x01"], header_type=0x02),
                 _ogg_page(7, 1, 960, [b"\x10" + b"\x00" * 8],
                           header_type=0x04)]
        with pytest.raises((DecodeError, Unsupported)):  # not IndexError
            OggReader(MediaSourceStream(b"".join(pages)))

    def test_zero_length_flac_header_packet(self):
        from symphonia_tpu.core.errors import DecodeError, Unsupported
        from symphonia_tpu.formats.ogg import FlacMapper

        # Direct mapper check: a zero-length header lace keeps absorbing
        # (raised raw IndexError before). STREAMINFO comes from a real
        # mirror-encoded file.
        import sys as _sys

        _sys.path.insert(0, "tests")
        from flac_builder import build_flac_file, random_walk

        flac = build_flac_file(random_walk(4096, 16, seed=1, ch=1),
                               kind="fixed", order=2)
        id_pkt = b"\x7fFLAC\x01\x00\x00\x01" + flac[:4] + flac[4 : 4 + 38]
        m = FlacMapper(id_pkt)
        from symphonia_tpu.core.meta import MetadataLog

        assert m.absorb_header(b"", MetadataLog()) is True

    def test_dense_fake_markers_not_quadratic(self):
        import time as _t
        import symphonia_tpu as sym
        from symphonia_tpu.core.errors import DecodeError, Unsupported

        junk = b"OggS\x01" * (256 * 1024 // 5)
        t0 = _t.time()
        try:
            sym.get_probe().probe(MediaSourceStream(junk))
        except (DecodeError, Unsupported, EOFError):
            pass
        took = _t.time() - t0
        assert took < 5.0, f"resync took {took:.1f}s"  # was ~7 s quadratic

    def test_corrupt_sibling_stream_skipped(self):
        """Grouped physical stream: one malformed prefix-matched stream
        must not abort the file; the good stream still maps."""
        from symphonia_tpu.formats.ogg import OggReader

        good = self._vorbis_pages()
        bad_bos = _ogg_page(99, 0, 0, [b"OpusHead\x01"], header_type=0x02)
        # Insert the bad BOS right after the good stream's BOS page (BOS
        # pages of a grouped stream come first).
        from symphonia_tpu.formats.ogg import parse_page

        _, first_end = parse_page(good, 0)
        muxed = good[:first_end] + bad_bos + good[first_end:]
        r = OggReader(MediaSourceStream(muxed))
        assert len(r.tracks()) == 1
        assert r.tracks()[0].codec_params.codec == "vorbis"
        n = 0
        while r.next_packet() is not None:
            n += 1
        assert n > 10


class TestMultiplexedPipe:
    """The streaming (pipe) reader exposes every mappable logical stream of
    a grouped physical stream too — previously only the first (a documented
    divergence, now closed). Packets of all serials demux with exact
    ts/trims; a seek on the default track re-anchors siblings."""

    class _Pipe(io.RawIOBase):
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def readable(self):
            return True

        def read(self, n=-1):
            return self._b.read(n)

        def seekable(self):
            return False

    def test_two_tracks_decode_bit_exact_on_pipe(self):
        from symphonia_tpu.formats.ogg import OggStreamReader

        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        single, _, strack = our_decode(data)
        muxed = TestOggMultiplexed._remux_two_streams(data)
        r = OggStreamReader(MediaSourceStream(self._Pipe(muxed)))
        tracks = r.tracks()
        assert [t.id for t in tracks] == [0, 1]
        decs = [VorbisDecoder(t.codec_params) for t in tracks]
        outs = [[], []]
        seen = set()
        while True:
            p = r.next_packet()
            if p is None:
                break
            seen.add(p.track_id)
            buf = decs[p.track_id].decode(p)
            if len(buf):
                outs[p.track_id].append(buf.planes().copy())
        assert seen == {0, 1}
        for tid in (0, 1):
            got = np.concatenate(outs[tid], axis=1)
            np.testing.assert_array_equal(got, single)

    def test_forward_seek_on_pipe_keeps_primary_exact(self):
        from symphonia_tpu.core.formats import SeekMode, SeekTo
        from symphonia_tpu.formats.ogg import OggStreamReader

        with open(HOUSE_OGG, "rb") as f:
            data = f.read()
        muxed = TestOggMultiplexed._remux_two_streams(data)
        r = OggStreamReader(MediaSourceStream(self._Pipe(muxed)))
        res = r.seek(SeekMode.ACCURATE, SeekTo(ts=30000))
        assert res.actual_ts <= 30000 + 8192
        # Primary packets still decode; siblings re-anchor on their next
        # granule page and keep flowing.
        seen = set()
        for _ in range(64):
            p = r.next_packet()
            if p is None:
                break
            seen.add(p.track_id)
        assert 0 in seen and 1 in seen
