"""AIFF and CAF demux tests using self-built containers + the stdlib aifc
module as an independent AIFF writer."""

import io
import struct

import numpy as np
import pytest

import symphonia_tpu as sym
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.aiff import AiffReader, parse_extended_f80
from symphonia_tpu.formats.caf import CafReader


def decode_all(data: bytes):
    probed = sym.get_probe().probe(MediaSourceStream(data))
    fmt = probed.format
    track = fmt.default_track()
    dec = sym.get_codecs().make_audio_decoder(track.codec_params)
    outs = []
    while True:
        pkt = fmt.next_packet()
        if pkt is None:
            break
        outs.append(dec.decode(pkt).planes().copy())
    return np.concatenate(outs, axis=1), track, fmt


def pack_f80(rate: float) -> bytes:
    import math

    if rate == 0:
        return b"\x00" * 10
    exp = int(math.floor(math.log2(rate)))
    mantissa = int(rate / 2.0**exp * (1 << 63))
    return struct.pack(">H", exp + 16383) + mantissa.to_bytes(8, "big")


def make_aiff(frames: np.ndarray, rate=44100, bits=16, aifc=False, comp=b"NONE"):
    n, ch = frames.shape
    if comp == b"sowt":
        payload = frames.astype("<i2").tobytes()
    elif bits == 16:
        payload = frames.astype(">i2").tobytes()
    elif bits == 8:
        payload = frames.astype(np.int8).tobytes()
    elif bits == 24:
        b = frames.astype(">i4").tobytes()
        payload = b"".join(b[i + 1 : i + 4] for i in range(0, len(b), 4))
    comm = struct.pack(">HIH", ch, n, bits) + pack_f80(rate)
    if aifc:
        comm += comp + b"\x00\x00"  # empty pascal string, padded
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    ssnd = struct.pack(">II", 0, 0) + payload
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    form_type = b"AIFC" if aifc else b"AIFF"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks


class TestAiff:
    def test_s16_stereo(self):
        rng = np.random.default_rng(0)
        frames = rng.integers(-32768, 32767, size=(3000, 2), dtype=np.int32)
        out, track, _ = decode_all(make_aiff(frames))
        assert track.codec_params.codec == "pcm_s16be"
        assert track.codec_params.sample_rate == 44100
        np.testing.assert_array_equal(out, frames.T)

    def test_s24(self):
        rng = np.random.default_rng(1)
        frames = rng.integers(-(1 << 23), (1 << 23) - 1, size=(500, 1), dtype=np.int32)
        out, track, _ = decode_all(make_aiff(frames, bits=24))
        np.testing.assert_array_equal(out, frames.T)

    def test_aifc_sowt(self):
        rng = np.random.default_rng(2)
        frames = rng.integers(-32768, 32767, size=(400, 2), dtype=np.int32)
        out, track, _ = decode_all(make_aiff(frames, aifc=True, comp=b"sowt"))
        assert track.codec_params.codec == "pcm_s16le"
        np.testing.assert_array_equal(out, frames.T)

    def test_vs_stdlib_aifc_writer(self):
        aifc_mod = pytest.importorskip("aifc")

        class KeepOpen(io.BytesIO):
            def close(self):  # aifc closes the file; keep the buffer
                pass

        buf = KeepOpen()
        w = aifc_mod.open(buf, "wb")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        rng = np.random.default_rng(3)
        pcm = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int32).astype(">i2")
        w.writeframes(pcm.tobytes())
        w.close()
        out, track, _ = decode_all(buf.getvalue())
        assert track.codec_params.sample_rate == 8000
        np.testing.assert_array_equal(out, pcm.astype(np.int32).T)

    def test_f80(self):
        for rate in [8000, 22050, 44100, 48000, 96000]:
            assert round(parse_extended_f80(pack_f80(rate))) == rate

    def test_seek(self):
        frames = np.arange(8000, dtype=np.int32).reshape(-1, 2)
        data = make_aiff(frames, rate=4000)
        r = AiffReader(MediaSourceStream(data))
        seeked = r.seek("accurate", sym.SeekTo(ts=1000))
        pkt = r.next_packet()
        assert pkt.ts == seeked.actual_ts


def make_caf(frames: np.ndarray, rate=44100, fmt=b"lpcm", flags=0x2, bits=16):
    n, ch = frames.shape
    if flags & 0x2:
        payload = frames.astype("<i2").tobytes()
    else:
        payload = frames.astype(">i2").tobytes()
    bpp = ch * bits // 8
    desc = struct.pack(">d", float(rate)) + fmt + struct.pack(
        ">IIIII", flags, bpp, 1, ch, bits
    )
    out = b"caff" + struct.pack(">HH", 1, 0)
    out += b"desc" + struct.pack(">q", len(desc)) + desc
    data = struct.pack(">I", 0) + payload
    out += b"data" + struct.pack(">q", len(data)) + data
    return out


class TestCaf:
    def test_lpcm_le(self):
        rng = np.random.default_rng(4)
        frames = rng.integers(-32768, 32767, size=(2000, 2), dtype=np.int32)
        out, track, _ = decode_all(make_caf(frames))
        assert track.codec_params.codec == "pcm_s16le"
        np.testing.assert_array_equal(out, frames.T)

    def test_lpcm_be(self):
        rng = np.random.default_rng(5)
        frames = rng.integers(-32768, 32767, size=(777, 1), dtype=np.int32)
        out, track, _ = decode_all(make_caf(frames, flags=0))
        assert track.codec_params.codec == "pcm_s16be"
        np.testing.assert_array_equal(out, frames.T)

    def test_packet_table(self):
        rng = np.random.default_rng(6)
        frames = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int32)
        r = CafReader(MediaSourceStream(make_caf(frames)))
        table = r.packet_table()
        assert table.sizes.sum() == 100 * 4


class TestCafChan:
    def test_channel_bitmap(self):
        import struct as _s

        # Build a minimal CAF with a chan chunk carrying a bitmap layout.
        from symphonia_tpu.formats.caf import CafReader
        from symphonia_tpu.core.audio import Position

        desc = _s.pack(">dIIIIII", 8000.0, 0x6C70636D, 0, 8, 1, 2, 16)  # lpcm, 2ch s16
        chunks = b"caff" + _s.pack(">hh", 1, 0)
        chunks += b"desc" + _s.pack(">q", len(desc)) + desc
        chan = _s.pack(">III", 0x10000, int(Position.STEREO), 0)
        chunks += b"chan" + _s.pack(">q", len(chan)) + chan
        frames = _s.pack("<8h", *range(8))  # 4 frames stereo (LE? lpcm flags=0 -> BE)
        data = _s.pack(">I", 0) + frames
        chunks += b"data" + _s.pack(">q", len(data)) + data
        r = CafReader(MediaSourceStream(chunks))
        t = r.default_track()
        assert t.codec_params.channels.mask == int(Position.STEREO)


class TestAiffId3:
    def test_id3_chunk(self):
        import struct as _s
        from test_metadata import build_id3v2, text_frame

        tag = build_id3v2([("TIT2", text_frame("Aiff Song"))])
        if len(tag) % 2:
            tag += b"\x00"
        comm = _s.pack(">hIh", 1, 4, 16) + b"\x40\x0b\xfa\x00\x00\x00\x00\x00\x00\x00"
        ssnd = _s.pack(">II", 0, 0) + _s.pack(">4h", 1, 2, 3, 4)
        body = b"AIFF"
        body += b"COMM" + _s.pack(">I", len(comm)) + comm
        body += b"ID3 " + _s.pack(">I", len(tag)) + tag
        body += b"SSND" + _s.pack(">I", len(ssnd)) + ssnd
        data = b"FORM" + _s.pack(">I", len(body)) + body
        from symphonia_tpu.formats.aiff import AiffReader

        r = AiffReader(MediaSourceStream(data))
        rev = r.metadata().current()
        assert rev is not None and rev.get("track_title") == "Aiff Song"

class TestCafPaktBounds:
    """Regression (soak hardening): a mutated pakt chunk must not drive a
    giant allocation/walk or escape the error taxonomy."""

    def _caf_with_pakt(self, pakt_payload: bytes) -> bytes:
        frames = np.zeros((64, 1), dtype=np.int64)
        base = make_caf(frames, rate=8000)
        # Splice a pakt chunk before the data chunk.
        i = base.find(b"data")
        pakt = b"pakt" + struct.pack(">q", len(pakt_payload)) + pakt_payload
        return base[:i] + pakt + base[i:]

    def test_giant_count_rejected_fast(self):
        import time

        from symphonia_tpu.core.errors import DecodeError
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.caf import CafReader

        payload = struct.pack(">qqii", 1 << 40, 0, 0, 0) + b"\x01" * 16
        t0 = time.time()
        with pytest.raises(DecodeError):
            CafReader(MediaSourceStream(self._caf_with_pakt(payload)))
        assert time.time() - t0 < 2.0

    def test_negative_count_and_truncated_varint(self):
        from symphonia_tpu.core.errors import DecodeError
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.caf import CafReader

        neg = struct.pack(">qqii", -5, 0, 0, 0)
        with pytest.raises(DecodeError):
            CafReader(MediaSourceStream(self._caf_with_pakt(neg)))
        # Count of 2 but only continuation-bit bytes of table.
        trunc = struct.pack(">qqii", 2, 0, 0, 0) + b"\x80\x80"
        with pytest.raises(DecodeError):
            CafReader(MediaSourceStream(self._caf_with_pakt(trunc)))

    def test_giant_declared_data_size_bounded(self):
        """A mutated data-chunk size (seekable source: ignore_bytes seeks
        past EOF silently) must not drive a giant CBR packet table."""
        import time

        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.caf import CafReader

        frames = np.zeros((64, 1), dtype=np.int64)
        base = bytearray(make_caf(frames, rate=8000))
        i = bytes(base).find(b"data")
        base[i + 4 : i + 12] = (1 << 60).to_bytes(8, "big")
        t0 = time.time()
        r = CafReader(MediaSourceStream(bytes(base)))
        table = r.packet_table()
        assert len(table) <= 64
        assert time.time() - t0 < 2.0


class TestF80Bounds:
    def test_crafted_exponent_no_overflow(self):
        """Regression (soak): a COMM exponent near 0x7FFF drove 2.0**e
        past the f64 range — OverflowError escaped the taxonomy."""
        from symphonia_tpu.core.errors import DecodeError

        with pytest.raises(DecodeError):
            parse_extended_f80(b"\x7f\xfe" + b"\xff" * 8)
        # Deep-negative exponents underflow to 0.0 (caller rejects rate 0).
        assert parse_extended_f80(b"\x00\x01" + b"\x00" * 8) == 0.0


class TestCafDescBounds:
    def test_fractional_and_nan_rates_rejected(self):
        """Regression (soak): desc rate in (0,1) truncated to a zero
        TimeBase (raw ValueError); NaN raised on int()."""
        from symphonia_tpu.core.errors import DecodeError
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.caf import CafReader

        frames = np.zeros((32, 1), dtype=np.int64)
        base = make_caf(frames, rate=8000)
        for bad in (0.5, float("nan"), float("inf")):
            data = bytearray(base)
            i = data.find(b"desc") + 4 + 8  # chunk type + i64 size
            data[i : i + 8] = struct.pack(">d", bad)
            with pytest.raises(DecodeError):
                CafReader(MediaSourceStream(bytes(data)))


def _caf_vbr(fmt_id: bytes, frames, rate, fpp, n_ch=1, bits=0, kuki=b""):
    """CAF with a VBR pakt table: one packet per element of ``frames``."""
    desc = struct.pack(">d", float(rate)) + fmt_id + struct.pack(
        ">IIIII", 0, 0, fpp, n_ch, bits)
    pakt = struct.pack(">qqii", len(frames), len(frames) * fpp, 0, 0)
    for f in frames:
        n = len(f)
        varint = bytearray()
        while True:
            varint.insert(0, n & 0x7F)
            n >>= 7
            if not n:
                break
        for i in range(len(varint) - 1):
            varint[i] |= 0x80
        pakt += bytes(varint)
    payload = b"".join(frames)
    out = b"caff" + struct.pack(">HH", 1, 0)
    out += b"desc" + struct.pack(">q", len(desc)) + desc
    if kuki:
        out += b"kuki" + struct.pack(">q", len(kuki)) + kuki
    out += b"pakt" + struct.pack(">q", len(pakt)) + pakt
    out += b"data" + struct.pack(">q", len(payload) + 4) + struct.pack(">I", 0) + payload
    return out


class TestCafCompressedFormats:
    """CAF '.mp3' and 'aac ' format ids (chunks.rs:282-306); the AAC magic
    cookie is an ES descriptor whose DecoderSpecificInfo is the decoder
    extra data (demuxer.rs:517-542)."""

    def _decode_packets(self, reader):
        import symphonia_tpu as sym

        t = reader.default_track()
        dec = sym.get_codecs().make_audio_decoder(t.codec_params)
        outs = []
        while True:
            p = reader.next_packet()
            if p is None:
                break
            buf = dec.decode(p)
            if len(buf):
                outs.append(buf.planes().copy())
        return np.concatenate(outs, axis=1)

    def test_mp3_in_caf(self):
        import symphonia_tpu as sym
        from mp3_builder import build_mpeg1_l3_stream
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.mpa import try_parse_header

        stream = build_mpeg1_l3_stream(6, n_ch=1)
        # Split into frames via header sizes.
        frames, pos = [], 0
        while pos < len(stream):
            h = try_parse_header(stream[pos:pos + 4], 0)
            frames.append(stream[pos:pos + h.frame_size])
            pos += h.frame_size
        caf = _caf_vbr(b".mp3", frames, h.sample_rate, 1152)
        probed = sym.get_probe().probe(MediaSourceStream(caf))
        t = probed.format.default_track()
        assert t.codec_params.codec == "mp3"
        got = self._decode_packets(probed.format)
        # Reference result: the same stream through the MPA reader.
        ref_probe = sym.get_probe().probe(MediaSourceStream(stream))
        ref = self._decode_packets(ref_probe.format)
        np.testing.assert_array_equal(got, ref)

    def test_aac_in_caf_es_descriptor_kuki(self):
        import symphonia_tpu as sym
        from aac_builder import build_raw_block, random_quant_spectrum
        from test_aac import GAIN, MAX_SFB, RATE
        from symphonia_tpu.common.mpeg import AudioSpecificConfig
        from symphonia_tpu.core.codecs import AudioCodecParameters
        from symphonia_tpu.core.io import MediaSourceStream

        rng = np.random.default_rng(3)
        frames = [build_raw_block([random_quant_spectrum(rng, MAX_SFB, RATE)],
                                  [0], MAX_SFB, GAIN, RATE) for _ in range(4)]
        asc = AudioSpecificConfig.build(2, RATE, 1)
        dsi = bytes([0x05, len(asc)]) + asc
        dcd = bytes([0x04, 13 + len(dsi), 0x40, 0x15]) + b"\x00" * 11 + dsi
        slc = bytes([0x06, 0x01, 0x02])
        es = bytes([0x03, 3 + len(dcd) + len(slc)]) + b"\x00\x00\x00" + dcd + slc
        caf = _caf_vbr(b"aac ", frames, RATE, 1024, kuki=es)
        probed = sym.get_probe().probe(MediaSourceStream(caf))
        t = probed.format.default_track()
        assert t.codec_params.codec == "aac"
        assert t.codec_params.extra_data == asc  # cookie unwrapped to ASC
        got = self._decode_packets(probed.format)
        # Reference: decode the same raw blocks directly with the ASC.
        dec = sym.get_codecs().make_audio_decoder(AudioCodecParameters(
            codec="aac", sample_rate=RATE, extra_data=asc))
        from symphonia_tpu.core.packet import Packet

        refs = []
        for i, f in enumerate(frames):
            buf = dec.decode(Packet(track_id=0, ts=i * 1024, dur=1024, data=f))
            if len(buf):
                refs.append(buf.planes().copy())
        ref = np.concatenate(refs, axis=1)
        np.testing.assert_array_equal(got, ref)


class TestAifcMoreCompressions:
    """AIFC in24/in32/23ni/raw compression types + case-insensitive ids
    (aiff/chunks.rs:81-131,275-287)."""

    def _aifc(self, payload, n, ch, bits, comp, rate=8000):
        comm = struct.pack(">HIH", ch, n, bits) + pack_f80(rate)
        comm += comp + b"\x00\x00"
        chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
        ssnd = struct.pack(">II", 0, 0) + payload
        chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        if len(ssnd) & 1:
            chunks += b"\x00"
        return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFC" + chunks

    def test_23ni_le32(self):
        rng = np.random.default_rng(5)
        frames = rng.integers(-1 << 31, (1 << 31) - 1, size=(200, 2),
                              dtype=np.int64).astype(np.int32)
        data = self._aifc(frames.astype("<i4").tobytes(), 200, 2, 32, b"23ni")
        out, track, _ = decode_all(data)
        assert track.codec_params.codec == "pcm_s32le"
        np.testing.assert_array_equal(out, frames.T)

    def test_in24_be(self):
        rng = np.random.default_rng(6)
        frames = rng.integers(-1 << 23, 1 << 23, size=(100, 1)).astype(np.int32)
        b4 = frames.astype(">i4").tobytes()
        payload = b"".join(b4[i + 1:i + 4] for i in range(0, len(b4), 4))
        data = self._aifc(payload, 100, 1, 24, b"IN24")
        out, track, _ = decode_all(data)
        assert track.codec_params.codec == "pcm_s24be"
        np.testing.assert_array_equal(out, frames.T)

    def test_in32_be(self):
        rng = np.random.default_rng(7)
        frames = rng.integers(-1 << 31, (1 << 31) - 1, size=(64, 1),
                              dtype=np.int64).astype(np.int32)
        data = self._aifc(frames.astype(">i4").tobytes(), 64, 1, 32, b"in32")
        out, track, _ = decode_all(data)
        assert track.codec_params.codec == "pcm_s32be"
        np.testing.assert_array_equal(out, frames.T)

    def test_raw_u8(self):
        rng = np.random.default_rng(8)
        frames = rng.integers(0, 256, size=(64, 1), dtype=np.int64)
        data = self._aifc(frames.astype(np.uint8).tobytes(), 64, 1, 8, b"raw ")
        out, track, _ = decode_all(data)
        assert track.codec_params.codec == "pcm_u8"
        np.testing.assert_array_equal(out, frames.T - 128)

    def test_uppercase_sowt_and_width_validation(self):
        from symphonia_tpu.core.errors import DecodeError, Unsupported

        rng = np.random.default_rng(9)
        frames = rng.integers(-1 << 15, 1 << 15, size=(50, 1)).astype(np.int32)
        data = self._aifc(frames.astype("<i2").tobytes(), 50, 1, 16, b"SOWT")
        out, track, _ = decode_all(data)
        assert track.codec_params.codec == "pcm_s16le"
        np.testing.assert_array_equal(out, frames.T)
        # twos at a non-16-bit width is rejected (chunks.rs:153-157).
        bad = self._aifc(frames.astype("<i4").tobytes(), 50, 1, 32, b"twos")
        import pytest as _pytest

        with _pytest.raises((DecodeError, Unsupported)):
            decode_all(bad)


class TestAiffMarkers:
    """MARK -> chapters, COMT -> chapter/general comments
    (aiff/mod.rs:244-317)."""

    def _pascal(self, s: bytes) -> bytes:
        out = bytes([len(s)]) + s
        return out + (b"\x00" if len(out) % 2 else b"")

    def test_markers_and_comments(self):
        frames = np.zeros((100, 1), dtype=np.int32)
        base = make_aiff(frames, rate=8000)
        mark = struct.pack(">H", 2)
        mark += struct.pack(">hI", 1, 4000) + self._pascal(b"Mid")
        mark += struct.pack(">hI", 2, 8000) + self._pascal(b"End")
        # Comment text is read exactly (chunks.rs:416-425), no padding.
        comt = struct.pack(">H", 2)
        comt += struct.pack(">IhH", 0, 1, 5) + b"hello"
        comt += struct.pack(">IhH", 0, 0, 7) + b"general"
        extra = b"MARK" + struct.pack(">I", len(mark)) + mark
        extra += b"COMT" + struct.pack(">I", len(comt)) + comt
        # Insert before SSND and fix the FORM size.
        at = base.find(b"SSND")
        data = bytearray(base[:at] + extra + base[at:])
        struct.pack_into(">I", data, 4, len(data) - 8)
        r = AiffReader(MediaSourceStream(bytes(data)))
        grp = r.chapters()
        assert grp is not None and len(grp.items) == 2
        assert grp.items[0].title == "Mid"
        assert grp.items[0].start_time == 0.5
        assert grp.items[1].start_time == 1.0
        # Comment with marker_id 1 attached to the first chapter.
        assert any(t.value == "hello" for t in grp.items[0].tags)
        rev = r.metadata().current()
        assert rev is not None and any(t.value == "general" for t in rev.tags)


class TestAiffMalformed:
    """Crafted COMM/SSND fields must not produce negative geometry or
    escape the error taxonomy."""

    def test_negative_sample_rate_rejected(self):
        from symphonia_tpu.core.errors import DecodeError

        frames = np.zeros((16, 1), dtype=np.int32)
        data = bytearray(make_aiff(frames, rate=44100))
        at = data.find(b"COMM") + 8 + 8  # f80 rate field
        data[at] |= 0x80  # set the sign bit
        with pytest.raises(DecodeError):
            AiffReader(MediaSourceStream(bytes(data)))

    def test_huge_ssnd_offset_bounded(self):
        # A 4 GiB alignment offset must not drive negative data length /
        # negative num_frames (ignore_bytes seeks past EOF silently on
        # seekable sources).
        frames = np.zeros((16, 1), dtype=np.int32)
        data = bytearray(make_aiff(frames, rate=8000))
        at = data.find(b"SSND") + 8
        struct.pack_into(">I", data, at, 0xFFFF0000)
        r = AiffReader(MediaSourceStream(bytes(data)))
        assert r._data_len == 0
        assert r._track.num_frames == 0
        assert r.next_packet() is None

    def test_tiny_ssnd_chunk_skipped(self):
        frames = np.zeros((16, 1), dtype=np.int32)
        base = make_aiff(frames, rate=8000)
        at = base.find(b"SSND")
        # Insert a degenerate 4-byte SSND chunk before the real one.
        extra = b"SSND" + struct.pack(">I", 4) + b"\x00" * 4
        data = bytearray(base[:at] + extra + base[at:])
        struct.pack_into(">I", data, 4, len(data) - 8)
        out, track, _ = decode_all(bytes(data))
        assert out.shape[1] == 16


class TestCafNegativeChunkSize:
    def test_negative_nondata_size_rejected(self):
        import struct as _s

        from symphonia_tpu.core.errors import DecodeError
        from symphonia_tpu.formats.caf import CafReader

        data = (b"caff" + _s.pack(">HH", 1, 0)
                + b"desc" + _s.pack(">q", -5) + b"\x00" * 16)
        with pytest.raises(DecodeError):
            CafReader(MediaSourceStream(data))
