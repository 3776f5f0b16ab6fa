"""End-to-end WAV demux + PCM decode tests.

Differential-tests against scipy.io.wavfile and the stdlib fixtures
(SURVEY.md §4's conformance-testing analog for the simplest codec).
"""

import io
import struct
import wave

import numpy as np
import pytest

import symphonia_tpu as sym
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.core.formats import SeekMode, SeekTo
from symphonia_tpu.core.audio import SampleFormat
from symphonia_tpu.formats.wav import WavReader


def make_wav(
    frames: np.ndarray, rate: int = 44100, fmt_tag: int = 1, bits: int = 16
) -> bytes:
    """Synthesize a WAV file. frames: [n, ch] int (right-justified) or float."""
    n, ch = frames.shape
    if fmt_tag == 1:
        if bits == 16:
            payload = frames.astype("<i2").tobytes()
        elif bits == 8:
            payload = (frames + 128).astype(np.uint8).tobytes()
        elif bits == 24:
            x = frames.astype("<i4").tobytes()
            payload = b"".join(x[i : i + 3] for i in range(0, len(x), 4))
        elif bits == 32:
            payload = frames.astype("<i4").tobytes()
        block = ch * ((bits + 7) // 8)
    elif fmt_tag == 3:
        payload = frames.astype("<f4").tobytes()
        bits = 32
        block = ch * 4
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_all(data: bytes, **kwargs):
    mss = MediaSourceStream(data)
    probed = sym.get_probe().probe(mss)
    fmt = probed.format
    track = fmt.default_track()
    dec = sym.get_codecs().make_audio_decoder(track.codec_params)
    outs = []
    while True:
        pkt = fmt.next_packet()
        if pkt is None:
            break
        outs.append(dec.decode(pkt).planes().copy())
    return np.concatenate(outs, axis=1) if outs else np.zeros((0, 0)), track


class TestWavRoundtrip:
    def test_s16_stereo(self):
        rng = np.random.default_rng(0)
        frames = rng.integers(-32768, 32767, size=(10000, 2), dtype=np.int32)
        data = make_wav(frames)
        out, track = decode_all(data)
        assert track.codec_params.codec == "pcm_s16le"
        assert track.codec_params.sample_rate == 44100
        np.testing.assert_array_equal(out, frames.T)

    def test_u8_mono(self):
        rng = np.random.default_rng(1)
        frames = rng.integers(-128, 127, size=(777, 1), dtype=np.int32)
        out, track = decode_all(make_wav(frames, bits=8))
        np.testing.assert_array_equal(out, frames.T)

    def test_s24(self):
        rng = np.random.default_rng(2)
        frames = rng.integers(-(1 << 23), (1 << 23) - 1, size=(500, 2), dtype=np.int32)
        out, track = decode_all(make_wav(frames, bits=24))
        np.testing.assert_array_equal(out, frames.T)

    def test_s32(self):
        rng = np.random.default_rng(3)
        frames = rng.integers(-(1 << 31), (1 << 31) - 1, size=(300, 2), dtype=np.int64).astype(np.int32)
        out, _ = decode_all(make_wav(frames, bits=32))
        np.testing.assert_array_equal(out, frames.T)

    def test_f32(self):
        rng = np.random.default_rng(4)
        frames = (rng.random((400, 2), dtype=np.float32) * 2 - 1).astype(np.float32)
        out, track = decode_all(make_wav(frames, fmt_tag=3))
        assert track.codec_params.codec == "pcm_f32le"
        np.testing.assert_array_equal(out, frames.T.astype(np.float32))

    def test_vs_scipy(self):
        from scipy.io import wavfile

        rng = np.random.default_rng(5)
        frames = rng.integers(-32768, 32767, size=(4410, 2), dtype=np.int32)
        data = make_wav(frames)
        rate, ref = wavfile.read(io.BytesIO(data))
        out, track = decode_all(data)
        assert rate == track.codec_params.sample_rate
        np.testing.assert_array_equal(out, ref.T.astype(np.int32))

    def test_vs_stdlib_wave_module(self):
        # Generate with the stdlib `wave` module, decode with us.
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        rng = np.random.default_rng(6)
        pcm = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int16)
        w.writeframes(pcm.tobytes())
        w.close()
        out, _ = decode_all(buf.getvalue())
        np.testing.assert_array_equal(out, pcm.T.astype(np.int32))


class TestWavSeek:
    def test_seek_sample_accurate(self):
        frames = np.arange(20000, dtype=np.int32).reshape(-1, 2)  # 10000 frames
        data = make_wav(frames, rate=10000)
        mss = MediaSourceStream(data)
        fmt = WavReader(mss)
        seeked = fmt.seek(SeekMode.ACCURATE, SeekTo(ts=5000))
        assert seeked.actual_ts == 5000
        pkt = fmt.next_packet()
        assert pkt.ts == 5000
        dec = sym.get_codecs().make_audio_decoder(fmt.default_track().codec_params)
        buf = dec.decode(pkt)
        assert buf.chan(0)[0] == 10000  # frame 5000 ch0 = 5000*2

    def test_seek_by_time(self):
        frames = np.zeros((44100, 2), dtype=np.int32)
        data = make_wav(frames)
        fmt = WavReader(MediaSourceStream(data))
        seeked = fmt.seek(SeekMode.ACCURATE, SeekTo(time=sym.Time(0, 0.5)))
        assert seeked.required_ts == 22050


class TestPacketTable:
    def test_table_matches_loop(self):
        frames = np.arange(30000, dtype=np.int32).reshape(-1, 2)
        data = make_wav(frames)
        t1 = WavReader(MediaSourceStream(data)).packet_table()
        # reference: drain next_packet via base class implementation
        r2 = WavReader(MediaSourceStream(data))
        pkts = []
        while True:
            p = r2.next_packet()
            if p is None:
                break
            pkts.append(p)
        assert len(t1) == len(pkts)
        np.testing.assert_array_equal(t1.ts, [p.ts for p in pkts])
        np.testing.assert_array_equal(t1.dur, [p.dur for p in pkts])
        np.testing.assert_array_equal(t1.sizes, [len(p.data) for p in pkts])
        # offsets point at the same bytes
        for off, size, p in zip(t1.offsets, t1.sizes, pkts):
            assert data[off : off + size] == p.data


class TestAlawMulaw:
    def _make_g711_wav(self, tag: int, payload: bytes, rate=8000) -> bytes:
        fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_mulaw_known_values(self):
        data = self._make_g711_wav(7, bytes([0xFF, 0x7F, 0x80, 0x00]))
        out, track = decode_all(data)
        assert track.codec_params.codec == "pcm_mulaw"
        # mu-law: 0xFF -> 0, 0x7F -> -0, 0x80 -> +max-ish, 0x00 -> -max-ish
        assert out[0][0] == 0
        assert out[0][1] == 0
        assert out[0][2] == 32124
        assert out[0][3] == -32124

    def test_alaw_known_values(self):
        data = self._make_g711_wav(6, bytes([0x55, 0xD5, 0x2A, 0xAA]))
        out, track = decode_all(data)
        assert track.codec_params.codec == "pcm_alaw"
        assert out[0][0] == -8  # alaw 0x55 -> -8
        assert out[0][1] == 8  # alaw 0xD5 -> +8
        assert out[0][2] == -32256
        assert out[0][3] == 32256


class TestRf64:
    def test_rf64_with_ds64(self):
        rng = np.random.default_rng(12)
        frames = rng.integers(-32768, 32767, size=(2000, 2), dtype=np.int32)
        payload = frames.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
        ds64 = struct.pack("<QQQ", 0, len(payload), len(frames)) + b"\x00" * 4
        chunks = b"ds64" + struct.pack("<I", len(ds64)) + ds64
        chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", 0xFFFFFFFF) + payload
        data = b"RF64" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE" + chunks
        out, track = decode_all(data)
        assert track.num_frames == 2000
        np.testing.assert_array_equal(out, frames.T)


def make_wav_extensible(frames, rate, guid_tag, guid_tail, ch_mask=0,
                        valid_bits=0, bits=16, float_fmt=False):
    """WAVE_FORMAT_EXTENSIBLE fmt chunk (wave/chunks.rs:225-340)."""
    n, ch = frames.shape
    if float_fmt:
        payload = frames.astype("<f4").tobytes()
        bits = 32
    elif bits == 16:
        payload = frames.astype("<i2").tobytes()
    elif bits == 24:
        b4 = frames.astype("<i4").tobytes()
        payload = b"".join(b4[i:i + 3] for i in range(0, len(b4), 4))
    block = ch * (bits // 8)
    guid = guid_tag.to_bytes(4, "little") + guid_tail
    fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * block, block, bits)
    fmt += struct.pack("<HHI", 22, valid_bits, ch_mask) + guid
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


class TestWavExtensible:
    """WAVE_FORMAT_EXTENSIBLE: GUID sub-format, channel mask, and the
    Ambisonic B-format GUIDs (wave/chunks.rs:225-340, 740-810)."""

    STD_TAIL = bytes([0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
                      0x00, 0x38, 0x9B, 0x71])
    AMB_TAIL = bytes([0x21, 0x07, 0xD3, 0x11, 0x86, 0x44, 0xC8, 0xC1,
                      0xCA, 0x00, 0x00, 0x00])

    def test_pcm_with_channel_mask(self):
        from symphonia_tpu.core.audio import Position

        rng = np.random.default_rng(1)
        frames = rng.integers(-1 << 15, 1 << 15, size=(500, 2), dtype=np.int32)
        mask = int(Position.FRONT_LEFT | Position.LFE1)
        data = make_wav_extensible(frames, 8000, 1, self.STD_TAIL,
                                   ch_mask=mask)
        out, track = decode_all(data)
        assert track.codec_params.codec == "pcm_s16le"
        assert track.codec_params.channels.mask == mask
        np.testing.assert_array_equal(out, frames.T)

    def test_ambisonic_bformat_pcm(self):
        rng = np.random.default_rng(2)
        frames = rng.integers(-1 << 15, 1 << 15, size=(256, 4), dtype=np.int32)
        data = make_wav_extensible(frames, 8000, 1, self.AMB_TAIL)
        out, track = decode_all(data)
        ch = track.codec_params.channels
        assert ch.custom == ("W", "X", "Y", "Z")
        np.testing.assert_array_equal(out, frames.T)

    def test_ambisonic_bformat_float(self):
        rng = np.random.default_rng(3)
        frames = rng.standard_normal((256, 2)).astype(np.float32)
        data = make_wav_extensible(frames, 8000, 3, self.AMB_TAIL,
                                   float_fmt=True)
        out, track = decode_all(data)
        assert track.codec_params.codec == "pcm_f32le"
        assert track.codec_params.channels.custom == ("W", "Y")
        np.testing.assert_array_equal(out, frames.T)

    def test_unknown_guid_rejected(self):
        from symphonia_tpu.core.errors import DecodeError, Unsupported

        frames = np.zeros((16, 1), dtype=np.int32)
        bad = bytes(reversed(self.STD_TAIL))
        data = make_wav_extensible(frames, 8000, 1, bad)
        with pytest.raises((DecodeError, Unsupported)):
            decode_all(data)

    def test_valid_bits_truncated_pcm(self):
        # 24-bit container holding 20 valid bits: coded width surfaces.
        rng = np.random.default_rng(4)
        frames = (rng.integers(-1 << 19, 1 << 19, size=(64, 1)) << 4).astype(np.int32)
        data = make_wav_extensible(frames, 8000, 1, self.STD_TAIL,
                                   valid_bits=20, bits=24)
        out, track = decode_all(data)
        assert track.codec_params.bits_per_coded_sample == 20
        # Samples are MSB-aligned in the 24-bit container; the decoder
        # yields the 20-bit coded values.
        np.testing.assert_array_equal(out, frames.T >> 4)


class TestWavMalformed:
    """Crafted-header robustness: errors must stay in the taxonomy
    (wave/chunks.rs validates fmt fields before building the track)."""

    def test_zero_sample_rate_rejected(self):
        from symphonia_tpu.core.errors import DecodeError
        from symphonia_tpu.formats.wav import WavReader

        frames = np.zeros((16, 1), dtype=np.int32)
        data = bytearray(make_wav(frames, rate=44100))
        at = data.find(b"fmt ") + 8 + 4  # tag(2)+ch(2) then rate
        struct.pack_into("<I", data, at, 0)
        with pytest.raises(DecodeError):
            WavReader(MediaSourceStream(bytes(data)))

    def test_undersized_fact_and_list_chunks_skipped(self):
        # fact with size<4 and LIST with size<4 must not desync the walk.
        frames = np.arange(32, dtype=np.int32).reshape(-1, 1)
        base = make_wav(frames, rate=8000)
        at = base.find(b"data")
        extra = b"fact" + struct.pack("<I", 2) + b"\x00\x00"
        extra += b"LIST" + struct.pack("<I", 2) + b"\x00\x00"
        data = bytearray(base[:at] + extra + base[at:])
        struct.pack_into("<I", data, 4, len(data) - 8)
        out, track = decode_all(bytes(data))
        np.testing.assert_array_equal(out, frames.T)


class TestWavPipe:
    """WAV over a non-seekable source: a lying/streaming data-chunk size
    must stream to EOF, not raise mid-packet (wave streaming encoders
    routinely write 0 or 0xFFFFFFFF)."""

    class _Pipe(io.RawIOBase):
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def readable(self):
            return True

        def read(self, n=-1):
            return self._b.read(n)

        def seekable(self):
            return False

    def _stream(self, data: bytes):
        mss = MediaSourceStream(self._Pipe(data))
        fmt = sym.get_probe().probe(mss).format
        track = fmt.default_track()
        dec = sym.get_codecs().make_audio_decoder(track.codec_params)
        outs = []
        while True:
            pkt = fmt.next_packet()
            if pkt is None:
                break
            outs.append(dec.decode(pkt).planes().copy())
        out = np.concatenate(outs, axis=1) if outs else np.zeros((1, 0))
        return out, track

    def test_lying_data_size_streams_to_eof(self):
        frames = np.arange(-300, 300, dtype=np.int32).reshape(-1, 1)
        data = bytearray(make_wav(frames, rate=8000))
        struct.pack_into("<I", data, data.find(b"data") + 4, 0xFFFFFFFF)
        out, track = self._stream(bytes(data))
        assert track.num_frames is None  # unbounded: no fake total
        np.testing.assert_array_equal(out, frames.T)

    def test_zero_data_size_streams_to_eof(self):
        frames = np.arange(128, dtype=np.int32).reshape(-1, 1)
        data = bytearray(make_wav(frames, rate=8000))
        struct.pack_into("<I", data, data.find(b"data") + 4, 0)
        out, _ = self._stream(bytes(data))
        np.testing.assert_array_equal(out, frames.T)

    def test_truncated_seekable_final_packet(self):
        frames = np.arange(5000, dtype=np.int32).reshape(-1, 1)
        data = make_wav(frames, rate=8000)
        out, _ = decode_all(data[:-6])  # cut mid-sample
        np.testing.assert_array_equal(out[0], frames[: out.shape[1], 0])
