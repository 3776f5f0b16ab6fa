"""Matroska demux tests with a minimal EBML muxer: PCM and AAC tracks,
lacing modes, tags, seek."""

import struct

import numpy as np
import pytest

import symphonia_tpu as sym
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.mkv import MkvReader, read_vint, unlace

from aac_builder import build_raw_block, random_quant_spectrum
from test_aac import GAIN, MAX_SFB, RATE


def vint_size(v: int) -> bytes:
    """Encode an EBML data size."""
    for length in range(1, 9):
        if v < (1 << (7 * length)) - 1:
            out = v | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError


def elem(eid: int, payload: bytes) -> bytes:
    eid_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return eid_bytes + vint_size(len(payload)) + payload


def uint_elem(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return elem(eid, v.to_bytes(n, "big"))


def float_elem(eid: int, v: float) -> bytes:
    return elem(eid, struct.pack(">d", v))


def simple_block(track: int, rel_ts: int, frames, lacing=0) -> bytes:
    body = bytes([0x80 | track]) + struct.pack(">h", rel_ts)
    if lacing == 0:
        assert len(frames) == 1
        body += bytes([0x00]) + frames[0]
    elif lacing == 1:  # Xiph
        body += bytes([0x02, len(frames) - 1])
        for f in frames[:-1]:
            n = len(f)
            while n >= 255:
                body += bytes([255])
                n -= 255
            body += bytes([n])
        body += b"".join(frames)
    elif lacing == 2:  # fixed
        body += bytes([0x04, len(frames) - 1]) + b"".join(frames)
    return elem(0xA3, body)


def build_mkv(codec_id: str, private: bytes, blocks, rate=44100, ch=1,
              bit_depth=None, tags=None, extra_segment=b"") -> bytes:
    ebml_hdr = elem(0x1A45DFA3,
                    elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
    track_entry = (
        uint_elem(0xD7, 1) + uint_elem(0x83, 2)
        + elem(0x86, codec_id.encode())
        + (elem(0x63A2, private) if private else b"")
        + elem(0xE1, float_elem(0xB5, float(rate)) + uint_elem(0x9F, ch)
               + (uint_elem(0x6264, bit_depth) if bit_depth else b""))
    )
    tracks = elem(0x1654AE6B, elem(0xAE, track_entry))
    info = elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
    clusters = b""
    for cluster_ts, cluster_blocks in blocks:
        body = uint_elem(0xE7, cluster_ts)
        for blk in cluster_blocks:
            body += blk
        clusters += elem(0x1F43B675, body)
    tags_data = b""
    if tags:
        simple_tags = b""
        for k, v in tags.items():
            simple_tags += elem(0x67C8, elem(0x45A3, k.encode()) + elem(0x4487, v.encode()))
        tags_data = elem(0x1254C367, elem(0x7373, simple_tags))
    segment = elem(0x18538067, info + tracks + clusters + tags_data
                   + extra_segment)
    return ebml_hdr + segment


class TestEbml:
    def test_vint(self):
        assert read_vint(b"\x81", 0, False) == (1, 1)
        assert read_vint(b"\x40\x02", 0, False) == (2, 2)
        assert read_vint(b"\x21\x23\x45", 0, False) == (0x12345, 3)

    def test_unlace_xiph(self):
        frames = [b"aaa", b"bb", b"cccc"]
        blk = simple_block(1, 0, frames, lacing=1)
        # Skip element header + track vint + ts to the flags byte.
        _, p = read_vint(blk, 0, True)
        _, p = read_vint(blk, p, False)
        _, p2 = read_vint(blk, p, False)
        got = unlace(blk[p2 + 2 :])
        assert got == frames

    def test_unlace_fixed(self):
        frames = [b"xxxx", b"yyyy", b"zzzz"]
        blk = simple_block(1, 0, frames, lacing=2)
        _, p = read_vint(blk, 0, True)
        _, p = read_vint(blk, p, False)
        _, p2 = read_vint(blk, p, False)
        assert unlace(blk[p2 + 2 :]) == frames


class TestMkvPcm:
    def test_pcm_track(self):
        rng = np.random.default_rng(0)
        pcm = rng.integers(-32768, 32767, size=(2000, 1), dtype=np.int32)
        payload = pcm.astype("<i2").tobytes()
        half = len(payload) // 2
        blocks = [
            (0, [simple_block(1, 0, [payload[:half]])]),
            (100, [simple_block(1, 0, [payload[half:]])]),
        ]
        data = build_mkv("A_PCM/INT/LIT", b"", blocks, rate=8000, ch=1, bit_depth=16)
        probed = sym.get_probe().probe(MediaSourceStream(data))
        assert isinstance(probed.format, MkvReader)
        track = probed.format.default_track()
        assert track.codec_params.codec == "pcm_s16le"
        dec = sym.get_codecs().make_audio_decoder(track.codec_params)
        outs = []
        while True:
            p = probed.format.next_packet()
            if p is None:
                break
            outs.append(dec.decode(p).planes().copy())
        got = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(got, pcm.T)

    def test_tags(self):
        data = build_mkv("A_PCM/INT/LIT", b"",
                         [(0, [simple_block(1, 0, [b"\x00\x00"])])],
                         bit_depth=16, tags={"TITLE": "MKV Song", "ARTIST": "Someone"})
        r = MkvReader(MediaSourceStream(data))
        rev = r.metadata().current()
        assert rev.get("track_title") == "MKV Song"
        assert rev.get("artist") == "Someone"


class TestMkvAac:
    def test_aac_track(self):
        from symphonia_tpu.common.mpeg import AudioSpecificConfig
        from test_aac import decode_adts
        from aac_builder import build_adts

        rng = np.random.default_rng(1)
        frames = [
            build_raw_block([random_quant_spectrum(rng, MAX_SFB, RATE)], [0],
                            MAX_SFB, GAIN, RATE)
            for _ in range(4)
        ]
        asc = AudioSpecificConfig.build(2, RATE, 1)
        blocks = [(i * 23, [simple_block(1, 0, [f])]) for i, f in enumerate(frames)]
        data = build_mkv("A_AAC", asc, blocks, rate=RATE, ch=1)
        r = MkvReader(MediaSourceStream(data))
        track = r.default_track()
        assert track.codec_params.codec == "aac"
        dec = sym.get_codecs().make_audio_decoder(track.codec_params)
        outs = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            outs.append(dec.decode(p).planes().copy())
        ours = np.concatenate(outs, axis=1)
        ref, _ = decode_adts(build_adts(frames, RATE, 1))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_seek(self):
        data = build_mkv(
            "A_PCM/INT/LIT", b"",
            [(t * 10, [simple_block(1, 0, [bytes(16)])]) for t in range(5)],
            bit_depth=16,
        )
        r = MkvReader(MediaSourceStream(data))
        seeked = r.seek("coarse", sym.SeekTo(ts=25))
        assert seeked.actual_ts == 20


class TestChaptersAttachments:
    def _pcm_stream(self, extra_segment):
        import struct as _s

        frames = [(_s.pack("<4h", i, -i, 2 * i, 7)) for i in range(4)]
        blocks = [(0, [simple_block(1, i, [f]) for i, f in enumerate(frames)])]
        return build_mkv("A_PCM/INT/LIT", b"", blocks, rate=8000, ch=1,
                         bit_depth=16, extra_segment=extra_segment)

    def test_chapters(self):
        atom = (uint_elem(0x91, 5_000_000_000) + uint_elem(0x92, 9_000_000_000)
                + elem(0x80, elem(0x85, "Part One".encode())))
        chapters = elem(0x1043A770, elem(0x45B9, elem(0xB6, atom)))
        r = MkvReader(MediaSourceStream(self._pcm_stream(chapters)))
        group = r.chapters()
        assert group is not None and len(group.items) == 1
        c = group.items[0]
        assert c.start_time == 5.0 and c.end_time == 9.0
        assert c.title == "Part One"

    def test_attachments(self):
        img = b"\x89PNG\r\n\x1a\n fake"
        att = elem(0x1941A469, elem(
            0x61A7,
            elem(0x466E, b"cover.png") + elem(0x4660, b"image/png")
            + elem(0x465C, img)))
        r = MkvReader(MediaSourceStream(self._pcm_stream(att)))
        atts = r.attachments()
        assert len(atts) == 1
        assert atts[0].name == "cover.png"
        assert atts[0].media_type == "image/png"
        assert atts[0].data == img
