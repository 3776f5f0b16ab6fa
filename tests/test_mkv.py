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
              bit_depth=None, tags=None, extra_segment=b"",
              timescale=1_000_000, track_extra=b"", info_extra=b"") -> bytes:
    ebml_hdr = elem(0x1A45DFA3,
                    elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
    track_entry = (
        uint_elem(0xD7, 1) + uint_elem(0x83, 2)
        + elem(0x86, codec_id.encode())
        + (elem(0x63A2, private) if private else b"")
        + elem(0xE1, float_elem(0xB5, float(rate)) + uint_elem(0x9F, ch)
               + (uint_elem(0x6264, bit_depth) if bit_depth else b""))
        + track_extra
    )
    tracks = elem(0x1654AE6B, elem(0xAE, track_entry))
    info = elem(0x1549A966, uint_elem(0x2AD7B1, timescale) + info_extra)
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


def build_mkv_with_video(audio_blocks, extra_segment=b"") -> bytes:
    """A two-track Matroska: PCM audio (track 1) + a VP9 video track
    description (track 2, no blocks needed for the description surface)."""
    ebml_hdr = elem(0x1A45DFA3,
                    elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
    audio_entry = (
        uint_elem(0xD7, 1) + uint_elem(0x83, 2)
        + elem(0x86, b"A_PCM/INT/LIT")
        + elem(0xE1, float_elem(0xB5, 8000.0) + uint_elem(0x9F, 1)
               + uint_elem(0x6264, 16))
    )
    video_entry = (
        uint_elem(0xD7, 2) + uint_elem(0x83, 1)
        + elem(0x86, b"V_VP9")
        + elem(0xE0, uint_elem(0xB0, 640) + uint_elem(0xBA, 360))
    )
    tracks = elem(0x1654AE6B, elem(0xAE, audio_entry) + elem(0xAE, video_entry))
    info = elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
    clusters = b""
    for cluster_ts, cluster_blocks in audio_blocks:
        body = uint_elem(0xE7, cluster_ts)
        for blk in cluster_blocks:
            body += blk
        clusters += elem(0x1F43B675, body)
    segment = elem(0x18538067, info + tracks + clusters + extra_segment)
    return ebml_hdr + segment


class TestOtherTracks:
    """Experimental video/subtitle track descriptions (codecs.rs:304-336;
    the reference exposes these as CodecParameters::Video/Subtitle — here
    they surface through FormatReader.other_tracks with the exp parameter
    structs, and audio demux is unaffected)."""

    def test_video_track_described_and_audio_decodes(self):
        import numpy as np
        from symphonia_tpu.core.video import VideoCodecParameters

        pcm = (np.arange(64, dtype="<i2") * 100).tobytes()
        blocks = [(0, [simple_block(1, 0, [pcm])])]
        data = build_mkv_with_video(blocks)
        r = MkvReader(MediaSourceStream(data))
        assert len(r.tracks()) == 1  # audio only in the decode surface
        others = r.other_tracks()
        assert len(others) == 1
        vp = others[0].codec_params
        assert isinstance(vp, VideoCodecParameters)
        assert vp.codec == "vp9" and vp.width == 640 and vp.height == 360
        pkt = r.next_packet()
        assert pkt is not None and pkt.track_id == 1

    def test_subtitle_track_described(self):
        from symphonia_tpu.core.subtitle import SubtitleCodecParameters

        ebml_hdr = elem(0x1A45DFA3,
                        elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
        audio_entry = (
            uint_elem(0xD7, 1) + uint_elem(0x83, 2)
            + elem(0x86, b"A_PCM/INT/LIT")
            + elem(0xE1, float_elem(0xB5, 8000.0) + uint_elem(0x9F, 1)
                   + uint_elem(0x6264, 16))
        )
        sub_entry = (
            uint_elem(0xD7, 3) + uint_elem(0x83, 0x11)
            + elem(0x86, b"S_TEXT/UTF8")
        )
        tracks = elem(0x1654AE6B,
                      elem(0xAE, audio_entry) + elem(0xAE, sub_entry))
        info = elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
        import numpy as np
        pcm = (np.zeros(16, dtype="<i2")).tobytes()
        cluster = elem(0x1F43B675,
                       uint_elem(0xE7, 0) + simple_block(1, 0, [pcm]))
        data = ebml_hdr + elem(0x18538067, info + tracks + cluster)
        r = MkvReader(MediaSourceStream(data))
        others = r.other_tracks()
        assert len(others) == 1
        sp = others[0].codec_params
        assert isinstance(sp, SubtitleCodecParameters)
        assert sp.codec == "text_utf8"


class TestExperimentalRegistry:
    """CodecRegistry video/subtitle registration (registry.rs:57-160):
    third-party factories register and instantiate; nothing ships
    built-in, matching the reference."""

    def test_register_and_make_video_decoder(self):
        from symphonia_tpu.core.codecs import CodecRegistry
        from symphonia_tpu.core.errors import Unsupported
        from symphonia_tpu.core.video import (VideoCodecParameters,
                                              VideoDecoder)

        class NullVideo(VideoDecoder):
            def __init__(self, params, options):
                self._p = params

            @staticmethod
            def supported_codecs():
                return ["vp9"]

            def reset(self):
                pass

            def codec_params(self):
                return self._p

        reg = CodecRegistry()
        reg.register_video_decoder(NullVideo)
        params = VideoCodecParameters(codec="vp9", width=64, height=64)
        dec = reg.make_video_decoder(params)
        assert dec.codec_params().width == 64
        import pytest
        with pytest.raises(Unsupported):
            reg.make_video_decoder(VideoCodecParameters(codec="av1"))
        with pytest.raises(Unsupported):
            dec.decode(None)  # no shipped implementation decodes

    def test_subtitle_registry_empty(self):
        import pytest
        from symphonia_tpu.core.codecs import CodecRegistry
        from symphonia_tpu.core.errors import Unsupported
        from symphonia_tpu.core.subtitle import SubtitleCodecParameters

        with pytest.raises(Unsupported):
            CodecRegistry().make_subtitle_decoder(
                SubtitleCodecParameters(codec="srt"))


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

    def test_unlace_ebml_rejects_negative_size(self):
        """An EBML lace delta driving the running size negative is
        malformed (lacing.rs rejects it) and must raise, not emit
        overlapping frames from a backwards-walking offset."""
        from symphonia_tpu.core.errors import DecodeError

        # flags: EBML lacing (0x06), 3 frames, first size = 2 (vint 0x82),
        # delta = -5 via signed 1-byte vint (bias 63): raw 58 -> 0xBA.
        payload = bytes([0x06, 2, 0x82, 0xBA]) + b"abcdefgh"
        with pytest.raises(DecodeError):
            unlace(payload)


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


def targets_elem(level=None, name=None, track_uids=(), chapter_uids=()):
    body = b""
    if level is not None:
        body += uint_elem(0x68CA, level)
    if name:
        body += elem(0x63CA, name.encode())
    for u in track_uids:
        body += uint_elem(0x63C5, u)
    for u in chapter_uids:
        body += uint_elem(0x63C4, u)
    return elem(0x63C0, body)


def simple_tag(name, value=None, subs=b""):
    body = elem(0x45A3, name.encode())
    if value is not None:
        body += elem(0x4487, value.encode())
    return elem(0x67C8, body + subs)


def tag_elem(simple_tags, targets=b""):
    return elem(0x7373, targets + b"".join(simple_tags))


def tags_elem(*tag_elems):
    return elem(0x1254C367, b"".join(tag_elems))


class TestTagTargets:
    """Matroska tag Targets semantics (format-mkv tags.rs:16-177,
    segment.rs TargetsElement/into_metadata): level-aware raw keys and
    standard mapping, TOTAL_PARTS lower-level resolution, per-track and
    per-chapter UID scoping."""

    def _reader(self, tags, track_extra=b"", extra=b""):
        data = build_mkv(
            "A_PCM/INT/LIT", b"",
            [(0, [simple_block(1, 0, [b"\x00\x00"])])], bit_depth=16,
            track_extra=track_extra, extra_segment=extra + tags)
        return MkvReader(MediaSourceStream(data))

    def test_level_aware_title(self):
        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "The Track")], targets_elem(30)),
            tag_elem([simple_tag("TITLE", "The Album"),
                      simple_tag("ARTIST", "Album Artist")],
                     targets_elem(50)),
            tag_elem([simple_tag("TITLE", "The Collection")],
                     targets_elem(70)),
        )
        rev = self._reader(tags).metadata().current()
        assert rev.get("track_title") == "The Track"
        assert rev.get("album") == "The Album"
        assert rev.get("album_artist") == "Album Artist"
        assert rev.get("collection_title") == "The Collection"
        keys = {t.key for t in rev.tags}
        assert {"TRACK@TITLE", "ALBUM@TITLE", "ALBUM@ARTIST",
                "COLLECTION@TITLE"} <= keys

    def test_flat_tags_unchanged(self):
        tags = tags_elem(tag_elem([simple_tag("TITLE", "Song"),
                                   simple_tag("ARTIST", "Someone")]))
        rev = self._reader(tags).metadata().current()
        assert rev.get("track_title") == "Song"
        assert rev.get("artist") == "Someone"
        assert {t.key for t in rev.tags} == {"TITLE", "ARTIST"}

    def test_explicit_target_name_and_unknown_level(self):
        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "Aida")],
                     targets_elem(50, name="OPERA")),
            tag_elem([simple_tag("TITLE", "x")], targets_elem(45)),
        )
        rev = self._reader(tags).metadata().current()
        # OPERA has no title mapping; unknown level 45 renders as #45.
        keys = {t.key: t for t in rev.tags}
        assert "OPERA@TITLE" in keys and keys["OPERA@TITLE"].std_key is None
        assert "#45@TITLE" in keys and keys["#45@TITLE"].std_key is None

    def test_total_parts_uses_lower_level(self):
        # Level-50 TOTAL_PARTS counts the level-30 items (tracks), and
        # level-30 PART_NUMBER is the track number.
        tags = tags_elem(
            tag_elem([simple_tag("TOTAL_PARTS", "12")], targets_elem(50)),
            tag_elem([simple_tag("PART_NUMBER", "3")], targets_elem(30)),
        )
        rev = self._reader(tags).metadata().current()
        assert rev.get("track_total") == 12
        assert rev.get("track_number") == 3
        # Without any lower level processed first, TOTAL_PARTS at the
        # lowest level has no referent.
        tags2 = tags_elem(
            tag_elem([simple_tag("TOTAL_PARTS", "12")], targets_elem(30)))
        rev2 = self._reader(tags2).metadata().current()
        assert rev2.get("track_total") is None

    def test_video_target_names_match_across_readers(self):
        """A video-bearing MKV resolves bare TargetTypeValues through the
        VIDEO name table (tags.rs:328-507) in BOTH readers: level 50 maps
        to MOVIE, not ALBUM (regression: the streaming reader used the
        audio table)."""
        from symphonia_tpu.formats.mkv import MkvReader, MkvStreamReader

        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "The Movie")], targets_elem(50)))
        data = build_mkv_with_video(
            [(0, [simple_block(1, 0, [b"\x00\x00"])])], extra_segment=tags)
        for reader in (MkvReader(MediaSourceStream(data)),
                       MkvStreamReader(MediaSourceStream(data))):
            revs = reader.metadata()
            rev = revs.current()
            if rev is None or not rev.tags:
                # streaming reader surfaces trailing metadata after the
                # packet walk
                while reader.next_packet() is not None:
                    pass
                rev = reader.metadata().current()
            keys = {t.key for t in rev.tags}
            assert "MOVIE@TITLE" in keys, (type(reader).__name__, keys)

    def test_replaygain_and_disc_numbers(self):
        tags = tags_elem(
            tag_elem([simple_tag("REPLAYGAIN_GAIN", "-6.5 dB")],
                     targets_elem(50)),
            tag_elem([simple_tag("PART_NUMBER", "2")], targets_elem(40)),
            tag_elem([simple_tag("REPLAYGAIN_GAIN", "-3.25 dB")],
                     targets_elem(30)),
        )
        rev = self._reader(tags).metadata().current()
        assert rev.get("replaygain_album_gain") is not None
        assert rev.get("replaygain_track_gain") is not None
        assert rev.get("disc_number") == 2

    def test_original_and_sort_with_nesting(self):
        sort_sub = simple_tag("SORT_WITH", "Album, The")
        original = simple_tag(
            "ORIGINAL", None,
            subs=simple_tag("TITLE", "Originaltitel"))
        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "The Album", subs=sort_sub),
                      original],
                     targets_elem(50)))
        rev = self._reader(tags).metadata().current()
        assert rev.get("album") == "The Album"
        assert rev.get("sort_album") == "Album, The"
        assert rev.get("original_album") == "Originaltitel"
        keys = {t.key for t in rev.tags}
        assert "ALBUM@TITLE/SORT_WITH" in keys
        assert "ALBUM@ORIGINAL/TITLE" in keys

    def test_track_uid_scoping(self):
        track_extra = uint_elem(0x73C5, 777)  # TrackUID
        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "Per-Track")],
                     targets_elem(30, track_uids=[777])),
            tag_elem([simple_tag("TITLE", "Unknown-Track")],
                     targets_elem(30, track_uids=[999])),
            tag_elem([simple_tag("ARTIST", "Media-Wide")],
                     targets_elem(30)),
        )
        rev = self._reader(tags, track_extra=track_extra).metadata().current()
        # UID-targeted tags are scoped to the track (keyed by track id),
        # not mixed into the media tags; unknown UIDs are dropped.
        assert rev.get("track_title") is None
        per = rev.track_tags.get(1)
        assert per is not None
        assert any(t.std_key == "track_title" and t.value == "Per-Track"
                   for t in per)
        assert not any(t.value == "Unknown-Track"
                       for lst in rev.track_tags.values() for t in lst)
        assert rev.get("artist") == "Media-Wide"

    def test_track_uid_zero_targets_all(self):
        track_extra = uint_elem(0x73C5, 777)
        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "All-Tracks")],
                     targets_elem(30, track_uids=[0])))
        rev = self._reader(tags, track_extra=track_extra).metadata().current()
        per = rev.track_tags.get(1)
        assert per and per[0].value == "All-Tracks"

    def test_chapter_uid_scoping(self):
        atom = (uint_elem(0x91, 0) + uint_elem(0x73C4, 55)
                + elem(0x80, elem(0x85, b"Intro")))
        chapters = elem(0x1043A770, elem(0x45B9, elem(0xB6, atom)))
        tags = tags_elem(
            tag_elem([simple_tag("COMMENT", "chapter note")],
                     targets_elem(30, chapter_uids=[55])))
        r = self._reader(tags, extra=chapters)
        ch = r.chapters().items[0]
        assert any(t.value == "chapter note" for t in ch.tags)
        rev = r.metadata().current()
        assert rev is None or rev.get("comment") != "chapter note"

    def test_video_default_target_names(self):
        # With a video track present, a bare level-50 target defaults to
        # MOVIE (tags.rs default_target_name is_video=true), so TITLE maps
        # to the movie title; audio-only media maps the same tag to ALBUM.
        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "Feature")], targets_elem(50)))
        audio_blocks = [(0, [simple_block(1, 0, [b"\x00\x00"])])]
        r = MkvReader(MediaSourceStream(
            build_mkv_with_video(audio_blocks, extra_segment=tags)))
        rev = r.metadata().current()
        assert rev.get("movie_title") == "Feature"
        assert any(t.key == "MOVIE@TITLE" for t in rev.tags)
        r2 = MkvReader(MediaSourceStream(build_mkv(
            "A_PCM/INT/LIT", b"", audio_blocks, bit_depth=16,
            extra_segment=tags)))
        assert r2.metadata().current().get("album") == "Feature"

    def test_stream_reader_targets(self):
        from symphonia_tpu.formats.mkv import MkvStreamReader

        track_extra = uint_elem(0x73C5, 42)
        tags = tags_elem(
            tag_elem([simple_tag("TITLE", "Strm Album")], targets_elem(50)),
            tag_elem([simple_tag("TITLE", "Strm Track")],
                     targets_elem(30, track_uids=[42])),
        )
        data = build_mkv(
            "A_PCM/INT/LIT", b"",
            [(0, [simple_block(1, 0, [b"\x00\x00"])])], bit_depth=16,
            track_extra=track_extra, extra_segment=tags)
        r = MkvStreamReader(MediaSourceStream(data))
        while r.next_packet() is not None:
            pass
        rev = r.metadata().current()
        assert rev.get("album") == "Strm Album"
        per = rev.track_tags.get(1)
        assert per and any(t.value == "Strm Track" for t in per)


def build_mkv_cued(codec_id: str, private: bytes, clusters, rate=44100,
                   ch=1, bit_depth=None, default_dur_ns=None,
                   block_durs=None, unknown_cluster_size=False,
                   with_cues=True, with_seekhead=True) -> bytes:
    """Full-featured mux: SeekHead -> Cues, DefaultDuration, BlockDuration
    (via BlockGroup), optional unknown-size clusters.

    clusters: [(cluster_ts, [(rel_ts, frame_bytes), ...]), ...]
    block_durs: optional parallel [[dur_ticks|None, ...], ...]
    """
    track_entry = (
        uint_elem(0xD7, 1) + uint_elem(0x83, 2)
        + elem(0x86, codec_id.encode())
        + (uint_elem(0x23E383, default_dur_ns) if default_dur_ns else b"")
        + (elem(0x63A2, private) if private else b"")
        + elem(0xE1, float_elem(0xB5, float(rate)) + uint_elem(0x9F, ch)
               + (uint_elem(0x6264, bit_depth) if bit_depth else b""))
    )
    tracks = elem(0x1654AE6B, elem(0xAE, track_entry))
    info = elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))

    def cluster_bytes(ci, cluster_ts, blks):
        body = uint_elem(0xE7, cluster_ts)
        for bi, (rel_ts, frame) in enumerate(blks):
            bdur = block_durs[ci][bi] if block_durs else None
            if bdur is not None:
                blk = bytes([0x81]) + struct.pack(">h", rel_ts) \
                    + bytes([0x00]) + frame
                body += elem(0xA0, elem(0xA1, blk) + uint_elem(0x9B, bdur))
            else:
                body += simple_block(1, rel_ts, [frame])
        if unknown_cluster_size:
            eid = (0x1F43B675).to_bytes(4, "big")
            return eid + b"\xff" + body  # unknown size (1-byte all-ones)
        return elem(0x1F43B675, body)

    # Lay out: SeekHead placeholder, info, tracks, clusters, cues.
    # SeekHead is fixed-size so positions are computable in one pass.
    cluster_blobs = []
    for ci, (cts, blks) in enumerate(clusters):
        cluster_blobs.append(cluster_bytes(ci, cts, blks))

    def seekhead(cues_pos):
        s = elem(0x4DBB, elem(0x53AB, (0x1C53BB6B).to_bytes(4, "big"))
                 + elem(0x53AC, cues_pos.to_bytes(8, "big")))
        return elem(0x114D9B74, s)

    sh_len = len(seekhead(0)) if with_seekhead else 0
    head = info + tracks
    positions = []
    off = sh_len + len(head)
    for blob in cluster_blobs:
        positions.append(off)
        off += len(blob)
    cues_pos = off
    cues_body = b""
    if with_cues:
        for (cts, _), pos in zip(clusters, positions):
            cues_body += elem(0xBB, uint_elem(0xB3, cts)
                              + elem(0xB7, uint_elem(0xF7, 1)
                                     + uint_elem(0xF1, pos)))
    cues = elem(0x1C53BB6B, cues_body) if with_cues else b""
    seg_body = (seekhead(cues_pos) if with_seekhead else b"") + head \
        + b"".join(cluster_blobs) + cues
    ebml_hdr = elem(0x1A45DFA3,
                    elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
    return ebml_hdr + elem(0x18538067, seg_body)


from conftest import ForwardPipe as _Pipe  # noqa: E402



def _pcm_clusters(n_clusters=6, blocks_per=4, spb=500):
    """PCM16 content: 500 samples per block at 8 kHz, ts in ms ticks."""
    sig = (np.sin(np.arange(n_clusters * blocks_per * spb) * 0.03) * 8000) \
        .astype("<i2")
    clusters = []
    k = 0
    ms_per_block = spb * 1000 // 8000  # 62 ms
    for c in range(n_clusters):
        blks = []
        for b in range(blocks_per):
            frame = sig[k * spb : (k + 1) * spb].tobytes()
            blks.append((b * ms_per_block, frame))
            k += 1
        clusters.append((c * blocks_per * ms_per_block, blks))
    return sig, clusters


class TestMkvDurationsAndCues:
    def test_block_durations_from_gaps(self):
        sig, clusters = _pcm_clusters()
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16, with_cues=False,
                              with_seekhead=False)
        r = MkvReader(MediaSourceStream(data))
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(p)
        # Every packet carries dur > 0 (gap-derived; last falls back).
        assert all(p.dur == 62 for p in pkts[:-1])
        assert pkts[-1].dur in (0, 62)  # no gap/default for the last one

    def test_block_duration_element_and_default(self):
        sig, clusters = _pcm_clusters(n_clusters=2, blocks_per=3)
        bdurs = [[50, None, 70], [None, 40, None]]
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16, block_durs=bdurs,
                              default_dur_ns=62_000_000, with_cues=False,
                              with_seekhead=False)
        r = MkvReader(MediaSourceStream(data))
        durs = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            durs.append(p.dur)
        # Explicit BlockDuration wins; gaps next; DefaultDuration last.
        assert durs[0] == 50 and durs[2] == 70 and durs[4] == 40
        assert durs[5] == 62  # from DefaultDuration (62 ms)

    def test_cues_parsed_bulk(self):
        sig, clusters = _pcm_clusters()
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16)
        r = MkvReader(MediaSourceStream(data))
        assert len(r.cues()) == len(clusters)
        assert r.cues()[0][0] == 0


class TestMkvStreaming:
    def _decode_all(self, reader):
        pkts = []
        while True:
            p = reader.next_packet()
            if p is None:
                return pkts
            pkts.append(p)

    def test_pipe_parity_with_bulk(self):
        from symphonia_tpu.formats.mkv import MkvStreamReader

        sig, clusters = _pcm_clusters()
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16)
        bulk = self._decode_all(MkvReader(MediaSourceStream(data)))
        mss = MediaSourceStream(_Pipe(data))
        got = self._decode_all(MkvStreamReader(mss))
        assert [(p.ts, p.dur, p.data) for p in got] == \
               [(p.ts, p.dur, p.data) for p in bulk]

    def test_probe_routes_pipe_to_streaming(self):
        from symphonia_tpu.formats.mkv import MkvStreamReader

        sig, clusters = _pcm_clusters()
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16)
        probed = sym.get_probe().probe(MediaSourceStream(_Pipe(data)))
        assert isinstance(probed.format, MkvStreamReader)

    def test_unknown_size_clusters_stream(self):
        from symphonia_tpu.formats.mkv import MkvStreamReader

        sig, clusters = _pcm_clusters(n_clusters=3)
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16, unknown_cluster_size=True,
                              with_cues=False, with_seekhead=False)
        got = self._decode_all(MkvStreamReader(MediaSourceStream(_Pipe(data))))
        assert len(got) == 3 * 4
        assert b"".join(p.data for p in got) == sig[: 3 * 4 * 500].tobytes()

    def test_cues_seek_via_seekhead(self):
        from symphonia_tpu.formats.mkv import MkvStreamReader
        from symphonia_tpu.core.formats import SeekMode, SeekTo

        sig, clusters = _pcm_clusters()
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16)
        r = MkvStreamReader(MediaSourceStream(data))
        assert len(r.cues()) == len(clusters)  # loaded via SeekHead
        bulk = self._decode_all(MkvReader(MediaSourceStream(data)))
        for ts in (0, 200, 700, 1300):
            seeked = r.seek(SeekMode.ACCURATE, SeekTo(ts=ts))
            p = r.next_packet()
            ref = max((b for b in bulk if b.ts <= ts), key=lambda b: b.ts)
            assert p.ts == ref.ts and p.data == ref.data

    def test_no_cues_forward_seek(self):
        from symphonia_tpu.formats.mkv import MkvStreamReader
        from symphonia_tpu.core.formats import SeekMode, SeekTo

        sig, clusters = _pcm_clusters()
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16, with_cues=False,
                              with_seekhead=False)
        r = MkvStreamReader(MediaSourceStream(data))
        assert r.cues() == []
        seeked = r.seek(SeekMode.ACCURATE, SeekTo(ts=700))
        p = r.next_packet()
        assert p.ts <= 700 < p.ts + max(p.dur, 63)


class TestMkvReviewRegressions:
    def test_unknown_size_clusters_seekable_bulk(self):
        """A seekable file with unknown-size clusters (saved live stream)
        must parse every cluster in the bulk reader, bounded at the next
        top-level element (review: 1-byte 0xFF size vint means unknown)."""
        sig, clusters = _pcm_clusters(n_clusters=3)
        data = build_mkv_cued("A_PCM/INT/LIT", b"", clusters, rate=8000,
                              bit_depth=16, unknown_cluster_size=True,
                              with_cues=False, with_seekhead=False)
        r = MkvReader(MediaSourceStream(data))
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(p)
        assert len(pkts) == 3 * 4
        assert b"".join(p.data for p in pkts) == sig[: 3 * 4 * 500].tobytes()

    def test_truncated_block_body_no_crash(self):
        """A (Simple)Block too short for track+ts+flags must be skipped,
        not crash with struct.error."""
        from symphonia_tpu.formats.mkv import MkvStreamReader

        bad_block = elem(0xA3, bytes([0x81, 0x00]))  # track vint + 1 byte
        good = simple_block(1, 0, [b"\x01\x02\x03\x04"])
        data = build_mkv("A_PCM/INT/LIT", b"",
                         [(0, [bad_block, good])], rate=8000, ch=1,
                         bit_depth=16)
        r = MkvReader(MediaSourceStream(data))
        pkts = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            pkts.append(p)
        assert [p.data for p in pkts] == [b"\x01\x02\x03\x04"]
        r2 = MkvStreamReader(MediaSourceStream(_Pipe(data)))
        pkts2 = []
        while True:
            p = r2.next_packet()
            if p is None:
                break
            pkts2.append(p)
        assert [p.data for p in pkts2] == [b"\x01\x02\x03\x04"]

    def test_streamed_trailing_metadata(self):
        """Tags/Chapters after the clusters parse in streamed mode too."""
        from symphonia_tpu.formats.mkv import MkvStreamReader

        atom = (uint_elem(0x91, 1_000_000_000)
                + elem(0x80, elem(0x85, b"Ch One")))
        chapters = elem(0x1043A770, elem(0x45B9, elem(0xB6, atom)))
        tags = elem(0x1254C367, elem(0x7373,
                    elem(0x67C8, elem(0x45A3, b"TITLE")
                         + elem(0x4487, b"Stream Song"))))
        data = build_mkv("A_PCM/INT/LIT", b"",
                         [(0, [simple_block(1, 0, [b"\x00\x01" * 8])])],
                         rate=8000, ch=1, bit_depth=16,
                         extra_segment=chapters + tags)
        r = MkvStreamReader(MediaSourceStream(_Pipe(data)))
        while r.next_packet() is not None:
            pass
        rev = r.metadata().current()
        assert rev is not None and rev.get("track_title") == "Stream Song"
        assert [c.title for c in r.chapters().items] == ["Ch One"]


class TestZeroTimestampScale:
    def test_zero_timescale_keeps_default(self):
        """Regression (soak): TimestampScale=0 in a mutated file built a
        0-numerator TimeBase and raised raw ValueError; 0 is invalid per
        EBML, so the spec default (1 ms) is kept."""
        pcm = np.arange(-500, 500, dtype="<i2").tobytes()
        blocks = [(0, [simple_block(1, 0, [pcm])])]
        data = build_mkv("A_PCM/INT/LIT", b"", blocks, rate=8000, ch=1,
                         bit_depth=16, timescale=0)
        from symphonia_tpu.core.io import MediaSourceStream
        from symphonia_tpu.formats.mkv import MkvReader

        r = MkvReader(MediaSourceStream(data))
        t = r.default_track()
        assert t.time_base.numer == 1_000_000


class TestTrackAttributes:
    """TrackEntry language/flags + Info Duration (segment.rs:440-507,
    formats/mod.rs:197-216,234-276)."""

    def _build(self, track_extra=b"", info_extra=b""):
        payload = np.zeros(200, dtype="<i2").tobytes()
        blocks = [(0, [simple_block(1, 0, [payload])])]
        return build_mkv("A_PCM/INT/LIT", b"", blocks, rate=8000, ch=1,
                         bit_depth=16, track_extra=track_extra,
                         info_extra=info_extra)

    def test_language_flags_duration(self):
        track_extra = (elem(0x22B59C, b"ger")
                       + uint_elem(0x88, 0)      # FlagDefault: explicit 0
                       + uint_elem(0x55AA, 1)    # FlagForced
                       + uint_elem(0x55AF, 1))   # FlagCommentary
        info_extra = float_elem(0x4489, 2500.0)  # Info Duration, ticks
        data = self._build(track_extra, info_extra)
        probed = sym.get_probe().probe(MediaSourceStream(data))
        from symphonia_tpu.core.formats import TrackFlags

        t = probed.format.tracks()[0]
        assert t.language == "ger"
        assert not (t.flags & TrackFlags.DEFAULT)
        assert t.flags & TrackFlags.FORCED
        assert t.flags & TrackFlags.COMMENTARY
        assert t.duration == 2500
        # default_track falls back to the first track when none is flagged.
        assert probed.format.default_track() is t

    def test_default_flag_is_set_by_schema_default(self):
        data = self._build()
        probed = sym.get_probe().probe(MediaSourceStream(data))
        from symphonia_tpu.core.formats import TrackFlags

        t = probed.format.tracks()[0]
        assert t.flags & TrackFlags.DEFAULT
        assert t.language is None and t.duration is None

    def test_bcp47_overrides_legacy(self):
        track_extra = (elem(0x22B59C, b"ger")
                       + elem(0x22B59D, b"de-CH"))
        data = self._build(track_extra)
        probed = sym.get_probe().probe(MediaSourceStream(data))
        assert probed.format.tracks()[0].language == "de-CH"

    def test_streaming_reader_matches(self):
        from symphonia_tpu.formats.mkv import MkvStreamReader
        from symphonia_tpu.core.formats import TrackFlags

        track_extra = elem(0x22B59C, b"fra") + uint_elem(0x55AA, 1)
        info_extra = float_elem(0x4489, 1234.0)
        data = self._build(track_extra, info_extra)
        r = MkvStreamReader(MediaSourceStream(data))
        t = r.tracks()[0]
        assert t.language == "fra"
        assert t.flags & TrackFlags.FORCED
        assert t.duration == 1234


class TestDescribedOnlyCodecs:
    """codecs.rs:264-280: AC-3/DTS/TrueHD/... tracks surface with their
    codec id and demux, but no decoder ships (Unsupported), matching the
    reference's support level."""

    def test_dts_track_demuxes_but_has_no_decoder(self):
        from symphonia_tpu.core.errors import Unsupported

        blocks = [(0, [simple_block(1, 0, [b"\x7f\xfe\x80\x01" + b"\x00" * 32])])]
        data = build_mkv("A_DTS", b"", blocks, rate=48000, ch=2)
        r = MkvReader(MediaSourceStream(data))
        t = r.tracks()[0]
        assert t.codec_params.codec == "dca"
        assert t.codec_params.sample_rate == 48000
        pkt = r.next_packet()
        assert pkt is not None and pkt.data[:2] == b"\x7f\xfe"
        with pytest.raises(Unsupported):
            sym.get_codecs().make_audio_decoder(t.codec_params)

    def test_ac3_bsid_variants(self):
        for cid in ("A_AC3", "A_AC3/BSID9", "A_AC3/BSID10"):
            data = build_mkv(cid, b"", [(0, [simple_block(1, 0, [b"\x0b\x77"])])],
                             rate=48000, ch=2)
            r = MkvReader(MediaSourceStream(data))
            assert r.tracks()[0].codec_params.codec == "ac3"


class TestMkvVorbis:
    """A_VORBIS with Xiph-laced CodecPrivate (lib.rs:76-97): the three
    headers unpack and packets decode identically to the OGG container."""

    def test_vorbis_track_parity_with_ogg(self):
        import sys

        if "tests" not in (sys.path[0] or ""):
            sys.path.insert(0, "tests")
        from vorbis_builder import build_stream

        extra, pkts, _ = build_stream(8, seed=21)
        # extra = ident + setup concatenated; rebuild the comment packet
        # and Xiph-lace all three for CodecPrivate.
        ident = extra[:30]
        setup = extra[30:]
        comment = (b"\x03vorbis" + (4).to_bytes(4, "little") + b"test"
                   + (0).to_bytes(4, "little") + b"\x01")

        def lace_size(n):
            return bytes([255] * (n // 255) + [n % 255])

        private = (bytes([2]) + lace_size(len(ident))
                   + lace_size(len(comment)) + ident + comment + setup)
        blocks = [(0, [simple_block(1, i % 120, [p])])
                  for i, p in enumerate(pkts)]
        data = build_mkv("A_VORBIS", private, blocks, rate=8000, ch=1)
        r = MkvReader(MediaSourceStream(data))
        t = r.tracks()[0]
        assert t.codec_params.codec == "vorbis"
        dec = sym.get_codecs().make_audio_decoder(t.codec_params)
        outs = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            buf = dec.decode(p)
            if len(buf):
                outs.append(buf.planes().copy())
        got = np.concatenate(outs, axis=1)
        # Reference: the same packets through a directly-configured decoder.
        from symphonia_tpu.core.codecs import AudioCodecParameters
        from symphonia_tpu.core.packet import Packet as Pk

        dec2 = sym.get_codecs().make_audio_decoder(AudioCodecParameters(
            codec="vorbis", sample_rate=8000, extra_data=extra))
        refs = []
        for i, p in enumerate(pkts):
            buf = dec2.decode(Pk(track_id=0, ts=i, dur=0, data=p))
            if len(buf):
                refs.append(buf.planes().copy())
        ref = np.concatenate(refs, axis=1)
        np.testing.assert_array_equal(got, ref)


class TestMkvAlac:
    """A_ALAC: CodecPrivate is the magic cookie (codecs.rs:268)."""

    def test_alac_in_mkv_decodes_exact(self):
        import sys

        if "tests" not in (sys.path[0] or ""):
            sys.path.insert(0, "tests")
        from alac_builder import build_cookie, encode_frame_compressed
        from test_alac import signal

        frame_len = 256
        ch = signal(frame_len * 3, 17)
        cookie_dict = dict(frame_length=frame_len, bit_depth=16, pb=40,
                           mb=10, kb=14)
        frames = [
            encode_frame_compressed(
                [ch[0][i * frame_len:(i + 1) * frame_len]], cookie_dict,
                order=2)
            for i in range(3)
        ]
        cookie = build_cookie(frame_len, 16, 1, 44100)
        blocks = [(0, [simple_block(1, i, [f])]) for i, f in enumerate(frames)]
        data = build_mkv("A_ALAC", cookie, blocks, rate=44100, ch=1,
                         bit_depth=16)
        r = MkvReader(MediaSourceStream(data))
        t = r.tracks()[0]
        assert t.codec_params.codec == "alac"
        dec = sym.get_codecs().make_audio_decoder(t.codec_params)
        outs = []
        while True:
            p = r.next_packet()
            if p is None:
                break
            outs.append(dec.decode(p).planes().copy())
        got = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(got[0], ch[0].astype(np.int32))


def _sb_flags(track: int, rel_ts: int, frame: bytes, flags: int) -> bytes:
    """SimpleBlock with an explicit flags byte (0x80 = keyframe)."""
    body = bytes([0x80 | track]) + struct.pack(">h", rel_ts) \
        + bytes([flags]) + frame
    return elem(0xA3, body)


def _block_group(track: int, rel_ts: int, frame: bytes, bdur=None,
                 ref=None) -> bytes:
    """BlockGroup: Block (+ BlockDuration, + ReferenceBlock)."""
    blk = bytes([0x80 | track]) + struct.pack(">h", rel_ts) + b"\x00" + frame
    payload = elem(0xA1, blk)
    if bdur is not None:
        payload += uint_elem(0x9B, bdur)
    if ref is not None:
        payload += elem(0xFB, struct.pack(">b", ref))
    return elem(0xA0, payload)


class TestNonAudioPacketDemux:
    """Video/subtitle track packets are demuxed like audio (the reference's
    next_packet has no track-type filter, demuxer.rs:634-650), with
    keyframe flags from the SimpleBlock keyframe bit / ReferenceBlock
    absence (lacing.rs) and subtitle durations from BlockDuration."""

    VFRAMES = [b"\x9d\x01*KEY0" + bytes(20), b"delta-frame-1" + bytes(9),
               b"delta-frame-2" + bytes(9)]
    SUBTITLE = "Hello, world".encode()

    def _build(self) -> bytes:
        ebml_hdr = elem(0x1A45DFA3,
                        elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
        audio_entry = (
            uint_elem(0xD7, 1) + uint_elem(0x83, 2)
            + elem(0x86, b"A_PCM/INT/LIT")
            + elem(0xE1, float_elem(0xB5, 8000.0) + uint_elem(0x9F, 1)
                   + uint_elem(0x6264, 16))
        )
        video_entry = (
            uint_elem(0xD7, 2) + uint_elem(0x83, 1)
            + elem(0x86, b"V_VP9")
            + uint_elem(0x23E383, 40_000_000)  # DefaultDuration 40 ms
            + elem(0xE0, uint_elem(0xB0, 320) + uint_elem(0xBA, 180))
        )
        sub_entry = (
            uint_elem(0xD7, 3) + uint_elem(0x83, 0x11)
            + elem(0x86, b"S_TEXT/UTF8")
        )
        tracks = elem(0x1654AE6B, elem(0xAE, audio_entry)
                      + elem(0xAE, video_entry) + elem(0xAE, sub_entry))
        info = elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
        pcm = (np.arange(64, dtype="<i2") * 50).tobytes()
        cluster_body = (
            uint_elem(0xE7, 0)
            + _sb_flags(1, 0, pcm, 0x80)                       # audio
            + _sb_flags(2, 0, self.VFRAMES[0], 0x80)           # video key
            + _sb_flags(2, 40, self.VFRAMES[1], 0x00)          # video delta
            + _block_group(2, 80, self.VFRAMES[2], ref=-40)    # delta (ref)
            + _block_group(3, 10, self.SUBTITLE, bdur=500)     # subtitle
        )
        cluster = elem(0x1F43B675, cluster_body)
        return ebml_hdr + elem(0x18538067, info + tracks + cluster)

    def _readers(self, data):
        from symphonia_tpu.formats.mkv import MkvReader, MkvStreamReader

        yield MkvReader(MediaSourceStream(data))
        yield MkvStreamReader(MediaSourceStream(_Pipe(data)))

    def test_video_and_subtitle_packets_both_readers(self):
        data = self._build()
        for r in self._readers(data):
            per_track = {1: [], 2: [], 3: []}
            while True:
                p = r.next_packet()
                if p is None:
                    break
                per_track[p.track_id].append(p)
            # Video: all three frame bodies, ts-exact, keyframe per block.
            vid = per_track[2]
            assert [p.data for p in vid] == self.VFRAMES
            assert [p.ts for p in vid] == [0, 40, 80]
            assert [p.keyframe for p in vid] == [True, False, False]
            # Durations: next-block gaps, then DefaultDuration for the last.
            assert [p.dur for p in vid] == [40, 40, 40]
            # Subtitle: BlockDuration carries the display time.
            sub = per_track[3]
            assert len(sub) == 1
            assert sub[0].data == self.SUBTITLE
            assert sub[0].ts == 10 and sub[0].dur == 500
            assert sub[0].keyframe  # no ReferenceBlock
            # Audio still decodes alongside.
            assert len(per_track[1]) == 1 and per_track[1][0].keyframe

    def test_other_track_packet_table(self):
        from symphonia_tpu.formats.mkv import MkvReader

        r = MkvReader(MediaSourceStream(self._build()))
        pt = r.packet_table(track_id=2)
        assert list(pt.sizes) == [len(f) for f in self.VFRAMES]
        assert list(pt.ts) == [0, 40, 80]
        assert pt.data == self.VFRAMES

    def test_video_only_mkv_opens(self):
        """A Matroska with only a video track opens and demuxes (the
        reference has no audio requirement); audio surfaces stay empty."""
        from symphonia_tpu.formats.mkv import MkvReader, MkvStreamReader

        ebml_hdr = elem(0x1A45DFA3,
                        elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
        video_entry = (
            uint_elem(0xD7, 1) + uint_elem(0x83, 1)
            + elem(0x86, b"V_VP8")
            + elem(0xE0, uint_elem(0xB0, 64) + uint_elem(0xBA, 64))
        )
        tracks = elem(0x1654AE6B, elem(0xAE, video_entry))
        info = elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
        cluster = elem(0x1F43B675, uint_elem(0xE7, 0)
                       + _sb_flags(1, 0, b"vp8-frame", 0x80))
        data = ebml_hdr + elem(0x18538067, info + tracks + cluster)
        for r in (MkvReader(MediaSourceStream(data)),
                  MkvStreamReader(MediaSourceStream(_Pipe(data)))):
            assert r.tracks() == []
            assert r.default_track() is None
            assert len(r.other_tracks()) == 1
            p = r.next_packet()
            assert p is not None and p.data == b"vp8-frame" and p.keyframe


class TestMalformedTrackValues:
    """Non-finite floats and out-of-table values in track/info elements
    must degrade (keep defaults), never raise raw ValueError/OverflowError
    out of reader construction (the strict error taxonomy)."""

    def _open_both(self, data):
        from symphonia_tpu.formats.mkv import MkvReader, MkvStreamReader

        return (MkvReader(MediaSourceStream(data)),
                MkvStreamReader(MediaSourceStream(_Pipe(data))))

    def test_nan_inf_sampling_frequency_keeps_default(self):
        for bad in (float("nan"), float("inf"), -1.0):
            data = build_mkv("A_PCM/INT/LIT", b"", [], rate=bad, ch=1,
                             bit_depth=16)
            for r in self._open_both(data):
                assert r.tracks()[0].codec_params.sample_rate == 8000

    def test_odd_length_float_keeps_default(self):
        # A 3-byte SamplingFrequency body is invalid; it must not zero
        # the rate (downstream math divides by it).
        track_entry = (
            uint_elem(0xD7, 1) + uint_elem(0x83, 2)
            + elem(0x86, b"A_PCM/INT/LIT")
            + elem(0xE1, elem(0xB5, b"\x01\x02\x03") + uint_elem(0x9F, 1)
                   + uint_elem(0x6264, 16)))
        ebml_hdr = elem(0x1A45DFA3,
                        elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
        seg = elem(0x18538067,
                   elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
                   + elem(0x1654AE6B, elem(0xAE, track_entry)))
        for r in self._open_both(ebml_hdr + seg):
            assert r.tracks()[0].codec_params.sample_rate == 8000

    def test_inf_duration_ignored(self):
        data = build_mkv("A_PCM/INT/LIT", b"", [], rate=8000.0, ch=1,
                         bit_depth=16,
                         info_extra=float_elem(0x4489, float("inf")))
        for r in self._open_both(data):
            assert r.tracks()[0].duration is None

    def test_aac_non_iso_rate_without_private(self):
        """A_AAC with no CodecPrivate at a non-ISO rate: the synthesized
        ASC is impossible — the track must still surface (extra None)."""
        data = build_mkv("A_AAC", b"", [], rate=44099.0, ch=2)
        for r in self._open_both(data):
            p = r.tracks()[0].codec_params
            assert p.codec == "aac" and p.extra_data is None

    def test_output_sampling_frequency_preferred(self):
        """SBR tracks report OutputSamplingFrequency (audio.rs)."""
        track_entry = (
            uint_elem(0xD7, 1) + uint_elem(0x83, 2)
            + elem(0x86, b"A_PCM/INT/LIT")
            + elem(0xE1, float_elem(0xB5, 22050.0)
                   + float_elem(0x78B5, 44100.0)
                   + uint_elem(0x9F, 1) + uint_elem(0x6264, 16)))
        ebml_hdr = elem(0x1A45DFA3,
                        elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
        seg = elem(0x18538067,
                   elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
                   + elem(0x1654AE6B, elem(0xAE, track_entry)))
        for r in self._open_both(ebml_hdr + seg):
            assert r.tracks()[0].codec_params.sample_rate == 44100


class TestInterleavedSeek:
    def test_bulk_seek_bisects_per_track(self):
        """The merged packet list is cluster-ordered; a video packet with
        a large ts in the middle must not derail an audio seek (a global
        bisect on the unsorted ts list landed on audio@10 for ts=25)."""
        ebml_hdr = elem(0x1A45DFA3,
                        elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
        audio_entry = (
            uint_elem(0xD7, 1) + uint_elem(0x83, 2)
            + elem(0x86, b"A_PCM/INT/LIT")
            + elem(0xE1, float_elem(0xB5, 8000.0) + uint_elem(0x9F, 1)
                   + uint_elem(0x6264, 16)))
        video_entry = (uint_elem(0xD7, 2) + uint_elem(0x83, 1)
                       + elem(0x86, b"V_VP9")
                       + elem(0xE0, uint_elem(0xB0, 64)
                              + uint_elem(0xBA, 64)))
        tracks = elem(0x1654AE6B, elem(0xAE, audio_entry)
                      + elem(0xAE, video_entry))
        info = elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
        pcm = (np.arange(16, dtype="<i2") * 100).tobytes()
        body = uint_elem(0xE7, 0)
        body += _sb_flags(1, 0, pcm, 0x80)
        body += _sb_flags(1, 10, pcm, 0x80)
        body += _sb_flags(2, 1000, b"vframe", 0x80)  # mid-list large ts
        body += _sb_flags(1, 20, pcm, 0x80)
        body += _sb_flags(1, 30, pcm, 0x80)
        data = ebml_hdr + elem(0x18538067,
                               info + tracks + elem(0x1F43B675, body))
        r = MkvReader(MediaSourceStream(data))
        seeked = r.seek("accurate", sym.SeekTo(ts=25))
        assert seeked.track_id == 1
        assert seeked.actual_ts == 20  # global bisect landed on 10
        p = r.next_packet()
        assert p.track_id == 1 and p.ts == 20
        # Seeking the video track targets its own timeline.
        seeked = r.seek("accurate", sym.SeekTo(ts=1500, track_id=2))
        assert seeked.track_id == 2 and seeked.actual_ts == 1000


class TestStreamReaderBounds:
    def test_segment_title_parity(self):
        data = build_mkv("A_PCM/INT/LIT", b"", [], rate=8000.0, ch=1,
                         bit_depth=16,
                         info_extra=elem(0x7BA9, "My Album".encode()))
        from symphonia_tpu.formats.mkv import MkvReader, MkvStreamReader

        for r in (MkvReader(MediaSourceStream(data)),
                  MkvStreamReader(MediaSourceStream(_Pipe(data)))):
            rev = r.metadata().current()
            assert rev is not None
            assert any(t.key == "title" and t.value == "My Album"
                       for t in rev.tags)

    def test_giant_declared_element_size_bounded(self):
        """A mutated size vint claiming ~2^49 bytes must fail fast with a
        taxonomy error, not buffer the whole pipe into memory."""
        import time as _t
        from symphonia_tpu.formats.mkv import MkvStreamReader
        from symphonia_tpu.core.errors import DecodeError, Unsupported

        ebml_hdr = elem(0x1A45DFA3,
                        elem(0x4282, b"matroska") + uint_elem(0x4287, 4))
        giant = (0x1654AE6B).to_bytes(4, "big") + vint_size((1 << 49))
        seg = elem(0x18538067,
                   elem(0x1549A966, uint_elem(0x2AD7B1, 1_000_000))
                   + giant + b"\x00" * 4096)
        t0 = _t.time()
        with pytest.raises((DecodeError, Unsupported, EOFError)):
            MkvStreamReader(MediaSourceStream(_Pipe(ebml_hdr + seg)))
        assert _t.time() - t0 < 5.0
