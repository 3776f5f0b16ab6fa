"""Matroska / WebM demuxer.

Analog of symphonia-format-mkv (``MkvReader``, demuxer.rs:52): generic EBML
vint/element parsing (ebml.rs), segment/info/tracks/cluster walk
(segment.rs), SimpleBlock/BlockGroup frame extraction with Xiph/fixed/EBML
lacing (lacing.rs:139), Matroska codec-id -> codec parameter mapping
(codecs.rs), and Tags -> metadata (tags.rs).

Batch-first: clusters are walked once into a packet table.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.audio import Channels
from ..core.codecs import AudioCodecParameters
from ..core.errors import DecodeError, SeekError, Unsupported
from ..core.formats import (
    FormatOptions,
    FormatReader,
    PacketTable,
    SeekMode,
    SeekTo,
    SeekedTo,
    Track,
)
from ..core.meta import MetadataLog, MetadataRevision, RawTag
from ..core.packet import Packet
from ..core.probe import Descriptor
from ..core.units import TimeBase

EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# Element IDs (Matroska spec).
ID_SEGMENT = 0x18538067
ID_INFO = 0x1549A966
ID_TIMESTAMP_SCALE = 0x2AD7B1
ID_TITLE = 0x7BA9
ID_TRACKS = 0x1654AE6B
ID_TRACK_ENTRY = 0xAE
ID_TRACK_NUMBER = 0xD7
ID_TRACK_TYPE = 0x83
ID_CODEC_ID = 0x86
ID_CODEC_PRIVATE = 0x63A2
ID_AUDIO = 0xE1
ID_SAMPLING_FREQ = 0xB5
ID_OUT_SAMPLING_FREQ = 0x78B5
ID_CHANNELS = 0x9F
ID_BIT_DEPTH = 0x6264
ID_CLUSTER = 0x1F43B675
ID_CLUSTER_TIMESTAMP = 0xE7
ID_SIMPLE_BLOCK = 0xA3
ID_BLOCK_GROUP = 0xA0
ID_BLOCK = 0xA1
ID_TAGS = 0x1254C367
ID_TAG = 0x7373
ID_SIMPLE_TAG = 0x67C8
ID_TAG_NAME = 0x45A3
ID_TAG_STRING = 0x4487
ID_LANGUAGE = 0x22B59C
ID_CHAPTERS = 0x1043A770
ID_EDITION_ENTRY = 0x45B9
ID_CHAPTER_ATOM = 0xB6
ID_CHAPTER_TIME_START = 0x91
ID_CHAPTER_TIME_END = 0x92
ID_CHAPTER_DISPLAY = 0x80
ID_CHAP_STRING = 0x85
ID_ATTACHMENTS = 0x1941A469
ID_ATTACHED_FILE = 0x61A7
ID_FILE_NAME = 0x466E
ID_FILE_MIME = 0x4660
ID_FILE_DATA = 0x465C
ID_FILE_DESCRIPTION = 0x467E

_MASTER_IDS = {ID_SEGMENT, ID_INFO, ID_TRACKS, ID_TRACK_ENTRY, ID_AUDIO,
               ID_CLUSTER, ID_BLOCK_GROUP, ID_TAGS, ID_TAG, ID_SIMPLE_TAG}


def read_vint(buf: bytes, pos: int, keep_marker: bool) -> Tuple[int, int]:
    """Read an EBML variable-size integer; returns (value, next_pos)."""
    if pos >= len(buf):
        raise DecodeError("EBML vint at EOF")
    b0 = buf[pos]
    if b0 == 0:
        raise DecodeError("invalid EBML vint")
    length = 8 - b0.bit_length() + 1
    if pos + length > len(buf):
        raise DecodeError("truncated EBML vint")
    val = b0 if keep_marker else b0 & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | buf[pos + i]
    return val, pos + length


def read_element_header(buf: bytes, pos: int) -> Tuple[int, int, int]:
    """Returns (element_id, data_size, data_start)."""
    eid, pos = read_vint(buf, pos, keep_marker=True)
    size, pos = read_vint(buf, pos, keep_marker=False)
    return eid, size, pos


def iter_elements(buf: bytes, start: int, end: int):
    pos = start
    while pos < end:
        try:
            eid, size, body = read_element_header(buf, pos)
        except DecodeError:
            return
        # "Unknown size" (all ones) extends to end of parent.
        if size == (1 << 56) - 1 or body + size > end:
            size = end - body
        yield eid, body, body + size
        pos = body + size


def _uint(buf, b, e) -> int:
    return int.from_bytes(buf[b:e], "big")


def _float(buf, b, e) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", buf[b:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[b:e])[0]
    return 0.0


@dataclass
class MkvTrack:
    number: int = 0
    codec_id: str = ""
    codec_private: Optional[bytes] = None
    sample_rate: float = 8000.0
    channels: int = 1
    bit_depth: Optional[int] = None
    codec: Optional[str] = None
    params: Optional[AudioCodecParameters] = None


def _map_codec(t: MkvTrack) -> None:
    """Matroska codec id -> codec parameters (codecs.rs:392)."""
    cid = t.codec_id
    rate = int(round(t.sample_rate))
    ch = Channels.from_count(t.channels)
    extra = t.codec_private
    c, bits = None, t.bit_depth
    if cid == "A_FLAC":
        c = "flac"
        if extra and extra[:4] == b"fLaC":
            # Strip marker + block header to the STREAMINFO payload.
            extra = extra[8 : 8 + 34]
    elif cid == "A_VORBIS":
        c = "vorbis"
    elif cid == "A_OPUS":
        c = "opus"
    elif cid.startswith("A_AAC"):
        c = "aac"
        if not extra:
            from ..common.mpeg import AudioSpecificConfig

            extra = AudioSpecificConfig.build(2, rate, t.channels)
    elif cid == "A_MPEG/L3":
        c = "mp3"
    elif cid == "A_MPEG/L2":
        c = "mp2"
    elif cid == "A_MPEG/L1":
        c = "mp1"
    elif cid == "A_ALAC":
        c = "alac"
    elif cid == "A_PCM/INT/LIT":
        c = {8: "pcm_s8", 16: "pcm_s16le", 24: "pcm_s24le", 32: "pcm_s32le"}.get(bits or 16)
    elif cid == "A_PCM/INT/BIG":
        c = {8: "pcm_s8", 16: "pcm_s16be", 24: "pcm_s24be", 32: "pcm_s32be"}.get(bits or 16)
    elif cid == "A_PCM/FLOAT/IEEE":
        c = {32: "pcm_f32le", 64: "pcm_f64le"}.get(bits or 32)
    if c is None:
        return
    t.codec = c
    t.params = AudioCodecParameters(
        codec=c, sample_rate=rate, channels=ch, bits_per_sample=bits,
        extra_data=extra,
    )


def unlace(buf: bytes) -> List[bytes]:
    """Split a (Simple)Block payload's frames by its lacing mode
    (lacing.rs:139). ``buf`` starts at the flags byte's lacing field."""
    flags = buf[0]
    lacing = (flags >> 1) & 0x3
    data = buf[1:]
    if lacing == 0:
        return [data]
    n_frames = data[0] + 1
    pos = 1
    if lacing == 2:  # fixed
        body = data[pos:]
        size = len(body) // n_frames
        return [body[i * size : (i + 1) * size] for i in range(n_frames)]
    sizes = []
    if lacing == 1:  # Xiph
        for _ in range(n_frames - 1):
            v = 0
            while True:
                b = data[pos]
                pos += 1
                v += b
                if b != 255:
                    break
            sizes.append(v)
    else:  # EBML lacing
        first, pos = read_vint(data, pos, keep_marker=False)
        sizes.append(first)
        prev = first
        for _ in range(n_frames - 2):
            raw, pos2 = read_vint(data, pos, keep_marker=False)
            length = pos2 - pos
            # Signed vint: subtract the midpoint bias.
            delta = raw - ((1 << (7 * length - 1)) - 1)
            pos = pos2
            prev += delta
            sizes.append(prev)
    out = []
    body = data[pos:]
    off = 0
    for s in sizes:
        out.append(body[off : off + s])
        off += s
    out.append(body[off:])
    return out


class MkvReader(FormatReader):
    """Matroska format reader (mkv demuxer.rs:52)."""

    def __init__(self, mss, options: Optional[FormatOptions] = None):
        super().__init__(mss, options)
        self._metadata = MetadataLog()
        start = mss.pos()
        chunks = []
        while True:
            b = mss.read_upto(1 << 22)
            if not b:
                break
            chunks.append(b)
        buf = b"".join(chunks)
        if not buf.startswith(EBML_MAGIC):
            raise Unsupported("not an EBML stream")

        # Skip the EBML header element.
        eid, size, body = read_element_header(buf, 0)
        pos = body + size

        segment = None
        for eid, b, e in iter_elements(buf, pos, len(buf)):
            if eid == ID_SEGMENT:
                segment = (b, e)
                break
        if segment is None:
            raise Unsupported("missing Matroska segment")

        timescale_ns = 1_000_000
        self._mkv_tracks: Dict[int, MkvTrack] = {}
        packets: List[Tuple[int, int, bytes]] = []  # (track_no, ts_ticks, data)
        rev = MetadataRevision()

        for eid, b, e in iter_elements(buf, *segment):
            if eid == ID_INFO:
                for eid2, b2, e2 in iter_elements(buf, b, e):
                    if eid2 == ID_TIMESTAMP_SCALE:
                        timescale_ns = _uint(buf, b2, e2)
                    elif eid2 == ID_TITLE:
                        rev.tags.append(RawTag("title",
                                               buf[b2:e2].decode("utf-8", "replace"),
                                               "track_title"))
            elif eid == ID_TRACKS:
                for eid2, b2, e2 in iter_elements(buf, b, e):
                    if eid2 != ID_TRACK_ENTRY:
                        continue
                    t = MkvTrack()
                    ttype = 0
                    for eid3, b3, e3 in iter_elements(buf, b2, e2):
                        if eid3 == ID_TRACK_NUMBER:
                            t.number = _uint(buf, b3, e3)
                        elif eid3 == ID_TRACK_TYPE:
                            ttype = _uint(buf, b3, e3)
                        elif eid3 == ID_CODEC_ID:
                            t.codec_id = buf[b3:e3].decode("ascii", "replace")
                        elif eid3 == ID_CODEC_PRIVATE:
                            t.codec_private = buf[b3:e3]
                        elif eid3 == ID_AUDIO:
                            for eid4, b4, e4 in iter_elements(buf, b3, e3):
                                if eid4 == ID_SAMPLING_FREQ:
                                    t.sample_rate = _float(buf, b4, e4)
                                elif eid4 == ID_CHANNELS:
                                    t.channels = _uint(buf, b4, e4)
                                elif eid4 == ID_BIT_DEPTH:
                                    t.bit_depth = _uint(buf, b4, e4)
                    if ttype == 2:  # audio
                        _map_codec(t)
                        if t.codec is not None:
                            self._mkv_tracks[t.number] = t
            elif eid == ID_CLUSTER:
                cluster_ts = 0
                for eid2, b2, e2 in iter_elements(buf, b, e):
                    if eid2 == ID_CLUSTER_TIMESTAMP:
                        cluster_ts = _uint(buf, b2, e2)
                    elif eid2 in (ID_SIMPLE_BLOCK, ID_BLOCK_GROUP):
                        block = None
                        if eid2 == ID_SIMPLE_BLOCK:
                            block = (b2, e2)
                        else:
                            for eid3, b3, e3 in iter_elements(buf, b2, e2):
                                if eid3 == ID_BLOCK:
                                    block = (b3, e3)
                        if block is None:
                            continue
                        bb, be = block
                        track_no, p2 = read_vint(buf, bb, keep_marker=False)
                        if track_no not in self._mkv_tracks:
                            continue
                        rel_ts = struct.unpack(">h", buf[p2 : p2 + 2])[0]
                        frames = unlace(buf[p2 + 2 : be])
                        for f in frames:
                            packets.append((track_no, cluster_ts + rel_ts, f))
            elif eid == ID_TAGS:
                self._parse_tags(buf, b, e, rev)
            elif eid == ID_CHAPTERS:
                self._parse_chapters(buf, b, e)
            elif eid == ID_ATTACHMENTS:
                self._parse_attachments(buf, b, e)

        if not self._mkv_tracks:
            raise Unsupported("no supported audio tracks in Matroska")
        if rev.tags:
            self._metadata.push(rev)

        self._timescale_ns = timescale_ns
        self._packets = packets
        self._cursor = 0
        self._track_objs = []
        for no, t in sorted(self._mkv_tracks.items()):
            self._track_objs.append(
                Track(
                    id=no,
                    codec_params=t.params,
                    time_base=TimeBase(timescale_ns, 1_000_000_000),
                )
            )

    def _parse_chapters(self, buf, b, e) -> None:
        """Chapters element -> ChapterGroup (demuxer.rs:583-590)."""
        from ..core.meta import Chapter, ChapterGroup

        group = ChapterGroup()
        for eid, b2, e2 in iter_elements(buf, b, e):
            if eid != ID_EDITION_ENTRY:
                continue
            for eid2, b3, e3 in iter_elements(buf, b2, e2):
                if eid2 != ID_CHAPTER_ATOM:
                    continue
                start_ns = 0
                end_ns = None
                title = None
                for eid3, b4, e4 in iter_elements(buf, b3, e3):
                    if eid3 == ID_CHAPTER_TIME_START:
                        start_ns = _uint(buf, b4, e4)
                    elif eid3 == ID_CHAPTER_TIME_END:
                        end_ns = _uint(buf, b4, e4)
                    elif eid3 == ID_CHAPTER_DISPLAY:
                        for eid4, b5, e5 in iter_elements(buf, b4, e4):
                            if eid4 == ID_CHAP_STRING:
                                title = buf[b5:e5].decode("utf-8", "replace")
                group.items.append(
                    Chapter(start_time=start_ns / 1e9,
                            end_time=end_ns / 1e9 if end_ns is not None else None,
                            title=title)
                )
        if group.items:
            self._chapters = group

    def _parse_attachments(self, buf, b, e) -> None:
        """Attachments element -> Attachment list (demuxer.rs:583-590)."""
        from ..core.meta import Attachment

        out = []
        for eid, b2, e2 in iter_elements(buf, b, e):
            if eid != ID_ATTACHED_FILE:
                continue
            name = mime = desc = None
            data = b""
            for eid2, b3, e3 in iter_elements(buf, b2, e2):
                if eid2 == ID_FILE_NAME:
                    name = buf[b3:e3].decode("utf-8", "replace")
                elif eid2 == ID_FILE_MIME:
                    mime = buf[b3:e3].decode("ascii", "replace")
                elif eid2 == ID_FILE_DATA:
                    data = buf[b3:e3]
                elif eid2 == ID_FILE_DESCRIPTION:
                    desc = buf[b3:e3].decode("utf-8", "replace")
            out.append(Attachment(name=name, media_type=mime, data=data,
                                  description=desc))
        if out:
            self._attachments = out

    def _parse_tags(self, buf, b, e, rev: MetadataRevision) -> None:
        from ..metadata.vorbis import STD_KEYS

        for eid, b2, e2 in iter_elements(buf, b, e):
            if eid != ID_TAG:
                continue
            for eid2, b3, e3 in iter_elements(buf, b2, e2):
                if eid2 != ID_SIMPLE_TAG:
                    continue
                name = val = None
                for eid3, b4, e4 in iter_elements(buf, b3, e3):
                    if eid3 == ID_TAG_NAME:
                        name = buf[b4:e4].decode("utf-8", "replace")
                    elif eid3 == ID_TAG_STRING:
                        val = buf[b4:e4].decode("utf-8", "replace")
                if name and val is not None:
                    rev.tags.append(RawTag(name, val, STD_KEYS.get(name.lower())))

    # -- FormatReader ------------------------------------------------------

    def tracks(self) -> List[Track]:
        return self._track_objs

    def next_packet(self) -> Optional[Packet]:
        if self._cursor >= len(self._packets):
            return None
        no, ts, data = self._packets[self._cursor]
        self._cursor += 1
        return Packet(track_id=no, ts=ts, dur=0, data=data)

    def seek(self, mode: str, to: SeekTo) -> SeekedTo:
        if to.ts is not None:
            ts = to.ts
        elif to.time is not None:
            ts = int(to.time.to_seconds() * 1_000_000_000 / self._timescale_ns)
        else:
            raise SeekError("no seek target")
        keys = [p[1] for p in self._packets]
        import bisect

        i = max(0, bisect.bisect_right(keys, ts) - 1)
        self._cursor = i
        return SeekedTo(self._track_objs[0].id, ts,
                        self._packets[i][1] if self._packets else 0)

    def packet_table(self, track_id: Optional[int] = None) -> PacketTable:
        if track_id is None:
            track_id = self._track_objs[0].id
        sel = [(ts, d) for no, ts, d in self._packets if no == track_id]
        n = len(sel)
        return PacketTable(
            track_id=track_id,
            offsets=np.full(n, -1, dtype=np.int64),
            sizes=np.asarray([len(d) for _, d in sel], dtype=np.int64),
            ts=np.asarray([ts for ts, _ in sel], dtype=np.int64),
            dur=np.zeros(n, dtype=np.int64),
            trim_start=np.zeros(n, np.int32),
            trim_end=np.zeros(n, np.int32),
            data=[d for _, d in sel],
        )


def _score(context: bytes) -> int:
    return 255 if context.startswith(EBML_MAGIC) else 0


DESCRIPTOR = Descriptor(
    name="mkv",
    markers=[EBML_MAGIC],
    factory=MkvReader,
    score=_score,
)
