"""Native FLAC demuxer.

Analog of symphonia-bundle-flac/src/demuxer.rs (``FlacReader``,
demuxer.rs:42): reads the ``fLaC`` marker + metadata blocks (STREAMINFO,
SEEKTABLE, VORBIS_COMMENT, PICTURE — demuxer.rs:404, embedded/flac.rs), then
packetizes frames.

Batch-first design: instead of the reference's incremental heuristic
re-sync parser (parser.rs:20-229), frame boundaries are found by one
vectorized whole-stream scan — numpy locates every 14-bit sync candidate at
once, candidates are validated by header parse + CRC-8 and the frame span is
confirmed with the trailing CRC-16 (exactly the properties parser.rs checks
incrementally). The resulting frame table *is* the ``packet_table`` the
batched TPU decode path consumes; a cursor over it serves ``next_packet``.
The native C++ scanner (native/) accelerates the same algorithm.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..common.flac import StreamInfo, first_sample_of, parse_frame_header
from ..core.checksum import crc16_buf
from ..core.codecs import CODEC_ID_FLAC, AudioCodecParameters, VerificationCheck
from ..core.errors import DecodeError, EndOfStream, SeekError, Unsupported
from ..core.formats import (
    FormatOptions,
    FormatReader,
    PacketTable,
    SeekMode,
    SeekTo,
    SeekedTo,
    Track,
)
from ..core.meta import MetadataLog, MetadataRevision
from ..core.packet import Packet
from ..core.probe import Descriptor
from ..core.units import TimeBase
from ..metadata.vorbis import parse_flac_picture, parse_vorbis_comment

FLAC_MARKER = b"fLaC"

BLOCK_STREAMINFO = 0
BLOCK_PADDING = 1
BLOCK_APPLICATION = 2
BLOCK_SEEKTABLE = 3
BLOCK_VORBIS_COMMENT = 4
BLOCK_CUESHEET = 5
BLOCK_PICTURE = 6


def _try_native_scan(buf: bytes, si: StreamInfo):
    """Use the native C++ frame scanner when available."""
    try:
        from .. import native

        if native.available():
            return native.flac_scan_frames(buf, si)
    except ImportError:
        pass
    return None


def scan_frames(buf: bytes, si: StreamInfo) -> np.ndarray:
    """Find all frame start offsets in ``buf`` (0 must start a frame).

    Vectorized candidate search + CRC-16 span confirmation; returns int64
    offsets. The final frame extends to the end of ``buf``.
    """
    if len(buf) < 2:  # matches the native scan: no room for a sync code
        return np.empty(0, dtype=np.int64)
    try:
        parse_frame_header(buf[:16], si)
    except DecodeError:
        # Junk between the metadata blocks and the first frame (or a
        # corrupt first frame): re-anchor at the first parseable header,
        # like parser.rs's incremental re-sync — a bad anchor would
        # otherwise poison the whole table.
        a0 = np.frombuffer(buf, dtype=np.uint8)
        cands = np.nonzero((a0[:-1] == 0xFF) & ((a0[1:] & 0xFC) == 0xF8))[0]
        for c in cands:
            try:
                parse_frame_header(buf[int(c) : int(c) + 16], si)
            except DecodeError:
                continue
            return scan_frames(buf[int(c):], si) + int(c)
        return np.empty(0, dtype=np.int64)
    native_result = _try_native_scan(buf, si)
    if native_result is not None:
        return native_result

    a = np.frombuffer(buf, dtype=np.uint8)
    cand = np.nonzero((a[:-1] == 0xFF) & ((a[1:] & 0xFC) == 0xF8))[0]
    starts = [0]
    # Header-valid candidates whose chain CRC failed since the last accepted
    # start: used to re-anchor after a corrupt frame (parser.rs re-syncs and
    # keeps decoding; a pure CRC chain would drop everything after one bad
    # frame).
    tentatives: List[int] = []
    view = memoryview(buf)
    ci = np.searchsorted(cand, 1)
    while ci < len(cand):
        c = int(cand[ci])
        ci += 1
        if c <= starts[-1]:
            continue
        try:
            parse_frame_header(bytes(view[c : c + 16]), si)
        except DecodeError:
            continue
        # Confirm the previous frame's span with its trailing CRC-16
        # (parser.rs's check, done span-wise).
        prev = starts[-1]
        if c - prev < 6:
            continue
        expect = buf[c - 2] << 8 | buf[c - 1]
        if crc16_buf(bytes(view[prev : c - 2])) == expect:
            starts.append(c)
            tentatives.clear()
            continue
        # Re-anchor: if the span from an earlier unconfirmed candidate
        # checks out, that candidate was a genuine frame start and the
        # corrupt bytes before it are skipped.
        for t in tentatives:
            if c - t >= 6 and crc16_buf(bytes(view[t : c - 2])) == expect:
                starts.append(t)
                starts.append(c)
                tentatives.clear()
                break
        else:
            if len(tentatives) < 64:
                tentatives.append(c)
    return np.asarray(starts, dtype=np.int64)


def parse_flac_cuesheet(payload: bytes, sample_rate: int):
    """CUESHEET metadata block -> ChapterGroup (embedded/flac.rs
    read_flac_cuesheet_block). Tracks become chapters (one per index point
    when present); the catalog number and per-track ISRCs are carried as
    tags."""
    from ..core.meta import Chapter, ChapterGroup, RawTag

    if len(payload) < 128 + 8 + 1 + 258 + 1:
        raise DecodeError("flac: truncated cuesheet")
    catalog = payload[:128].rstrip(b"\x00")
    if any(b < 0x20 or b > 0x7E for b in catalog):
        raise DecodeError("flac: cuesheet catalog number invalid")
    pos = 128
    lead_in = int.from_bytes(payload[pos : pos + 8], "big")
    pos += 8
    is_cdda = bool(payload[pos] & 0x80)
    pos += 1
    if not is_cdda and lead_in:
        raise DecodeError("flac: cuesheet lead-in without CD-DA")
    pos += 258  # reserved
    n_tracks = payload[pos]
    pos += 1
    if n_tracks == 0:
        raise DecodeError("flac: cuesheet has no tracks")

    group = ChapterGroup()
    if catalog:
        group.title = catalog.decode("ascii")
    for _ in range(n_tracks):
        if pos + 36 > len(payload):
            raise DecodeError("flac: truncated cuesheet track")
        offset = int.from_bytes(payload[pos : pos + 8], "big")
        number = payload[pos + 8]
        if number == 0:
            raise DecodeError("flac: cuesheet track number 0")
        isrc = payload[pos + 9 : pos + 21].rstrip(b"\x00")
        pos += 21 + 14  # + flags/reserved
        n_idx = payload[pos]
        pos += 1
        is_lead_out = is_cdda and number == 170
        tags = ([RawTag("ISRC", isrc.decode("ascii", "replace"), "ident_isrc")]
                if isrc else [])
        if n_idx == 0:
            if not is_lead_out:
                group.items.append(Chapter(
                    start_time=offset / sample_rate,
                    title=f"Track {number}", tags=tags))
        for _ in range(n_idx):
            if pos + 12 > len(payload):
                raise DecodeError("flac: truncated cuesheet index")
            idx_off = int.from_bytes(payload[pos : pos + 8], "big")
            idx_no = payload[pos + 8]
            pos += 12
            if not is_lead_out:
                group.items.append(Chapter(
                    start_time=(offset + idx_off) / sample_rate,
                    title=f"Track {number}"
                          + (f" Index {idx_no}" if n_idx > 1 else ""),
                    tags=list(tags)))
    return group


class FlacReader(FormatReader):
    """FLAC format reader (bundle-flac demuxer.rs:42)."""

    def __init__(self, mss, options: Optional[FormatOptions] = None):
        super().__init__(mss, options)
        self._metadata = MetadataLog()
        if mss.read_bytes(4) != FLAC_MARKER:
            raise Unsupported("missing fLaC marker")

        self.stream_info: Optional[StreamInfo] = None
        self._seek_points: List[tuple] = []  # (sample, byte_offset_rel_frames)
        rev = MetadataRevision()
        have_meta = False

        while True:
            hdr = mss.read_byte()
            last = bool(hdr & 0x80)
            btype = hdr & 0x7F
            length = mss.read_u24be()
            payload = mss.read_bytes(length)
            if btype == BLOCK_STREAMINFO:
                self.stream_info = StreamInfo.parse(payload)
            elif btype == BLOCK_SEEKTABLE:
                for i in range(0, len(payload) - 17, 18):
                    sample = int.from_bytes(payload[i : i + 8], "big")
                    if sample == 0xFFFFFFFFFFFFFFFF:
                        continue  # placeholder point
                    off = int.from_bytes(payload[i + 8 : i + 16], "big")
                    self._seek_points.append((sample, off))
            elif btype == BLOCK_VORBIS_COMMENT:
                try:
                    sub = parse_vorbis_comment(payload)
                except DecodeError:
                    sub = None  # malformed comment block: skip it
                if sub is not None:
                    rev.tags.extend(sub.tags)
                    rev.visuals.extend(sub.visuals)
                    rev.vendor = sub.vendor
                    have_meta = True
            elif btype == BLOCK_PICTURE:
                vis = parse_flac_picture(payload)
                if vis is not None:
                    rev.visuals.append(vis)
                    have_meta = True
            elif btype == BLOCK_CUESHEET:
                try:
                    sr = self.stream_info.sample_rate if self.stream_info else 44100
                    group = parse_flac_cuesheet(payload, sr)
                    if group.items:
                        self._chapters = group
                except DecodeError:
                    pass  # malformed cuesheet: ignore, like other metadata
            # PADDING/APPLICATION payloads are skipped.
            if last:
                break
        if have_meta:
            self._metadata.push(rev)

        if self.stream_info is None:
            raise DecodeError("missing STREAMINFO")
        si = self.stream_info

        self._data_start = mss.pos()
        self._frame_starts: Optional[np.ndarray] = None
        self._frame_ts: Optional[np.ndarray] = None
        self._frame_dur: Optional[np.ndarray] = None
        self._buf: Optional[bytes] = None
        self._cursor = 0

        params = AudioCodecParameters(
            codec=CODEC_ID_FLAC,
            sample_rate=si.sample_rate,
            bits_per_sample=si.bits_per_sample,
            channels=__import__(
                "symphonia_tpu.core.audio", fromlist=["Channels"]
            ).Channels.from_count(si.channels),
            max_frames_per_packet=si.block_len_max,
            extra_data=bytes(
                # Re-encode the STREAMINFO payload for the decoder.
                self._streaminfo_bytes(si)
            ),
            verification_check=VerificationCheck("md5", si.md5)
            if si.md5 != b"\x00" * 16
            else None,
        )
        self._track = Track(
            id=0,
            codec_params=params,
            time_base=TimeBase(1, si.sample_rate),
            num_frames=si.n_samples or None,
        )

    @staticmethod
    def _streaminfo_bytes(si: StreamInfo) -> bytes:
        """Serialize StreamInfo back to the 34-byte block layout."""
        out = bytearray()
        out += si.block_len_min.to_bytes(2, "big")
        out += si.block_len_max.to_bytes(2, "big")
        out += si.frame_byte_len_min.to_bytes(3, "big")
        out += si.frame_byte_len_max.to_bytes(3, "big")
        packed = (
            (si.sample_rate << 44)
            | ((si.channels - 1) << 41)
            | ((si.bits_per_sample - 1) << 36)
            | si.n_samples
        )
        out += packed.to_bytes(8, "big")
        out += si.md5
        return bytes(out)

    # -- frame table -------------------------------------------------------

    def _ensure_scan(self) -> None:
        if self._frame_starts is not None:
            return
        self.mss.seek(self._data_start)
        chunks = []
        while True:
            b = self.mss.read_upto(1 << 22)
            if not b:
                break
            chunks.append(b)
        self._buf = b"".join(chunks)
        si = self.stream_info
        starts, ts, dur = self._scan_and_index(self._buf, si)
        self._frame_starts = starts
        self._frame_ts = ts
        self._frame_dur = dur

    @staticmethod
    def _scan_and_index(buf: bytes, si):
        """Frame-boundary scan + per-frame ts/dur. Tries the AVX-512
        sequence-chain scan first (sh_flac_scan_fast, ~50x faster than the
        CRC-16 chain scan); the result is accepted only when the header
        timestamp chain is contiguous and covers STREAMINFO's sample count,
        otherwise (corruption — the fast scan can't re-anchor) the robust
        CRC-chain scan reruns."""

        def index(starts):
            ts = np.empty(len(starts), dtype=np.int64)
            dur = np.empty(len(starts), dtype=np.int64)
            for i, s in enumerate(starts):
                hdr = parse_frame_header(buf[s : s + 16], si)
                ts[i] = first_sample_of(hdr, si)
                dur[i] = hdr.block_size
            return ts, dur

        fast = None
        if si.n_samples > 0:
            try:
                from .. import native

                if native.available():
                    fast = native.flac_scan_frames_fast(buf, si)
            except ImportError:
                pass
        if fast is not None and len(fast) > 0:
            try:
                ts, dur = index(fast)
            except DecodeError:
                ts = None
            if (ts is not None and ts[0] == 0
                    and np.array_equal(ts[1:], (ts + dur)[:-1])
                    and int(ts[-1] + dur[-1]) == si.n_samples):
                return fast, ts, dur
        starts = scan_frames(buf, si)
        ts, dur = index(starts)
        return starts, ts, dur

    # -- FormatReader ------------------------------------------------------

    def tracks(self) -> List[Track]:
        return [self._track]

    def next_packet(self) -> Optional[Packet]:
        self._ensure_scan()
        if self._cursor >= len(self._frame_starts):
            return None
        i = self._cursor
        self._cursor += 1
        start = int(self._frame_starts[i])
        end = (
            int(self._frame_starts[i + 1])
            if i + 1 < len(self._frame_starts)
            else len(self._buf)
        )
        return Packet(
            track_id=0,
            ts=int(self._frame_ts[i]),
            dur=int(self._frame_dur[i]),
            data=self._buf[start:end],
        )

    def seek(self, mode: str, to: SeekTo) -> SeekedTo:
        self._ensure_scan()
        if to.ts is not None:
            ts = to.ts
        elif to.time is not None:
            ts = self._track.time_base.calc_timestamp(to.time)
        else:
            raise SeekError("no seek target")
        # Sample-accurate: binary search the frame table (demuxer.rs:249-394
        # does SeekTable + bisection; the full table subsumes both).
        if len(self._frame_ts) == 0:
            raise SeekError("no frames to seek in")
        i = int(np.searchsorted(self._frame_ts, ts, side="right")) - 1
        i = max(0, i)
        self._cursor = i
        return SeekedTo(track_id=0, required_ts=ts, actual_ts=int(self._frame_ts[i]))

    def packet_table(self, track_id: Optional[int] = None) -> PacketTable:
        self._ensure_scan()
        n = len(self._frame_starts)
        ends = np.empty(n, dtype=np.int64)
        ends[:-1] = self._frame_starts[1:]
        if n:
            ends[-1] = len(self._buf)
        return PacketTable(
            track_id=0,
            offsets=self._frame_starts + self._data_start,
            sizes=ends - self._frame_starts,
            ts=self._frame_ts.copy(),
            dur=self._frame_dur.copy(),
            trim_start=np.zeros(n, dtype=np.int32),
            trim_end=np.zeros(n, dtype=np.int32),
            data=[
                self._buf[int(s) : int(e)]
                for s, e in zip(self._frame_starts, ends)
            ],
        )


class FlacStreamReader(FlacReader):
    """Streaming FLAC reader for unseekable sources: metadata blocks parse
    incrementally in FlacReader.__init__ already; this override extracts
    one frame at a time over the MSS window (parser.rs incremental
    PacketBuilder) instead of slurping the stream for a table scan."""

    MIN_WINDOW = 1 << 13
    # Must hold one whole frame: a verbatim 65535-sample 8-ch 32-bit frame
    # is ~2.1 MiB, so 2^21 could split a legal frame mid-span.
    MAX_WINDOW = 1 << 23

    def next_packet(self) -> Optional[Packet]:
        si = self.stream_info
        win_size = self.MIN_WINDOW
        while True:
            win = self.mss.peek_bytes(win_size)
            if len(win) < 2:
                return None
            try:
                hdr = parse_frame_header(win[:16], si)
            except DecodeError:
                # Junk at the cursor: resync to the next parseable header.
                a = np.frombuffer(win, dtype=np.uint8)
                cand = np.nonzero((a[:-1] == 0xFF)
                                  & ((a[1:] & 0xFC) == 0xF8))[0]
                for c in cand:
                    if c == 0:
                        continue
                    try:
                        parse_frame_header(win[c : c + 16], si)
                        self.mss.ignore_bytes(int(c))
                        break
                    except DecodeError:
                        continue
                else:
                    if len(win) < win_size:  # EOF, nothing parseable
                        return None
                    self.mss.ignore_bytes(max(1, len(win) - 16))
                continue
            # Find the end: next sync whose CRC-16 trailer confirms the
            # span; like scan_frames, re-anchor past a corrupt frame via
            # tentative candidates (the emitted span then contains the bad
            # frame, which the decoder flags, and the stream continues).
            a = np.frombuffer(win, dtype=np.uint8)
            cand = np.nonzero((a[6:-1] == 0xFF)
                              & ((a[7:] & 0xFC) == 0xF8))[0] + 6
            end = None
            tentatives: List[int] = []
            for c in cand:
                c = int(c)
                try:
                    parse_frame_header(win[c : c + 16], si)
                except DecodeError:
                    continue
                expect = win[c - 2] << 8 | win[c - 1]
                if crc16_buf(win[:c - 2]) == expect:
                    end = c
                    break
                for t in tentatives:
                    if c - t >= 6 and crc16_buf(win[t : c - 2]) == expect:
                        end = t
                        break
                if end is not None:
                    break
                if len(tentatives) < 64:
                    tentatives.append(c)
            if end is None:
                if len(win) == win_size and win_size < self.MAX_WINDOW:
                    win_size *= 2
                    continue
                end = len(win)  # final frame extends to EOF
            data = win[:end]
            self.mss.ignore_bytes(end)
            ts = first_sample_of(hdr, si)
            return Packet(track_id=0, ts=ts, dur=hdr.block_size, data=data)

    def seek(self, mode: str, to: SeekTo) -> SeekedTo:
        raise SeekError("source is not seekable")


def _make_flac_reader(mss, options: Optional[FormatOptions] = None):
    if mss.is_seekable():
        return FlacReader(mss, options)
    return FlacStreamReader(mss, options)


def _score(context: bytes) -> int:
    return 255 if context.startswith(FLAC_MARKER) else 0


DESCRIPTOR = Descriptor(
    name="flac",
    markers=[FLAC_MARKER],
    factory=_make_flac_reader,
    score=_score,
)
