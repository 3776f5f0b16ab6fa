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
                sub = parse_vorbis_comment(payload)
                rev.tags.extend(sub.tags)
                rev.visuals.extend(sub.visuals)
                rev.vendor = sub.vendor
                have_meta = True
            elif btype == BLOCK_PICTURE:
                vis = parse_flac_picture(payload)
                if vis is not None:
                    rev.visuals.append(vis)
                    have_meta = True
            # PADDING/APPLICATION/CUESHEET payloads are skipped.
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
        starts = scan_frames(self._buf, si)
        ts = np.empty(len(starts), dtype=np.int64)
        dur = np.empty(len(starts), dtype=np.int64)
        for i, s in enumerate(starts):
            hdr = parse_frame_header(self._buf[s : s + 16], si)
            ts[i] = first_sample_of(hdr, si)
            dur[i] = hdr.block_size
        self._frame_starts = starts
        self._frame_ts = ts
        self._frame_dur = dur

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


def _score(context: bytes) -> int:
    return 255 if context.startswith(FLAC_MARKER) else 0


DESCRIPTOR = Descriptor(
    name="flac",
    markers=[FLAC_MARKER],
    factory=FlacReader,
    score=_score,
)
