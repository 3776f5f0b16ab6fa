"""Batch-native decode sessions: files -> PCM tensors via the TPU pipeline.

The TPU-first entry point (SURVEY.md §7): demux to a packet table, run the
entropy stage over all packets (host pre-scan: Python oracle or the native
C++ scanner when built), pack frames into padded lane tensors, reconstruct
on device, and stitch. The per-packet ``AudioDecoder`` API remains available
for incremental/streaming use; this module is the bulk path.
"""

from __future__ import annotations

import logging
import time

from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger("symphonia_tpu.batch")

from .core.errors import DecodeError
from .core.io import MediaSourceStream
from .ops import flac_dense


@dataclass
class DecodedAudio:
    """Bulk decode result: planar int32/float32 [channels, samples]."""

    samples: np.ndarray
    sample_rate: int
    bits_per_sample: int
    md5_ok: Optional[bool] = None


def _flac_md5_ok(samples: np.ndarray, si) -> Optional[bool]:
    """STREAMINFO MD5 verification (validate.rs); None when the stream
    carries no MD5 (the all-zero sentinel)."""
    if si.md5 == b"\x00" * 16:
        return None
    import hashlib

    from .codecs.flac import md5_bytes_of

    return hashlib.md5(
        md5_bytes_of(samples.astype(np.int64), si.bits_per_sample)
    ).digest() == si.md5


class FlacBatchDecoder:
    """Whole-file(s) FLAC decode through the batched device pipeline.

    ``lane_chunk`` bounds how many subframe lanes go to the device per
    dispatch (memory control); chunks pipeline naturally under jit.
    """

    def __init__(self, lane_chunk: int = 8192, verify: bool = False):
        self.lane_chunk = lane_chunk
        self.verify = verify

    def _extract_host(self, reader):
        """Host stage for one stream: (packed | None, blocks | None).

        ``packed`` is the native-extracted lane tensor dict ready for the
        device; None means the caller must take a robust per-file path
        (native unavailable, malformed frames, desynced fast scan)."""
        si = reader.stream_info
        packed = None
        blocks = None
        try:
            from . import native

            total = reader.mss.byte_len()
            if native.available() and si.block_len_max and total is not None:
                mss = reader.mss
                mss.seek(reader._data_start)
                buf = mss.read_bytes(int(total - reader._data_start))
                max_frames = (
                    si.n_samples // max(1, si.block_len_min) + 8
                    if si.n_samples else len(buf) // 64 + 16
                )
                max_frames = min(max_frames, len(buf) // 10 + 16)
                packed = native.flac_fast_extract(buf, si, si.block_len_max,
                                                  max_frames)
                if packed is not None and (packed["status"] != 0).any():
                    packed = None
                if packed is not None:
                    if si.n_samples:
                        if int(packed["block"].sum()) < si.n_samples:
                            packed = None
                    elif packed["F"] > 0:
                        tail = len(buf) - int(packed["offsets"][-1])
                        if tail > max(4096, 8 * len(buf) // packed["F"]):
                            packed = None
                if packed is not None:
                    blocks = packed["block"].astype(np.int64)
        except (ImportError, AttributeError):
            pass

        if packed is None:
            reader._ensure_scan()
            starts = reader._frame_starts
            if len(starts) == 0:
                return None, None
            buf = reader._buf
            ends = np.empty(len(starts), dtype=np.int64)
            ends[:-1] = starts[1:]
            ends[-1] = len(buf)
            sizes = ends - starts
            n_max = si.block_len_max or int(reader._frame_dur.max())
            try:
                from . import native

                if native.available():
                    packed = native.flac_extract(buf, starts, sizes, si, n_max)
                    if packed is not None and (packed["status"] != 0).any():
                        packed = None  # malformed frames: robust path
            except ImportError:
                pass
            blocks = reader._frame_dur.astype(np.int64)
        return packed, blocks

    def decode_bytes(self, data: bytes, _reader=None,
                     _extracted=None) -> DecodedAudio:
        from .codecs.flac import parse_frame
        from .formats.flac import FlacReader

        reader = _reader if _reader is not None else \
            FlacReader(MediaSourceStream(data))
        si = reader.stream_info
        if si.bits_per_sample > 25:
            # 32-bit streams carry 33-bit side channels, exceeding the
            # device path's int32 lanes; use the exact host decoder
            # (decoder.rs:195-227's i64 situation).
            out = _fallback_decode(data, gapless=True)
            if self.verify:
                out.md5_ok = _flac_md5_ok(out.samples, si)
            return out
        # Entropy stage (SURVEY.md §7 Phase A), fastest available path:
        # 1. AVX-512 sync scan + 8-lane SIMD extraction (no demux scan);
        # 2. scalar native extraction over the demuxer's scan;
        # 3. Python oracle. (DoS bounds + fast-scan desync checks live in
        # _extract_host, shared with decode_many's merged dispatch.)
        packed, blocks = (_extracted if _extracted is not None
                          else self._extract_host(reader))
        if packed is None and blocks is None:  # no frames found at all
            return DecodedAudio(
                np.zeros((si.channels, 0), np.int32), si.sample_rate,
                si.bits_per_sample,
            )
        if packed is not None:
            t0 = time.perf_counter()
            pcm = self._decode_packed_chunked(packed, blocks)
            logger.debug("flac device stage: %d frames in %.1f ms",
                         packed["F"], 1e3 * (time.perf_counter() - t0))
        else:
            table = reader.packet_table()
            frames = []
            for p in table.data:
                try:
                    frames.append(parse_frame(p, si))
                except DecodeError:
                    # Corrupt frame: skip the packet and continue, as the
                    # reference decode loop does (SURVEY.md §5).
                    logger.warning("flac: skipping corrupt frame")
            if not frames:
                return DecodedAudio(
                    np.zeros((si.channels, 0), np.int32), si.sample_rate,
                    si.bits_per_sample,
                )
            C = max(f.header.n_channels for f in frames)
            frames_per_chunk = max(1, self.lane_chunk // C)
            n_max = max(si.block_len_max,
                        max(f.header.block_size for f in frames))
            outs = []
            for i in range(0, len(frames), frames_per_chunk):
                chunk = frames[i : i + frames_per_chunk]
                # Same power-of-two bucketing as the packed path: pad the
                # tail chunk with duplicate frames (outputs discarded) so
                # device dispatch shapes are stable across files — a fresh
                # (lanes, n_max) shape is a fresh multi-minute remote
                # compile.
                cnt = (1 << (len(chunk) - 1).bit_length()
                       if len(chunk) > 1 else 1)
                cnt = min(cnt, frames_per_chunk)
                padded = chunk + [chunk[-1]] * (cnt - len(chunk))
                pk = flac_dense.pack_parsed_frames(padded, n_max=n_max)
                out = flac_dense.decode_packed(pk)
                for j, f in enumerate(chunk):
                    outs.append(out[j, : f.header.n_channels, : f.header.block_size])
            pcm = np.concatenate(outs, axis=1)
        if si.n_samples:
            pcm = pcm[:, : si.n_samples]

        md5_ok = _flac_md5_ok(pcm, si) if self.verify else None
        return DecodedAudio(pcm, si.sample_rate, si.bits_per_sample, md5_ok)

    def _decode_packed_chunked(self, packed, blocks: np.ndarray) -> np.ndarray:
        """Run the device dense stage over native-packed tensors in lane
        chunks and stitch per-frame outputs."""
        F, C, n_max = packed["F"], packed["C"], packed["n_max"]
        frames_per_chunk = max(1, self.lane_chunk // C)
        outs = []

        def pad_f(a, count):
            # Pad the frame axis to the fixed chunk size so device dispatch
            # shapes are stable across files (one compile per (chunk, n_max)).
            if a.shape[0] == count:
                return a
            widths = [(0, count - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, widths)

        for i in range(0, F, frames_per_chunk):
            j = min(F, i + frames_per_chunk)
            # Bucket to the next power of two: bounded compile count with
            # bounded padding waste.
            cnt = 1 << (j - i - 1).bit_length() if j - i > 1 else 1
            cnt = min(cnt, frames_per_chunk)
            sub = {
                "res": pad_f(packed["res"].reshape(F, C, n_max)[i:j], cnt).reshape(-1, n_max),
                "coefs": pad_f(packed["coefs"].reshape(F, C, 32)[i:j], cnt).reshape(-1, 32),
                "order": pad_f(packed["order"].reshape(F, C)[i:j], cnt).reshape(-1),
                "shift": pad_f(packed["shift"].reshape(F, C)[i:j], cnt).reshape(-1),
                "wasted": pad_f(packed["wasted"].reshape(F, C)[i:j], cnt).reshape(-1),
                "assign": pad_f(packed["assign"][i:j], cnt),
                "F": cnt, "C": C, "n_max": n_max,
            }
            out = flac_dense.decode_packed(sub)
            for k in range(j - i):
                outs.append(out[k, :, : int(blocks[i + k])])
        return np.concatenate(outs, axis=1)

    def decode_file(self, path: str) -> DecodedAudio:
        with open(path, "rb") as f:
            return self.decode_bytes(f.read())

    def decode_files(self, paths: Sequence[str]) -> List[DecodedAudio]:
        datas = []
        for p in paths:
            with open(p, "rb") as f:
                datas.append(f.read())
        return self.decode_many(datas)

    def decode_many(self, datas: Sequence[bytes]) -> List[DecodedAudio]:
        """Decode several FLAC streams through MERGED device dispatches.

        The serving-shape entry point: short files underfill the device
        (an 8 s file is ~90 frame lanes vs the 8192-lane dispatch sweet
        spot), so frame lanes from all streams merge into shared
        power-of-two buckets — same kernels, same per-file outputs.
        Streams whose host stage cannot produce packed lanes (wide bps,
        malformed frames, no native library) take their exact per-file
        path, including its error behavior.
        """
        from .formats.flac import FlacReader

        results: List[Optional[DecodedAudio]] = [None] * len(datas)
        jobs = []  # (result idx, stream_info, packed, blocks)
        for i, data in enumerate(datas):
            reader = None
            try:
                reader = FlacReader(MediaSourceStream(data))
            except Exception:
                pass
            if reader is None or reader.stream_info.bits_per_sample > 25:
                results[i] = self.decode_bytes(data)
                continue
            packed, blocks = self._extract_host(reader)
            if packed is None:
                # Robust per-file path, reusing the scan/extraction just
                # done (re-running it doubled the host stage for exactly
                # the files where it is slowest).
                results[i] = self.decode_bytes(
                    data, _reader=reader, _extracted=(packed, blocks))
                continue
            # The native extraction returns POOLED buffers (native.py
            # _pooled): the next file's extraction reuses them, so the
            # queued tensors must be copied out.
            packed = {k: (np.array(v, copy=True)
                          if isinstance(v, np.ndarray) else v)
                      for k, v in packed.items()}
            jobs.append((i, reader.stream_info, packed,
                         np.array(blocks, copy=True)))
        by_c = {}
        for job in jobs:
            by_c.setdefault(int(job[2]["C"]), []).append(job)
        for C, group in by_c.items():
            self._dispatch_merged(C, group, results)
        return results

    def _dispatch_merged(self, C: int, group, results) -> None:
        """One merged device pass over every stream with channel count C,
        then split/stitch/trim per stream (frames are independent lanes;
        stitching is per-file host work exactly as in decode_bytes)."""
        n_max = max(int(p["n_max"]) for _, _, p, _ in group)
        parts = {k: [] for k in ("res", "coefs", "order", "shift",
                                 "wasted", "assign")}
        blocks_l = []
        spans = []
        total_f = 0
        for idx, si, p, blocks in group:
            F = int(p["F"])
            res = np.asarray(p["res"]).reshape(F, C, int(p["n_max"]))
            if int(p["n_max"]) != n_max:
                res = np.pad(res, ((0, 0), (0, 0),
                                   (0, n_max - int(p["n_max"]))))
            parts["res"].append(res.reshape(F * C, n_max))
            parts["coefs"].append(np.asarray(p["coefs"]).reshape(F * C, 32))
            for k in ("order", "shift", "wasted"):
                parts[k].append(np.asarray(p[k]).reshape(F * C))
            parts["assign"].append(np.asarray(p["assign"])[:F])
            blocks_l.append(np.asarray(blocks))
            spans.append((idx, si, int(np.asarray(blocks).sum())))
            total_f += F
        merged = {k: np.concatenate(v) for k, v in parts.items()}
        merged.update(F=total_f, C=C, n_max=n_max)
        pcm_all = self._decode_packed_chunked(merged, np.concatenate(blocks_l))
        pos = 0
        for idx, si, n in spans:
            pcm = pcm_all[:, pos : pos + n]
            pos += n
            if si.n_samples:
                pcm = pcm[:, : si.n_samples]
            md5_ok = _flac_md5_ok(pcm, si) if self.verify else None
            results[idx] = DecodedAudio(pcm, si.sample_rate,
                                        si.bits_per_sample, md5_ok)


class Mp3BatchDecoder:
    """Whole-file MP3 decode: native C++ entropy stage -> granule-parallel
    device dense stage (ops.mp3_dense.mp3_dense_batch_jax)."""

    def __init__(self, granule_chunk: int = 4096, gapless: bool = True):
        self.granule_chunk = granule_chunk
        self.gapless = gapless

    def decode_bytes(self, data: bytes) -> DecodedAudio:
        import jax.numpy as jnp

        from . import native
        from .codecs.mpa_common import LAYER3
        from .core.formats import FormatOptions
        from .formats.mpa import MpaReader
        from .ops.mp3_dense import mp3_dense_batch_jax

        reader = MpaReader(
            MediaSourceStream(data), FormatOptions(enable_gapless=self.gapless)
        )
        h = reader.header
        if h.layer != LAYER3:
            return self._decode_l12(data, reader)
        if not native.available():
            return _fallback_decode(data, self.gapless)
        buf = reader._buf
        ext = native.mp3_extract(
            buf, reader._offsets, reader._sizes,
            max_granules=2 * len(reader._offsets) + 2,
        )
        if ext is None or (ext["status"] != 0).any():
            return _fallback_decode(data, self.gapless)
        G = ext["n_granules"]
        C = h.n_channels
        spectra = ext["spectra"][:, :C, :]  # [G, C, 576]
        bt = ext["bt"][:, :C]
        mixed = ext["mixed"][:, :C].astype(bool)

        # Device dense stage, chained in fixed-size chunks (shape-stable).
        chunk = self.granule_chunk
        pcm_parts = []
        ht = st = None
        for i in range(0, G, chunk):
            j = min(G, i + chunk)
            cnt = 1 << (j - i - 1).bit_length() if j - i > 1 else 1
            cnt = min(cnt, chunk)
            sp = np.zeros((cnt, C, 576), np.float32)
            sp[: j - i] = spectra[i:j]
            b = np.zeros((cnt, C), np.int32)
            b[: j - i] = bt[i:j]
            m = np.zeros((cnt, C), bool)
            m[: j - i] = mixed[i:j]
            out, ht, st = mp3_dense_batch_jax(
                jnp.asarray(sp), jnp.asarray(b), jnp.asarray(m), ht, st
            )
            pcm_parts.append(np.asarray(out[: j - i]))
        if not pcm_parts:
            # No decodable granule survived (fully corrupt stream): empty
            # audio, matching the other batch decoders' empty-output path.
            pcm = np.zeros((C, 0), np.float32)
        else:
            pcm = np.concatenate(pcm_parts, axis=0)  # [G, C, 576]
            pcm = pcm.transpose(1, 0, 2).reshape(C, -1)

        track = reader.default_track()
        if self.gapless:
            total = pcm.shape[1]
            start = min(track.delay, total)
            end = max(start, total - track.padding)
            pcm = pcm[:, start:end]
        return DecodedAudio(pcm, h.sample_rate, 32)

    def _decode_l12(self, data: bytes, reader) -> DecodedAudio:
        """Layer I/II batch path: per-frame native bitstream stage, then
        one batched device polyphase (ops.mp3_dense.l12_dense_batch_jax).
        Any native miss falls back to the sequential decoder."""
        import jax.numpy as jnp

        from . import native
        from .codecs.mpa_common import LAYER1, parse_header
        from .codecs.mpa_layer12 import (_find_sb_info, _intensity_bound,
                                         tables)
        from .ops.mp3_dense import l12_dense_batch_jax

        if not native.available():
            return _fallback_decode(data, self.gapless)
        buf = reader._buf
        sf_table = tables()["layer12_scalefactors"]
        sb_frames = []
        C = reader.header.n_channels
        for off, size in zip(reader._offsets, reader._sizes):
            frame = bytes(buf[off : off + size])
            try:
                fh = parse_header(int.from_bytes(frame[:4], "big"))
            except Exception:
                return _fallback_decode(data, self.gapless)
            pos = 4 + (2 if fh.has_crc else 0)
            if fh.layer == LAYER1:
                layer, T, sblimit, rows = 1, 12, 32, None
                bound = min(_intensity_bound(fh), 32)
            else:
                layer, T = 2, 36
                sblimit, rows = _find_sb_info(fh)
                bound = min(_intensity_bound(fh), sblimit)
            s = native.mpa_l12_extract(
                layer, bytes(frame[pos : fh.frame_size]), fh.n_channels,
                bound, sblimit, rows, sf_table)
            if s is None or fh.n_channels != C or fh.layer != reader.header.layer:
                return _fallback_decode(data, self.gapless)
            # The wrapper's output is pooled — copy before the next call.
            sb_frames.append(s[:C].reshape(C, 32, T).copy())
        if not sb_frames:
            return _fallback_decode(data, self.gapless)
        sb = np.stack(sb_frames)  # [F, C, 32, T]
        chunk = self.granule_chunk  # same device-memory bound as Layer III
        pcm_parts = []
        st = None
        F = sb.shape[0]
        for i in range(0, F, chunk):
            j = min(F, i + chunk)
            cnt = 1 << (j - i - 1).bit_length() if j - i > 1 else 1
            cnt = min(cnt, chunk)
            pad = np.zeros((cnt, C, 32, sb.shape[3]), np.float32)
            pad[: j - i] = sb[i:j]
            out, st = l12_dense_batch_jax(jnp.asarray(pad), st)
            pcm_parts.append(np.asarray(out[: j - i]))
        pcm = np.concatenate(pcm_parts, axis=0).transpose(1, 0, 2).reshape(C, -1)
        track = reader.default_track()
        if self.gapless:
            total = pcm.shape[1]
            start = min(track.delay, total)
            end = max(start, total - track.padding)
            pcm = pcm[:, start:end]
        return DecodedAudio(pcm, reader.header.sample_rate, 32)

    def decode_file(self, path: str) -> DecodedAudio:
        with open(path, "rb") as f:
            return self.decode_bytes(f.read())

    def decode_many(self, datas: Sequence[bytes]) -> List[DecodedAudio]:
        """Merged-dispatch MP3 decode (see FlacBatchDecoder.decode_many):
        granule lanes from every Layer III stream share the dense-stage
        buckets; a per-lane boundary mask breaks the hybrid/polyphase
        chains at file starts, so merged output is bit-equal to
        per-file. Non-L3 / malformed / native-less streams take their
        exact per-file path."""
        from . import native
        from .codecs.mpa_common import LAYER3
        from .core.formats import FormatOptions
        from .formats.mpa import MpaReader

        results: List[Optional[DecodedAudio]] = [None] * len(datas)
        jobs = []  # (idx, reader, spectra, bt, mixed)
        for i, data in enumerate(datas):
            job = None
            try:
                if native.available():
                    reader = MpaReader(
                        MediaSourceStream(data),
                        FormatOptions(enable_gapless=self.gapless))
                    if reader.header.layer == LAYER3:
                        ext = native.mp3_extract(
                            reader._buf, reader._offsets, reader._sizes,
                            max_granules=2 * len(reader._offsets) + 2)
                        if ext is not None and not (ext["status"] != 0).any():
                            C = reader.header.n_channels
                            G = ext["n_granules"]
                            # Copy out of the POOLED extraction buffers.
                            job = (i, reader,
                                   np.array(ext["spectra"][:G, :C],
                                            copy=True),
                                   np.array(ext["bt"][:G, :C], copy=True),
                                   np.array(ext["mixed"][:G, :C],
                                            copy=True).astype(bool))
            except Exception:
                job = None
            if job is None:
                results[i] = self.decode_bytes(data)
            else:
                jobs.append(job)
        by_c = {}
        for job in jobs:
            by_c.setdefault(int(job[2].shape[1]), []).append(job)
        for C, group in by_c.items():
            self._dispatch_merged(C, group, results)
        return results

    def _dispatch_merged(self, C: int, group, results) -> None:
        import jax.numpy as jnp

        from .ops.mp3_dense import mp3_dense_batch_jax

        spectra = np.concatenate([g[2] for g in group])
        bt = np.concatenate([g[3] for g in group])
        mixed = np.concatenate([g[4] for g in group])
        counts = [g[2].shape[0] for g in group]
        boundary = np.zeros(spectra.shape[0], bool)
        starts = np.cumsum([0] + counts[:-1])
        boundary[starts[np.asarray(counts) > 0]] = True
        G = spectra.shape[0]
        chunk = self.granule_chunk
        pcm_parts = []
        ht = st = None
        for i in range(0, G, chunk):
            j = min(G, i + chunk)
            cnt = 1 << (j - i - 1).bit_length() if j - i > 1 else 1
            cnt = min(cnt, chunk)
            sp = np.zeros((cnt, C, 576), np.float32)
            sp[: j - i] = spectra[i:j]
            b = np.zeros((cnt, C), np.int32)
            b[: j - i] = bt[i:j]
            m = np.zeros((cnt, C), bool)
            m[: j - i] = mixed[i:j]
            bd = np.zeros(cnt, bool)
            bd[: j - i] = boundary[i:j]
            out, ht, st = mp3_dense_batch_jax(
                jnp.asarray(sp), jnp.asarray(b), jnp.asarray(m), ht, st,
                boundary=jnp.asarray(bd))
            pcm_parts.append(np.asarray(out[: j - i]))
        pcm_all = (np.concatenate(pcm_parts, axis=0) if pcm_parts
                   else np.zeros((0, C, 576), np.float32))
        pos = 0
        for (idx, reader, _, _, _), n_g in zip(group, counts):
            pcm = pcm_all[pos : pos + n_g].transpose(1, 0, 2).reshape(C, -1)
            pos += n_g
            track = reader.default_track()
            if self.gapless:
                total = pcm.shape[1]
                start = min(track.delay, total)
                end = max(start, total - track.padding)
                pcm = pcm[:, start:end]
            results[idx] = DecodedAudio(pcm, reader.header.sample_rate, 32)


def _audio_track_or_raise(fmt):
    """The default audio track, or Unsupported for containers that opened
    with only non-audio (video/subtitle) tracks — those demux packets but
    have nothing an audio decoder applies to."""
    track = fmt.default_track()
    if track is None or track.codec_params is None:
        from .core.errors import Unsupported

        raise Unsupported("no audio tracks")
    return track


def _fallback_decode(data: bytes, gapless: bool) -> DecodedAudio:
    from .core.formats import FormatOptions

    import symphonia_tpu as sym

    mss = MediaSourceStream(data)
    probed = sym.get_probe().probe(
        mss, fmt_opts=FormatOptions(enable_gapless=gapless)
    )
    fmt = probed.format
    track = _audio_track_or_raise(fmt)
    dec = sym.get_codecs().make_audio_decoder(track.codec_params)
    outs = []
    while True:
        pkt = fmt.next_packet()
        if pkt is None:
            break
        if pkt.track_id != track.id:
            continue
        try:
            buf = dec.decode(pkt)
        except DecodeError:
            continue  # skip the corrupt packet like the reference loop
        if buf.frames:
            outs.append(buf.planes().copy())
    n_ch = (track.codec_params.channels.count
            if track.codec_params.channels else 1)
    pcm = (np.concatenate(outs, axis=1) if outs
           else np.zeros((n_ch, 0), np.float32))
    return DecodedAudio(pcm, track.codec_params.sample_rate,
                        track.codec_params.bits_per_sample or 32)


def decode_file(path: str, verify: bool = False) -> DecodedAudio:
    """Decode any supported file through the best available pipeline.

    FLAC uses the batched device path; other codecs fall back to the
    per-packet decoder loop until their batch pipelines land.
    """
    with open(path, "rb") as f:
        data = f.read()
    return decode_bytes(data, verify=verify)


def decode_many(datas: Sequence[bytes],
                verify: bool = False) -> List[DecodedAudio]:
    """Decode a batch of streams, merging device work across files.

    The serving entry point: streams are probed and grouped by pipeline;
    FLAC/MP3/AAC/Vorbis groups share merged device dispatches (lanes
    from all files fill the same power-of-two buckets), everything else
    decodes through its own best pipeline. Output order matches input
    order.

    Error contract: fail-fast — an undecodable stream raises exactly
    what ``decode_bytes`` would raise for it (recoverable corruption is
    still skipped per-packet inside the pipelines, as the reference's
    decode loop does). Callers wanting per-file isolation should wrap
    individual ``decode_bytes`` calls instead.
    """
    import symphonia_tpu as sym

    from .formats.flac import FlacReader
    from .formats.mpa import MpaReader
    from .formats.ogg import OggReader

    results: List[Optional[DecodedAudio]] = [None] * len(datas)
    flac_idx: List[int] = []
    mp3_idx: List[int] = []
    aac_idx: List[int] = []
    vorbis_idx: List[int] = []
    for i, data in enumerate(datas):
        codec = None
        fmt = None
        try:
            probed = sym.get_probe().probe(MediaSourceStream(data))
            track = probed.format.default_track()
            codec = track.codec_params.codec if track else None
            fmt = probed.format
        except Exception:
            pass
        if codec == "flac" and isinstance(fmt, FlacReader):
            flac_idx.append(i)
        elif codec == "mp3" and isinstance(fmt, MpaReader):
            mp3_idx.append(i)
        elif codec == "aac":
            aac_idx.append(i)
        elif codec == "vorbis" and isinstance(fmt, OggReader):
            vorbis_idx.append(i)
        else:
            results[i] = decode_bytes(data, verify=verify)
    if flac_idx:
        merged = FlacBatchDecoder(verify=verify).decode_many(
            [datas[i] for i in flac_idx])
        for i, out in zip(flac_idx, merged):
            results[i] = out
    if mp3_idx:
        merged = Mp3BatchDecoder().decode_many([datas[i] for i in mp3_idx])
        for i, out in zip(mp3_idx, merged):
            results[i] = out
    if aac_idx:
        merged = AacBatchDecoder().decode_many([datas[i] for i in aac_idx])
        for i, out in zip(aac_idx, merged):
            results[i] = out
    if vorbis_idx:
        merged = VorbisBatchDecoder().decode_many(
            [datas[i] for i in vorbis_idx])
        for i, out in zip(vorbis_idx, merged):
            results[i] = out
    return results


def decode_bytes(data: bytes, verify: bool = False) -> DecodedAudio:
    import symphonia_tpu as sym

    mss = MediaSourceStream(data)
    probed = sym.get_probe().probe(mss)
    fmt = probed.format
    track = _audio_track_or_raise(fmt)
    codec = track.codec_params.codec

    # Batch pipelines re-demux with their native container readers; codec
    # streams embedded in OTHER containers (FLAC-in-MKV, MP3-in-MP4, ...)
    # take the generic per-packet loop below.
    from .formats.flac import FlacReader
    from .formats.mpa import MpaReader
    from .formats.ogg import OggReader

    if codec == "flac" and isinstance(fmt, FlacReader):
        return FlacBatchDecoder(verify=verify).decode_bytes(data)
    if codec in ("mp1", "mp2", "mp3") and isinstance(fmt, MpaReader):
        return Mp3BatchDecoder().decode_bytes(data)
    if codec == "vorbis" and isinstance(fmt, OggReader):
        return VorbisBatchDecoder().decode_bytes(data)
    if codec == "aac":
        # AacBatchDecoder re-probes through the generic probe, so any
        # container works.
        return AacBatchDecoder().decode_bytes(data)

    from .core.codecs import AudioDecoderOptions

    dec = sym.get_codecs().make_audio_decoder(
        track.codec_params, AudioDecoderOptions(verify=verify)
    )
    outs = []
    while True:
        pkt = fmt.next_packet()
        if pkt is None:
            break
        if pkt.track_id != track.id:
            continue
        try:
            buf = dec.decode(pkt)
        except DecodeError:
            continue  # skip the corrupt packet like the reference loop
        outs.append(buf.planes().copy())
    pcm = (
        np.concatenate(outs, axis=1)
        if outs
        else np.zeros((track.codec_params.channels.count, 0), np.int32)
    )
    fin = dec.finalize()
    return DecodedAudio(
        pcm,
        track.codec_params.sample_rate,
        track.codec_params.bits_per_sample or 32,
        fin.verify_ok,
    )


class VorbisBatchDecoder:
    """Whole-file OGG Vorbis decode: per-packet host entropy (floors/
    residues/coupling) + grouped device IMDCT dense stage
    (ops.vorbis_dense)."""

    def _extract_host(self, data: bytes):
        """Host stage: (dec, track, spectra list, flags, trims). The bulk
        entropy call allocates fresh arrays per call (native.py
        vorbis_decode_spectra — NOT pooled, unlike flac/mp3/aac), so the
        spectra views are safe to queue across files."""
        from .codecs.vorbis import VorbisDecoder
        from .core.errors import DecodeError
        from .formats.ogg import OggReader

        reader = OggReader(MediaSourceStream(data))
        track = _audio_track_or_raise(reader)
        if track.codec_params.codec != "vorbis":
            raise DecodeError("not a Vorbis stream")
        dec = VorbisDecoder(track.codec_params)
        pkts, trims = [], []
        while True:
            pkt = reader.next_packet()
            if pkt is None:
                break
            if pkt.track_id != track.id:
                continue
            pkts.append(bytes(pkt.data))
            trims.append((pkt.trim_start, pkt.trim_end))
        # Entropy stage: native C++ when available (vorbis_entropy.cpp),
        # Python oracle otherwise.
        spectra, flags = [], []
        ext = None
        try:
            from . import native

            ext = native.vorbis_decode_spectra(dec, pkts)
            if ext is not None and (ext[2] != 0).any():
                ext = None  # malformed packets: robust per-packet path
        except ImportError:
            pass
        if ext is not None:
            sp_all, fl_all, _ = ext
            bs0, bs1 = dec.bs0, dec.bs1
            for i in range(len(pkts)):
                n2 = (bs1 if fl_all[i] else bs0) // 2
                spectra.append(sp_all[i, :, :n2])
                flags.append(bool(fl_all[i]))
        else:
            trims2 = []
            for p, tr in zip(pkts, trims):
                try:
                    sp, flag = dec.decode_spectra(p)
                except DecodeError:
                    continue
                spectra.append(sp)
                flags.append(flag)
                trims2.append(tr)
            trims = trims2
        return dec, track, spectra, flags, trims

    @staticmethod
    def _finish(dec, track, pcm, trims) -> DecodedAudio:
        from .codecs.vorbis import _CHANNEL_MAP

        total_trim_end = sum(t[1] for t in trims)
        if total_trim_end:
            pcm = pcm[:, : pcm.shape[1] - total_trim_end]
        total_trim_start = sum(t[0] for t in trims)
        if total_trim_start:
            # Leading trim (first-page granule offset) mirrors trim_end:
            # drop from the head of the stitched stream.
            pcm = pcm[:, total_trim_start:]
        # Vorbis channel order -> output order.
        chmap = _CHANNEL_MAP.get(pcm.shape[0], list(range(pcm.shape[0])))
        out = np.zeros_like(pcm)
        for src, dst in enumerate(chmap):
            out[dst] = pcm[src]
        return DecodedAudio(out, track.codec_params.sample_rate, 32)

    def decode_bytes(self, data: bytes) -> DecodedAudio:
        from .ops.vorbis_dense import decode_packets_dense

        dec, track, spectra, flags, trims = self._extract_host(data)
        pcm = decode_packets_dense(spectra, flags, dec.bs0, dec.bs1)
        return self._finish(dec, track, pcm, trims)

    def decode_many(self, datas: Sequence[bytes]) -> List[DecodedAudio]:
        """Merged-dispatch Vorbis decode: packet-channel lanes from every
        stream group by BLOCK SIZE across files, one device IMDCT per
        distinct size (the lap stitch stays per-stream host work)."""
        from .ops.vorbis_dense import decode_packets_dense_multi

        results: List[Optional[DecodedAudio]] = [None] * len(datas)
        jobs = []
        for i, data in enumerate(datas):
            try:
                got = self._extract_host(data)
            except Exception:
                results[i] = self.decode_bytes(data)
                continue
            jobs.append((i, got))
        if jobs:
            pcms = decode_packets_dense_multi(
                [(g[2], g[3], g[0].bs0, g[0].bs1) for _, g in jobs])
            for (i, g), pcm in zip(jobs, pcms):
                results[i] = self._finish(g[0], g[1], pcm, g[4])
        return results

    def decode_file(self, path: str) -> DecodedAudio:
        with open(path, "rb") as f:
            return self.decode_bytes(f.read())


class AacBatchDecoder:
    """Whole-stream AAC-LC decode: per-packet host entropy/prep + grouped
    device IMDCTs + host window/OLA chain (ops.aac_dense)."""

    def _extract_host(self, data: bytes, copy: bool = False):
        """Host stage: (decoder, per-channel item lists, quant handoff or
        None). ``copy`` copies the POOLED extraction tensors out —
        decode_many queues results across files, and the next file's
        extraction reuses the pool."""
        import symphonia_tpu as sym

        from .codecs.aac import AacDecoder
        from .core.errors import DecodeError

        probed = sym.get_probe().probe(MediaSourceStream(data))
        fmt = probed.format
        track = _audio_track_or_raise(fmt)
        if track.codec_params.codec != "aac":
            raise DecodeError("not an AAC stream")
        dec = AacDecoder(track.codec_params)
        C = dec.spec.num_channels
        per_ch = [[] for _ in range(C)]
        pkts = []
        while True:
            pkt = fmt.next_packet()
            if pkt is None:
                break
            if pkt.track_id != track.id:
                continue
            pkts.append(bytes(pkt.data))
        # Entropy stage: native C++ when available (aac_entropy.cpp), Python
        # oracle otherwise.
        ext = None
        try:
            from . import native

            if native.available() and pkts:
                buf = b"".join(pkts)
                sizes = np.array([len(p) for p in pkts], np.int64)
                offs = np.zeros(len(pkts), np.int64)
                np.cumsum(sizes[:-1], out=offs[1:])
                ext = native.aac_extract(buf, offs, sizes, dec.rate_idx,
                                         dec.bands_long, dec.bands_short, C)
                if ext is not None and (
                    (ext["status"] != 0).any() or (ext["nch"] != C).any()
                ):
                    ext = None  # malformed/unsupported frames: robust path
                if ext is not None and copy:
                    ext = {k: (np.array(v, copy=True)
                               if isinstance(v, np.ndarray) else v)
                           for k, v in ext.items()}
        except ImportError:
            pass
        quant_ch = None
        if ext is not None:
            # Handoff lanes (deq == 0) carry quants; their dequantization
            # fuses into the device IMDCT program (ops.aac_dense), so no
            # coefficient round trip happens here.
            quant_ch = [(ext["qbuf"][:, c], ext["scales"][:, c],
                         ext["deq"][:, c], dec.bands_long) for c in range(C)]
            for f in range(ext["F"]):
                for c in range(C):
                    per_ch[c].append(
                        (ext["coeffs"][f, c], int(ext["seq"][f, c]),
                         bool(ext["shape"][f, c]), bool(ext["prev_shape"][f, c]))
                    )
        else:
            for p in pkts:
                try:
                    chans = dec.decode_coeffs(p)
                except DecodeError:
                    # Skip the packet and continue (reference decode-loop
                    # error handling, SURVEY.md §5).
                    continue
                for c, item in enumerate(chans[:C]):
                    per_ch[c].append(item)
        return dec, per_ch, quant_ch

    def decode_bytes(self, data: bytes) -> DecodedAudio:
        from .ops.aac_dense import imdct_frames, window_ola_batch

        dec, per_ch, quant_ch = self._extract_host(data)
        C = dec.spec.num_channels
        outs = []
        for c in range(C):
            if not per_ch[c]:
                outs.append(np.zeros(0, np.float32))
                continue
            coeffs = np.stack([it[0] for it in per_ch[c]])
            seqs = [it[1] for it in per_ch[c]]
            shapes = [it[2] for it in per_ch[c]]
            prevs = [it[3] for it in per_ch[c]]
            pcms = imdct_frames(coeffs, seqs,
                                quant_ch[c] if quant_ch is not None else None)
            outs.append(window_ola_batch(pcms, seqs, shapes, prevs))
        n = max(len(o) for o in outs)
        pcm = np.zeros((C, n), np.float32)
        for c, o in enumerate(outs):
            pcm[c, : len(o)] = o
        return DecodedAudio(pcm, dec.spec.rate, 32)

    def decode_file(self, path: str) -> DecodedAudio:
        with open(path, "rb") as f:
            return self.decode_bytes(f.read())

    def decode_many(self, datas: Sequence[bytes]) -> List[DecodedAudio]:
        """Merged-dispatch AAC decode: (file, channel) frame sequences
        flatten into one lane batch per sample-rate group (the device
        IMDCT/dequant is per-lane stateless; the window/OLA chain runs on
        the host per sequence, exactly as in decode_bytes)."""
        results: List[Optional[DecodedAudio]] = [None] * len(datas)
        jobs = []
        for i, data in enumerate(datas):
            try:
                dec, per_ch, quant_ch = self._extract_host(data, copy=True)
            except Exception:
                results[i] = self.decode_bytes(data)
                continue
            jobs.append((i, dec, per_ch, quant_ch))
        groups = {}
        for job in jobs:
            key = tuple(int(b) for b in job[1].bands_long)
            groups.setdefault(key, []).append(job)
        for bl, group in groups.items():
            self._dispatch_merged(bl, group, results)
        return results

    def _dispatch_merged(self, bl, group, results) -> None:
        from .ops.aac_dense import imdct_frames, window_ola_batch

        lanes = []  # (group idx, channel, n frames)
        coeffs_l, seqs, shapes, prevs = [], [], [], []
        qb_l, sc_l, dq_l = [], [], []
        for gi, (idx, dec, per_ch, quant_ch) in enumerate(group):
            for c in range(dec.spec.num_channels):
                items = per_ch[c]
                lanes.append((gi, c, len(items)))
                if not items:
                    continue
                coeffs_l += [it[0] for it in items]
                seqs += [it[1] for it in items]
                shapes += [it[2] for it in items]
                prevs += [it[3] for it in items]
                n = len(items)
                if quant_ch is not None:
                    qb, sc, dq, _ = quant_ch[c]
                    qb_l.append(qb[:n])
                    sc_l.append(sc[:n])
                    dq_l.append(dq[:n])
                else:  # oracle-path file: coefficients already dequantized
                    qb_l.append(np.zeros((n, 1024), np.int16))
                    sc_l.append(np.zeros((n, 64), np.float32))
                    dq_l.append(np.ones(n, np.int32))
        pcms = []
        if coeffs_l:
            quant = (np.concatenate(qb_l), np.concatenate(sc_l),
                     np.concatenate(dq_l), np.asarray(bl))
            pcms = imdct_frames(np.stack(coeffs_l), seqs, quant)
        outs_by = {}
        pos = 0
        for gi, c, n in lanes:
            if n:
                outs_by[(gi, c)] = window_ola_batch(
                    pcms[pos : pos + n], seqs[pos : pos + n],
                    shapes[pos : pos + n], prevs[pos : pos + n])
                pos += n
            else:
                outs_by[(gi, c)] = np.zeros(0, np.float32)
        for gi, (idx, dec, per_ch, _) in enumerate(group):
            C = dec.spec.num_channels
            outs = [outs_by[(gi, c)] for c in range(C)]
            n = max((len(o) for o in outs), default=0)
            pcm = np.zeros((C, n), np.float32)
            for c, o in enumerate(outs):
                pcm[c, : len(o)] = o
            results[idx] = DecodedAudio(pcm, dec.spec.rate, 32)
