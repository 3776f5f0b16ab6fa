"""Malformed-input robustness tests (the analog of the reference's
cargo-fuzz decode_*/demux_* targets, SURVEY.md §4.4): truncated, corrupted,
and random inputs must raise framework errors — never crash, hang, or
exhaust memory."""

import numpy as np
import pathlib
import pytest

import symphonia_tpu as sym
from symphonia_tpu.core.errors import Error
from symphonia_tpu.core.io import MediaSourceStream

from aac_builder import build_adts, build_raw_block, random_quant_spectrum
from flac_builder import build_flac_file, random_walk
from mp3_builder import build_mpeg1_l3_stream


def try_decode(data: bytes) -> None:
    """Probe + decode-all; any Error subclass is acceptable, crashes not."""
    try:
        mss = MediaSourceStream(data)
        probed = sym.get_probe().probe(mss)
        fmt = probed.format
        track = fmt.default_track()
        if track is None or track.codec_params is None:
            return
        dec = sym.get_codecs().make_audio_decoder(track.codec_params)
        for _ in range(2000):
            pkt = fmt.next_packet()
            if pkt is None:
                break
            try:
                dec.decode(pkt)
            except Error:
                pass
    except (Error, ValueError, KeyError, IndexError, OverflowError):
        pass


HOUSE_OGG = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"


def corpus():
    """One entry per reference fuzz target family (symphonia/fuzz): decode
    flac/mpa/aac/vorbis/alac/adpcm/pcm + demux wav/ogg/mkv/isomp4/flac/caf/
    aiff, via the mirror builders and the baked-in real media."""
    out = []
    ch = random_walk(2048, 16, seed=1, ch=2)
    out.append(("flac", build_flac_file(ch, block_size=512, kind="lpc",
                                        lpc_coefs=[700, -300], lpc_shift=9,
                                        lpc_precision=12)))
    out.append(("mp3", build_mpeg1_l3_stream(4, n_ch=2)))
    rng = np.random.default_rng(0)
    frames = [build_raw_block([random_quant_spectrum(rng, 30, 44100)], [0],
                              30, 140, 44100)]
    out.append(("adts", build_adts(frames, 44100, 1)))

    from test_wav_pcm import make_wav
    from test_aiff_caf import make_aiff, make_caf
    from test_mp4 import build_m4a, build_fmp4
    from test_mkv import build_mkv, simple_block
    from test_adpcm import make_adpcm_wav

    sig = (np.sin(np.arange(1200) * 0.05) * 9000).astype(np.int64)
    pcm2 = np.stack([sig, -sig], axis=1)
    out.append(("wav", make_wav(pcm2, bits=16)))
    out.append(("aiff", make_aiff(pcm2, bits=16)))
    out.append(("caf", make_caf(pcm2, bits=16)))
    out.append(("m4a", build_m4a(frames * 3, 44100, 1)))
    out.append(("fmp4", build_fmp4(frames * 3, 44100, 1)))
    out.append(("mkv", build_mkv(
        "A_PCM/INT/LIT", b"",
        [(0, [simple_block(1, 0, [sig.astype("<i2").tobytes()])])],
        rate=8000, ch=1, bit_depth=16)))
    out.append(("adpcm", make_adpcm_wav(bytes(600), 0x11, 256, 505, 1000)))
    out.append(("ogg", pathlib.Path(HOUSE_OGG).read_bytes()))

    # Flagged ID3v2 frames (grouped/encrypted/compressed/DLI) leading an
    # MP3: the v2.3/v2.4 frame-flag machinery under mutation.
    from test_metadata import build_id3v2, text_frame
    import struct as _s

    flagged = build_id3v2(
        [("TIT2", bytes([7]) + text_frame("G"), 0x0020),
         ("TPE1", bytes([9]) + b"enc", 0x0040),
         ("TALB", _s.pack(">I", 64) + b"\x78\x9czz", 0x0080)], major=3)
    flagged4 = build_id3v2(
        [("TIT2", bytes([5, 2]) + b"xy", 0x0044),
         ("TALB", b"\x00\x00\x00\x04" + text_frame("D"), 0x0001)], major=4)
    out.append(("id3_flags",
                flagged + flagged4 + build_mpeg1_l3_stream(2, n_ch=1)))
    return out


class TestTruncation:
    @pytest.mark.parametrize("name_data", corpus(), ids=lambda nd: nd[0])
    def test_truncated_at_many_points(self, name_data):
        name, data = name_data
        for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
            try_decode(data[: int(len(data) * frac)])

    @pytest.mark.parametrize("name_data", corpus(), ids=lambda nd: nd[0])
    def test_bit_flips(self, name_data):
        name, data = name_data
        rng = np.random.default_rng(42)
        for _ in range(10):
            buf = bytearray(data)
            for _ in range(5):
                buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
            try_decode(bytes(buf))


class TestGarbage:
    def test_random_bytes(self):
        rng = np.random.default_rng(7)
        for n in (16, 1024, 65536):
            try_decode(bytes(rng.integers(0, 256, size=n, dtype=np.uint8)))

    def test_marker_prefixed_garbage(self):
        rng = np.random.default_rng(8)
        junk = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8))
        for marker in (b"fLaC", b"OggS", b"RIFF....WAVE", b"\x1a\x45\xdf\xa3",
                       b"ID3\x04\x00\x00", b"\xff\xfb\x90\x00",
                       b"\x00\x00\x00 ftypM4A "):
            try_decode(marker + junk)

    def test_empty_and_tiny(self):
        for data in (b"", b"\x00", b"fL", b"OggS", b"RIFF"):
            try_decode(data)


class TestDosGuards:
    def test_huge_declared_sizes(self):
        # RIFF declaring a giant data chunk over a tiny file.
        import struct

        fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
        data = (b"RIFF" + struct.pack("<I", 0xFFFFFFF0) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 0xFFFFFF00) + b"\x00" * 64)
        try_decode(data)

    def test_id3v2_declared_size_overflow(self):
        tag = b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f" + b"\x00" * 32
        try_decode(tag)


class TestBatchNativeFuzz:
    """Exercise the batch decoders (native C++ entropy stages) on mutated
    and truncated streams: any framework Error is acceptable, crashes are
    not (a segfault aborts the test run)."""

    def _batch_try(self, data: bytes) -> None:
        from symphonia_tpu import batch

        try:
            batch.decode_bytes(data)
        except (Error, ValueError, KeyError, IndexError, OverflowError,
                ZeroDivisionError):
            pass

    def _mutate(self, data: bytes, rng, n_flips: int) -> bytes:
        b = bytearray(data)
        for _ in range(n_flips):
            i = int(rng.integers(0, len(b)))
            b[i] = int(rng.integers(0, 256))
        return bytes(b)

    @pytest.mark.parametrize("name_data", corpus(), ids=lambda nd: nd[0])
    def test_batch_mutations(self, name_data):
        name, data = name_data
        rng = np.random.default_rng(7)
        for trial in range(8):
            self._batch_try(self._mutate(data, rng, 20))
        for frac in (0.2, 0.6, 0.95):
            self._batch_try(data[: int(len(data) * frac)])

    def test_vorbis_batch_mutations(self):
        data = pathlib.Path(HOUSE_OGG).read_bytes()
        rng = np.random.default_rng(8)
        from symphonia_tpu.batch import VorbisBatchDecoder

        for trial in range(6):
            mutated = self._mutate(data, rng, 30)
            try:
                VorbisBatchDecoder().decode_bytes(mutated)
            except (Error, ValueError, KeyError, IndexError, OverflowError,
                    ZeroDivisionError):
                pass
        for frac in (0.3, 0.7):
            try:
                VorbisBatchDecoder().decode_bytes(data[: int(len(data) * frac)])
            except (Error, ValueError, KeyError, IndexError, OverflowError):
                pass


def _build_order_gt_bs_flac(bs: int = 16) -> bytes:
    """A FLAC file whose single frame declares an LPC order (32) larger than
    the block size — the round-1 heap-overflow reproducer (ADVICE high:
    warmup loop wrote `order` ints into a bs-sized lane)."""
    from flac_builder import BitWriter, build_streaminfo, _utf8_num
    from symphonia_tpu.core.checksum import crc8_buf, crc16_buf

    si = build_streaminfo(bs, 44100, 1, 16, bs, b"\x00" * 16)
    blocks = bytearray([0x80, 0, 0, len(si)]) + si

    hdr = bytearray([0xFF, 0xF8, (0b0111 << 4) | 0b0000,
                     (0 << 4) | (0b100 << 1)])
    hdr += _utf8_num(0)
    hdr += (bs - 1).to_bytes(2, "big")
    hdr.append(crc8_buf(bytes(hdr)))

    bw = BitWriter()
    bw.write(0, 1)
    bw.write(0b100000 | 31, 6)  # LPC order 32 > bs
    bw.write(0, 1)              # no wasted bits
    for _ in range(32):         # 32 warmup samples
        bw.write_signed(1, 16)
    bw.write(11, 4)             # precision 12
    bw.write_signed(5, 5)
    for _ in range(32):
        bw.write_signed(1, 12)
    bw.write(0, 2)              # rice method 0
    bw.write(0, 4)              # partition order 0
    bw.write(0, 4)              # rice param
    body = bw.to_bytes()
    frame = bytes(hdr) + body
    return b"fLaC" + bytes(blocks) + frame + crc16_buf(frame).to_bytes(2, "big")


class TestFlacMalformedRegressions:
    def test_lpc_order_exceeds_block_size_no_overflow(self):
        """Native + oracle paths must reject order > block_size (status -12 /
        DecodeError) rather than writing past the residual lane."""
        data = _build_order_gt_bs_flac()
        try_decode(data)
        from symphonia_tpu.batch import FlacBatchDecoder

        out = FlacBatchDecoder().decode_bytes(data)
        assert out.samples.shape[1] == 0  # sole frame rejected

    def test_native_extract_status_rejects_order_gt_bs(self):
        from symphonia_tpu import native
        from symphonia_tpu.formats.flac import FlacReader
        from symphonia_tpu.core.io import MediaSourceStream

        if not native.available():
            pytest.skip("native library unavailable")
        data = _build_order_gt_bs_flac()
        reader = FlacReader(MediaSourceStream(data))
        buf = data[reader._data_start:]
        import numpy as np
        packed = native.flac_extract(
            buf, np.array([0], np.int64), np.array([len(buf)], np.int64),
            reader.stream_info, 16)
        assert packed["status"][0] == -12


class TestFlacCorruptionRecovery:
    """The scanners must re-anchor past a corrupt frame instead of silently
    truncating the stream (ADVICE medium, round 1)."""

    def _fixture(self):
        from flac_builder import build_flac_file, random_walk

        ch = random_walk(256 * 16, 16, seed=5, ch=1)
        data = build_flac_file(ch, bps=16, block_size=256,
                               kind="fixed", order=2)
        starts = [i for i in range(len(data) - 1)
                  if data[i] == 0xFF and (data[i + 1] & 0xFC) == 0xF8]
        return ch, bytearray(data), starts

    def test_destroyed_sync_skips_one_frame(self):
        from symphonia_tpu.batch import FlacBatchDecoder

        ch, data, starts = self._fixture()
        data[starts[8]] = 0x00
        out = FlacBatchDecoder().decode_bytes(bytes(data))
        ref = np.concatenate([ch[0][: 256 * 8], ch[0][256 * 9:]])
        assert out.samples.shape == (1, 256 * 15)
        np.testing.assert_array_equal(out.samples[0], ref)

    def test_corrupt_body_keeps_decoding(self):
        from symphonia_tpu.batch import FlacBatchDecoder

        ch, data, starts = self._fixture()
        data[starts[8] + 10] ^= 0xFF
        out = FlacBatchDecoder().decode_bytes(bytes(data))
        # The stream keeps its full span; frames after the corruption are
        # exact.
        assert out.samples.shape[1] >= 256 * 15
        np.testing.assert_array_equal(out.samples[0][256 * 9 : 256 * 16],
                                      ch[0][256 * 9 : 256 * 16])

    def test_python_scanner_reanchors(self):
        from symphonia_tpu.formats.flac import FlacReader, scan_frames
        from symphonia_tpu.core.io import MediaSourceStream

        ch, data, starts = self._fixture()
        data[starts[8]] = 0x00
        reader = FlacReader(MediaSourceStream(bytes(data)))
        buf = bytes(data[reader._data_start:])
        rel = [s - reader._data_start for s in starts]
        import symphonia_tpu.formats.flac as ff
        orig = ff._try_native_scan
        ff._try_native_scan = lambda *a: None  # force the Python scanner
        try:
            got = list(scan_frames(buf, reader.stream_info))
        finally:
            ff._try_native_scan = orig
        expect = [r for i, r in enumerate(rel) if i != 8]
        assert got == expect


class TestMalformedMetadata:
    def test_corrupt_vorbis_comment_lengths_skip_metadata(self):
        """Soak-found: insane vendor/comment lengths must not raise
        struct.error; the metadata block is skipped and audio decodes."""
        from flac_builder import build_flac_file, random_walk

        ch = random_walk(1024, 16, seed=2, ch=1)
        for vc in ((0x0FFF0004).to_bytes(4, "little") + b"shrt",
                   b"\x04\x00\x00",  # truncated before vendor
                   b""):
            data = build_flac_file(ch, block_size=256, kind="fixed", order=1,
                                   extra_metadata_blocks=[bytes([4]) + vc])
            n = 0
            probed = sym.get_probe().probe(MediaSourceStream(data))
            while probed.format.next_packet() is not None:
                n += 1
            assert n == 4


class TestAllocationBounds:
    def test_streaminfo_n_samples_cannot_drive_allocation(self):
        """Regression (found by tools/soak.py): a crafted STREAMINFO with a
        huge total-samples field and tiny min-block must not size the lane
        allocation — the byte length bounds the possible frame count."""
        import numpy as np

        from flac_builder import build_flac_file, random_walk
        from symphonia_tpu import batch

        ch = random_walk(4096, 16, seed=3, ch=1)
        data = bytearray(build_flac_file(ch, block_size=4096, kind="fixed",
                                         order=2, partition_order=1))
        # STREAMINFO: min/max block (2+2), min/max frame (3+3), then
        # 20-bit rate + 3-bit ch + 5-bit bps + 36-bit total samples.
        # Set total samples to the 36-bit max and min block to 16.
        base = 8  # fLaC + block header
        data[base + 0:base + 2] = (16).to_bytes(2, "big")
        # bits 4..0 of byte 17 and bytes 18-21 hold total samples' 36 bits
        data[base + 13] |= 0x0F
        data[base + 14:base + 18] = b"\xff\xff\xff\xff"
        try:
            out = batch.decode_bytes(bytes(data))
            assert out.samples.size < 10 * 4096 * 2
        except Exception as e:  # taxonomy errors acceptable; OOM is not
            assert type(e).__name__ not in ("MemoryError", "_ArrayMemoryError")


class TestZeroChannelStreams:
    def test_mkv_zero_channel_pcm_raises_taxonomy(self):
        """Regression (soak): an MKV audio track advertising 0 channels
        built a PcmDecoder whose frame math divided by zero (raw
        ZeroDivisionError escaped the taxonomy)."""
        import sys as _sys
        from pathlib import Path

        _sys.path.insert(0, str(Path(__file__).parent))
        from test_mkv import build_mkv, simple_block

        from symphonia_tpu import batch
        from symphonia_tpu.core.errors import DecodeError, Unsupported

        pcm = np.zeros(256, "<i2").tobytes()
        data = build_mkv("A_PCM/INT/LIT", b"",
                         [(0, [simple_block(1, 0, [pcm])])],
                         rate=8000, ch=0, bit_depth=16)
        with pytest.raises((DecodeError, Unsupported)):
            batch.decode_bytes(data)


class TestCodecParamsFuzz:
    """Garbage extra_data / degenerate layout params straight into the
    codec constructors (containers can deliver arbitrary codec-private
    data). Everything must stay inside the error taxonomy; found the ASC
    SBR-extension rate-index IndexError, the ADPCM block_align=0
    ValueError, and the IMA-QT negative-predictor OverflowError."""

    def test_constructor_and_decode_taxonomy(self):
        import numpy as np

        import symphonia_tpu as sym
        from symphonia_tpu.core.audio import Channels
        from symphonia_tpu.core.codecs import AudioCodecParameters
        from symphonia_tpu.core.errors import Error
        from symphonia_tpu.core.packet import Packet

        rng = np.random.default_rng(12345)
        reg = sym.get_codecs()
        codecs = ["aac", "vorbis", "alac", "flac", "mp3", "mp2", "mp1",
                  "adpcm_ms", "adpcm_ima_wav", "adpcm_ima_qt",
                  "pcm_s16le", "pcm_alaw"]
        for codec in codecs:
            for _ in range(120):
                extra = bytes(rng.integers(0, 256, size=int(rng.integers(0, 64)),
                                           dtype=np.uint8))
                kw = {}
                if codec.startswith(("adpcm", "pcm")):
                    kw = dict(block_align=int(rng.integers(0, 64)),
                              frames_per_block=int(rng.integers(0, 64)),
                              bits_per_coded_sample=int(rng.integers(0, 40)))
                params = AudioCodecParameters(
                    codec=codec, sample_rate=44100,
                    channels=Channels.from_count(int(rng.integers(1, 3))),
                    bits_per_sample=16, extra_data=extra, **kw)
                try:
                    dec = reg.make_audio_decoder(params)
                except Error:
                    continue
                data = bytes(rng.integers(
                    0, 256, size=int(rng.integers(0, 300)), dtype=np.uint8))
                try:
                    dec.decode(Packet(track_id=0, ts=0, dur=1024, data=data))
                except Error:
                    pass
