"""Malformed-input robustness tests (the analog of the reference's
cargo-fuzz decode_*/demux_* targets, SURVEY.md §4.4): truncated, corrupted,
and random inputs must raise framework errors — never crash, hang, or
exhaust memory."""

import numpy as np
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


def corpus():
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


HOUSE_OGG = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"


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
        data = open(HOUSE_OGG, "rb").read()
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
