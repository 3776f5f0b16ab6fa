"""Tests for byte/bit I/O: MediaSourceStream, BitReaderLtr/Rtl, codebooks.

Mirrors the reference's inline tests for io/bit.rs:1376+ and
io/media_source_stream.rs (SURVEY.md §4).
"""

import io
import random

import numpy as np
import pytest

from symphonia_tpu.core.errors import EndOfStream, SeekError
from symphonia_tpu.core.io import (
    BitReaderLtr,
    BitReaderRtl,
    BufReader,
    Codebook,
    MediaSourceStream,
    MonitorStream,
    ScopedStream,
)
from symphonia_tpu.core.checksum import Crc16


class TestMediaSourceStream:
    def test_basic_reads(self):
        mss = MediaSourceStream(bytes(range(16)))
        assert mss.read_byte() == 0
        assert mss.read_u16le() == 0x0201
        assert mss.read_u16be() == 0x0304
        assert mss.read_u24le() == 0x070605
        assert mss.read_u32be() == 0x08090A0B
        assert mss.pos() == 12

    def test_peek_and_seek(self):
        mss = MediaSourceStream(bytes(range(100)))
        assert mss.peek_bytes(4) == bytes([0, 1, 2, 3])
        assert mss.pos() == 0
        mss.seek(50)
        assert mss.read_byte() == 50
        mss.seek(10)  # back-seek
        assert mss.read_byte() == 10
        mss.seek_buffered_rev(1)
        assert mss.read_byte() == 10

    def test_eof(self):
        mss = MediaSourceStream(b"abc")
        with pytest.raises(EndOfStream):
            mss.read_bytes(4)
        # Reads of available bytes still work after the failed read.
        assert mss.read_bytes(3) == b"abc"

    def test_byte_len_and_ignore(self):
        mss = MediaSourceStream(bytes(1000))
        assert mss.byte_len() == 1000
        mss.ignore_bytes(999)
        assert mss.pos() == 999
        with pytest.raises(EndOfStream):
            mss.ignore_bytes(2)

    def test_large_window_compaction(self):
        data = np.arange(1 << 20, dtype=np.uint8).tobytes()
        mss = MediaSourceStream(data)
        mss.ignore_bytes(1 << 19)
        assert mss.read_byte() == data[1 << 19]

    def test_unseekable_forward_only(self):
        class FwdOnly(io.RawIOBase):
            def __init__(self, data):
                self._b = io.BytesIO(data)

            def read(self, n=-1):
                return self._b.read(n)

            def seekable(self):
                return False

        mss = MediaSourceStream(FwdOnly(bytes(range(100))))
        assert not mss.is_seekable()
        mss.seek(10)  # forward seek allowed via ignore
        assert mss.read_byte() == 10


class TestScopedAndMonitor:
    def test_scoped_limits(self):
        mss = MediaSourceStream(bytes(range(32)))
        ss = ScopedStream(mss, 8)
        assert ss.read_bytes(4) == bytes([0, 1, 2, 3])
        assert ss.bytes_available() == 4
        with pytest.raises(EndOfStream):
            ss.read_bytes(5)
        ss.ignore()
        assert mss.pos() == 8

    def test_monitor_feeds_crc(self):
        payload = b"123456789"
        ms = MonitorStream(BufReader(payload), Crc16())
        ms.read_bytes(9)
        # CRC-16/BUYPASS("123456789") = 0xFEE8
        assert ms.monitor.crc() == 0xFEE8


class TestBitReaderLtr:
    def test_read_bits(self):
        r = BitReaderLtr(b"\xA9\x53")  # 1010 1001 0101 0011
        assert r.read_bits(1) == 1
        assert r.read_bits(3) == 0b010
        assert r.read_bits(4) == 0b1001
        assert r.read_bits(8) == 0x53

    def test_read_bits_64(self):
        data = bytes(range(1, 17))
        r = BitReaderLtr(data)
        assert r.read_bits(64) == int.from_bytes(data[:8], "big")
        assert r.read_bits(4) == 0x0
        assert r.read_bits(60) == int.from_bytes(data[8:16], "big") & ((1 << 60) - 1)

    def test_signed(self):
        r = BitReaderLtr(b"\xF0")
        assert r.read_bits_signed(4) == -1
        assert r.read_bits_signed(4) == 0

    def test_unary_zeros(self):
        # 0b00010000 -> 3 zeros then 1; remaining 0000
        r = BitReaderLtr(b"\x10\x01")
        assert r.read_unary_zeros() == 3
        # remaining bits: 0000 0000 0001 -> 11 zeros
        assert r.read_unary_zeros() == 11

    def test_unary_ones(self):
        r = BitReaderLtr(b"\xE0")  # 111 0 0000
        assert r.read_unary_ones() == 3

    def test_ignore_and_align(self):
        r = BitReaderLtr(bytes([0xFF, 0x00, 0xAB]))
        r.read_bits(3)
        r.realign()
        assert r.read_bits(8) == 0x00
        r.ignore_bits(4)
        assert r.read_bits(4) == 0xB

    def test_random_vs_manual(self):
        rng = random.Random(1234)
        data = bytes(rng.randrange(256) for _ in range(64))
        bitstr = "".join(f"{b:08b}" for b in data)
        r = BitReaderLtr(data)
        pos = 0
        for _ in range(100):
            n = rng.randrange(1, 25)
            if pos + n > len(bitstr):
                break
            expect = int(bitstr[pos : pos + n], 2)
            assert r.read_bits(n) == expect
            pos += n


class TestBitReaderRtl:
    def test_read_bits(self):
        # LSB-first: byte 0xA9 = bits 1,0,0,1,0,1,0,1 in read order
        r = BitReaderRtl(b"\xA9\x53")
        assert r.read_bits(1) == 1
        assert r.read_bits(3) == 0b100  # next bits (0,0,1) -> value 0b100
        assert r.read_bits(4) == 0xA
        assert r.read_bits(8) == 0x53

    def test_cross_byte(self):
        r = BitReaderRtl(b"\xFF\x01")
        assert r.read_bits(12) == 0x1FF

    def test_unary_ones(self):
        r = BitReaderRtl(b"\x07")  # LSB-first: 1,1,1,0,...
        assert r.read_unary_ones() == 3

    def test_random_vs_manual(self):
        rng = random.Random(99)
        data = bytes(rng.randrange(256) for _ in range(64))
        val = int.from_bytes(data, "little")
        r = BitReaderRtl(data)
        pos = 0
        for _ in range(100):
            n = rng.randrange(1, 25)
            if pos + n > len(data) * 8:
                break
            expect = (val >> pos) & ((1 << n) - 1)
            assert r.read_bits(n) == expect
            pos += n

    def test_read_bits_array_matches_loop(self):
        """Vectorized fixed-width reads: value- and state-identical to
        the sequential loop at arbitrary bit phases, both above and
        below the unpackbits threshold."""
        import numpy as np

        rng = random.Random(7)
        data = bytes(rng.randrange(256) for _ in range(600))
        for lead in (0, 1, 3, 7, 11):
            for width in (1, 5, 9, 16):
                for count in (0, 3, 31, 40, 257):
                    a = BitReaderRtl(data)
                    b = BitReaderRtl(data)
                    a.read_bits(lead) if lead else None
                    b.read_bits(lead) if lead else None
                    got = a.read_bits_array(width, count)
                    expect = [b.read_bits(width) for _ in range(count)]
                    assert got.tolist() == expect, (lead, width, count)
                    assert a.bits_read() == b.bits_read()
                    # Subsequent reads agree (reader state re-anchored).
                    if a.bits_left() >= 13:
                        assert a.read_bits(13) == b.read_bits(13)

    def test_read_bits_array_end_of_stream(self):
        from symphonia_tpu.core.errors import EndOfStream

        r = BitReaderRtl(b"\x01\x02\x03")
        with pytest.raises(EndOfStream):
            r.read_bits_array(5, 2000)
        r2 = BitReaderRtl(bytes(range(100)))
        with pytest.raises(EndOfStream):
            r2.read_bits_array(16, 51)  # 816 bits > 800


class TestCodebook:
    def test_simple_decode(self):
        # codes: 0 (len1)->A, 10 (len2)->B, 11 (len2)->C
        cb = Codebook.from_codes([0b0, 0b10, 0b11], [1, 2, 2], [65, 66, 67])
        r = BitReaderLtr(b"\x4F")  # 0 10 0 11 11
        assert cb.decode_ltr(r) == 65
        assert cb.decode_ltr(r) == 66
        assert cb.decode_ltr(r) == 65
        assert cb.decode_ltr(r) == 67
        assert cb.decode_ltr(r) == 67

    def test_canonical_from_lengths(self):
        # Vorbis spec example: lengths [2,4,4,4,4,2,3,3]
        cb = Codebook.from_lengths_canonical([2, 4, 4, 4, 4, 2, 3, 3])
        got = {v: (c, l) for c, l, v in zip(cb.codes.tolist(), cb.lens.tolist(), cb.values.tolist())}
        assert got[0] == (0b00, 2)
        assert got[1] == (0b0100, 4)
        assert got[2] == (0b0101, 4)
        assert got[3] == (0b0110, 4)
        assert got[4] == (0b0111, 4)
        assert got[5] == (0b10, 2)
        assert got[6] == (0b110, 3)
        assert got[7] == (0b111, 3)

    def test_over_specified_raises(self):
        with pytest.raises(ValueError):
            Codebook.from_lengths_canonical([1, 1, 1])

    def test_under_specified_raises(self):
        with pytest.raises(ValueError):
            Codebook.from_lengths_canonical([1, 2, 4, 4, 4])

    def test_sparse_lengths(self):
        cb = Codebook.from_lengths_canonical([2, 0, 2, 2, 0, 2])
        assert len(cb) == 4
        assert sorted(cb.values.tolist()) == [0, 2, 3, 5]

    def test_lut_matches_tree(self):
        rng = random.Random(7)
        # Build a random prefix code via canonical assignment on lengths.
        # Kraft-complete length set (sums to exactly 1).
        lengths = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10]
        cb = Codebook.from_lengths_canonical(lengths)
        lut_val, lut_len, bb = cb.build_lut(block_bits=4)
        # decode a random bit string both ways
        data = bytes(rng.randrange(256) for _ in range(128))
        tree_syms = []
        r = BitReaderLtr(data)
        try:
            for _ in range(50):
                tree_syms.append(cb.decode_ltr(r))
        except (EndOfStream, ValueError):
            pass
        # LUT walk
        bitstr = "".join(f"{b:08b}" for b in data)
        lut_syms = []
        pos = 0
        while len(lut_syms) < len(tree_syms):
            base = 0
            while True:
                window = bitstr[pos : pos + bb].ljust(bb, "0")
                idx = int(window, 2)
                ln = int(lut_len[base + idx])
                val = int(lut_val[base + idx])
                if ln > 0:
                    lut_syms.append(val)
                    pos += ln
                    break
                elif ln == 0:
                    base = val
                    pos += bb
                else:
                    raise AssertionError("invalid prefix in LUT")
        assert lut_syms == tree_syms


class TestNegativeReads:
    """A corrupt size field reaching read_bytes/read_upto as a negative
    count must never walk the cursor backwards (it previously did:
    buf[pos:pos-5] is b'' and pos += -5)."""

    def test_mss_negative_read_bytes(self):
        from symphonia_tpu.core.errors import EndOfStream

        mss = MediaSourceStream(b"0123456789")
        mss.read_bytes(4)
        with pytest.raises(EndOfStream):
            mss.read_bytes(-5)
        assert mss.pos() == 4
        assert mss.read_upto(-3) == b""
        assert mss.pos() == 4

    def test_bufreader_negative_reads(self):
        from symphonia_tpu.core.errors import EndOfStream
        from symphonia_tpu.core.io.media_source import BufReader

        br = BufReader(b"0123456789")
        br.read_bytes(4)
        with pytest.raises(EndOfStream):
            br.read_bytes(-5)
        assert br.read_upto(-3) == b""
        assert br.read_bytes(2) == b"45"
