"""Tests for audio buffers, sample conversion, channels, units, checksums."""

import numpy as np
import pytest

from symphonia_tpu.core.audio import (
    AudioBuffer,
    AudioSpec,
    Channels,
    Position,
    SampleFormat,
    float_to_int,
    int_to_float,
)
from symphonia_tpu.core.checksum import Crc8, Crc16, Crc32, Md5, crc32_buf
from symphonia_tpu.core.units import Time, TimeBase


class TestUnits:
    def test_timebase_roundtrip(self):
        tb = TimeBase(1, 44100)
        t = tb.calc_time(44100 * 3 + 22050)
        assert t.seconds == 3
        assert abs(t.frac - 0.5) < 1e-9
        assert tb.calc_timestamp(t) == 44100 * 3 + 22050

    def test_timebase_non_unit(self):
        tb = TimeBase(1001, 30000)  # NTSC-ish
        t = tb.calc_time(30000)
        assert abs(t.to_seconds() - 1001.0) < 1e-9


class TestChannels:
    def test_counts(self):
        assert Channels.from_count(1).count == 1
        assert Channels.from_count(2).count == 2
        assert Channels.from_count(6).count == 6
        assert Channels.from_count(12).count == 12  # discrete fallback
        assert Channels.positioned(Position.STEREO).count == 2


class TestChecksums:
    def test_crc8_flac(self):
        # CRC-8 poly 0x07 check value for "123456789" is 0xF4
        c = Crc8()
        c.process(b"123456789")
        assert c.crc() == 0xF4

    def test_crc16_buypass(self):
        c = Crc16()
        c.process(b"123456789")
        assert c.crc() == 0xFEE8

    def test_crc32_ogg(self):
        # CRC-32/POSIX-style MSB-first poly 0x04C11DB7 init 0 xorout 0:
        # check value for "123456789" is 0x89A1897F (CRC-32/MPEG-2 without
        # init 0xFFFFFFFF and no final xor) -- the OGG page CRC.
        assert crc32_buf(b"123456789") == 0x89A1897F

    def test_md5(self):
        m = Md5()
        m.process(b"abc")
        assert m.hexdigest() == "900150983cd24fb0d6963f7d28e17f72"


class TestConversion:
    def test_int_float_roundtrip_16(self):
        x = np.array([-32768, -1, 0, 1, 32767], dtype=np.int32)
        f = int_to_float(x, 16)
        assert f[0] == -1.0
        assert abs(f[4] - (32767 / 32768)) < 1e-7
        back = float_to_int(f, 16)
        np.testing.assert_array_equal(back, x)

    def test_float_to_int_clamps(self):
        f = np.array([-1.5, 1.5], dtype=np.float32)
        y = float_to_int(f, 16)
        assert y[0] == -32768
        assert y[1] == 32767


class TestAudioBuffer:
    def _buf(self):
        spec = AudioSpec(44100, Channels.from_count(2))
        data = np.array([[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]], dtype=np.int32)
        return AudioBuffer.from_array(data, spec, bits_per_sample=16)

    def test_interleave(self):
        buf = self._buf()
        inter = buf.copy_to_interleaved(SampleFormat.S16)
        np.testing.assert_array_equal(
            inter, np.array([0, 5, 1, 6, 2, 7, 3, 8, 4, 9], dtype=np.int16)
        )

    def test_trim(self):
        buf = self._buf()
        buf.trim(1, 2)
        np.testing.assert_array_equal(buf.chan(0), [1, 2])
        np.testing.assert_array_equal(buf.chan(1), [6, 7])

    def test_float_export(self):
        buf = self._buf()
        f = buf.to_float()
        assert f.dtype == np.float32
        assert abs(f[1][0] - 5 / 32768) < 1e-7

    def test_u8_export(self):
        buf = self._buf()
        u8 = buf.copy_to_planar(SampleFormat.U8)
        assert u8.dtype == np.uint8
        assert u8[0][0] == 128

    def test_shift_silence(self):
        spec = AudioSpec(8000, Channels.from_count(1))
        buf = AudioBuffer(spec, 10, dtype=np.float32)
        buf.render_silence(4)
        assert len(buf) == 4
        buf.shift(2)
        assert len(buf) == 2


class TestResampler:
    def test_oneshot_rate_conversion(self):
        from symphonia_tpu.tools.resample import resample

        t = np.arange(44100, dtype=np.float64) / 44100
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None, :]
        y = resample(x, 44100, 48000)
        assert abs(y.shape[1] - 48000) <= 2
        # The 440 Hz tone must survive: compare against a direct synthesis.
        t2 = np.arange(y.shape[1], dtype=np.float64) / 48000
        ref = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
        n = y.shape[1]
        err = np.abs(y[0, 500 : n - 500] - ref[500 : n - 500]).max()
        assert err < 1e-3

    def test_streaming_matches_oneshot(self):
        from symphonia_tpu.tools.resample import Resampler, resample

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 30000)).astype(np.float32) * 0.3
        whole = resample(x, 44100, 22050)
        rs = Resampler(44100, 22050, 2)
        outs = [rs.process(x[:, i : i + 4096]) for i in range(0, 30000, 4096)]
        outs.append(rs.flush())
        stream = np.concatenate(outs, axis=1)
        n = min(whole.shape[1], stream.shape[1])
        # Ignore filter edges at the chunk-join margins' scale.
        err = np.abs(stream[:, 300 : n - 300] - whole[:, 300 : n - 300]).max()
        assert err < 5e-3

    def test_identity(self):
        from symphonia_tpu.tools.resample import Resampler

        rs = Resampler(48000, 48000, 1)
        x = np.ones((1, 100), np.float32)
        assert rs.process(x).shape == (1, 100)


class TestDitherModes:
    """Rectangular vs triangular dither (conv.rs:147-270): both are
    mean-unbiased; the rectangular error is one uniform LSB (quantized
    output spans exactly two codes for an inter-level input) while the
    triangular error is the sum of two uniforms (wider support, peaked)."""

    def test_distributions(self):
        # Input sits exactly 0.25 LSB above code 100 at 16-bit.
        x = np.full(20000, 100.25 / 32768.0, dtype=np.float32)
        rect = float_to_int(x, 16, dither=np.random.default_rng(7),
                            dither_mode="rectangular")
        tri = float_to_int(x, 16, dither=np.random.default_rng(7),
                           dither_mode="triangular")
        # Rectangular: error support is 1 LSB -> only codes {100, 101};
        # P(101) = 0.25.
        assert set(np.unique(rect)) == {100, 101}
        assert abs(np.mean(rect == 101) - 0.25) < 0.02
        # Triangular: 2-LSB support reaches codes 99 and/or 101+ tails.
        assert len(np.unique(tri)) >= 3
        # Both are mean-unbiased around the true value.
        assert abs(rect.mean() - 100.25) < 0.02
        assert abs(tri.mean() - 100.25) < 0.02
        # Triangular error variance ~1/6 + 1/12 (quantizer), rectangular
        # lower; just check ordering.
        assert tri.astype(float).var() > rect.astype(float).var()

    def test_mode_validation_and_export_path(self):
        from symphonia_tpu.core.audio import (AudioBuffer, AudioSpec,
                                              Channels, SampleFormat)

        with pytest.raises(ValueError):
            float_to_int(np.zeros(4, np.float32), 16,
                         dither=np.random.default_rng(0), dither_mode="bad")
        spec = AudioSpec(8000, Channels.from_count(1))
        buf = AudioBuffer.from_array(
            np.full((1, 256), 100.25 / 32768.0, np.float32), spec)
        out = buf.copy_to_interleaved(SampleFormat.S16,
                                      dither=np.random.default_rng(3),
                                      dither_mode="rectangular")
        assert set(np.unique(out)) == {100, 101}


class TestF64ExportPrecision:
    def test_f64_planes_export_exactly(self):
        # F64 content exported to F64 must not round-trip through f32.
        rng = np.random.default_rng(3)
        d = rng.standard_normal((1, 64)) * 1e-9 + 0.123456789012345
        buf = AudioBuffer.from_array(d.copy(), AudioSpec(8000, Channels.from_count(1)))
        out = buf.copy_to_planar(SampleFormat.F64)
        np.testing.assert_array_equal(out, d)
        inter = buf.copy_to_interleaved(SampleFormat.F64)
        np.testing.assert_array_equal(inter, d[0])

    def test_int_to_f64_keeps_precision(self):
        x = np.array([[12345678]], dtype=np.int32)  # 24-bit content
        buf = AudioBuffer.from_array(x, AudioSpec(8000, Channels.from_count(1)),
                                     bits_per_sample=24)
        out = buf.copy_to_planar(SampleFormat.F64)
        assert out.dtype == np.float64
        assert out[0, 0] == 12345678 / (1 << 23)
