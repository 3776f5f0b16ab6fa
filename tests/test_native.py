"""Native host library tests: CRCs and the FLAC scan/extract paths must
agree exactly with the Python oracles."""

import numpy as np
import pytest

from symphonia_tpu import native
from symphonia_tpu.codecs.flac import parse_frame
from symphonia_tpu.core.checksum import crc16_buf
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.flac import FlacReader
from symphonia_tpu.ops.flac_dense import decode_packed, pack_parsed_frames

from flac_builder import build_flac_file, random_walk

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestCrc:
    def test_crc16_matches_python(self):
        rng = np.random.default_rng(0)
        for n in [0, 1, 9, 100, 4096]:
            data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            assert native.crc16(data) == crc16_buf(data)


class TestFlacScan:
    def _file(self, **kw):
        ch = random_walk(8192, 16, seed=5, ch=2)
        return build_flac_file(ch, block_size=1024, stereo_mode="mid_side",
                               kind="lpc", lpc_coefs=[800, -400, 100],
                               lpc_shift=10, lpc_precision=12, **kw), ch

    def test_scan_matches_python(self):
        data, _ = self._file()
        reader = FlacReader(MediaSourceStream(data))
        # Force the python scan for comparison.
        from symphonia_tpu.formats import flac as flac_fmt

        reader._ensure_scan()
        buf = reader._buf
        si = reader.stream_info
        got = native.flac_scan_frames(buf, si)
        np.testing.assert_array_equal(got, reader._frame_starts)

    def test_extract_matches_python_and_decodes(self):
        data, ch = self._file()
        reader = FlacReader(MediaSourceStream(data))
        table = reader.packet_table()
        si = reader.stream_info
        frames = [parse_frame(p, si) for p in table.data]
        py_packed = pack_parsed_frames(frames)

        buf = reader._buf
        native_packed = native.flac_extract(
            buf, reader._frame_starts,
            np.asarray([len(p) for p in table.data], dtype=np.int64),
            si, py_packed["n_max"],
        )
        assert native_packed is not None
        assert (native_packed["status"] == 0).all()
        for key in ["res", "coefs", "order", "shift", "wasted", "block",
                    "assign", "bps"]:
            np.testing.assert_array_equal(native_packed[key], py_packed[key],
                                          err_msg=key)
        out = decode_packed(native_packed)
        pcm = np.concatenate(
            [out[i, :, : frames[i].header.block_size] for i in range(len(frames))],
            axis=1,
        )
        np.testing.assert_array_equal(pcm, np.stack(ch).astype(np.int32))


class TestLongUnaryRuns:
    """Regression: sparse-spike residuals make the encoder pick a tiny Rice
    parameter, producing unary runs longer than one 64-bit window. The
    windowed bit reader must advance only over bits it actually examined
    (low bits of an alignment-shifted window are padding, not stream)."""

    def _spiky_file(self):
        n = 4096 * 4
        x = np.zeros(n, dtype=np.int64)
        x[97::311] = 2000            # rare large spikes, mostly zeros
        x[150::401] = -1500
        data = build_flac_file([x], block_size=4096, kind="fixed", order=0,
                               partition_order=2)
        return data, [x]

    def test_stream_extract_recovers_all_frames(self):
        if not native.available():
            pytest.skip("native lib unavailable")
        data, ch = self._spiky_file()
        reader = FlacReader(MediaSourceStream(data))
        si = reader.stream_info
        reader._ensure_scan()
        buf = reader._buf
        packed = native.flac_stream_extract(buf, si, 4096, 64)
        assert packed is not None
        assert packed["F"] == len(reader._frame_starts)
        np.testing.assert_array_equal(packed["offsets"], reader._frame_starts)
        table = reader.packet_table()
        frames = [parse_frame(p, si) for p in table.data]
        py_packed = pack_parsed_frames(frames)
        np.testing.assert_array_equal(packed["res"][: py_packed["res"].shape[0]],
                                      py_packed["res"])

    def test_batch_decode_bit_exact(self):
        data, ch = self._spiky_file()
        from symphonia_tpu.batch import decode_bytes

        out = decode_bytes(data)
        np.testing.assert_array_equal(out.samples[0], ch[0].astype(np.int32))
