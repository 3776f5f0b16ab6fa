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
