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
            a = native_packed[key]
            b = py_packed[key]
            if key == "res":
                # The native allocator pads 4KiB-multiple rows by 16 columns
                # (store-buffer anti-aliasing, native.py); compare the
                # oracle's width.
                a = a[:, : b.shape[1]]
            np.testing.assert_array_equal(a, b, err_msg=key)
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
        ref = py_packed["res"]
        np.testing.assert_array_equal(
            packed["res"][: ref.shape[0], : ref.shape[1]], ref)

    def test_batch_decode_bit_exact(self):
        data, ch = self._spiky_file()
        from symphonia_tpu.batch import decode_bytes

        out = decode_bytes(data)
        np.testing.assert_array_equal(out.samples[0], ch[0].astype(np.int32))


class TestSimdExtract:
    """AVX-512 8-lane extraction must be bit-identical to the scalar path
    across subframe types, stereo modes, bit depths, and partition shapes."""

    def _cases(self):
        from flac_builder import build_flac_file, random_walk

        yield build_flac_file(random_walk(30000, 16, seed=11, ch=2),
                              block_size=1024, stereo_mode="left_side",
                              kind="fixed", order=3, partition_order=2)
        yield build_flac_file(random_walk(20000, 16, seed=12, ch=2),
                              block_size=4096, stereo_mode="mid_side",
                              kind="lpc", order=8,
                              lpc_coefs=[90, -30, 12, 5, -3, 2, -1, 1],
                              lpc_shift=6, partition_order=3)
        yield build_flac_file(random_walk(9000, 24, seed=13, ch=1),
                              bps=24, block_size=512, kind="lpc", order=4,
                              lpc_coefs=[120, -60, 20, -5], lpc_shift=6,
                              partition_order=1)
        x = np.zeros(4096 * 3, dtype=np.int64)
        x[97::311] = 2000
        x[150::401] = -1500
        yield build_flac_file([x], block_size=4096, kind="fixed", order=0,
                              partition_order=2)  # long unary runs
        yield build_flac_file(random_walk(5000, 8, seed=14, ch=1), bps=8,
                              block_size=256, kind="verbatim")

    def test_matches_scalar(self):
        lib = native._load()
        if lib is None or not lib.sh_flac_has_simd():
            pytest.skip("AVX-512 unavailable")
        for data in self._cases():
            reader = FlacReader(MediaSourceStream(data))
            si = reader.stream_info
            reader._ensure_scan()
            starts = np.asarray(reader._frame_starts, np.int64)
            buf = reader._buf
            sizes = np.diff(np.append(starts, len(buf))).astype(np.int64)
            a = native.flac_extract(buf, starts, sizes, si, si.block_len_max,
                                    use_simd=False)
            a = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in a.items()}
            b = native.flac_extract(buf, starts, sizes, si, si.block_len_max,
                                    use_simd=True)
            for k in ["res", "coefs", "order", "shift", "wasted", "block",
                      "assign", "bps", "status"]:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_fast_scan_and_extract(self):
        lib = native._load()
        if lib is None or not lib.sh_flac_has_simd():
            pytest.skip("AVX-512 unavailable")
        for data in self._cases():
            reader = FlacReader(MediaSourceStream(data))
            si = reader.stream_info
            reader._ensure_scan()
            buf = reader._buf
            packed = native.flac_fast_extract(
                buf, si, si.block_len_max, len(reader._frame_starts) + 8)
            assert packed is not None
            assert packed["F"] == len(reader._frame_starts)
            np.testing.assert_array_equal(packed["offsets"],
                                          reader._frame_starts)
            assert (packed["status"] == 0).all()
            out = decode_packed(packed)
            assert out.shape[0] == packed["F"]


class TestSimdEngineParity:
    """The AVX-512 gather engine (n_frames >= 8) must be bit-identical to
    the interleaved scalar engine across content shapes. The engine choice
    is cached per process, so each runs in a subprocess."""

    def test_engines_bit_identical(self, tmp_path):
        import os
        import subprocess
        import sys as _sys

        gen = tmp_path / "gen.py"
        gen.write_text(
            """
import sys, os, pickle
sys.path.insert(0, %r); sys.path.insert(0, %r)
import numpy as np
from aac_builder import build_adts, build_raw_block, random_quant_spectrum
rng = np.random.default_rng(321)
cases = []
for case in range(6):
    nch = 2 if case %% 2 == 0 else 1
    frames = []
    for f in range(int(rng.integers(9, 24))):
        if case %% 3 == 2:
            seq = [0, 1, 2, 2, 3, 0][f %% 6]
            specs = [random_quant_spectrum(rng, 12, 44100, seq)
                     for _ in range(nch)]
            frames.append(build_raw_block(specs, [seq] * nch, 12, 140,
                                          44100, common_window=nch == 2))
        else:
            specs = []
            for c in range(nch):
                spec = np.zeros(1024, np.int64)
                idx = rng.choice(1000, 200, replace=False)
                spec[idx] = rng.integers(-300, 301, 200)
                specs.append(spec)
            frames.append(build_raw_block(specs, [0] * nch, 40, 140, 44100,
                                          common_window=nch == 2,
                                          ms_mask=int(rng.integers(2)) if nch == 2 else 0))
    cases.append((build_adts(frames, 44100, nch), nch))
pickle.dump(cases, open(sys.argv[1], "wb"))
"""
            % (str(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
               str(os.path.dirname(os.path.abspath(__file__))))
        )
        run = tmp_path / "run.py"
        run.write_text(
            """
import sys, os, pickle
sys.path.insert(0, %r); sys.path.insert(0, %r)
import numpy as np
from symphonia_tpu import native
from symphonia_tpu.codecs.aac import subband_info
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.adts import AdtsReader
cases = pickle.load(open(sys.argv[1], "rb"))
outs = {}
for i, (adts, ch) in enumerate(cases):
    r = AdtsReader(MediaSourceStream(adts))
    pkts = []
    while True:
        p = r.next_packet()
        if p is None:
            break
        pkts.append(bytes(p.data))
    buf = b"".join(pkts)
    sizes = np.array([len(p) for p in pkts], np.int64)
    offs = np.zeros(len(pkts), np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    ri, bl, bs = subband_info(44100)
    o = native.aac_extract(buf, offs, sizes, ri, bl, bs, ch)
    # Handoff lanes carry quants; compare reconstructed coefficients (the
    # host twin of the device dequant). Raw qbuf/scales hold pooled
    # garbage outside coded regions, so they are covered via the
    # reconstruction rather than compared bytewise.
    o = dict(o)
    o["coeffs"] = native.aac_dequant_host(o, bl)
    for k, v in o.items():
        if k in ("qbuf", "scales"):
            continue
        if isinstance(v, np.ndarray):
            outs["c%%d_%%s" %% (i, k)] = v.copy()
np.savez(sys.argv[2], **outs)
"""
            % (str(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
               str(os.path.dirname(os.path.abspath(__file__))))
        )
        import numpy as np

        from symphonia_tpu import native

        if not native.available():
            import pytest

            pytest.skip("native library unavailable")
        cases = tmp_path / "cases.pkl"
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        subprocess.run([_sys.executable, str(gen), str(cases)], check=True,
                       env=env)
        a = tmp_path / "simd.npz"
        b = tmp_path / "ilp.npz"
        subprocess.run([_sys.executable, str(run), str(cases), str(a)],
                       check=True, env=env)
        env["SYMPHONIA_TPU_AAC_ENGINE"] = "ilp"
        subprocess.run([_sys.executable, str(run), str(cases), str(b)],
                       check=True, env=env)
        da, db = np.load(a), np.load(b)
        assert set(da.keys()) == set(db.keys())
        for k in da.keys():
            assert np.array_equal(da[k], db[k]), k


class TestCodebookAssignNative:
    """sh_codebook_assign must agree with the Python branch-splitting loop
    on codes AND accept/reject decisions across random valid and invalid
    length sets (it replaces the loop at every Vorbis decoder open)."""

    def _python_assign(self, lengths):
        # The Python loop, extracted verbatim semantics from
        # Codebook.from_lengths_canonical's fallback path.
        used = []
        available = [0] * 33
        first = True
        for val, ln in enumerate(lengths):
            if ln == 0:
                continue
            if not 1 <= ln <= 32:
                return ("invalid", None)
            if first:
                code_aligned = 0
                for j in range(1, ln + 1):
                    available[j] = 1 << (32 - j)
                first = False
            else:
                y = ln
                while y > 0 and available[y] == 0:
                    y -= 1
                if y == 0:
                    return ("over", None)
                code_aligned = available[y]
                available[y] = 0
                for j in range(y + 1, ln + 1):
                    available[j] = code_aligned + (1 << (32 - j))
            used.append((code_aligned >> (32 - ln), ln, val))
        if len(used) > 1 and any(available[1:]):
            return ("under", None)
        return ("ok", used)

    def test_agreement(self):
        import random

        import numpy as np

        from symphonia_tpu import native

        if native.codebook_assign(np.asarray([1, 1], np.int32)) is None:
            pytest.skip("native library unavailable")
        rng = random.Random(3)

        def random_valid(max_depth=14):
            leaves = []

            def grow(d):
                if len(leaves) > 400:
                    leaves.append(d)
                    return
                if d >= max_depth or (d > 0 and rng.random() < 0.4):
                    leaves.append(d)
                else:
                    grow(d + 1)
                    grow(d + 1)

            grow(0)
            if len(leaves) == 1:
                leaves = [1, 1]
            rng.shuffle(leaves)
            out = []
            for L in leaves:
                while rng.random() < 0.15:
                    out.append(0)
                out.append(L)
            return out

        cases = [random_valid() for _ in range(300)]
        # Invalid/edge sets: random garbage, over/under-specified, empties.
        nrng = np.random.default_rng(4)
        for _ in range(300):
            n = int(nrng.integers(1, 50))
            cases.append(nrng.integers(0, 12, size=n).tolist())
        cases += [[], [0, 0, 0], [5], [0, 7, 0], [1, 1, 1], [2, 1],
                  [33], [1, 40, 1]]
        for lengths in cases:
            status, used = self._python_assign(lengths)
            got = native.codebook_assign(np.asarray(lengths, np.int32))
            codes, st = got
            want_st = {"ok": 0, "over": 1, "under": 2, "invalid": 3}[status]
            assert st == want_st, (lengths, status, st)
            if status == "ok":
                for code, ln, val in used:
                    assert codes[val] == code, (lengths, val)
