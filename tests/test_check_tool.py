"""tools/check.py conformance-tool tests, focused on the --ref cross mode
(symphonia-check main.rs:228-340 protocol; cross substitutes the in-tree
Python oracle decoders for the external binaries this environment lacks)."""

import struct
import pathlib
import sys

import numpy as np
import pytest

from symphonia_tpu.tools.check import run_check


@pytest.fixture(scope="module")
def m4a_aac(tmp_path_factory):
    sys.path.insert(0, "tests")
    from aac_builder import build_raw_block, random_quant_spectrum
    from test_mp4 import build_m4a

    rng = np.random.default_rng(2)
    frames = [build_raw_block([random_quant_spectrum(rng, 30, 44100)], [0],
                              30, 140, 44100) for _ in range(6)]
    p = tmp_path_factory.mktemp("check") / "a.m4a"
    p.write_bytes(build_m4a(frames, 44100, 1))
    return str(p)


@pytest.fixture(scope="module")
def m4a_alac(tmp_path_factory):
    sys.path.insert(0, "tests")
    from alac_builder import build_cookie, encode_frame_compressed
    from test_alac import signal
    from test_mp4 import atom, build_m4a_custom_entry, full_atom

    frame_len = 512
    ch = signal(frame_len * 4, 13)
    cookie_dict = dict(frame_length=frame_len, bit_depth=16, pb=40, mb=10,
                       kb=14)
    frames = [encode_frame_compressed(
        [ch[0][i * frame_len:(i + 1) * frame_len]], cookie_dict, order=2)
        for i in range(4)]
    cookie = build_cookie(frame_len, 16, 1, 44100)
    entry = atom(b"alac",
                 b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
                 + struct.pack(">HH", 1, 16) + b"\x00" * 4
                 + struct.pack(">I", 44100 << 16)
                 + full_atom(b"alac", cookie))
    p = tmp_path_factory.mktemp("check") / "a_alac.m4a"
    p.write_bytes(build_m4a_custom_entry(frames, entry, rate=44100,
                                         samples_per_frame=frame_len))
    return str(p)


class TestCrossMode:
    def test_aac_auto_routes_to_cross_and_passes(self, m4a_aac, capsys):
        assert run_check(m4a_aac, quiet=True) == 0
        out = capsys.readouterr().out
        assert "PASS" in out

    def test_alac_cross_bit_exact(self, m4a_alac, capsys):
        assert run_check(m4a_alac, ref_name="cross") == 0
        out = capsys.readouterr().out
        assert "abs max delta:    0.000e+00" in out

    def test_cross_detects_divergence(self, m4a_alac, monkeypatch):
        # Corrupt the native path only: cross must FAIL when the two
        # implementations disagree.
        from symphonia_tpu import native

        real = native.alac_decode

        def corrupt(*a, **k):
            out = real(*a, **k)
            if out is not None and out.size:
                out = out.copy()
                out[0, 0] += 1000
            return out

        monkeypatch.setattr(native, "alac_decode", corrupt)
        assert run_check(m4a_alac, ref_name="cross", quiet=True) == 2

    def test_oracle_path_actually_engaged(self, m4a_aac, monkeypatch):
        # native.disabled() must really force the Python decoders: a
        # native wrapper that records calls sees none inside the context.
        from symphonia_tpu import native

        calls = []
        orig = native._load

        def spy():
            r = orig()
            if r is not None:
                calls.append(1)
            return r

        monkeypatch.setattr(native, "_load", spy)
        with native.disabled():
            assert native._load() is None
            data = pathlib.Path(m4a_aac).read_bytes()
            from symphonia_tpu.tools.check import our_decode

            our_decode(data, gapless=False)
        assert not calls
