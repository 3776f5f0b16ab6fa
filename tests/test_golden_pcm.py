"""Golden PCM anchors for the fixture corpus (VERDICT r4 #4).

`check --ref cross` decodes through two engines that still share the
``symphonia_tpu/data/*.npz`` constant tables, so a table-generation bug
would pass it. MP3/Vorbis/ADPCM are anchored externally by the SDL
oracle (tools/check.py); AAC and ALAC were not. This corpus pins the
full decoded PCM of one deterministic fixture per codec family in
``tests/golden_pcm.npz`` — generated ONCE at a reviewed point and
committed — so any change to a shipped table, a generator, or a decode
path that shifts output beyond the conformance tolerance fails CI.

Comparison protocol: integer outputs (FLAC/ALAC/ADPCM/PCM) must be
bit-exact; float outputs compare at the check-tool protocol
(|delta| <= 1e-5) so legitimate ulp-level reassociation from XLA
tiling/fusion changes does not churn the anchor.

Regenerate (only with a reviewed reason — this file is the anchor):

    python tests/test_golden_pcm.py --regen
"""

import os
import struct
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
sys.path.insert(0, str(HERE.parent))

GOLDEN = HERE / "golden_pcm.npz"
_PYGAME_DATA = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data"
# Real-media entries are capped so the committed anchor stays small; the
# head of the stream exercises every decode stage.
CAP = 32768


def _build_alac_caf() -> bytes:
    """ALAC (compressed frames, order-2 predictor) in a CAF container —
    mirrors the construction in test_alac.test_alac_in_caf."""
    from alac_builder import build_cookie, encode_frame_compressed

    from test_alac import signal

    frame_len = 512
    ch = signal(frame_len * 4, seed=106)
    cookie_dict = dict(frame_length=frame_len, bit_depth=16, pb=40, mb=10,
                       kb=14)
    frames = [
        encode_frame_compressed(
            [ch[0][i * frame_len:(i + 1) * frame_len]], cookie_dict, order=2)
        for i in range(4)
    ]
    cookie_bytes = build_cookie(frame_len, 16, 1, 44100)
    desc = struct.pack(">d", 44100.0) + b"alac" + struct.pack(
        ">IIIII", 0, 0, frame_len, 1, 16)
    pakt_body = struct.pack(">qqii", len(frames), len(frames) * frame_len,
                            0, 0)
    for f in frames:
        n = len(f)
        varint = bytearray()
        while True:
            varint.insert(0, n & 0x7F)
            n >>= 7
            if not n:
                break
        for i in range(len(varint) - 1):
            varint[i] |= 0x80
        pakt_body += bytes(varint)
    payload = b"".join(frames)
    data = b"caff" + struct.pack(">HH", 1, 0)
    data += b"desc" + struct.pack(">q", len(desc)) + desc
    data += b"kuki" + struct.pack(">q", len(cookie_bytes)) + cookie_bytes
    data += b"pakt" + struct.pack(">q", len(pakt_body)) + pakt_body
    data += (b"data" + struct.pack(">q", len(payload) + 4)
             + struct.pack(">I", 0) + payload)
    return data


def corpus() -> dict:
    """One deterministic fixture per codec family, keyed by family name.
    Every entry decodes through the public ``batch.decode_bytes``."""
    from aac_builder import build_adts, build_raw_block, random_quant_spectrum
    from flac_builder import build_flac_file, random_walk
    from mp3_builder import build_mpeg1_l3_stream

    from test_adpcm import ima_encode, make_adpcm_wav, ms_encode, smooth_signal
    from test_layer12 import _rand_l2_frame
    from test_wav_pcm import make_wav

    entries = {}

    ch = random_walk(8192, 16, seed=101, ch=2)
    entries["flac"] = build_flac_file(
        ch, block_size=1024, stereo_mode="mid_side", kind="lpc",
        lpc_coefs=[900, -500, 120], lpc_shift=10)

    entries["mp3_mpeg1_stereo"] = build_mpeg1_l3_stream(8, n_ch=2, seed=102)
    with open(os.path.join(_PYGAME_DATA, "house_lo.mp3"), "rb") as f:
        entries["mp3_real"] = f.read()
    with open(os.path.join(_PYGAME_DATA, "house_lo.ogg"), "rb") as f:
        entries["vorbis_real"] = f.read()

    rng = np.random.default_rng(103)
    frames = [build_raw_block([random_quant_spectrum(rng, 40, 44100)], [0],
                              40, 140, 44100) for _ in range(6)]
    entries["aac_44k_mono"] = build_adts(frames, 44100, 1)
    rng = np.random.default_rng(104)
    frames = [build_raw_block([random_quant_spectrum(rng, 40, 48000),
                               random_quant_spectrum(rng, 40, 48000)],
                              [0, 0], 40, 140, 48000) for _ in range(6)]
    entries["aac_48k_stereo"] = build_adts(frames, 48000, 2)

    entries["alac_caf"] = _build_alac_caf()

    sig = smooth_signal(4000, 105)
    payload, ba = ima_encode(sig)
    entries["adpcm_ima"] = make_adpcm_wav(payload, 0x11, ba, 505, len(sig))
    payload, ba = ms_encode(sig)
    entries["adpcm_ms"] = make_adpcm_wav(payload, 0x02, ba, 500, len(sig))

    l2_frames = [_rand_l2_frame(s)[0] for s in range(4)]
    entries["mp2"] = b"".join(l2_frames)

    rng = np.random.default_rng(107)
    pcm = rng.integers(-20000, 20000, size=(2048, 2)).astype(np.int64)
    entries["wav_s16"] = make_wav(pcm, rate=22050, fmt_tag=1, bits=16)

    return entries


def _decode(data: bytes):
    from symphonia_tpu import batch

    out = batch.decode_bytes(data)
    return np.asarray(out.samples)[:, :CAP], int(out.sample_rate)


class TestGoldenPcm:
    def test_corpus_matches_golden(self):
        assert GOLDEN.exists(), "run: python tests/test_golden_pcm.py --regen"
        with np.load(GOLDEN) as g:
            fixtures = corpus()
            golden_names = {k[: -len("__pcm")] for k in g.files
                            if k.endswith("__pcm")}
            # Adding/removing a family requires regenerating the anchor.
            assert golden_names == set(fixtures), (
                golden_names ^ set(fixtures))
            for name, data in fixtures.items():
                pcm, rate = _decode(data)
                ref = g[f"{name}__pcm"]
                assert rate == int(g[f"{name}__rate"]), name
                assert pcm.shape == ref.shape, name
                if ref.dtype.kind == "f":
                    np.testing.assert_allclose(
                        pcm, ref, atol=1e-5, rtol=0, err_msg=name)
                else:
                    assert pcm.dtype == ref.dtype, name
                    np.testing.assert_array_equal(pcm, ref, err_msg=name)


def _regen() -> None:
    out = {}
    for name, data in corpus().items():
        pcm, rate = _decode(data)
        out[f"{name}__pcm"] = pcm
        out[f"{name}__rate"] = np.int64(rate)
        print(f"{name}: shape={pcm.shape} dtype={pcm.dtype} rate={rate}")
    np.savez_compressed(GOLDEN, **out)
    print(f"wrote {GOLDEN} ({GOLDEN.stat().st_size} bytes)")


if __name__ == "__main__":
    if "--regen" not in sys.argv:
        sys.exit("usage: python tests/test_golden_pcm.py --regen")
    import jax

    jax.config.update("jax_platforms", "cpu")
    _regen()
