"""ASAN replay: drive every native entropy stage over real, mirrored, and
mutated inputs WITHOUT importing jax (jaxlib's compiler aborts under a
preloaded ASAN runtime, and the dense stages contain no native code of ours
anyway). Run through tools/asan_fuzz.sh, which builds the instrumented .so
and sets SYMPHONIA_TPU_NATIVE_SO + LD_PRELOAD.

Any memory error aborts the process (ASAN_OPTIONS=abort_on_error=1), so a
zero exit code == ASAN-clean. Framework errors on mutated input are expected
and swallowed.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np

from symphonia_tpu import native
from symphonia_tpu.core.errors import Error
from symphonia_tpu.core.io import MediaSourceStream

PYGAME_DATA = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data"
N_MUTATION_ROUNDS = int(os.environ.get("ASAN_ROUNDS", "12"))
TRUNC_FRACS = (0.03, 0.2, 0.5, 0.85, 0.98)

_ERRS = (Error, ValueError, KeyError, IndexError, OverflowError,
         ZeroDivisionError, EOFError)


def _mutate(data: bytes, rng, n_flips: int) -> bytes:
    b = bytearray(data)
    for _ in range(n_flips):
        b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
    return bytes(b)


def _variants(data: bytes, seed: int):
    rng = np.random.default_rng(seed)
    yield data
    for _ in range(N_MUTATION_ROUNDS):
        yield _mutate(data, rng, int(rng.integers(1, 40)))
    for f in TRUNC_FRACS:
        yield data[: int(len(data) * f)]


def replay_flac() -> int:
    from flac_builder import build_flac_file, random_walk
    from test_fuzz import _build_order_gt_bs_flac
    from symphonia_tpu.formats.flac import FlacReader

    fixtures = [
        build_flac_file(random_walk(256 * 8, 16, seed=1, ch=2), bps=16,
                        block_size=256, stereo_mode="mid_side", kind="lpc",
                        lpc_coefs=[1205, -482], lpc_shift=10),
        build_flac_file(random_walk(512 * 4, 24, seed=2, ch=1), bps=24,
                        block_size=512, kind="fixed", order=3,
                        partition_order=2),
        build_flac_file([np.full(16 * 40, 3, np.int64)], bps=16,
                        block_size=16, kind="constant"),
        _build_order_gt_bs_flac(),
    ]
    n = 0
    for fi, clean in enumerate(fixtures):
        for data in _variants(clean, seed=100 + fi):
            try:
                reader = FlacReader(MediaSourceStream(data))
                si = reader.stream_info
                buf = data[reader._data_start:]
                if not buf or not si.block_len_max:
                    continue
                native.flac_fast_extract(buf, si, si.block_len_max,
                                         len(buf) // 8 + 16)
                offs = native.flac_scan_frames(buf, si)
                if len(offs):
                    sizes = np.empty(len(offs), np.int64)
                    sizes[:-1] = np.diff(offs)
                    sizes[-1] = len(buf) - offs[-1]
                    for simd in (False, True):
                        native.flac_extract(buf, offs, sizes, si,
                                            si.block_len_max, use_simd=simd)
                    # Per-packet full-frame decode (sh_flac_decode_frame).
                    for o, s in zip(offs[:8], sizes[:8]):
                        native.flac_decode_frame(buf[o : o + s], si,
                                                 verify_crc=True)
                # Single-pass demux+extract (sh_flac_stream_extract).
                native.flac_stream_extract(buf, si, si.block_len_max,
                                           len(buf) // 8 + 16)
                n += 1
            except _ERRS:
                pass
    return n


def replay_mp3() -> int:
    from mp3_builder import build_mpeg1_l3_stream  # mirror encoder
    from symphonia_tpu.core.formats import FormatOptions
    from symphonia_tpu.formats.mpa import MpaReader

    fixtures = [
        open(os.path.join(PYGAME_DATA, "house_lo.mp3"), "rb").read(),
        build_mpeg1_l3_stream(24, n_ch=2, seed=3),
    ]
    n = 0
    for fi, clean in enumerate(fixtures):
        for data in _variants(clean, seed=200 + fi):
            try:
                reader = MpaReader(MediaSourceStream(data), FormatOptions())
                native.mp3_extract(reader._buf, reader._offsets,
                                   reader._sizes,
                                   max_granules=2 * len(reader._offsets) + 2)
                # Per-packet stateful stream path (sh_mp3_stream_decode,
                # carried bit reservoir in C++) + the Python fallback on
                # frames the native walk rejects — same loop the
                # AudioDecoder runs.
                _per_packet_decode(reader)
                n += 1
            except _ERRS:
                pass
    return n


def _per_packet_decode(reader, max_pkts: int = 64) -> None:
    """Drive the real AudioDecoder per-packet over a reader's track —
    the same surface tools/play.py uses, native fast paths included."""
    import symphonia_tpu as sym

    track = reader.default_track()
    if track is None or track.codec_params is None:
        return
    dec = sym.get_codecs().make_audio_decoder(track.codec_params)
    for _ in range(max_pkts):
        pkt = reader.next_packet()
        if pkt is None:
            break
        try:
            dec.decode(pkt)
        except _ERRS:
            pass


def replay_l12() -> int:
    from test_layer12 import build_l1_frame, build_l2_frame
    from symphonia_tpu.codecs.mpa_layer12 import (QUANT_CLASS, SB_INFO,
                                                  SB_QUANT_INFO)
    from symphonia_tpu.core.formats import FormatOptions
    from symphonia_tpu.formats.mpa import MpaReader

    rng = np.random.default_rng(600)
    l1_frames = []
    for _ in range(4):
        # Keep within the fixed 448 kbps frame: 12 active subbands.
        allocs = [[int(rng.integers(2, 16)) if sb < 12 else 0
                   for sb in range(32)]]
        raws = [[[int(rng.integers(0, 1 << max(1, b - 1)))
                  for _ in range(12)] for b in allocs[0]]]
        sfi = [[int(rng.integers(0, 60)) for _ in range(32)]]
        l1_frames.append(build_l1_frame(raws, allocs, sfi)[0])
    sblimit, rows = SB_INFO[1]
    l2_frames = []
    for _ in range(4):
        alloc = [int(rng.integers(0, 4)) for _ in range(sblimit)]
        sf0 = [int(rng.integers(0, 60)) for _ in range(sblimit)]
        samples = {}
        for sb in range(sblimit):
            ci = alloc[sb]
            if not ci:
                continue
            _, _, grouping, bits, nlevels = QUANT_CLASS[
                SB_QUANT_INFO[rows[sb]][1][ci]]
            for gr in range(12):
                if grouping:
                    samples[(sb, gr)] = int(rng.integers(0, nlevels ** 3))
                else:
                    samples[(sb, gr)] = [int(rng.integers(0, nlevels))
                                         for _ in range(3)]
        l2_frames.append(build_l2_frame(alloc, sf0, samples)[0])
    # Stereo + MPEG2-LSF coverage for the fused per-packet entry
    # (sh_l12_stream_decode): the header-parameter matrix (n_ch x version)
    # is where a stride bug once hid in the MP3 twin.
    from test_layer12 import _rand_l2_frame

    l2_stereo = [_rand_l2_frame(601 + i, n_ch=2)[0] for i in range(3)]
    l2_mpeg2 = [_rand_l2_frame(604 + i, n_ch=2, mpeg2=True)[0]
                for i in range(3)]
    n = 0
    for fi, clean in enumerate((b"".join(l1_frames), b"".join(l2_frames),
                                b"".join(l2_stereo), b"".join(l2_mpeg2))):
        for data in _variants(clean, seed=600 + fi):
            try:
                reader = MpaReader(MediaSourceStream(data), FormatOptions())
                _per_packet_decode(reader)
                n += 1
            except _ERRS:
                pass
    return n


def replay_adpcm() -> int:
    from test_adpcm import make_adpcm_wav
    from symphonia_tpu.formats.wav import WavReader

    rng = np.random.default_rng(700)
    fixtures = []
    for tag, ba in ((0x02, 512), (0x11, 1024)):  # MS, IMA (mono)
        n_blocks = 6
        fpb = (ba - 7) * 2 + 2 if tag == 0x02 else (ba - 4) * 2 + 1
        payload = rng.integers(0, 256, size=ba * n_blocks,
                               dtype=np.uint8).tobytes()
        fixtures.append(make_adpcm_wav(payload, tag, ba, fpb,
                                       fpb * n_blocks))
    n = 0
    for fi, clean in enumerate(fixtures):
        for data in _variants(clean, seed=700 + fi):
            try:
                reader = WavReader(MediaSourceStream(data))
                _per_packet_decode(reader)
                n += 1
            except _ERRS:
                pass
    return n


def replay_aac() -> int:
    from aac_builder import build_adts, build_raw_block, random_quant_spectrum
    from symphonia_tpu.codecs.aac import AacDecoder

    import symphonia_tpu as sym

    rng = np.random.default_rng(17)
    frames = [
        build_raw_block([random_quant_spectrum(rng, 40, 44100)], [0], 40,
                        140, 44100)
        for _ in range(12)
    ]
    clean = build_adts(frames, 44100, 1)
    n = 0
    for data in _variants(clean, seed=300):
        try:
            probed = sym.get_probe().probe(MediaSourceStream(data))
            fmt = probed.format
            track = fmt.default_track()
            if track.codec_params.codec != "aac":
                continue
            dec = AacDecoder(track.codec_params)
            pkts = []
            while True:
                pkt = fmt.next_packet()
                if pkt is None:
                    break
                pkts.append(bytes(pkt.data))
            if not pkts:
                continue
            buf = b"".join(pkts)
            sizes = np.array([len(p) for p in pkts], np.int64)
            offs = np.zeros(len(pkts), np.int64)
            np.cumsum(sizes[:-1], out=offs[1:])
            native.aac_extract(buf, offs, sizes, dec.rate_idx,
                               dec.bands_long, dec.bands_short,
                               dec.spec.num_channels)
            # Full per-packet PCM path (entropy + IMDCT + OLA in C++).
            stream = native.aac_stream_open(
                dec.rate_idx, dec.bands_long, dec.bands_short,
                dec.spec.num_channels)
            if stream is not None and stream.has_pcm:
                delay = np.zeros((dec.spec.num_channels, 1024), np.float32)
                for p in pkts:
                    native.aac_stream_decode_pcm(stream, p, delay)
            n += 1
        except _ERRS:
            pass
    return n


def replay_vorbis() -> int:
    from symphonia_tpu.codecs.vorbis import VorbisDecoder
    from symphonia_tpu.formats.ogg import OggReader

    clean = open(os.path.join(PYGAME_DATA, "house_lo.ogg"), "rb").read()
    n = 0
    for data in _variants(clean, seed=400):
        try:
            reader = OggReader(MediaSourceStream(data))
            track = reader.default_track()
            if track.codec_params.codec != "vorbis":
                continue
            dec = VorbisDecoder(track.codec_params)
            pkts = []
            while True:
                pkt = reader.next_packet()
                if pkt is None:
                    break
                pkts.append(bytes(pkt.data))
            if pkts:
                native.vorbis_decode_spectra(dec, pkts)
                # Full per-packet PCM path (entropy + IMDCT + OLA in C++).
                if dec._native:
                    for p in pkts:
                        native.vorbis_stream_decode_pcm(dec._native, p)
                n += 1
        except _ERRS:
            pass
    # Hammer the native setup parser (sh_vorbis_open_hdrs) with directly
    # mutated setup packets — whole-file mutation rarely survives the OGG
    # page layer, so the parser needs its own loop.
    lib = native._load()
    if lib is not None and hasattr(lib, "sh_vorbis_open_hdrs"):
        native._vorbis_register_tables(lib)
        reader = OggReader(MediaSourceStream(clean))
        dec = VorbisDecoder(reader.default_track().codec_params)
        ident_data, setup_data = dec._raw_headers
        rng = np.random.default_rng(401)
        for _ in range(600):
            mut = bytearray(setup_data)
            k = int(rng.integers(1, 8))
            for _ in range(k):
                mut[int(rng.integers(0, len(mut)))] = int(rng.integers(256))
            if rng.integers(4) == 0:
                mut = mut[: int(rng.integers(1, len(mut)))]
            ctx = lib.sh_vorbis_open_hdrs(bytes(ident_data), len(ident_data),
                                          bytes(mut), len(mut))
            if ctx:
                lib.sh_vorbis_close(ctx)
            n += 1
    return n


def replay_alac() -> int:

    from alac_builder import build_cookie, encode_frame_compressed
    from symphonia_tpu.codecs.alac import MagicCookie, _CHANNEL_MAPS

    rng = np.random.default_rng(500)
    FL = 2048
    cookie_bytes = build_cookie(FL, 16, 2, 44100)
    cfg = MagicCookie.read(cookie_bytes)
    ck = dict(frame_length=FL, bit_depth=16, pb=cfg.pb, mb=cfg.mb, kb=cfg.kb)
    walk = np.clip(np.cumsum(rng.integers(-400, 401, size=(2, FL)), axis=1),
                   -30000, 30000).astype(np.int64)
    clean = encode_frame_compressed([walk[0], walk[1]], ck, order=4)
    n = 0
    for data in _variants(clean, seed=501):
        try:
            if native.alac_decode(data, cfg, _CHANNEL_MAPS[2]) is not None:
                n += 1
        except _ERRS:
            pass
    return n


def main() -> None:
    if not native.available():
        print("native library unavailable — nothing to replay", file=sys.stderr)
        sys.exit(2)
    so = os.environ.get("SYMPHONIA_TPU_NATIVE_SO", "(default)")
    print(f"[asan_replay] native .so: {so}")
    for name, fn in (("flac", replay_flac), ("mp3", replay_mp3),
                     ("aac", replay_aac), ("vorbis", replay_vorbis),
                     ("alac", replay_alac), ("l12", replay_l12),
                     ("adpcm", replay_adpcm)):
        n = fn()
        print(f"[asan_replay] {name}: {n} native-stage replays survived")
    print("[asan_replay] done (ASAN-clean if this process exits 0)")


if __name__ == "__main__":
    main()
