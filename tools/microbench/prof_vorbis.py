"""Cycle-level profile of the Vorbis host entropy stage.

Point SYMPHONIA_TPU_NATIVE_SO at a .so built with -DSH_VORBIS_PROF and run:

    SYMPHONIA_TPU_NATIVE_SO=/tmp/vprof.so python tools/microbench/prof_vorbis.py [ogg]

Counter slots: 0 total decode, 1 floor_read, 2 residue_core,
3 decode_partition (subset of 2), 4 coupling, 5 floor synth + dot;
counts: 6 residue codewords, 7 classbook codewords, 8 VQ float adds,
9 packets, 10 unused.
"""

import ctypes
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from symphonia_tpu import native  # noqa: E402
from symphonia_tpu.core.io import MediaSourceStream  # noqa: E402
from symphonia_tpu.formats.ogg import OggReader  # noqa: E402


def main():
    path = (sys.argv[1] if len(sys.argv) > 1 else
            "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
            "house_lo.ogg")
    rdr = OggReader(MediaSourceStream(open(path, "rb").read()))
    params = rdr.tracks()[0].codec_params
    pkts = []
    while True:
        p = rdr.next_packet()
        if p is None:
            break
        pkts.append(bytes(p.data))

    from symphonia_tpu.codecs.vorbis import VorbisDecoder
    dec = VorbisDecoder(params)
    stream = native.vorbis_stream_open(dec)
    assert stream is not None

    lib = native._load()
    try:
        lib.sh_vorbis_prof.restype = ctypes.POINTER(ctypes.c_uint64)
        lib.sh_vorbis_prof_reset.restype = None
    except AttributeError:
        sys.exit("native .so not built with -DSH_VORBIS_PROF")

    for p in pkts:
        native.vorbis_stream_decode(stream, p)
    lib.sh_vorbis_prof_reset()
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        for p in pkts:
            native.vorbis_stream_decode(stream, p)
    wall = time.perf_counter() - t0

    c = lib.sh_vorbis_prof()
    tot = c[0]
    names = ["total", "floor_read", "residue_core", "decode_partition",
             "coupling", "floor_synth+dot"]
    print(f"{len(pkts)} packets x {N}; wall {wall/N*1e3:.3f} ms/pass")
    for i, nm in enumerate(names):
        print(f"  {nm:18s} {c[i]/N/1e3:9.1f} kcyc  {c[i]/tot*100:5.1f}%")
    other = tot - c[1] - c[2] - c[4] - c[5]
    print(f"  {'other (hdr/memset)':18s} {other/N/1e3:9.1f} kcyc  {other/tot*100:5.1f}%")
    ncw, ncls, nvq = c[6] / N, c[7] / N, c[8] / N
    print(f"per pass: residue cw {ncw:.0f}  classbook cw {ncls:.0f}  VQ adds {nvq:.0f}")
    if ncw:
        print(f"decode_partition: {c[3]/max(1,c[6]):.1f} cyc/residue-cw "
              f"(VQ adds/cw {nvq/ncw:.2f})")
    print(f"classbook+partition share of total: {(c[2])/tot*100:.1f}%")


main()
