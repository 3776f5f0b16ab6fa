"""Cycle-level profile of the AAC host entropy stage (SIMD engine).

Builds nothing itself: point SYMPHONIA_TPU_NATIVE_SO at a .so compiled
with -DSH_AAC_PROF (see native/aac_entropy.cpp header) and run:

    SYMPHONIA_TPU_NATIVE_SO=/tmp/prof.so python tools/microbench/prof_aac.py

Counter slots: 0 total extract, 1 vector burst loop, 2 fixup+lane_to_hot
(includes 3/4/5 as sub-shares), 3 pre_spectrum, 4 dequant_runs,
5 build_plan, 6 pns/prevshape pass, 7 final drain, 8 burst iterations,
9 emitted lane-iterations (popcnt act), 10 freezes.
"""

import ctypes
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

from symphonia_tpu import native  # noqa: E402
from symphonia_tpu.codecs.aac import subband_info  # noqa: E402
from symphonia_tpu.core.io import MediaSourceStream  # noqa: E402
from symphonia_tpu.formats.adts import AdtsReader  # noqa: E402

sys.path.insert(0, str(ROOT / "tests"))
import importlib  # noqa: E402

bench = importlib.import_module("bench")


def main():
    data = bench._gen_adts()
    r = AdtsReader(MediaSourceStream(data))
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
    audio = len(pkts) * 1024 / 44100

    lib = native._load()
    assert lib is not None
    try:
        lib.sh_aac_prof.restype = ctypes.POINTER(ctypes.c_uint64)
        lib.sh_aac_prof_reset.restype = None
    except AttributeError:
        sys.exit("native .so not built with -DSH_AAC_PROF")

    # Warm, then measure best-of wall + accumulate counters over N calls.
    for _ in range(3):
        native.aac_extract(buf, offs, sizes, ri, bl, bs, 2)
    lib.sh_aac_prof_reset()
    N = 40
    best = float("inf")
    for _ in range(N):
        t0 = time.perf_counter()
        out = native.aac_extract(buf, offs, sizes, ri, bl, bs, 2)
        best = min(best, time.perf_counter() - t0)
        assert (out["status"] == 0).all()
    p = [lib.sh_aac_prof()[i] / N for i in range(24)]

    names = ["total", "vector_burst", "fixup(lane_to_hot)", "pre_spectrum",
             "dequant_runs", "build_plan", "pns_prevshape", "final_drain",
             None, None, None, "quad_scalar", "build_runs",
             "finalize_layout", "joint_synth", "tail_drain",
             "  ps:ics_info", "  ps:section_data", "  ps:scale_factors",
             "  ps:pulse", "  ps:tns"]
    print(f"frames={len(pkts)} audio={audio:.2f}s "
          f"best_wall={best*1e3:.3f}ms -> {audio/best:.0f}x")
    print(f"burst iters/call={p[8]:.0f} emitted lane-iters={p[9]:.0f} "
          f"(occupancy {p[9]/max(p[8],1)/8*100:.1f}%) freezes={p[10]:.0f}")
    if p[9]:
        print(f"vector loop: {p[1]/p[8]:.1f} cyc/iter, "
              f"{p[1]/p[9]*8/8:.1f} cyc/emitted-lane-iter "
              f"({p[9]/max(p[10],1):.1f} emits/freeze)")
    for i, n in enumerate(names):
        if n is None:
            continue
        print(f"  {n:22s} {p[i]/1e6:8.3f} Mcyc  {p[i]/p[0]*100:5.1f}%")
    unacc = p[0] - p[1] - p[2] - p[6] - p[7]
    print(f"  {'unaccounted':22s} {unacc/1e6:8.3f} Mcyc  {unacc/p[0]*100:5.1f}%")


if __name__ == "__main__":
    main()
