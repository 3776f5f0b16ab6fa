"""Cycle-level profile of the FLAC host stage (SIMD Rice engine).

Point SYMPHONIA_TPU_NATIVE_SO at a .so built with -DSH_FLAC_PROF and run:

    SYMPHONIA_TPU_NATIVE_SO=/tmp/fprof.so python tools/microbench/prof_flac.py

Counter slots: 0 total extract_simd, 1 vector burst, 2 scalar service
(includes 3 as a sub-share), 3 lane_advance, 4 burst iterations,
5 lane-iterations (popcnt run).
"""

import ctypes
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import importlib  # noqa: E402

bench = importlib.import_module("bench")

from symphonia_tpu import native  # noqa: E402
from symphonia_tpu.core.io import MediaSourceStream  # noqa: E402
from symphonia_tpu.formats.flac import FlacReader  # noqa: E402


def main():
    data = bench._gen_flac()
    r = FlacReader(MediaSourceStream(data))
    audio = r.stream_info.n_samples / r.stream_info.sample_rate
    buf = r._buf if r._buf is not None else data[r._data_start:]
    if r._buf is None:
        r._ensure_scan()
        buf = r._buf
    si = r.stream_info
    max_frames = si.n_samples // max(1, si.block_len_min) + 8

    lib = native._load()
    assert lib is not None
    try:
        lib.sh_flac_prof.restype = ctypes.POINTER(ctypes.c_uint64)
        lib.sh_flac_prof_reset.restype = None
    except AttributeError:
        sys.exit("native .so not built with -DSH_FLAC_PROF")

    for _ in range(3):
        packed = native.flac_fast_extract(buf, si, 4096, max_frames)
    lib.sh_flac_prof_reset()
    N = 40
    best = float("inf")
    for _ in range(N):
        t0 = time.perf_counter()
        packed = native.flac_fast_extract(buf, si, 4096, max_frames)
        best = min(best, time.perf_counter() - t0)
    assert packed["F"] > 0 and (packed["status"] == 0).all()
    p = [lib.sh_flac_prof()[i] / N for i in range(8)]

    nres = int(np.sum(packed["block"][:packed["F"]])) * si.channels
    names = ["total", "vector_burst", "scalar_service", "lane_advance",
             None, None, "refills"]
    print(f"frames={packed['F']} residuals={nres} "
          f"best_wall={best*1e3:.3f}ms -> {audio/best:.0f}x")
    print(f"burst iters/call={p[4]:.0f} lane-iters={p[5]:.0f} "
          f"(occupancy {p[5]/max(p[4],1)/8*100:.1f}%) "
          f"bursts/call={0 if not p[4] else p[1]/p[4]:.1f} cyc/iter, "
          f"{p[1]/max(nres,1):.2f} cyc/residual in-vector")
    for i, n in enumerate(names):
        if n is None:
            continue
        print(f"  {n:16s} {p[i]/1e6:8.3f} Mcyc  {p[i]/p[0]*100:5.1f}%")
    unacc = p[0] - p[1] - p[2]
    print(f"  {'unaccounted':16s} {unacc/1e6:8.3f} Mcyc  {unacc/p[0]*100:5.1f}%")


if __name__ == "__main__":
    main()
