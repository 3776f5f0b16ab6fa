"""Order-rotated same-window A/B of the FLAC host stage across .so builds.

Usage:  python tools/microbench/ab_flac.py A=/tmp/a.so B=/tmp/b.so [rounds]

Same protocol as ab_aac.py: fresh subprocess per sample, interleaved
A B B A ..., per-variant median/best, output-hash equality gate.
"""

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]

CHILD = r"""
import hashlib, json, sys, time
from pathlib import Path
import numpy as np
ROOT = Path(sys.argv[1])
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))
import importlib
bench = importlib.import_module("bench")
from symphonia_tpu import native
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.flac import FlacReader

data = bench._gen_flac()
r = FlacReader(MediaSourceStream(data))
audio = r.stream_info.n_samples / r.stream_info.sample_rate
buf = r._buf if r._buf is not None else data[r._data_start:]
if r._buf is None:
    r._ensure_scan()
    buf = r._buf
si = r.stream_info
max_frames = si.n_samples // max(1, si.block_len_min) + 8
for _ in range(3):
    packed = native.flac_fast_extract(buf, si, 4096, max_frames)
best = float("inf")
for _ in range(12):
    t0 = time.perf_counter()
    packed = native.flac_fast_extract(buf, si, 4096, max_frames)
    best = min(best, time.perf_counter() - t0)
assert packed is not None and packed["F"] > 0 and (packed["status"] == 0).all()
h = hashlib.sha256()
for k in sorted(packed):
    v = packed[k]
    h.update(v.tobytes() if hasattr(v, "tobytes") else str(v).encode())
print(json.dumps({"wall": best, "rtx": audio / best, "sha": h.hexdigest()[:16]}))
"""


def run_one(so: str) -> dict:
    env = dict(os.environ, SYMPHONIA_TPU_NATIVE_SO=so)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(ROOT)],
        env=env, capture_output=True, text=True, timeout=300)
    if out.returncode != 0:
        sys.exit(f"variant {so} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    variants = {}
    rounds = 6
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            variants[k] = v
        else:
            rounds = int(a)
    if not variants:
        sys.exit(__doc__)
    names = list(variants)
    results = {k: [] for k in names}
    shas = {}
    order = []
    for i in range(rounds):
        order += names if i % 2 == 0 else names[::-1]
    for i, k in enumerate(order):
        r = run_one(variants[k])
        results[k].append(r["rtx"])
        shas.setdefault(k, r["sha"])
        print(f"  [{i+1}/{len(order)}] {k}: {r['rtx']:.0f}x", flush=True)
    ref_sha = shas[names[0]]
    for k in names:
        mism = " *** OUTPUT MISMATCH ***" if shas[k] != ref_sha else ""
        xs = results[k]
        print(f"{k}: median {statistics.median(xs):.0f}x  best {max(xs):.0f}x  "
              f"(n={len(xs)}){mism}")


if __name__ == "__main__":
    main()
