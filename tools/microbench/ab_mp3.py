"""Order-rotated same-window A/B of the MP3 host stage across .so builds.

Usage:  python tools/microbench/ab_mp3.py A=/tmp/a.so B=/tmp/b.so [rounds]

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
from symphonia_tpu import native
from symphonia_tpu.core.formats import FormatOptions
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.mpa import MpaReader

HOUSE = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"
with open(HOUSE, "rb") as f:
    data = f.read()
r = MpaReader(MediaSourceStream(data), FormatOptions(enable_gapless=False))
audio = len(r._offsets) * r.header.duration / r.header.sample_rate
mg = 2 * len(r._offsets) + 2
for _ in range(3):
    out = native.mp3_extract(r._buf, r._offsets, r._sizes, max_granules=mg)
best = float("inf")
for _ in range(12):
    t0 = time.perf_counter()
    out = native.mp3_extract(r._buf, r._offsets, r._sizes, max_granules=mg)
    best = min(best, time.perf_counter() - t0)
assert out["n_granules"] > 0
h = hashlib.sha256()
for k in sorted(out):
    v = out[k]
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
