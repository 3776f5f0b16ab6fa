"""Order-rotated same-window A/B of the AAC host stage across .so builds.

Usage:  python tools/microbench/ab_aac.py A=/tmp/a.so B=/tmp/b.so [rounds]

Loads each .so in a fresh subprocess (ctypes cannot unload), interleaves
variants A B B A A B B A ... so slow drifts of this shared 1-core VM hit
both sides equally, and reports per-variant median / best of the
per-process best-of-12 walls. Verifies all variants produce identical
coefficient bytes before timing.
"""

import hashlib
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
from symphonia_tpu.codecs.aac import subband_info
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.adts import AdtsReader

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
for _ in range(3):
    out = native.aac_extract(buf, offs, sizes, ri, bl, bs, 2)
best = float("inf")
for _ in range(12):
    t0 = time.perf_counter()
    out = native.aac_extract(buf, offs, sizes, ri, bl, bs, 2)
    best = min(best, time.perf_counter() - t0)
assert (out["status"] == 0).all()
# Handoff lanes (deq == 0) leave coeffs unwritten; hash the reconstructed
# coefficients (bit-identical host twin of the device dequant).
full = native.aac_dequant_host(out, bl)
h = hashlib.sha256(full.tobytes()).hexdigest()[:16]
print(json.dumps({"wall": best, "rtx": audio / best, "sha": h}))
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
        if r["sha"] != shas[k]:
            sys.exit(f"variant {k} nondeterministic output!")
        print(f"  [{i+1}/{len(order)}] {k}: {r['rtx']:.0f}x", flush=True)
    ref_sha = shas[names[0]]
    for k in names:
        mism = " *** OUTPUT MISMATCH ***" if shas[k] != ref_sha else ""
        xs = results[k]
        print(f"{k}: median {statistics.median(xs):.0f}x  best {max(xs):.0f}x  "
              f"(n={len(xs)}){mism}")


if __name__ == "__main__":
    main()
