"""Order-rotated same-window A/B of the Vorbis host stage across .so builds.

Usage:  python tools/microbench/ab_vorbis.py A=/tmp/a.so B=/tmp/b.so [rounds]

Same protocol as ab_aac.py / ab_flac.py: fresh subprocess per sample,
interleaved A B B A ..., per-variant median/best, output-hash equality
gate. The timed loop is the native per-packet entropy stage
(sh_vorbis_decode via vorbis_stream_decode) on house_lo.ogg's packets;
the hash covers every packet's spectra so any numeric divergence between
variants fails loudly.
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
import jax
jax.config.update("jax_platforms", "cpu")
from symphonia_tpu import native
from symphonia_tpu.core.io import MediaSourceStream
from symphonia_tpu.formats.ogg import OggReader
from symphonia_tpu.codecs.vorbis import VorbisDecoder

path = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
        "house_lo.ogg")
rdr = OggReader(MediaSourceStream(open(path, "rb").read()))
params = rdr.tracks()[0].codec_params
pkts = []
while True:
    p = rdr.next_packet()
    if p is None:
        break
    pkts.append(bytes(p.data))
audio = 78331 / 11025.0

dec = VorbisDecoder(params)
stream = native.vorbis_stream_open(dec)
assert stream is not None
h = hashlib.sha256()
for p in pkts:
    r = native.vorbis_stream_decode(stream, p)
    if r is None:
        h.update(b"skip")
    else:
        spectra, flag = r
        h.update(spectra.tobytes())
        h.update(b"\x01" if flag else b"\x00")
best = float("inf")
for _ in range(14):
    t0 = time.perf_counter()
    for p in pkts:
        native.vorbis_stream_decode(stream, p)
    best = min(best, time.perf_counter() - t0)
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
