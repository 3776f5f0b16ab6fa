"""Randomized mutation soak over the full decode surface.

Complements tests/test_fuzz.py's bounded seeded corpus with an open-ended
randomized run: build valid streams with every mirror encoder, apply
random mutations (byte flips, truncations, splices, duplications), and
push them through probe -> demux -> batch/per-packet decode. Any
exception that is not part of the error taxonomy, any hang, or any
native crash fails the soak.

    python tools/soak.py [seconds] [seed]

Runs on CPU (forces jax off the axon tunnel).
"""

import random
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def builders(rng):
    from aac_builder import build_adts, build_raw_block
    from flac_builder import build_flac_file, random_walk
    from mp3_builder import build_mpeg1_l3_stream

    def flac():
        block = int(rng.choice([256, 1024, 4096]))
        # whole blocks only: the mirror encoder needs >= order samples in
        # the final partial block
        n = block * int(rng.integers(2, 9))
        ch = random_walk(n, 16, seed=int(rng.integers(1 << 16)), ch=2)
        return build_flac_file(ch, block_size=block,
                               stereo_mode=str(rng.choice(
                                   ["independent", "left_side", "mid_side"])),
                               kind="fixed", order=int(rng.integers(0, 5)),
                               partition_order=int(rng.integers(0, 3)))

    def mp3():
        return build_mpeg1_l3_stream(int(rng.integers(3, 10)), n_ch=2,
                                     seed=int(rng.integers(1 << 16)))

    def aac():
        frames = []
        for f in range(int(rng.integers(3, 14))):
            seq = int(rng.choice([0, 1, 2, 3]))
            nch = 2
            specs = []
            for _ in range(nch):
                q = np.zeros(1024, np.int64)
                n = int(rng.integers(10, 400))
                idx = rng.choice(1000, size=n, replace=False)
                q[idx] = rng.integers(-200, 201, size=n)
                specs.append(q)
            frames.append(build_raw_block(specs, [seq] * nch, 12, 140, 44100,
                                          common_window=bool(rng.integers(2))))
        return build_adts(frames, 44100, 2)

    return [flac, mp3, aac]


def mutate(data: bytes, rng) -> bytes:
    b = bytearray(data)
    kind = rng.integers(0, 5)
    if kind == 0 and len(b) > 4:  # byte flips
        for _ in range(int(rng.integers(1, 24))):
            b[int(rng.integers(len(b)))] ^= int(rng.integers(1, 256))
    elif kind == 1 and len(b) > 8:  # truncate
        b = b[: int(rng.integers(4, len(b)))]
    elif kind == 2 and len(b) > 16:  # splice a chunk out
        i = int(rng.integers(0, len(b) - 8))
        j = int(rng.integers(i + 1, min(i + 4096, len(b))))
        del b[i:j]
    elif kind == 3:  # duplicate a chunk
        i = int(rng.integers(0, max(1, len(b) - 8)))
        j = int(rng.integers(i + 1, min(i + 2048, len(b))))
        b[i:i] = b[i:j]
    else:  # random prefix garbage (probe scan stress)
        b[0:0] = bytes(rng.integers(0, 256, size=int(rng.integers(1, 512)),
                                    dtype=np.uint8))
    return bytes(b)


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else int(time.time())
    rng = np.random.default_rng(seed)
    random.seed(seed)
    print(f"[soak] seed={seed} budget={seconds:.0f}s")

    from symphonia_tpu import batch
    from symphonia_tpu.core.errors import (DecodeError, IoError, LimitError,
                                           ResetRequired, SeekError,
                                           Unsupported)
    # Strict taxonomy: raw ValueError/IndexError/etc escaping the decode
    # surface on malformed input is a bug (the reference maps everything
    # to its error enum).
    ok_errors = (DecodeError, IoError, LimitError, ResetRequired, SeekError,
                 Unsupported, EOFError)

    bs = builders(rng)
    t0 = time.time()
    n = 0
    decoded = 0
    while time.time() - t0 < seconds:
        base = bs[int(rng.integers(len(bs)))]()
        for variant in (base, mutate(base, rng), mutate(base, rng)):
            n += 1
            try:
                out = batch.decode_bytes(variant)
                if out.samples.size:
                    decoded += 1
            except ok_errors:
                pass  # taxonomy errors are the contract for malformed input
    print(f"[soak] {n} inputs ({decoded} decoded) in {time.time()-t0:.0f}s — "
          f"no crashes, no non-taxonomy exceptions")


if __name__ == "__main__":
    main()
