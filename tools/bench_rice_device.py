"""Measure the device FLAC Rice entropy kernel (VERDICT r1 #4).

Run on the real TPU (default platform) in the background — the remote
compile takes minutes. Timing chains iterations inside one jit and forces
a scalar fetch (CLAUDE.md methodology). Prints realtime-x at 44.1 kHz
stereo-sample-equivalent so the number is comparable to the host C++
stage's realtime-x in bench.py.
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main(B=8192, n=4096, k=4, iters=4):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from symphonia_tpu.ops.rice_device import (make_test_streams,
                                               pack_bits_u32,
                                               rice_decode_lanes)

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    data, cur, vals = make_test_streams(B, n, k)
    words = jax.device_put(pack_bits_u32(data))
    cur0 = jax.device_put(np.asarray(cur, np.int32))
    par = jax.device_put(np.full(B, k, np.int32))

    @jax.jit
    def many(words, cur, par):
        def body(i, acc):
            out, cend = rice_decode_lanes(words, cur + acc * 0, par, n)
            return (out[0, 0] & 0).astype(jnp.int32) + (cend[0] & 1).astype(jnp.int32)

        acc = jnp.zeros((), jnp.int32)
        return jax.lax.fori_loop(0, iters, body, acc)

    t0 = time.time()
    v = int(many(words, cur0, par))  # compile + run, scalar fetch syncs
    print(f"first call (incl. compile): {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        v = int(many(words, cur0, par))
        best = min(best, time.perf_counter() - t0)
    samples = B * n * iters
    audio_s = samples / 44100.0
    rtx = audio_s / best
    print(f"B={B} n={n} k={k} iters={iters}: wall {best*1e3:.1f} ms, "
          f"{samples/best/1e6:.0f} Msamples/s, {rtx:.0f}x realtime "
          f"(44.1k mono-sample equivalent)", flush=True)

    # Correctness spot check on a slice.
    out, _ = rice_decode_lanes(words, cur0[:8], par[:8], n)
    ok = bool((np.asarray(out) == vals[:8]).all())
    print(f"correctness slice: {ok}", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
