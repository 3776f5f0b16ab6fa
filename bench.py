"""Benchmark: aggregate realtime-x decode throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 5000x aggregate realtime decode per chip (BASELINE.md).

Measures the FLAC batched dense-stage pipeline (integer-LPC reconstruction +
wasted-bit restore + stereo decorrelation) on a production-shaped workload:
4096 stereo frames x 4096 samples (~6.3 min of 44.1 kHz stereo audio per
dispatch), LPC order 8.

Methodology notes: the remote-TPU transport dispatches asynchronously and
``block_until_ready`` does not synchronize, so the timed region chains
``iters`` full pipeline invocations *inside* one jit and forces a scalar
fetch; elapsed/iters is the per-dispatch time. The persistent compilation
cache keeps repeat runs cheap.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_flac_dense(n_frames: int = 4096, block: int = 4096, order: int = 8,
                     rate: int = 44100, iters: int = 4) -> dict:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from symphonia_tpu.ops import flac_dense

    rng = np.random.default_rng(0)
    L = 2 * n_frames
    res = rng.integers(-2000, 2000, size=(L, block)).astype(np.int32)
    coefs = np.zeros((L, 32), dtype=np.int32)
    coefs[:, :order] = rng.integers(-(2**13), 2**13, size=(L, order))
    order_d = jnp.asarray(np.full(L, order, dtype=np.int32))
    shift_d = jnp.asarray(np.full(L, 12, dtype=np.int32))
    wasted_d = jnp.asarray(np.zeros(L, dtype=np.int32))
    assign_d = jnp.asarray(rng.integers(0, 4, size=n_frames).astype(np.int32))
    res_d = jax.device_put(res)
    coefs_d = jax.device_put(coefs)

    @jax.jit
    def many(res, coefs, order, shift, wasted, assign):
        def body(i, acc):
            # Data-depend on acc so iterations can't be parallelized away.
            x = flac_dense.lpc_reconstruct_batch(
                res + acc[:, :1] * 0, coefs, order, shift, block
            )
            x = flac_dense.apply_wasted_bits(x, wasted)
            y = flac_dense.decorrelate_batch(
                x.reshape(-1, 2, block), assign
            ).reshape(-1, block)
            return y[:, -1:].astype(jnp.int32)

        acc = jnp.zeros((res.shape[0], 1), jnp.int32)
        acc = jax.lax.fori_loop(0, iters, body, acc)
        return acc.sum()

    args = (res_d, coefs_d, order_d, shift_d, wasted_d, assign_d)
    float(many(*args))  # compile + warmup, fully synced via scalar fetch
    t0 = time.perf_counter()
    float(many(*args))
    elapsed = (time.perf_counter() - t0) / iters

    audio_seconds = n_frames * block / rate
    rtx = audio_seconds / elapsed
    return {
        "metric": "FLAC dense-stage decode realtime-x per chip "
                  "(batched int-LPC reconstruct + decorrelate, "
                  f"{n_frames}x{block} stereo frames, order {order})",
        "value": round(rtx, 1),
        "unit": "x realtime",
        "vs_baseline": round(rtx / 5000.0, 3),
    }


if __name__ == "__main__":
    print(json.dumps(bench_flac_dense()))
