"""Batch serving: decode many files with merged device dispatches.

The TPU-native serving shape: probe/group a batch of streams, merge
frame lanes across files into shared power-of-two device buckets
(FLAC/MP3/AAC/Vorbis), and get per-file planar PCM back — bit-equal to
decoding each file alone, but with device dispatch count independent of
the file count.

Usage: python examples/batch_serving.py <file> [<file> ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Interactive example: keep the dense stages on the local CPU backend
# (the development image pins an experimental remote-TPU platform whose
# per-shape compiles take minutes; see tests/conftest.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    from symphonia_tpu.batch import decode_many

    datas = [open(p, "rb").read() for p in sys.argv[1:]]
    t0 = time.perf_counter()
    outs = decode_many(datas)
    dt = time.perf_counter() - t0
    audio_s = 0.0
    for path, out in zip(sys.argv[1:], outs):
        secs = out.samples.shape[1] / max(out.sample_rate, 1)
        audio_s += secs
        print(f"  {os.path.basename(path)}: {out.samples.shape[0]} ch, "
              f"{out.samples.shape[1]} frames ({secs:.2f}s) "
              f"@ {out.sample_rate} Hz")
    print(f"decoded {len(outs)} files, {audio_s:.1f}s of audio in "
          f"{dt * 1e3:.0f} ms ({audio_s / max(dt, 1e-9):.0f}x realtime)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
