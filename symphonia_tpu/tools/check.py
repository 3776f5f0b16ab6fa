"""symphonia-check equivalent: differential decode verification.

Analog of symphonia-check/src/main.rs: decodes a file with this framework
AND with an external reference decoder, then compares the interleaved f32
streams sample-by-sample against the conformance tolerance
``ABS_MAX_ALLOWABLE_SAMPLE_DELTA = 1e-5`` (main.rs:32), accounting packet/
sample failure counts and the absolute maximum delta (main.rs:228-340).

Reference decoders available in this environment:
  * SDL (pygame / SDL_mixer): MP3, OGG Vorbis, WAV incl. ADPCM — the
    analog of the reference spawning ffmpeg/mpg123/oggdec subprocesses.
    SDL outputs s16, so the effective tolerance is 1 LSB + 1e-5.
  * scipy.io.wavfile: WAV PCM.
  * FLAC: STREAMINFO MD5 self-verification (bit-exact whole-stream check,
    the strongest oracle of the three).

Usage: python -m symphonia_tpu.tools.check <file>
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass, field

import numpy as np

S16_LSB = 1.0 / 32768.0


@dataclass
class TestResult:
    n_samples: int = 0
    n_failed_samples: int = 0
    n_packets: int = 0
    n_failed_packets: int = 0
    abs_max_delta: float = 0.0

    def print_report(self) -> None:
        print(f"  samples compared: {self.n_samples}")
        print(f"  failed samples:   {self.n_failed_samples}")
        print(f"  abs max delta:    {self.abs_max_delta:.3e}")
        ok = self.n_failed_samples == 0
        print(f"  result:           {'PASS' if ok else 'FAIL'}")


def our_decode(data: bytes, gapless: bool):
    import symphonia_tpu as sym
    from symphonia_tpu.core.codecs import AudioDecoderOptions
    from symphonia_tpu.core.formats import FormatOptions
    from symphonia_tpu.core.io import MediaSourceStream

    probed = sym.get_probe().probe(
        MediaSourceStream(data), fmt_opts=FormatOptions(enable_gapless=gapless)
    )
    fmt = probed.format
    track = fmt.default_track()
    dec = sym.get_codecs().make_audio_decoder(
        track.codec_params, AudioDecoderOptions(verify=True)
    )
    outs = []
    while True:
        pkt = fmt.next_packet()
        if pkt is None:
            break
        if pkt.track_id != track.id:
            continue
        buf = dec.decode(pkt)
        if buf.frames:
            outs.append(buf.to_float().copy())
    pcm = np.concatenate(outs, axis=1) if outs else np.zeros((1, 0), np.float32)
    return pcm, track, dec.finalize()


def sdl_decode(path: str, rate: int, channels: int) -> np.ndarray:
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame

    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=channels)
    raw = np.frombuffer(pygame.mixer.Sound(path).get_raw(), dtype=np.int16)
    return (raw.astype(np.float32) / 32768.0).reshape(-1, channels).T


def run_check(path: str, tolerance: float = 1e-5, gapless: bool = False) -> int:
    with open(path, "rb") as f:
        data = f.read()
    ours, track, fin = our_decode(data, gapless)
    codec = track.codec_params.codec
    print(f"checking {path} ({codec})")

    if codec == "flac":
        # Bit-exact whole-stream MD5 self-verification (validate.rs:18).
        if fin.verify_ok is None:
            print("  no STREAMINFO MD5 present; nothing to verify against")
            return 1
        print(f"  FLAC MD5 self-verification: {'PASS' if fin.verify_ok else 'FAIL'}")
        return 0 if fin.verify_ok else 2

    if codec in ("mp1", "mp2", "mp3", "vorbis") or codec.startswith(("pcm", "adpcm")):
        ref = sdl_decode(path, track.codec_params.sample_rate,
                         track.codec_params.channels.count)
        n = min(ours.shape[1], ref.shape[1])
        clipped = np.clip(ours[:, :n], -1.0, 32767.0 / 32768.0)
        delta = np.abs(clipped - ref[:, :n])
        tol = tolerance + S16_LSB  # reference output is s16-quantized
        result = TestResult(
            n_samples=int(delta.size),
            n_failed_samples=int((delta > tol).sum()),
            abs_max_delta=float(delta.max()) if delta.size else 0.0,
        )
        result.print_report()
        return 0 if result.n_failed_samples == 0 else 2

    print(f"  no external reference decoder for codec '{codec}'")
    return 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="symphonia_tpu conformance checker")
    ap.add_argument("files", nargs="+")
    ap.add_argument("--tolerance", type=float, default=1e-5)
    ap.add_argument("--gapless", action="store_true")
    args = ap.parse_args(argv)
    worst = 0
    for path in args.files:
        worst = max(worst, run_check(path, args.tolerance, args.gapless))
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
