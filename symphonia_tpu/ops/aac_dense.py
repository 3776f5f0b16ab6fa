"""AAC dense-stage device kernels: batched 2048/256-point IMDCTs.

TPU re-expression of codec-aac's filterbank (dsp.rs): frames group by
window sequence into two MXU matmuls — long-ish frames ``[L, 1024] @
[1024, 2048]`` and short frames ``[L*8, 128] @ [128, 256]`` — then the
window/overlap-add chain (elementwise, stateful across frames) stitches on
the host with the same four-sequence logic as the per-packet decoder.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np

from ..codecs.aac import (
    EIGHT_SHORT,
    LONG_START,
    LONG_STOP,
    ONLY_LONG,
    Dsp,
    imdct_matrix_scaled,
)

_P0 = 512 - 64
_P1 = 512 + 64


@lru_cache(maxsize=None)
def _imdct_jax(n_in: int):
    import jax
    import jax.numpy as jnp

    m = jnp.asarray(imdct_matrix_scaled(n_in))

    @jax.jit
    def run(spec):  # [L, n_in] -> [L, 2*n_in]
        return spec @ m.T

    return run


def imdct_frames(coeffs: np.ndarray, seqs: np.ndarray) -> List[np.ndarray]:
    """Batched IMDCT per frame: returns per-frame pcm arrays (2048 for
    long-ish, [8, 256] for EIGHT_SHORT)."""
    n = len(coeffs)
    long_idx = [i for i in range(n) if seqs[i] != EIGHT_SHORT]
    short_idx = [i for i in range(n) if seqs[i] == EIGHT_SHORT]
    out: List[np.ndarray] = [None] * n
    if long_idx:
        y = np.asarray(_imdct_jax(1024)(np.stack([coeffs[i] for i in long_idx])))
        for j, i in enumerate(long_idx):
            out[i] = y[j]
    if short_idx:
        stacked = np.stack(
            [coeffs[i].reshape(8, 128) for i in short_idx]
        ).reshape(-1, 128)
        y = np.asarray(_imdct_jax(128)(stacked)).reshape(len(short_idx), 8, 256)
        for j, i in enumerate(short_idx):
            out[i] = y[j]
    return out


def window_ola_chain(
    pcms: Sequence[np.ndarray],
    seqs: Sequence[int],
    shapes: Sequence[bool],
    prev_shapes: Sequence[bool],
) -> np.ndarray:
    """The stateful window/overlap-add chain over a frame sequence for one
    channel (dsp.rs:56-159 with the IMDCT precomputed). Returns the
    concatenated 1024-sample frames."""
    dsp = Dsp()
    delay = np.zeros(1024, np.float32)
    outs = []
    for pcm, seq, shape, prev_shape in zip(pcms, seqs, shapes, prev_shapes):
        long_win = dsp.kbd_long if shape else dsp.sine_long
        short_win = dsp.kbd_short if shape else dsp.sine_short
        prev_long = dsp.kbd_long if prev_shape else dsp.sine_long
        prev_short = dsp.kbd_short if prev_shape else dsp.sine_short
        dst = np.empty(1024, np.float32)
        if seq == EIGHT_SHORT:
            short = np.zeros(1152, np.float32)
            for w in range(8):
                src = pcm[w]
                left_w = prev_short if w == 0 else short_win
                if w == 0:
                    short[:128] = src[:128] * left_w
                    short[128:256] = src[128:256] * short_win[::-1]
                else:
                    short[w * 128 : w * 128 + 128] += src[:128] * short_win
                    short[w * 128 + 128 : w * 128 + 256] += src[128:] * short_win[::-1]
            dst[:_P0] = delay[:_P0]
            dst[_P0:] = delay[_P0:] + short[: 1024 - _P0]
            new_delay = np.zeros(1024, np.float32)
            new_delay[:_P1] = short[_P1 : 2 * _P1]
        elif seq in (ONLY_LONG, LONG_START):
            dst[:] = delay + pcm[:1024] * prev_long
            if seq == ONLY_LONG:
                new_delay = pcm[1024:] * long_win[::-1]
            else:
                new_delay = np.zeros(1024, np.float32)
                new_delay[:_P0] = pcm[1024 : 1024 + _P0]
                new_delay[_P0:_P1] = (
                    pcm[1024 + _P0 : 1024 + _P1] * short_win[::-1][: _P1 - _P0]
                )
        else:  # LONG_STOP
            dst[:_P0] = delay[:_P0]
            dst[_P0:_P1] = delay[_P0:_P1] + pcm[_P0:_P1] * prev_short[: _P1 - _P0]
            dst[_P1:] = delay[_P1:] + pcm[_P1:1024]
            new_delay = pcm[1024:] * long_win[::-1]
        delay = new_delay
        outs.append(dst)
    return np.concatenate(outs) if outs else np.zeros(0, np.float32)
