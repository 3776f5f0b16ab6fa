"""Vorbis dense-stage device kernels: batched IMDCT by block-size group.

TPU re-expression of the reference's per-packet ``Imdct`` + windowed
overlap-add (codec-vorbis dsp.rs): packets group by block size into two
MXU matmuls ``[lanes, n/2] @ [n/2, n]``; the lapped overlap-add (linear,
window determined by each adjacent block-size pair) is stitched with the
precomputed left-half windows.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import numpy as np

from ..codecs.vorbis import imdct_matrix, vorbis_window


@lru_cache(maxsize=None)
def _imdct_jax(n: int):
    import jax
    import jax.numpy as jnp

    # numpy closure (converted per-trace): a jnp array built here would be
    # a leaked tracer if this cache is first populated inside an outer jit.
    m = imdct_matrix(n)

    @jax.jit
    def run(spec):  # [L, n/2] -> [L, n]
        return spec @ m.T

    return run


def imdct_group(spectra: np.ndarray, n: int) -> np.ndarray:
    """Batched IMDCT on device for one block-size group.

    Lane counts bucket to the next power of two (zero rows appended,
    result sliced back): HLO shapes stay stable across files/batches —
    a fresh lane count would otherwise compile a new program per batch
    composition (minutes on the remote TPU target)."""
    L = len(spectra)
    if L == 0:
        return np.zeros((0, n), np.float32)
    cnt = 1 << (L - 1).bit_length() if L > 1 else 1
    if cnt != L:
        spectra = np.concatenate(
            [spectra, np.zeros((cnt - L, spectra.shape[1]), spectra.dtype)])
    return np.asarray(_imdct_jax(n)(spectra))[:L]


def lap_stitch(
    imdcts: Sequence[np.ndarray], flags: Sequence[bool], bs0: int, bs1: int
) -> np.ndarray:
    """Windowed overlap-add across a packet sequence for one channel
    (dsp.rs DspChannel::synth semantics). imdcts[p] has length bs of
    packet p. The first packet produces no output (no left partner)."""
    w0 = vorbis_window(bs0)
    w1 = vorbis_window(bs1)
    outs: List[np.ndarray] = []
    for p in range(1, len(imdcts)):
        prev, cur = imdcts[p - 1], imdcts[p]
        prev_bs, bs = len(prev), len(cur)
        win = w1 if (prev_bs == bs1 and bs == bs1) else w0
        ov = prev[prev_bs // 2 :]
        out = np.empty((prev_bs + bs) // 4, dtype=np.float32)
        if prev_bs == bs:
            out[:] = ov[: bs // 2] * win[::-1] + cur[: bs // 2] * win
        elif prev_bs > bs:  # long -> short
            start = (bs1 - bs0) // 4
            end = start + bs0 // 2
            out[:start] = ov[:start]
            out[start:] = ov[start:end] * win[::-1] + cur[: bs0 // 2] * win
        else:  # short -> long
            start = (bs1 - bs0) // 4
            end = start + bs0 // 2
            out[: bs0 // 2] = ov[: bs0 // 2] * win[::-1] + cur[start:end] * win
            out[bs0 // 2 :] = cur[end : bs1 // 2]
        outs.append(out)
    return np.concatenate(outs) if outs else np.zeros(0, np.float32)


def decode_packets_dense(
    spectra_list: Sequence[np.ndarray],  # per packet [C, n2] float32
    flags: Sequence[bool],
    bs0: int,
    bs1: int,
) -> np.ndarray:
    """Full dense stage for a packet sequence: grouped device IMDCTs +
    host lap stitch. Returns [C, total_samples]."""
    return decode_packets_dense_multi([(spectra_list, flags, bs0, bs1)])[0]


def decode_packets_dense_multi(jobs) -> List[np.ndarray]:
    """Merged dense stage over several packet sequences (streams).

    ``jobs``: list of (spectra_list, flags, bs0, bs1). Lanes from every
    job group by BLOCK SIZE — not by job — so all streams share one
    device IMDCT per distinct n (the lap stitch stays per-stream host
    work). Returns one [C, total_samples] per job, identical to running
    decode_packets_dense per job."""
    lane_map: dict = {}   # n -> list of [n/2] rows
    slot_map: dict = {}   # n -> list of (job, packet, channel)
    for ji, (spectra_list, flags, bs0, bs1) in enumerate(jobs):
        for p, f in enumerate(flags):
            n = bs1 if f else bs0
            C = spectra_list[p].shape[0]
            for c in range(C):
                lane_map.setdefault(n, []).append(spectra_list[p][c][: n // 2])
                slot_map.setdefault(n, []).append((ji, p, c))
    out_imdct = [
        [[None] * len(jobs[ji][1])
         for _ in range(jobs[ji][0][0].shape[0] if jobs[ji][0] else 1)]
        for ji in range(len(jobs))
    ]
    for n, lanes in lane_map.items():
        y = imdct_group(np.stack(lanes), n)
        for row, (ji, p, c) in enumerate(slot_map[n]):
            out_imdct[ji][c][p] = y[row]
    outs = []
    for ji, (spectra_list, flags, bs0, bs1) in enumerate(jobs):
        if not spectra_list:
            outs.append(np.zeros((1, 0), np.float32))
            continue
        C = spectra_list[0].shape[0]
        chans = [lap_stitch(out_imdct[ji][c], flags, bs0, bs1)
                 for c in range(C)]
        outs.append(np.stack(chans))
    return outs
