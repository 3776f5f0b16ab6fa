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


def _pow43_lookup(jnp, mag):
    """pow43[mag] for mag [..., 1024] int32 in [0, 8191], TPU-shaped.

    A plain elementwise ``jnp.take`` from the 8192-entry table scalarizes
    on TPU (measured 22 ms for 8.4M lookups on the v5e — it was 100% of
    the fused dequant+IMDCT stage's overhead). Gathering 128-wide ROWS by
    the high 6 index bits and selecting the column with a fused
    compare-multiply-reduce runs ~2x faster (~12 ms; slice width 8/16/128
    all measured equal — per-element gather issue cost dominates).
    Bit-exact vs the table lookup: the 127 unselected lanes contribute
    exact +0.0 products (pow43 >= 0, so no -0.0), and adding +0.0 in any
    order is an identity in IEEE f32."""
    from ..native import aac_pow43

    rows_t = jnp.asarray(aac_pow43().reshape(64, 128))
    rows = jnp.take(rows_t, mag >> 7, axis=0)  # [..., 1024, 128]
    sel = (jnp.arange(128) == (mag & 127)[..., None]).astype(jnp.float32)
    return (rows * sel).sum(-1)


@lru_cache(maxsize=None)
def _dequant_jax(bands_long: tuple):
    """Device dequantization for the host entropy stage's handoff lanes
    (deq == 0): coeff = +-(pow43[|q|] * scale[sfb_of[i]]), the same
    f32 pow43-table multiply the host performs (dequant_run in
    native/aac_entropy.cpp) — bit-identical, IEEE multiplication plus an
    exact sign flip. Lanes the host already dequantized pass through."""
    import jax
    import jax.numpy as jnp

    from ..native import aac_sfb_map

    sfb_map = aac_sfb_map(np.asarray(bands_long))

    @jax.jit
    def run(coeffs, qbuf, scales, deq):
        # coeffs [..., 1024] f32, qbuf [..., 1024] i16,
        # scales [..., 64] f32, deq [...] i32
        q = qbuf.astype(jnp.int32)
        mag = jnp.minimum(jnp.abs(q), 8191)
        v = _pow43_lookup(jnp, mag) * scales[..., jnp.asarray(sfb_map)]
        v = jnp.where(q < 0, -v, v)
        return jnp.where((deq == 0)[..., None], v, coeffs)

    return run


def dequant_select(coeffs, qbuf, scales, deq, bands_long) -> np.ndarray:
    """Resolve the entropy stage's split output into full coefficients,
    dequantizing handoff lanes on the device."""
    if (np.asarray(deq) != 0).all():
        return np.asarray(coeffs)
    fn = _dequant_jax(tuple(int(b) for b in bands_long))
    return np.asarray(fn(coeffs, qbuf, scales, deq))


@lru_cache(maxsize=None)
def _dequant_imdct_long_jax(bands_long: tuple):
    """Fused device kernel for long-window frames: handoff dequantization
    (see _dequant_jax) feeding the 2048-point IMDCT matmul in one program —
    no coefficient round trip between the stages."""
    import jax
    import jax.numpy as jnp

    from ..native import aac_sfb_map

    sfb_map = aac_sfb_map(np.asarray(bands_long))
    m = imdct_matrix_scaled(1024)

    @jax.jit
    def run(coeffs, qbuf, scales, deq):
        q = qbuf.astype(jnp.int32)
        mag = jnp.minimum(jnp.abs(q), 8191)
        v = _pow43_lookup(jnp, mag) * scales[:, jnp.asarray(sfb_map)]
        v = jnp.where(q < 0, -v, v)
        co = jnp.where((deq == 0)[:, None], v, coeffs)
        return co @ m.T

    return run


@lru_cache(maxsize=None)
def _imdct_jax(n_in: int):
    import jax
    import jax.numpy as jnp

    # numpy closure (converted per-trace; see _ola_jax note).
    m = imdct_matrix_scaled(n_in)

    @jax.jit
    def run(spec):  # [L, n_in] -> [L, 2*n_in]
        return spec @ m.T

    return run


def imdct_frames(coeffs: np.ndarray, seqs: np.ndarray,
                 quant=None) -> List[np.ndarray]:
    """Batched IMDCT per frame: returns per-frame pcm arrays (2048 for
    long-ish, [8, 256] for EIGHT_SHORT).

    ``quant`` (optional) is the entropy stage's device-dequant handoff for
    this channel: (qbuf [n, 1024] i16, scales [n, 64] f32, deq [n] i32,
    bands_long). Handoff lanes are only ever long-window, and their
    dequantization fuses into the long-frame IMDCT program.
    """
    n = len(coeffs)
    long_idx = [i for i in range(n) if seqs[i] != EIGHT_SHORT]
    short_idx = [i for i in range(n) if seqs[i] == EIGHT_SHORT]
    out: List[np.ndarray] = [None] * n

    def _bucket(a, fill=0):
        # Power-of-two lane buckets keep HLO shapes stable across files
        # and batch compositions (a fresh lane count recompiles).
        L = a.shape[0]
        cnt = 1 << (L - 1).bit_length() if L > 1 else 1
        if cnt == L:
            return a
        pad = np.full((cnt - L,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad])

    if long_idx:
        L = len(long_idx)
        co = _bucket(np.stack([coeffs[i] for i in long_idx]))
        if quant is not None and not (np.asarray(quant[2])[long_idx] != 0).all():
            qbuf, scales, deq, bands_long = quant
            fn = _dequant_imdct_long_jax(tuple(int(b) for b in bands_long))
            # Padding lanes get deq=1: they pass their (zero) coeffs
            # through, skipping the dequant gather.
            y = np.asarray(fn(
                co, _bucket(np.stack([qbuf[i] for i in long_idx])),
                _bucket(np.stack([scales[i] for i in long_idx])),
                _bucket(np.asarray(deq)[long_idx], fill=1)))[:L]
        else:
            y = np.asarray(_imdct_jax(1024)(co))[:L]
        for j, i in enumerate(long_idx):
            out[i] = y[j]
    if short_idx:
        S = len(short_idx) * 8
        stacked = _bucket(np.stack(
            [coeffs[i].reshape(8, 128) for i in short_idx]
        ).reshape(-1, 128))
        y = np.asarray(_imdct_jax(128)(stacked))[:S].reshape(
            len(short_idx), 8, 256)
        for j, i in enumerate(short_idx):
            out[i] = y[j]
    return out


@lru_cache(maxsize=None)
def _ola_tables():
    """Per-(seq, shape) window vectors for the batched OLA.

    head[seq, prev_shape] multiplies pcm[:1024]; delay[seq, shape]
    multiplies pcm[1024:] (dsp.rs:56-159 re-expressed as frame-local
    elementwise products — the overlap-add only ever spans adjacent
    frames, so the whole chain batches with one roll)."""
    dsp = Dsp()
    longs = [dsp.sine_long, dsp.kbd_long]
    shorts = [dsp.sine_short, dsp.kbd_short]
    z448 = np.zeros(448, np.float32)
    o448 = np.ones(448, np.float32)
    head = np.zeros((4, 2, 1024), np.float32)
    delay = np.zeros((4, 2, 1024), np.float32)
    for sh in range(2):
        head[ONLY_LONG, sh] = longs[sh]
        head[LONG_START, sh] = longs[sh]
        head[LONG_STOP, sh] = np.concatenate([z448, shorts[sh], o448])
        delay[ONLY_LONG, sh] = longs[sh][::-1]
        delay[LONG_STOP, sh] = longs[sh][::-1]
        delay[LONG_START, sh] = np.concatenate([o448, shorts[sh][::-1], z448])
    # Short-window left/right half-window vectors.
    s_first = np.stack(shorts)          # [2,128] left window of w=0 (prev shape)
    s_left = np.stack(shorts)           # [2,128] left window of w>0 (cur shape)
    s_right = np.stack([s[::-1] for s in shorts])  # [2,128]
    return head, delay, s_first, s_left, s_right


@lru_cache(maxsize=None)
def _ola_jax():
    import jax
    import jax.numpy as jnp

    # Close over numpy tables (converted per-trace inside `run`): capturing
    # jnp arrays here would create tracers when this cache is first built
    # inside an outer jit trace, leaking them into later traces.
    tables_np = _ola_tables()

    @jax.jit
    def run(pcm, seqs, shapes, prev_shapes):
        # pcm [L,2048] (short frames hold their 8x256 windows flattened).
        head_t, delay_t, s_first, s_left, s_right = (
            jnp.asarray(a) for a in tables_np)
        L = pcm.shape[0]
        head_vec = head_t[seqs, prev_shapes]        # [L,1024]
        delay_vec = delay_t[seqs, shapes]
        head_long = pcm[:, :1024] * head_vec
        delay_long = pcm[:, 1024:] * delay_vec

        # EIGHT_SHORT: in-frame OLA of 8 x 256 windows at hop 128.
        w8 = pcm.reshape(L, 8, 256)
        left0 = s_first[prev_shapes]                # [L,128]
        left = s_left[shapes]
        right = s_right[shapes]
        parts = []
        for w in range(8):
            lw = left0 if w == 0 else left
            seg = jnp.concatenate([w8[:, w, :128] * lw,
                                   w8[:, w, 128:] * right], axis=1)
            parts.append(jnp.pad(seg, ((0, 0), (w * 128, 1152 - 256 - w * 128))))
        s = sum(parts)                              # [L,1152]
        zpad = jnp.zeros((L, 448), pcm.dtype)
        head_short = jnp.concatenate([zpad, s[:, :576]], axis=1)
        delay_short = jnp.concatenate([s[:, 576:1152], zpad], axis=1)

        is_short = (seqs == EIGHT_SHORT)[:, None]
        head = jnp.where(is_short, head_short, head_long)
        delay = jnp.where(is_short, delay_short, delay_long)
        prev_delay = jnp.concatenate(
            [jnp.zeros((1, 1024), pcm.dtype), delay[:-1]], axis=0)
        return head + prev_delay                    # [L,1024]

    return run


def window_ola_batch(
    pcms: Sequence[np.ndarray],
    seqs: Sequence[int],
    shapes: Sequence[bool],
    prev_shapes: Sequence[bool],
) -> np.ndarray:
    """Batched device window/overlap-add over a whole frame sequence for one
    channel. Equivalent to :func:`window_ola_chain` (validated in tests) but
    with no sequential state — every frame's head and carried delay are
    frame-local elementwise products, combined with a single roll."""
    if not len(pcms):
        return np.zeros(0, np.float32)
    flat = np.stack([p.reshape(-1) for p in pcms])  # [L,2048]
    out = _ola_jax()(
        flat,
        np.asarray(seqs, np.int32),
        np.asarray(shapes, np.int32),
        np.asarray(prev_shapes, np.int32),
    )
    return np.asarray(out).reshape(-1)


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
