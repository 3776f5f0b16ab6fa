"""FLAC dense-stage TPU kernels: batched predictor reconstruction + stereo
decorrelation.

TPU-first re-expression of bundle-flac/src/decoder.rs:663-716 (fixed/LPC
prediction) and :32-83 (decorrelation). Every subframe kind is normalized to
one uniform integer-LPC recurrence so a single ``lax.scan`` reconstructs a
whole ``[lanes]`` batch of subframes in lockstep:

* constant/verbatim -> order 0 (x[n] = r[n]; residuals carry the payload)
* fixed order k     -> LPC with binomial coefficients, shift 0
* LPC order k       -> as coded

The recurrence x[n] = r[n] + (sum_j c_j * x[n-1-j]) >> shift is
sample-sequential (the truncating shift is nonlinear), so the scan runs over
the sample axis with all lanes in parallel on the VPU; the 64-bit
accumulator is emulated with 32-bit limbs (ops.i64emu). Exact for streams up
to 24-bit (33-bit side channels of 32-bit streams fall back to the host
path).

Residual layout per lane: positions [0, order) hold the warmup samples,
positions [order, block) the residuals, the tail zero-padded to ``n_max``.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .i64emu import i64_shr_to_i32, i64_sum_products

MAX_ORDER = 32

# Fixed predictor coefficients, zero-padded (decoder.rs:663).
FIXED_COEFS_PAD = np.zeros((5, MAX_ORDER), dtype=np.int32)
for _k, _c in {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}.items():
    FIXED_COEFS_PAD[_k, : len(_c)] = _c


@partial(jax.jit, static_argnames=("n_samples",))
def lpc_reconstruct_batch(
    res_packed: jnp.ndarray,  # int32 [L, n_max] warmup+residual layout
    coefs: jnp.ndarray,  # int32 [L, 32], coefs[:, j] multiplies x[n-1-j]
    order: jnp.ndarray,  # int32 [L]
    shift: jnp.ndarray,  # int32 [L]
    n_samples: int,
) -> jnp.ndarray:
    """Reconstruct ``n_samples`` samples for every lane. Returns [L, n]."""
    L = res_packed.shape[0]

    def step(hist, inputs):
        # hist: [L, 32] with hist[:, j] = x[n-1-j]
        r_n, n = inputs
        acc_hi, acc_lo = i64_sum_products(coefs, hist, axis=1)  # [L]
        pred = i64_shr_to_i32(acc_hi, acc_lo, shift)
        x_n = jnp.where(n < order, r_n, r_n + pred)
        hist = jnp.concatenate([x_n[:, None], hist[:, : MAX_ORDER - 1]], axis=1)
        return hist, x_n

    ns = jnp.arange(n_samples, dtype=jnp.int32)
    hist0 = jnp.zeros((L, MAX_ORDER), dtype=jnp.int32)
    # scan over the sample axis: xs leading dim = n_samples
    _, ys = lax.scan(step, hist0, (res_packed[:, :n_samples].T, ns))
    return ys.T  # [L, n_samples]


@jax.jit
def apply_wasted_bits(x: jnp.ndarray, wasted: jnp.ndarray) -> jnp.ndarray:
    """x << wasted per lane (decoder.rs:239-242)."""
    return lax.shift_left(x, wasted[:, None].astype(jnp.int32))


# Channel assignment codes for the batch path.
ASSIGN_INDEPENDENT = 0
ASSIGN_LEFT_SIDE = 1
ASSIGN_RIGHT_SIDE = 2
ASSIGN_MID_SIDE = 3


@jax.jit
def decorrelate_batch(x: jnp.ndarray, assignment: jnp.ndarray) -> jnp.ndarray:
    """Undo stereo decorrelation for a [F, 2, n] batch given per-frame
    assignment codes [F] (decoder.rs:32-83). Frames with other channel
    counts use ASSIGN_INDEPENDENT and pass through."""
    c0 = x[:, 0, :]
    c1 = x[:, 1, :]
    a = assignment[:, None]

    # left/side: L = c0, R = c0 - c1
    ls0, ls1 = c0, c0 - c1
    # side/right: L = c0 + c1, R = c1
    rs0, rs1 = c0 + c1, c1
    # mid/side: m2 = (mid << 1) | (side & 1); L = (m2+side)>>1, R = (m2-side)>>1
    m2 = (c0 << 1) | (c1 & 1)
    ms0, ms1 = (m2 + c1) >> 1, (m2 - c1) >> 1

    out0 = jnp.where(
        a == ASSIGN_LEFT_SIDE, ls0,
        jnp.where(a == ASSIGN_RIGHT_SIDE, rs0,
                  jnp.where(a == ASSIGN_MID_SIDE, ms0, c0)),
    )
    out1 = jnp.where(
        a == ASSIGN_LEFT_SIDE, ls1,
        jnp.where(a == ASSIGN_RIGHT_SIDE, rs1,
                  jnp.where(a == ASSIGN_MID_SIDE, ms1, c1)),
    )
    return jnp.stack([out0, out1], axis=1)


# ---------------------------------------------------------------------------
# Host-side packing helpers (Phase A -> Phase B glue)
# ---------------------------------------------------------------------------


def pack_parsed_frames(frames, n_max: int | None = None):
    """Pack a list of ``codecs.flac.ParsedFrame`` into the batch tensors.

    Returns a dict of numpy arrays: res [L, n_max], coefs [L, 32],
    order/shift/wasted [L], lane->(frame, channel) metadata, block sizes,
    assignment codes [F], and per-frame bps. Lanes are frame-major
    (lane = f * C + c) with C = max channel count in the batch.
    """
    from ..codecs.flac import SF_CONSTANT, SF_FIXED, SF_LPC, SF_VERBATIM
    from ..common.flac import (
        CHANNELS_LEFT_SIDE,
        CHANNELS_MID_SIDE,
        CHANNELS_RIGHT_SIDE,
    )

    F = len(frames)
    C = max(f.header.n_channels for f in frames)
    if n_max is None:
        n_max = max(f.header.block_size for f in frames)
    L = F * C
    res = np.zeros((L, n_max), dtype=np.int32)
    coefs = np.zeros((L, MAX_ORDER), dtype=np.int32)
    order = np.zeros(L, dtype=np.int32)
    shift = np.zeros(L, dtype=np.int32)
    wasted = np.zeros(L, dtype=np.int32)
    block = np.zeros(F, dtype=np.int32)
    assign = np.zeros(F, dtype=np.int32)
    bps = np.zeros(F, dtype=np.int32)

    amap = {
        CHANNELS_LEFT_SIDE: ASSIGN_LEFT_SIDE,
        CHANNELS_RIGHT_SIDE: ASSIGN_RIGHT_SIDE,
        CHANNELS_MID_SIDE: ASSIGN_MID_SIDE,
    }
    for fi, fr in enumerate(frames):
        bs = fr.header.block_size
        block[fi] = bs
        assign[fi] = amap.get(fr.header.channel_assignment, ASSIGN_INDEPENDENT)
        bps[fi] = fr.bits_per_sample
        for ci, sf in enumerate(fr.subframes):
            ln = fi * C + ci
            wasted[ln] = sf.wasted_bits
            if sf.kind == SF_CONSTANT:
                res[ln, :bs] = sf.constant
            elif sf.kind == SF_VERBATIM:
                res[ln, :bs] = sf.verbatim
            elif sf.kind == SF_FIXED:
                k = sf.order
                order[ln] = k
                coefs[ln] = FIXED_COEFS_PAD[k]
                res[ln, :k] = sf.warmup
                res[ln, k:bs] = sf.residuals
            elif sf.kind == SF_LPC:
                k = sf.order
                order[ln] = k
                shift[ln] = sf.shift
                coefs[ln, :k] = sf.coefs
                res[ln, :k] = sf.warmup
                res[ln, k:bs] = sf.residuals
    return {
        "res": res, "coefs": coefs, "order": order, "shift": shift,
        "wasted": wasted, "block": block, "assign": assign, "bps": bps,
        "F": F, "C": C, "n_max": n_max,
    }


def decode_packed(packed) -> np.ndarray:
    """Run the device pipeline on packed tensors -> int32 [F, C, n_max]."""
    x = lpc_reconstruct_batch(
        jnp.asarray(packed["res"]),
        jnp.asarray(packed["coefs"]),
        jnp.asarray(packed["order"]),
        jnp.asarray(packed["shift"]),
        packed["n_max"],
    )
    x = apply_wasted_bits(x, jnp.asarray(packed["wasted"]))
    F, C = packed["F"], packed["C"]
    x = x.reshape(F, C, packed["n_max"])
    if C == 2:
        x = decorrelate_batch(x, jnp.asarray(packed["assign"]))
    return np.asarray(x)
