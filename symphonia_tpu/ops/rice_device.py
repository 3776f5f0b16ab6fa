"""Device (TPU) FLAC Rice entropy-decode prototype.

SURVEY.md §7 Phase B.1 asked whether the entropy stage can live on the
device instead of host C++ (VERDICT r1 #4: "measure, don't assume").
This is the friendliest case — FLAC Rice coding over ``[B]`` independent
lane cursors: every symbol is a unary prefix (count-leading-zeros on a
32-bit window) plus ``k`` remainder bits, so a ``lax.scan`` over symbol
index with gathers into the packed bitstream decodes B lanes per step.

Layout:
  words  [W]  uint32 big-endian packed bitstream (shared by all lanes)
  cur    [B]  absolute bit cursors
  param  [B]  per-lane Rice parameter k
  n      scalar symbols per lane (static; lanes shorter than n are masked)

Limitation (documented): a single symbol must fit a 32-bit window
(unary quotient + 1 + k <= 32). Real FLAC escapes to verbatim long before
that, and the host scan can flag oversized quotients for fallback; the
prototype asserts the bound in its oracle comparison.

Measured numbers live in CLAUDE.md next to the host C++ stage.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def pack_bits_u32(data: bytes) -> np.ndarray:
    """Bytes -> big-endian u32 words (padded)."""
    pad = (-len(data)) % 4
    a = np.frombuffer(data + b"\x00" * (pad + 8), dtype=">u4")
    return a.astype(np.uint32)


def rice_decode_lanes(words, cur, param, n: int):
    """Decode ``n`` Rice symbols per lane on device.

    words [W] u32, cur [B] i32 bit cursors, param [B] i32.
    Returns (residuals [B, n] i32, cur' [B]).
    """
    words = jnp.asarray(words, jnp.uint32)
    B = cur.shape[0]

    def window(cur32):
        wi = (cur32 >> 5).astype(jnp.int32)
        off = (cur32 & 31).astype(jnp.uint32)
        hi = words[wi]
        lo = words[wi + 1]
        # 64-bit window emulated with two u32s: take 32 bits at `off`.
        w = jnp.where(off == 0, hi,
                      (hi << off) | (lo >> ((32 - off) & 31)))
        return w

    def step(cur_c, _):
        w = window(cur_c)
        # Unary quotient: leading zeros of the window.
        q = lax.clz(w)
        cur1 = cur_c + q + 1
        w2 = window(cur1)
        k = param.astype(jnp.uint32)
        r = jnp.where(k == 0, jnp.uint32(0), w2 >> ((32 - k) & 31))
        cur2 = (cur1 + k).astype(cur_c.dtype)
        u = (q.astype(jnp.uint32) << k) | r
        # Zigzag to signed (decoder.rs:647 rice-to-signed mapping).
        v = ((u >> 1) ^ (~(u & 1) + 1)).astype(jnp.int32)
        return cur2, v

    cur_end, vals = lax.scan(step, cur.astype(jnp.uint32), None, length=n)
    return vals.T, cur_end  # [B, n]


def rice_decode_oracle(data: bytes, cur: np.ndarray, param: np.ndarray,
                       n: int) -> np.ndarray:
    """Scalar host oracle with identical semantics."""
    out = np.zeros((len(cur), n), np.int64)
    for l in range(len(cur)):
        pos = int(cur[l])
        k = int(param[l])
        for i in range(n):
            q = 0
            while not (data[pos >> 3] >> (7 - (pos & 7))) & 1:
                q += 1
                pos += 1
            pos += 1
            r = 0
            for _ in range(k):
                r = (r << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
                pos += 1
            u = (q << k) | r
            out[l, i] = (u >> 1) ^ -(u & 1)
    return out


def make_test_streams(B: int, n: int, k: int = 4, seed: int = 0):
    """B independent Rice-coded lanes packed into one bitstream
    (vectorized encoder: symbol bit positions by cumsum + packbits)."""
    rng = np.random.default_rng(seed)
    vals = rng.laplace(0.0, 6.0, size=(B, n)).astype(np.int64)
    flat = vals.reshape(-1)
    u = (flat << 1) ^ (flat >> 63)  # zigzag
    q = (u >> k).astype(np.int64)
    r = (u & ((1 << k) - 1)).astype(np.int64)
    lens = q + 1 + k
    starts = np.zeros(len(flat), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total = int(starts[-1] + lens[-1])
    bits = np.zeros(total + 64, np.uint8)
    bits[starts + q] = 1  # unary terminator
    if k:
        rem_pos = (starts + q + 1)[:, None] + np.arange(k)[None, :]
        rem_bits = (r[:, None] >> np.arange(k - 1, -1, -1)[None, :]) & 1
        bits[rem_pos.reshape(-1)] = rem_bits.reshape(-1).astype(np.uint8)
    data = np.packbits(bits).tobytes()
    cursors = starts.reshape(B, n)[:, 0].copy()
    return data, cursors, vals
