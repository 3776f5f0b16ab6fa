"""Exact 64-bit integer arithmetic emulated with 32-bit limbs on TPU.

TPUs have no native int64; the FLAC/ALAC integer LPC accumulators need up to
~46 bits (|coef| < 2^15, |sample| < 2^26, order <= 32 => |acc| < 2^46).
Values are carried as ``(hi: int32, lo: uint32)`` two's-complement limb
pairs: ``value = hi * 2^32 + lo``. All ops are elementwise and vectorize
over any batch shape.

Reference semantics being reproduced: bundle-flac/src/decoder.rs:716
(``lpc_predict`` i64 accumulation + arithmetic shift).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def i64_from_i32(x):
    """Sign-extend int32 -> (hi, lo)."""
    lo = x.astype(jnp.uint32)
    hi = (x >> 31).astype(jnp.int32)  # arithmetic: all ones if negative
    return hi, lo


def i64_mul_i32(a, b):
    """Exact signed product of two int32 arrays -> (hi int32, lo uint32).

    Schoolbook 16-bit limb multiply of the unsigned reinterpretations, then
    the standard signed correction ``hi -= (a<0 ? b : 0) + (b<0 ? a : 0)``.
    """
    au = a.astype(jnp.uint32)
    bu = b.astype(jnp.uint32)
    a0 = au & 0xFFFF
    a1 = au >> 16
    b0 = bu & 0xFFFF
    b1 = bu >> 16
    p00 = a0 * b0  # < 2^32, exact in uint32
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10  # may wrap: carry detected below
    mid_carry = (mid < p01).astype(jnp.uint32)  # lost 2^32 => 2^16 in hi
    lo = p00 + (mid << 16)
    carry1 = (lo < p00).astype(jnp.uint32)
    hi_u = p11 + (mid >> 16) + (mid_carry << 16) + carry1
    # Signed correction: a*b = au*bu - 2^32*(b if a<0) - 2^32*(a if b<0)
    hi_u = hi_u - jnp.where(a < 0, bu, jnp.uint32(0))
    hi_u = hi_u - jnp.where(b < 0, au, jnp.uint32(0))
    return hi_u.astype(jnp.int32), lo


def i64_add(a, b):
    """(hi, lo) + (hi, lo) with carry."""
    ah, al = a
    bh, bl = b
    lo = al + bl
    carry = (lo < al).astype(jnp.int32)
    hi = ah + bh + carry
    return hi, lo


def i64_sum_products(a, b, axis=-1):
    """Exact sum over ``axis`` of elementwise int32 products a*b.

    Decomposes each product into (hi, lo) and sums lo in 16-bit halves so no
    intermediate overflows: sum(p) = (sum hi)*2^32 + sum lo, with
    sum lo = s0 + s1*2^16, s0/s1 < n*2^16 (exact for n <= 65536 terms).
    """
    hi, lo = i64_mul_i32(a, b)
    s0 = jnp.sum(lo & jnp.uint32(0xFFFF), axis=axis, dtype=jnp.uint32)
    s1 = jnp.sum(lo >> 16, axis=axis, dtype=jnp.uint32)
    lo_total = s0 + (s1 << 16)
    hi_from_lo = ((s1 + (s0 >> 16)) >> 16).astype(jnp.int32)
    hi_total = jnp.sum(hi, axis=axis, dtype=jnp.int32) + hi_from_lo
    return hi_total, lo_total


def i64_shr_to_i32(hi, lo, s):
    """Arithmetic (value >> s) truncated to int32, s in [0, 31] per element.

    Valid when the shifted value fits int32 (guaranteed for conformant FLAC:
    the predicted sample is sample-ranged).
    """
    s = s.astype(jnp.uint32)
    lo_part = lax.shift_right_logical(lo, s)
    hi_u = hi.astype(jnp.uint32)
    left = jnp.where(
        s == 0, jnp.uint32(0), lax.shift_left(hi_u, jnp.uint32(32) - s)
    )
    return (lo_part | left).astype(jnp.int32)
