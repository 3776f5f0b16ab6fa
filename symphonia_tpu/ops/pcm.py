"""PCM sample conversion kernels.

TPU re-expression of symphonia-codec-pcm/src/lib.rs:210-412: raw packet
bytes -> planar samples. On device this is a fused gather/combine/cast over
a ``[B, max_bytes]`` uint8 batch; bytes combine into samples with shifts and
the result lands as int32 (bit-exact) or float32.

The host (numpy) implementations are the oracle and the small-packet path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# G.711 companding tables (codec-pcm lib.rs:154-181)
# ---------------------------------------------------------------------------


def _build_mulaw_table() -> np.ndarray:
    """CCITT G.711 mu-law -> linear16."""
    out = np.zeros(256, dtype=np.int16)
    for u in range(256):
        v = ~u & 0xFF
        t = ((v & 0x0F) << 3) + 0x84
        t <<= (v & 0x70) >> 4
        out[u] = (0x84 - t) if (v & 0x80) else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    """CCITT G.711 A-law -> linear16."""
    out = np.zeros(256, dtype=np.int16)
    for a in range(256):
        v = a ^ 0x55
        t = (v & 0x0F) << 4
        seg = (v & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[a] = t if (v & 0x80) else -t
    return out


MULAW_TABLE = _build_mulaw_table()
ALAW_TABLE = _build_alaw_table()


# ---------------------------------------------------------------------------
# Host (numpy) decode — the oracle
# ---------------------------------------------------------------------------

_INT_DTYPES = {
    ("s16", False): "<i2", ("s16", True): ">i2",
    ("u16", False): "<u2", ("u16", True): ">u2",
    ("s32", False): "<i4", ("s32", True): ">i4",
    ("u32", False): "<u4", ("u32", True): ">u4",
    ("f32", False): "<f4", ("f32", True): ">f4",
    ("f64", False): "<f8", ("f64", True): ">f8",
}


def decode_pcm_np(
    data: bytes,
    codec: str,
    channels: int,
    bits_per_coded_sample: int | None = None,
) -> np.ndarray:
    """Decode interleaved PCM bytes -> planar [ch, frames] samples.

    Integer output is int32 right-justified at the *coded* width; float
    output is float32/float64. Mirrors codec-pcm lib.rs:318-412 incl. the
    bits_per_coded_sample sub-width shift.
    """
    # Truncated final sample (malformed/cut streams): clip to whole
    # samples like the reference's frame-bounded reads; a partial trailing
    # sample is dropped rather than raising out of the taxonomy.
    _widths = {"pcm_u8": 1, "pcm_s8": 1, "pcm_alaw": 1, "pcm_mulaw": 1,
               "pcm_s16le": 2, "pcm_s16be": 2, "pcm_u16le": 2,
               "pcm_u16be": 2, "pcm_s24le": 3, "pcm_s24be": 3,
               "pcm_u24le": 3, "pcm_u24be": 3, "pcm_s32le": 4,
               "pcm_s32be": 4, "pcm_u32le": 4, "pcm_u32be": 4,
               "pcm_f32le": 4, "pcm_f32be": 4, "pcm_f64le": 8,
               "pcm_f64be": 8}
    if channels < 1:
        raise ValueError("PCM decode requires at least one channel")
    w = _widths.get(codec, 1) * max(1, channels)
    if len(data) % w:
        data = data[: len(data) - (len(data) % w)]
    if codec == "pcm_u8":
        x = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        bits = 8
    elif codec == "pcm_s8":
        x = np.frombuffer(data, dtype=np.int8).astype(np.int32)
        bits = 8
    elif codec in ("pcm_s16le", "pcm_s16be"):
        x = np.frombuffer(data, dtype=_INT_DTYPES[("s16", codec.endswith("be"))]).astype(np.int32)
        bits = 16
    elif codec in ("pcm_u16le", "pcm_u16be"):
        x = np.frombuffer(data, dtype=_INT_DTYPES[("u16", codec.endswith("be"))]).astype(np.int32) - 32768
        bits = 16
    elif codec in ("pcm_s24le", "pcm_s24be"):
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        if codec.endswith("be"):
            b = b[:, ::-1]
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = (x << 8) >> 8  # sign-extend 24 -> 32
        bits = 24
    elif codec in ("pcm_u24le", "pcm_u24be"):
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        if codec.endswith("be"):
            b = b[:, ::-1]
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        ) - (1 << 23)
        bits = 24
    elif codec in ("pcm_s32le", "pcm_s32be"):
        x = np.frombuffer(data, dtype=_INT_DTYPES[("s32", codec.endswith("be"))]).astype(np.int32)
        bits = 32
    elif codec in ("pcm_u32le", "pcm_u32be"):
        x = (
            np.frombuffer(data, dtype=_INT_DTYPES[("u32", codec.endswith("be"))]).astype(np.int64)
            - (1 << 31)
        ).astype(np.int32)
        bits = 32
    elif codec in ("pcm_f32le", "pcm_f32be"):
        x = np.frombuffer(data, dtype=_INT_DTYPES[("f32", codec.endswith("be"))]).astype(np.float32)
        bits = None
    elif codec in ("pcm_f64le", "pcm_f64be"):
        x = np.frombuffer(data, dtype=_INT_DTYPES[("f64", codec.endswith("be"))]).astype(np.float64)
        bits = None
    elif codec == "pcm_mulaw":
        x = MULAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(np.int32)
        bits = 16
    elif codec == "pcm_alaw":
        x = ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(np.int32)
        bits = 16
    else:
        raise ValueError(f"not a PCM codec: {codec}")

    # Sub-width samples stored right-justified in a wider container
    # (lib.rs:318-412): shift down to the coded width.
    if (
        bits is not None
        and bits_per_coded_sample
        and bits_per_coded_sample < bits
        and codec not in ("pcm_alaw", "pcm_mulaw")
    ):
        x = x >> (bits - bits_per_coded_sample)

    frames = len(x) // channels
    return np.ascontiguousarray(x[: frames * channels].reshape(frames, channels).T)


# ---------------------------------------------------------------------------
# Device (jax) batch kernel
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("bytes_per_sample", "big_endian", "signed", "bits"))
def _combine_bytes_int(batch_u8, bytes_per_sample, big_endian, signed, bits):
    """[B, N] uint8 -> [B, N/bps] int32 samples (device).

    Combines little/big-endian byte groups and sign-extends to the coded
    width. All shapes static; XLA fuses this into a single pass.
    """
    B, N = batch_u8.shape
    n = N // bytes_per_sample
    b = batch_u8[:, : n * bytes_per_sample].reshape(B, n, bytes_per_sample).astype(jnp.int32)
    if big_endian:
        b = b[:, :, ::-1]
    x = jnp.zeros((B, n), dtype=jnp.int32)
    for i in range(bytes_per_sample):
        x = x | (b[:, :, i] << (8 * i))
    shift = 32 - 8 * bytes_per_sample
    if shift > 0:
        x = (x << shift) >> shift if signed else x
    if not signed:
        x = x - (1 << (bits - 1))
    return x


def decode_pcm_batch_jax(batch_u8: jnp.ndarray, codec: str) -> jnp.ndarray:
    """Decode a padded [B, max_bytes] uint8 batch on device -> [B, samples].

    Returns int32 samples (or float32 for float codecs). Channel
    de-interleave and trimming to true lengths happen in the caller, where
    per-packet shapes are known.
    """
    be = codec.endswith("be")
    if codec in ("pcm_u8",):
        return batch_u8.astype(jnp.int32) - 128
    if codec in ("pcm_s8",):
        return batch_u8.astype(jnp.int8).astype(jnp.int32)
    if codec in ("pcm_s16le", "pcm_s16be"):
        return _combine_bytes_int(batch_u8, 2, be, True, 16)
    if codec in ("pcm_u16le", "pcm_u16be"):
        return _combine_bytes_int(batch_u8, 2, be, False, 16)
    if codec in ("pcm_s24le", "pcm_s24be"):
        return _combine_bytes_int(batch_u8, 3, be, True, 24)
    if codec in ("pcm_u24le", "pcm_u24be"):
        return _combine_bytes_int(batch_u8, 3, be, False, 24)
    if codec in ("pcm_s32le", "pcm_s32be"):
        return _combine_bytes_int(batch_u8, 4, be, True, 32)
    if codec in ("pcm_u32le", "pcm_u32be"):
        x = _combine_bytes_int(batch_u8, 4, be, True, 32)
        return x ^ jnp.int32(-(1 << 31))  # u32 recenter via sign-bit flip
    if codec in ("pcm_f32le", "pcm_f32be"):
        x = _combine_bytes_int(batch_u8, 4, be, True, 32)
        return jax.lax.bitcast_convert_type(x, jnp.float32)
    if codec in ("pcm_mulaw", "pcm_alaw"):
        table = jnp.asarray(
            MULAW_TABLE if codec == "pcm_mulaw" else ALAW_TABLE, dtype=jnp.int32
        )
        return table[batch_u8.astype(jnp.int32)]
    raise ValueError(f"no device kernel for codec {codec}")
