"""MP3 (Layer III) dense-stage math as batched linear algebra.

TPU-first re-expression of symphonia-bundle-mp3's hybrid synthesis + 32-band
polyphase filterbank (layer3/hybrid_synthesis.rs:280-824, synthesis.rs):

* The per-subband 36/12-point IMDCT + window + short-window overlap layout
  is *linear* in the 18 spectral samples, so each block type collapses to a
  single ``[36, 18]`` matrix ``T_bt`` — batched over (granule, channel,
  subband) lanes it is one MXU matmul.
* The polyphase "matrixing" is the spec's ``[64, 32]`` cosine matrix
  (ISO/IEC 11172-3 2.4.3.5) — another matmul.
* Both the hybrid overlap-add and the 16-slot synthesis FIFO are linear
  delay structures, so cross-granule state is eliminated by superposition:
  each granule independently produces its full response (576 + 480 tail
  samples) and adjacent granules' tails overlap-add. No sequential scan —
  every granule in a batch decodes in parallel.

The numpy implementations here are the oracle and serve the stateful
per-packet decoder; the jax versions batch over ``[lanes]`` for the device
pipeline.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

BLOCK_LONG = 0
BLOCK_START = 1
BLOCK_SHORT = 2
BLOCK_END = 3


# ---------------------------------------------------------------------------
# Table construction (all from ISO/IEC 11172-3 formulas)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def imdct_windows() -> np.ndarray:
    """The four 36-point block windows (hybrid_synthesis.rs:53-92)."""
    w = np.zeros((4, 36))
    i = np.arange(36)
    w[BLOCK_LONG] = np.sin(np.pi / 36 * (i + 0.5))
    w[BLOCK_START, :18] = np.sin(np.pi / 36 * (i[:18] + 0.5))
    w[BLOCK_START, 18:24] = 1.0
    w[BLOCK_START, 24:30] = np.sin(np.pi / 12 * (np.arange(24, 30) - 18 + 0.5))
    w[BLOCK_SHORT, :12] = np.sin(np.pi / 12 * (i[:12] + 0.5))
    w[BLOCK_END, 6:12] = np.sin(np.pi / 12 * (np.arange(6, 12) - 6 + 0.5))
    w[BLOCK_END, 12:18] = 1.0
    w[BLOCK_END, 18:] = np.sin(np.pi / 36 * (i[18:] + 0.5))
    return w


@lru_cache(maxsize=None)
def hybrid_matrices() -> np.ndarray:
    """``T[bt] @ x[18] -> tmp[36]`` for each block type.

    Long/start/end: tmp[i] = w[i] * sum_k x[k] cos(pi/72 (2i+19)(2k+1)).
    Short: three 12-point IMDCTs of the interleaved windows, windowed and
    overlap-laid into tmp[6..30] (hybrid_synthesis.rs imdct12_win).
    """
    wins = imdct_windows()
    T = np.zeros((4, 36, 18))
    i = np.arange(36)[:, None]
    k = np.arange(18)[None, :]
    imdct36 = np.cos(np.pi / 72 * (2 * i + 19) * (2 * k + 1))
    for bt in (BLOCK_LONG, BLOCK_START, BLOCK_END):
        T[bt] = imdct36 * wins[bt][:, None]
    # Short blocks.
    ii = np.arange(12)[:, None]
    kk = np.arange(6)[None, :]
    imdct12 = np.cos(np.pi / 24 * (2 * ii + 7) * (2 * kk + 1))  # [12, 6]
    ws = wins[BLOCK_SHORT][:12]
    for w in range(3):
        for iout in range(12):
            for kin in range(6):
                T[BLOCK_SHORT, 6 + 6 * w + iout, 3 * kin + w] += (
                    imdct12[iout, kin] * ws[iout]
                )
    return T.astype(np.float32)


@lru_cache(maxsize=None)
def antialias_coeffs():
    """cs/ca butterfly coefficients (ISO 11172-3 Table B.9 construction)."""
    c = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
    den = np.sqrt(1.0 + c * c)
    return (1.0 / den).astype(np.float32), (c / den).astype(np.float32)


@lru_cache(maxsize=None)
def polyphase_matrix() -> np.ndarray:
    """Spec matrixing N[i, k] = cos((16 + i)(2k + 1) pi / 64), [64, 32]."""
    i = np.arange(64)[:, None]
    k = np.arange(32)[None, :]
    return np.cos((16 + i) * (2 * k + 1) * np.pi / 64).astype(np.float32)


@lru_cache(maxsize=None)
def synthesis_window() -> np.ndarray:
    """ISO Table B.3 synthesis window D reshaped to [16, 32]."""
    from ..codecs.mpa_common import tables

    return tables()["synthesis_d"].reshape(16, 32)


@lru_cache(maxsize=None)
def freq_inversion_mask() -> np.ndarray:
    """[32, 18] sign mask: odd samples of odd subbands are negated
    (hybrid_synthesis.rs frequency_inversion)."""
    sb = np.arange(32)[:, None]
    t = np.arange(18)[None, :]
    return np.where((sb & 1) & (t & 1), -1.0, 1.0).astype(np.float32)


@lru_cache(maxsize=None)
def _synth_conv_kernel() -> np.ndarray:
    """[16, 64, 32] conv kernel for the polyphase windowed taps, width axis
    pre-flipped for lax.conv correlation semantics: kernel[dw, j, i] =
    D[32*(15-dw) + i] * [j == q(15-dw, i)]."""
    W = synthesis_window()
    q = _synth_sel_idx()
    K = np.zeros((16, 64, 32), dtype=np.float32)
    for dw in range(16):
        k = 15 - dw
        for i in range(32):
            K[dw, q[k, i], i] = W[k, i]
    return K


@lru_cache(maxsize=None)
def _synth_sel_idx() -> np.ndarray:
    """QIDX[k, i]: which of v[64] feeds output tap k at sample i
    (even k -> lower half, odd k -> upper half; synthesis.rs:313-324)."""
    k = np.arange(16)[:, None]
    i = np.arange(32)[None, :]
    return (i + 32 * (k & 1)).astype(np.int32)


# ---------------------------------------------------------------------------
# numpy granule pipeline (oracle + stateful per-packet path)
# ---------------------------------------------------------------------------


def antialias_np(x: np.ndarray, n_boundaries: int) -> np.ndarray:
    """Anti-alias butterflies on a [32, 18] granule buffer.

    ``n_boundaries``: 31 for long-ish blocks, 1 for mixed, 0 for short
    (hybrid_synthesis.rs:224-280; applying the butterfly at a boundary
    between two zero subbands is a no-op, so the rzero bound is dropped).
    """
    if n_boundaries == 0:
        return x
    cs, ca = antialias_coeffs()
    y = x.copy()
    for b in range(1, 1 + n_boundaries):
        lo = x[b - 1, 17:9:-1]  # samples 17..10 of the lower subband
        hi = x[b, 0:8]
        y[b - 1, 17:9:-1] = lo * cs - hi * ca
        y[b, 0:8] = hi * cs + lo * ca
    return y


def hybrid_synthesis_np(x: np.ndarray, block_type: int, mixed: bool) -> np.ndarray:
    """[32, 18] spectral -> [32, 36] windowed IMDCT responses (pre-OLA)."""
    T = hybrid_matrices()
    if block_type == BLOCK_SHORT:
        if mixed:
            out = np.einsum("ij,sj->si", T[BLOCK_SHORT], x).astype(np.float32)
            out[:2] = np.einsum("ij,sj->si", T[BLOCK_LONG], x[:2])
            return out
        return np.einsum("ij,sj->si", T[BLOCK_SHORT], x).astype(np.float32)
    return np.einsum("ij,sj->si", T[block_type], x).astype(np.float32)


def polyphase_response_np(hybrid_out: np.ndarray) -> np.ndarray:
    """[32 sb, T t] time-domain subband samples -> [32*T + 480] response.

    Computes this granule's full contribution to the PCM stream via the
    matrixing matmul + windowed FIR taps; the 480-sample tail belongs to
    following granules (superposition form of synthesis.rs:158-348).
    T = 18 for Layer III granules, 12 for Layer I frames, 36 for Layer II.
    """
    N = polyphase_matrix()
    W = synthesis_window()
    qidx = _synth_sel_idx()
    S = hybrid_out.T  # [T, 32 sb]
    T = S.shape[0]
    V = S @ N.T  # [T, 64]
    v_sel = V[:, qidx]  # [T, 16, 32]
    c = v_sel * W[None, :, :]  # [T, 16, 32]
    out = np.zeros((T + 15, 32), dtype=np.float32)
    for k in range(16):
        out[k : k + T] += c[:, k, :]
    return out.reshape(-1)


class GranuleDenseState:
    """Carries cross-granule linear state for the stateful per-packet path:
    the hybrid overlap tail and the pending polyphase response tail."""

    def __init__(self):
        self.hybrid_tail = np.zeros((32, 18), dtype=np.float32)
        self.synth_tail = np.zeros(480, dtype=np.float32)

    def reset(self):
        self.hybrid_tail[:] = 0
        self.synth_tail[:] = 0


def granule_dense_np(
    x: np.ndarray, block_type: int, mixed: bool, state: GranuleDenseState
) -> np.ndarray:
    """Full dense stage for one granule-channel: [576] spectral (reordered,
    stereo-decoded) -> [576] PCM, updating carried state."""
    xb = x.reshape(32, 18)
    n_bounds = 0 if (block_type == BLOCK_SHORT and not mixed) else (
        1 if block_type == BLOCK_SHORT else 31
    )
    xb = antialias_np(xb, n_bounds)
    tmp = hybrid_synthesis_np(xb, block_type, mixed)  # [32, 36]
    sb_time = tmp[:, :18] + state.hybrid_tail
    state.hybrid_tail = tmp[:, 18:].copy()
    sb_time = sb_time * freq_inversion_mask()
    resp = polyphase_response_np(sb_time)
    out = resp[:576].copy()
    out[:480] += state.synth_tail
    state.synth_tail = resp[576:].copy()
    return out


# ---------------------------------------------------------------------------
# jax batched device pipeline
# ---------------------------------------------------------------------------


def _jnp():
    import jax.numpy as jnp

    return jnp


def mp3_dense_batch_jax(x, bt, mixed, hybrid_tail0=None, synth_tail0=None):
    """Device dense stage for a granule sequence batch.

    Args:
      x: [G, C, 576] float32 spectra (requantized, stereo-decoded,
         reordered) for G consecutive granules of one stream, C channels.
      bt: [G, C] int32 block types, mixed: [G, C] bool.
      hybrid_tail0: [C, 32, 18] carried hybrid overlap (None = stream start).
      synth_tail0: [C, 480] carried synthesis tail.

    Returns (pcm [G, C, 576], hybrid_tail [C, 32, 18], synth_tail [C, 480]).

    All granules process in parallel; the two linear cross-granule couplings
    (hybrid overlap-add, polyphase FIFO) are applied by superposition:
    shift-adds along the granule axis (see module docstring).
    """
    import jax
    import jax.numpy as jnp

    G, C, _ = x.shape
    L = G * C
    xb = x.reshape(L, 32, 18)
    btf = bt.reshape(L)
    mixedf = mixed.reshape(L)

    # --- antialias (hybrid_synthesis.rs:224) ---
    cs, ca = antialias_coeffs()
    cs = jnp.asarray(cs)
    ca = jnp.asarray(ca)
    n_bounds = jnp.where(btf == BLOCK_SHORT, jnp.where(mixedf, 1, 0), 31)
    lo_r = xb[:, :31, 10:18][..., ::-1]
    hi = xb[:, 1:32, 0:8]
    nl = lo_r * cs - hi * ca
    nh = hi * cs + lo_r * ca
    bmask = (jnp.arange(31)[None, :] < n_bounds[:, None])[:, :, None]
    nl = jnp.where(bmask, nl, lo_r)
    nh = jnp.where(bmask, nh, hi)
    # Reassemble by concatenation (scatters are slow on TPU): samples 0..7
    # come from the butterflies of the boundary below, 10..17 from the
    # boundary above; 8..9 pass through.
    head = jnp.concatenate([xb[:, :1, 0:8], nh], axis=1)  # [L, 32, 8]
    tail = jnp.concatenate([nl[..., ::-1], xb[:, 31:, 10:18]], axis=1)
    xb = jnp.concatenate([head, xb[:, :, 8:10], tail], axis=2)

    # --- hybrid IMDCT as matmuls ---
    # One large MXU matmul per block type (shared [36, 18] matrix), then a
    # per-lane one-hot select — far faster than per-lane batched matmuls.
    T = jnp.asarray(hybrid_matrices())  # [4, 36, 18]
    flat = xb.reshape(L * 32, 18)
    outs = jnp.stack(
        [
            (flat @ T[b].T).reshape(L, 32, 36)
            for b in (BLOCK_LONG, BLOCK_START, BLOCK_SHORT, BLOCK_END)
        ]
    )  # [4, L, 32, 36] (index == block type)
    lt = jnp.where(btf == BLOCK_SHORT, BLOCK_LONG, btf)
    onehot = (jnp.arange(4)[:, None] == lt[None, :]).astype(jnp.float32)
    out_long = jnp.einsum("bl,blsi->lsi", onehot, outs)
    out_short = outs[BLOCK_SHORT]
    sb_split = jnp.where(btf == BLOCK_SHORT, jnp.where(mixedf, 2, 0), 32)
    sb_idx = jnp.arange(32)[None, :, None]
    tmp = jnp.where(sb_idx < sb_split[:, None, None], out_long, out_short)
    # [L, 32, 36]

    # --- hybrid overlap-add by superposition along G ---
    tmp = tmp.reshape(G, C, 32, 36)
    heads = tmp[:, :, :, :18]
    tails = tmp[:, :, :, 18:]
    if hybrid_tail0 is None:
        hybrid_tail0 = jnp.zeros((C, 32, 18), jnp.float32)
    prev = jnp.concatenate([hybrid_tail0[None], tails[:-1]], axis=0)
    sb_time = heads + prev  # [G, C, 32, 18]
    hybrid_tail = tails[-1]

    # --- frequency inversion ---
    sb_time = sb_time * jnp.asarray(freq_inversion_mask())

    # --- polyphase matrixing + windowed taps as one conv ---
    # resp[l, m, i] = sum_k V[l, m-k, q(k,i)] * D[32k+i]: a width-16 "full"
    # convolution over the 18 time steps with a [16, 64, 32] kernel — a
    # single MXU op instead of materializing the [L, 18, 16, 32] tap gather.
    N = jnp.asarray(polyphase_matrix())  # [64, 32]
    S = sb_time.transpose(0, 1, 3, 2).reshape(L, 18, 32)
    V = jnp.einsum("ltk,ik->lti", S, N, preferred_element_type=jnp.float32)
    K = jnp.asarray(_synth_conv_kernel())  # [16, 64, 32], width-flipped
    resp = jax.lax.conv_general_dilated(
        V, K, window_strides=(1,), padding=[(15, 15)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [L, 33, 32]
    resp = resp.reshape(G, C, 1056)

    # --- cross-granule synthesis overlap-add by superposition ---
    if synth_tail0 is None:
        synth_tail0 = jnp.zeros((C, 480), jnp.float32)
    prev_tail = jnp.concatenate([synth_tail0[None], resp[:-1, :, 576:]], axis=0)
    pcm = jnp.concatenate(
        [resp[:, :, :480] + prev_tail, resp[:, :, 480:576]], axis=2
    )
    synth_tail = resp[-1, :, 576:]
    return pcm, hybrid_tail, synth_tail
