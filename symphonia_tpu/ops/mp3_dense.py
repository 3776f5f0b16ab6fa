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
def _polyphase_combined_matrix(T: int = 18) -> np.ndarray:
    """[(T+15)*32, T*32] matrix for an ENTIRE polyphase stage.

    T = 18 for Layer III granules, 12 for Layer I frames, 36 for Layer II
    frames (the [1056, 576] L3 shape documented below generalizes).

    Folds the [64, 32] matrixing, the v[64] tap selection, and the 512-tap
    windowed FIR (synthesis.rs:158-348) into one dense operator:
    ``resp_vec = M @ vec(S)`` with ``vec(S)[t*32+k] = sb_time[t, k]`` and
    ``resp_vec[m*32+i]`` the response sample at FIR slot m, subsample i.
    Entry: M[(m,i), (t,:)] = D[32*(m-t)+i] * N[q(m-t, i), :] for
    0 <= m-t < 16. Built in f64, cast f32; on device the whole stage is a
    single K=576 MXU matmul per channel (batch axis minor — see
    mp3_dense_batch_jax's layout note)."""
    N = polyphase_matrix().astype(np.float64)
    W = synthesis_window().astype(np.float64)
    q = _synth_sel_idx()
    M = np.zeros(((T + 15) * 32, T * 32))
    for m in range(T + 15):
        for k in range(16):
            t = m - k
            if 0 <= t < T:
                for i in range(32):
                    M[m * 32 + i, t * 32 : (t + 1) * 32] += W[k, i] * N[q[k, i]]
    return M.astype(np.float32)


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
    # Each boundary butterfly touches samples 10..17 of subband b-1 and
    # 0..7 of subband b — disjoint sets across boundaries — so all
    # boundaries vectorize in one shot (bit-identical: same per-element
    # expressions, reading the original x).
    nb = n_boundaries
    lo = x[0:nb, 17:9:-1]  # samples 17..10 of the lower subbands [nb, 8]
    hi = x[1 : nb + 1, 0:8]
    y[0:nb, 17:9:-1] = lo * cs - hi * ca
    y[1 : nb + 1, 0:8] = hi * cs + lo * ca
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
    c = (V[:, qidx] * W[None, :, :]).astype(np.float32, copy=False)  # [T, 16, 32]
    # out[t] = sum_k c[t-k, k] (the 16 overlapping tap groups). A strided
    # view over a zero-padded copy turns the 16 shifted adds into one
    # reduction: w[t, k, j] = A[15 + t - k, k, j] = c[t-k, k, j] or 0.
    A = np.zeros((T + 30, 16, 32), dtype=np.float32)
    A[15 : 15 + T] = c
    s0, s1, s2 = A.strides
    w = np.lib.stride_tricks.as_strided(
        A[15:], shape=(T + 15, 16, 32), strides=(s0, s1 - s0, s2)
    )
    return w.sum(axis=1, dtype=np.float32).reshape(-1)


class GranuleDenseState:
    """Carries cross-granule linear state for the stateful per-packet path:
    the hybrid overlap tail and the pending polyphase response tail."""

    def __init__(self, hybrid_tail: np.ndarray = None, synth_tail: np.ndarray = None):
        # Optional caller-owned buffers: the per-packet decoder passes
        # views into one [C, ...] block shared with the native dense stage,
        # so both paths mutate the same state. Updates are in-place —
        # the array identity is stable.
        self.hybrid_tail = (np.zeros((32, 18), dtype=np.float32)
                            if hybrid_tail is None else hybrid_tail)
        self.synth_tail = (np.zeros(480, dtype=np.float32)
                           if synth_tail is None else synth_tail)

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
    state.hybrid_tail[:] = tmp[:, 18:]
    sb_time = sb_time * freq_inversion_mask()
    resp = polyphase_response_np(sb_time)
    out = resp[:576].copy()
    out[:480] += state.synth_tail
    state.synth_tail[:] = resp[576:]
    return out


# ---------------------------------------------------------------------------
# jax batched device pipeline
# ---------------------------------------------------------------------------


def _jnp():
    import jax.numpy as jnp

    return jnp


def l12_dense_batch_jax(sb, synth_tail0=None):
    """Device dense stage for Layer I/II frame batches.

    Args:
      sb: [F, C, 32, T] float32 subband samples (T = 12 for Layer I, 36
          for Layer II) — the native bitstream stage's output.
      synth_tail0: [C, 480] carried synthesis tail (None = stream start).

    Returns (pcm [F, C, 32*T], synth_tail [C, 480]). Same structure as the
    Layer III path's polyphase half: one combined-matrix MXU matmul with
    the large frame axis minor, cross-frame overlap-add by superposition
    (no antialias/hybrid/frequency-inversion stages in Layers I/II —
    layer1/mod.rs:62, layer2/mod.rs:219 go straight to synthesis). The
    480-sample tail spans ceil(480 / (32 T)) following frames (two for
    Layer I's 384-sample frames), so the superposition shifts K times and
    the carried tail is sliced across the first K frames.
    """
    import jax.numpy as jnp

    F, C, _, T = sb.shape
    n = 32 * T
    total = n + 480
    K = -(-480 // n)  # frames the tail reaches forward
    M = jnp.asarray(_polyphase_combined_matrix(T))  # [total, T*32]
    S = sb.transpose(1, 3, 2, 0).reshape(C, T * 32, F)  # vec index t*32+k
    resp = jnp.einsum("pq,cqf->cpf", M, S,
                      preferred_element_type=jnp.float32)  # [C, total, F]
    if synth_tail0 is None:
        synth_tail0 = jnp.zeros((C, 480), jnp.float32)

    pcm = resp[:, :n, :]
    # (a) tails of earlier frames in the batch: k-step shifts along F.
    for k in range(1, min(K, F) + 1):
        lo, hi = k * n, min((k + 1) * n, total)
        if lo >= total or F <= k:
            break
        seg = resp[:, lo:hi, : F - k]
        if hi - lo < n:
            seg = jnp.concatenate(
                [seg, jnp.zeros((C, n - (hi - lo), F - k), jnp.float32)],
                axis=1)
        pcm = pcm + jnp.concatenate(
            [jnp.zeros((C, n, k), jnp.float32), seg], axis=2)
    # (b) the carried tail, sliced across the first min(K, F) frames.
    carried = jnp.concatenate(
        [synth_tail0, jnp.zeros((C, K * n - 480), jnp.float32)], axis=1
    ) if K * n > 480 else synth_tail0
    nf = min(K, F)
    lead = carried[:, : nf * n].reshape(C, nf, n).transpose(0, 2, 1)
    if nf < F:
        lead = jnp.concatenate(
            [lead, jnp.zeros((C, n, F - nf), jnp.float32)], axis=2)
    pcm = pcm + lead

    # Outgoing tail: pending response of the last K frames (+ any carried
    # remainder when the batch is shorter than the tail's reach).
    synth_tail = jnp.zeros((C, 480), jnp.float32)
    for j in range(min(K, F)):
        lo = n * (j + 1)
        width = min(480, total - lo)
        part = resp[:, lo : lo + width, F - 1 - j]
        if width < 480:
            part = jnp.concatenate(
                [part, jnp.zeros((C, 480 - width), jnp.float32)], axis=1)
        synth_tail = synth_tail + part
    if F * n < 480:
        left = synth_tail0[:, F * n :]
        synth_tail = synth_tail + jnp.concatenate(
            [left, jnp.zeros((C, 480 - left.shape[1]), jnp.float32)],
            axis=1)
    return pcm.transpose(2, 0, 1), synth_tail


def mp3_dense_batch_jax(x, bt, mixed, hybrid_tail0=None, synth_tail0=None,
                        boundary=None):
    """Device dense stage for a granule sequence batch.

    Args:
      x: [G, C, 576] float32 spectra (requantized, stereo-decoded,
         reordered) for G consecutive granules of one stream, C channels.
      bt: [G, C] int32 block types, mixed: [G, C] bool.
      hybrid_tail0: [C, 32, 18] carried hybrid overlap (None = stream start).
      synth_tail0: [C, 480] carried synthesis tail.
      boundary: optional [G] bool, True where a NEW stream starts at that
         granule (merged multi-file batches): the cross-granule couplings
         (hybrid overlap, polyphase tail) are zeroed there, exactly as a
         fresh stream's zero tails would be. Interior granules see
         identical arithmetic, so merged output is bit-equal to per-file.

    Returns (pcm [G, C, 576], hybrid_tail [C, 32, 18], synth_tail [C, 480]).

    All granules process in parallel; the two linear cross-granule couplings
    (hybrid overlap-add, polyphase FIFO) are applied by superposition:
    shift-adds along the granule axis (see module docstring).

    Layout: everything runs with the LARGE granule axis MINOR ([C, ..., G]).
    The natural [G*C, 32, 18] layout puts an 18-wide axis in the vector
    lanes, so every elementwise/shuffle op ran at ~14% lane occupancy and
    the antialias/overlap shuffles dominated the stage (measured 33 ms of
    a 40 ms pass at G=24576). G-minor keeps all 128 lanes busy; block-type
    selection folds into the IMDCT matmul as a masked K-concatenation
    ([72, 36] operator), and the whole polyphase stage is one K=576 matmul
    (_polyphase_combined_matrix). Cross-granule overlap-adds become
    single-step shifts along the minor axis.
    """
    import jax.numpy as jnp

    G, C, _ = x.shape
    xb = x.transpose(1, 2, 0).reshape(C, 32, 18, G)
    btT = bt.T  # [C, G]
    mixedT = mixed.T

    # --- antialias (hybrid_synthesis.rs:224) ---
    cs, ca = antialias_coeffs()
    cs = jnp.asarray(cs)[None, None, :, None]  # coeff axis = sample-in-pair
    ca = jnp.asarray(ca)[None, None, :, None]
    n_bounds = jnp.where(btT == BLOCK_SHORT, jnp.where(mixedT, 1, 0), 31)
    lo_r = xb[:, :31, 10:18, :][:, :, ::-1, :]  # [C, 31, 8, G]
    hi = xb[:, 1:32, 0:8, :]
    nl = lo_r * cs - hi * ca
    nh = hi * cs + lo_r * ca
    bmask = jnp.arange(31)[None, :, None, None] < n_bounds[:, None, None, :]
    nl = jnp.where(bmask, nl, lo_r)
    nh = jnp.where(bmask, nh, hi)
    # Reassemble by concatenation (scatters are slow on TPU): samples 0..7
    # come from the butterflies of the boundary below, 10..17 from the
    # boundary above; 8..9 pass through.
    head = jnp.concatenate([xb[:, :1, 0:8, :], nh], axis=1)  # [C, 32, 8, G]
    tail = jnp.concatenate([nl[:, :, ::-1, :], xb[:, 31:, 10:18, :]], axis=1)
    xb = jnp.concatenate([head, xb[:, :, 8:10, :], tail], axis=2)

    # --- hybrid IMDCT with per-(lane, subband) block-type selection ---
    # The matrix choice (incl. mixed-block long-below/short-above) is a
    # per-element one-hot mask folded into the matmul LHS: X4 concatenates
    # the four masked copies along K, the operator is the four [18, 36]
    # matrices stacked to [72, 36]. One dot instead of four + select.
    T = jnp.asarray(hybrid_matrices())  # [4, 36, 18]
    lt = jnp.where(btT == BLOCK_SHORT, BLOCK_LONG, btT)
    sb_split = jnp.where(btT == BLOCK_SHORT, jnp.where(mixedT, 2, 0), 32)
    idx = jnp.where(
        jnp.arange(32)[None, :, None] < sb_split[:, None, :],
        lt[:, None, :], BLOCK_SHORT,
    )  # [C, 32, G]
    oh = (jnp.arange(4)[:, None, None, None] == idx[None]).astype(jnp.float32)
    X4 = jnp.concatenate([xb * oh[b][:, :, None, :] for b in range(4)],
                         axis=2)  # [C, 32, 72, G]
    T4 = jnp.concatenate([T[b].T for b in range(4)], axis=0)  # [72, 36]
    tmp = jnp.einsum("ckpg,pi->ckig", X4, T4,
                     preferred_element_type=jnp.float32)  # [C, 32, 36, G]

    # --- hybrid overlap-add: one-step shift along the granule axis ---
    heads = tmp[:, :, :18, :]
    tails = tmp[:, :, 18:, :]
    if hybrid_tail0 is None:
        hybrid_tail0 = jnp.zeros((C, 32, 18), jnp.float32)
    prev = jnp.concatenate([hybrid_tail0[..., None], tails[..., :-1]], axis=3)
    if boundary is not None:
        prev = jnp.where(boundary[None, None, None, :], 0.0, prev)
    sb_time = heads + prev  # [C, 32, 18, G]
    hybrid_tail = tails[..., -1]

    # --- frequency inversion ---
    sb_time = sb_time * jnp.asarray(freq_inversion_mask())[None, :, :, None]

    # --- polyphase: matrixing + v-selection + windowed FIR as ONE matmul ---
    M = jnp.asarray(_polyphase_combined_matrix())  # [1056, 576]
    S = sb_time.transpose(0, 2, 1, 3).reshape(C, 576, G)  # vec index t*32+k
    resp = jnp.einsum("pq,cqg->cpg", M, S,
                      preferred_element_type=jnp.float32)  # [C, 1056, G]

    # --- cross-granule synthesis overlap-add by superposition ---
    if synth_tail0 is None:
        synth_tail0 = jnp.zeros((C, 480), jnp.float32)
    prev_tail = jnp.concatenate(
        [synth_tail0[..., None], resp[:, 576:, :-1]], axis=2
    )
    if boundary is not None:
        prev_tail = jnp.where(boundary[None, None, :], 0.0, prev_tail)
    pcm = jnp.concatenate(
        [resp[:, :480, :] + prev_tail, resp[:, 480:576, :]], axis=1
    )
    synth_tail = resp[:, 576:, -1]
    return pcm.transpose(2, 0, 1), hybrid_tail, synth_tail
