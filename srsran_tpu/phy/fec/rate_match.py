"""Rate matching for turbo (TS 36.212 §5.1.4.1) and convolutional
(§5.1.4.2) codes.

Where the reference builds 100+ MB of static LUTs (`rm_turbo.c:75-100`) and
scatter loops, this module derives, per (K, rv, E), a single **gather index
vector** into the flat d-stream array — host-precomputed and cached.  On
device:

* TX: ``e = d_flat[..., idx]``            (one gather)
* RX: ``d_flat = zeros.at[idx].add(e)``   (one scatter-add; repetitions
  accumulate exactly like the reference's HARQ `+=` combining)

Circular-buffer semantics, dummy-bit skipping, and the RV start points k0
follow the spec; parity with the reference is validated by encode→rate-match
→de-rate-match→decode roundtrips in tests.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

NCOLS = 32
# TS 36.212 Table 5.1.4-1 inter-column permutation (turbo)
RM_PERM_TC = np.array(
    [0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30,
     1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31],
    dtype=np.int64,
)
# TS 36.212 Table 5.1.4-2 inter-column permutation (convolutional)
RM_PERM_CC = np.array(
    [1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31,
     0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30],
    dtype=np.int64,
)


@lru_cache(maxsize=512)
def _turbo_wbuffer(k: int):
    """Circular buffer map for CB size k.

    Returns (w, Kp) where w is an int array of length 3*Kp mapping each
    circular-buffer position to a flat d-stream index (stream*(k+4)+pos),
    or -1 for <NULL> dummy positions.
    """
    d = k + 4
    r = -(-d // NCOLS)
    kp = r * NCOLS
    nd = kp - d

    # streams 0/1: column-permuted, read column-wise
    cols = RM_PERM_TC[:, None]  # (32,1)
    rows = np.arange(r)[None, :]
    y_idx01 = (rows * NCOLS + cols).reshape(-1)  # (Kp,) original y index
    # stream 2: pi(m) = (P[m // r] + 32*(m % r) + 1) mod Kp
    m = np.arange(kp)
    y_idx2 = (RM_PERM_TC[m // r] + NCOLS * (m % r) + 1) % kp

    def to_d(stream, y):
        out = np.where(y < nd, -1, stream * d + (y - nd))
        return out

    w = np.empty(3 * kp, np.int64)
    w[:kp] = to_d(0, y_idx01)
    w[kp::2] = to_d(1, y_idx01)
    w[kp + 1 :: 2] = to_d(2, y_idx2)
    return w, kp


def turbo_k0(k: int, rv: int) -> int:
    """Redundancy-version start point (TS 36.212 §5.1.4.1.2)."""
    d = k + 4
    r = -(-d // NCOLS)
    ncb = 3 * r * NCOLS  # full soft buffer (no N_IR limiting yet)
    return r * (2 * int(np.ceil(ncb / (8.0 * r))) * rv + 2)


@lru_cache(maxsize=4096)
def turbo_rm_indices(k: int, e: int, rv: int, n_filler: int = 0) -> np.ndarray:
    """Gather indices (length e) into the flat (3*(k+4),) d-stream array.

    `n_filler` filler bits at the head of d^(0) and d^(1) are <NULL> and
    skipped by bit selection (TS 36.212 §5.1.3.2; the reference encoder marks
    them TX_NULL in both streams, turbocoder.c:133-147).
    """
    w, kp = _turbo_wbuffer(k)
    d = k + 4
    ncb = 3 * kp
    k0 = turbo_k0(k, rv)
    valid_mask = w >= 0
    if n_filler:
        is_filler = ((w >= 0) & (w < n_filler)) | ((w >= d) & (w < d + n_filler))
        valid_mask = valid_mask & ~is_filler
    order = np.concatenate([np.arange(k0, ncb), np.arange(0, k0)])
    stream = w[order]
    stream = stream[valid_mask[order]]
    n_valid = len(stream)
    reps = -(-e // n_valid)
    return np.tile(stream, reps)[:e].astype(np.int32)


def turbo_rate_match_tx(d, e: int, rv: int = 0, n_filler: int = 0):
    """d: (..., 3, K+4) coded bits/values → (..., e)."""
    k = d.shape[-1] - 4
    idx = jnp.asarray(turbo_rm_indices(k, e, rv, n_filler))
    flat = d.reshape(d.shape[:-2] + (-1,))
    return flat[..., idx]


def turbo_rate_match_rx(llr_e, k: int, rv: int = 0, softbuffer=None, n_filler: int = 0):
    """LLRs (..., e) → d-stream LLRs (..., 3, K+4), accumulating repetitions.

    If `softbuffer` (..., 3, K+4) is given, accumulate into it (HARQ).
    """
    e = llr_e.shape[-1]
    idx = jnp.asarray(turbo_rm_indices(k, e, rv, n_filler))
    if softbuffer is None:
        flat = jnp.zeros(llr_e.shape[:-1] + (3 * (k + 4),), llr_e.dtype)
    else:
        flat = softbuffer.reshape(softbuffer.shape[:-2] + (-1,))
    flat = flat.at[..., idx].add(llr_e)
    return flat.reshape(llr_e.shape[:-1] + (3, k + 4))


# --- convolutional (tail-biting) rate matching --------------------------------


@lru_cache(maxsize=512)
def _conv_wbuffer(d: int):
    """w map for conv coding: 3 streams of length d, concatenated v0|v1|v2."""
    r = -(-d // NCOLS)
    kp = r * NCOLS
    nd = kp - d
    cols = RM_PERM_CC[:, None]
    rows = np.arange(r)[None, :]
    y_idx = (rows * NCOLS + cols).reshape(-1)
    w = np.empty(3 * kp, np.int64)
    for s in range(3):
        w[s * kp : (s + 1) * kp] = np.where(y_idx < nd, -1, s * d + (y_idx - nd))
    return w, kp


@lru_cache(maxsize=4096)
def conv_rm_indices(d: int, e: int) -> np.ndarray:
    w, kp = _conv_wbuffer(d)
    stream = w[w >= 0]
    reps = -(-e // len(stream))
    return np.tile(stream, reps)[:e].astype(np.int32)


def conv_rate_match_tx(d, e: int):
    """d: (..., 3, D) → (..., e)."""
    dd = d.shape[-1]
    idx = jnp.asarray(conv_rm_indices(dd, e))
    flat = d.reshape(d.shape[:-2] + (-1,))
    return flat[..., idx]


def conv_rate_match_rx(llr_e, d: int):
    e = llr_e.shape[-1]
    idx = jnp.asarray(conv_rm_indices(d, e))
    flat = jnp.zeros(llr_e.shape[:-1] + (3 * d,), llr_e.dtype)
    flat = flat.at[..., idx].add(llr_e)
    return flat.reshape(llr_e.shape[:-1] + (3, d))


@lru_cache(maxsize=256)
def _conv_stream(d: int) -> np.ndarray:
    """The circular-buffer read order (each flat position at most once
    per cycle) — the batch de-rate-match folds repetitions by cycle."""
    w, _kp = _conv_wbuffer(d)
    return w[w >= 0].astype(np.int32)


def conv_rate_match_rx_batch_np(llr_e: np.ndarray, d: int) -> np.ndarray:
    """(H, e) LLR rows → (H, 3, d): the blind search runs one of these
    per (DCI length, aggregation level) instead of H scalar scatters
    (the per-candidate np.add.at was ~40% of the windowed control
    plane's blind-search host time)."""
    llr_e = np.asarray(llr_e, np.float32)
    h, e = llr_e.shape
    stream = _conv_stream(d)
    ls = stream.size
    reps = -(-e // ls)
    pad = np.zeros((h, reps * ls), np.float32)
    pad[:, :e] = llr_e
    folded = pad.reshape(h, reps, ls).sum(axis=1)
    flat = np.zeros((h, 3 * d), np.float32)
    flat[:, stream] = folded
    return flat.reshape(h, 3, d)


def conv_rate_match_rx_np(llr_e: np.ndarray, d: int) -> np.ndarray:
    """Host-side de-rate-match for control-sized payloads (PDCCH blind
    search runs one per candidate — the eager-jax scatter form costs
    ~ms of dispatch per call where this numpy form is microseconds;
    measured 53 ms/TTI of the full stack's control path)."""
    llr_e = np.asarray(llr_e, np.float32)
    idx = conv_rm_indices(d, llr_e.shape[-1])
    flat = np.zeros(llr_e.shape[:-1] + (3 * d,), np.float32)
    np.add.at(flat, (..., idx), llr_e)
    return flat.reshape(llr_e.shape[:-1] + (3, d))
