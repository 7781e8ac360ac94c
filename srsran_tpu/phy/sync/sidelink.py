"""Sidelink (D2D/C-V2X) synchronization signals: PSSS and SSSS,
TS 36.211 §9.7 (re-design of `lib/src/phy/sync/psss.c` / `ssss.c`).

PSSS: length-62 ZC with root 26 for N_sl_id 0-167 and 37 for 168-335,
transmitted twice, on symbols 1 and 2 of slot 0 of the sync subframe. SSSS: the LTE
SSS s/c/z construction with (id1, id2) = (N_sl_id % 168, N_sl_id // 168)
on symbols 4 and 5 of slot 1. Sidelink uses the UL half-subcarrier
shift (SC-FDMA grid).

Detection follows the LTE PSS design: time-domain replicas rendered
through the OFDM chain, batched FFT correlation over the capture.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import Cell
from ..ofdm import OfdmConfig, ofdm_tx_sf
from .sss import _base_sequences, _m0m1

PSSS_LEN = 62


@lru_cache(maxsize=4)
def psss_seq_np(root_idx: int) -> np.ndarray:
    """(62,) PSSS ZC sequence, root 26 (idx 0) or 37 (idx 1) — note the
    sign convention (e^{-jπu·/63}) of psss.c."""
    u = [26.0, 37.0][root_idx]
    n = np.arange(31)
    a = np.exp(-1j * np.pi * u * n * (n + 1) / 63.0)
    n2 = np.arange(31, 62)
    b = np.exp(-1j * np.pi * u * (n2 + 2) * (n2 + 1) / 63.0)
    return np.concatenate([a, b]).astype(np.complex64)


@lru_cache(maxsize=512)
def ssss_seq_np(n_sl_id: int, tm12: bool = True) -> np.ndarray:
    """(62,) SSSS ±1 sequence (ssss.c srslte_ssss_generate)."""
    id1, id2 = n_sl_id % 168, n_sl_id // 168
    s_t, c_t, z_t = _base_sequences()
    m0, m1 = _m0m1(id1)
    n = np.arange(31)
    s0 = s_t[(n + m0) % 31]
    s1 = s_t[(n + m1) % 31]
    c0 = c_t[(n + id2) % 31]
    c1 = c_t[(n + id2 + 3) % 31]
    z1_m0 = z_t[(n + (m0 % 8)) % 31]
    z1_m1 = z_t[(n + (m1 % 8)) % 31]
    d = np.zeros(62)
    if tm12:
        d[0::2] = s0 * c0
        d[1::2] = s1 * c1 * z1_m0
    else:
        d[0::2] = s1 * c0
        d[1::2] = s0 * c1 * z1_m1
    return d.astype(np.float32)


def put_sl_sync_grid(grid: np.ndarray, cell: Cell, n_sl_id: int, tm12: bool = True):
    """Insert PSSS (slot-0 symbols 1,2) + SSSS (slot-1 symbols 4,5) into a
    (nsymb_sf, nre) grid."""
    nre = cell.nof_re_per_symbol
    k0 = nre // 2 - 31
    psss = psss_seq_np(0 if n_sl_id < 168 else 1)
    for l in (1, 2):
        grid[l, k0 : k0 + PSSS_LEN] = psss
    ssss = ssss_seq_np(n_sl_id, tm12)
    for l in (4, 5):
        grid[cell.nsymb_per_slot + l, k0 : k0 + PSSS_LEN] = ssss
    return grid


@lru_cache(maxsize=16)
def _psss_replica_time(root_idx: int, nof_prb: int, standard_rates: bool = True) -> np.ndarray:
    """One PSSS symbol's time-domain waveform (with the UL 0.5-subcarrier
    shift), for correlation."""
    cell = Cell(nof_prb=nof_prb, nof_ports=1, id=0, use_standard_rates=standard_rates)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    k0 = cell.nof_re_per_symbol // 2 - 31
    grid[1, k0 : k0 + PSSS_LEN] = psss_seq_np(root_idx)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=0.5)
    t = np.asarray(ofdm_tx_sf(ofdm, grid))
    starts = ofdm.symbol_starts()
    return t[starts[1] : starts[2]].astype(np.complex64)


def psss_find(samples, nof_prb: int = 6, standard_rates: bool = True):
    """Correlate both PSSS roots over the capture.

    Returns (root_idx, offset_of_symbol1, peak/avg metric)."""
    n = len(samples)
    reps = [np.conj(_psss_replica_time(r, nof_prb, standard_rates)[::-1]) for r in range(2)]
    m = len(reps[0])
    nfft = int(2 ** np.ceil(np.log2(n + m)))
    x = jnp.fft.fft(jnp.asarray(samples), nfft)
    best = (-1.0, 0, 0)
    for r in range(2):
        h = jnp.fft.fft(jnp.asarray(reps[r]), nfft)
        corr = jnp.abs(jnp.fft.ifft(x * h))[m - 1 : m - 1 + n]
        peak = float(jnp.max(corr))
        # PSSS repeats on two adjacent symbols -> two equal peaks; take the
        # EARLIEST within 5% of the max (= the symbol-1 copy)
        cand = np.nonzero(np.asarray(corr) >= 0.95 * peak)[0]
        off = int(cand[0])
        avg = float(jnp.mean(corr))
        metric = peak / (avg + 1e-12)
        if metric > best[0]:
            best = (metric, r, off)
    metric, root, off = best
    return root, off, metric


def ssss_detect(ssss_re, max_id: int = 336):
    """Resolve N_sl_id from equalized SSSS REs via one hypothesis matmul."""
    hyp = np.stack([ssss_seq_np(i) for i in range(max_id)])
    corr = jnp.abs(jnp.asarray(hyp) @ ssss_re)
    best = jnp.argmax(corr)
    return best, corr[best] / (jnp.linalg.norm(ssss_re) * np.sqrt(62.0))
