"""Sounding reference signals (SRS), TS 36.211 §5.5.3 — re-design of
`lib/src/phy/ch_estimation/refsignal_srs.c` (wideband, comb-2, round 1).

SRS occupies every other subcarrier of the sounding bandwidth on the last
SC-FDMA symbol of the subframe; the eNB correlates to estimate the UL
wideband channel / SNR per UE.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..common import Cell
from .refsignal_ul import base_sequence


def srs_sequence(cell: Cell, nof_prb_srs: int, cyclic_shift: int = 0, comb: int = 0) -> np.ndarray:
    """SRS values on its comb: (6*nof_prb_srs,) complex64."""
    m_sc = 6 * nof_prb_srs  # comb-2: every other subcarrier
    # base sequences are defined for multiples of 12; SRS uses m_sc values of
    # the length-m_sc sequence when m_sc >= 24, else the 12/24 tables
    m_base = max(12, m_sc)
    r = base_sequence(cell.id % 30, m_base if m_base % 12 == 0 else 12 * ((m_base // 12) + 1))[:m_sc]
    alpha = 2 * np.pi * cyclic_shift / 8.0
    n = np.arange(m_sc)
    return (r * np.exp(1j * alpha * n)).astype(np.complex64)


def srs_symbol_index(cell: Cell) -> int:
    """SRS on the last symbol of the subframe."""
    return cell.nsymb_per_sf - 1


def put_srs_np(grid: np.ndarray, cell: Cell, prb_start: int, nof_prb_srs: int, cyclic_shift: int = 0, comb: int = 0):
    seq = srs_sequence(cell, nof_prb_srs, cyclic_shift, comb)
    l = srs_symbol_index(cell)
    k = prb_start * 12 + comb + 2 * np.arange(len(seq))
    grid[l, k] = seq
    return grid


def srs_estimate(rx_grid, cell: Cell, prb_start: int, nof_prb_srs: int, cyclic_shift: int = 0, comb: int = 0):
    """LS channel estimate + SNR on the SRS comb.

    rx_grid: (..., nsymb, nre).  Returns (ce (..., 6*nof_prb_srs), snr (...,)).
    """
    seq = srs_sequence(cell, nof_prb_srs, cyclic_shift, comb)
    l = srs_symbol_index(cell)
    k = prb_start * 12 + comb + 2 * np.arange(len(seq))
    pilots = rx_grid[..., l, jnp.asarray(k)]
    ls = pilots * jnp.asarray(np.conj(seq))
    # noise from high-pass residual
    resid = ls[..., 1:-1] - 0.5 * (ls[..., 2:] + ls[..., :-2])
    noise = jnp.mean(jnp.abs(resid) ** 2, axis=-1) / 1.5
    sig = jnp.mean(jnp.abs(ls) ** 2, axis=-1)
    return ls, sig / jnp.maximum(noise, 1e-12)
