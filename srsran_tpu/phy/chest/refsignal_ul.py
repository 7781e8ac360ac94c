"""UL demodulation reference signals (PUSCH DMRS), TS 36.211 §5.5.

Re-design of `lib/src/phy/ch_estimation/refsignal_ul.c`: base sequences
r_uv(n) from cyclically-extended Zadoff-Chu (M >= 36) or the spec phase
tables (M = 12, 24; `ul_rs_tables.h`), cyclic shift alpha, placed on SC-FDMA
symbol 3 of each slot (normal CP).

Round-1 scope: group hopping disabled (u = cell_id % 30, v = 0), cyclic
shift from config only.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..common import Cell
from .ul_rs_data import PHI_M12, PHI_M24


def _largest_prime_below(n: int) -> int:
    def is_prime(x):
        if x < 2:
            return False
        for d in range(2, int(x**0.5) + 1):
            if x % d == 0:
                return False
        return True

    for c in range(n - 1, 1, -1):
        if is_prime(c):
            return c
    raise ValueError(n)


@lru_cache(maxsize=512)
def base_sequence(u: int, m_sc: int, v: int = 0) -> np.ndarray:
    """r_uv(n) of length m_sc (TS 36.211 §5.5.1)."""
    if m_sc == 12:
        phi = np.asarray(PHI_M12[u], np.float64)
        return np.exp(1j * phi * np.pi / 4).astype(np.complex64)
    if m_sc == 24:
        phi = np.asarray(PHI_M24[u], np.float64)
        return np.exp(1j * phi * np.pi / 4).astype(np.complex64)
    nzc = _largest_prime_below(m_sc)
    q_bar = nzc * (u + 1) / 31.0
    q = int(np.floor(q_bar + 0.5) + v * (-1) ** np.floor(2 * q_bar))
    m = np.arange(nzc)
    zc = np.exp(-1j * np.pi * q * m * (m + 1) / nzc)
    n = np.arange(m_sc)
    return zc[n % nzc].astype(np.complex64)


def pusch_dmrs(cell: Cell, nof_prb_alloc: int, cyclic_shift: int = 0, slot_in_sf: int = 0) -> np.ndarray:
    """DMRS sequence for one slot's PUSCH allocation: (12*nof_prb,) complex."""
    m_sc = 12 * nof_prb_alloc
    u = cell.id % 30
    r = base_sequence(u, m_sc)
    alpha = 2 * np.pi * cyclic_shift / 12.0
    n = np.arange(m_sc)
    return (r * np.exp(1j * alpha * n)).astype(np.complex64)


def dmrs_symbol_in_slot(cell: Cell) -> int:
    """PUSCH DMRS on symbol 3 (normal CP) / 2 (extended)."""
    return 3 if cell.nsymb_per_slot == 7 else 2
