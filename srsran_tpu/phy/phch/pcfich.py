"""PCFICH: CFI coding + mapping, TS 36.212 §5.3.4 / TS 36.211 §6.7.

Re-design of `lib/src/phy/phch/pcfich.c`: the three 32-bit CFI codewords are
rotations of [0,1,1]; decode is a correlation against all three after
descrambling (one small matmul).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import Cell
from ..modem import Mod, demod_soft, modulate, modulate_np
from ..sequence import gold_sequence, gold_sequence_signs

CFI_LEN = 32


@lru_cache(maxsize=8)
def cfi_codeword(cfi: int) -> np.ndarray:
    base = np.array([0, 1, 1], np.uint8)
    off = (2 * (cfi - 1)) % 3
    return base[(np.arange(CFI_LEN) + off) % 3]


def pcfich_cinit(sf_idx: int, cell_id: int) -> int:
    return ((sf_idx + 1) * (2 * cell_id + 1) << 9) + cell_id


@lru_cache(maxsize=256)
def pcfich_re_indices(cell: Cell) -> np.ndarray:
    """16 RE indices (symbol 0) of the 4 PCFICH REGs (TS 36.211 §6.7.4)."""
    nre = cell.nof_re_per_symbol
    vshift = cell.id % 6
    k_bar = 6 * (cell.id % (2 * cell.nof_prb))
    out = []
    for i in range(4):
        k0 = (k_bar + (i * cell.nof_prb // 2) * 6) % nre
        ks = [k0 + j for j in range(6) if (k0 + j) % 3 != vshift % 3]
        out += ks[:4]
    return np.asarray(out, np.int32)


def pcfich_put_np(grid: np.ndarray, cell: Cell, sf_idx: int, cfi: int):
    """grid: (nsymb, nre) single-port, or (nports, nsymb, nre) — 2+ ports
    get SFBC transmit diversity like every control channel (TS 36.211
    §6.7.3 layer mapping/precoding as for PBCH)."""
    cw = cfi_codeword(cfi)
    seq = gold_sequence(pcfich_cinit(sf_idx, cell.id), CFI_LEN)
    sym = modulate_np(Mod.QPSK, cw ^ seq)
    idx = pcfich_re_indices(cell)
    if grid.ndim == 3 and grid.shape[0] >= 2:
        from ..mimo import precode_diversity2

        ports = np.asarray(precode_diversity2(sym.astype(np.complex64)))
        grid[0][0, idx] = ports[0]
        grid[1][0, idx] = ports[1]
    else:
        g = grid if grid.ndim == 2 else grid[0]
        g[0, idx] = sym
    return grid


def pcfich_decode(sym_eq, cell: Cell, sf_idx: int):
    """(16,) equalized symbols → (cfi, corr_metric)."""
    llr = demod_soft(Mod.QPSK, sym_eq)
    llr = llr * jnp.asarray(gold_sequence_signs(pcfich_cinit(sf_idx, cell.id), CFI_LEN))
    cws = jnp.asarray(
        np.stack([1.0 - 2.0 * cfi_codeword(c) for c in (1, 2, 3)]).astype(np.float32)
    )
    corr = jnp.einsum("e,ce->c", -llr, cws)
    cfi = jnp.argmax(corr) + 1
    return cfi, corr
