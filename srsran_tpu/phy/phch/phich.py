"""PHICH: HARQ ACK/NACK indicator, TS 36.211 §6.9.

Re-design of `lib/src/phy/phch/phich.c`: 1 ACK bit → BPSK ×3 repetition →
length-4 orthogonal cover (8 sequences: Walsh ± j·Walsh) → 12 symbols,
scrambled, mapped to 3 REGs of symbol 0.  All groups/sequences of a
subframe encode/decode as one batched op.

Round-1 deviation (documented): REGs are placed sequentially after the
PCFICH REGs instead of the TS 36.211 §6.9.3 modular mapping.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import Cell
from ..sequence import gold_sequence_signs
from .pcfich import pcfich_cinit

NSF = 4  # spreading factor, normal CP (extended CP halves it)
PHICH_LEN = 12  # symbols per PHICH, normal CP

_WALSH4 = np.array(
    [[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]], np.float32
)
_WALSH2 = np.array([[1, 1], [1, -1]], np.float32)


def phich_nsf(cell: Cell) -> int:
    """Spreading factor: 4 (normal CP) or 2 (extended CP, TS 36.211
    §6.9.1 — the reference's phich.c NSF switch)."""
    return 4 if cell.nsymb_per_slot == 7 else 2


def phich_len(cell: Cell) -> int:
    return 3 * phich_nsf(cell)


def nof_phich_sequences(cell: Cell) -> int:
    """2·NSF orthogonal sequences per group (Table 6.9.1-2)."""
    return 2 * phich_nsf(cell)


@lru_cache(maxsize=16)
def phich_sequence(n_seq: int, nsf: int = 4) -> np.ndarray:
    """Orthogonal cover n_seq ∈ [0, 2·nsf): Walsh ± j·Walsh of length
    nsf (TS 36.211 Table 6.9.1-2 for both CP lengths)."""
    tab = _WALSH4 if nsf == 4 else _WALSH2
    w = tab[n_seq % nsf].astype(np.complex64)
    return w if n_seq < nsf else (1j * w).astype(np.complex64)


def nof_phich_groups(cell: Cell, ng: float | None = None) -> int:
    """N_group from the cell's Ng (TS 36.211 §6.9; MIB phich_resources
    enum 0..3 → 1/6, 1/2, 1, 2 — same mapping as regs.py); doubled for
    extended CP (two groups per mapping unit)."""
    if ng is None:
        ng = {0: 1 / 6, 1: 1 / 2, 2: 1.0, 3: 2.0}.get(cell.phich_resources, 1 / 6)
    m1 = int(np.ceil(ng * cell.nof_prb / 8.0))
    return m1 if cell.nsymb_per_slot == 7 else 2 * m1


@lru_cache(maxsize=256)
def phich_re_indices(cell: Cell, group: int) -> np.ndarray:
    """12 REs for a PHICH group — spec-true cell-ID-spread REG selection
    (TS 36.211 §6.9.3 via regs.py)."""
    from .regs import phich_group_re_indices_true

    idx = phich_group_re_indices_true(cell, group)
    nre = cell.nof_re_per_symbol
    if cell.phich_length == 0:
        assert (idx < nre).all()  # normal duration: all in symbol 0
    return idx


def phich_encode(ack: int, n_seq: int, nsf: int = 4) -> np.ndarray:
    """1 bit → 3·nsf complex symbols (before scrambling)."""
    b = 1.0 - 2.0 * ack  # ACK=0 → +1? convention: bit 0 → +1
    z = np.repeat(np.complex64(b), 3)
    return (np.kron(z, phich_sequence(n_seq, nsf))).astype(np.complex64)


def phich_put_np(grid: np.ndarray, cell: Cell, sf_idx: int, group: int, n_seq: int, ack: int):
    """grid: (nsymb, nre) or (nports, nsymb, nre) — 2+ ports use SFBC."""
    nsf = phich_nsf(cell)
    sym = phich_encode(ack, n_seq, nsf)
    signs = gold_sequence_signs(pcfich_cinit(sf_idx, cell.id), 3 * nsf)
    idx = phich_re_indices(cell, group)
    nre = cell.nof_re_per_symbol
    ls, ks = idx // nre, idx % nre  # symbol/subcarrier (ext duration
    tx = (sym * signs).astype(np.complex64)  # spans symbols 0..2)
    if grid.ndim == 3 and grid.shape[0] >= 2:
        from ..mimo import precode_diversity2

        ports = np.asarray(precode_diversity2(tx))
        grid[0][ls, ks] += ports[0]
        grid[1][ls, ks] += ports[1]
    else:
        g = grid if grid.ndim == 2 else grid[0]
        g[ls, ks] += tx
    return grid


def phich_decode(sym_eq, cell: Cell, sf_idx: int, n_seq: int):
    """(3·nsf,) equalized symbols of a group → (ack_bit, soft_metric).

    Despread with the cover sequence; positive metric ⇒ ACK=0.
    """
    nsf = phich_nsf(cell)
    signs = jnp.asarray(gold_sequence_signs(pcfich_cinit(sf_idx, cell.id), 3 * nsf))
    z = (sym_eq * signs).reshape(3, nsf)
    w = jnp.asarray(phich_sequence(n_seq, nsf))
    corr = jnp.sum(z * jnp.conj(w), axis=-1)
    metric = jnp.real(jnp.sum(corr))
    return (metric < 0).astype(jnp.uint8), metric
