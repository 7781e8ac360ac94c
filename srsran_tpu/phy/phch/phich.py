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

NSF = 4  # spreading factor (normal CP)
PHICH_LEN = 12  # symbols per PHICH

_WALSH4 = np.array(
    [[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]], np.float32
)


@lru_cache(maxsize=8)
def phich_sequence(n_seq: int) -> np.ndarray:
    """Orthogonal cover n_seq ∈ [0,8): w (complex) of length 4."""
    w = _WALSH4[n_seq % 4].astype(np.complex64)
    return w if n_seq < 4 else (1j * w).astype(np.complex64)


def nof_phich_groups(cell: Cell, ng: float | None = None) -> int:
    """N_group from the cell's Ng (TS 36.211 §6.9; MIB phich_resources
    enum 0..3 → 1/6, 1/2, 1, 2 — same mapping as regs.py:80)."""
    if ng is None:
        ng = {0: 1 / 6, 1: 1 / 2, 2: 1.0, 3: 2.0}.get(cell.phich_resources, 1 / 6)
    return int(np.ceil(ng * cell.nof_prb / 8.0))


@lru_cache(maxsize=256)
def phich_re_indices(cell: Cell, group: int) -> np.ndarray:
    """12 REs for a PHICH group — spec-true cell-ID-spread REG selection
    (TS 36.211 §6.9.3 via regs.py)."""
    from .regs import phich_group_re_indices_true

    idx = phich_group_re_indices_true(cell, group)
    nre = cell.nof_re_per_symbol
    assert (idx < nre).all()  # normal duration: all in symbol 0
    return idx


def phich_encode(ack: int, n_seq: int) -> np.ndarray:
    """1 bit → 12 complex symbols (before scrambling)."""
    b = 1.0 - 2.0 * ack  # ACK=0 → +1? convention: bit 0 → +1
    z = np.repeat(np.complex64(b), 3)
    return (np.kron(z, phich_sequence(n_seq))).astype(np.complex64)


def phich_put_np(grid: np.ndarray, cell: Cell, sf_idx: int, group: int, n_seq: int, ack: int):
    """grid: (nsymb, nre) or (nports, nsymb, nre) — 2+ ports use SFBC."""
    sym = phich_encode(ack, n_seq)
    signs = gold_sequence_signs(pcfich_cinit(sf_idx, cell.id), PHICH_LEN)
    idx = phich_re_indices(cell, group)
    tx = (sym * signs).astype(np.complex64)
    if grid.ndim == 3 and grid.shape[0] >= 2:
        from ..mimo import precode_diversity2

        ports = np.asarray(precode_diversity2(tx))
        grid[0][0, idx] += ports[0]
        grid[1][0, idx] += ports[1]
    else:
        g = grid if grid.ndim == 2 else grid[0]
        g[0, idx] += tx
    return grid


def phich_decode(sym_eq, cell: Cell, sf_idx: int, n_seq: int):
    """(12,) equalized symbols of a group → (ack_bit, soft_metric).

    Despread with the cover sequence; positive metric ⇒ ACK=0.
    """
    signs = jnp.asarray(gold_sequence_signs(pcfich_cinit(sf_idx, cell.id), PHICH_LEN))
    z = (sym_eq * signs).reshape(3, NSF)
    w = jnp.asarray(phich_sequence(n_seq))
    corr = jnp.sum(z * jnp.conj(w), axis=-1)
    metric = jnp.real(jnp.sum(corr))
    return (metric < 0).astype(jnp.uint8), metric
