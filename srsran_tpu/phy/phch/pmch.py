"""PMCH + MBSFN reference signals (eMBMS), TS 36.211 §6.5/§6.10.2
(re-design of `lib/src/phy/phch/pmch.c` + the MBSFN parts of
`refsignal_dl.c`).

MBSFN subframes use the extended CP in the MBSFN region; this module
models the full-extended-CP subframe (non-MBSFN region length 2: the
first two symbols carry no PMCH). MBSFN RS: symbols 2/6/10, six pilots
per PRB (2-subcarrier spacing, frequency offsets 0/1/0), sequence
c_init = 512·(7·(slot+1)+l'+1)·(2·N_area+1) + N_area. PMCH: the DL-SCH
transport-block chain scrambled with c_init = (sf << 9) + N_area over
the MBSFN-region REs.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..common import MAX_PRB, Cell
from ..modem import demod_soft, modulate, modulate_np
from ..scrambling import scramble_bits, scramble_soft
from ..sequence import gold_sequence, gold_sequence_signs
from .pdsch import MOD_QM
from .sch import TbCoding, dlsch_decode, dlsch_encode_np

MBSFN_RS_SYMS = (2, 6, 10)  # extended-CP symbol indices
_FIDX0 = (0, 1, 0)
NON_MBSFN_SYMS = 2  # control region, no PMCH


@lru_cache(maxsize=64)
def mbsfn_rs_positions(cell: Cell):
    """(syms (3,), freqs (3, 6*nof_prb))."""
    freqs = []
    for j in range(3):
        freqs.append(_FIDX0[j] + 2 * np.arange(6 * cell.nof_prb))
    return np.asarray(MBSFN_RS_SYMS, np.int32), np.stack(freqs).astype(np.int32)


@lru_cache(maxsize=256)
def mbsfn_rs_sequence(cell: Cell, sf_idx: int, area_id: int) -> np.ndarray:
    """(3, 6*nof_prb) pilot values (refsignal_mbsfn_gen_seq)."""
    out = np.zeros((3, 6 * cell.nof_prb), np.complex64)
    for j, nsym in enumerate(MBSFN_RS_SYMS):
        lp = nsym % 6
        slot = 2 * sf_idx + (1 if j else 0)
        c_init = 512 * (7 * (slot + 1) + lp + 1) * (2 * area_id + 1) + area_id
        c = gold_sequence(c_init, 20 * MAX_PRB)
        m = np.arange(6 * cell.nof_prb) + 3 * (MAX_PRB - cell.nof_prb)
        re = (1.0 - 2.0 * c[2 * m]) * np.sqrt(0.5)
        im = (1.0 - 2.0 * c[2 * m + 1]) * np.sqrt(0.5)
        out[j] = (re + 1j * im).astype(np.complex64)
    return out


def put_mbsfn_rs_np(grid: np.ndarray, cell: Cell, sf_idx: int, area_id: int):
    syms, freqs = mbsfn_rs_positions(cell)
    seq = mbsfn_rs_sequence(cell, sf_idx, area_id)
    for j in range(3):
        grid[syms[j], freqs[j]] = seq[j]
    return grid


def chest_mbsfn(grid, cell: Cell, sf_idx: int, area_id: int):
    """LS at the dense MBSFN pilots → (ce (nsymb, nre), noise)."""
    import jax.numpy as jnp

    syms, freqs = mbsfn_rs_positions(cell)
    seq = mbsfn_rs_sequence(cell, sf_idx, area_id)
    ls = jnp.stack([grid[syms[j], freqs[j]] * np.conj(seq[j]) for j in range(3)])
    h = jnp.mean(ls, axis=0)  # (6*nof_prb,) at even subcarriers
    # interpolate 2-spaced pilots to the full grid (freq), constant in time
    nre = cell.nof_re_per_symbol
    full = jnp.interp(jnp.arange(nre, dtype=jnp.float32), jnp.asarray(freqs[0], jnp.float32), h.real) + 1j * jnp.interp(
        jnp.arange(nre, dtype=jnp.float32), jnp.asarray(freqs[0], jnp.float32), h.imag
    )
    noise = jnp.mean(jnp.abs(ls - h[None]) ** 2)
    ce = jnp.broadcast_to(full[None, :], (cell.nsymb_per_sf, nre))
    return ce, noise


@lru_cache(maxsize=64)
def pmch_re_indices(cell: Cell) -> np.ndarray:
    """Flat (l*nre + k) PMCH REs: the MBSFN region minus MBSFN RS."""
    nre = cell.nof_re_per_symbol
    reserved = np.zeros((cell.nsymb_per_sf, nre), bool)
    syms, freqs = mbsfn_rs_positions(cell)
    for j in range(3):
        reserved[syms[j], freqs[j]] = True
    out = []
    for l in range(NON_MBSFN_SYMS, cell.nsymb_per_sf):
        ks = np.nonzero(~reserved[l])[0]
        out.append(l * nre + ks)
    return np.concatenate(out).astype(np.int32)


def pmch_cinit(sf_idx: int, area_id: int) -> int:
    return (sf_idx << 9) + area_id


def pmch_encode_np(cell: Cell, sf_idx: int, area_id: int, mod, tbs: int, tb_bits: np.ndarray) -> np.ndarray:
    """TB → (nsymb, nre) grid (PMCH + MBSFN RS)."""
    idx = pmch_re_indices(cell)
    qm = MOD_QM[mod]
    coding = TbCoding(tbs=tbs, g=len(idx) * qm, qm=qm, rv=0, nof_layers=1)
    e = np.asarray(dlsch_encode_np(tb_bits, coding)).astype(np.uint8)
    seq = gold_sequence(pmch_cinit(sf_idx, area_id), len(e))
    scr = np.asarray(scramble_bits(e, seq))
    sym = modulate_np(mod, scr)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    grid.reshape(-1)[idx] = sym
    put_mbsfn_rs_np(grid, cell, sf_idx, area_id)
    return grid


def pmch_decode(rx_grid, cell: Cell, sf_idx: int, area_id: int, mod, tbs: int, max_iterations: int = 5):
    """Returns (tb_bits, crc_ok)."""
    import jax.numpy as jnp

    ce, noise = chest_mbsfn(rx_grid, cell, sf_idx, area_id)
    idx = jnp.asarray(pmch_re_indices(cell))
    y = rx_grid.reshape(-1)[idx]
    h = ce.reshape(-1)[idx]
    eq = y * jnp.conj(h) / (jnp.abs(h) ** 2 + noise)
    qm = MOD_QM[mod]
    llr = demod_soft(mod, eq)
    signs = gold_sequence_signs(pmch_cinit(sf_idx, area_id), len(idx) * qm)
    llr = scramble_soft(llr, signs)
    coding = TbCoding(tbs=tbs, g=len(idx) * qm, qm=qm, rv=0, nof_layers=1)
    tb, ok = dlsch_decode(np.asarray(llr, np.float32), coding, max_iterations)[:2]
    return np.asarray(tb), bool(np.asarray(ok))
