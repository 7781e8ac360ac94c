"""PUSCH: UL-SCH + channel interleaver + DFT precoding + RE mapping.

Re-design of `lib/src/phy/phch/pusch.c` (encode :467) and the UL channel
interleaver (`sch.c:658-992`; data-only round 1, UCI multiplexing follows).

Chain (TS 36.212 §5.2.2 / 36.211 §5.3): UL-SCH coding → time-first channel
interleaver → scrambling → modulation → DFT precode → map to allocated PRBs
(all symbols except the DMRS symbol of each slot).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import Cell
from ..dft_precoding import dft_precode, dft_predecode
from ..mimo import predecode_single_mrc
from ..modem import Mod, demod_soft, modulate
from ..scrambling import scramble_bits, scramble_soft
from ..sequence import gold_sequence, gold_sequence_signs
from .pdsch import MOD_QM
from .sch import TbCoding, dlsch_decode, dlsch_encode_np
from ..chest.refsignal_ul import dmrs_symbol_in_slot


@dataclasses.dataclass(frozen=True)
class UlGrant:
    prb_start: int
    nof_prb: int
    mod: Mod = Mod.QPSK
    tbs: int = 0
    rv: int = 0
    rnti: int = 0x1234

    @property
    def qm(self) -> int:
        return MOD_QM[self.mod]


@lru_cache(maxsize=256)
def _interleaver_indices(g: int, qm: int, c_mux: int = 12) -> np.ndarray:
    """Time-first channel interleaver permutation (TS 36.212 §5.2.2.8).

    Returns idx with out[i] = in[idx[i]] for the G coded bits.
    Bits are written row-wise in Qm-groups into (R', C_mux) and read
    column-wise.
    """
    assert g % (qm * c_mux) == 0, (g, qm, c_mux)
    r_prime = g // (qm * c_mux)
    m = np.arange(g).reshape(r_prime, c_mux, qm)
    out = m.transpose(1, 0, 2).reshape(-1)
    return out.astype(np.int32)


def pusch_symbols_data(cell: Cell) -> list[int]:
    l_dmrs = dmrs_symbol_in_slot(cell)
    return [
        l for l in range(cell.nsymb_per_sf)
        if l % cell.nsymb_per_slot != l_dmrs
    ]


def pusch_cinit(rnti: int, sf_idx: int, cell_id: int) -> int:
    return (rnti << 14) + (sf_idx << 9) + cell_id


def pusch_encode_np(cell: Cell, sf_idx: int, grant: UlGrant, tb_bits: np.ndarray) -> np.ndarray:
    """TX: TB → (nsymb_sf, nre) grid (UE side, single antenna)."""
    m_sc = 12 * grant.nof_prb
    data_syms = pusch_symbols_data(cell)
    g = len(data_syms) * m_sc * grant.qm
    coding = TbCoding(tbs=grant.tbs, g=g, qm=grant.qm, rv=grant.rv)
    bits = dlsch_encode_np(tb_bits, coding)  # UL-SCH == same chain here
    idx = _interleaver_indices(g, grant.qm)
    inter = bits[idx]
    seq = gold_sequence(pusch_cinit(grant.rnti, sf_idx, cell.id), g)
    scr = np.asarray(scramble_bits(inter, seq))
    sym = np.asarray(modulate(grant.mod, scr)).reshape(len(data_syms), m_sc)
    precoded = np.asarray(dft_precode(sym))
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    k0 = grant.prb_start * 12
    for i, l in enumerate(data_syms):
        grid[l, k0 : k0 + m_sc] = precoded[i]
    # DMRS
    from ..chest.refsignal_ul import pusch_dmrs

    l_dmrs = dmrs_symbol_in_slot(cell)
    for slot in range(2):
        grid[slot * cell.nsymb_per_slot + l_dmrs, k0 : k0 + m_sc] = pusch_dmrs(
            cell, grant.nof_prb, 0, slot
        )
    return grid


def pusch_decode(rx_grid, ce, noise_est, cell: Cell, sf_idx: int, grant: UlGrant, max_iterations: int = 5, softbuffers=None):
    """eNB RX: (nrx, nsymb, nre) grid + (nrx or none) ce over allocation →
    (tb_bits, ok, softbuffers).  ce: (nrx, nsymb_sf, m_sc)."""
    m_sc = 12 * grant.nof_prb
    k0 = grant.prb_start * 12
    data_syms = pusch_symbols_data(cell)
    g = len(data_syms) * m_sc * grant.qm
    y = rx_grid[..., jnp.asarray(data_syms), k0 : k0 + m_sc]  # (nrx, nsym, m)
    h = ce[..., jnp.asarray(data_syms), :]
    xf, csi = predecode_single_mrc(
        y.reshape(y.shape[0], -1), h.reshape(h.shape[0], -1), noise_est
    )
    xf = xf.reshape(len(data_syms), m_sc)
    csi = csi.reshape(len(data_syms), m_sc)
    x = dft_predecode(xf)
    llr = demod_soft(grant.mod, x.reshape(-1))
    csi_t = jnp.repeat(jnp.mean(csi, axis=-1, keepdims=True), m_sc, axis=-1)
    llr = llr * jnp.repeat(csi_t.reshape(-1), grant.qm)
    signs = gold_sequence_signs(pusch_cinit(grant.rnti, sf_idx, cell.id), g)
    llr = scramble_soft(llr, signs)
    idx = _interleaver_indices(g, grant.qm)
    deint = jnp.zeros_like(llr).at[jnp.asarray(idx)].set(llr)
    coding = TbCoding(tbs=grant.tbs, g=g, qm=grant.qm, rv=grant.rv)
    return dlsch_decode(np.asarray(deint, np.float32), coding, max_iterations, softbuffers)
