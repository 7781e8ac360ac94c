"""PDSCH: resource mapping, modulation, scrambling, and the decode pipeline.

Re-design of `lib/src/phy/phch/pdsch.c` (decode pipeline :785-1007: RE
extract → predecode → layer demap → soft demod → descramble → DL-SCH).

RE mapping is a host-precomputed index table per (cell, sf, cfi, prb set):
on device, mapping is one scatter (tx) / gather (rx) — no per-RE control
flow.  The decode chain is fully batched and jit-friendly; `dlsch_decode`
orchestrates the batched turbo decode.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import Cell
from ..mimo import (
    layerdemap,
    layermap,
    precode_diversity2,
    predecode_diversity2,
    predecode_single_mrc,
    predecode_zf_mmse,
    precode_spatialmux,
)
from ..modem import Mod, demod_soft, modulate, modulate_np
from ..scrambling import scramble_bits, scramble_soft
from ..sequence import gold_sequence, gold_sequence_signs
from .sch import TbCoding, dlsch_decode, dlsch_encode_np

MOD_QM = {Mod.QPSK: 2, Mod.QAM16: 4, Mod.QAM64: 6, Mod.QAM256: 8}


@dataclasses.dataclass(frozen=True)
class DlGrant:
    """Simplified DL grant (subset of `srslte_pdsch_grant_t`)."""

    prb: tuple[int, ...]  # allocated PRB indices (same in both slots)
    mod: Mod = Mod.QPSK
    tbs: int = 0
    rv: int = 0
    rnti: int = 0x1234
    tx_scheme: str = "port0"  # port0 | diversity | diversity4 | cdd | spatialmux
    nof_layers: int = 1
    pmi: int = 0

    @property
    def qm(self) -> int:
        return MOD_QM[self.mod]


@lru_cache(maxsize=512)
def pdsch_re_indices(
    cell: Cell, sf_idx: int, cfi: int, prb: tuple[int, ...],
    tdd: bool = False, last_symbol: int | None = None,
) -> np.ndarray:
    """Flat indices (symbol*nre + k) of PDSCH REs, in LTE mapping order
    (frequency-first within each symbol, symbols ascending).

    Skips: control region (cfi symbols), CRS of all cell ports, PSS/SSS
    and PBCH in the central 6 PRB.  ``tdd`` moves the sync signals to
    their frame-structure-2 positions (PSS: symbol 2 of sf 1/6; SSS: last
    symbol of sf 0/5 — TS 36.211 §6.11).  ``last_symbol`` truncates the
    data region for TDD special subframes (DwPTS, ra_dl.c:61-62).
    """
    nre = cell.nof_re_per_symbol
    nsymb = cell.nsymb_per_sf
    if last_symbol is not None:
        nsymb = min(nsymb, last_symbol)
    nctrl = cfi + (1 if cell.nof_prb < 10 else 0)
    vshift = cell.id % 6

    reserved = np.zeros((cell.nsymb_per_sf, nre), bool)
    # CRS: ports 0/1 on symbols 0 and nsymb_slot-3 of each slot; 4 ports add symbol 1
    nports = max(cell.nof_ports, 1)
    for slot in range(2):
        base = slot * cell.nsymb_per_slot
        crs_syms = [base + 0, base + cell.nsymb_per_slot - 3]
        vs = {0: [0, 3], 1: [0, 3], 2: [0, 3], 4: [0, 3]}  # v values present
        for li, l in enumerate(crs_syms):
            # port0: v = 0 on ref0, 3 on ref1; port1 mirrored — union = {0,3}
            # for 1-port cells only port0's v applies
            if nports == 1:
                v_list = [0 if li == 0 else 3]
            else:
                v_list = [0, 3]
            for v in v_list:
                k = (v + vshift) % 6 + 6 * np.arange(2 * cell.nof_prb)
                reserved[l, k] = True
        if nports == 4:
            l = base + 1
            v_list = [0, 3]
            for v in v_list:
                k = (v + vshift) % 6 + 6 * np.arange(2 * cell.nof_prb)
                reserved[l, k] = True

    # PSS/SSS: central 6 PRB (72 REs).  FDD: both at the end of slot 0 of
    # sf 0/5.  TDD: PSS on symbol 2 of sf 1/6, SSS on the last symbol of
    # sf 0/5 (TS 36.211 §6.11.1.2/§6.11.2.2).
    c0 = (cell.nof_prb // 2) * 12 - 36 + (6 * (cell.nof_prb % 2))
    central = np.arange(c0, c0 + 72)
    if not tdd:
        if sf_idx in (0, 5):
            reserved[cell.nsymb_per_slot - 1, central] = True  # PSS
            reserved[cell.nsymb_per_slot - 2, central] = True  # SSS
    else:
        if sf_idx in (1, 6):
            reserved[2, central] = True  # PSS (DwPTS)
        if sf_idx in (0, 5):
            reserved[cell.nsymb_per_sf - 1, central] = True  # SSS
    # PBCH: subframe 0, slot 1 symbols 0..3, central 72 REs
    if sf_idx == 0:
        for l in range(4):
            reserved[cell.nsymb_per_slot + l, central] = True

    sel = []
    prb_arr = np.asarray(sorted(prb))
    sc = (prb_arr[:, None] * 12 + np.arange(12)[None, :]).reshape(-1)
    sc.sort()
    for l in range(nctrl, nsymb):
        ks = sc[~reserved[l, sc]]
        sel.append(l * nre + ks)
    return np.concatenate(sel).astype(np.int32)


def pdsch_cinit(rnti: int, sf_idx: int, cell_id: int, q: int = 0) -> int:
    """TS 36.211 §6.3.1 PDSCH scrambling c_init."""
    return (rnti << 14) + (q << 13) + (sf_idx << 9) + cell_id


def pdsch_nof_re(cell: Cell, sf_idx: int, cfi: int, prb: tuple[int, ...],
                 tdd: bool = False, last_symbol: int | None = None) -> int:
    return len(pdsch_re_indices(cell, sf_idx, cfi, prb, tdd, last_symbol))


def pdsch_encode_np(
    cell: Cell, sf_idx: int, cfi: int, grant: DlGrant, tb_bits: np.ndarray,
    tdd: bool = False, last_symbol: int | None = None,
) -> np.ndarray:
    """Host TX: encode one TB into a (nof_ports, nsymb, nre) grid (no CRS).

    Mirrors `srslte_pdsch_encode`/enb_dl put chain.  ``tdd``/``last_symbol``
    select frame-structure-2 sync positions and the DwPTS data region.
    """
    idx = pdsch_re_indices(cell, sf_idx, cfi, grant.prb, tdd, last_symbol)
    n_re = len(idx)
    nof_ports = {"diversity": 2, "cdd": 2, "spatialmux": 2, "diversity4": 4}.get(grant.tx_scheme, 1)
    g = n_re * grant.qm * (grant.nof_layers if grant.tx_scheme not in ("diversity", "diversity4") else 1)
    coding = TbCoding(tbs=grant.tbs, g=g, qm=grant.qm, rv=grant.rv, nof_layers=grant.nof_layers)
    bits = dlsch_encode_np(tb_bits, coding)
    seq = gold_sequence(pdsch_cinit(grant.rnti, sf_idx, cell.id), len(bits))
    scrambled = np.asarray(scramble_bits(bits, seq))
    sym = modulate_np(grant.mod, scrambled)
    if grant.tx_scheme == "port0":
        ports = sym[None, :]
    elif grant.tx_scheme == "diversity":
        ports = np.asarray(precode_diversity2(sym))
    elif grant.tx_scheme == "diversity4":
        from ..mimo import precode_diversity4

        ports = np.asarray(precode_diversity4(jnp.asarray(sym)))
    elif grant.tx_scheme == "cdd":
        from ..mimo import precode_cdd2

        layers = np.asarray(layermap([jnp.asarray(sym)], 2))
        ports = np.asarray(precode_cdd2(jnp.asarray(layers)))
    elif grant.tx_scheme == "spatialmux":
        layers = np.asarray(layermap([sym], grant.nof_layers))
        ports = np.asarray(precode_spatialmux(layers, grant.pmi))
    else:
        raise NotImplementedError(grant.tx_scheme)
    grid = np.zeros((ports.shape[0], cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    flat = grid.reshape(ports.shape[0], -1)
    flat[:, idx] = ports
    return grid


def pdsch_decode(
    rx_grid,
    ce,
    noise_est,
    cell: Cell,
    sf_idx: int,
    cfi: int,
    grant: DlGrant,
    max_iterations: int = 5,
    softbuffers=None,
    tdd: bool = False,
    last_symbol: int | None = None,
):
    """UE RX: decode one TB.

    rx_grid: (nrx, nsymb, nre) complex; ce: (nrx, nports, nsymb, nre).
    Returns (tb_bits, crc_ok, softbuffers).
    """
    idx = jnp.asarray(pdsch_re_indices(cell, sf_idx, cfi, grant.prb, tdd, last_symbol))
    n_re = len(idx)
    y = rx_grid.reshape(rx_grid.shape[0], -1)[:, idx]  # (nrx, M)
    h = ce.reshape(ce.shape[0], ce.shape[1], -1)[:, :, idx]  # (nrx, nports, M)

    if grant.tx_scheme == "port0":
        x, csi = predecode_single_mrc(y, h[:, 0], noise_est)
        sym_cw = x
        csi_cw = csi
        nof_layers = 1
    elif grant.tx_scheme == "diversity":
        x, csi = predecode_diversity2(y, h)
        sym_cw = x
        csi_cw = csi
        nof_layers = 1
    elif grant.tx_scheme == "diversity4":
        from ..mimo import predecode_diversity4

        x, csi = predecode_diversity4(y, h)
        sym_cw = x
        csi_cw = csi
        nof_layers = 1
    elif grant.tx_scheme == "cdd":
        from ..mimo import predecode_cdd2

        x, csi = predecode_cdd2(y, h, noise_est)
        sym_cw = layerdemap(x, 1)[0]
        csi_cw = layerdemap(csi.astype(jnp.complex64), 1)[0].real
        nof_layers = 2
    elif grant.tx_scheme == "spatialmux":
        x, csi = predecode_zf_mmse(y, h, grant.nof_layers, noise_est, pmi=grant.pmi)
        sym_cw = layerdemap(x, 1)[0]
        csi_cw = layerdemap(csi.astype(jnp.complex64), 1)[0].real
        nof_layers = grant.nof_layers
    else:
        raise NotImplementedError(grant.tx_scheme)

    llr = demod_soft(grant.mod, sym_cw)
    # CSI weighting (reference csi option): scale LLRs by channel quality
    csi_rep = jnp.repeat(csi_cw, grant.qm, axis=-1)
    llr = llr * csi_rep
    g = n_re * grant.qm * (nof_layers if grant.tx_scheme not in ("diversity", "diversity4") else 1)
    signs = gold_sequence_signs(pdsch_cinit(grant.rnti, sf_idx, cell.id), g)
    llr = scramble_soft(llr, signs)
    coding = TbCoding(tbs=grant.tbs, g=g, qm=grant.qm, rv=grant.rv, nof_layers=nof_layers)
    return dlsch_decode(np.asarray(llr, np.float32), coding, max_iterations, softbuffers)


@dataclasses.dataclass
class DlGrant2:
    """Two-codeword spatial-multiplexing grant (TM3/TM4, DCI 2/2A)."""

    prb: tuple[int, ...]
    mod1: Mod
    tbs1: int
    mod2: Mod
    tbs2: int
    rv1: int = 0
    rv2: int = 0
    pmi: int = 0  # codebook index (TM4); 0 = identity-ish
    rnti: int = 0x1234
    # "spatialmux" (2-port TM4 codebook) | "cdd" (2-port TM3) |
    # "spatialmux4" (4-port codebook, TS 36.211 Table 6.3.4.2.3-2)
    tx_scheme: str = "spatialmux"
    nof_layers: int = 2  # 2..4 (2 codewords; >2 only with spatialmux4)

    @property
    def qm1(self) -> int:
        return MOD_QM[self.mod1]

    @property
    def qm2(self) -> int:
        return MOD_QM[self.mod2]


def pdsch_encode2_np(
    cell: Cell, sf_idx: int, cfi: int, grant: DlGrant2, tb1: np.ndarray, tb2: np.ndarray
) -> np.ndarray:
    """Two-codeword TX: each TB → its own DL-SCH chain + per-q scrambling,
    1 layer per codeword, 2x2 codebook precoding (srslte_pdsch_encode
    multi-codeword path)."""
    idx = pdsch_re_indices(cell, sf_idx, cfi, grant.prb)
    n_re = len(idx)
    nl = grant.nof_layers if grant.tx_scheme == "spatialmux4" else 2
    nl_cw = (nl // 2, nl - nl // 2)
    cws = []
    for q, (tb, mod, tbs, rv, qm) in enumerate(
        ((tb1, grant.mod1, grant.tbs1, grant.rv1, grant.qm1),
         (tb2, grant.mod2, grant.tbs2, grant.rv2, grant.qm2))
    ):
        coding = TbCoding(tbs=tbs, g=n_re * qm * nl_cw[q], qm=qm, rv=rv, nof_layers=nl_cw[q])
        bits = dlsch_encode_np(tb, coding)
        seq = gold_sequence(pdsch_cinit(grant.rnti, sf_idx, cell.id, q=q), len(bits))
        cws.append(np.asarray(modulate(mod, np.asarray(scramble_bits(bits, seq)))))
    layers = np.asarray(layermap([jnp.asarray(c) for c in cws], nl))
    if grant.tx_scheme == "cdd":
        from ..mimo import precode_cdd2

        ports = np.asarray(precode_cdd2(jnp.asarray(layers)))
    elif grant.tx_scheme == "spatialmux4":
        from ..mimo import precode_spatialmux4

        ports = np.asarray(precode_spatialmux4(jnp.asarray(layers), grant.pmi))
    else:
        ports = np.asarray(precode_spatialmux(jnp.asarray(layers), grant.pmi))
    nports = ports.shape[0]
    grid = np.zeros((nports, cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    grid.reshape(nports, -1)[:, idx] = ports
    return grid


def pdsch_decode2(
    rx_grid, ce, noise_est, cell: Cell, sf_idx: int, cfi: int, grant: DlGrant2,
    max_iterations: int = 5, softbuffers=(None, None),
):
    """Two-codeword RX: MMSE predecode → per-codeword demap/descramble/
    DL-SCH. Returns [(tb1, ok1, sb1), (tb2, ok2, sb2)]."""
    idx = jnp.asarray(pdsch_re_indices(cell, sf_idx, cfi, grant.prb))
    n_re = len(idx)
    y = rx_grid.reshape(rx_grid.shape[0], -1)[:, idx]
    h = ce.reshape(ce.shape[0], ce.shape[1], -1)[:, :, idx]
    nl = grant.nof_layers if grant.tx_scheme == "spatialmux4" else 2
    nl_cw = (nl // 2, nl - nl // 2)
    if grant.tx_scheme == "cdd":
        from ..mimo import predecode_cdd2

        x, csi = predecode_cdd2(y, h, noise_est)
    elif grant.tx_scheme == "spatialmux4":
        from ..mimo import predecode_spatialmux4

        x, csi = predecode_spatialmux4(y, h, nl, grant.pmi, noise_est)
        csi = csi.astype(jnp.complex64)
    else:
        x, csi = predecode_zf_mmse(y, h, 2, noise_est, pmi=grant.pmi)
    sym_cws = layerdemap(x, 2)
    csi_cws = layerdemap(csi.astype(jnp.complex64), 2)
    out = []
    for q, (sym, csic, mod, tbs, rv, qm, sb) in enumerate(
        (
            (sym_cws[0], csi_cws[0].real, grant.mod1, grant.tbs1, grant.rv1, grant.qm1, softbuffers[0]),
            (sym_cws[1], csi_cws[1].real, grant.mod2, grant.tbs2, grant.rv2, grant.qm2, softbuffers[1]),
        )
    ):
        llr = demod_soft(mod, sym)
        llr = llr * jnp.repeat(csic, qm, axis=-1)
        signs = gold_sequence_signs(pdsch_cinit(grant.rnti, sf_idx, cell.id, q=q), n_re * qm * nl_cw[q])
        llr = scramble_soft(llr, signs)
        coding = TbCoding(tbs=tbs, g=n_re * qm * nl_cw[q], qm=qm, rv=rv, nof_layers=nl_cw[q])
        out.append(dlsch_decode(np.asarray(llr, np.float32), coding, max_iterations, sb))
    return out
