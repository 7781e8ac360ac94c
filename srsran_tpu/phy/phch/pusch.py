"""PUSCH: UL-SCH + UCI multiplexing + channel interleaver + DFT precoding.

Re-design of `lib/src/phy/phch/pusch.c` (encode :467), the UL channel
interleaver and UCI multiplexing (`sch.c:658-992`, `uci.c:329-631`).

Chain (TS 36.212 §5.2.2 / 36.211 §5.3): UL-SCH coding → CQI concatenation
+ RI-reserved / ACK-punctured time-first channel interleaver → scrambling
→ modulation → DFT precode → map to allocated PRBs (all symbols except
the DMRS symbol of each slot).  UCI coding: RM(32,O) cyclically extended
for CQI (encode_cqi_short, uci.c:359); RI/ACK as Qm-wise repetition (the
QPSK form of the TS 36.212 Table 5.2.2.6 placeholder encoding); Q'
dimensioning per §5.2.2.6 with the TS 36.213 §8.6.3 beta tables.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import Cell
from ..dft_precoding import dft_precode, dft_predecode
from ..mimo import predecode_single_mrc
from ..modem import Mod, demod_soft, modulate, modulate_np
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


# TS 36.213 Tables 8.6.3-1/-2/-3 (sch.c:42-86)
BETA_ACK = [2.0, 2.5, 3.125, 4.0, 5.0, 6.25, 8.0, 10.0, 12.625, 15.875, 20.0,
            31.0, 50.0, 80.0, 126.0]
BETA_RI = [1.25, 1.625, 2.0, 2.5, 3.125, 4.0, 5.0, 6.25, 8.0, 10.0, 12.625,
           15.875, 20.0]
BETA_CQI = [None, None, 1.125, 1.25, 1.375, 1.625, 1.750, 2.0, 2.25, 2.5,
            2.875, 3.125, 3.5, 4.0, 5.0, 6.25]

_RI_COLUMNS = (1, 4, 7, 10)   # normal CP (uci.c:586)
_ACK_COLUMNS = (2, 3, 8, 9)   # normal CP (uci.c:558)


@dataclasses.dataclass(frozen=True)
class UciCfg:
    """UCI carried on PUSCH (srslte_uci_cfg_t/uci_value_t roles)."""

    cqi_bits: tuple = ()  # payload bits, O <= 11 (wideband CQI/PMI)
    ack: tuple = ()       # HARQ-ACK values (0/1)
    ri: tuple = ()        # rank indicator values (0/1)
    i_offset_cqi: int = 7
    i_offset_ack: int = 6
    i_offset_ri: int = 6


def _k_segm(tbs: int) -> int:
    from ..fec.cbsegm import cbsegm

    seg = cbsegm(tbs)
    return seg.C_plus * seg.K_plus + seg.C_minus * seg.K_minus


def _qprime_cqi(o: int, l_prb: int, nsymb: int, beta: float, k_segm: int,
                qprime_ri: int) -> int:
    # uci.c:329-345 (O<=11 -> L=0)
    l = 0 if o < 11 else 8
    x = int(np.ceil((o + l) * l_prb * 12 * nsymb * beta / k_segm))
    return min(x, l_prb * 12 * nsymb - qprime_ri)


def _qprime_ri_ack(o: int, l_prb: int, nsymb: int, beta: float, k_segm: int) -> int:
    # uci.c:607-631
    x = int(np.ceil(o * l_prb * 12 * nsymb * beta / k_segm))
    return min(x, 4 * l_prb * 12)


def _uci_positions(qprime: int, qm: int, rows: int, columns) -> np.ndarray:
    """Bit positions of RI (reserved) or ACK (puncturing) groups — from the
    bottom interleaver row upward over the 4-column set (uci.c:551-605)."""
    i = np.arange(qprime)
    row = rows - 1 - i // 4
    col = np.asarray(columns)[(3 * i) % 4]
    base = (col * rows + row) * qm
    return (base[:, None] + np.arange(qm)[None, :]).reshape(-1).astype(np.int32)


@lru_cache(maxsize=64)
def _uci_layout(tbs: int, g: int, qm: int, nsymb: int, l_prb: int,
                n_cqi: int, n_ack: int, n_ri: int,
                i_cqi: int, i_ack: int, i_ri: int):
    """(data_write_positions, cqi_qbits, ri_positions, ack_positions,
    g_data) for one PUSCH+UCI configuration."""
    rows = g // (qm * 12)
    k_segm = _k_segm(tbs)
    qp_ri = _qprime_ri_ack(n_ri, l_prb, nsymb, BETA_RI[i_ri], k_segm) if n_ri else 0
    qp_ack = _qprime_ri_ack(n_ack, l_prb, nsymb, BETA_ACK[i_ack], k_segm) if n_ack else 0
    qp_cqi = _qprime_cqi(n_cqi, l_prb, nsymb, BETA_CQI[i_cqi], k_segm, qp_ri) if n_cqi else 0
    ri_pos = _uci_positions(qp_ri, qm, rows, _RI_COLUMNS)
    ack_pos = _uci_positions(qp_ack, qm, rows, _ACK_COLUMNS)
    # traversal order of ulsch_interleave_gen (sch.c:658-680): row-major
    # read, column-major write, skipping RI-reserved positions
    j, i, k = np.meshgrid(np.arange(rows), np.arange(12), np.arange(qm), indexing="ij")
    order = ((i * rows + j) * qm + k).reshape(-1)
    reserved = np.zeros(g, bool)
    reserved[ri_pos] = True
    write_pos = order[~reserved[order]]
    g_data = g - qm * (qp_ri + qp_cqi)
    return write_pos.astype(np.int32), qp_cqi * qm, ri_pos, ack_pos, g_data


def _encode_rep(values, nbits: int, qm: int) -> np.ndarray:
    """1..2-bit RI/ACK: Qm-wise repetition blocks (QPSK placeholder form)."""
    v = np.asarray(values, np.uint8)
    reps = nbits // qm
    return np.tile(np.repeat(v[:1] if len(v) == 1 else v[:2][:1], qm), reps)[:nbits]


def pusch_symbols_data(cell: Cell, shortened: bool = False) -> list[int]:
    """Data-bearing SC-FDMA symbols.  ``shortened`` drops the last symbol
    — the cell-specific SRS subframe format (TS 36.211 §5.5.3.3; the
    reference's pusch N_srs handling in ulsch coding)."""
    l_dmrs = dmrs_symbol_in_slot(cell)
    last = cell.nsymb_per_sf - (1 if shortened else 0)
    return [
        l for l in range(last)
        if l % cell.nsymb_per_slot != l_dmrs
    ]


def pusch_cinit(rnti: int, sf_idx: int, cell_id: int) -> int:
    return (rnti << 14) + (sf_idx << 9) + cell_id


def pusch_encode_np(cell: Cell, sf_idx: int, grant: UlGrant, tb_bits: np.ndarray,
                    uci: UciCfg | None = None, shortened: bool = False) -> np.ndarray:
    """TX: TB (+ optional UCI) → (nsymb_sf, nre) grid (UE side, 1 antenna)."""
    m_sc = 12 * grant.nof_prb
    data_syms = pusch_symbols_data(cell, shortened)
    g = len(data_syms) * m_sc * grant.qm
    if uci is not None and (uci.cqi_bits or uci.ack or uci.ri):
        from .uci import rm_encode

        write_pos, n_cqi_bits, ri_pos, ack_pos, g_data = _uci_layout(
            grant.tbs, g, grant.qm, len(data_syms), grant.nof_prb,
            len(uci.cqi_bits), len(uci.ack), len(uci.ri),
            uci.i_offset_cqi, uci.i_offset_ack, uci.i_offset_ri)
        coding = TbCoding(tbs=grant.tbs, g=g_data, qm=grant.qm, rv=grant.rv)
        data = dlsch_encode_np(tb_bits, coding)
        if n_cqi_bits:
            o = len(uci.cqi_bits)
            if o > 11:
                # TS 36.212 §5.2.2.6.4 / uci.c:409: payloads > 11 bits
                # (subband CQI reports) take CRC8 + tail-biting conv
                # code + circular rate match instead of RM(32,O)
                from ..common import LTE_CRC8
                from ..crc import crc_compute_np
                from ..fec.conv import convcoder_encode_np
                from ..fec.rate_match import conv_rm_indices

                b = np.asarray(uci.cqi_bits, np.uint8)
                coded = convcoder_encode_np(
                    np.concatenate([b, crc_compute_np(b, LTE_CRC8)]))
                cqi_coded = coded.reshape(-1)[
                    conv_rm_indices(coded.shape[-1], n_cqi_bits)]
            else:
                cw = np.asarray(
                    rm_encode(np.asarray(uci.cqi_bits, np.uint8), 32))
                cqi_coded = cw[np.arange(n_cqi_bits) % 32]  # uci.c:365
            gbits = np.concatenate([cqi_coded, data])
        else:
            gbits = data
        inter = np.zeros(g, np.uint8)
        inter[write_pos] = gbits
        if len(ri_pos):
            inter[ri_pos] = _encode_rep(uci.ri, len(ri_pos), grant.qm)
        if len(ack_pos):  # ACK punctures data (sch.c:1060-1076)
            inter[ack_pos] = _encode_rep(uci.ack, len(ack_pos), grant.qm)
    else:
        coding = TbCoding(tbs=grant.tbs, g=g, qm=grant.qm, rv=grant.rv)
        bits = dlsch_encode_np(tb_bits, coding)  # UL-SCH == same chain here
        idx = _interleaver_indices(g, grant.qm)
        inter = bits[idx]
    seq = gold_sequence(pusch_cinit(grant.rnti, sf_idx, cell.id), g)
    scr = np.asarray(scramble_bits(inter, seq))
    sym = modulate_np(grant.mod, scr).reshape(len(data_syms), m_sc)
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


def pusch_decode(rx_grid, ce, noise_est, cell: Cell, sf_idx: int, grant: UlGrant,
                 max_iterations: int = 5, softbuffers=None, uci: UciCfg | None = None,
                 shortened: bool = False):
    """eNB RX: (nrx, nsymb, nre) grid + (nrx or none) ce over allocation →
    (tb_bits, ok, softbuffers) — or (tb_bits, ok, softbuffers, uci_out)
    when `uci` describes expected UCI (sizes + offsets; values ignored).
    uci_out: {"cqi_bits", "ack", "ri"} decoded values."""
    m_sc = 12 * grant.nof_prb
    k0 = grant.prb_start * 12
    data_syms = pusch_symbols_data(cell, shortened)
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
    if uci is not None and (uci.cqi_bits or uci.ack or uci.ri):
        from .uci import rm_decode

        write_pos, n_cqi_bits, ri_pos, ack_pos, g_data = _uci_layout(
            grant.tbs, g, grant.qm, len(data_syms), grant.nof_prb,
            len(uci.cqi_bits), len(uci.ack), len(uci.ri),
            uci.i_offset_cqi, uci.i_offset_ack, uci.i_offset_ri)
        llr = np.array(llr, np.float32)  # writable copy
        out = {"cqi_bits": (), "ack": (), "ri": ()}
        if len(ri_pos):
            out["ri"] = tuple([int(llr[ri_pos].sum() > 0)] * len(uci.ri))
        if len(ack_pos):
            out["ack"] = tuple([int(llr[ack_pos].sum() > 0)] * len(uci.ack))
            llr[ack_pos] = 0.0  # punctured data -> erasures
        gl = llr[write_pos]
        if n_cqi_bits:
            o = len(uci.cqi_bits)
            if o > 11:
                # conv-coded CQI (> 11 bits, §5.2.2.6.4): de-rate-match
                # + Viterbi + CRC8 check (mirror of the encode branch)
                from ..common import LTE_CRC8
                from ..crc import crc_compute_np
                from ..fec.conv import viterbi_decode
                from ..fec.rate_match import conv_rate_match_rx_np

                d = o + 8
                dllr = conv_rate_match_rx_np(
                    np.asarray(gl[:n_cqi_bits], np.float32), d)
                cb = np.asarray(viterbi_decode(
                    jnp.asarray(dllr[None]), d))[0]
                if np.array_equal(cb[o:],
                                  crc_compute_np(cb[:o], LTE_CRC8)):
                    out["cqi_bits"] = tuple(int(b) for b in cb[:o])
            else:
                folded = np.zeros(32, np.float32)
                np.add.at(folded, np.arange(n_cqi_bits) % 32,
                          gl[:n_cqi_bits])
                bits, _metric = rm_decode(folded, len(uci.cqi_bits))
                out["cqi_bits"] = tuple(int(b) for b in np.asarray(bits))
        data_llr = gl[n_cqi_bits:]
        coding = TbCoding(tbs=grant.tbs, g=g_data, qm=grant.qm, rv=grant.rv)
        tb, ok, sb = dlsch_decode(np.asarray(data_llr, np.float32), coding,
                                  max_iterations, softbuffers)
        return tb, ok, sb, out
    idx = _interleaver_indices(g, grant.qm)
    deint = jnp.zeros_like(llr).at[jnp.asarray(idx)].set(llr)
    coding = TbCoding(tbs=grant.tbs, g=g, qm=grant.qm, rv=grant.rv)
    return dlsch_decode(np.asarray(deint, np.float32), coding, max_iterations, softbuffers)
