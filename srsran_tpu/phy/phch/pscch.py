"""PSCCH: sidelink control channel carrying SCI format 0 (TM1/2),
TS 36.211 §9.4 / TS 36.212 §5.4.3 (re-design of `lib/src/phy/phch/
pscch.c`, `sci.c` + the PSCCH DMRS part of `chest_sl.c`).

TM1/2: one PRB, 12 data symbols budgeted (the last SC-FDMA symbol is
dropped), QPSK; SCI-0 + CRC16 → K=7 TBCC → rate match to E = 288 →
C_mux=12 time-first interleaver → scrambling with the fixed seed 510 →
12-point DFT precoding. DMRS on symbols 3 and 10: the 1-PRB phi-table
base sequence with u = 0, cyclic shift 0, w = [1, 1].
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import numpy as np

from ..common import LTE_CRC16, Cell
from ..crc import crc_compute_np
from ..dft_precoding import dft_precode, dft_predecode
from ..fec.conv import convcoder_encode_np, viterbi_decode
from ..fec.rate_match import conv_rate_match_rx, conv_rate_match_tx
from ..modem import Mod, demod_soft, modulate, modulate_np
from ..sequence import gold_sequence, gold_sequence_signs
from ..chest.refsignal_ul import base_sequence
from .pusch import _interleaver_indices

SCRAMBLING_SEED = 510
N_DATA_BUDGET = 12
DATA_SYMS = (0, 1, 2, 4, 5, 6, 7, 8, 9, 11, 12)  # transmitted (11 of 12)
DMRS_SYMS = (3, 10)
M_SC = 12
E_BITS = N_DATA_BUDGET * M_SC * 2  # 288


def sci0_riv_nbits(nof_prb: int) -> int:
    return int(math.ceil(math.log2(nof_prb * (nof_prb + 1) / 2)))


def sci0_len(nof_prb: int) -> int:
    return 1 + sci0_riv_nbits(nof_prb) + 7 + 5 + 11 + 8


@dataclasses.dataclass(frozen=True)
class Sci0:
    """SCI format 0 (TS 36.212 §5.4.3.1.1)."""

    riv: int = 0
    trp_idx: int = 0
    mcs_idx: int = 0
    timing_advance: int = 0
    n_sa_id: int = 0
    freq_hopping: bool = False

    def pack(self, nof_prb: int) -> np.ndarray:
        bits = []

        def put(v, n):
            bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

        put(int(self.freq_hopping), 1)
        put(self.riv, sci0_riv_nbits(nof_prb))
        put(self.trp_idx, 7)
        put(self.mcs_idx, 5)
        put(self.timing_advance, 11)
        put(self.n_sa_id, 8)
        return np.array(bits, np.uint8)

    @classmethod
    def unpack(cls, bits, nof_prb: int) -> "Sci0":
        b = list(map(int, bits))
        pos = 0

        def get(n):
            nonlocal pos
            v = int("".join(map(str, b[pos : pos + n])), 2)
            pos += n
            return v

        fh = bool(get(1))
        return cls(get(sci0_riv_nbits(nof_prb)), get(7), get(5), get(11), get(8), fh)


@lru_cache(maxsize=1)
def pscch_dmrs_np() -> np.ndarray:
    """(2, 12) PSCCH DMRS (chest_sl_pscch_gen TM1/2: u=0, n_cs=0, w=1)."""
    r = base_sequence(0, M_SC)
    return np.stack([r, r]).astype(np.complex64)


def pscch_encode_np(sci: Sci0, nof_prb: int) -> np.ndarray:
    """SCI-0 → (11, 12) transmitted SC-FDMA symbols."""
    bits = sci.pack(nof_prb)
    crc = crc_compute_np(bits, LTE_CRC16)
    b = np.concatenate([bits, crc])
    coded = convcoder_encode_np(b).astype(np.float32)
    e = np.asarray(conv_rate_match_tx(coded, E_BITS)).astype(np.uint8)
    idx = _interleaver_indices(E_BITS, 2, c_mux=N_DATA_BUDGET)
    inter = e[idx]
    seq = gold_sequence(SCRAMBLING_SEED, E_BITS)
    scr = (inter ^ seq).astype(np.uint8)
    sym = modulate_np(Mod.QPSK, scr).reshape(N_DATA_BUDGET, M_SC)
    prec = np.asarray(dft_precode(sym))
    return prec[: len(DATA_SYMS)]


def put_pscch_np(grid: np.ndarray, cell: Cell, sci: Sci0, prb_idx: int):
    k0 = prb_idx * 12
    sym = pscch_encode_np(sci, cell.nof_prb)
    for i, l in enumerate(DATA_SYMS):
        grid[l, k0 : k0 + M_SC] = sym[i]
    dmrs = pscch_dmrs_np()
    for j, l in enumerate(DMRS_SYMS):
        grid[l, k0 : k0 + M_SC] = dmrs[j]
    return grid


def pscch_decode(grid, cell: Cell, prb_idx: int):
    """Try to decode a SCI-0 from `prb_idx`; returns (Sci0, ok)."""
    import jax.numpy as jnp

    k0 = prb_idx * 12
    dmrs = pscch_dmrs_np()
    ce = sum(np.asarray(grid[l, k0 : k0 + M_SC]) * np.conj(dmrs[j]) for j, l in enumerate(DMRS_SYMS)) / 2
    if float(np.mean(np.abs(ce))) < 1e-6:
        return Sci0(), False
    noise = float(np.mean(np.abs(np.asarray(grid[DMRS_SYMS[0], k0 : k0 + M_SC]) * np.conj(dmrs[0]) - ce) ** 2))
    eq = np.stack(
        [np.asarray(grid[l, k0 : k0 + M_SC]) * np.conj(ce) / (np.abs(ce) ** 2 + noise) for l in DATA_SYMS]
    )
    deprec = np.asarray(dft_predecode(jnp.asarray(eq)))
    llr_tx = np.asarray(demod_soft(Mod.QPSK, jnp.asarray(deprec.reshape(-1))))
    llr = np.zeros(E_BITS, np.float32)
    llr[: len(llr_tx)] = llr_tx
    signs = gold_sequence_signs(SCRAMBLING_SEED, E_BITS)
    llr = llr * signs
    idx = _interleaver_indices(E_BITS, 2, c_mux=N_DATA_BUDGET)
    deinter = np.zeros(E_BITS, np.float32)
    deinter[idx] = llr
    n = sci0_len(cell.nof_prb)
    d = np.asarray(conv_rate_match_rx(jnp.asarray(deinter), n + 16))
    bits = np.asarray(viterbi_decode(jnp.asarray(d[None]), n + 16))[0]
    ok = np.array_equal(bits[n:], crc_compute_np(bits[:n], LTE_CRC16))
    return Sci0.unpack(bits[:n], cell.nof_prb), ok


# --- TM3/4 (V2X) variant ----------------------------------------------------

SCI1_LEN = 32  # SCI format 1 is zero-padded to 32 bits (SRSLTE_SCI_TM34_LEN)
DATA_SYMS_TM34 = (0, 1, 3, 4, 6, 7, 9, 10, 12)  # 9 transmitted of 10 budget
DMRS_SYMS_TM34 = (2, 5, 8, 11)
N_DATA_BUDGET_TM34 = 10
NOF_PRB_TM34 = 2
E_BITS_TM34 = N_DATA_BUDGET_TM34 * NOF_PRB_TM34 * 12 * 2


@dataclasses.dataclass(frozen=True)
class Sci1:
    """SCI format 1 (V2X, TS 36.212 §5.4.3.1.2)."""

    priority: int = 0
    resource_reserv: int = 0
    riv: int = 0
    time_gap: int = 0
    mcs_idx: int = 0
    retransmission: bool = False

    @staticmethod
    def riv_nbits(num_sub_channel: int) -> int:
        return int(math.ceil(math.log2(num_sub_channel * (num_sub_channel + 1) / 2)))

    def pack(self, num_sub_channel: int) -> np.ndarray:
        bits = []

        def put(v, n):
            bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

        put(self.priority, 3)
        put(self.resource_reserv, 4)
        put(self.riv, Sci1.riv_nbits(num_sub_channel))
        put(self.time_gap, 4)
        put(self.mcs_idx, 5)
        put(int(self.retransmission), 1)
        bits += [0] * (SCI1_LEN - len(bits))
        return np.array(bits, np.uint8)

    @classmethod
    def unpack(cls, bits, num_sub_channel: int) -> "Sci1":
        b = list(map(int, bits))
        pos = 0

        def get(n):
            nonlocal pos
            v = int("".join(map(str, b[pos : pos + n])), 2)
            pos += n
            return v

        return cls(get(3), get(4), get(Sci1.riv_nbits(num_sub_channel)), get(4), get(5), bool(get(1)))


@lru_cache(maxsize=8)
def pscch_dmrs_tm34_np(cyclic_shift: int) -> np.ndarray:
    """(4, 24) TM3/4 PSCCH DMRS: u = 8, n_cs = given shift, w = ones."""
    alpha = 2 * np.pi * cyclic_shift / 12
    r = base_sequence(8, NOF_PRB_TM34 * 12) * np.exp(1j * alpha * np.arange(NOF_PRB_TM34 * 12))
    return np.stack([r] * 4).astype(np.complex64)


def pscch_decode_tm34(grid, cell: Cell, prb_start: int, cyclic_shift: int, num_sub_channel: int):
    """TM3/4 SCI-1 decode from the 2 PSCCH PRBs; returns (Sci1, crc_bits, ok)."""
    import jax.numpy as jnp

    k0 = prb_start * 12
    m_sc = NOF_PRB_TM34 * 12
    dmrs = pscch_dmrs_tm34_np(cyclic_shift)
    ce = sum(np.asarray(grid[l, k0 : k0 + m_sc]) * np.conj(dmrs[j]) for j, l in enumerate(DMRS_SYMS_TM34)) / 4
    if float(np.mean(np.abs(ce))) < 1e-6:
        return Sci1(), np.zeros(16, np.uint8), False
    noise = float(np.mean(np.abs(np.asarray(grid[DMRS_SYMS_TM34[0], k0 : k0 + m_sc]) * np.conj(dmrs[0]) - ce) ** 2))
    eq = np.stack(
        [np.asarray(grid[l, k0 : k0 + m_sc]) * np.conj(ce) / (np.abs(ce) ** 2 + noise) for l in DATA_SYMS_TM34]
    )
    deprec = np.asarray(dft_predecode(jnp.asarray(eq)))
    llr_tx = np.asarray(demod_soft(Mod.QPSK, jnp.asarray(deprec.reshape(-1))))
    llr = np.zeros(E_BITS_TM34, np.float32)
    llr[: len(llr_tx)] = llr_tx
    signs = gold_sequence_signs(SCRAMBLING_SEED, E_BITS_TM34)
    llr = llr * signs
    idx = _interleaver_indices(E_BITS_TM34, 2, c_mux=N_DATA_BUDGET_TM34)
    deinter = np.zeros(E_BITS_TM34, np.float32)
    deinter[idx] = llr
    d = np.asarray(conv_rate_match_rx(jnp.asarray(deinter), SCI1_LEN + 16))
    bits = np.asarray(viterbi_decode(jnp.asarray(d[None]), SCI1_LEN + 16))[0]
    crc_bits = crc_compute_np(bits[:SCI1_LEN], LTE_CRC16)
    ok = np.array_equal(bits[SCI1_LEN:], crc_bits)
    return Sci1.unpack(bits[:SCI1_LEN], num_sub_channel), crc_bits, ok
