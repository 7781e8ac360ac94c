"""PSSCH: sidelink shared channel (SL-SCH), TS 36.211 §9.3 / TS 36.212
§5.4.2 (re-design of `lib/src/phy/phch/pssch.c` + the PSSCH DMRS part of
`chest_sl.c`).

TM1/2: 12 data symbols budgeted per subframe (11 transmitted), QPSK/16QAM
from the UL MCS table; SL-SCH coding = the UL-SCH transport-block chain
(CRC24A, segmentation, turbo, rate matching) followed by the C_mux=12
time-first interleaver, scrambling c_init = N_x_id·2^14 + (sf%10)·2^9 +
510, and SC-FDMA DFT precoding. DMRS on symbols 3/10 with group hopping
driven by N_x_id (f_gh pattern from a Gold sequence seeded N_x_id/30).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..common import Cell
from ..dft_precoding import dft_precode, dft_predecode
from ..modem import demod_soft, modulate, modulate_np
from ..sequence import gold_sequence, gold_sequence_signs
from ..chest.refsignal_ul import base_sequence
from .pusch import _interleaver_indices
from .ra import tbs_lookup, ul_mcs_to_itbs, ul_mcs_to_mod
from .sch import TbCoding, dlsch_decode, dlsch_encode_np
from .pscch import DATA_SYMS, DMRS_SYMS  # same TM1/2 subframe layout

N_DATA_BUDGET = 12


def pssch_cinit(n_x_id: int, sf_idx: int) -> int:
    return n_x_id * 16384 + (sf_idx % 10) * 512 + 510


@lru_cache(maxsize=256)
def pssch_dmrs_np(n_x_id: int, nof_prb: int) -> np.ndarray:
    """(2, nof_prb*12) PSSCH DMRS (chest_sl_pssch_gen, TM1/2)."""
    m_sc = nof_prb * 12
    c = gold_sequence(n_x_id // 30, 8 * 2)  # f_gh pattern, first 2 slots
    f_ss = n_x_id % 30
    n_cs = (n_x_id // 2) % 8
    alpha = 2 * np.pi * n_cs / 12
    out = []
    w = (1.0, 1.0) if n_x_id % 2 == 0 else (1.0, -1.0)
    for ns in range(2):
        f_gh = sum(int(c[8 * ns + i]) << i for i in range(8))
        u = (f_gh + f_ss) % 30
        r = base_sequence(u, m_sc) * np.exp(1j * alpha * np.arange(m_sc))
        out.append(w[ns] * r)
    return np.stack(out).astype(np.complex64)


def _coding(mcs_idx: int, nof_prb: int, rv: int) -> TbCoding:
    from .pdsch import MOD_QM

    mod = ul_mcs_to_mod(mcs_idx)
    qm = MOD_QM[mod]
    tbs = tbs_lookup(ul_mcs_to_itbs(mcs_idx), nof_prb)
    g = N_DATA_BUDGET * nof_prb * 12 * qm
    return TbCoding(tbs=tbs, g=g, qm=qm, rv=rv, nof_layers=1)


def pssch_encode_np(
    tb_bits: np.ndarray, n_x_id: int, mcs_idx: int, nof_prb: int, sf_idx: int, rv: int = 0
) -> np.ndarray:
    """TB → (11, nof_prb*12) transmitted SC-FDMA symbols."""
    coding = _coding(mcs_idx, nof_prb, rv)
    mod = ul_mcs_to_mod(mcs_idx)
    e = np.asarray(dlsch_encode_np(tb_bits, coding)).astype(np.uint8)
    idx = _interleaver_indices(coding.g, coding.qm, c_mux=N_DATA_BUDGET)
    inter = e[idx]
    seq = gold_sequence(pssch_cinit(n_x_id, sf_idx), coding.g)
    scr = (inter ^ seq).astype(np.uint8)
    sym = modulate_np(mod, scr).reshape(N_DATA_BUDGET, nof_prb * 12)
    prec = np.asarray(dft_precode(sym))
    return prec[: len(DATA_SYMS)]


def put_pssch_np(grid, cell: Cell, tb_bits, n_x_id: int, mcs_idx: int, prb_start: int, nof_prb: int, sf_idx: int, rv: int = 0):
    k0 = prb_start * 12
    m_sc = nof_prb * 12
    sym = pssch_encode_np(tb_bits, n_x_id, mcs_idx, nof_prb, sf_idx, rv)
    for i, l in enumerate(DATA_SYMS):
        grid[l, k0 : k0 + m_sc] = sym[i]
    dmrs = pssch_dmrs_np(n_x_id, nof_prb)
    for j, l in enumerate(DMRS_SYMS):
        grid[l, k0 : k0 + m_sc] = dmrs[j]
    return grid


def pssch_decode(grid, cell: Cell, n_x_id: int, mcs_idx: int, prb_start: int, nof_prb: int, sf_idx: int, rv: int = 0):
    """Returns (tb_bits, crc_ok)."""
    import jax.numpy as jnp

    k0 = prb_start * 12
    m_sc = nof_prb * 12
    dmrs = pssch_dmrs_np(n_x_id, nof_prb)
    ce = sum(np.asarray(grid[l, k0 : k0 + m_sc]) * np.conj(dmrs[j]) for j, l in enumerate(DMRS_SYMS)) / 2
    if float(np.mean(np.abs(ce))) < 1e-6:
        return np.zeros(0, np.uint8), False
    noise = float(np.mean(np.abs(np.asarray(grid[DMRS_SYMS[0], k0 : k0 + m_sc]) * np.conj(dmrs[0]) - ce) ** 2))
    eq = np.stack(
        [np.asarray(grid[l, k0 : k0 + m_sc]) * np.conj(ce) / (np.abs(ce) ** 2 + noise) for l in DATA_SYMS]
    )
    deprec = np.asarray(dft_predecode(jnp.asarray(eq)))
    coding = _coding(mcs_idx, nof_prb, rv)
    mod = ul_mcs_to_mod(mcs_idx)
    llr_tx = np.asarray(demod_soft(mod, jnp.asarray(deprec.reshape(-1))))
    llr = np.zeros(coding.g, np.float32)
    llr[: len(llr_tx)] = llr_tx
    signs = gold_sequence_signs(pssch_cinit(n_x_id, sf_idx), coding.g)
    llr = llr * signs
    idx = _interleaver_indices(coding.g, coding.qm, c_mux=N_DATA_BUDGET)
    deinter = np.zeros(coding.g, np.float32)
    deinter[idx] = llr
    tb, ok = dlsch_decode(deinter, coding)[:2]
    return np.asarray(tb), bool(np.asarray(ok))


# --- TM3/4 (V2X) variant ----------------------------------------------------

from .pscch import DATA_SYMS_TM34, DMRS_SYMS_TM34  # same subframe layout

N_DATA_BUDGET_TM34 = 10


@lru_cache(maxsize=256)
def pssch_dmrs_tm34_np(n_x_id: int, nof_prb: int, sf_idx: int) -> np.ndarray:
    """(4, nof_prb*12) TM3/4 PSSCH DMRS: f_gh pattern indexed by
    (4·(sf%10) + ns), f_ss = (N_x_id/16) % 30, w = ±1 by id parity."""
    m_sc = nof_prb * 12
    c = gold_sequence(n_x_id // 30, 8 * 40)
    f_ss = (n_x_id // 16) % 30
    n_cs = (n_x_id // 2) % 8
    alpha = 2 * np.pi * n_cs / 12
    w = (1.0, 1.0, 1.0, 1.0) if n_x_id % 2 == 0 else (1.0, -1.0, 1.0, -1.0)
    out = []
    for ns in range(4):
        pat = (2 * 2 * (sf_idx % 10)) + ns
        f_gh = sum(int(c[8 * pat + i]) << i for i in range(8))
        u = (f_gh + f_ss) % 30
        r = base_sequence(u, m_sc) * np.exp(1j * alpha * np.arange(m_sc))
        out.append(w[ns] * r)
    return np.stack(out).astype(np.complex64)


def pssch_decode_tm34(grid, cell: Cell, n_x_id: int, mcs_idx: int, prb_start: int, nof_prb: int, sf_idx: int, rv: int = 0):
    """TM3/4 PSSCH decode; returns (tb_bits, crc_ok)."""
    import jax.numpy as jnp
    from .pdsch import MOD_QM

    k0 = prb_start * 12
    m_sc = nof_prb * 12
    dmrs = pssch_dmrs_tm34_np(n_x_id, nof_prb, sf_idx)
    # per-DMRS-symbol LS estimates: average magnitude/shape, and fit a
    # linear common-phase ramp over the symbol index (residual CFO on
    # real radio captures — the chest_sl sync_error/CFO handling analog)
    ls = [np.asarray(grid[l, k0 : k0 + m_sc]) * np.conj(dmrs[j]) for j, l in enumerate(DMRS_SYMS_TM34)]
    ce = sum(ls) / 4
    if float(np.mean(np.abs(ce))) < 1e-6:
        return np.zeros(0, np.uint8), False
    ph = np.unwrap([np.angle(np.vdot(ce, l_)) for l_ in ls])
    slope = np.polyfit(np.asarray(DMRS_SYMS_TM34, np.float64), ph, 1)[0]
    rot = {l: np.exp(-1j * slope * (l - np.mean(DMRS_SYMS_TM34))) for l in DATA_SYMS_TM34}
    ce = sum(l_ * np.exp(-1j * p) for l_, p in zip(ls, ph)) / 4
    noise = float(np.mean(np.abs(ls[0] * np.exp(-1j * ph[0]) - ce) ** 2))
    eq = np.stack(
        [
            np.asarray(grid[l, k0 : k0 + m_sc]) * rot[l] * np.conj(ce) / (np.abs(ce) ** 2 + noise)
            for l in DATA_SYMS_TM34
        ]
    )
    deprec = np.asarray(dft_predecode(jnp.asarray(eq)))
    mod = ul_mcs_to_mod(mcs_idx)
    qm = MOD_QM[mod]
    tbs = tbs_lookup(ul_mcs_to_itbs(mcs_idx), nof_prb)
    g = N_DATA_BUDGET_TM34 * m_sc * qm
    coding = TbCoding(tbs=tbs, g=g, qm=qm, rv=rv, nof_layers=1)
    llr_tx = np.asarray(demod_soft(mod, jnp.asarray(deprec.reshape(-1))))
    llr = np.zeros(g, np.float32)
    llr[: len(llr_tx)] = llr_tx
    signs = gold_sequence_signs(pssch_cinit(n_x_id, sf_idx), g)
    llr = llr * signs
    idx = _interleaver_indices(g, qm, c_mux=N_DATA_BUDGET_TM34)
    deinter = np.zeros(g, np.float32)
    deinter[idx] = llr
    tb, ok = dlsch_decode(deinter, coding)[:2]
    return np.asarray(tb), bool(np.asarray(ok))
