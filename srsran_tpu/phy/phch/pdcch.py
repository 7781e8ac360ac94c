"""PDCCH: DCI coding, CCE mapping, and batched blind search.

Re-design of `lib/src/phy/phch/pdcch.c`: DCI bits + CRC16 XOR RNTI → K=7
tail-biting conv code → rate match to 72·L bits (L CCEs) → QPSK → control
region.  Blind search (`srslte_pdcch_decode_msg` pdcch.c:380-429,
candidates per TS 36.213 §9.1.1) decodes every (candidate, L) hypothesis as
ONE batched Viterbi + vectorized CRC-RNTI check — no serial candidate loop
(the §A.6 "batch all candidates and mask" design).

CCE-to-RE mapping is the spec-true TS 36.211 §6.8.5 REG quadruplet
interleaver with cell-ID cyclic shift (see `regs.py`) — validated by
decoding the reference's captured I/Q test vectors.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import LTE_CRC16, Cell
from ..crc import crc_compute_np
from ..fec.conv import convcoder_encode_np, viterbi_decode
from ..fec.rate_match import conv_rate_match_rx, conv_rate_match_rx_np, conv_rate_match_tx
from ..modem import Mod, demod_soft, modulate, modulate_np
from ..sequence import gold_sequence, gold_sequence_signs

CCE_BITS = 72  # 1 CCE = 9 REG = 36 RE = 72 QPSK bits
AGG_LEVELS = (1, 2, 4, 8)
NOF_CANDIDATES_UE = {1: 6, 2: 6, 4: 2, 8: 2}
NOF_CANDIDATES_COMMON = {4: 4, 8: 2}


@lru_cache(maxsize=256)
def pdcch_re_indices(cell: Cell, sf_idx: int, cfi: int) -> np.ndarray:
    """Flat RE indices of the PDCCH in CCE/quadruplet transmit order —
    the TS 36.211 §6.8.5 REG interleaver + cell-ID cyclic shift (regs.py),
    excluding PCFICH/PHICH REGs. (sf_idx unused; kept for API stability.)"""
    from .regs import pdcch_re_indices_true

    return pdcch_re_indices_true(cell, cfi)


def nof_cce(cell: Cell, sf_idx: int, cfi: int) -> int:
    return len(pdcch_re_indices(cell, sf_idx, cfi)) // 36


def pdcch_cinit(rnti_unused: int, sf_idx: int, cell_id: int) -> int:
    """PDCCH scrambling c_init (TS 36.211 §6.8.2): sf<<9 + cell_id."""
    return (sf_idx << 9) + cell_id


def dci_encode_np(dci_bits: np.ndarray, rnti: int, agg_level: int) -> np.ndarray:
    """DCI payload → 72*L coded bits (before scrambling)."""
    crc = crc_compute_np(dci_bits.astype(np.uint8), LTE_CRC16)
    mask = np.array([(rnti >> (15 - i)) & 1 for i in range(16)], np.uint8)
    b = np.concatenate([dci_bits.astype(np.uint8), crc ^ mask])
    coded = convcoder_encode_np(b).astype(np.float32)
    return np.asarray(conv_rate_match_tx(coded, CCE_BITS * agg_level)).astype(np.uint8)


def search_space_candidates(rnti: int, sf_idx: int, n_cce: int, ue_specific=True):
    """CCE start indices per aggregation level (TS 36.213 §9.1.1 Yk hash).

    Returns dict {L: [cce_start, ...]} (dedup'd, within n_cce)."""
    out = {}
    if ue_specific:
        y = rnti
        for _ in range(sf_idx + 1):
            y = (39827 * y) % 65537
        table = NOF_CANDIDATES_UE
    else:
        y = 0
        table = NOF_CANDIDATES_COMMON
    for lvl, m_max in table.items():
        cands = []
        denom = n_cce // lvl
        if denom == 0:
            continue
        for m in range(m_max):
            start = lvl * ((y + m) % denom)
            if start + lvl <= n_cce and start not in cands:
                cands.append(start)
        out[lvl] = cands
    return out


def pdcch_put_np(
    grid: np.ndarray, cell: Cell, sf_idx: int, cfi: int,
    dci_bits: np.ndarray, rnti: int, agg_level: int, cce_start: int,
):
    """Encode + scramble + modulate one DCI into the (nsymb, nre) grid."""
    coded = dci_encode_np(dci_bits, rnti, agg_level)
    seq = gold_sequence(pdcch_cinit(rnti, sf_idx, cell.id), CCE_BITS * nof_cce(cell, sf_idx, cfi))
    off = cce_start * CCE_BITS
    scr = coded ^ seq[off : off + len(coded)]
    sym = modulate_np(Mod.QPSK, scr)
    idx = pdcch_re_indices(cell, sf_idx, cfi)
    re_sel = idx[cce_start * 36 : cce_start * 36 + len(sym)]
    if grid.ndim == 3 and grid.shape[0] >= 2:
        from ..mimo import precode_diversity2

        ports = np.asarray(precode_diversity2(sym.astype(np.complex64)))
        grid[0].reshape(-1)[re_sel] = ports[0]
        grid[1].reshape(-1)[re_sel] = ports[1]
    else:
        g = grid if grid.ndim == 3 else grid
        (g if g.ndim == 2 else g[0]).reshape(-1)[re_sel] = sym
    return grid


@lru_cache(maxsize=4096)
def _blind_candidates(rnti: int, sf_idx: int, n: int, ue_specific: bool):
    """UE-specific ∪ common search-space candidates, cached per
    (rnti, sf_idx, n) — the per-TTI control path calls blind search
    every subframe and the spec hash is pure (pdcch.c:243-254)."""
    cands = search_space_candidates(rnti, sf_idx, n, ue_specific)
    common = search_space_candidates(rnti, sf_idx, n, ue_specific=False)
    for lvl, starts in common.items():
        for st in starts:
            if st not in cands.setdefault(lvl, []):
                cands[lvl].append(st)
    return tuple((lvl, tuple(starts)) for lvl, starts in cands.items())


@lru_cache(maxsize=4096)
def _blind_signs(rnti: int, sf_idx: int, cell_id: int, nbits: int):
    return gold_sequence_signs(pdcch_cinit(rnti, sf_idx, cell_id), nbits)


def pdcch_blind_search(
    sym_eq, cell: Cell, sf_idx: int, cfi: int, rnti: int, dci_len: int,
    ue_specific: bool = True,
):
    """Blind-decode all candidates for `rnti`.

    sym_eq: (n_cce*36,) equalized control-region symbols (PDCCH order).
    Returns list of (dci_bits, agg_level, cce_start) that pass CRC-RNTI.
    """
    n = nof_cce(cell, sf_idx, cfi)
    # always includes the common search space (SI/P/RA-RNTI DCIs live
    # there; for C-RNTI the eNB may also use it — pdcch.c:243-254)
    cands = _blind_candidates(rnti, sf_idx, n, ue_specific)
    llr_all = np.asarray(demod_soft(Mod.QPSK, sym_eq))
    signs = _blind_signs(rnti, sf_idx, cell.id, CCE_BITS * n)
    llr_all = llr_all * signs[: len(llr_all)]
    d = dci_len + 16

    hyps = []  # (lvl, start, d_llr)
    for lvl, starts in cands:
        for st in starts:
            e = llr_all[st * CCE_BITS : (st + lvl) * CCE_BITS]
            hyps.append((lvl, st, conv_rate_match_rx_np(e, d)))
    if not hyps:
        return []
    batch = jnp.asarray(np.stack([h[2] for h in hyps]))
    bits = np.asarray(viterbi_decode(batch, d))  # (H, d)
    mask = np.array([(rnti >> (15 - i)) & 1 for i in range(16)], np.uint8)
    found = []
    for (lvl, st, _), b in zip(hyps, bits):
        crc_rx = b[dci_len:] ^ mask
        if np.array_equal(crc_rx, crc_compute_np(b[:dci_len], LTE_CRC16)):
            found.append((b[:dci_len], lvl, st))
    return found
