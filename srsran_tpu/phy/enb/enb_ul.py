"""eNB uplink receive facade — PUSCH decode + PUCCH decode (+ PRACH via
`phch.prach.prach_detect`).

Re-design of `lib/src/phy/enb/enb_ul.c` (enb_ul.h:66-86): UL FFT + DMRS
channel estimation + per-UE channel decode.
"""

from __future__ import annotations

import numpy as np

from ..common import Cell
from ..chest.chest_ul import chest_ul
from ..ofdm import OfdmConfig, ofdm_rx_sf
from ..phch.pucch import (
    PucchConfig,
    pucch_format1_decode,
    pucch_format2_decode,
    pucch_prb,
)
from ..phch.pusch import UlGrant, pusch_decode


def enb_ul_fft(cell: Cell, samples: np.ndarray) -> np.ndarray:
    """(nrx, sf_len) → (nrx, nsymb, nre) with the -0.5 subcarrier shift."""
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    return np.asarray(ofdm_rx_sf(ofdm, samples))


def enb_ul_decode_pusch(
    cell: Cell, sf_idx: int, rx_grid: np.ndarray, grant: UlGrant,
    max_iterations: int = 5, softbuffers=None, uci=None, shortened: bool = False,
):
    """Returns (tb_bits, crc_ok, softbuffers, snr_db[, uci_out]).

    With `uci` (expected UCI sizes) a 5th element carries the decoded
    UCI dict; without it the legacy 4-tuple is returned."""
    ce, noise = chest_ul(rx_grid, cell, grant.prb_start, grant.nof_prb)
    noise_f = float(np.mean(np.asarray(noise)))
    out = pusch_decode(
        rx_grid, np.asarray(ce), noise_f, cell, sf_idx, grant, max_iterations,
        softbuffers, uci=uci, shortened=shortened,
    )
    tb, ok, sb = out[:3]
    uci_out = out[3] if len(out) > 3 else None
    sig = float(np.mean(np.abs(np.asarray(ce)) ** 2))
    snr_db = 10 * np.log10(sig / (noise_f + 1e-12))
    if uci is not None:
        return tb, ok, sb, snr_db, uci_out
    return tb, ok, sb, snr_db


def enb_ul_decode_pucch(
    cell: Cell, sf_idx: int, rx_grid: np.ndarray, cfg: PucchConfig,
    fmt: str, nof_bits: int, rnti: int = 0,
):
    """fmt: '1' | '2' | '3' (format 3 needs ``rnti`` for its scrambling;
    pass via cfg.n_pucch-keyed caller state or the keyword).  Returns
    (bits, metric)."""
    from ..phch.pucch import _f1_covers, pucch_f1_prb

    prb_local = np.zeros((cell.nsymb_per_sf, 12), np.complex64)
    for slot in range(2):
        ns = 2 * sf_idx + slot
        m = pucch_f1_prb(cfg.n_pucch, ns, cell.nof_prb, cfg.delta_shift,
                         covers=_f1_covers(cell))
        sl = slice(slot * cell.nsymb_per_slot, (slot + 1) * cell.nsymb_per_slot)
        prb_local[sl] = rx_grid[0, sl, m * 12 : (m + 1) * 12]
    if fmt == "1":
        return pucch_format1_decode(prb_local, cell, cfg, sf_idx, nof_bits)
    if fmt == "3":
        from ..phch.pucch import pucch_format3_decode

        return pucch_format3_decode(prb_local, cell, cfg, sf_idx,
                                    nof_bits, rnti=rnti)
    return pucch_format2_decode(prb_local, cell, cfg, sf_idx, nof_bits)
