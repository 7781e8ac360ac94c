"""UE uplink transmit facade — PUSCH/PUCCH/PRACH generation with timing
advance and CFO pre-compensation.

Re-design of `lib/src/phy/ue/ue_ul.c` (srslte_ue_ul_encode) + the UE prach
scheduling (`srsue/src/phy/prach.cc`).
"""

from __future__ import annotations

import numpy as np

from ..common import Cell
from ..ofdm import OfdmConfig, ofdm_tx_sf
from ..phch.prach import PrachConfig, prach_generate_np
from ..phch.pucch import (
    PucchConfig,
    pucch_format1_encode_np,
    pucch_format2_encode_np,
    pucch_prb,
)
from ..phch.pusch import UlGrant, pusch_encode_np


def ue_ul_encode(
    cell: Cell,
    sf_idx: int,
    pusch: tuple[UlGrant, np.ndarray] | None = None,
    pucch1: tuple[PucchConfig, list] | None = None,
    pucch2: tuple[PucchConfig, np.ndarray] | None = None,
    ta_samples: int = 0,
    cfo: float = 0.0,
    uci=None,
    srs: tuple[int, int] | None = None,
    pucch3: tuple[PucchConfig, np.ndarray, int] | None = None,
) -> np.ndarray:
    """Render one UL subframe → (sf_len,) samples (half-subcarrier shifted).

    `ta_samples` advances the transmission (timing advance: positive =
    transmit earlier).  `srs` = (prb_start, nof_prb): sound the last
    SC-FDMA symbol; a PUSCH in the same subframe uses the shortened
    format (TS 36.211 §5.5.3.3).
    """
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    if pusch is not None:
        grant, tb = pusch
        grid += pusch_encode_np(cell, sf_idx, grant, tb, uci=uci,
                                shortened=srs is not None)
    if srs is not None:
        from ..chest.srs import put_srs_np

        put_srs_np(grid, cell, srs[0], srs[1])
    if pucch3 is not None:
        # CA HARQ-ACK multiplexing resource (pucch_proc.c format-3 path)
        from ..phch.pucch import pucch_format3_encode_np

        cfg3, bits3, rnti3 = pucch3
        prb3 = pucch_format3_encode_np(cell, cfg3, sf_idx, bits3, rnti3)
        from ..phch.pucch import _f1_covers, pucch_f1_prb

        for slot in range(2):
            ns = 2 * sf_idx + slot
            m = pucch_f1_prb(cfg3.n_pucch, ns, cell.nof_prb,
                             cfg3.delta_shift, covers=_f1_covers(cell))
            sl = slice(slot * cell.nsymb_per_slot,
                       (slot + 1) * cell.nsymb_per_slot)
            grid[sl, m * 12: (m + 1) * 12] += prb3[sl]
    for item, enc in ((pucch1, pucch_format1_encode_np), (pucch2, pucch_format2_encode_np)):
        if item is None:
            continue
        cfg, payload = item
        prb_local = enc(cell, cfg, sf_idx, payload)
        from ..phch.pucch import _f1_covers, pucch_f1_prb

        for slot in range(2):
            ns = 2 * sf_idx + slot
            m = pucch_f1_prb(cfg.n_pucch, ns, cell.nof_prb, cfg.delta_shift,
                             covers=_f1_covers(cell))
            sl = slice(slot * cell.nsymb_per_slot, (slot + 1) * cell.nsymb_per_slot)
            grid[sl, m * 12 : (m + 1) * 12] += prb_local[sl]
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=0.5)
    samples = np.asarray(ofdm_tx_sf(ofdm, grid))
    if cfo:
        n = np.arange(len(samples))
        samples = samples * np.exp(-2j * np.pi * cfo * n / cell.symbol_sz)
    if ta_samples:
        samples = np.roll(samples, -ta_samples)
    return samples.astype(np.complex64)


def ue_prach_send(cell: Cell, cfg: PrachConfig, preamble_idx: int, ta_samples: int = 0) -> np.ndarray:
    p = prach_generate_np(cell, cfg, preamble_idx)
    if ta_samples:
        p = np.roll(p, -ta_samples)
    return p
