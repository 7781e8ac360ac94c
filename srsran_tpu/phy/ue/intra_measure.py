"""Intra-frequency neighbour-cell search + measurement (re-design of
`srsue/src/phy/scell/intra_measure.cc` + `scell_recv.cc`).

The reference runs a dedicated thread correlating a captured window
against all PCIs; here one call batches the three PSS roots over the
capture, finds per-root peaks (excluding the serving cell's), resolves
each candidate's N_id_1 via SSS, and measures CRS-based RSRP/RSRQ at the
candidate's frame timing — the inputs RRC needs for `new_cell_meas`
(phy_meas_t{rsrp, rsrq, cfo, pci}).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..common import Cell
from ..chest.chest_dl import chest_dl
from ..ofdm import OfdmConfig, ofdm_rx_sf
from ..sync.pss import pss_correlate, pss_cfo_estimate, pss_freq_np
from ..sync.sss import sss_detect
from .ue_sync import apply_cfo


@dataclasses.dataclass
class CellMeas:
    """One neighbour measurement (ue_interfaces.h phy_meas_t)."""

    pci: int
    rsrp_dbfs: float
    rsrq_db: float
    cfo: float
    peak_offset: int
    psr: float


def measure_cells(
    samples: np.ndarray,
    nof_prb: int = 6,
    serving_pci: int | None = None,
    threshold: float = 6.0,
    max_cells: int = 4,
    min_sss_metric: float = 4.0,
    min_crs_snr_db: float = 3.0,
) -> list[CellMeas]:
    """Scan ≥ 6 ms of samples for neighbour cells; returns measurements
    sorted by RSRP (strongest first).

    A PSS peak alone is not a cell: strong co-channel signals produce
    cross-root peaks whose SSS resolves to an arbitrary N_id_1 and whose
    "CRS" RSRP is other-cell data energy.  Candidates must pass BOTH the
    SSS detection metric and a CRS-coherence SNR gate (a wrong PCI's CRS
    sequence decorrelates, so the LS residual ≈ full power) — the
    scell_recv.cc role of discarding weak/incoherent candidates.
    """
    cell0 = Cell(nof_prb=nof_prb, nof_ports=1, id=0)
    corr_all = np.abs(np.asarray(pss_correlate(samples, cell0.symbol_sz))) ** 2  # (3, n)
    avg = float(np.mean(corr_all))
    ofdm = OfdmConfig.from_cell(cell0, normalize=True)
    pss_pos = ofdm.symbol_starts()[cell0.nsymb_per_slot - 1]
    out: list[CellMeas] = []
    for n_id_2 in range(3):
        corr = corr_all[n_id_2].copy()
        for _ in range(max_cells):
            offset = int(np.argmax(corr))
            peak = float(corr[offset])
            psr = peak / (avg + 1e-12)
            if psr < threshold:
                break
            # null this peak's neighbourhood for the next iteration
            lo, hi = max(0, offset - 64), offset + 64
            corr[lo:hi] = 0.0
            sym = samples[offset : offset + cell0.symbol_sz]
            if len(sym) < cell0.symbol_sz:
                continue
            cfo = float(np.asarray(pss_cfo_estimate(sym, n_id_2, cell0.symbol_sz)))
            comp = apply_cfo(samples, cfo, cell0.symbol_sz)
            sf_start = offset - pss_pos
            if sf_start < 0 or sf_start + cell0.sf_len > len(comp):
                continue
            grid = np.asarray(ofdm_rx_sf(ofdm, comp[sf_start : sf_start + cell0.sf_len]))
            nre = cell0.nof_re_per_symbol
            k0 = nre // 2 - 31
            sss_re = grid[cell0.nsymb_per_slot - 2, k0 : k0 + 62]
            pss_re = grid[cell0.nsymb_per_slot - 1, k0 : k0 + 62]
            ce = pss_re * np.conj(pss_freq_np(n_id_2))
            nid1, sf_is_5, sss_metric = [np.asarray(v) for v in sss_detect(sss_re, n_id_2, ce=ce)]
            if float(sss_metric) < min_sss_metric:
                continue
            pci = 3 * int(nid1) + n_id_2
            if pci == serving_pci:
                continue
            # CRS-based RSRP/RSRQ at the detected timing (sf 0 or 5)
            cell = Cell(nof_prb=nof_prb, nof_ports=1, id=pci)
            sf_idx = 5 if bool(sf_is_5) else 0
            ch = chest_dl(grid[None], cell, sf_idx, nof_ports=1)
            rsrp = float(np.mean(np.asarray(ch["rsrp"])))
            noise = float(np.mean(np.asarray(ch["noise"])))
            if rsrp < noise * 10 ** (min_crs_snr_db / 10):
                continue  # CRS does not cohere at this PCI/timing
            rssi = float(np.mean(np.abs(grid) ** 2)) * 12 * nof_prb
            rsrq_db = 10.0 * np.log10(nof_prb * rsrp / (rssi + 1e-12) + 1e-12)
            out.append(
                CellMeas(
                    pci=pci,
                    rsrp_dbfs=10.0 * np.log10(rsrp + 1e-12),
                    rsrq_db=rsrq_db,
                    cfo=cfo,
                    peak_offset=offset,
                    psr=psr,
                )
            )
    # dedup by PCI keeping the strongest
    best: dict[int, CellMeas] = {}
    for m in out:
        if m.pci not in best or m.rsrp_dbfs > best[m.pci].rsrp_dbfs:
            best[m.pci] = m
    return sorted(best.values(), key=lambda m: -m.rsrp_dbfs)
