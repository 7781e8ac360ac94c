"""CRS-based fine synchronization / cell validation (re-design of
`lib/src/phy/sync/refsignal_dl_sync.c`).

PSS/SSS find a cell; this object validates it and refines timing/CFO by
correlating the received baseband against the cell's OWN reference
signature: per-subframe time-domain replicas carrying the CRS (+ PSS/SSS
on subframes 0 and 5).  The reference uses it after a cell is detected on
an SCell frequency (`scell_recv` flow) to reject false PCIs — a wrong
PCI's CRS decorrelates, real cells track.

The replica set is 10 OFDM-modulated subframes (`refsignal_dl_sync.c:
srslte_refsignal_dl_sync_set_cell`); the find step is ONE batched FFT
correlation of the capture against the sf-0 replica
(`find_peak` :301-336), then per-subframe CRS dot products give
RSRP/RSSI/CFO and the false-alarm gates reproduce :448-470:
SSS true-vs-false strength ratio, RSRP spread, CFO spread, RSRP vs the
off-by-one "false" subframe.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..chest.refsignal_dl import crs_positions, crs_sequence_port, put_crs_np
from ..common import Cell
from ..ofdm import OfdmConfig, ofdm_tx_sf
from .pss import put_pss_grid
from .sss import put_sss_grid

# false-alarm thresholds (refsignal_dl_sync.c:37-45)
SSS_FALSE_RATIO_SEVERE = 2.0
SSS_FALSE_RATIO_MILD = 1.2
CFO_SPREAD_SEVERE_HZ = 1000.0
CFO_SPREAD_MILD_HZ = 100.0
RSRP_SPREAD_SEVERE_DB = 10.0
RSRP_SPREAD_MILD_DB = 5.0
RSRP_FALSE_SEVERE_DB = 2.0
RSRP_FALSE_MILD_DB = 5.0


@lru_cache(maxsize=16)
def _cell_sequences(cell: Cell) -> np.ndarray:
    """(10, sf_len) time-domain replicas: CRS (port 0) + PSS/SSS."""
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    out = np.zeros((10, cell.sf_len), np.complex64)
    sync_sym = cell.nsymb_per_slot - 1  # PSS symbol (FDD: slot 0/10 last)
    for sf in range(10):
        grid = np.zeros((1, cell.nsymb_per_sf, cell.nof_re_per_symbol),
                        np.complex64)
        put_crs_np(grid, cell, sf)
        if sf in (0, 5):
            put_pss_grid(grid[0], cell.id % 3, cell.nof_prb, sync_sym)
            put_sss_grid(grid[0], cell.id // 3, cell.id % 3, sf,
                         cell.nof_prb, sync_sym - 1)
        out[sf] = np.asarray(ofdm_tx_sf(ofdm, grid))[0]
    return out


@dataclasses.dataclass
class RefsignalSyncResult:
    found: bool
    false_alarm: bool
    peak_index: int       # sample index of the frame boundary (sf 0)
    rsrp_dbfs: float
    rssi_dbfs: float
    cfo_hz: float
    psr: float            # peak-to-rms of the correlation


def refsignal_dl_sync_run(samples: np.ndarray, cell: Cell,
                          threshold: float = 2.0) -> RefsignalSyncResult:
    """Find + validate `cell` in ≥ 1 frame of samples.

    Correlation and per-subframe measurements mirror
    `srslte_refsignal_dl_sync_run` :367-470; the frame replica
    correlation runs as one FFT convolution on device.
    """
    from ..ofdm import ofdm_rx_sf

    seqs = _cell_sequences(cell)
    sf_len = cell.sf_len
    n = len(samples)
    # --- stage 1: find the frame boundary with the sf-0 replica ---
    nfft = int(2 ** np.ceil(np.log2(n + sf_len)))
    x_f = jnp.fft.fft(jnp.asarray(samples), nfft)
    r_f = jnp.conj(jnp.fft.fft(jnp.asarray(seqs[0]), nfft))
    corr = np.asarray(jnp.abs(jnp.fft.ifft(x_f * r_f))[: n - sf_len + 1])
    peak = int(np.argmax(corr))
    rms = float(np.sqrt(np.mean(corr**2)))
    psr = float(corr[peak]) / max(rms, 1e-12)
    if psr < threshold:
        return RefsignalSyncResult(False, False, -1, float("nan"),
                                   float("nan"), float("nan"), psr)

    # --- stage 2: per-subframe CRS measurements over the capture ---
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    syms, freqs = crs_positions(cell, 0)
    rsrps, cfos, rssis = [], [], []
    sss_true = sss_false = rsrp_false = 0.0
    n_sync = 0
    for k, pos in enumerate(range(peak, n - sf_len + 1, sf_len)):
        sf_idx = k % 10
        grid = np.asarray(ofdm_rx_sf(ofdm, jnp.asarray(
            samples[pos : pos + sf_len][None])))[0]
        ref = np.conj(crs_sequence_port(cell, sf_idx, 0))
        ls = grid[syms[:, None], freqs] * ref  # (4, npil) channel at CRS
        rsrps.append(float(np.abs(np.mean(ls)) ** 2))
        rssis.append(float(np.mean(np.abs(grid) ** 2)))
        # CFO: phase between the slot's two CRS symbols, 4 symbols apart
        cps = cell.cp_lengths_slot()
        z = np.sum(ls[1] * np.conj(ls[0])) + np.sum(ls[3] * np.conj(ls[2]))
        dt = 4 * (cell.symbol_sz + cps[1]) / cell.srate
        cfos.append(float(np.angle(z)) / (2 * np.pi * dt))
        if sf_idx in (0, 5):
            # SSS strength vs the false hypothesis (the OTHER sync sf's
            # replica — a frame-offset false peak correlates with it)
            sync_sym = cell.nsymb_per_slot - 2
            st = sum(cps[i] + cell.symbol_sz
                     for i in range(sync_sym)) + cps[sync_sym]
            w = samples[pos + st : pos + st + cell.symbol_sz]
            r_true = seqs[sf_idx][st : st + cell.symbol_sz]
            r_false = seqs[(sf_idx + 5) % 10][st : st + cell.symbol_sz]
            sss_true += abs(np.vdot(r_true, w)) ** 2
            sss_false += abs(np.vdot(r_false, w)) ** 2
            # RSRP at the off-by-one subframe index ("false" CRS phase)
            ref_f = np.conj(crs_sequence_port(cell, (sf_idx + 1) % 10, 0))
            lsf = grid[syms[:, None], freqs] * ref_f
            rsrp_false += float(np.abs(np.mean(lsf)) ** 2)
            n_sync += 1

    rsrp = float(np.mean(rsrps))
    rsrp_db = 10 * np.log10(rsrp + 1e-20)
    spread_db = 10 * np.log10(max(rsrps) + 1e-20) - 10 * np.log10(
        min(rsrps) + 1e-20)
    cfo = float(np.mean(cfos))
    cfo_spread = max(cfos) - min(cfos)

    # --- stage 3: false-alarm gates (refsignal_dl_sync.c:448-470) ---
    false_count = 0
    false_alarm = False
    if n_sync:
        if sss_true < sss_false * SSS_FALSE_RATIO_SEVERE * 0.5:
            false_alarm = True
        elif sss_true < sss_false * SSS_FALSE_RATIO_MILD:
            false_count += 1
        rsrp_f_db = 10 * np.log10(rsrp_false / n_sync + 1e-20)
        if rsrp_db - rsrp_f_db < RSRP_FALSE_SEVERE_DB:
            false_alarm = True
        elif rsrp_db - rsrp_f_db < RSRP_FALSE_MILD_DB:
            false_count += 1
    if cfo_spread > CFO_SPREAD_SEVERE_HZ:
        false_alarm = True
    elif cfo_spread > CFO_SPREAD_MILD_HZ:
        false_count += 1
    if spread_db > RSRP_SPREAD_SEVERE_DB:
        false_alarm = True
    elif spread_db > RSRP_SPREAD_MILD_DB:
        false_count += 1
    if false_count >= 2:
        false_alarm = True

    return RefsignalSyncResult(
        not false_alarm, false_alarm, peak, rsrp_db,
        10 * np.log10(np.mean(rssis) + 1e-20), cfo, psr)
