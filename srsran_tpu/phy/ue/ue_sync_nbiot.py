"""NB-IoT sample-level acquisition (re-design of
`lib/src/phy/ue/ue_sync_nbiot.c` + `ue_cell_search_nbiot.c` +
`lib/examples/cell_search_nbiot.c`).

The grid-level facade (`ue_nbiot.nbiot_ue_acquire`) assumes perfect
subframe timing; the reference acquires from RAW baseband: NPSS
time-domain correlation gives the subframe-5 timing, the NPSS's
repeated-symbol structure gives the CFO, and only then are OFDM grids
demodulated for NSSS / MIB-NB.  This module adds that raw front end —
NB-IoT anchor carrier at 1.92 Msps (128-pt FFT, one 180 kHz PRB; the
reference's SRSLTE_NBIOT_FFT_SIZE) — feeding the existing grid-level
chain, plus the EARFCN scan loop of `cell_search_nbiot.c`.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..sync.nbiot import NPSS_COVER, npss_freq_np

FFT = 128
SRATE = 1920000
SF_LEN = 1920
CP0, CP = 10, 9  # CP lengths at the 128-sample symbol (slot = 960)
SYM_STARTS = []  # per-subframe start of each symbol's useful part
_t = 0
for _l in range(14):
    _t += CP0 if _l % 7 == 0 else CP
    SYM_STARTS.append(_t)
    _t += FFT
assert _t == SF_LEN
NPSS_START = SYM_STARTS[3] - CP  # replica includes symbol 3's CP
NPSS_LEN = SF_LEN - NPSS_START


def _sc_map() -> np.ndarray:
    """FFT bins of the 12 anchor subcarriers (centered PRB)."""
    return np.arange(-6, 6) % FFT


def nbiot_modulate_np(grids: np.ndarray) -> np.ndarray:
    """(nsf, 14, 12) grids → (nsf*1920,) samples at 1.92 Msps."""
    nsf = grids.shape[0]
    out = np.zeros((nsf, SF_LEN), np.complex64)
    bins = _sc_map()
    for s in range(nsf):
        for l in range(14):
            f = np.zeros(FFT, np.complex64)
            f[bins] = grids[s, l]
            td = np.fft.ifft(f) * np.sqrt(FFT)
            cp = CP0 if l % 7 == 0 else CP
            st = SYM_STARTS[l]
            out[s, st - cp : st] = td[-cp:]
            out[s, st : st + FFT] = td
    return out.reshape(-1)


def nbiot_demodulate_np(samples: np.ndarray, offset: int = 0) -> np.ndarray:
    """Samples (aligned at a subframe boundary + `offset`) →
    (nsf, 14, 12) grids."""
    x = samples[offset:]
    nsf = len(x) // SF_LEN
    bins = _sc_map()
    out = np.zeros((nsf, 14, 12), np.complex64)
    for s in range(nsf):
        sf = x[s * SF_LEN : (s + 1) * SF_LEN]
        for l in range(14):
            st = SYM_STARTS[l]
            f = np.fft.fft(sf[st : st + FFT]) / np.sqrt(FFT)
            out[s, l] = f[bins]
    return out


@lru_cache(maxsize=1)
def npss_time_np() -> np.ndarray:
    """Time-domain NPSS replica: symbols 3..13 of subframe 5 with CPs
    (`npss.c` builds the same by OFDM-modulating the NPSS grid)."""
    grid = np.zeros((1, 14, 12), np.complex64)
    seq = npss_freq_np()
    for i in range(11):
        grid[0, 3 + i, :11] = seq[i]
    sf = nbiot_modulate_np(grid)
    return sf[NPSS_START:SF_LEN].astype(np.complex64)


def npss_find(samples: np.ndarray):
    """FFT cross-correlation against the NPSS replica, folded over the
    10 ms NPSS period (non-coherent frame averaging — the reference
    accumulates frames the same way before peak search).

    Returns (peak_pos, psr) — `peak_pos` is the first sample index where
    the replica aligns (subframe 5's symbol-3 CP start, modulo 10 ms),
    `psr` the peak-to-sidelobe ratio of the FOLDED metric
    (`npss.c srslte_npss_synch_find` + peak checking)."""
    rep = npss_time_np()
    n = len(samples)
    nfft = int(2 ** np.ceil(np.log2(n + len(rep))))
    x_f = jnp.fft.fft(jnp.asarray(samples), nfft)
    r_f = jnp.conj(jnp.fft.fft(jnp.asarray(rep), nfft))
    corr = np.asarray(jnp.abs(jnp.fft.ifft(x_f * r_f))[: n - len(rep) + 1])
    period = 10 * SF_LEN
    nper = len(corr) // period
    folded = (corr[: nper * period].reshape(nper, period).mean(axis=0)
              if nper >= 1 else corr)
    peak = int(np.argmax(folded))
    guard = FFT + CP
    mask = np.ones(len(folded), bool)
    lo = (peak - guard) % len(folded)
    hi = (peak + guard) % len(folded)
    if lo < hi:
        mask[lo:hi] = False
    else:
        mask[lo:] = False
        mask[:hi] = False
    side = float(folded[mask].max()) if mask.any() else 1e-12
    # absolute position: the strongest single occurrence of the folded
    # peak (a partially-captured first frame must not anchor the CFO
    # estimator on padding)
    cand = peak + period * np.arange(max(nper, 1))
    cand = cand[cand < len(corr)]
    abs_peak = int(cand[np.argmax(corr[cand])]) if len(cand) else peak
    return abs_peak, float(folded[peak]) / max(side, 1e-12)


def npss_cfo_estimate(samples: np.ndarray, peak: int) -> float:
    """CFO from the NPSS repeated-symbol structure: lag-137 products
    between consecutive NPSS symbols, signs compensated by the cover
    code.  Returns the CFO normalized to the 15 kHz subcarrier spacing
    (`ue_sync_nbiot.c` CFO tracking role)."""
    lag = FFT + CP
    z = 0.0 + 0.0j
    base = peak + CP  # start of symbol 3's useful part
    for i in range(10):
        a = samples[base + i * lag : base + i * lag + FFT]
        b = samples[base + (i + 1) * lag : base + (i + 1) * lag + FFT]
        if len(b) < FFT:
            break
        s = NPSS_COVER[i] * NPSS_COVER[i + 1]
        z += s * np.vdot(a, b)
    return float(np.angle(z) / (2.0 * np.pi * lag / FFT))


@dataclasses.dataclass
class NbiotSyncResult:
    cell: object          # ue_nbiot.NbiotCell
    timing: int           # sample index of the acquired frame's sf 0
    cfo: float            # normalized to 15 kHz
    psr: float
    grids: np.ndarray     # (nsf, 14, 12) CFO-corrected aligned grids


def nbiot_acquire_raw(samples: np.ndarray, min_psr: float = 3.0):
    """Full raw acquisition: NPSS timing → CFO correct → demodulate
    aligned grids → NSSS cell id / frame phase → MIB-NB
    (`ue_cell_search_nbiot.c` + `ue_mib_nbiot.c` flow from samples).

    Needs ≥ 21 ms of samples (two NPSS occasions + NSSS).  Returns
    NbiotSyncResult or None."""
    from .ue_nbiot import nbiot_ue_acquire

    if len(samples) < 21 * SF_LEN:
        return None
    peak, psr = npss_find(samples)
    if psr < min_psr:
        return None
    cfo = npss_cfo_estimate(samples, peak)
    n = np.arange(len(samples))
    corr = (samples * np.exp(-2j * np.pi * cfo * n / FFT)).astype(np.complex64)
    # NPSS replica aligns at subframe 5's symbol-3-CP; subframe 5 starts
    # NPSS_START earlier, frame start 5 subframes before that
    sf5 = peak - NPSS_START
    frame0 = sf5 - 5 * SF_LEN
    while frame0 < 0:
        frame0 += 10 * SF_LEN
    grids = nbiot_demodulate_np(corr, frame0)
    if grids.shape[0] < 10:
        return None
    cell = nbiot_ue_acquire(grids)
    if cell is None:
        return None
    return NbiotSyncResult(cell, frame0, cfo, psr, grids)


def nbiot_cell_search_scan(capture_by_earfcn: dict, min_psr: float = 3.0):
    """EARFCN scan (the `cell_search_nbiot.c` example loop): try raw
    acquisition on each carrier's capture; returns
    [(earfcn, NbiotSyncResult)] for every carrier with a cell."""
    found = []
    for earfcn, samples in capture_by_earfcn.items():
        res = nbiot_acquire_raw(np.asarray(samples), min_psr)
        if res is not None:
            found.append((earfcn, res))
    return found
