"""UE synchronization: cell search + FIND/TRACK subframe alignment.

Re-design of `lib/src/phy/ue/ue_sync.c` (state machine at :734-914) and
`ue_cell_search.c`: the control flow (state, timing cursor, CFO loop) stays
on host — it is inherently sequential and cheap — while every signal kernel
(PSS correlation over all roots, SSS hypothesis matmul, CFO estimation,
OFDM) runs batched on device.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..agc import Agc
from ..common import Cell
from ..ofdm import OfdmConfig, ofdm_rx_sf
from ..phch.pbch import Mib, pbch_decode, pbch_re_indices
from ..chest.chest_dl import chest_dl
from ..sync.pss import pss_cfo_estimate, pss_find, pss_freq_np
from ..sync.sss import sss_detect


@dataclasses.dataclass
class CellSearchResult:
    cell_id: int
    n_id_2: int
    cfo: float  # in subcarrier units
    peak_offset: int  # sample index of the PSS symbol start
    sf_idx: int  # 0 or 5 (the SSS subframe)
    psr: float  # peak-to-average detection metric
    frame_type: str = "fdd"  # "fdd" | "tdd" (frame structure 1 or 2)


def apply_cfo(samples: np.ndarray, cfo: float, symbol_sz: int) -> np.ndarray:
    n = np.arange(len(samples))
    return (samples * np.exp(-2j * np.pi * cfo * n / symbol_sz)).astype(np.complex64)


def cell_search(
    samples: np.ndarray, nof_prb: int = 6, threshold: float = 6.0,
    frame_type: str | None = None,
) -> CellSearchResult | None:
    """Search ≥ 6 ms of samples for a cell (analog of
    `srslte_ue_cellsearch_scan`, all three N_id_2 in one batched correlate).

    ``frame_type``: "fdd", "tdd", or None to detect it — like the
    reference's dual-hypothesis trial (sync.c:746-763): FDD puts the SSS
    one symbol before the PSS; TDD (frame structure 2) puts the PSS on
    symbol 2 of sf 1/6 and the SSS on the last symbol of the preceding
    subframe.  The hypothesis with the stronger SSS metric wins.
    """
    cell0 = Cell(nof_prb=nof_prb, nof_ports=1, id=0)
    nid2, off, peak, avg = [np.asarray(v) for v in pss_find(samples, cell0.symbol_sz)]
    psr = float(peak / (avg + 1e-12))
    if psr < threshold:
        return None
    n_id_2 = int(nid2)
    offset = int(off)
    # CFO from the PSS symbol
    sym = samples[offset : offset + cell0.symbol_sz]
    if len(sym) < cell0.symbol_sz:
        return None
    cfo = float(np.asarray(pss_cfo_estimate(sym, n_id_2, cell0.symbol_sz)))
    corr = apply_cfo(samples, cfo, cell0.symbol_sz)
    ofdm = OfdmConfig.from_cell(cell0, normalize=True)
    nre = cell0.nof_re_per_symbol
    k0 = nre // 2 - 31
    pss_ref_conj = np.conj(pss_freq_np(n_id_2))

    trials = {"fdd": None, "tdd": None} if frame_type is None else {frame_type: None}
    results = []
    for ft in trials:
        if ft == "fdd":
            # PSS = last symbol of slot 0; SSS one symbol earlier, same sf
            sf_start = offset - ofdm.symbol_starts()[cell0.nsymb_per_slot - 1]
            if sf_start < 0 or sf_start + cell0.sf_len > len(corr):
                continue
            grid = np.asarray(ofdm_rx_sf(ofdm, corr[sf_start : sf_start + cell0.sf_len]))
            sss_re = grid[cell0.nsymb_per_slot - 2, k0 : k0 + 62]
            pss_re = grid[cell0.nsymb_per_slot - 1, k0 : k0 + 62]
        else:
            # PSS = symbol 2 of sf 1/6; SSS = last symbol of the sf before
            sf1_start = offset - ofdm.symbol_starts()[2]
            sss_sf_start = sf1_start - cell0.sf_len
            if sss_sf_start < 0 or sf1_start + cell0.sf_len > len(corr):
                continue
            grid1 = np.asarray(ofdm_rx_sf(ofdm, corr[sf1_start : sf1_start + cell0.sf_len]))
            grid0 = np.asarray(ofdm_rx_sf(ofdm, corr[sss_sf_start:sf1_start]))
            sss_re = grid0[-1, k0 : k0 + 62]
            pss_re = grid1[2, k0 : k0 + 62]
        ce = pss_re * pss_ref_conj
        nid1, sf_is_5, metric = [np.asarray(v) for v in sss_detect(sss_re, n_id_2, ce=ce)]
        results.append((float(metric), ft, int(nid1), bool(sf_is_5)))
    if not results:
        return None
    metric, ft, nid1, sf_is_5 = max(results)
    return CellSearchResult(
        cell_id=3 * nid1 + n_id_2,
        n_id_2=n_id_2,
        cfo=cfo,
        peak_offset=offset,
        sf_idx=5 if sf_is_5 else 0,
        psr=psr,
        frame_type=ft,
    )


def mib_search(samples: np.ndarray, cell: Cell, sf0_start: int, cfo: float = 0.0):
    """Decode the MIB from the subframe-0 samples (analog of ue_mib.c).

    Returns (Mib, nof_ports, sfn_offset) or None.
    """
    corr = apply_cfo(samples, cfo, cell.symbol_sz)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    sf = corr[sf0_start : sf0_start + cell.sf_len]
    if len(sf) < cell.sf_len:
        return None
    grid = np.asarray(ofdm_rx_sf(ofdm, sf))
    ch = chest_dl(grid[None], cell, 0, nof_ports=1)
    ce = np.asarray(ch["ce"])[0, 0].reshape(-1)
    noise = float(np.asarray(ch["noise"]).reshape(-1)[0])
    idx = pbch_re_indices(cell)
    flat = grid.reshape(-1)
    sym_eq = flat[idx] * np.conj(ce[idx]) / (np.abs(ce[idx]) ** 2 + noise)
    bits, nports, frame_off, ok = pbch_decode(sym_eq, cell)
    if not ok:
        # 2-port hypothesis: SFBC (Alamouti) predecode (pbch.c decodes
        # blindly over port counts; the CRC mask confirms the true one)
        from ..mimo import predecode_diversity2

        cell2 = dataclasses.replace(cell, nof_ports=2)
        ch2 = chest_dl(grid[None], cell2, 0, nof_ports=2)
        ce2 = np.asarray(ch2["ce"])[0].reshape(2, -1)[:, idx]  # (2, 240)
        y = flat[idx][None, :]  # (nrx=1, 240)
        x, _ = predecode_diversity2(y, ce2[None])  # (1, 240)
        bits, nports, frame_off, ok = pbch_decode(np.asarray(x)[0], cell)
        if not ok:
            return None
    return Mib.unpack(bits), nports, frame_off


class UeSync:
    """FIND → TRACK subframe-stream state machine (`ue_sync.c:734`).

    push() raw samples; pop aligned subframes with their subframe index.

    Tracking-loop depth mirrors `ue_sync.c:623-700` / `sync/sfo.c`:

    * **SFO / timing drift**: the PSS peak's timing error is EMA-filtered
      (`sfo_ema`) into a running sample-offset estimate; every
      ``sample_offset_correct_period`` frames the accumulated (integer)
      offset is consumed from the stream — long captures with clock drift
      stay locked instead of walking off the subframe grid.  The drift
      rate is exposed as ``sfo_hz`` (samples/s, the reference's sfo
      metric).
    * **CFO loop**: PSS-based CFO enters through a loop gain
      (``cfo_loop_bw``) with a dead zone (``cfo_tol``) and only once the
      PSS has been stable for ``PSS_STABLE_CNT`` consecutive occasions —
      the reference's `cfo_loop_bw_pss` + `cfo_pss_min` + stability
      hysteresis.
    * **Out-of-sync counting**: a single weak PSS no longer drops the
      track; ``OOS_LIMIT`` consecutive failures do (and are reported via
      ``in_sync`` — the `sync::out_of_sync()` chain the RRC N310 counter
      feeds on).
    * **AGC**: optional 3-state AGC (`agc.h:48-60`) applied at push().
    """

    FIND, TRACK = "FIND", "TRACK"
    PSS_STABLE_CNT = 2  # consecutive PSS finds before the CFO loop engages
    OOS_LIMIT = 4  # consecutive track failures before re-FIND

    def __init__(self, nof_prb: int = 6, cfo_ema: float = 0.3,
                 frame_type: str | None = None, sfo_ema: float = 0.2,
                 sample_offset_correct_period: int = 1,
                 cfo_loop_bw: float = 0.3, cfo_tol: float = 0.002,
                 agc: "Agc | None" = None):
        self.cell_prb = nof_prb
        self.state = self.FIND
        self.buf = np.zeros(0, np.complex64)
        self.cell: Cell | None = None
        self.cfo = 0.0
        self.cfo_ema = cfo_ema
        self.cfo_loop_bw = cfo_loop_bw
        self.cfo_tol = cfo_tol  # dead zone, subcarrier units (~30 Hz)
        self.sf_idx = 0
        self.consumed = 0  # absolute sample cursor
        self.frame_type = frame_type  # None = auto-detect in FIND
        self.agc = agc
        self._agc_gain = 1.0
        # timing/SFO tracking state
        self.sfo_ema = sfo_ema
        self.sample_offset_correct_period = sample_offset_correct_period
        self.mean_sample_offset = 0.0  # EMA of the PSS timing error
        self.sfo_samples_per_frame = 0.0  # drift estimate
        self._frames_since_correct = 0
        self._last_err = None
        # robustness counters
        self._oos_cnt = 0
        self._pss_stable = 0
        self.in_sync = False
        self._cell0 = Cell(nof_prb=nof_prb, nof_ports=1, id=0)
        self._ofdm = OfdmConfig.from_cell(self._cell0, normalize=True)

    @property
    def sfo_hz(self) -> float:
        """Estimated sample-clock drift in samples/s (100 frames/s)."""
        return self.sfo_samples_per_frame * 100.0

    def push(self, samples: np.ndarray):
        samples = samples.astype(np.complex64)
        if self.agc is not None:
            # closed loop: the AGC observes the post-gain signal it
            # controls (agc.h FSM; radio applies the gain in hardware)
            samples = samples * np.complex64(self._agc_gain)
            self._agc_gain = self.agc.process(samples)
        self.buf = np.concatenate([self.buf, samples])

    @property
    def _is_tdd(self) -> bool:
        return self.frame_type == "tdd"

    def _pss_sf_indices(self) -> tuple[int, int]:
        """Subframes that contain the PSS (FDD: 0/5, TDD: 1/6)."""
        return (1, 6) if self._is_tdd else (0, 5)

    def _pss_pos_in_sf(self) -> int:
        if self._is_tdd:
            return self._ofdm.symbol_starts()[2]
        return self._ofdm.symbol_starts()[self._cell0.nsymb_per_slot - 1]

    def pop_subframe(self):
        """Returns (sf_samples, sf_idx) or None if not enough data/sync."""
        sf_len = self._cell0.sf_len
        if self.state == self.FIND:
            if len(self.buf) < 7 * sf_len:
                return None
            res = cell_search(self.buf, self.cell_prb, frame_type=self.frame_type)
            if res is None:
                self.buf = self.buf[5 * sf_len :]
                return None
            self.cell = Cell(nof_prb=self.cell_prb, nof_ports=1, id=res.cell_id)
            self.cfo = res.cfo
            self.frame_type = res.frame_type
            # align to the start of the subframe containing the PSS
            sf_start = res.peak_offset - self._pss_pos_in_sf()
            self.buf = self.buf[sf_start:]
            # FDD: PSS is in the SSS subframe; TDD: one subframe after it
            self.sf_idx = (res.sf_idx + 1) % 10 if self._is_tdd else res.sf_idx
            self.state = self.TRACK
            self.in_sync = True
            self._oos_cnt = 0
            self._pss_stable = 0
            self.mean_sample_offset = 0.0
            self._last_err = None
        if len(self.buf) < sf_len:
            return None
        sf = apply_cfo(self.buf[:sf_len], self.cfo, self._cell0.symbol_sz)
        self.buf = self.buf[sf_len:]
        out_idx = self.sf_idx
        # track on subframes containing PSS
        if out_idx in self._pss_sf_indices():
            nid2, off, peak, avg = [np.asarray(v) for v in pss_find(sf, self._cell0.symbol_sz)]
            psr = float(peak / (avg + 1e-12))
            expected = self._pss_pos_in_sf()
            err = int(off) - expected
            if psr > 5.0 and abs(err) <= 16:
                self._oos_cnt = 0
                self._pss_stable += 1
                self.in_sync = True
                # SFO tracking (ue_sync.c:623-700 / sfo.c): EMA the timing
                # error; the drift rate is the error delta between PSS
                # occasions (5 ms apart → 2 per frame)
                self.mean_sample_offset += self.sfo_ema * (err - self.mean_sample_offset)
                if self._last_err is not None:
                    self.sfo_samples_per_frame += 0.1 * (
                        2.0 * (err - self._last_err) - self.sfo_samples_per_frame)
                self._last_err = err
                # CFO loop: gain + dead zone, engaged only after the PSS
                # has been stable (cfo_loop_bw_pss / cfo_pss_min analog)
                sym = sf[int(off) : int(off) + self._cell0.symbol_sz]
                if len(sym) == self._cell0.symbol_sz and self._pss_stable >= self.PSS_STABLE_CNT:
                    cfo_new = float(np.asarray(pss_cfo_estimate(sym, int(nid2), self._cell0.symbol_sz)))
                    if abs(cfo_new) > self.cfo_tol:
                        self.cfo += self.cfo_loop_bw * cfo_new
            else:
                self._pss_stable = 0
                self._last_err = None
                # out-of-sync COUNTING: only a run of failures drops the
                # track (a single fade must not)
                self._oos_cnt += 1
                self.in_sync = self._oos_cnt < self.OOS_LIMIT
                if not self.in_sync:
                    self.state = self.FIND
            # periodic sample-offset correction: consume the accumulated
            # integer offset from the stream (next_rf_sample_offset role)
            self._frames_since_correct += 1
            if self._frames_since_correct >= 2 * self.sample_offset_correct_period:
                self._frames_since_correct = 0
                shift = int(round(self.mean_sample_offset))
                if shift > 0:
                    self.buf = self.buf[shift:]
                    self.mean_sample_offset -= shift
                elif shift < 0:
                    self.buf = np.concatenate([sf[shift:], self.buf])
                    self.mean_sample_offset -= shift
        self.sf_idx = (self.sf_idx + 1) % 10
        return sf, out_idx
