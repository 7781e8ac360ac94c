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
    """

    FIND, TRACK = "FIND", "TRACK"

    def __init__(self, nof_prb: int = 6, cfo_ema: float = 0.3, frame_type: str | None = None):
        self.cell_prb = nof_prb
        self.state = self.FIND
        self.buf = np.zeros(0, np.complex64)
        self.cell: Cell | None = None
        self.cfo = 0.0
        self.cfo_ema = cfo_ema
        self.sf_idx = 0
        self.consumed = 0  # absolute sample cursor
        self.frame_type = frame_type  # None = auto-detect in FIND
        self._cell0 = Cell(nof_prb=nof_prb, nof_ports=1, id=0)
        self._ofdm = OfdmConfig.from_cell(self._cell0, normalize=True)

    def push(self, samples: np.ndarray):
        self.buf = np.concatenate([self.buf, samples.astype(np.complex64)])

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
                # timing: shift the stream cursor by err at the next pop
                if err > 0:
                    self.buf = self.buf[err:]
                elif err < 0:
                    self.buf = np.concatenate([sf[err:], self.buf])
                sym = sf[int(off) : int(off) + self._cell0.symbol_sz]
                if len(sym) == self._cell0.symbol_sz:
                    cfo_new = float(np.asarray(pss_cfo_estimate(sym, int(nid2), self._cell0.symbol_sz)))
                    self.cfo += self.cfo_ema * cfo_new
            elif psr < 2.0:
                self.state = self.FIND  # out of sync → refind
        self.sf_idx = (self.sf_idx + 1) % 10
        return sf, out_idx
