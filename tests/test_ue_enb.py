"""Integration: eNB subframe generation ↔ UE sync + decode — the in-memory
analog of the reference's enb_phy_test / ue_phy_test loopbacks."""

import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.phch.dci import Dci1A
from srsran_tpu.phy.phch.pbch import Mib
from srsran_tpu.phy.phch.pdcch import nof_cce, search_space_candidates
from srsran_tpu.phy.phch.pdsch import DlGrant
from srsran_tpu.phy.phch.ra import dl_mcs_to_mod, dl_tbs, riv_encode
from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe
from srsran_tpu.phy.ue.ue_sync import UeSync, cell_search, mib_search


def make_frame(cell, rnti, mcs, tb_payloads, sfn=0, cfi=2, seed=0):
    """10 subframes with PSS/SSS/PBCH/CRS + a PDSCH grant in each sf."""
    rng = np.random.default_rng(seed)
    sf_list = []
    tbs = []
    mib = Mib(nof_prb=cell.nof_prb)
    for sf_idx in range(10):
        l_crb = cell.nof_prb
        riv = riv_encode(cell.nof_prb, 0, l_crb)
        dci = Dci1A(riv=riv, mcs=mcs, harq_pid=0, ndi=1, rv=0)
        grant = DlGrant(
            prb=tuple(range(l_crb)), mod=dl_mcs_to_mod(mcs),
            tbs=dl_tbs(mcs, l_crb), rnti=rnti,
        )
        tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
        tbs.append(tb)
        n = nof_cce(cell, sf_idx, cfi)
        cands = search_space_candidates(rnti, sf_idx, n)
        agg = 4 if 4 in cands and cands[4] else max(cands)
        cce = cands[agg][0]
        sched = DlSched(
            cfi=cfi,
            dcis=[(dci.pack(cell.nof_prb), rnti, agg, cce)],
            grants=[(grant, tb)],
        )
        _, samples = enb_dl_subframe(cell, sf_idx, sched, mib=mib, sfn=sfn)
        sf_list.append(samples[0])
    return np.concatenate(sf_list), tbs


def test_cell_search_and_mib():
    cell = Cell(nof_prb=6, nof_ports=1, id=3 * 101 + 2)
    stream, _ = make_frame(cell, 0x46, 4, None, cfi=2)
    rng = np.random.default_rng(0)
    cfo_true = 0.12
    n = np.arange(len(stream))
    rx = stream * np.exp(2j * np.pi * cfo_true * n / cell.symbol_sz)
    rx = (rx + (rng.standard_normal(len(rx)) + 1j * rng.standard_normal(len(rx))) * 0.02).astype(np.complex64)
    res = cell_search(rx, 6)
    assert res is not None
    assert res.cell_id == cell.id
    assert abs(res.cfo - cfo_true) < 0.04
    # MIB from the found subframe-0
    from srsran_tpu.phy.ofdm import OfdmConfig

    ofdm = OfdmConfig.from_cell(cell)
    sf0_start = res.peak_offset - ofdm.symbol_starts()[6] + (cell.sf_len * 5 if res.sf_idx == 5 else 0)
    got = mib_search(rx, cell, sf0_start, res.cfo)
    assert got is not None
    mib, nports, frame_off = got
    assert mib.nof_prb == 6 and nports == 1


def test_ue_sync_track_stream():
    cell = Cell(nof_prb=6, nof_ports=1, id=17)
    stream, _ = make_frame(cell, 0x46, 2, None)
    stream = np.concatenate([np.zeros(1234, np.complex64), stream, stream])
    sync = UeSync(nof_prb=6)
    sync.push(stream)
    got = []
    while True:
        out = sync.pop_subframe()
        if out is None:
            break
        got.append(out[1])
    assert len(got) >= 10
    # subframe indices advance mod 10 consistently
    diffs = np.diff(got) % 10
    assert (diffs == 1).all()


def test_full_ue_decode_frame():
    """eNB renders a frame; UE blind-decodes every PDSCH TB via its DCIs."""
    cell = Cell(nof_prb=15, nof_ports=1, id=84)
    rnti, mcs = 0x5A, 9
    stream, tbs = make_frame(cell, rnti, mcs, None, cfi=2, seed=3)
    rng = np.random.default_rng(1)
    rx = (stream * np.complex64(0.9 * np.exp(0.3j))
          + (rng.standard_normal(len(stream)) + 1j * rng.standard_normal(len(stream))).astype(np.complex64) * 0.01)
    ok_count = 0
    for sf_idx in range(10):
        sf = rx[sf_idx * cell.sf_len : (sf_idx + 1) * cell.sf_len]
        res = ue_dl_decode_subframe(cell, sf[None], sf_idx, rnti)
        assert res.cfi == 2
        assert res.dcis, f"sf {sf_idx}: no DCI found"
        tb, ok = res.tbs[0]
        if ok and np.array_equal(tb, tbs[sf_idx]):
            ok_count += 1
    assert ok_count == 10


def test_intra_measure_two_cells():
    """Neighbour-cell search finds both cells in a two-cell superposition
    and ranks them by RSRP (intra_measure.cc / scell_recv.cc analog)."""
    import numpy as np
    from srsran_tpu.phy.common import Cell
    from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
    from srsran_tpu.phy.phch.pbch import Mib
    from srsran_tpu.phy.ue.intra_measure import measure_cells

    mib = Mib(nof_prb=6)

    def frames(pci, ttis=12):
        cell = Cell(nof_prb=6, nof_ports=1, id=pci)
        return np.concatenate(
            [enb_dl_subframe(cell, t % 10, DlSched(cfi=1), mib=mib, sfn=0)[1][0] for t in range(ttis)]
        )

    rng = np.random.default_rng(0)
    strong = frames(42)
    # weaker neighbour, offset in time by half a subframe
    weak = np.roll(frames(151), 960) * 0.4
    rx = strong + weak
    rx = rx + (rng.standard_normal(len(rx)) + 1j * rng.standard_normal(len(rx))).astype(np.complex64) * 0.005

    meas = measure_cells(rx, nof_prb=6, threshold=5.0)
    pcis = [m.pci for m in meas]
    assert 42 in pcis and 151 in pcis, pcis
    m42 = next(m for m in meas if m.pci == 42)
    m151 = next(m for m in meas if m.pci == 151)
    assert m42.rsrp_dbfs > m151.rsrp_dbfs
    # serving-cell exclusion
    meas2 = measure_cells(rx, nof_prb=6, serving_pci=42, threshold=5.0)
    assert all(m.pci != 42 for m in meas2)
