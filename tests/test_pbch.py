import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.phch.pbch import (
    Mib,
    pbch_decode,
    pbch_encode_np,
    pbch_re_indices,
)


def test_mib_pack_unpack():
    for prb, sfn in ((6, 0), (50, 400), (100, 1020)):
        m = Mib(nof_prb=prb, phich_length=1, phich_resources=2, sfn=sfn)
        bits = m.pack()
        assert bits.shape == (24,)
        m2 = Mib.unpack(bits)
        assert m2.nof_prb == prb
        assert m2.phich_length == 1
        assert m2.phich_resources == 2
        assert m2.sfn == (sfn & ~3)


def test_pbch_re_count():
    for prb in (6, 50):
        for cid in (0, 1, 5):
            cell = Cell(nof_prb=prb, nof_ports=1, id=cid)
            idx = pbch_re_indices(cell)
            assert len(idx) == 240
            assert len(set(idx.tolist())) == 240


@pytest.mark.parametrize("nports", [1, 2, 4])
@pytest.mark.parametrize("frame_off", [0, 1, 3])
def test_pbch_roundtrip(nports, frame_off):
    cell = Cell(nof_prb=6, nof_ports=1, id=123)
    mib = Mib(nof_prb=50, phich_length=0, phich_resources=1, sfn=256)
    syms = pbch_encode_np(mib, cell, nports)
    assert syms.shape == (4, 240)
    rng = np.random.default_rng(frame_off)
    rx = syms[frame_off] + (
        rng.standard_normal(240) + 1j * rng.standard_normal(240)
    ).astype(np.complex64) * 0.05
    bits, nports_hat, off_hat, ok = pbch_decode(rx, cell)
    assert ok
    assert nports_hat == nports
    assert off_hat == frame_off
    m = Mib.unpack(bits)
    assert m.nof_prb == 50 and m.sfn == 256


def test_pbch_wrong_cell_fails():
    cell = Cell(nof_prb=6, nof_ports=1, id=123)
    other = Cell(nof_prb=6, nof_ports=1, id=124)
    syms = pbch_encode_np(Mib(), cell, 1)
    _, _, _, ok = pbch_decode(syms[0], other)
    assert not ok


def test_pbch_two_port_sfbc_end_to_end():
    """2-port SFBC PBCH: eNB renders with tx diversity; the UE's MIB search
    decodes via the Alamouti hypothesis and reports nof_ports=2."""
    import numpy as np
    from srsran_tpu.phy.common import Cell
    from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
    from srsran_tpu.phy.phch.pbch import Mib
    from srsran_tpu.phy.ue.ue_sync import mib_search

    cell = Cell(nof_prb=6, nof_ports=2, id=33)
    mib = Mib(nof_prb=6)
    _, samples = enb_dl_subframe(cell, 0, DlSched(cfi=1), mib=mib, sfn=0)
    # independent per-port channels, both received on one antenna
    rng = np.random.default_rng(0)
    h = (rng.standard_normal(2) + 1j * rng.standard_normal(2)).astype(np.complex64)
    rx = h[0] * samples[0] + h[1] * samples[1]
    rx = rx + (rng.standard_normal(len(rx)) + 1j * rng.standard_normal(len(rx))).astype(np.complex64) * 0.01
    res = mib_search(rx, Cell(nof_prb=6, nof_ports=1, id=33), sf0_start=0)
    assert res is not None
    mib_hat, nports, off = res
    assert nports == 2 and mib_hat.nof_prb == 6 and off == 0
