"""TM3/TM4 spatial multiplexing over the air through the UE facade.

The reference's 150 Mbps headline config (README.md:47): eNB renders a
full 2-port subframe with a DCI 2/2A on the PDCCH and a 2-codeword PDSCH;
the UE facade blind-searches the TM-dependent format set
(ue_dl.c:450-694), parses the grant, and decodes both codewords.
"""

import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.phch.dci import Dci1, Dci2
from srsran_tpu.phy.phch.pdsch import DlGrant2
from srsran_tpu.phy.phch.ra import dl_mcs_to_mod, dl_tbs
from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe

RNTI = 0x4B


def _mimo_channel(rng, tx, nrx=2, amp=0.02):
    """Random full-rank 2x2 flat channel + AWGN."""
    h = (rng.standard_normal((nrx, 2)) + 1j * rng.standard_normal((nrx, 2))
         ).astype(np.complex64) / np.sqrt(2)
    # keep it well conditioned so the MMSE separates streams
    u, s, vh = np.linalg.svd(h)
    s = np.maximum(s, 0.5 * s.max())
    h = (u * s) @ vh
    rx = np.einsum("rp,pt->rt", h, tx)
    rx += amp * (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape))
    return rx.astype(np.complex64)


@pytest.mark.parametrize("tm,fmt", [(3, "2a"), (4, "2")])
def test_tm34_over_the_air(tm, fmt):
    rng = np.random.default_rng(42 + tm)
    cell = Cell(nof_prb=25, nof_ports=2, id=123)
    sf_idx = 3
    mcs1, mcs2 = 10, 12
    prb = tuple(range(25))
    tbs1, tbs2 = dl_tbs(mcs1, 25), dl_tbs(mcs2, 25)
    scheme = "cdd" if tm == 3 else "spatialmux"
    pmi = 0 if tm == 3 else 1
    grant = DlGrant2(prb=prb, mod1=dl_mcs_to_mod(mcs1), tbs1=tbs1,
                     mod2=dl_mcs_to_mod(mcs2), tbs2=tbs2,
                     pmi=pmi, rnti=RNTI, tx_scheme=scheme)
    tb1 = rng.integers(0, 2, tbs1).astype(np.uint8)
    tb2 = rng.integers(0, 2, tbs2).astype(np.uint8)

    dci = Dci2(rbg_bitmap=Dci1.bitmap_for_prbs(prb, 25), mcs1=mcs1, mcs2=mcs2,
               harq_pid=1, fmt=fmt,
               precoding_info=(0 if tm == 3 else 0))  # pinfo 0 → codebook 1
    sched = DlSched(cfi=2)
    sched.dcis.append((dci.pack(25, nof_ports=2), RNTI, 4, 0))
    sched.grants.append((grant, (tb1, tb2)))
    _, tx = enb_dl_subframe(cell, sf_idx, sched)

    rx = _mimo_channel(rng, tx)
    res = ue_dl_decode_subframe(cell, rx, sf_idx, RNTI, nrx=2, known_cfi=2, tm=tm)
    assert res.dci_format == fmt, (res.dci_format, res.dcis)
    assert len(res.tbs) == 2
    (d1, ok1), (d2, ok2) = res.tbs
    assert ok1 and ok2
    np.testing.assert_array_equal(np.asarray(d1), tb1)
    np.testing.assert_array_equal(np.asarray(d2), tb2)


def test_tm12_format1_search():
    """TM1/2 searches format 1 (RA type 0 RBG bitmap) alongside 1A."""
    rng = np.random.default_rng(9)
    cell = Cell(nof_prb=25, nof_ports=1, id=77)
    sf_idx = 4
    mcs = 8
    # non-contiguous RBG allocation — only format 1 can express this
    prbs = tuple(list(range(0, 4)) + list(range(12, 16)) + list(range(20, 24)))
    from srsran_tpu.phy.phch.pdsch import DlGrant

    tbs = dl_tbs(mcs, len(prbs))
    grant = DlGrant(prb=prbs, mod=dl_mcs_to_mod(mcs), tbs=tbs, rnti=RNTI)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    d1 = Dci1(rbg_bitmap=Dci1.bitmap_for_prbs(prbs, 25), mcs=mcs, harq_pid=2)
    sched = DlSched(cfi=2)
    sched.dcis.append((d1.pack(25), RNTI, 4, 0))
    sched.grants.append((grant, tb))
    _, tx = enb_dl_subframe(cell, sf_idx, sched)
    rx = tx[:1] + 0.02 * (rng.standard_normal(tx[:1].shape)
                          + 1j * rng.standard_normal(tx[:1].shape)).astype(np.complex64)
    res = ue_dl_decode_subframe(cell, rx, sf_idx, RNTI, known_cfi=2, tm=1)
    assert res.dci_format == "1", res.dci_format
    tbh, ok = res.tbs[0]
    assert ok
    np.testing.assert_array_equal(np.asarray(tbh), tb)


def test_control_mrc_two_rx():
    """2 rx antennas: control channels MRC-combine both (weak-point fix);
    decode must survive a deep fade on antenna 0 alone."""
    rng = np.random.default_rng(5)
    cell = Cell(nof_prb=15, nof_ports=1, id=31)
    sf_idx = 2
    from srsran_tpu.phy.phch.dci import Dci1A
    from srsran_tpu.phy.phch.pdsch import DlGrant
    from srsran_tpu.phy.phch.ra import riv_encode

    tbs = dl_tbs(6, 15)
    grant = DlGrant(prb=tuple(range(15)), mod=dl_mcs_to_mod(6), tbs=tbs, rnti=RNTI)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    dci = Dci1A(riv=riv_encode(15, 0, 15), mcs=6, harq_pid=0)
    sched = DlSched(cfi=2)
    sched.dcis.append((dci.pack(15), RNTI, 4, 0))
    sched.grants.append((grant, tb))
    _, tx = enb_dl_subframe(cell, sf_idx, sched)
    # antenna 0 nearly dead, antenna 1 clean: rx-0-only equalization fails
    h = np.array([[0.05 + 0.05j], [1.0 + 0.0j]], np.complex64)
    rx = np.einsum("rp,pt->rt", h, tx[:1])
    rx += 0.03 * (rng.standard_normal(rx.shape)
                  + 1j * rng.standard_normal(rx.shape)).astype(np.complex64)
    res = ue_dl_decode_subframe(cell, rx.astype(np.complex64), sf_idx, RNTI,
                                nrx=2, known_cfi=2)
    assert res.tbs and res.tbs[0][1]
    np.testing.assert_array_equal(np.asarray(res.tbs[0][0]), tb)
