"""MAC scheduler + HARQ + UE MAC tests (mirrors srsenb/test/mac/
scheduler_test_rand.cc's property style: random traffic, invariants)."""

import numpy as np

from srsran_tpu.stack.mac import (
    HARQ_RV_SEQ,
    DlHarqProc,
    Scheduler,
    UeMac,
    bsr_index,
    parse_ul_pdu,
)
from srsran_tpu.stack.rlc import RlcUm


def test_bsr_index_monotonic():
    vals = [bsr_index(n) for n in [0, 1, 10, 100, 1000, 10000, 150000, 200000]]
    assert vals[0] == 0 and vals[-1] == 63
    assert all(a <= b for a, b in zip(vals, vals[1:]))


def test_dl_harq_rv_cycle_and_ndi():
    h = DlHarqProc(0)
    h.new_tx(0, b"x", 100, 5, 50)
    ndi0 = h.ndi
    assert h.rv == 0
    h.ack(False)
    h.retx(8)
    assert h.rv == HARQ_RV_SEQ[1]
    h.ack(True)
    assert h.pdu is None
    h.new_tx(16, b"y", 100, 5, 50)
    assert h.ndi == ndi0 ^ 1


def test_scheduler_rr_fairness():
    sched = Scheduler(nof_prb=50)
    rlcs = {}
    for rnti in (0x46, 0x47, 0x48):
        r = RlcUm()
        for _ in range(50):
            r.write_sdu(b"z" * 100)
        sched.bearer_ue_cfg(rnti, 3, r)
        rlcs[rnti] = r
    served = {0x46: 0, 0x47: 0, 0x48: 0}
    for tti in range(60):
        for g in sched.get_dl_sched(tti):
            served[g.rnti] += 1
            sched.ack_info(g.rnti, g.harq_pid, True)
    counts = sorted(served.values())
    assert counts[0] > 0 and counts[-1] - counts[0] <= 2  # fair RR


def test_scheduler_harq_retx_priority():
    sched = Scheduler(nof_prb=25)
    r = RlcUm()
    r.write_sdu(b"a" * 50)
    r.write_sdu(b"b" * 50)
    sched.bearer_ue_cfg(0x50, 3, r)
    g1 = sched.get_dl_sched(0)[0]
    sched.ack_info(0x50, g1.harq_pid, False)  # NACK
    g2 = sched.get_dl_sched(8)[0]
    assert g2.harq_pid == g1.harq_pid and g2.rv == HARQ_RV_SEQ[1] and g2.ndi == g1.ndi
    assert g2.pdu == g1.pdu  # same TB retransmitted
    sched.ack_info(0x50, g2.harq_pid, True)
    r.write_sdu(b"c" * 50)  # fresh data for a new transmission
    g3 = sched.get_dl_sched(16)[0]
    assert g3.ndi == g1.ndi ^ 1  # new transmission toggles NDI


def test_ue_mac_harq_dedup():
    ue = UeMac(0x46)
    pdu = bytes([3]) + b"payload"  # lcid 3, last subheader
    out1 = ue.tb_decoded(0, ndi=1, pdu=pdu)
    out2 = ue.tb_decoded(0, ndi=1, pdu=pdu)  # retx, same ndi
    out3 = ue.tb_decoded(0, ndi=0, pdu=pdu)  # new tx
    assert len(out1) == 1 and out2 == [] and len(out3) == 1


def test_ue_mac_ra_fsm():
    ue = UeMac()
    ue.start_ra(preamble=17)
    assert not ue.handle_rar(preamble=3, ta=10, temp_crnti=0x100)
    assert ue.handle_rar(preamble=17, ta=10, temp_crnti=0x100)
    assert ue.crnti == 0x100 and ue.ta == 10
    assert ue.handle_contention_resolution(b"ident!", b"ident!")
    assert ue.ra_state == UeMac.RA_COMPLETED


def test_ul_mux_demux_with_bsr():
    ue = UeMac(0x46)
    ue.write_sdu(3, b"uplink data here")
    ue.write_sdu(3, b"more")
    pdu = ue.build_ul_pdu(100)
    bsr, sdus = parse_ul_pdu(pdu)
    assert [s for _, s in sdus] == [b"uplink data here", b"more"]


def test_scheduler_ul_grant_from_bsr():
    sched = Scheduler(nof_prb=25, mcs_max=9)
    sched.ue_cfg(0x46)
    sched.ul_bsr(0x46, 500)
    grants = sched.get_ul_sched(0)
    assert len(grants) == 1 and grants[0].rnti == 0x46
    assert grants[0].tbs_bits // 8 >= 100
