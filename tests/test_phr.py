"""Power-headroom reporting (proc_phr.cc / mac ue.cc:357 / sched_ue::ul_phr):
the UE's periodic + pathloss-change triggered PHR CE rides the UL MAC PDU;
the eNB feeds it to the scheduler, which shrinks UL grants for a
power-limited (negative-PHR) UE.
"""

import numpy as np

from srsran_tpu.apps.full_stack import EnbStack, UeStack
from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
from srsran_tpu.phy.common import Cell
from srsran_tpu.stack import security as sec
from srsran_tpu.stack.mac import Scheduler, phr_db, phr_index
from srsran_tpu.stack.nas_ue import Usim
from srsran_tpu.stack.rlc import RlcAm

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OPC = sec.compute_opc(KEY, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))


def test_phr_index_mapping():
    # TS 36.133 Table 9.1.8.4-1: index = PH + 23, clipped
    assert phr_index(-23) == 0 and phr_index(40) == 63
    assert phr_index(-30) == 0 and phr_index(50) == 63
    assert phr_db(phr_index(0)) == 0
    assert phr_db(phr_index(-5)) == -5
    assert phr_db(phr_index(17)) == 17


def test_scheduler_caps_power_limited_ue():
    sched = Scheduler(nof_prb=50, mcs_max=9)
    sched.ue_cfg(0x46)
    sched.bearer_ue_cfg(0x46, 3, RlcAm())
    sched.ul_bsr(0x46, 5000)
    full = sched.get_ul_sched(0)[0]
    assert full.nof_prb == 48  # band edges reserved

    sched.ul_bsr(0x46, 5000)
    sched.ul_phr(0x46, -6)  # 6 dB over budget → ~1/4 the bandwidth
    capped = sched.get_ul_sched(1)[0]
    assert capped.nof_prb == int(48 * 10 ** (-0.6))
    assert capped.nof_prb < full.nof_prb

    sched.ul_bsr(0x46, 5000)
    sched.ul_phr(0x46, 12)  # headroom to spare → no cap
    assert sched.get_ul_sched(2)[0].nof_prb == 48


def test_phr_over_the_air():
    """E2E: the PHR CE reaches the eNB scheduler during an attach and
    keeps arriving on the periodic timer."""
    cell = Cell(nof_prb=15, nof_ports=1, id=7)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = EnbStack(cell, mme, spgw, mcs=5)
    ue = UeStack(cell, Usim(IMSI, KEY, OPC))
    ue.phr_periodic_tti = 40

    ul = None

    def run(n, stop=None):
        nonlocal ul
        for _ in range(n):
            dl = enb.run_tti(ul)
            ul = ue.run_tti(dl)
            if stop and stop():
                return True
        return False

    run(150, lambda: ue.rrc_state == UeStack.RRC_ACTIVE and ue.nas.state == ue.nas.REGISTERED)
    assert ue.nas.state == ue.nas.REGISTERED

    # keep the UL busy so PUSCH grants carry the periodic reports
    for _ in range(3):
        ue.send_ip_packet(b"\x11" * 200)
        run(60)
    assert ue.stats.get("phr_sent", 0) >= 2, "periodic PHR must recur"
    assert enb.stats.get("phr_rx", 0) >= 2
    u = next(iter(enb.ues.values()))
    assert u.last_phr_db is not None
    # TPC converged near 0 gain → headroom near the +20 dB budget
    assert 10 <= u.last_phr_db <= 23
    assert enb.sched.ues[u.crnti].phr_db == u.last_phr_db
