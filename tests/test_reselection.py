"""Idle-mode intra-frequency cell reselection over the air (the
rrc_cell.cc ranking / TS 36.304 §5.2.4 role the reference's UE applies
while camped).

The UE attaches on cell A (acquiring SIB1/SIB2/SIB3 off the broadcast),
is released to ECM-IDLE by inactivity, then cell B ramps up well above
A.  The camped UE's frame-cadence measurements rank R_n > R_s + Qhyst,
it reselects: camps on B, re-acquires B's SI, and — when MT data
triggers the SPGW DDN → MME paging (fanned out to both cells) — answers
the page AT CELL B with a NAS Service Request, resuming the same IP
session through the new cell.
"""

import numpy as np

from srsran_tpu.apps.full_stack import TwoCellEnb, UeStack
from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
from srsran_tpu.phy.common import Cell
from srsran_tpu.stack import security as sec
from srsran_tpu.stack.nas_ue import Usim

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OPC = sec.compute_opc(KEY, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))


def test_idle_mode_cell_reselection_and_paging_resume():
    cell_a = Cell(nof_prb=15, nof_ports=1, id=1)
    cell_b = Cell(nof_prb=15, nof_ports=1, id=2)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    # SR mode so the UL goes quiet and the inactivity release fires
    enb = TwoCellEnb(cell_a, cell_b, mme, spgw, mcs=5, sr_enabled=True)
    for c in enb.cells:
        c.ul_inactivity_timeout = 30
    ue = UeStack(cell_a, Usim(IMSI, KEY, OPC), acquire_si=True, sr_enabled=True)

    gain_a, gain_b = 1.0, 0.0  # cell B off during attach
    ul = None
    served = lambda: 0 if ue.cell.id == cell_a.id else 1

    def run(n, stop=None):
        nonlocal ul
        for _ in range(n):
            uls = [None, None]
            uls[served()] = ul
            dls = enb.run_tti(uls)
            ul = ue.run_tti(gain_a * dls[0] + gain_b * dls[1])
            if stop and stop():
                return True
        return False

    # attach on A, with RA parameters and SIB3 taken from the broadcast SI
    assert run(250, lambda: ue.rrc_state == UeStack.RRC_ACTIVE
               and ue.nas.state == ue.nas.REGISTERED)
    assert ue.sib3_params is not None, "SIB3 must ride the SI broadcast"
    assert ue.sib3_params["q_hyst_db"] == 4
    ip0 = ue.ue_ip

    # inactivity → RRCConnectionRelease → camped on A
    assert run(150, lambda: ue.idle_camped)
    assert ue.cell.id == cell_a.id

    # B ramps up 12 dB above A: ranking exceeds Qhyst → reselection
    gain_a, gain_b = 0.25, 1.0
    assert run(300, lambda: ue.cell.id == cell_b.id)
    assert ue.stats.get("reselection") == 1
    assert ue.idle_camped, "reselection must not leave idle mode"
    assert ue.nas.state == ue.nas.REGISTERED  # NAS context untouched

    # the UE re-acquires B's SI (needed before any PRACH there)
    assert run(120, lambda: ue.sib1 is not None and ue.sib2 is not None)

    # MT data: DDN → paging on BOTH cells → service request AT CELL B
    spgw.sgi_tx(ip0, b"\xd5" * 80)
    assert run(400, lambda: bool(ue.ip_rx))
    assert ue.stats.get("paged", 0) >= 1
    assert ue.ip_rx == [b"\xd5" * 80]
    assert ue.ue_ip == ip0  # same session resumed through the new cell
    assert ue.rrc_state == UeStack.RRC_ACTIVE
    assert ue.cell.id == cell_b.id
    # the serving context now lives at cell B
    assert any(u.crnti == ue.crnti for u in enb.cells[1].ues.values())


def test_no_reselection_below_hysteresis():
    """A neighbour above serving but inside Qhyst must NOT win (the
    ranking hysteresis that prevents ping-pong)."""
    cell_a = Cell(nof_prb=15, nof_ports=1, id=1)
    cell_b = Cell(nof_prb=15, nof_ports=1, id=2)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = TwoCellEnb(cell_a, cell_b, mme, spgw, mcs=5, sr_enabled=True)
    for c in enb.cells:
        c.ul_inactivity_timeout = 30
    ue = UeStack(cell_a, Usim(IMSI, KEY, OPC), acquire_si=True, sr_enabled=True)

    gain_a, gain_b = 1.0, 0.0
    ul = None

    def run(n, stop=None):
        nonlocal ul
        for _ in range(n):
            dls = enb.run_tti([ul, None])
            ul = ue.run_tti(gain_a * dls[0] + gain_b * dls[1])
            if stop and stop():
                return True
        return False

    assert run(250, lambda: ue.rrc_state == UeStack.RRC_ACTIVE)
    assert run(150, lambda: ue.idle_camped)
    # B appears ~2.5 dB above A — under the 4 dB Qhyst
    gain_a, gain_b = 0.75, 1.0
    run(200)
    assert ue.cell.id == cell_a.id
    assert ue.stats.get("reselection", 0) == 0
