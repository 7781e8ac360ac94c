"""Intra-eNB handover E2E over the PHY (rrc_mobility.cc role).

Two co-channel cells of one eNB.  The UE attaches on cell A while cell B
is off; then B powers up stronger than A.  The UE's intra-frequency
measurements (intra_measure) trigger the configured A3 report, the eNB
admits the UE at B (new C-RNTI + dedicated preamble, same S1/GTP
context), sends RRCConnectionReconfiguration with mobilityControlInfo,
and the UE executes: retune, contention-free RA, ReconfigurationComplete
on the target.  IP traffic must survive the move with no path switch.
"""

import numpy as np

from srsran_tpu.apps.full_stack import TwoCellEnb, EnbStack, UeStack
from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
from srsran_tpu.phy.common import Cell
from srsran_tpu.stack import security as sec
from srsran_tpu.stack.nas_ue import Usim

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OPC = sec.compute_opc(KEY, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))


def test_intra_enb_handover():
    cell_a = Cell(nof_prb=6, nof_ports=1, id=1)
    cell_b = Cell(nof_prb=6, nof_ports=1, id=2)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = TwoCellEnb(cell_a, cell_b, mme, spgw, mcs=5)
    ue = UeStack(cell_a, Usim(IMSI, KEY, OPC))

    gain_b = 0.0  # cell B off during attach
    ul = None
    served_by = lambda: 0 if ue.cell.id == cell_a.id else 1

    def step():
        nonlocal ul
        uls = [None, None]
        uls[served_by()] = ul
        dls = enb.run_tti(uls)
        dl = dls[0] + gain_b * dls[1]
        ul = ue.run_tti(dl)

    for _ in range(120):
        step()
        if ue.rrc_state == UeStack.RRC_ACTIVE and ue.nas.state == ue.nas.REGISTERED:
            break
    assert ue.nas.state == ue.nas.REGISTERED
    assert ue.meas_cfg is not None, "measConfig must arrive with the reconfiguration"
    crnti_a = ue.crnti

    # sanity traffic on cell A
    spgw.sgi_tx(ue.ue_ip, b"\xaa" * 40)
    for _ in range(20):
        step()
        if ue.ip_rx:
            break
    assert ue.ip_rx == [b"\xaa" * 40]
    ue.ip_rx.clear()

    # cell B appears 6 dB above A -> A3 (offset -10 dB) fires
    gain_b = 2.0
    for _ in range(400):
        step()
        if enb.stats["ho_completed"]:
            break
    assert ue.stats["meas_report"] >= 1, "A3 measurement report not sent"
    assert enb.stats["ho_started"] == 1
    assert enb.stats["ho_completed"] == 1
    assert ue.stats["ho"] == 1
    assert ue.cell.id == cell_b.id and ue.crnti != crnti_a
    assert ue.rrc_state == UeStack.RRC_ACTIVE
    # source context cleaned up, target owns the UE
    assert not enb.cells[0].ues
    assert any(u.crnti == ue.crnti for u in enb.cells[1].ues.values())
    # S1 context survived: MME never saw a release
    assert IMSI in mme.attached_imsis

    # user plane continues THROUGH CELL B with the same TEIDs (no path switch)
    spgw.sgi_tx(ue.ue_ip, b"\xbb" * 48)
    for _ in range(30):
        step()
        if ue.ip_rx:
            break
    assert ue.ip_rx == [b"\xbb" * 48]
    ue.send_ip_packet(b"\xcc" * 44)
    for _ in range(40):
        step()
        if spgw.sgi_rx:
            break
    assert spgw.sgi_rx and spgw.sgi_rx[-1][1] == b"\xcc" * 44


def test_s1_inter_enb_handover():
    """S1 (inter-eNB) handover through the MME (rrc_mobility.cc S1 path +
    36.413 §8.4): HandoverRequired → HandoverRequest/Ack → HandoverCommand
    with the target's RRC container → CF-RA at the target → HandoverNotify
    → S11 Modify Bearer path switch → source released by the MME."""
    cell_a = Cell(nof_prb=6, nof_ports=1, id=1)
    cell_b = Cell(nof_prb=6, nof_ports=1, id=2)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb_a = EnbStack(cell_a, mme, spgw, mcs=5, enb_id=0x19B)
    enb_b = EnbStack(cell_b, mme, spgw, mcs=5, crnti=0x70, enb_id=0x19C)
    import srsran_tpu.stack.rrc as rrc

    enb_a.meas_cfg = rrc.make_meas_config(a3_offset_db=-10.0)
    enb_a.s1_neighbors = {cell_b.id: enb_b.enb_id}
    enb_b.s1_neighbors = {cell_a.id: enb_a.enb_id}
    ue = UeStack(cell_a, Usim(IMSI, KEY, OPC))

    gain_b = 0.0
    ul = None

    def step():
        nonlocal ul
        ul_a = ul if ue.cell.id == cell_a.id else None
        ul_b = ul if ue.cell.id == cell_b.id else None
        dl_a = enb_a.run_tti(ul_a)
        dl_b = enb_b.run_tti(ul_b)
        ul = ue.run_tti(dl_a + gain_b * dl_b)

    for _ in range(120):
        step()
        if ue.rrc_state == UeStack.RRC_ACTIVE and ue.nas.state == ue.nas.REGISTERED:
            break
    assert ue.nas.state == ue.nas.REGISTERED
    mme_ue = next(iter(mme.ues.values()))
    assert mme_ue.serving_enb_id == enb_a.enb_id

    gain_b = 2.0
    for _ in range(400):
        step()
        if not enb_a.ues and any(u.rrc_state == EnbStack.RRC_ACTIVE for u in enb_b.ues.values()):
            break
    assert ue.stats["ho"] == 1
    assert ue.cell.id == cell_b.id
    assert ue.rrc_state == UeStack.RRC_ACTIVE
    assert not enb_a.ues, "source eNB must be released by the MME"
    assert any(u.rrc_state == EnbStack.RRC_ACTIVE for u in enb_b.ues.values())
    assert mme_ue.serving_enb_id == enb_b.enb_id
    assert IMSI in mme.attached_imsis

    # path switch done: DL now flows SPGW → eNB B → UE
    spgw.sgi_tx(ue.ue_ip, b"\xdd" * 52)
    for _ in range(30):
        step()
        if ue.ip_rx:
            break
    assert ue.ip_rx == [b"\xdd" * 52]
    ue.send_ip_packet(b"\xee" * 45)
    for _ in range(40):
        step()
        if spgw.sgi_rx:
            break
    assert spgw.sgi_rx and spgw.sgi_rx[-1][1] == b"\xee" * 45


def test_inter_frequency_handover():
    """Inter-frequency S1 handover with measurement gaps (rrc_meas.cc
    inter-freq path + scell_recv.cc): eNB A (EARFCN 3400) configures a
    second measObjectEUTRA at eNB B's carrier (EARFCN 2850) plus a gp0
    gap pattern; during each 6 ms gap the UE retunes, searches the other
    carrier blind (scell_recv role), and on A3 sends a report on measId 2.
    The S1 HO command carries the target carrierFreq; the UE retunes and
    completes CF-RA at B.  Traffic flows on the new carrier."""
    cell_a = Cell(nof_prb=6, nof_ports=1, id=1)
    cell_b = Cell(nof_prb=6, nof_ports=1, id=2)
    EARFCN_A, EARFCN_B = 3400, 2850
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb_a = EnbStack(cell_a, mme, spgw, mcs=5, enb_id=0x19B, earfcn=EARFCN_A)
    enb_b = EnbStack(cell_b, mme, spgw, mcs=5, crnti=0x70, enb_id=0x19C,
                     earfcn=EARFCN_B)
    import srsran_tpu.stack.rrc as rrc

    enb_a.meas_cfg = rrc.make_meas_config(
        carrier_arfcn=EARFCN_A, a3_offset_db=-10.0,
        inter_freq_arfcn=EARFCN_B, gap_pattern="gp0", gap_offset=7)
    enb_a.s1_neighbors = {cell_b.id: enb_b.enb_id}
    enb_b.s1_neighbors = {cell_a.id: enb_a.enb_id}
    ue = UeStack(cell_a, Usim(IMSI, KEY, OPC), earfcn=EARFCN_A)

    ul = None

    def step():
        nonlocal ul
        ul_a = ul if ue.earfcn == EARFCN_A else None
        ul_b = ul if ue.earfcn == EARFCN_B else None
        dl_a = enb_a.run_tti(ul_a)
        dl_b = enb_b.run_tti(ul_b)
        # the UE hears whichever carrier it is tuned to (gaps retune it)
        dl = dl_a if ue.tuned_earfcn() == EARFCN_A else dl_b
        ul = ue.run_tti(dl)

    for _ in range(150):
        step()
        if ue.rrc_state == UeStack.RRC_ACTIVE and ue.nas.state == ue.nas.REGISTERED:
            break
    assert ue.nas.state == ue.nas.REGISTERED
    assert ue.meas_cfg is not None
    assert rrc.meas_config_gap(ue.meas_cfg) == (40, 7)

    # B is a different carrier: the UE only ever sees it inside gaps
    for _ in range(500):
        step()
        if ue.stats["ho"] and not enb_a.ues:
            break
    assert ue.stats["meas_report"] >= 1, "inter-freq A3 report not sent"
    assert ue.stats["ho"] == 1
    assert ue.earfcn == EARFCN_B, "UE must retune to the target carrier"
    assert ue.cell.id == cell_b.id
    assert ue.rrc_state == UeStack.RRC_ACTIVE
    assert not enb_a.ues, "source eNB must be released by the MME"
    mme_ue = next(iter(mme.ues.values()))
    assert mme_ue.serving_enb_id == enb_b.enb_id

    # user plane on the new carrier
    spgw.sgi_tx(ue.ue_ip, b"\xab" * 40)
    for _ in range(40):
        step()
        if ue.ip_rx:
            break
    assert ue.ip_rx == [b"\xab" * 40]
    ue.send_ip_packet(b"\xcd" * 36)
    for _ in range(40):
        step()
        if spgw.sgi_rx:
            break
    assert spgw.sgi_rx and spgw.sgi_rx[-1][1] == b"\xcd" * 36
