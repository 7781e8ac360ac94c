"""E2E: full LTE stack on the windowed CONTROL plane (windowed_stack).

Attach + bidirectional IP through a stack whose every DSP step runs in
W-TTI device windows — no per-TTI host PHY at all.  The analog of
test_full_stack.py's attach-and-ping under the stretched-feedback
windowed contract (run_lte.sh behavior, window-batched)."""

import numpy as np
import pytest

from srsran_tpu.apps.windowed_stack import WindowedCtrlEnb, WindowedCtrlUe
from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
from srsran_tpu.phy.common import Cell
from srsran_tpu.stack import security as sec
from srsran_tpu.stack.nas_ue import Usim

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OPC = sec.compute_opc(KEY, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))
W = 12


@pytest.fixture(scope="module")
def stacks():
    cell = Cell(nof_prb=25, nof_ports=1, id=7)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00",
                                  sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = WindowedCtrlEnb(cell, mme, spgw, mcs=8, ctrl_window=W)
    ue = WindowedCtrlUe(cell, Usim(IMSI, KEY, OPC), ctrl_window=W)
    ul = None
    for _ in range(1800):
        dl = enb.run_tti(ul)
        ul = ue.run_tti(dl)
        if (ue.rrc_state == WindowedCtrlUe.RRC_ACTIVE
                and ue.nas.state == ue.nas.REGISTERED):
            break
    return enb, ue, spgw, ul


def test_windowed_attach(stacks):
    enb, ue, spgw, _ul = stacks
    assert ue.rrc_state == WindowedCtrlUe.RRC_ACTIVE
    assert ue.nas.state == ue.nas.REGISTERED
    assert ue.ue_ip is not None


def test_windowed_ip_both_ways(stacks):
    enb, ue, spgw, ul = stacks
    # DL: SGi → UE
    n0 = len(ue.ip_rx)
    for i in range(24):
        spgw.sgi_tx(ue.ue_ip, bytes([i]) * 200)
    # UL: UE → SGi
    spgw.sgi_rx.clear()
    for i in range(8):
        ue.send_ip_packet(bytes([0x45, i]) * 60)
    for _ in range(1200):
        dl = enb.run_tti(ul)
        ul = ue.run_tti(dl)
        if len(ue.ip_rx) - n0 >= 24 and len(spgw.sgi_rx) >= 8:
            break
    assert len(ue.ip_rx) - n0 >= 24, (len(ue.ip_rx) - n0, enb.stats,
                                      ue.stats)
    assert len(spgw.sgi_rx) >= 8, (len(spgw.sgi_rx), enb.stats, ue.stats)
    assert spgw.sgi_rx[0][1] == bytes([0x45, 0]) * 60


def test_windowed_device_loopback():
    """Device-resident link: attach + IP with baseband never leaving the
    device (the serving topology; host carries only payload bits,
    control readbacks and the PRACH side-channel)."""
    from srsran_tpu.apps.windowed_stack import WindowedDeviceLoopback

    cell = Cell(nof_prb=25, nof_ports=1, id=7)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00",
                                  sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = WindowedCtrlEnb(cell, mme, spgw, mcs=8, ctrl_window=W)
    ue = WindowedCtrlUe(cell, Usim(IMSI, KEY, OPC), ctrl_window=W)
    link = WindowedDeviceLoopback(enb, ue, snr_db=30.0)
    for _ in range(1800):
        link.step()
        if (ue.rrc_state == WindowedCtrlUe.RRC_ACTIVE
                and ue.nas.state == ue.nas.REGISTERED):
            break
    assert ue.nas.state == ue.nas.REGISTERED, (ue.rrc_state, enb.stats)
    spgw.sgi_rx.clear()
    for i in range(12):
        spgw.sgi_tx(ue.ue_ip, bytes([i]) * 200)
    for i in range(4):
        ue.send_ip_packet(bytes([0x46, i]) * 60)
    n0 = len(ue.ip_rx)
    for _ in range(900):
        link.step()
        if len(ue.ip_rx) - n0 >= 12 and len(spgw.sgi_rx) >= 4:
            break
    assert len(ue.ip_rx) - n0 >= 12, (len(ue.ip_rx) - n0, enb.stats)
    assert len(spgw.sgi_rx) >= 4, (len(spgw.sgi_rx), enb.stats, ue.stats)


def test_windowed_sync_harq_retx_under_fade():
    """Synchronous DL HARQ over the windowed contract: a mid-traffic
    fade forces CRC failures; retransmissions ride the pid's own TTI
    slots (pid = tti mod n_harq at BOTH ends), soft-combine across
    windows, and every packet is delivered exactly once."""
    from srsran_tpu.apps.windowed_stack import WindowedDeviceLoopback

    cell = Cell(nof_prb=25, nof_ports=1, id=7)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00",
                                  sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = WindowedCtrlEnb(cell, mme, spgw, mcs=10, ctrl_window=W)
    ue = WindowedCtrlUe(cell, Usim(IMSI, KEY, OPC), ctrl_window=W)
    link = WindowedDeviceLoopback(enb, ue, snr_db=30.0)
    for _ in range(1800):
        link.step()
        if (ue.rrc_state == WindowedCtrlUe.RRC_ACTIVE
                and ue.nas.state == ue.nas.REGISTERED):
            break
    assert ue.nas.state == ue.nas.REGISTERED
    pkts = [bytes([i]) * 180 for i in range(48)]
    clean = link._noise
    for k in range(2000):
        if k % 25 == 0 and k // 25 < len(pkts) // 4:
            for p in pkts[4 * (k // 25): 4 * (k // 25) + 4]:
                spgw.sgi_tx(ue.ue_ip, p)
        # deep fades across the traffic (the rlf.c-style burst
        # impairment, here on the device link)
        link._noise = np.float32(10 ** (-2.0 / 20.0)) \
            if (k // 30) % 4 == 1 and k < 500 else clean
        link.step()
        if len(ue.ip_rx) >= len(pkts) and k > 600:
            break
    assert enb.stats.get("dl_nack", 0) > 0, enb.stats  # fade really bit
    assert sorted(ue.ip_rx) == sorted(pkts), (
        len(ue.ip_rx), enb.stats.get("dl_nack"))


def test_windowed_harq_stats(stacks):
    enb, ue, _spgw, _ul = stacks
    # the attach alone exchanges ACKed DL TBs and CRC-passing PUSCH
    assert enb.stats.get("dl_ack", 0) >= 4
    assert enb.stats.get("ul_crc_ok", 0) >= 10
    assert ue.stats["dl_tbs_ok"] >= 5
    # and the windowed discipline held: no PHY work outside windows
    assert ue.stats["ctrl_windows"] > 10
