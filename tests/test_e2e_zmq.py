"""End-to-end LTE attach over the ZMQ fake-RF WIRE (the `test/run_lte.sh`
role): UE and eNB stacks run in separate threads connected only by the
reference's REQ/REP sample protocol (`rf_zmq_imp.c`) — every subframe
crosses a real socket in the reference's byte format, both directions.
"""

import threading

import numpy as np
import pytest

from srsran_tpu.apps.full_stack import EnbStack, UeStack
from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
from srsran_tpu.io.rf_zmq import ZmqRfRx, ZmqRfTx
from srsran_tpu.phy.common import Cell
from srsran_tpu.stack import security as sec
from srsran_tpu.stack.nas_ue import Usim

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OPC = sec.compute_opc(KEY, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_attach_and_traffic_over_zmq_wire():
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    sf_len = cell.sf_len
    srate = int(cell.srate)
    dl_port, ul_port = _free_port(), _free_port()

    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = EnbStack(cell, mme, spgw, mcs=5)
    ue = UeStack(cell, Usim(IMSI, KEY, OPC))

    # eNB transmits DL on dl_port, receives UL from ul_port; UE mirrored
    # generous timeouts: the first few TTIs JIT-compile the PHY (seconds)
    T = 120000
    enb_tx = ZmqRfTx(f"tcp://*:{dl_port}", base_srate=srate, srate=srate, timeout_ms=T)
    enb_rx = ZmqRfRx(f"tcp://localhost:{ul_port}", base_srate=srate, srate=srate, timeout_ms=T)
    ue_tx = ZmqRfTx(f"tcp://*:{ul_port}", base_srate=srate, srate=srate, timeout_ms=T)
    ue_rx = ZmqRfRx(f"tcp://localhost:{dl_port}", base_srate=srate, srate=srate, timeout_ms=T)

    N = 160
    errors = []
    dl_done = threading.Event()

    def enb_loop():
        try:
            ul = None
            for _ in range(N):
                dl = enb.run_tti(ul)
                enb_tx.send(np.asarray(dl, np.complex64))
                ul, _ts = enb_rx.recv(sf_len)
        except Exception as e:  # surface in the main thread
            errors.append(e)
        finally:
            dl_done.set()

    def ue_loop():
        try:
            for _ in range(N):
                dl, _ts = ue_rx.recv(sf_len)
                ul = ue.run_tti(dl)
                if ul is None:
                    ul = np.zeros(sf_len, np.complex64)
                ue_tx.send(np.asarray(ul, np.complex64))
        except Exception as e:
            errors.append(e)

    te = threading.Thread(target=enb_loop)
    tu = threading.Thread(target=ue_loop)
    te.start()
    tu.start()

    # push one DL IP packet mid-run once attached
    for _ in range(600):
        if ue.nas.state == ue.nas.REGISTERED and ue.ue_ip:
            spgw.sgi_tx(ue.ue_ip, b"\x5a" * 40)
            break
        threading.Event().wait(0.05)
        if dl_done.is_set():
            break

    te.join(timeout=120)
    tu.join(timeout=120)
    assert not errors, errors
    assert ue.nas.state == ue.nas.REGISTERED, "attach over the wire failed"
    assert ue.rrc_state == UeStack.RRC_ACTIVE
    assert ue.ip_rx == [b"\x5a" * 40], "DL user-plane packet lost"

    for s in (enb_tx, enb_rx, ue_tx, ue_rx):
        s.close()
