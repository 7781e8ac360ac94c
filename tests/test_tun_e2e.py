"""Real kernel IP boundary: ping through the whole UE↔eNB↔EPC stack.

The reference's E2E test (`test/run_lte.sh:288-312`) isolates the UE's TUN
in a network namespace and pings through the stack; this is the same
procedure: the UE's address lives on a TUN inside a netns (gw.cc role),
the SPGW's SGi TUN sits in the default namespace (srsepc spgw/gtpu.cc
role), and a real `ping` crosses PDCP/RLC/MAC/PHY in both directions.

Skips cleanly where the environment forbids TUN or netns (unprivileged
CI).
"""

import os
import shutil
import subprocess
import time

import numpy as np
import pytest

from srsran_tpu.apps.full_stack import EnbStack, UeStack
from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
from srsran_tpu.io.tun import TunDevice
from srsran_tpu.phy.common import Cell
from srsran_tpu.stack import security as sec
from srsran_tpu.stack.nas_ue import Usim

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OPC = sec.compute_opc(KEY, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))
NS = "srstpu_test"


def _netns_ok() -> bool:
    if os.geteuid() != 0 or shutil.which("ip") is None:
        return False
    r = subprocess.run(["ip", "netns", "add", NS], capture_output=True)
    if r.returncode != 0:
        return False
    return True


def _cleanup_ns():
    subprocess.run(["ip", "netns", "del", NS], capture_output=True)


@pytest.mark.skipif(not TunDevice.available(), reason="no TUN in this environment")
def test_kernel_ping_through_stack():
    if not _netns_ok():
        pytest.skip("cannot create network namespaces")
    try:
        cell = Cell(nof_prb=15, nof_ports=1, id=7)
        hss = Hss()
        hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
        spgw = Spgw()
        mme = Mme(hss, spgw)
        enb = EnbStack(cell, mme, spgw, mcs=5)
        ue = UeStack(cell, Usim(IMSI, KEY, OPC))

        ul = None
        for _ in range(150):
            dl = enb.run_tti(ul)
            ul = ue.run_tti(dl)
            if ue.rrc_state == UeStack.RRC_ACTIVE and ue.nas.state == ue.nas.REGISTERED:
                break
        assert ue.nas.state == ue.nas.REGISTERED

        sgi = spgw.attach_tun(name="tun_sgi_t0")
        gw = ue.attach_tun(name="tun_ue_t0", netns=NS)
        gw.tun.add_route("default")  # everything in the ns goes via the RAN

        # real ping: UE namespace → SGi gateway address, through the stack
        # (the image ships no iputils; srsran_tpu.io.icmp_ping is the raw-
        # socket stand-in for run_lte.sh's ping)
        import srsran_tpu

        pkg_root = os.path.dirname(os.path.dirname(srsran_tpu.__file__))
        env = dict(os.environ, PYTHONPATH=pkg_root, JAX_PLATFORMS="cpu")
        ping = subprocess.Popen(
            ["ip", "netns", "exec", NS, "python", "-m",
             "srsran_tpu.io.icmp_ping", "172.16.0.254", "3", "30"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        deadline = time.time() + 60
        while ping.poll() is None and time.time() < deadline:
            dl = enb.run_tti(ul)
            ul = ue.run_tti(dl)
            spgw.pump_tun()
        out, _ = ping.communicate(timeout=10)
        assert ping.returncode == 0, f"kernel ping failed:\n{out}"
        assert " 0% packet loss" in out, out
    finally:
        if getattr(ue, "gw", None):
            ue.gw.close()
        if spgw.sgi_tun is not None:
            spgw.sgi_tun.close()
        _cleanup_ns()
