"""E2E data-plane smoke test — the in-memory analog of the reference's
`test/run_lte.sh` (eNB↔UE ping/iperf over the fake RF link)."""

import numpy as np
import pytest

from srsran_tpu.apps.enb import EnbApp
from srsran_tpu.apps.ue import UeApp
from srsran_tpu.phy.common import Cell
from srsran_tpu.stack.mac_pdu import LCID_DTCH, mac_pack, mac_unpack


def test_mac_pdu_roundtrip():
    for tb in (64, 200):
        for sdus in (
            [(3, b"hello world")],
            [(3, b"a" * 40), (4, b"b" * 17)],
            [(3, b"x" * 130)] if tb >= 200 else [(3, b"x")],
        ):
            pdu = mac_pack(sdus, tb)
            assert len(pdu) == tb
            got = mac_unpack(pdu)
            assert len(got) == len(sdus)
            for (l0, p0), (l1, p1) in zip(sdus, got):
                assert l0 == l1
                assert p1[: len(p0)] == p0  # last SDU may absorb padding 0s
                # non-last SDUs are exact
    # exact-fit (no padding)
    payload = b"z" * 62
    pdu = mac_pack([(3, payload)], 63)
    assert mac_unpack(pdu)[0][1] == payload


def test_e2e_ping_loop():
    """eNB → UE data: messages survive sync + decode + MAC demux intact."""
    cell = Cell(nof_prb=6, nof_ports=1, id=42)
    enb = EnbApp(cell, rnti=0x46, mcs=5, cfi=2)
    ue = UeApp(nof_prb=6, rnti=0x46, cfi=2)
    rng = np.random.default_rng(0)

    msgs = [bytes(rng.integers(0, 256, 30, dtype=np.uint8)) for _ in range(12)]
    for m in msgs[:6]:
        enb.write_sdu(m)

    h = np.complex64(0.9 * np.exp(0.5j))
    for tti in range(40):
        if tti == 20:
            for m in msgs[6:]:
                enb.write_sdu(m)
        samples = enb.run_tti() * h
        samples = samples + (
            rng.standard_normal(len(samples)) + 1j * rng.standard_normal(len(samples))
        ).astype(np.complex64) * 0.01
        ue.push_samples(samples)
        ue.process()

    got = []
    while True:
        s = ue.read_sdu()
        if s is None:
            break
        got.append(s)
    assert got == msgs, (len(got), len(msgs))
    m = ue.get_metrics()
    assert m["rx_tbs_ok"] == m["rx_tbs"] and m["rx_tbs_ok"] >= 2
    assert ue.cell is not None and ue.cell.id == 42
    assert enb.get_metrics()["tx_bytes"] == sum(len(x) for x in msgs)


def test_examples_pdsch_pair(tmp_path, capsys):
    """examples/pdsch_enodeb.py → cf32 file → examples/cell_search.py +
    examples/pdsch_ue.py decode everything (the lib/examples pair)."""
    import importlib.util
    import os
    import sys

    def load(name):
        path = os.path.join(os.path.dirname(__file__), "..", "examples", f"{name}.py")
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    out = str(tmp_path / "dl.cf32")
    enodeb = load("pdsch_enodeb")
    enodeb.main(["-o", out, "-p", "6", "-m", "4", "-n", "3", "-c", "2"])

    search = load("cell_search")
    assert search.main(["-i", out, "-p", "6"]) == 0
    cap = capsys.readouterr().out
    assert "PCI=2" in cap and "nof_prb=6" in cap

    ue = load("pdsch_ue")
    scope_dir = str(tmp_path)
    assert ue.main(["-i", out, "-p", "6", "--scope", scope_dir]) == 0
    cap = capsys.readouterr().out
    assert "transport blocks CRC-OK" in cap
    assert not cap.split("total: ")[1].startswith("0/")
    assert (tmp_path / "pdsch_const.png").exists()


def test_ttcn3_system_interface():
    """TTCN-3-analog harness: the UE stack with a fake PHY driven over
    JSON/TCP — attach signalling carried as MAC PDUs through the SYS port
    (srsue/test/ttcn3 role)."""
    import json
    import socket

    from srsran_tpu.apps.ttcn3 import SystemInterface
    from srsran_tpu.stack import rrc
    from srsran_tpu.apps.full_stack import LCID_SRB1
    from srsran_tpu.stack.mac import LCID_CCCH
    from srsran_tpu.stack.mac_pdu import mac_pack, mac_unpack

    srv = SystemInterface()
    srv.serve_background()
    sock = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
    f = sock.makefile("rwb")

    def rpc(**msg):
        f.write((json.dumps(msg) + "\n").encode())
        f.flush()
        return json.loads(f.readline())

    try:
        assert rpc(cmd="cell_cfg", pci=7, nof_prb=6)["event"] == "cell_ready"
        r = rpc(cmd="attach")
        assert r["event"] == "prach" and r["preamble"] == 17
        r = rpc(cmd="rar", rapid=17, temp_crnti=0x46)
        assert r["crnti"] == 0x46
        # pull Msg3: must contain an RRC ConnectionRequest on CCCH
        from srsran_tpu.stack.mac import LCID_CON_RES
        from srsran_tpu.stack.mac_pdu import DL_CE_SIZES, UL_CE_SIZES

        ul = bytes.fromhex(rpc(cmd="ul_pdu", size=64)["data"])
        sdus = dict(mac_unpack(ul, ce_sizes=UL_CE_SIZES))
        assert LCID_CCCH in sdus
        kind, fields = rrc.unpack_ul_ccch(sdus[LCID_CCCH])
        assert kind == "rrc_conn_request"
        # system simulator answers with contention-resolution CE + Setup
        dl = mac_pack(
            [(LCID_CON_RES, rrc.contention_resolution_id(sdus[LCID_CCCH])),
             (LCID_CCCH, rrc.pack_conn_setup())],
            128, ce_sizes=DL_CE_SIZES,
        )
        r = rpc(cmd="dl_pdu", data=dl.hex())
        assert r["rrc_state"] >= 3  # RRC_CONNECTED
        # the UE responds with SetupComplete (NAS attach request) on SRB1
        ul = bytes.fromhex(rpc(cmd="ul_pdu", size=128)["data"])
        sdus = dict(mac_unpack(ul, ce_sizes=UL_CE_SIZES))
        assert LCID_SRB1 in sdus
        st = rpc(cmd="status")
        assert st["rrc_state"] >= 3 and st["crnti"] == 0x46
    finally:
        sock.close()
        srv.close()
