import io
import struct

import numpy as np
import pytest

from srsran_tpu.runtime import (
    AppConfig,
    CsvMetrics,
    Logger,
    MacPcap,
    MetricsHub,
    StdoutMetrics,
    load_config,
)


def test_config_ini_and_overrides(tmp_path):
    ini = tmp_path / "ue.conf"
    ini.write_text(
        """
[rf]
srate_hz = 15.36e6
device = udp

[phy]
nof_prb = 50
cell_id = 301

[pcap]
enable = true
"""
    )
    cfg = load_config(str(ini), overrides=["phy.cfi=3", "rnti=0x5A"])
    assert cfg.rf.srate_hz == 15.36e6
    assert cfg.rf.device == "udp"
    assert cfg.phy.nof_prb == 50 and cfg.phy.cell_id == 301
    assert cfg.phy.cfi == 3
    assert cfg.pcap.enable is True
    assert cfg.rnti == 0x5A


def test_config_defaults():
    cfg = load_config()
    assert cfg.phy.nof_prb == 6
    assert isinstance(cfg, AppConfig)


def test_logger_levels_and_hex():
    from srsran_tpu.runtime import logger as L

    log = Logger("test", level="info")
    sink = io.StringIO()
    log._b.sinks = [sink]
    log.debug("should not appear")
    log.info("hello", hexdata=b"\x01\x02\xff")
    log.error("bad thing")
    L.flush()
    out = sink.getvalue()
    assert "hello" in out and "01 02 ff" in out and "bad thing" in out
    assert "should not appear" not in out


def test_metrics_hub_and_csv(tmp_path):
    hub = MetricsHub()
    hub.add_producer(lambda: {"dl_mbps": 42.5, "bler": 0.01})
    out = io.StringIO()
    hub.add_listener(StdoutMetrics(out=out))
    csv_path = str(tmp_path / "m.csv")
    c = CsvMetrics(csv_path)
    hub.add_listener(c)
    m = hub.poll_once()
    m = hub.poll_once()
    assert m["dl_mbps"] == 42.5
    assert "dl_mbps" in out.getvalue()
    c.close()
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 3 and "dl_mbps" in lines[0]


def test_mac_pcap_format(tmp_path):
    p = str(tmp_path / "mac.pcap")
    with MacPcap(p, ue_id=1) as pc:
        pc.write_pdu(b"\x21\x08\x22" + b"\x00" * 10, rnti=0x46, sfn=100, sf_idx=3)
    data = open(p, "rb").read()
    magic, vmaj, vmin, _, _, snaplen, dlt = struct.unpack("<IHHiIII", data[:24])
    assert magic == 0xA1B2C3D4 and dlt == 147
    ts, tus, incl, orig = struct.unpack("<IIII", data[24:40])
    pkt = data[40 : 40 + incl]
    assert pkt[0] == 1  # FDD
    assert pkt[1] == 1  # downlink
    assert pkt[2] == 3  # C-RNTI
    assert pkt[3] == 0x02 and struct.unpack(">H", pkt[4:6])[0] == 0x46
    # frame/subframe tag
    idx = pkt.index(b"\x04", 6)
    fsf = struct.unpack(">H", pkt[idx + 1 : idx + 3])[0]
    assert fsf == (100 << 4) | 3
    assert pkt.endswith(b"\x01" + b"\x21\x08\x22" + b"\x00" * 10)


def test_checkpoint_resume_ue_sync(tmp_path):
    """SURVEY §5.4: stop a sync pipeline mid-stream, snapshot, restore into
    a fresh instance, and get bit-identical subframes vs an uninterrupted
    run (deterministic replay)."""
    import numpy as np
    from srsran_tpu.phy.common import Cell
    from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
    from srsran_tpu.phy.phch.pbch import Mib
    from srsran_tpu.phy.ue.ue_sync import UeSync
    from srsran_tpu.runtime.state import (
        load_state,
        restore_ue_sync,
        save_state,
        ue_sync_state,
    )

    cell = Cell(nof_prb=6, nof_ports=1, id=11)
    mib = Mib(nof_prb=6)
    stream = np.concatenate(
        [
            enb_dl_subframe(cell, t % 10, DlSched(cfi=1), mib=mib, sfn=t // 10)[1][0]
            for t in range(30)
        ]
    )

    # uninterrupted reference run
    ref = UeSync(nof_prb=6)
    ref.push(stream)
    ref_out = []
    while (o := ref.pop_subframe()) is not None:
        ref_out.append(o)

    # interrupted run: half the stream, checkpoint, restore, other half
    half = len(stream) // 2
    a = UeSync(nof_prb=6)
    a.push(stream[:half])
    out = []
    while (o := a.pop_subframe()) is not None:
        out.append(o)
    p = str(tmp_path / "sync_state.npz")
    save_state(p, {"sync": ue_sync_state(a)})
    b = restore_ue_sync(UeSync(nof_prb=6), load_state(p)["sync"])
    b.push(stream[half:])
    while (o := b.pop_subframe()) is not None:
        out.append(o)

    assert len(out) == len(ref_out)
    for (sa, ia), (sb, ib) in zip(out, ref_out):
        assert ia == ib
        np.testing.assert_array_equal(sa, sb)


def test_state_roundtrip_types(tmp_path):
    import numpy as np
    from srsran_tpu.runtime.state import load_state, save_state

    st = {
        "a": np.arange(5, dtype=np.float32),
        "nested": {"s": "hello", "n": 3, "f": 1.5, "flag": True, "lst": [1, 2]},
    }
    p = str(tmp_path / "st.npz")
    save_state(p, st)
    back = load_state(p)
    np.testing.assert_array_equal(back["a"], st["a"])
    assert back["nested"] == st["nested"]


def test_pcap_variants(tmp_path):
    import struct
    from srsran_tpu.runtime.pcap import NasPcap, RlcPcap, S1apPcap

    for cls, dlt, args in ((NasPcap, 148, ()), (S1apPcap, 150, ()), (RlcPcap, 149, ())):
        p = str(tmp_path / f"{cls.__name__}.pcap")
        w = cls(p) if not args else cls(p, *args)
        w.write_pdu(b"\x07\x41\x01")
        w.close()
        raw = open(p, "rb").read()
        magic, _, _, _, _, _, network = struct.unpack("<IHHiIII", raw[:24])
        assert magic == 0xA1B2C3D4 and network == dlt
        assert len(raw) > 24 + 16


def test_plots_render(tmp_path):
    """srsGUI-analog scopes render PNGs headlessly (constellation from a
    real equalized PDSCH, channel magnitude, PSD)."""
    import numpy as np

    from srsran_tpu.runtime.plots import LiveScope, plot_channel, plot_constellation, plot_psd

    rng = np.random.default_rng(0)
    qpsk = (rng.choice([-1, 1], 500) + 1j * rng.choice([-1, 1], 500)) / np.sqrt(2)
    sym = qpsk + (rng.standard_normal(500) + 1j * rng.standard_normal(500)) * 0.05
    p1 = plot_constellation(sym, str(tmp_path / "const.png"))
    ce = 1.0 + 0.3 * np.exp(-2j * np.pi * np.arange(600) * 5 / 1024)
    p2 = plot_channel(ce[None, :], str(tmp_path / "chan.png"))
    x = np.exp(2j * np.pi * 0.1 * np.arange(8192)).astype(np.complex64)
    p3 = plot_psd(x, 1.92e6, str(tmp_path / "psd.png"))
    for p in (p1, p2, p3):
        data = open(p, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 2000

    scope = LiveScope(str(tmp_path / "live.png"), period_s=0.0)
    assert scope.update(sym)
    scope.period_s = 100.0
    assert not scope.update(sym)  # rate-limited
    assert scope.frames == 1


def test_crash_handler_writes_backtrace(tmp_path):
    """Unhandled exceptions append a timestamped backtrace to the crash
    file (crash_handler.c contract), checked in a subprocess."""
    import subprocess
    import sys

    crash = tmp_path / "bt.crash"
    code = (
        "from srsran_tpu.runtime import crash\n"
        f"crash.enable({str(crash)!r})\n"
        "raise RuntimeError('boom-for-test')\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert p.returncode != 0
    content = crash.read_text()
    assert "srsran_tpu crashed" in content
    assert "boom-for-test" in content and "RuntimeError" in content
