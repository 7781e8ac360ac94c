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
