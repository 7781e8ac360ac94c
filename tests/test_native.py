import socket
import time

import numpy as np
import pytest

from srsran_tpu.native import SampleRing


def test_ring_write_read():
    r = SampleRing(4096)
    data = (np.arange(1000) + 1j * np.arange(1000)).astype(np.complex64)
    assert r.write(data) == 1000
    assert r.readable == 1000
    got = r.read(600)
    np.testing.assert_array_equal(got, data[:600])
    got2 = r.read(400)
    np.testing.assert_array_equal(got2, data[600:])
    assert r.readable == 0
    r.close()


def test_ring_wraparound_and_overflow():
    r = SampleRing(1024)
    a = np.ones(800, np.complex64)
    assert r.write(a) == 800
    r.read(700)
    b = (np.arange(1200) * 1j).astype(np.complex64)
    wrote = r.write(b)  # only 924 samples of space → rest dropped
    assert wrote == 924
    assert r.dropped == 1200 - 924
    got = r.read(1024)
    assert len(got) == 100 + 924
    np.testing.assert_array_equal(got[100:], b[:924])
    r.close()


def test_udp_pump():
    r = SampleRing(65536)
    port = 46999
    r.start_udp_pump(port)
    time.sleep(0.05)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    data = (np.arange(8192) + 1j).astype(np.complex64)
    raw = data.tobytes()
    for i in range(0, len(raw), 8192):
        sock.sendto(raw[i : i + 8192], ("127.0.0.1", port))
    got = r.read(8192, timeout_s=2.0)
    assert len(got) == 8192
    np.testing.assert_array_equal(got, data)
    sock.close()
    r.close()


def test_native_log_backend_roundtrip(tmp_path):
    from srsran_tpu.native import NativeLogBackend

    path = tmp_path / "native.log"
    b = NativeLogBackend(str(path))
    n = 5000
    for i in range(n):
        assert b.write(f"line {i}\n")
    b.flush()
    assert b.written == n and b.dropped == 0
    b.close()
    lines = path.read_text().splitlines()
    assert len(lines) == n and lines[0] == "line 0" and lines[-1] == f"line {n-1}"


def test_native_log_backend_drops_under_pressure(tmp_path):
    import time
    from srsran_tpu.native import NativeLogBackend

    b = NativeLogBackend(str(tmp_path / "tiny.log"), queue_capacity=4)
    sent = sum(b.write("x" * 512 + "\n") for _ in range(20000))
    b.flush()
    assert sent + b.dropped == 20000
    b.close()


def test_logger_routes_through_native_sink(tmp_path):
    from srsran_tpu.runtime import logger as L

    path = tmp_path / "routed.log"
    L.set_log_file(str(path))
    lg = L.get_logger("TEST8", "debug")
    lg.info("hello native", hexdata=b"\x01\x02")
    lg.error("boom")
    L.flush()
    for s in L._get_backend().sinks:
        s.flush()
    text = path.read_text()
    assert "hello native" in text and "boom" in text and "01 02" in text
