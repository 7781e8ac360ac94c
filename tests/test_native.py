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
