"""ZMQ fake-RF wire compatibility (`lib/src/phy/rf/rf_zmq_imp*.c`).

Codec tests assert the exact byte layouts the reference defines; the
loopback tests run a real REQ/REP pair through pyzmq — the same framing
an unmodified reference binary speaks — covering decimation gain,
leftover buffering, timestamps, and timed-TX zero-gap alignment.
"""

import threading

import numpy as np
import pytest

from srsran_tpu.io.rf_zmq import (
    ZMQ_BASERATE_DEFAULT_HZ,
    ZmqRf,
    ZmqRfRx,
    ZmqRfTx,
    decode_fc32,
    decode_sc16,
    encode_fc32,
    encode_sc16,
    parse_rf_args,
    sum_decimate,
    zoh_interpolate,
)


def test_fc32_byte_layout():
    # interleaved little-endian float32 I/Q — cf_t memory layout
    x = np.array([1.0 + 2.0j, -0.5 + 0.25j], np.complex64)
    b = encode_fc32(x)
    assert b == np.array([1.0, 2.0, -0.5, 0.25], "<f4").tobytes()
    np.testing.assert_array_equal(decode_fc32(b), x)


def test_sc16_byte_layout():
    # int16 I/Q at INT16_MAX scale (srslte_vec_convert_fi / _if)
    x = np.array([1.0 + 0.0j, -1.0 + 0.5j], np.complex64)
    b = encode_sc16(x)
    assert np.frombuffer(b, "<i2").tolist() == [32767, 0, -32767, 16384]
    got = decode_sc16(b)
    np.testing.assert_allclose(got, x, atol=1.0 / 32767)


def test_zoh_and_sum_decimation_roundtrip():
    # the reference interpolates with zero-order hold and decimates by
    # block SUM (no divide) — a loopback therefore scales by the factor
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(100) + 1j * rng.standard_normal(100)
         ).astype(np.complex64)
    for f in (1, 2, 4, 12):
        up = zoh_interpolate(x, f)
        assert len(up) == f * len(x)
        down = sum_decimate(up, f)
        np.testing.assert_allclose(down, f * x, rtol=1e-6)


def test_parse_rf_args_channel_indexing():
    opts = parse_rf_args(
        "tx_port=tcp://*:2000,rx_port=tcp://localhost:2001,"
        "rx_port1=tcp://localhost:2101,id=enb,base_srate=23040000")
    assert opts["tx_port"] == "tcp://*:2000"
    assert opts["rx_port1"] == "tcp://localhost:2101"
    assert opts["id"] == "enb"
    assert int(opts["base_srate"]) == 23040000


@pytest.fixture
def port_pair():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return f"tcp://*:{port}", f"tcp://localhost:{port}"


def test_loopback_req_rep_with_decimation(port_pair):
    bind, conn = port_pair
    base = 1920000 * 4
    tx = ZmqRfTx(bind, base_srate=base, srate=1920000)
    rx = ZmqRfRx(conn, base_srate=base, srate=1920000)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)
         ).astype(np.complex64)

    err = []

    def sender():
        try:
            tx.send(x)
        except Exception as e:  # surface in main thread
            err.append(e)

    t = threading.Thread(target=sender)
    t.start()
    got, ts = rx.recv(200)
    t.join()
    assert not err
    assert ts == 0
    # ZOH x4 then sum x4 → amplitude x4 (reference gain convention)
    np.testing.assert_allclose(got, 4 * x[:200], rtol=1e-5)
    # leftover 100 radio samples stay buffered; next recv needs no tx
    got2, ts2 = rx.recv(100)
    assert ts2 == 200 * 4
    np.testing.assert_allclose(got2, 4 * x[200:], rtol=1e-5)


def test_loopback_timed_tx_gap_alignment(port_pair):
    bind, conn = port_pair
    tx = ZmqRfTx(bind, base_srate=1000, srate=1000)
    rx = ZmqRfRx(conn, base_srate=1000, srate=1000)
    x = np.ones(50, np.complex64)

    def sender():
        tx.send(x, timestamp=80)  # 80 zero samples first (rf_zmq_tx_align)

    t = threading.Thread(target=sender)
    t.start()
    got, _ = rx.recv(130)
    t.join()
    np.testing.assert_array_equal(got[:80], np.zeros(80, np.complex64))
    np.testing.assert_allclose(got[80:], x)
    assert tx.nsamples == 130


def test_loopback_sc16_format(port_pair):
    bind, conn = port_pair
    tx = ZmqRfTx(bind, base_srate=1000, srate=1000, fmt="sc16")
    rx = ZmqRfRx(conn, base_srate=1000, srate=1000, fmt="sc16")
    rng = np.random.default_rng(2)
    # keep |I|,|Q| < 1: sc16 full scale clips at ±1 like the reference
    x = (0.9 * (rng.uniform(-1, 1, 64) + 1j * rng.uniform(-1, 1, 64))
         ).astype(np.complex64)
    t = threading.Thread(target=lambda: tx.send(x))
    t.start()
    got, _ = rx.recv(64)
    t.join()
    np.testing.assert_allclose(got, x, rtol=0, atol=2.0 / 32767)


def test_zmq_rf_facade(port_pair):
    bind, conn = port_pair
    rf_enb = ZmqRf(f"tx_port={bind},id=enb,base_srate=1920000")
    rf_ue = ZmqRf(f"rx_port={conn},id=ue,base_srate=1920000")
    rf_enb.set_srate(960000)
    rf_ue.set_srate(960000)
    assert rf_enb.tx[0].decim_factor == 2
    x = np.full(10, 1 + 1j, np.complex64)
    t = threading.Thread(target=lambda: rf_enb.tx[0].send(x))
    t.start()
    got, _ = rf_ue.rx[0].recv(10)
    t.join()
    np.testing.assert_allclose(got, 2 * x)
    rf_enb.close()
    rf_ue.close()


def test_zmq_radio_stack(port_pair):
    """radio.cc-on-rf_zmq stack: a timestamped Radio TX rides the wire
    protocol; the peer's Radio rx_now sees the aligned stream."""
    from srsran_tpu.io.rf_zmq import zmq_radio

    bind, conn = port_pair
    enb = zmq_radio(f"tx_port={bind},base_srate=1920000", srate_hz=1.92e6)
    ue = zmq_radio(f"rx_port={conn},base_srate=1920000", srate_hz=1.92e6)
    x = (np.arange(1920) % 7 / 7.0 + 0.5j).astype(np.complex64)

    def sender():
        enb.tx(x, timestamp=0.0)
        enb.tx(x, timestamp=0.001)  # contiguous burst

    t = threading.Thread(target=sender)
    t.start()
    got = ue.source.read(3840)
    t.join()
    np.testing.assert_allclose(got[:1920], x, atol=1e-6)
    np.testing.assert_allclose(got[1920:], x, atol=1e-6)
    enb.rf.close()
    ue.rf.close()
