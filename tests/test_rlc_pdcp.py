"""RLC TM/UM/AM and PDCP entity tests (mirrors the reference's
lib/test/upper/rlc_test.cc / rlc_am_test.cc / pdcp_*_test.cc strategy:
loopback two entities, inject loss, check in-order lossless delivery)."""

import numpy as np

from srsran_tpu.stack.pdcp import PdcpConfig, PdcpEntity
from srsran_tpu.stack.rlc import AmConfig, RlcAm, RlcTm, RlcUm, UmConfig


def test_rlc_tm_passthrough():
    tm = RlcTm()
    tm.write_sdu(b"hello")
    assert tm.read_pdu(100) == b"hello"
    tm.write_pdu(b"world")
    assert tm.read_sdu() == b"world"


def test_rlc_um_single_sdu_roundtrip():
    tx, rx = RlcUm(), RlcUm()
    tx.write_sdu(b"abcdef")
    pdu = tx.read_pdu(100)
    rx.write_pdu(pdu)
    assert rx.read_sdu() == b"abcdef"


def test_rlc_um_segmentation():
    tx, rx = RlcUm(), RlcUm()
    sdu = bytes(range(200))
    tx.write_sdu(sdu)
    while tx.has_data():
        pdu = tx.read_pdu(50)
        assert pdu is not None
        rx.write_pdu(pdu)
    assert rx.read_sdu() == sdu


def test_rlc_um_concatenation():
    tx, rx = RlcUm(), RlcUm()
    sdus = [bytes([i]) * (10 + i) for i in range(5)]
    for s in sdus:
        tx.write_sdu(s)
    pdu = tx.read_pdu(200)
    rx.write_pdu(pdu)
    for s in sdus:
        assert rx.read_sdu() == s


def test_rlc_um_5bit_sn():
    cfg = UmConfig(sn_bits=5)
    tx, rx = RlcUm(cfg), RlcUm(cfg)
    for i in range(40):  # wraps the 32-SN space
        tx.write_sdu(bytes([i]) * 5)
        rx.write_pdu(tx.read_pdu(100))
    for i in range(40):
        assert rx.read_sdu() == bytes([i]) * 5


def test_rlc_am_lossless_with_drops():
    """AM delivers losslessly in order through 20% PDU loss (the
    rlc_stress_test.cc scenario, deterministic)."""
    rng = np.random.default_rng(5)
    tx, rx = RlcAm(AmConfig(poll_pdu=4)), RlcAm()
    sdus = [bytes(rng.integers(0, 256, rng.integers(10, 120)).astype(np.uint8)) for _ in range(50)]
    for s in sdus:
        tx.write_sdu(s)
    received = []
    for _ in range(2000):
        pdu = tx.read_pdu(80)
        if pdu is not None and rng.random() > 0.2:
            rx.write_pdu(pdu)
        status = rx.read_pdu(80)
        if status is not None and rng.random() > 0.2:
            tx.write_pdu(status)
        tx.tick()
        rx.tick()
        while (s := rx.read_sdu()) is not None:
            received.append(s)
        if len(received) == len(sdus):
            break
    assert received == sdus
    assert not tx.max_retx_hit


def test_rlc_am_poll_and_status():
    tx, rx = RlcAm(AmConfig(poll_pdu=1)), RlcAm()
    tx.write_sdu(b"x" * 20)
    pdu = tx.read_pdu(100)
    assert (pdu[0] >> 5) & 1 == 1  # poll set (last PDU in buffer)
    rx.write_pdu(pdu)
    status = rx.read_pdu(100)
    assert status is not None and (status[0] & 0x80) == 0  # control PDU
    tx.write_pdu(status)
    assert tx.vt_a == tx.vt_s  # acked
    assert not tx.tx_window


def test_pdcp_drb_roundtrip_ciphered():
    key = bytes(range(16))
    a = PdcpEntity(PdcpConfig(sn_bits=12, cipher_alg=2, direction_tx=1), k_enc=key)
    b = PdcpEntity(PdcpConfig(sn_bits=12, cipher_alg=2, direction_tx=0), k_enc=key)
    for i in range(10):
        sdu = bytes([i]) * 30
        pdu = a.write_sdu(sdu)
        assert pdu[2:] != sdu  # actually ciphered
        assert b.write_pdu(pdu) == sdu


def test_pdcp_srb_integrity():
    ki = bytes(range(16))
    a = PdcpEntity(PdcpConfig(is_srb=True, integrity_alg=2, direction_tx=1), k_int=ki)
    b = PdcpEntity(PdcpConfig(is_srb=True, integrity_alg=2, direction_tx=0), k_int=ki)
    pdu = a.write_sdu(b"rrc message")
    assert b.write_pdu(pdu) == b"rrc message"
    # tampered PDU fails integrity
    bad = bytearray(a.write_sdu(b"rrc message 2"))
    bad[3] ^= 0xFF
    assert b.write_pdu(bytes(bad)) is None
    assert b.integrity_failures == 1


def test_pdcp_sn_wraparound():
    a = PdcpEntity(PdcpConfig(sn_bits=7, cipher_alg=1, direction_tx=1), k_enc=bytes(16))
    b = PdcpEntity(PdcpConfig(sn_bits=7, cipher_alg=1, direction_tx=0), k_enc=bytes(16))
    for i in range(300):  # wraps 128-SN space twice
        sdu = i.to_bytes(2, "big") * 4
        assert b.write_pdu(a.write_sdu(sdu)) == sdu


def test_rlc_pdcp_stack():
    """PDCP over RLC AM: ciphered SDUs through segmentation."""
    key = bytes(range(16))
    ptx = PdcpEntity(PdcpConfig(cipher_alg=3, direction_tx=1), k_enc=key)
    prx = PdcpEntity(PdcpConfig(cipher_alg=3, direction_tx=0), k_enc=key)
    rtx, rrx = RlcAm(), RlcAm()
    sdus = [bytes([i]) * 150 for i in range(8)]
    for s in sdus:
        rtx.write_sdu(ptx.write_sdu(s))
    out = []
    for _ in range(200):
        pdu = rtx.read_pdu(60)
        if pdu is not None:
            rrx.write_pdu(pdu)
        st = rrx.read_pdu(60)
        if st is not None:
            rtx.write_pdu(st)
        while (r := rrx.read_sdu()) is not None:
            out.append(prx.write_pdu(r))
        if len(out) == len(sdus):
            break
    assert out == sdus


def test_rlc_am_resegmentation():
    """A NACKed PDU retransmits through grants SMALLER than the original
    PDU via RF=1 segments (TS 36.322 resegmentation)."""
    tx, rx = RlcAm(AmConfig(poll_pdu=1)), RlcAm()
    sdus = [bytes([i]) * 60 for i in range(3)]
    for s in sdus:
        tx.write_sdu(s)
    pdu = tx.read_pdu(300)  # one big PDU with all three SDUs
    assert pdu is not None and len(pdu) > 150
    # lost: NACK it via the poll->status path
    tx.write_pdu(rx.read_pdu(100) or b"")  # no status yet (nothing received)
    # force status through a dummy exchange: send a later small PDU
    tx.write_sdu(b"x" * 10)
    p2 = tx.read_pdu(50)
    rx.write_pdu(p2)  # rx sees SN 1, SN 0 missing
    status = rx.read_pdu(100)
    assert status is not None
    tx.write_pdu(status)  # NACK for SN 0
    # retransmit through 60-byte grants -> must resegment
    for _ in range(10):
        seg = tx.read_pdu(60)
        if seg is None:
            break
        assert len(seg) <= 60
        rx.write_pdu(seg)
    got = []
    while (s := rx.read_sdu()) is not None:
        got.append(s)
    assert got == sdus + [b"x" * 10]


def test_rlc_am_resegmentation_stress():
    rng = np.random.default_rng(9)
    tx, rx = RlcAm(AmConfig(poll_pdu=2)), RlcAm()
    sdus = [bytes(rng.integers(0, 256, rng.integers(20, 200)).astype(np.uint8)) for _ in range(30)]
    for s in sdus:
        tx.write_sdu(s)
    received = []
    for step in range(3000):
        grant = int(rng.integers(30, 120))
        pdu = tx.read_pdu(grant)
        if pdu is not None and rng.random() > 0.25:
            rx.write_pdu(pdu)
        status = rx.read_pdu(80)
        if status is not None and rng.random() > 0.25:
            tx.write_pdu(status)
        tx.tick()
        rx.tick()
        while (s := rx.read_sdu()) is not None:
            received.append(s)
        if len(received) == len(sdus):
            break
    assert received == sdus


def test_rlc_um_treordering_skips_lost_pdu():
    """UM: a lost PDU stalls delivery until t-Reordering expires, then the
    gap is skipped and later SDUs are delivered (TS 36.322 §5.1.2.2)."""
    cfg = UmConfig(t_reordering_ms=5)
    tx, rx = RlcUm(cfg), RlcUm(cfg)
    pdus = []
    for i in range(5):
        tx.write_sdu(bytes([i]) * 20)
        pdus.append(tx.read_pdu(100))
    for i, p in enumerate(pdus):
        if i != 1:  # lose SN 1
            rx.write_pdu(p)
    assert rx.read_sdu() == bytes([0]) * 20
    assert rx.read_sdu() is None  # stalled on the gap
    for _ in range(6):
        rx.tick()
    got = []
    while (s := rx.read_sdu()) is not None:
        got.append(s)
    assert got == [bytes([i]) * 20 for i in (2, 3, 4)]


def test_rlc_am_stress_drop_duplicate_reorder():
    """The full rlc_stress_test.cc fuzz profile: 15% drop + 15%
    duplication + random reordering through a 6-PDU shuffle buffer, both
    directions; AM still delivers losslessly in order."""
    rng = np.random.default_rng(11)
    tx, rx = RlcAm(AmConfig(poll_pdu=3)), RlcAm()
    sdus = [bytes(rng.integers(0, 256, rng.integers(5, 200)).astype(np.uint8)) for _ in range(60)]
    for s in sdus:
        tx.write_sdu(s)

    def channel(pdu, bag):
        """drop / duplicate / delay via a shuffle bag."""
        if pdu is None:
            return
        r = rng.random()
        if r < 0.15:
            return  # dropped
        bag.append(pdu)
        if r > 0.85:
            bag.append(pdu)  # duplicated

    fwd, back = [], []
    received = []
    for _ in range(4000):
        channel(tx.read_pdu(70), fwd)
        channel(rx.read_pdu(70), back)
        # deliver a random element (reordering)
        if fwd and rng.random() < 0.9:
            rx.write_pdu(fwd.pop(rng.integers(0, len(fwd))))
        if back and rng.random() < 0.9:
            tx.write_pdu(back.pop(rng.integers(0, len(back))))
        tx.tick()
        rx.tick()
        while (s := rx.read_sdu()) is not None:
            received.append(s)
        if len(received) == len(sdus):
            break
    assert received == sdus
