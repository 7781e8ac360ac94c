"""5G-NR scaffolding tests: NR MAC PDU codec, NR RLC UM/AM headers, and
the VNF/PNF split-PHY message protocol (the reference's NR scope — it
ships no NR PHY either, SURVEY Appendix C item 3)."""

import numpy as np

from srsran_tpu.stack.mac_nr import mac_nr_pack, mac_nr_unpack
from srsran_tpu.stack.rlc_nr import (
    SI_FIRST,
    SI_FULL,
    SI_LAST,
    RlcUmNr,
    am_pack,
    am_unpack,
    um_pack,
    um_unpack,
)
from srsran_tpu.stack import vnf


def test_mac_nr_roundtrip():
    subpdus = [(4, b"short sdu"), (5, b"x" * 300)]  # 8-bit and 16-bit L
    pdu = mac_nr_pack(subpdus, tb_size=400)
    assert len(pdu) == 400
    got = mac_nr_unpack(pdu)
    assert got == subpdus
    # UL with a CCCH subPDU (fixed 6 bytes, no L)
    ul = mac_nr_pack([(0, b"\x01\x02\x03\x04\x05\x06"), (4, b"data")])
    got_ul = mac_nr_unpack(ul, is_ul=True)
    assert got_ul[0] == (0, b"\x01\x02\x03\x04\x05\x06") and got_ul[1] == (4, b"data")


def test_rlc_um_nr_header_codec():
    for sn_bits in (6, 12):
        p = um_pack(SI_FIRST, 37, None, b"abc", sn_bits)
        si, sn, so, data = um_unpack(p, sn_bits)
        assert (si, sn, so, data) == (SI_FIRST, 37, None, b"abc")
        p = um_pack(SI_LAST, 37, 512, b"xyz", sn_bits)
        si, sn, so, data = um_unpack(p, sn_bits)
        assert (si, sn, so, data) == (SI_LAST, 37, 512, b"xyz")
    p = um_pack(SI_FULL, None, None, b"full")
    assert um_unpack(p)[3] == b"full"


def test_rlc_um_nr_segmentation_roundtrip():
    tx, rx = RlcUmNr(), RlcUmNr()
    sdus = [bytes([i]) * (20 + 40 * i) for i in range(5)]
    for s in sdus:
        tx.write_sdu(s)
    while tx.has_data():
        pdu = tx.read_pdu(50)
        assert pdu is not None and len(pdu) <= 50
        rx.write_pdu(pdu)
    got = []
    while (s := rx.read_sdu()) is not None:
        got.append(s)
    assert got == sdus


def test_rlc_am_nr_header_codec():
    for sn_bits in (12, 18):
        p = am_pack(SI_LAST, 1234, 77, b"seg", poll=True, sn_bits=sn_bits)
        si, sn, so, poll, data = am_unpack(p, sn_bits)
        assert (si, sn, so, poll, data) == (SI_LAST, 1234, 77, True, b"seg")


def test_vnf_pnf_slot_exchange():
    """The basic_vnf split-PHY loop: PNF slot indications drive VNF
    DL config + TX requests; UL data flows back."""
    pnf, v = vnf.Pnf(), vnf.Vnf()
    v.dl_source.append(b"dl mac pdu 0")
    v.dl_source.append(b"dl mac pdu 1")
    for _ in range(3):
        for resp in v.handle(pnf.slot_indication()):
            pnf.handle(resp)
    assert pnf.dl_pdus[0] == [(0, b"dl mac pdu 0")]
    assert pnf.dl_pdus[1] == [(0, b"dl mac pdu 1")]
    # UL direction
    for r in [pnf.ul_data(5, [b"ul pdu a", b"ul pdu b"])]:
        v.handle(r)
    assert list(v.rx_pdus) == [b"ul pdu a", b"ul pdu b"]


def test_nr_am_status_codec():
    from srsran_tpu.stack.rlc_nr import status_pack, status_unpack

    ack, nacks = status_unpack(status_pack(0x123))
    assert ack == 0x123 and nacks == []
    pdu = status_pack(100, [(7, None, None), (9, 10, 200), (12, None, None)])
    ack, nacks = status_unpack(pdu)
    assert ack == 100
    assert nacks == [(7, None, None), (9, 10, 200), (12, None, None)]


def test_nr_am_delivery_with_loss_and_retx():
    """Lossy link: dropped PDUs are NACKed via STATUS and retransmitted;
    everything is delivered in order."""
    import random

    from srsran_tpu.stack.rlc_nr import RlcAmNr

    rng = random.Random(3)
    a, b = RlcAmNr(poll_pdu=3), RlcAmNr(poll_pdu=3)
    sdus = [bytes([i]) * rng.randint(1, 400) for i in range(30)]
    for s in sdus:
        a.write_sdu(s)
    got = []
    for _ in range(400):
        pdu = a.read_pdu(120)
        if pdu is not None and not (rng.random() < 0.25 and (pdu[0] >> 7) == 1):
            b.write_pdu(pdu)  # data PDUs dropped 25% of the time
        back = b.read_pdu(120)  # status (B has no data of its own)
        if back is not None:
            a.write_pdu(back)
        while (s := b.read_sdu()) is not None:
            got.append(s)
        if len(got) == len(sdus):
            break
    assert got == sdus


def test_nr_am_segmentation_roundtrip():
    from srsran_tpu.stack.rlc_nr import RlcAmNr

    a, b = RlcAmNr(), RlcAmNr()
    payload = bytes(range(256)) * 8  # 2048 bytes through 100-byte PDUs
    a.write_sdu(payload)
    while a.has_data():
        pdu = a.read_pdu(100)
        if pdu is None:
            break
        b.write_pdu(pdu)
        if (st := b.read_pdu(100)) is not None and (st[0] >> 7) == 0:
            a.write_pdu(st)
    assert b.read_sdu() == payload


# ---------------------------------------------------------------- NR PDCP


def _nr_pair(**kw):
    from srsran_tpu.stack.pdcp_nr import PdcpEntityNr, PdcpNrConfig

    k_enc, k_int = bytes(range(16)), bytes(range(16, 32))
    tx = PdcpEntityNr(PdcpNrConfig(direction_tx=1, **kw), k_enc, k_int)  # gNB
    rx = PdcpEntityNr(PdcpNrConfig(direction_tx=0, **kw), k_enc, k_int)  # UE
    return tx, rx


def test_pdcp_nr_in_order_roundtrip():
    tx, rx = _nr_pair(cipher_alg=2, integrity_alg=2, is_srb=True)
    sdus = [bytes([i]) * (i + 3) for i in range(20)]
    got = []
    for s in sdus:
        got.extend(rx.write_pdu(tx.write_sdu(s)))
    assert got == sdus
    assert rx.integrity_failures == 0


def test_pdcp_nr_reordering_and_duplicates():
    tx, rx = _nr_pair(sn_bits=18, cipher_alg=3)
    pdus = [tx.write_sdu(bytes([i, i, i])) for i in range(6)]
    # deliver 0, then 3,2 (held), dup of 3, then 1 -> releases 1,2,3
    assert rx.write_pdu(pdus[0]) == [bytes([0, 0, 0])]
    assert rx.write_pdu(pdus[3]) == []
    assert rx.write_pdu(pdus[2]) == []
    assert rx.write_pdu(pdus[3]) == []  # duplicate dropped
    assert rx.dropped == 1
    out = rx.write_pdu(pdus[1])
    assert out == [bytes([1] * 3), bytes([2] * 3), bytes([3] * 3)]
    assert rx.write_pdu(pdus[4]) == [bytes([4] * 3)]


def test_pdcp_nr_t_reordering_flush():
    tx, rx = _nr_pair(t_reordering=10)
    pdus = [tx.write_sdu(bytes([i])) for i in range(4)]
    rx.write_pdu(pdus[0])
    assert rx.write_pdu(pdus[2]) == []  # gap at SN 1 -> timer starts
    assert rx.timer_left == 10
    assert rx.tick(9) == []
    flushed = rx.tick(1)  # expiry: deliver 2, skip the lost 1
    assert flushed == [bytes([2])]
    # late PDU 1 is now stale -> dropped
    assert rx.write_pdu(pdus[1]) == []
    assert rx.write_pdu(pdus[3]) == [bytes([3])]


def test_pdcp_nr_integrity_failure_drop():
    tx, rx = _nr_pair(cipher_alg=2, integrity_alg=2, is_srb=True)
    pdu = bytearray(tx.write_sdu(b"hello-nr"))
    pdu[-1] ^= 0xFF
    assert rx.write_pdu(bytes(pdu)) == []
    assert rx.integrity_failures == 1


def test_pdcp_nr_sn_wrap_hfn():
    from srsran_tpu.stack.pdcp_nr import PdcpEntityNr, PdcpNrConfig

    tx = PdcpEntityNr(PdcpNrConfig(sn_bits=12, direction_tx=1, cipher_alg=1, integrity_alg=1))
    rx = PdcpEntityNr(PdcpNrConfig(sn_bits=12, direction_tx=0, cipher_alg=1, integrity_alg=1))
    n = (1 << 12) + 50  # cross one SN wrap
    for i in range(n):
        sdu = i.to_bytes(4, "big")
        out = rx.write_pdu(tx.write_sdu(sdu))
        assert out == [sdu]
    assert rx.rx_deliv == n


# ------------------------------------------------------------ NR PDSCH DMRS


def test_dmrs_nr_symbol_tables():
    from srsran_tpu.phy.phch.dmrs_nr import DmrsPdschConfig, symbols_idx

    # TS 38.211 Table 7.4.1.1.2-3 (single), reference dmrs_pdsch.c:49-135
    assert symbols_idx(DmrsPdschConfig(duration=14, additional_pos=0)) == [2]
    assert symbols_idx(DmrsPdschConfig(duration=14, additional_pos=1)) == [2, 11]
    assert symbols_idx(DmrsPdschConfig(duration=14, additional_pos=2)) == [2, 7, 11]
    assert symbols_idx(DmrsPdschConfig(duration=14, additional_pos=3)) == [2, 5, 8, 11]
    assert symbols_idx(DmrsPdschConfig(duration=12, additional_pos=2)) == [2, 6, 9]
    assert symbols_idx(DmrsPdschConfig(duration=9, additional_pos=2)) == [2, 7]
    assert symbols_idx(DmrsPdschConfig(duration=14, additional_pos=1, typeA_pos=3)) == [3, 11]
    # Table 7.4.1.1.2-4 (double)
    assert symbols_idx(DmrsPdschConfig(duration=14, additional_pos=1, length=2)) == [2, 3, 10, 11]
    assert symbols_idx(DmrsPdschConfig(duration=12, additional_pos=1, length=2)) == [2, 3, 8, 9]
    assert symbols_idx(DmrsPdschConfig(duration=9, additional_pos=1, length=2)) == [2, 3]


def test_dmrs_nr_put_get_roundtrip():
    import numpy as np
    from srsran_tpu.phy.phch.dmrs_nr import DmrsPdschConfig, get_sf, put_sf, sc_idx

    for typ, density in ((1, 6), (2, 4)):
        cfg = DmrsPdschConfig(nof_prb=24, type=typ, additional_pos=2, n_id=77, n_scid=1)
        assert len(sc_idx(cfg)) == 24 * density
        grid = np.zeros((14, 24 * 12), np.complex64)
        put_sf(cfg, tti=3, grid=grid)
        # pilots are unit-power QPSK
        k = sc_idx(cfg)
        vals = grid[2, k]
        assert np.allclose(np.abs(vals), 1.0, atol=1e-5)
        # flat channel h -> LS estimates all equal h
        h = 0.8 - 0.6j
        ls = get_sf(cfg, tti=3, grid=grid * h)
        assert ls.shape == (3, 24 * density)
        assert np.allclose(ls, h, atol=1e-5)
        # different n_scid -> different sequence
        cfg2 = DmrsPdschConfig(nof_prb=24, type=typ, additional_pos=2, n_id=77, n_scid=0)
        grid2 = np.zeros_like(grid)
        put_sf(cfg2, tti=3, grid=grid2)
        assert not np.allclose(grid2[2, k], vals)
