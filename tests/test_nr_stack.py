"""NR coreless scaffolding E2E: gNB stack <-> UE stack over the VNF/PNF
split protocol (gnb_stack_nr.cc / ue_stack_nr.cc / rrc_nr.cc role).

The full loop the reference scaffolds: MIB+SIB1 broadcast, RRCSetupRequest
on UL-CCCH, RRCSetup (DRB1 with [[cipheringDisabled]]), RRCSetupComplete on
SRB1 (NR RLC AM + PDCP), DL/UL InformationTransfer, bidirectional user
plane on the coreless DRB (NR RLC UM 6-bit SN + 18-bit-SN PDCP), RRCRelease.
"""

import os
import random

from srsran_tpu.apps.nr_stack import GnbStackNr, NrAirLink, UeStackNr


def _connect():
    gnb, ue = GnbStackNr(cell_id=7), UeStackNr()
    link = NrAirLink(gnb, ue)
    link.run(40)
    return gnb, ue, link


def test_nr_setup_and_sib_acquisition():
    gnb, ue, _ = _connect()
    assert ue.mib is not None and ue.mib["message"][1]["cell_barred"] == "not_barred"
    assert ue.sib1 is not None
    _, (_, sib1) = ue.sib1["message"]
    assert sib1["cell_access_related_info"]["plmn_id_list"][0]["cell_id"] == 7
    assert sib1["cell_sel_info"]["q_rx_lev_min"] == -70
    assert ue.connected and gnb.connected
    # the setup-complete's dedicated NAS reached the gNB
    assert gnb.rx_nas and gnb.rx_nas[0] == b"\x7e\x00\x41"


def test_nr_info_transfer_both_ways():
    gnb, ue, link = _connect()
    gnb.write_nas(b"\x7e\x02\xaa\xbb")
    ue.write_nas(b"\x7e\x03\xcc")
    link.run(20)
    assert b"\x7e\x02\xaa\xbb" in ue.rx_nas
    assert b"\x7e\x03\xcc" in gnb.rx_nas


def test_nr_drb_user_plane_bidirectional():
    gnb, ue, link = _connect()
    rng = random.Random(1)
    dl = [bytes([rng.randrange(256) for _ in range(n)]) for n in (40, 1200, 3000)]
    ul = [bytes([rng.randrange(256) for _ in range(n)]) for n in (60, 800)]
    for p in dl:
        gnb.write_drb(p)
    for p in ul:
        ue.write_drb(p)
    link.run(60)
    assert ue.rx_drb == dl  # segmented across TTIs by NR RLC UM, in order
    assert gnb.rx_drb == ul


def test_nr_drb_before_connection_is_buffered():
    gnb, ue = GnbStackNr(), UeStackNr()
    ue.write_drb(b"early")
    ue.write_nas(b"\x7e\x01")
    link = NrAirLink(gnb, ue)
    link.run(50)
    assert b"early" in gnb.rx_drb
    assert b"\x7e\x01" in gnb.rx_nas


def test_nr_release():
    gnb, ue, link = _connect()
    gnb.send_release()
    link.run(10)
    assert ue.released and not ue.connected


def test_nr_large_transfer_counts():
    """Sustained DL: many PDCP SDUs through the 512-byte TB budget."""
    gnb, ue, link = _connect()
    payloads = [os.urandom(300) for _ in range(50)]
    for p in payloads:
        gnb.write_drb(p)
    link.run(120)
    assert ue.rx_drb == payloads
