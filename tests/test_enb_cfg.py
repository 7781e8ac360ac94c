"""Operator config-file plane: rr.conf/sib.conf/drb.conf → EnbStack.

The `srsenb/src/enb_cfg_parser.cc` role: the example files in
apps/configs/ boot a cell whose broadcast SIBs carry the configured
values — verified over the air by a UE that acquires SI before random
access (the config plane feeds the real ASN.1 encoder, and the UE's
decoder is the cross-check).
"""

import numpy as np

from srsran_tpu.apps.full_stack import EnbStack, UeStack
from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
from srsran_tpu.runtime.enb_cfg import EnbConfig, make_enb, parse_libconfig
from srsran_tpu.stack import security as sec
from srsran_tpu.stack.nas_ue import Usim

RR = "apps/configs/rr.conf.example"
SIB = "apps/configs/sib.conf.example"
DRB = "apps/configs/drb.conf.example"

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OPC = sec.compute_opc(KEY, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))


def test_libconfig_parser_syntax():
    cfg = parse_libconfig("""
    // comment
    top = { a = 0x10; b = -3.5; c = "str"; d = true; /* block */
            e = [1, 2, 3]; };
    lst = ( { x = 1; }, { x = 2; } );
    bare = 7;
    """)
    assert cfg["top"] == {"a": 16, "b": -3.5, "c": "str", "d": True,
                         "e": [1, 2, 3]}
    assert [e["x"] for e in cfg["lst"]] == [1, 2]
    assert cfg["bare"] == 7


def test_example_files_parse():
    cfg = EnbConfig.load(RR, SIB, DRB)
    cell = cfg.cells[0]
    assert cell["cell_id"] == 0x1A and cell["pci"] == 7
    assert cell["tac"] == 7 and cell["dl_earfcn"] == 3400
    assert cell["meas_cell_list"][0]["eci"] == 0x19C02
    assert cfg.sib["sib1"]["sched_info"][0]["si_mapping_info"] == [3]
    q9 = cfg.qci_config(9)
    assert q9["rlc_config"]["ul_am"]["t_poll_retx"] == 120
    assert q9["logical_channel_config"]["priority"] == 11


def test_config_boots_cell_and_ue_acquires_it():
    """enb_app --rr.conf analog: the configured cell broadcasts SIBs that
    a SI-acquiring UE decodes; attach completes and the UE-side decoded
    SI matches the files."""
    cfg = EnbConfig.load(RR, SIB, DRB)
    hss = Hss()
    hss.add_subscriber(Subscriber("ue1", IMSI, KEY, OPC, amf=b"\x80\x00", sqn=0))
    spgw = Spgw()
    mme = Mme(hss, spgw)
    enb = make_enb(cfg, mme, spgw, nof_prb=15)
    assert enb.cell.id == 7
    assert enb.enb_id == 0x1A
    assert enb.earfcn == 3400
    assert enb.s1_neighbors == {2: 0x19C02 >> 8}
    assert enb.prach_cfg.root_seq_index == 128
    assert enb.prach_cfg.freq_offset == 2

    ue = UeStack(enb.cell, Usim(IMSI, KEY, OPC), acquire_si=True)
    ul = None
    for tti in range(250):
        dl = enb.run_tti(ul)
        ul = ue.run_tti(dl)
        if (ue.rrc_state == UeStack.RRC_ACTIVE
                and ue.nas.state == ue.nas.REGISTERED):
            break
    assert ue.nas.state == ue.nas.REGISTERED

    # SIB1 over the air carries the configured identity
    info = ue.sib1["cell_access_related_info"]
    assert info["tac"] == 7
    assert info["cell_id"] == (0x1A << 8) | 7
    assert ue.sib1["sched_info_list"][0]["si_periodicity"] == "rf16"
    # SIB2 carries the configured PRACH plane
    prach = ue.sib2["rr_cfg_common"]["prach_cfg"]
    assert prach["root_seq_idx"] == 128
    assert prach["prach_cfg_info"]["prach_freq_offset"] == 2
    assert ue.sib2["rr_cfg_common"]["rach_cfg_common"]["preamb_info"][
        "nof_ra_preambs"] == "n52"
    # SIB3 (mapped via si_mapping_info) reached the idle-mode parameters
    assert ue.sib3_params is not None
    assert ue.sib3_params["q_rx_lev_min_dbm"] == 2 * -61
