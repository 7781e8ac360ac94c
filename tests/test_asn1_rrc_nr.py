"""NR RRC (TS 38.331) UPER codec tests.

Golden vectors were produced by compiling the reference's own generated
codec (lib/src/asn1/rrc_nr_asn1.cc) into a standalone generator and
packing the message set the 5G-NR scaffolding exchanges
(srsenb/src/stack/rrc/rrc_nr.cc update_default_cfg / send_connection_setup
field choices).  Each test decodes the reference bytes, checks fields,
and re-packs bit-exactly.
"""

from srsran_tpu.stack.asn1 import rrc_nr

# MIB: sfn=0b101010, scs15or60, ssb_offset=7, pos2, coreset0=3/ss0=9,
# not_barred, intra-freq resel allowed
MIB_VEC = bytes.fromhex("5471cc")
# SIB1: the srsenb rrc_nr default-config subset (see generator in test docstring)
SIB1_VEC = bytes.fromhex(
    "78810170104004020000ea0000000032500208002c2000017126c00f16d185"
)
RRC_SETUP_REQUEST_VEC = bytes.fromhex("12468acf1348")
RRC_SETUP_VEC = bytes.fromhex("285400020d63070080c034880bbd5b7dde02")
RRC_REJECT_VEC = bytes.fromhex("0880")
RRC_SETUP_COMPLETE_VEC = bytes.fromhex("12f0300100c00000800419f8010404080c000175b81ffc")
DL_INFO_TRANSFER_VEC = bytes.fromhex("2c808fc0555760")
UL_INFO_TRANSFER_VEC = bytes.fromhex("3a01bf01e600")
RRC_RELEASE_VEC = bytes.fromhex("1600")


def _roundtrip(channel, vec):
    msg = rrc_nr.unpack(channel, vec)
    assert rrc_nr.pack(channel, msg) == vec
    return msg


def test_mib_nr():
    msg = _roundtrip("bcch_bch", MIB_VEC)
    kind, mib = msg["message"]
    assert kind == "mib"
    assert mib["sys_frame_num"] == 0b101010
    assert mib["sub_carrier_spacing_common"] == "scs15or60"
    assert mib["ssb_subcarrier_offset"] == 7
    assert mib["dmrs_type_a_position"] == "pos2"
    assert mib["pdcch_cfg_sib1"] == {"ctrl_res_set_zero": 3, "search_space_zero": 9}
    assert mib["cell_barred"] == "not_barred"
    assert mib["intra_freq_resel"] == "allowed"


def test_sib1_nr():
    msg = _roundtrip("bcch_dl_sch", SIB1_VEC)
    kind, c1 = msg["message"]
    assert kind == "c1"
    kind, sib1 = c1
    assert kind == "sib_type1"
    assert sib1["cell_sel_info"]["q_rx_lev_min"] == -70
    assert sib1["cell_sel_info"]["q_qual_min"] == -20
    info = sib1["cell_access_related_info"]["plmn_id_list"][0]
    assert info["plmn_id_list"][0] == {"mcc": [0, 0, 1], "mnc": [0, 1]}
    assert info["tac"] == 0x75
    assert info["cell_id"] == 1
    assert info["cell_reserved_for_oper"] == "not_reserved"
    assert sib1["conn_est_fail_ctrl"]["conn_est_fail_count"] == "n2"
    si = sib1["si_sched_info"]
    assert si["si_win_len"] == "s20"
    assert si["sched_info_list"][0]["si_periodicity"] == "rf16"
    assert si["sched_info_list"][0]["sib_map_info"][0]["type"] == "sib_type2"
    assert si["sched_info_list"][0]["sib_map_info"][0]["value_tag"] == 0
    rach = si["si_request_cfg"]["rach_occasions_si"]["rach_cfg_si"]
    assert rach["prach_cfg_idx"] == 16
    assert rach["preamb_rx_target_pwr"] == -110
    assert rach["ra_resp_win"] == "sl8"
    assert si["si_request_cfg"]["si_request_res"][0]["ra_preamb_start_idx"] == 60
    assert sib1["ue_timers_and_consts"]["t300"] == "ms1000"
    assert sib1["ue_timers_and_consts"]["t311"] == "ms30000"


def test_rrc_setup_request():
    msg = _roundtrip("ul_ccch", RRC_SETUP_REQUEST_VEC)
    _, (kind, req) = msg["message"]
    assert kind == "rrc_setup_request"
    ies = req["rrc_setup_request"]
    assert ies["ue_id"] == ("random_value", 0x123456789A & 0x7FFFFFFFFF)
    assert ies["establishment_cause"] == "mo_data"


def test_rrc_setup():
    msg = _roundtrip("dl_ccch", RRC_SETUP_VEC)
    _, (kind, setup) = msg["message"]
    assert kind == "rrc_setup"
    assert setup["rrc_transaction_id"] == 1
    _, ies = setup["crit_exts"]
    rr = ies["radio_bearer_cfg"]
    assert rr["srb_to_add_mod_list"][0]["srb_id"] == 1
    drb = rr["drb_to_add_mod_list"][0]
    assert drb["drb_id"] == 1
    pdcp = drb["pdcp_cfg"]
    assert pdcp["drb"]["pdcp_sn_size_ul"] == "len18bits"
    assert pdcp["drb"]["hdr_compress"] == ("not_used", None)
    assert pdcp["t_reordering"] == "ms100"
    assert pdcp["ciphering_disabled"] == "true"  # the ext-addition group
    sec = rr["security_cfg"]["security_algorithm_cfg"]
    assert sec["ciphering_algorithm"] == "nea2"
    assert sec["integrity_prot_algorithm"] == "nia2"
    assert rr["security_cfg"]["key_to_use"] == "master"
    assert ies["master_cell_group"] == bytes.fromhex("deadbeef01")


def test_rrc_reject_and_release():
    msg = _roundtrip("dl_ccch", RRC_REJECT_VEC)
    _, (kind, rej) = msg["message"]
    assert kind == "rrc_reject"
    assert rej["crit_exts"][1]["wait_time"] == 5

    msg = _roundtrip("dl_dcch", RRC_RELEASE_VEC)
    _, (kind, rel) = msg["message"]
    assert kind == "rrc_release"
    assert rel["rrc_transaction_id"] == 3
    assert rel["crit_exts"][1] == {}


def test_rrc_setup_complete():
    msg = _roundtrip("ul_dcch", RRC_SETUP_COMPLETE_VEC)
    _, (kind, compl) = msg["message"]
    assert kind == "rrc_setup_complete"
    assert compl["rrc_transaction_id"] == 1
    _, ies = compl["crit_exts"]
    assert ies["sel_plmn_id"] == 1
    assert ies["registered_amf"]["plmn_id"] == {"mcc": [0, 0, 1], "mnc": [0, 1]}
    assert ies["registered_amf"]["amf_id"] == 0x800001
    assert ies["guami_type"] == "native"
    assert ies["s_nssai_list"][0] == ("sst", 1)
    assert ies["ded_nas_msg"] == bytes.fromhex("7e0041010203")
    assert ies["ng_5g_s_tmsi_value"] == ("ng_5g_s_tmsi", 0x0000BADC0FFE)


def test_info_transfer():
    msg = _roundtrip("dl_dcch", DL_INFO_TRANSFER_VEC)
    _, (kind, dl) = msg["message"]
    assert kind == "dl_info_transfer"
    assert dl["rrc_transaction_id"] == 2
    assert dl["crit_exts"][1]["ded_nas_msg"] == bytes.fromhex("7e02aabb")

    msg = _roundtrip("ul_dcch", UL_INFO_TRANSFER_VEC)
    _, (kind, ul) = msg["message"]
    assert kind == "ul_info_transfer"
    assert ul["crit_exts"][1]["ded_nas_msg"] == bytes.fromhex("7e03cc")


def test_synthetic_roundtrips():
    """Shapes the goldens don't cover: TMSI identity, reject without wait_time,
    DRB release list, 18-bit SN absent (12-bit default), part2 TMSI."""
    msg = {"message": ("c1", ("rrc_setup_request", {"rrc_setup_request": {
        "ue_id": ("ng_5g_s_tmsi_part1", 0x7000000001),
        "establishment_cause": "mps_prio_access", "spare": 0}}))}
    assert rrc_nr.unpack("ul_ccch", rrc_nr.pack("ul_ccch", msg)) == msg

    msg = {"message": ("c1", ("rrc_setup", {
        "rrc_transaction_id": 2,
        "crit_exts": ("rrc_setup", {
            "radio_bearer_cfg": {
                "drb_to_release_list": [1, 2],
                "srb3_to_release": "true",
            },
            "master_cell_group": b"\x01\x02",
        })}))}
    assert rrc_nr.unpack("dl_ccch", rrc_nr.pack("dl_ccch", msg)) == msg

    msg = {"message": ("c1", ("rrc_setup_complete", {
        "rrc_transaction_id": 0,
        "crit_exts": ("rrc_setup_complete", {
            "sel_plmn_id": 2,
            "ded_nas_msg": b"\x7e\x00",
            "ng_5g_s_tmsi_value": ("ng_5g_s_tmsi_part2", 0x1ff),
        })}))}
    assert rrc_nr.unpack("ul_dcch", rrc_nr.pack("ul_dcch", msg)) == msg
