"""Conformance vectors for the TS 36.331 branches added in round 4:
SIB4-SIB13, inter-RAT measurement config/results, CDMA2000/GERAN
mobility messages, CounterCheck, UEInformation, logged measurements,
RN reconfiguration, MBMS counting, RSTD indication, and the SCell
dedicated-config subtree.

Every vector was produced by compiling the reference's own generated
codec (lib/src/asn1/rrc_asn1.cc) into a standalone generator and packing
the message with representative field values (the same technique as the
NR RRC goldens — see tests/test_asn1_rrc_nr.py).  Each test decodes the
reference bytes, asserts key fields, and re-packs bit-exactly.
"""

from srsran_tpu.stack.asn1 import rrc


def _si(vec_hex):
    """Decode one SystemInformation BCCH-DL-SCH vector → the single SIB
    item (name, value); assert bit-exact repack."""
    data = bytes.fromhex(vec_hex)
    msg = rrc.BCCH_DL_SCH_MESSAGE.from_bytes(data)
    assert rrc.BCCH_DL_SCH_MESSAGE.to_bytes(msg) == data
    kind, si = msg["msg"]
    assert kind == "c1" and si[0] == "sys_info"
    items = si[1]["crit_exts"][1]["sib_type_and_info"]
    assert len(items) == 1
    return items[0]


def _dl(vec_hex):
    data = bytes.fromhex(vec_hex)
    msg = rrc.DL_DCCH_MESSAGE.from_bytes(data)
    assert rrc.DL_DCCH_MESSAGE.to_bytes(msg) == data
    return msg["msg"][1]


def _ul(vec_hex):
    data = bytes.fromhex(vec_hex)
    msg = rrc.UL_DCCH_MESSAGE.from_bytes(data)
    assert rrc.UL_DCCH_MESSAGE.to_bytes(msg) == data
    return msg["msg"][1]


def _c1(m, alt):
    """crit_exts → the c1 alternative's value, asserting its name."""
    kind, inner = m["crit_exts"]
    assert kind == "c1", kind
    name, v = inner
    assert name == alt, name
    return v


def test_sib4():
    name, s = _si("0009c42a6beb509904c8")
    assert name == "sib4"
    ncl = s["intra_freq_neigh_cell_list"]
    assert [c["pci"] for c in ncl] == [42, 501]
    assert ncl[0]["q_offset_cell"] == "db_minus2"
    assert ncl[1]["q_offset_cell"] == "db6"
    bl = s["intra_freq_black_cell_list"]
    assert bl[0]["start"] == 100 and bl[0]["range"] == "n8"
    assert s["csg_pci_range"]["start"] == 200


def test_sib5_with_r9_extension_group():
    name, s = _si("000c3706a41542611ea9026bc040f72c6000")
    assert name == "sib5"
    f = s["inter_freq_carrier_freq_list"][0]
    assert f["dl_carrier_freq"] == 3400
    assert f["q_rx_lev_min"] == -60
    assert f["p_max"] == 10
    assert f["t_resel_eutra"] == 2
    assert f["thresh_x_high"] == 12 and f["thresh_x_low"] == 4
    assert f["allowed_meas_bw"] == "mbw50"
    assert f["presence_ant_port1"] is True
    assert f["cell_resel_prio"] == 5
    assert f["q_offset_freq"] == "db_minus6"
    assert f["inter_freq_neigh_cell_list"][0]["pci"] == 77
    # release-9 extension-addition group
    assert f["q_qual_min_r9"] == -20
    assert f["thresh_x_q_r9"]["thresh_x_high_q_r9"] == 11
    assert f["thresh_x_q_r9"]["thresh_x_low_q_r9"] == 3


def test_sib6():
    name, s = _si("0011c1a50da8454660125c202a2d6c")
    assert name == "sib6"
    u = s["carrier_freq_list_utra_fdd"][0]
    assert u["carrier_freq"] == 10563
    assert u["cell_resel_prio"] == 3
    assert u["q_rx_lev_min"] == -50
    assert u["p_max_utra"] == 20
    assert u["q_qual_min"] == -12
    t = s["carrier_freq_list_utra_tdd"][0]
    assert t["carrier_freq"] == 9400 and t["p_max_utra"] == -5
    assert s["t_resel_utra"] == 3
    assert s["t_resel_utra_sf"]["sf_medium"] == "o_dot5"
    assert s["t_resel_utra_sf"]["sf_high"] == "o_dot75"


def test_sib7():
    name, s = _si("0014904004973fe53c9300")
    assert name == "sib7"
    assert s["t_resel_geran"] == 1
    g = s["carrier_freqs_info_list"][0]
    assert g["carrier_freqs"]["start_arfcn"] == 512
    assert g["carrier_freqs"]["band_ind"] == "dcs1800"
    kind, fa = g["carrier_freqs"]["following_arfcns"]
    assert kind == "equally_spaced_arfcns"
    assert fa["arfcn_spacing"] == 2 and fa["nof_following_arfcns"] == 5
    ci = g["common_info"]
    assert ci["cell_resel_prio"] == 1
    assert ci["ncc_permitted"] == 0xFF
    assert ci["q_rx_lev_min"] == 10
    assert ci["p_max_geran"] == 30
    assert ci["thresh_x_high"] == 9 and ci["thresh_x_low"] == 6


def test_sib8():
    name, s = _si(
        "0019f123456789a7f2180e4008b28500107d0211c86c48d159e2ad5abcaaaaaaaaaaaa")
    assert name == "sib8"
    sti = s["sys_time_info"]
    assert sti["cdma_eutra_synchronisation"] is True
    assert sti["cdma_sys_time"] == ("sync_sys_time", 0x123456789A)
    assert s["search_win_size"] == 7
    hr = s["params_hrpd"]
    assert hr["pre_regist_info_hrpd"]["pre_regist_allowed"] is True
    assert hr["pre_regist_info_hrpd"]["pre_regist_zone_id"] == 33
    assert hr["pre_regist_info_hrpd"]["secondary_pre_regist_zone_id_list"] == [1, 200]
    crp = hr["cell_resel_params_hrpd"]
    bc = crp["band_class_list"][0]
    assert bc["band_class"] == "bc5" and bc["cell_resel_prio"] == 4
    assert bc["thresh_x_high"] == 40 and bc["thresh_x_low"] == 20
    ncell = crp["neigh_cell_list"][0]
    assert ncell["band_class"] == "bc1"
    per = ncell["neigh_cells_per_freq_list"][0]
    assert per["arfcn"] == 1000 and per["pci_list"] == [17, 400]
    assert crp["t_resel_cdma2000"] == 6
    x = s["params1_xrtt"]
    cs = x["csfb_regist_param1_xrtt"]
    assert cs["sid"] == 0x1234 and cs["nid"] == 0x5678
    assert cs["multiple_sid"] is True and cs["multiple_nid"] is False
    assert cs["pwr_up_reg"] is True
    assert cs["regist_period"] == 0x55
    assert cs["regist_zone"] == 0xABC
    assert cs["total_zone"] == 5 and cs["zone_timer"] == 2
    assert x["long_code_state1_xrtt"] == 0x2AAAAAAAAAA


def test_sib9_sib10_sib11():
    name, s = _si("001d087470752d63656c6c")
    assert name == "sib9" and s["hnb_name"] == b"tpu-cell"
    name, s = _si("0020111233440780")
    assert name == "sib10"
    assert s["msg_id"] == 0x1112 and s["serial_num"] == 0x3344
    assert s["warning_type"] == bytes([0x07, 0x80])
    name, s = _si("002522229999860b41434547481e")
    assert name == "sib11"
    assert s["warning_msg_segment_type"] == "last_segment"
    assert s["warning_msg_segment_num"] == 3
    assert s["warning_msg_segment"] == bytes([0xA0, 0xA1, 0xA2, 0xA3, 0xA4])
    assert s["data_coding_scheme"] == bytes([0x0F])


def test_sib12_sib13_extension_alternatives():
    name, s = _si("0040050432187650207bd5b7c000")
    assert name == "sib12_v920"
    assert s["msg_id_r9"] == 0x4321 and s["serial_num_r9"] == 0x8765
    assert s["warning_msg_segment_type_r9"] == "not_last_segment"
    assert s["warning_msg_segment_num_r9"] == 1
    assert s["warning_msg_segment_r9"] == bytes([0xDE, 0xAD, 0xBE])
    name, s = _si("004083009b4aeab2c000")
    assert name == "sib13_v920"
    a = s["mbsfn_area_info_list_r9"][0]
    assert a["mbsfn_area_id_r9"] == 77
    assert a["non_mbsfn_region_len"] == "s2"
    assert a["notif_ind_r9"] == 2
    mc = a["mcch_cfg_r9"]
    assert mc["mcch_repeat_period_r9"] == "rf64"
    assert mc["mcch_offset_r9"] == 5
    assert mc["mcch_mod_period_r9"] == "rf1024"
    assert mc["sf_alloc_info_r9"] == 0x2A
    assert mc["sig_mcs_r9"] == "n13"
    n = s["notif_cfg_r9"]
    assert n["notif_repeat_coeff_r9"] == "n4"
    assert n["notif_offset_r9"] == 9 and n["notif_sf_idx_r9"] == 4


def test_reconfiguration_with_inter_rat_meas_config():
    kind, m = _dl(
        "2210149082574a1a001b512c122d9e0b70e3a046d0805360208004486b031325e"
        "0000e7cd1c0")
    assert kind == "rrc_conn_recfg"
    r8 = _c1(m, "rrc_conn_recfg_r8")
    mc = r8["meas_cfg"]
    objs = mc["meas_obj_to_add_mod_list"]
    kind, mu = objs[0]["meas_obj"]
    assert kind == "meas_obj_utra"
    assert mu["carrier_freq"] == 10563 and mu["offset_freq"] == -7
    lkind, cl = mu["cells_to_add_mod_list"]
    assert lkind == "cells_to_add_mod_list_utra_fdd"
    assert cl[0]["cell_idx"] == 4 and cl[0]["pci"] == 212
    assert mu["cell_for_which_to_report_cgi"] == ("utra_fdd", 300)
    kind, mg = objs[1]["meas_obj"]
    assert kind == "meas_obj_geran"
    assert mg["carrier_freqs"]["start_arfcn"] == 871
    assert mg["carrier_freqs"]["band_ind"] == "pcs1900"
    assert mg["carrier_freqs"]["following_arfcns"] == (
        "explicit_list_of_arfcns", [880, 910])
    assert mg["ncc_permitted"] == 0x81
    kind, mcd = objs[2]["meas_obj"]
    assert kind == "meas_obj_cdma2000"
    assert mcd["cdma2000_type"] == "type_hrpd"
    assert mcd["carrier_freq"] == {"band_class": "bc0", "arfcn": 333}
    assert mcd["search_win_size"] == 8
    rcs = mc["report_cfg_to_add_mod_list"]
    kind, rc = rcs[0]["report_cfg"]
    assert kind == "report_cfg_inter_rat"
    tkind, ev = rc["trigger_type"]
    assert tkind == "event"
    ekind, b1 = ev["event_id"]
    assert ekind == "event_b1"
    assert b1["b1_thres"] == ("b1_thres_utra", ("utra_rscp", -3))
    assert ev["hysteresis"] == 4 and ev["time_to_trigger"] == "ms320"
    assert rc["max_report_cells"] == 4
    assert rc["report_interv"] == "ms2048"
    assert rc["report_amount"] == "r16"
    kind, rc2 = rcs[1]["report_cfg"]
    _, ev2 = rc2["trigger_type"]
    ekind, b2 = ev2["event_id"]
    assert ekind == "event_b2"
    assert b2["b2_thres1"] == ("thres_rsrp", 50)
    assert b2["b2_thres2"] == ("b2_thres2_geran", 30)
    q = mc["quant_cfg"]
    assert q["quant_cfg_utra"]["meas_quant_utra_fdd"] == "cpich_ec_n0"
    assert q["quant_cfg_utra"]["filt_coef"] == "fc6"
    assert q["quant_cfg_geran"]["filt_coef"] == "fc3"
    assert (q["quant_cfg_cdma2000"]["meas_quant_cdma2000"]
            == "pilot_pn_phase_and_pilot_strength")
    assert mc["pre_regist_info_hrpd"]["pre_regist_allowed"] is False


def test_release_with_geran_redirect_and_priorities():
    kind, m = _dl("2c32220202f00f7500a29c020a008270f200c3")
    assert kind == "rrc_conn_release"
    r8 = _c1(m, "rrc_conn_release_r8")
    rkind, rg = r8["redirected_carrier_info"]
    assert rkind == "geran"
    assert rg["start_arfcn"] == 64 and rg["band_ind"] == "dcs1800"
    assert rg["following_arfcns"] == (
        "variable_bit_map_of_arfcns", bytes([0xF0, 0x0F]))
    im = r8["idle_mode_mob_ctrl_info"]
    assert im["freq_prio_list_eutra"][0] == {
        "carrier_freq": 1300, "cell_resel_prio": 7}
    g = im["freq_prio_list_geran"][0]
    assert g["carrier_freqs"]["start_arfcn"] == 32
    assert g["cell_resel_prio"] == 2
    assert im["freq_prio_list_utra_fdd"][0]["carrier_freq"] == 9999
    assert im["band_class_prio_list_hrpd"][0] == {
        "band_class": "bc3", "cell_resel_prio": 0}
    assert im["t320"] == "min30"


def test_mobility_from_eutra_handover_r8():
    kind, m = _dl("181620820222426b4003010203")
    assert kind == "mob_from_eutra_cmd"
    r8 = _c1(m, "mob_from_eutra_cmd_r8")
    assert r8["cs_fallback_ind"] is True
    pkind, ho = r8["purpose"]
    assert pkind == "handover"
    assert ho["target_rat_type"] == "geran"
    assert ho["target_rat_msg_container"] == bytes([0x10, 0x11, 0x12, 0x13])
    assert ho["nas_security_param_from_eutra"] == bytes([0x5A])
    assert ho["sys_info"] == ("si", [bytes([1, 2, 3])])


def test_mobility_from_eutra_cell_change_order_r9():
    kind, m = _dl("1e43056268")
    assert kind == "mob_from_eutra_cmd"
    r9 = _c1(m, "mob_from_eutra_cmd_r9")
    assert r9["cs_fallback_ind"] is False
    pkind, cco = r9["purpose"]
    assert pkind == "cell_change_order"
    assert cco["t304"] == "ms2000"
    tkind, tg = cco["target_rat"]
    assert tkind == "geran"
    assert tg["pci"]["network_colour_code"] == 5
    assert tg["pci"]["base_station_colour_code"] == 3
    assert tg["carrier_freq"] == {"arfcn": 77, "band_ind": "dcs1800"}


def test_csfb_and_handover_prep():
    kind, m = _dl("026f56df778184840380")
    assert kind == "csfb_params_resp_cdma2000"
    ckind, r8 = m["crit_exts"]
    assert ckind == "csfb_params_resp_cdma2000_r8"
    assert r8["rand"] == 0xDEADBEEF
    assert r8["mob_params"] == bytes([9, 8, 7])
    kind, m = _dl("14304488cd100b2bf8")
    assert kind == "ho_from_eutra_prep_request"
    r8 = _c1(m, "ho_from_eutra_prep_request_r8")
    assert r8["cdma2000_type"] == "type1_xrtt"
    assert r8["rand"] == 0x11223344
    assert r8["mob_params"] == bytes([0xCA, 0xFE])


def test_counter_check_and_response():
    kind, m = _dl("4602000f1207ffffffe0000000000008")
    assert kind == "counter_check"
    r8 = _c1(m, "counter_check_r8")
    lst = r8["drb_count_msb_info_list"]
    assert lst[0] == {"drb_id": 1, "count_msb_ul": 123456,
                      "count_msb_dl": 33554431}
    assert lst[1] == {"drb_id": 32, "count_msb_ul": 0, "count_msb_dl": 1}
    # srsLTE 20.10's bit_ref::pack rejects 32-bit fields (and the error
    # is dropped in pack_constrained_whole_number), so the reference
    # encoder can only produce the empty-list form; nonempty counts are
    # covered by a spec-correct self-roundtrip below
    kind, m = _ul("5600")
    assert kind == "counter_check_resp"
    ckind, r8 = m["crit_exts"]
    assert ckind == "counter_check_resp_r8"
    assert r8["drb_count_info_list"] == []
    full = {"msg": ("c1", ("counter_check_resp", {
        "rrc_transaction_id": 1,
        "crit_exts": ("counter_check_resp_r8", {
            "drb_count_info_list": [
                {"drb_id": 5, "count_ul": 4294967295, "count_dl": 7}]})}))}
    data = rrc.UL_DCCH_MESSAGE.to_bytes(full)
    back = rrc.UL_DCCH_MESSAGE.from_bytes(data)
    lst = back["msg"][1][1]["crit_exts"][1]["drb_count_info_list"]
    assert lst == [{"drb_id": 5, "count_ul": 4294967295, "count_dl": 7}]


def test_ue_information_request_and_response():
    kind, m = _dl("4818")
    assert kind == "ue_info_request_r9"
    r9 = _c1(m, "ue_info_request_r9")
    assert r9["rach_report_req_r9"] is True and r9["rlf_report_req_r9"] is True
    kind, m = _ul("5a3085bc53c04b0002d2c14a180ca9304053d68284b407ef530540")
    assert kind == "ue_info_resp_r9"
    r9 = _c1(m, "ue_info_resp_r9")
    assert r9["rach_report_r9"] == {"nof_preambs_sent_r9": 17,
                                    "contention_detected_r9": True}
    rlf = r9["rlf_report_r9"]
    assert rlf["meas_result_last_serv_cell_r9"] == {
        "rsrp_result_r9": 60, "rsrq_result_r9": 20}
    nc = rlf["meas_result_neigh_cells_r9"]
    e = nc["meas_result_list_eutra_r9"][0]
    assert e["carrier_freq_r9"] == 2400
    assert e["meas_result_list_r9"][0]["pci"] == 11
    assert e["meas_result_list_r9"][0]["meas_result"]["rsrp_result"] == 44
    u = nc["meas_result_list_utra_r9"][0]
    assert u["carrier_freq_r9"] == 10563
    ur = u["meas_result_list_r9"][0]
    assert ur["pci"] == ("fdd", 101)
    assert ur["meas_result"]["utra_rscp"] == 33
    g = nc["meas_result_list_geran_r9"][0]
    assert g["carrier_freq"] == {"arfcn": 514, "band_ind": "pcs1900"}
    assert g["pci"]["network_colour_code"] == 1
    assert g["pci"]["base_station_colour_code"] == 7
    assert g["meas_result"]["rssi"] == 45
    c = nc["meas_results_cdma2000_r9"][0]
    assert c["carrier_freq_r9"] == {"band_class": "bc10", "arfcn": 150}
    inner = c["meas_result_list_r9"]
    assert inner["pre_regist_status_hrpd"] is True
    cr = inner["meas_result_list_cdma2000"][0]
    assert cr["pci"] == 63
    assert cr["meas_result"]["pilot_pn_phase"] == 30000
    assert cr["meas_result"]["pilot_strength"] == 21


def test_logged_measurement_configuration():
    kind, m = _dl("50a0020101020309084220010102030481234480")
    assert kind == "logged_meas_cfg_r10"
    r10 = _c1(m, "logged_meas_cfg_r10")
    tr = r10["trace_ref_r10"]
    assert tr["plmn_id_r10"]["mcc"] == [0, 0, 1]
    assert tr["plmn_id_r10"]["mnc"] == [0, 1]
    assert tr["trace_id_r10"] == bytes([1, 2, 3])
    assert r10["trace_recording_session_ref_r10"] == bytes([9, 8])
    assert r10["tce_id_r10"] == bytes([0x42])
    assert r10["absolute_time_info_r10"] == 0x200101020304
    assert r10["area_cfg_r10"] == ("tac_list_r10", [0x1234])
    assert r10["logging_dur_r10"] == "min40"
    assert r10["logging_interv_r10"] == "ms5120"


def test_proximity_and_ul_handover_prep():
    kind, m = _ul("60009600")
    assert kind == "proximity_ind_r9"
    r9 = _c1(m, "proximity_ind_r9")
    assert r9["type_r9"] == "entering"
    assert r9["carrier_freq_r9"] == ("eutra_r9", 2400)
    kind, m = _ul("40801436587a9cbec04ef100")
    assert kind == "ul_ho_prep_transfer"
    r8 = _c1(m, "ul_ho_prep_transfer_r8")
    assert r8["cdma2000_type"] == "type1_xrtt"
    assert r8["meid"] == 0xA1B2C3D4E5F6
    assert r8["ded_info"] == bytes([0x77, 0x88])


def test_csfb_request_and_rn_reconfiguration():
    kind, m = _ul("00")
    assert kind == "csfb_params_request_cdma2000"
    kind, m = _dl("5c1196805042dd004000")
    assert kind == "rn_recfg_r10"
    r10 = _c1(m, "rn_recfg_r10")
    sf = r10["rn_sf_cfg_r10"]
    assert sf["sf_cfg_pattern_r10"] == ("sf_cfg_pattern_fdd_r10", 0x5A)
    rp = sf["rpdcch_cfg_r10"]
    assert rp["res_alloc_type_r10"] == "type0"
    assert rp["res_block_assign_r10"] == ("type01_r10", ("nrb25_r10", 0x1042))
    assert rp["demod_rs_r10"] == ("no_interleaving_r10", "dmrs")
    assert rp["pdsch_start_r10"] == 2
    fkind, fdd = rp["pucch_cfg_r10"]
    assert fkind == "fdd"
    assert fdd["n1_pucch_an_p0_r10"] == 512
    assert fdd["n1_pucch_an_p1_r10"] == 1024
    kind, m = _ul("6c00")
    assert kind == "rn_recfg_complete_r10"


def test_mbms_counting_and_rstd():
    data = bytes.fromhex("8018000048")
    msg = rrc.MCCH_MESSAGE.from_bytes(data)
    assert rrc.MCCH_MESSAGE.to_bytes(msg) == data
    kind, later = msg["msg"]
    assert kind == "later" and later[0] == "c2"
    kind, req = later[1]
    assert kind == "mbms_count_request_r10"
    t = req["count_request_list_r10"][0]["tmgi_r10"]
    assert t["plmn_id_r9"] == ("plmn_idx_r9", 4)
    assert t["service_id_r9"] == bytes([0, 0, 9])
    kind, m = _ul("70c62078")
    assert kind == "mbms_count_resp_r10"
    r10 = _c1(m, "count_resp_r10")
    assert r10["mbsfn_area_idx_r10"] == 3
    assert [c["count_resp_service_r10"] for c in r10["count_resp_list_r10"]] == [0, 15]
    kind, m = _ul("780051b930")
    assert kind == "inter_freq_rstd_meas_ind_r10"
    r10 = _c1(m, "inter_freq_rstd_meas_ind_r10")
    skind, st = r10["rstd_inter_freq_ind_r10"]
    assert skind == "start"
    info = st["rstd_inter_freq_info_list_r10"][0]
    assert info["carrier_freq_r10"] == 5230
    assert info["meas_prs_offset_r10"] == 19


def test_reconfiguration_scell_dedicated_and_other_cfg():
    kind, m = _dl(
        "2000b590a0de1a2cbe901686a54d319579473340c8128f1f3451e0")
    assert kind == "rrc_conn_recfg"
    r8 = _c1(m, "rrc_conn_recfg_r8")
    v890 = r8["non_crit_ext"]
    v920 = v890["non_crit_ext"]
    oc = v920["other_cfg"]
    assert "proximity_ind_eutra_r9" in oc["report_proximity_cfg_r9"]
    v1020 = v920["non_crit_ext"]
    sc = v1020["scell_to_add_mod_list"][0]
    assert sc["scell_idx"] == 1
    assert sc["cell_identif"] == {"phys_cell_id": 111, "dl_carrier_freq": 3350}
    ph = sc["rr_cfg_ded_scell"]["phys_cfg_ded_scell_r10"]
    nu = ph["non_ul_cfg"]
    assert nu["ant_info_r10"]["tx_mode_r10"] == "tm3"
    assert nu["ant_info_r10"]["codebook_subset_restrict_r10"] == (0x3, 2)
    assert nu["ant_info_r10"]["ue_tx_ant_sel"] == ("release", None)
    ckind, other = nu["cross_carrier_sched_cfg_r10"]["sched_cell_info_r10"]
    assert ckind == "other_r10"
    assert other == {"sched_cell_id_r10": 0, "pdsch_start_r10": 2}
    csirs = nu["csi_rs_cfg_r10"]["csi_rs_r10"][1]
    assert csirs["ant_ports_count_r10"] == "an2"
    assert csirs["res_cfg_r10"] == 5 and csirs["sf_cfg_r10"] == 77
    assert csirs["p_c_r10"] == -2
    ul = ph["ul_cfg"]
    cq = ul["cqi_report_cfg_scell_r10"]
    assert cq["cqi_report_mode_aperiodic_r10"] == "rm30"
    assert cq["nom_pdsch_rs_epre_offset_r10"] == 0
    cp = cq["cqi_report_periodic_scell_r10"][1]
    assert cp["cqi_pucch_res_idx_r10"] == 100
    assert cp["cqi_pmi_cfg_idx"] == 37
    assert cp["cqi_format_ind_periodic_r10"][0] == "wideband_cqi_r10"
    assert cp["ri_cfg_idx"] == 483
    assert cp["simul_ack_nack_and_cqi"] is True
    srs = ul["srs_ul_cfg_ded_aperiodic_r10"][1]
    assert srs["srs_cfg_idx_ap_r10"] == 13
    ap = srs["srs_cfg_ap_dci_format4_r10"][0]
    assert ap["srs_ant_port_ap_r10"] == "an2"
    assert ap["srs_bw_ap_r10"] == "bw1"
    assert ap["cyclic_shift_ap_r10"] == "cs4"
    up = ul["ul_pwr_ctrl_ded_scell_r10"]
    assert up["p0_ue_pusch_r10"] == -3
    assert up["delta_mcs_enabled_r10"] == "en1"
    assert up["accumulation_enabled_r10"] is True
    assert up["psrs_offset_r10"] == 9
    assert up["filt_coef_r10"] == "fc8"
    assert up["pathloss_ref_linking_r10"] == "scell"


def test_unknown_sib_extension_alternative_skip_and_preserve():
    """A SIB alternative newer than the schema (here: a synthetic
    extension index) must decode to an opaque value and re-encode
    bit-exactly — the skip-and-preserve contract (reference
    rrc_asn1_test.cc unrecognized_ext_group_test analog)."""
    # craft: SystemInformation with one extension alternative of index 9
    # (beyond sib13_v920) carrying 2 opaque octets
    from srsran_tpu.stack.asn1.per import BitWriter, put_normally_small, put_length
    w = BitWriter()
    # BCCH-DL-SCH: c1(0) | sys_info(0) | crit_exts sys_info_r8(0) |
    # non_crit_ext absent(0) | list count 1 (SIZE 1..32 -> 5 bits of 0)
    for bit in (0, 0, 0, 0, 0, 0, 0, 0, 0):
        w.put(bit, 1)
    w.put(1, 1)  # choice extension marker: ext alternative
    put_normally_small(w, 9)
    put_length(w, 2)
    w.put(0xAB, 8)
    w.put(0xCD, 8)
    data = w.to_bytes()
    msg = rrc.BCCH_DL_SCH_MESSAGE.from_bytes(data)
    kind, si = msg["msg"][1]
    assert kind == "sys_info"
    items = si["crit_exts"][1]["sib_type_and_info"]
    assert items[0] == ("_unknown_ext_9", bytes([0xAB, 0xCD]))
    assert rrc.BCCH_DL_SCH_MESSAGE.to_bytes(msg) == data
