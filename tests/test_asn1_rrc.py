"""ASN.1 UPER codec tests.

Golden vectors are the byte arrays from the reference's ASN.1 conformance
tests (lib/test/asn1/srslte_asn1_rrc_*.cc) — 3GPP-conformant encodings that
our hand-written schema must decode and re-encode bit-exactly, the same
parity bar the reference's own tests apply.
"""

import numpy as np
import pytest

from srsran_tpu.stack.asn1 import per, rrc


# ------------------------------------------------------------- primitives


def rt(typ, value):
    data = typ.to_bytes(value)
    out = typ.from_bytes(data)
    assert out == value, (value, out, data.hex())
    return data


def test_constrained_int_widths():
    # §10.5.7: minimal bit-field over the range
    assert rt(per.Int(0, 1), 1) == b"\x80"
    assert rt(per.Int(0, 7), 5) == b"\xa0"
    assert rt(per.Int(1, 16), 16) == b"\xf0"  # 4 bits, offset 15
    assert rt(per.Int(-8, 7), -8) == b"\x00"
    assert rt(per.Int(0, 65535), 0x1234) == b"\x12\x34"
    # range 1 encodes as nothing
    w = per.BitWriter()
    per.Int(3, 3).encode(w, 3)
    assert w.nbits() == 0


def test_length_determinants():
    w = per.BitWriter()
    per.put_length(w, 5)
    assert w.to_bytes() == b"\x05"
    w = per.BitWriter()
    per.put_length(w, 300)
    assert w.to_bytes() == bytes([0x81, 0x2C])
    r = per.BitReader(bytes([0x81, 0x2C]))
    assert per.get_length(r) == 300


def test_normally_small():
    w = per.BitWriter()
    per.put_normally_small(w, 0)
    assert w.nbits() == 7
    r = per.BitReader(w.to_bytes(), 7)
    assert per.get_normally_small(r) == 0
    w = per.BitWriter()
    per.put_normally_small(w, 100)  # >= 64 → length + octets
    r = per.BitReader(w.to_bytes())
    assert per.get_normally_small(r) == 100


def test_enum_ext():
    e = per.Enum(["a", "b", "c"], ext=True, ext_names=["x", "y"])
    rt(e, "b")
    rt(e, "y")


def test_choice_ext_roundtrip():
    ch = per.Choice([("a", per.Int(0, 7))], ext_alts=[("z", per.Int(0, 255))])
    rt(ch, ("a", 3))
    rt(ch, ("z", 200))


def test_seq_optional_default_and_ext_group():
    inner = per.Seq(
        [per.M("x", per.Int(0, 15)), per.O("y", per.Bool()), per.D("z", per.Int(0, 7), 4)],
        ext=True,
        ext_additions=[per.M("w", per.Int(0, 255)), [per.O("u", per.Bool()), per.O("v", per.Int(0, 3))]],
    )
    rt(inner, {"x": 5, "z": 4})
    rt(inner, {"x": 5, "y": True, "z": 2, "w": 77})
    rt(inner, {"x": 5, "z": 4, "w": 1, "u": False, "v": 3})


def test_seq_preserves_unknown_extension():
    """A decoder built from an older schema must tolerate unknown additions
    (the reference's unrecognized_ext_group_test) — here they are kept as
    raw open-type bytes so a re-encode is bit-exact."""
    new = per.Seq([per.M("x", per.Int(0, 15))], ext=True,
                  ext_additions=[per.M("w", per.Int(0, 255)), per.M("q", per.OctStr(1, 4))])
    old = per.Seq([per.M("x", per.Int(0, 15))], ext=True,
                  ext_additions=[per.M("w", per.Int(0, 255))])
    data = new.to_bytes({"x": 9, "w": 3, "q": b"\xaa\xbb"})
    out = old.from_bytes(data)
    assert out["x"] == 9 and out["w"] == 3
    assert out["_ext1"]  # the unknown addition, kept raw
    assert old.to_bytes(out) == data  # round-trips through the old schema


def test_bit_oct_strings():
    rt(per.BitStr(16), 0xC001)
    rt(per.BitStr(1, 32), (0b101, 3))
    rt(per.OctStr(), b"hello")
    rt(per.OctStr(2, 2), b"ab")


# ----------------------------------------------------- golden RRC vectors

# lib/test/asn1/srslte_asn1_rrc_dl_ccch_test.cc:44 (RRCConnectionSetup)
DL_CCCH_SETUP = bytes.fromhex("6012980bfdd204fa183ed5e6c25990c1a60001314042508000f8")


def test_golden_rrc_conn_setup():
    v = rrc.DL_CCCH_MESSAGE.from_bytes(DL_CCCH_SETUP)
    kind, setup = v["msg"][1]
    assert v["msg"][0] == "c1" and kind == "rrc_conn_setup"
    assert setup["rrc_transaction_id"] == 0
    r8 = setup["crit_exts"][1][1]
    ded = r8["rr_cfg_ded"]
    assert "phys_cfg_ded" in ded
    cqi = ded["phys_cfg_ded"]["cqi_report_cfg"]
    # the reference test's assertions (srslte_asn1_rrc_dl_ccch_test.cc:68-75)
    assert cqi["nom_pdsch_rs_epre_offset"] == 0
    assert cqi["cqi_report_periodic"][0] == "setup"
    assert cqi["cqi_report_periodic"][1]["cqi_pucch_res_idx"] == 0
    assert cqi["cqi_report_periodic"][1]["cqi_pmi_cfg_idx"] == 38
    # bit-exact repack (same bar as the reference test)
    assert rrc.DL_CCCH_MESSAGE.to_bytes(v) == DL_CCCH_SETUP


def test_reest_reject_pack():
    """Mirror of rrc_reestablishment_reject_test: pack-only."""
    msg = {"msg": ("c1", ("rrc_conn_reest_reject", {"crit_exts": ("rrc_conn_reest_reject_r8", {})}))}
    data = rrc.DL_CCCH_MESSAGE.to_bytes(msg)
    assert rrc.DL_CCCH_MESSAGE.from_bytes(data) == msg


def test_mib_matches_phy_packer():
    """The ASN.1 MIB encoding must equal the PHY-side 24-bit MIB packer
    (phy/phch/pbch.py) used by the PBCH chain."""
    from srsran_tpu.phy.phch.pbch import Mib

    for nof_prb, sfn, dur, res in [(6, 0, 0, 1), (50, 512, 1, 3), (100, 1020, 0, 0)]:
        phy_bits = Mib(nof_prb=nof_prb, phich_length=dur, phich_resources=res, sfn=sfn).pack()
        v = {
            "msg": {
                "dl_bw": {6: "n6", 15: "n15", 25: "n25", 50: "n50", 75: "n75", 100: "n100"}[nof_prb],
                "phich_cfg": {
                    "phich_dur": ["normal", "extended"][dur],
                    "phich_res": ["one_sixth", "half", "one", "two"][res],
                },
                "sys_frame_num": sfn >> 2,
                "sched_info_sib1_br_r13": 0,
                "sys_info_unchanged_br_r15": False,
                "spare": 0,
            }
        }
        data = rrc.BCCH_BCH_MESSAGE.to_bytes(v)
        asn_bits = np.unpackbits(np.frombuffer(data, np.uint8))
        assert asn_bits.size == 24
        np.testing.assert_array_equal(asn_bits, phy_bits)


# lib/test/asn1/srslte_asn1_rrc_dl_dcch_test.cc:44 — HO reconfiguration
DL_DCCH_HO = bytes(
    [0x20, 0x1b, 0x3f, 0x80, 0x00, 0x00, 0x00, 0x01, 0xa9, 0x08, 0x80, 0x00, 0x00, 0x29, 0x00,
     0x97, 0x80, 0x00, 0x00, 0x00, 0x01, 0x04, 0x22, 0x14, 0x00, 0xf8, 0x02, 0x0a, 0xc0, 0x60,
     0x00, 0xa0, 0x0c, 0x80, 0x42, 0x02, 0x9f, 0x43, 0x07, 0xda, 0xbc, 0xf8, 0x4b, 0x32, 0x18,
     0x34, 0xc0, 0x00, 0x2d, 0x68, 0x08, 0x5e, 0x18, 0x00, 0x16, 0x80, 0x00]
)


def test_golden_reconfig_handover():
    v = rrc.DL_DCCH_MESSAGE.from_bytes(DL_DCCH_HO)
    assert v["msg"][0] == "c1" and v["msg"][1][0] == "rrc_conn_recfg"
    r8 = v["msg"][1][1]["crit_exts"][1][1]
    # values cross-checked against the reference codec's JSON dump
    mci = r8["mob_ctrl_info"]
    assert mci["target_pci"] == 272
    assert mci["t304"] == "ms1000"
    assert mci["new_ue_id"] == 0x003E
    assert mci["rr_cfg_common"]["prach_cfg"]["root_seq_idx"] == 86
    assert mci["rr_cfg_common"]["p_max"] == 10
    ev = r8["meas_cfg"]["report_cfg_to_add_mod_list"][0]["report_cfg"][1]["trigger_type"][1]["event_id"]
    assert ev == ("event_a3", {"a3_offset": 6, "report_on_leave": False})
    obj = r8["meas_cfg"]["meas_obj_to_add_mod_list"][0]["meas_obj"][1]
    assert obj["carrier_freq"] == 3400 and obj["allowed_meas_bw"] == "mbw25"
    assert r8["security_cfg_ho"]["handov_type"][0] == "intra_lte"
    # the sameSFN-Indication-r14 extension survives as a raw addition
    assert any(k.startswith("_ext") for k in mci)
    assert rrc.DL_DCCH_MESSAGE.to_bytes(v) == DL_DCCH_HO


# lib/test/asn1/rrc_asn1_test.cc:212 — reconfiguration with drb setup
DL_DCCH_RECFG2 = bytes.fromhex("20021008000C406000")


def test_golden_reconfig_small():
    v = rrc.DL_DCCH_MESSAGE.from_bytes(DL_DCCH_RECFG2)
    r8 = v["msg"][1][1]["crit_exts"][1][1]
    assert "rr_cfg_ded" in r8 and "meas_cfg" not in r8 and "mob_ctrl_info" not in r8
    assert rrc.DL_DCCH_MESSAGE.to_bytes(v) == DL_DCCH_RECFG2


# lib/test/asn1/srslte_asn1_rrc_meas_test.cc:47 — measurement report
UL_DCCH_MEAS = bytes.fromhex("0810493C0D978983C084208208210001BC48")


def test_golden_measurement_report():
    v = rrc.UL_DCCH_MESSAGE.from_bytes(UL_DCCH_MEAS)
    meas = v["msg"][1][1]["crit_exts"][1][1]["meas_results"]
    # assertions from the reference test (srslte_asn1_rrc_meas_test.cc:60-86)
    assert meas["meas_id"] == 1
    assert meas["meas_result_pcell"] == {"rsrp_result": 73, "rsrq_result": 15}
    kind, lst = meas["meas_result_neigh_cells"]
    assert kind == "meas_result_list_eutra" and len(lst) == 1
    assert lst[0]["pci"] == 357
    assert lst[0]["meas_result"] == {"rsrp_result": 60, "rsrq_result": 18}
    assert rrc.UL_DCCH_MESSAGE.to_bytes(v) == UL_DCCH_MEAS


# lib/test/asn1/rrc_asn1_test.cc:95 — MIB
def test_golden_mib():
    data = bytes.fromhex("9464C0")
    v = rrc.BCCH_BCH_MESSAGE.from_bytes(data)
    m = v["msg"]
    assert m["dl_bw"] == "n75"
    assert m["phich_cfg"] == {"phich_dur": "extended", "phich_res": "half"}
    assert m["sys_frame_num"] == 0b00011001
    assert m["sched_info_sib1_br_r13"] == 6
    assert m["sys_info_unchanged_br_r15"] is False
    assert rrc.BCCH_BCH_MESSAGE.to_bytes(v) == data


# lib/test/asn1/rrc_asn1_test.cc:133/212/245 — BCCH-DL-SCH goldens
BCCH_SI_SIB2 = bytes.fromhex("000149001250400800094000A03F01000A7FC9800104286C000C")
BCCH_SIB1 = bytes.fromhex("406404e100070019b018c06010A940")
BCCH_SI_SIB2_SIB3 = bytes.fromhex(
    "00830992B7EC9300A3424B000C000500205D6AAAF04200C01DDC801C4880030010A713228500"
)


def test_golden_sib1():
    v = rrc.BCCH_DL_SCH_MESSAGE.from_bytes(BCCH_SIB1)
    kind, sib1 = v["msg"][1]
    assert kind == "sib_type1"
    # reference assertions (rrc_asn1_test.cc:218-224)
    assert "p_max" not in sib1
    si = sib1["sched_info_list"]
    assert len(si) == 1
    assert si[0]["si_periodicity"] == "rf16"
    assert si[0]["sib_map_info"] == ["sib_type13_v920"]  # extension enumerator
    assert sib1["cell_access_related_info"]["plmn_id_list"][0]["plmn_id"]["mcc"] == [9, 0, 1]
    assert rrc.BCCH_DL_SCH_MESSAGE.to_bytes(v) == BCCH_SIB1


def test_golden_system_information_sib2():
    v = rrc.BCCH_DL_SCH_MESSAGE.from_bytes(BCCH_SI_SIB2)
    sibs = v["msg"][1][1]["crit_exts"][1]["sib_type_and_info"]
    assert sibs[0][0] == "sib2"
    rach = sibs[0][1]["rr_cfg_common"]["rach_cfg_common"]
    assert rach["preamb_info"]["nof_ra_preambs"] == "n40"
    assert rach["ra_supervision_info"]["ra_resp_win_size"] == "sf6"
    assert sibs[0][1]["rr_cfg_common"]["pucch_cfg_common"]["n1_pucch_an"] == 511
    assert rrc.BCCH_DL_SCH_MESSAGE.to_bytes(v) == BCCH_SI_SIB2


def test_golden_system_information_sib2_sib3():
    v = rrc.BCCH_DL_SCH_MESSAGE.from_bytes(BCCH_SI_SIB2_SIB3)
    sibs = v["msg"][1][1]["crit_exts"][1]["sib_type_and_info"]
    assert [s[0] for s in sibs] == ["sib2", "sib3"]
    sib3 = sibs[1][1]
    assert sib3["cell_resel_serving_freq_info"] == {
        "s_non_intra_search": 7, "thresh_serving_low": 2, "cell_resel_prio": 3,
    }
    assert sib3["intra_freq_cell_resel_info"]["q_rx_lev_min"] == -60
    # sib2 carries a pusch-ConfigCommon-v1270 extension → raw preservation
    assert rrc.BCCH_DL_SCH_MESSAGE.to_bytes(v) == BCCH_SI_SIB2_SIB3


# lib/test/asn1/srslte_asn1_rrc_mcch_test.cc:45 — MBSFNAreaConfiguration
MCCH_GOLDEN = bytes.fromhex("0d8fdfffffffe22ffc385e61eca80000020210002005e61eca8000004042")


def test_golden_mcch():
    v = rrc.MCCH_MESSAGE.from_bytes(MCCH_GOLDEN)
    kind, cfg = v["msg"][1]
    assert kind == "mbsfn_area_cfg_r9"
    # reference assertions (srslte_asn1_rrc_mcch_test.cc:58-77)
    assert len(cfg["common_sf_alloc_r9"]) == 2
    assert "non_crit_ext" not in cfg
    assert rrc.MCCH_MESSAGE.to_bytes(v) == MCCH_GOLDEN


def test_ul_messages_roundtrip():
    """Stack-side UL messages: construct → encode → decode identity."""
    req = {"msg": ("c1", ("rrc_conn_request", {"crit_exts": ("rrc_conn_request_r8", {
        "ue_id": ("s_tmsi", {"mmec": 0x5A, "m_tmsi": 0x12345678}),
        "establishment_cause": "mo_data", "spare": 0})}))}
    data = rrc.UL_CCCH_MESSAGE.to_bytes(req)
    assert rrc.UL_CCCH_MESSAGE.from_bytes(data) == req

    comp = {"msg": ("c1", ("rrc_conn_setup_complete", {
        "rrc_transaction_id": 1,
        "crit_exts": ("c1", ("rrc_conn_setup_complete_r8", {
            "sel_plmn_id": 1, "ded_info_nas": b"\x07\x41\x01"})),
    }))}
    data = rrc.UL_DCCH_MESSAGE.to_bytes(comp)
    assert rrc.UL_DCCH_MESSAGE.from_bytes(data) == comp


def test_paging_roundtrip():
    page = {"msg": ("c1", ("paging", {
        "paging_record_list": [
            {"ue_id": ("s_tmsi", {"mmec": 1, "m_tmsi": 0xDEADBEEF}), "cn_domain": "ps"},
            {"ue_id": ("imsi", [0, 0, 1, 0, 1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9]), "cn_domain": "cs"},
        ],
        "sys_info_mod": "true_value",
    }))}
    data = rrc.PCCH_MESSAGE.to_bytes(page)
    assert rrc.PCCH_MESSAGE.from_bytes(data) == page
