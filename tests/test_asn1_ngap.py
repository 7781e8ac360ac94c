"""NGAP ALIGNED-PER codec tests against the reference's golden vectors
(lib/test/asn1/ngap_asn1_test.cc)."""

from srsran_tpu.stack.asn1 import ngap

# golden: ngap_asn1_test.cc:30 (AMFConfigurationUpdate)
AMF_UPD = bytes.fromhex("0000000A00000100010003000011")
# golden: ngap_asn1_test.cc:63 (NGSetupRequest)
NG_SETUP_REQ = bytes.fromhex(
    "00150030000004001b00090000f1105000000001005240060180676e62310066000d00000000750000f110000000080015400160"
)
# golden: ngap_asn1_test.cc:117 (NGSetupResponse)
NG_SETUP_RESP = bytes.fromhex(
    "2015005e0000040001003a1b80616d66312e636c7573746572312e6e6574322e616d662e3567632e6d6e633030312e6d63"
    "633030312e336770706e6574776f726b2e6f726700600008000000f1103808970056400105005000080000f11000000008"
)
# golden: ngap_asn1_test.cc:161 (InitialUEMessage)
INIT_UE = bytes.fromhex(
    "000f4080a20000040055000200010026007d7c7e00417100760100f110000001014d436f77425159444b32567541794541"
    "6e363648396b7a485461465a4b30353741497237412b6e6c736149587852334e6973364c566f75466942343ddfabf5cd65"
    "2eb2541491484d41432d53484100858bbb1f42f1256f9a37531a772a2cf2b78ff160488402ed489399b6b73742"
    "0079000f4000f110000000001000f110000075005a400118"
)
# golden: ngap_asn1_test.cc:201 (DownlinkNASTransport)
DL_NAS = bytes.fromhex(
    "0004403e000003000a000200010055000200010026002b2a7e00560002000021681cd489650fdcc7c70eca8fa9be447020"
    "10c7f0791fa852e282847c9f4ce5c19451"
)
# golden: ngap_asn1_test.cc:230 (UplinkNASTransport, proc 46)
UL_NAS = bytes.fromhex(
    "002e403c000004000a0002000100550002000100260016157e00572d105e86219e7dda9995e3850384cfbea53b"
    "0079400f4000f110000000001000f110000075"
)
# golden: ngap_asn1_test.cc:256 (UEContextReleaseCommand)
UE_REL_CMD = bytes.fromhex("002900100000020072000400010001000f400148")
# golden: ngap_asn1_test.cc:277 (UEContextReleaseComplete)
UE_REL_COMPL = bytes.fromhex("2029000f000002000a40020001005540020001")
# golden: ngap_asn1_test.cc:299 (PDUSessionResourceSetupRequest)
PDU_SESS_SETUP = bytes.fromhex(
    "001d006c000004000a000200010055000200010026002e2d7e00680100252e0100c2110006010003300101060603e80603"
    "e8290501c0a80c7b25080764656661756c741201004a0027000001000021000003008b000a01f0c0a811d2000000010086"
    "0001100088000700010000090000"
)


def _roundtrip(vec: bytes):
    name, ies = ngap.unpack(vec)
    assert ngap.pack(name, ies) == vec
    return name, ies


def test_golden_amf_configuration_update():
    name, ies = _roundtrip(AMF_UPD)
    assert name == "amf_cfg_upd"
    # reference assertions (ngap_asn1_test.cc:40-51)
    assert ies["amf_name"] == "\x11"


def test_golden_ng_setup_request():
    name, ies = _roundtrip(NG_SETUP_REQ)
    assert name == "ng_setup_request"
    kind, gnb = ies["global_ran_node_id"]
    assert kind == "global_gnb_id"
    assert gnb["plmn_id"] == bytes.fromhex("00f110")
    assert gnb["gnb_id"] == ("gnb_id", (0x00000001, 32))
    assert ies["ran_node_name"] == "gnb1"
    ta = ies["supported_ta_list"][0]
    assert ta["tac"] == bytes.fromhex("000075")
    assert ta["broadcast_plmn_list"][0]["plmn_id"] == bytes.fromhex("00f110")
    assert ta["broadcast_plmn_list"][0]["tai_slice_support_list"][0]["s_nssai"]["sst"] == b"\x01"
    assert ies["default_paging_drx"] == "v256"


def test_golden_ng_setup_response():
    name, ies = _roundtrip(NG_SETUP_RESP)
    assert name == "ng_setup_response"
    # reference assertions (ngap_asn1_test.cc:139-152)
    assert ies["amf_name"] == "amf1.cluster1.net2.amf.5gc.mnc001.mcc001.3gppnetwork.org"
    guami = ies["served_guami_list"][0]["guami"]
    assert guami["plmn_id"] == bytes.fromhex("00f110")
    assert guami["amf_region_id"] == 0b111000
    assert guami["amf_set_id"] == 0b100010
    assert guami["amf_pointer"] == 0b10111
    assert ies["relative_amf_capacity"] == 5
    assert ies["plmn_support_list"][0]["plmn_id"] == bytes.fromhex("00f110")


def test_golden_initial_ue_message():
    name, ies = _roundtrip(INIT_UE)
    assert name == "init_ue_msg"
    # reference assertions (ngap_asn1_test.cc:180-190)
    assert ies["ran_ue_ngap_id"] == 1
    assert len(ies["nas_pdu"]) == 124
    kind, loc = ies["user_location_info"]
    assert kind == "user_location_info_nr"
    assert loc["nr_cgi"]["plmn_id"] == bytes.fromhex("00f110")
    assert ies["rrc_establishment_cause"] == "mo_sig"


def test_golden_dl_ul_nas_transport():
    name, ies = _roundtrip(DL_NAS)
    assert name == "dl_nas_transport"
    assert ies["amf_ue_ngap_id"] == 1 and ies["ran_ue_ngap_id"] == 1
    assert len(ies["nas_pdu"]) == 42  # ngap_asn1_test.cc:222

    name, ies = _roundtrip(UL_NAS)
    assert name == "ul_nas_transport"
    assert len(ies["nas_pdu"]) == 21  # ngap_asn1_test.cc:238
    assert ies["user_location_info"][0] == "user_location_info_nr"


def test_golden_ue_context_release():
    name, ies = _roundtrip(UE_REL_CMD)
    assert name == "ue_context_release_cmd"
    kind, pair = ies["ue_ngap_ids"]
    assert kind == "ue_ngap_id_pair"
    assert pair["amf_ue_ngap_id"] == 1 and pair["ran_ue_ngap_id"] == 1

    name, ies = _roundtrip(UE_REL_COMPL)
    assert name == "ue_context_release_complete"
    assert ies["amf_ue_ngap_id"] == 1 and ies["ran_ue_ngap_id"] == 1


def test_golden_pdu_session_resource_setup():
    name, ies = _roundtrip(PDU_SESS_SETUP)
    assert name == "pdu_session_res_setup_request"
    item = ies["pdu_session_res_setup_list_su_req"][0]
    # reference assertions (ngap_asn1_test.cc:320-340)
    assert item["pdu_session_id"] == 1
    assert item["s_nssai"]["sst"] == b"\x00"
    transfer = item["pdu_session_res_setup_request_transfer"]
    assert transfer.hex() == (
        "000003008b000a01f0c0a811d20000000100860001100088000700010000090000"
    )
    # nested open-type container decodes + repacks bit-exactly too
    tr = ngap.unpack_transfer(transfer)
    kind, tun = tr["ul_ngu_up_tnl_info"]
    assert kind == "gtp_tunnel"
    addr, nbits = tun["transport_layer_address"]
    assert nbits == 32 and addr == 0b11000000101010000001000111010010
    assert tr["pdu_session_type"] == "ipv6"
    qfi = tr["qos_flow_setup_request_list"][0]
    assert qfi["qos_flow_id"] == 1
    assert qfi["qos_flow_level_qos_params"]["qos_characteristics"] == (
        "non_dynamic_5qi", {"five_qi": 9}
    )
    assert ngap.pack_transfer(tr) == transfer


def test_ngap_synthetic_roundtrips():
    """Messages the goldens don't cover: failure + extended enum + GUAMI lists."""
    msg = ("ng_setup_failure", {"cause": ("radio_network", "slice_not_supported"),
                                "time_to_wait": "v10s"})
    assert ngap.unpack(ngap.pack(*msg)) == msg

    msg = ("ng_setup_response", {
        "amf_name": "amf.example.org",
        "served_guami_list": [
            {"guami": {"plmn_id": b"\x00\xf1\x10", "amf_region_id": 1,
                       "amf_set_id": 1, "amf_pointer": 0},
             "backup_amf_name": "backup.amf"}],
        "relative_amf_capacity": 255,
        "plmn_support_list": [
            {"plmn_id": b"\x00\xf1\x10",
             "slice_support_list": [{"s_nssai": {"sst": b"\x01", "sd": b"\x00\x00\x01"}}]}],
    })
    assert ngap.unpack(ngap.pack(*msg)) == msg
