"""S1AP ALIGNED-PER codec tests against the reference's golden vectors
(lib/test/asn1/s1ap_asn1_test.cc)."""

from srsran_tpu.stack.asn1 import per, s1ap


def test_aligned_constrained_int():
    # §10.5.7 aligned: 1/2 aligned octets for ranges 256/64K, indefinite above
    def rt(typ, v):
        data = typ.to_bytes(v, aligned=True)
        assert typ.from_bytes(data, aligned=True) == v
        return data

    assert rt(per.Int(0, 254), 7) == b"\x07"           # bit-field (8 bits here)
    assert rt(per.Int(0, 255), 7) == b"\x07"           # single aligned octet
    assert rt(per.Int(0, 65535), 0x1234) == b"\x12\x34"
    assert rt(per.Int(0, 16777215), 1) == b"\x00\x01"  # L=1 (2 bits) + align + 1 octet
    assert rt(per.Int(0, 4294967295), 100) == b"\x00\x64"
    data = rt(per.Int(0, 10_000_000_000), 1_000_000_000)
    assert data == bytes([0b01100000, 0x3B, 0x9A, 0xCA, 0x00])  # L=4 in 3 bits


def test_aligned_length_alignment():
    # length determinants are octet-aligned in the aligned variant
    w = per.BitWriter(aligned=True)
    w.put(1, 1)  # one stray bit
    per.put_length(w, 5)
    assert w.nbits() == 16  # 1 bit + 7 pad + 8 length bits


# golden: lib/test/asn1/s1ap_asn1_test.cc:32 (S1SetupRequest)
S1_SETUP_REQ = bytes.fromhex(
    "0011002D000004003B00080009F107000019B0003C400A0380656E62303031396200400007000001C009F1070089400140"
)
# golden: lib/test/asn1/s1ap_asn1_test.cc:65 (InitialContextSetupRequest)
INIT_CTXT_SETUP = bytes.fromhex(
    "00090080c60000060000000200640008000200010042000a183b9aca00603b9aca000018007800003400734500093c0f80"
    "0a0021f0b7361c5664273e5b04b7020742023e060009f107000700375266c101091b0774657374313233066d6e63303730"
    "066d636339303104677072730501c0a80302270e8080210a0300000a810608080808500bf609f107800101f67e72691309"
    "f10700012305f4f67e7269006b000518000c0000004900204525e49a77c8d5cf263363eb5bb9c3439b9eb3861fa8a7cf43"
    "5407ae422b63b9"
)
# golden: lib/test/asn1/s1ap_asn1_test.cc:99 (UEContextReleaseRequest)
UE_CTXT_RELEASE_REQ = bytes.fromhex("00124015000003000000020001000800020001000240020280")


def test_golden_s1_setup_request():
    name, ies = s1ap.unpack(S1_SETUP_REQ)
    assert name == "s1_setup_request"
    # reference assertions (s1ap_asn1_test.cc:42-52)
    assert ies["global_enb_id"]["enb_id"] == ("macro_enb_id", 0x0019B)
    assert ies["global_enb_id"]["plmn_id"] == bytes.fromhex("09f107")
    assert ies["enbname"] == "enb0019b"
    assert ies["supported_tas"][0]["tac"] == b"\x00\x07"
    assert ies["default_paging_drx"] == "v128"
    assert s1ap.pack(name, ies) == S1_SETUP_REQ


def test_golden_initial_context_setup():
    name, ies = s1ap.unpack(INIT_CTXT_SETUP)
    assert name == "init_context_setup_request"
    # reference assertions (s1ap_asn1_test.cc:88-90)
    assert ies["ue_security_cap"]["encryption_algorithms"] == 0b1100000000000000
    assert ies["ue_security_cap"]["integrity_protection_algorithms"] == 0b1100000000000000
    assert ies["mme_ue_s1ap_id"] == 100
    assert ies["enb_ue_s1ap_id"] == 1
    erab = ies["erab_to_be_setup_list_ctxt_su_req"][0]
    assert erab["erab_id"] == 5
    assert erab["erab_level_qos_params"]["qci"] == 9
    assert erab["gtp_teid"] == bytes.fromhex("b7361c56")
    assert erab["transport_layer_address"] == (0x0A0021F0, 32)
    assert s1ap.pack(name, ies) == INIT_CTXT_SETUP


def test_golden_ue_context_release_request():
    name, ies = s1ap.unpack(UE_CTXT_RELEASE_REQ)
    assert name == "ue_context_release_request"
    # reference assertions (s1ap_asn1_test.cc:108-112)
    assert ies["mme_ue_s1ap_id"] == 1
    assert ies["enb_ue_s1ap_id"] == 1
    assert ies["cause"] == ("radio_network", "user_inactivity")
    assert s1ap.pack(name, ies) == UE_CTXT_RELEASE_REQ


def test_constructed_messages_roundtrip():
    """Every procedure the EPC exchanges: build → pack → unpack identity."""
    cases = [
        ("init_ue_msg", {
            "enb_ue_s1ap_id": 1,
            "nas_pdu": b"\x07\x41\x01",
            "tai": {"plmn_id": b"\x09\xf1\x07", "tac": b"\x00\x01"},
            "eutran_cgi": {"plmn_id": b"\x09\xf1\x07", "cell_id": 0x19B0},
            "rrc_establishment_cause": "mo_data",
        }),
        ("dl_nas_transport", {"mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1, "nas_pdu": b"\x07\x52"}),
        ("ul_nas_transport", {
            "mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1, "nas_pdu": b"\x07\x53",
            "eutran_cgi": {"plmn_id": b"\x09\xf1\x07", "cell_id": 0x19B0},
            "tai": {"plmn_id": b"\x09\xf1\x07", "tac": b"\x00\x01"},
        }),
        ("init_context_setup_request", {
            "mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1,
            "ue_aggregate_maximum_bitrate": {
                "ue_aggregate_maximum_bit_rate_dl": 1_000_000_000,
                "ue_aggregate_maximum_bit_rate_ul": 500_000_000,
            },
            "erab_to_be_setup_list_ctxt_su_req": [{
                "erab_id": 5,
                "erab_level_qos_params": {
                    "qci": 9,
                    "alloc_retention_prio": {
                        "prio_level": 15,
                        "pre_emption_cap": "shall_not_trigger_pre_emption",
                        "pre_emption_vulnerability": "not_pre_emptable",
                    },
                },
                "transport_layer_address": (0xC0A80302, 32),
                "gtp_teid": b"\x00\x00\x00\x01",
                "nas_pdu": b"\x27\x00",
            }],
            "ue_security_cap": {
                "encryption_algorithms": 0b1100000000000000,
                "integrity_protection_algorithms": 0b1100000000000000,
            },
            "security_key": 0xDEADBEEF,
        }),
        ("init_context_setup_response", {
            "mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1,
            "erab_setup_list_ctxt_su_res": [{
                "erab_id": 5, "transport_layer_address": (0x0A000001, 32),
                "gtp_teid": b"\x00\x00\x00\x02",
            }],
        }),
        ("ue_context_release_request", {
            "mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1,
            "cause": ("radio_network", "radio_conn_with_ue_lost"),
        }),
        ("ue_context_release_cmd", {
            "ue_s1ap_ids": ("ue_s1ap_id_pair", {"mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1}),
            "cause": ("nas", "normal_release"),
        }),
        ("ue_context_release_complete", {"mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1}),
        ("s1_setup_response", {
            "mmename": "srsmme01",
            "served_gummeis": [{
                "served_plmns": [b"\x09\xf1\x07"],
                "served_group_ids": [b"\x00\x01"],
                "served_mmecs": [b"\x1a"],
            }],
            "relative_mme_capacity": 10,
        }),
    ]
    for name, ies in cases:
        data = s1ap.pack(name, ies)
        assert s1ap.unpack(data) == (name, ies), name


def test_unknown_ie_preserved():
    data = s1ap.pack("dl_nas_transport",
                     {"mme_ue_s1ap_id": 7, "enb_ue_s1ap_id": 1, "nas_pdu": b"\x07",
                      "_ie999": (1, b"\xaa\xbb")})
    name, ies = s1ap.unpack(data)
    assert ies["_ie999"] == (1, b"\xaa\xbb")
    assert s1ap.pack(name, ies) == data
