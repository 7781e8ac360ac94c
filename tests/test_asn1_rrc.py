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


def test_seq_skips_unknown_extension():
    """A decoder built from an older schema must skip unknown additions
    (the reference's unrecognized_ext_group_test)."""
    new = per.Seq([per.M("x", per.Int(0, 15))], ext=True,
                  ext_additions=[per.M("w", per.Int(0, 255)), per.M("q", per.OctStr(1, 4))])
    old = per.Seq([per.M("x", per.Int(0, 15))], ext=True,
                  ext_additions=[per.M("w", per.Int(0, 255))])
    data = new.to_bytes({"x": 9, "w": 3, "q": b"\xaa\xbb"})
    out = old.from_bytes(data)
    assert out == {"x": 9, "w": 3}


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
