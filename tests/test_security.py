"""3GPP conformance test vectors for the security algorithms — the same
spec test sets the reference validates in lib/test/common/test_eea{1,2,3}.cc,
test_eia{1,3}.cc, test_f12345.cc."""

import hashlib

from srsran_tpu.stack import security as sec


def h(s: str) -> bytes:
    return bytes.fromhex(s.replace(" ", ""))


def test_aes128_fips197():
    key = h("000102030405060708090a0b0c0d0e0f")
    pt = h("00112233445566778899aabbccddeeff")
    assert sec.aes128_encrypt(key, pt) == h("69c4e0d86a7b0430d8cdb78070b4c55a")


def test_aes128_cmac_rfc4493():
    key = h("2b7e151628aed2a6abf7158809cf4f3c")
    assert sec.aes128_cmac(key, b"") == h("bb1d6929e95937287fa37d129b756746")
    msg = h("6bc1bee22e409f96e93d7e117393172a")
    assert sec.aes128_cmac(key, msg) == h("070a16b46b4d4144f79bdd9dd04a287c")


def test_eea1_set1():
    key = h("d3c5d592327fb11c4035c6680af8c6d1")
    msg = h("981ba6824c1bfb1ab485472029b71d80 8ce33e2cc3c0b5fc1f3de8a6dc66b1f0")
    ct = sec.eea1(key, 0x398A59B4, 0x15, 1, msg, 253)
    exp = h("5d5bfe75eb04f68ce0a12377ea00b37d 47c6a0ba06309155086a859c4341b378")
    # last 3 bits are masked off (253-bit message)
    assert ct[:31] == exp[:31]
    assert ct[31] & 0xF8 == exp[31] & 0xF8
    back = sec.eea1(key, 0x398A59B4, 0x15, 1, ct, 253)
    assert back[:31] == msg[:31]


def test_eea1_set2():
    key = h("2bd6459f82c440e0952c49104805ff48")
    msg = h(
        "7ec61272743bf1614726446a6c38ced166f6ca76eb5430044286346cef130f92"
        "922b03450d3a9975e5bd2ea0eb55ad8e1b199e3ec4316020e9a1b285e7627953"
        "59b7bdfd39bef4b2484583d5afe082aee638bf5fd5a606193901a08f4ab41aab"
        "9b134880"
    )
    ct = sec.eea1(key, 0xC675A64B, 0x0C, 1, msg, 798)
    exp = h(
        "3f67850714b8da69efb727ed7a6c0c50714ad736c4f56000 06e3525be807c467"
        "c677ff864af45fba09c27cde38f87a1f84d59ab255408f2c7b82f9ead41a1fe6"
        "5eabebfbc1f3a4c56c9a26fcf7b3d66d0220ee4775bc58170a2b12f3431d11b3"
        "44d6e36c"
    )
    assert ct[:99] == exp[:99]


def test_eia1_set4():
    key = h("83fd23a244a74cf358da3019f1722635")
    msg = h(
        "35c68716633c66fb750c266865d53c11ea05b1e9fa49c8398d48e1efa5909d39"
        "47902837f5ae96d5a05bc8d61ca8dbef1b13a4b4abfe4fb1006045b674bb5472"
        "9304c382be53a5af05556176f6eaa2ef1d05e4b083181ee674cda5a485f74d7a"
    )
    mac = sec.eia1(key, 0x36AF6144, 0x0F, 1, msg, 768)
    assert mac == h("bba74492")


def test_eea2_set1():
    key = h("d3c5d592327fb11c4035c6680af8c6d1")
    msg = h("981ba6824c1bfb1ab485472029b71d80 8ce33e2cc3c0b5fc1f3de8a6dc66b1f0")
    ct = sec.eea2(key, 0x398A59B4, 0x15, 1, msg, 253)
    exp = h("e9fed8a63d155304d71df20bf3e82214 b20ed7dad2f233dc3c22d7bdeeed8e78")
    assert ct[:31] == exp[:31]
    assert ct[31] & 0xF8 == exp[31] & 0xF8
    assert sec.eea2(key, 0x398A59B4, 0x15, 1, ct, 253)[:31] == msg[:31]


def test_eia2_spec_set1():
    # 33.401 C.2.1 test set 1
    key = h("2bd6459f82c5b300952c49104881ff48")
    msg = h("3332346263393840")
    mac = sec.eia2(key, 0x38A6F056, 0x18, 0, msg, 58)
    assert mac == h("118c6eb8")


def test_eea3_set1():
    key = h("173d14ba5003731d7a60049470f00a29")
    msg = h("6cf6534073555 2ab0c9752fa6f9025fe0bd675d9005875b2".replace(" ", "00"))
    msg = h("6cf65340735552ab0c9752fa6f9025fe0bd675d9005875b200000000")
    ct = sec.eea3(key, 0x66035492, 0xF, 0, msg, 193)
    exp = h("a6c85fc66afb8533aafc2518dfe784940ee1e4b030238cc800000000")
    assert ct[:24] == exp[:24]
    assert ct[24] & 0x80 == exp[24] & 0x80


def test_eea3_set2():
    key = h("e5bd3ea0eb55ade866c6ac58bd54302a")
    count, bearer, direction = 0x56823, 0x18, 1
    msg = h(
        "14a8ef693d678507bbe7270a7f67ff5006c3525b9807e467c4e56000ba338f5d"
        "429292c44224281c85e1f890e5c87974f2c4f2527f8966963966936b8f9b26d7"
        "bb74d92a6d60be5bb1735d48d5c36b4dc49b00985b3f12271bd8128a77130b43"
        "dacbc4121aa428b55b"
    )
    ct = sec.eea3(key, count, bearer, direction, msg + b"\x00" * 27, 800)
    exp_start = h("131d43e0dea1be5c5a1bfd971d852cbf712d7b4f57961fea3208afa8bca433f4")
    assert ct[:32] == exp_start


def test_eia3_set2():
    key = h("47054125561eb2dda94059da05097850")
    msg = bytes(12)
    mac = sec.eia3(key, 0x561EB2DD, 0x14, 0, msg, 90)
    assert mac == h("6719a088")


def test_eia3_set3():
    key = h("c9e6cec4607c72db000aefa88385ab0a")
    msg = h(
        "983b41d47d780c9e1ad11d7eb70391b1de0b35da2dc62f83e7b78d6306ca0ea0"
        "7e941b7be91348f9fcb170e2217fecd97f9f68adb16e5d7d21e569d280ed775c"
        "ebde3f4093c53881000000"
    )
    mac = sec.eia3(key, 0xA94059DA, 0xA, 1, msg, 577)
    assert mac == h("fae8ff0b")


def test_milenage_ts35208_set2():
    k = h("465b5ce8b199b49faa5f0a2ee238a6bc")
    rand = h("23553cbe9637a89d218ae64dae47bf35")
    sqn = h("ff9bb4d0b607")
    amf = h("b9b9")
    op = h("cdc202d5123e20f62b6d676ac72cb318")
    opc = sec.compute_opc(k, op)
    assert opc == h("cd63cb71954a9f4e48a5994e37a02baf")
    assert sec.milenage_f1(k, opc, rand, sqn, amf) == h("4a9ffac354dfafb3")
    assert sec.milenage_f1(k, opc, rand, sqn, amf, sresync=True) == h("01cfaf9ec4e871e9")
    res, ck, ik, ak, ak_s = sec.milenage_f2345(k, opc, rand)
    assert res == h("a54211d5e3ba50bf")
    assert ck == h("b40ba9a3c58b2a05bbf0d987b21bf8cb")
    assert ik == h("f769bcd751044604127672711c6d3441")
    assert ak == h("aa689c648370")


def test_kdf_chain_runs():
    ck, ik = bytes(16), bytes(range(16))
    k_asme = sec.generate_k_asme(ck, ik, b"\x21\xf3\x54", bytes(6))
    assert len(k_asme) == 32
    k_enb = sec.generate_k_enb(k_asme, 0)
    k_nas_enc, k_nas_int = sec.generate_nas_keys(k_asme, 1, 2)
    rrc_enc, rrc_int, up_enc = sec.generate_as_keys(k_enb, 1, 2)
    assert len(k_nas_enc) == len(rrc_int) == 16
    # deterministic
    assert sec.generate_k_enb(k_asme, 0) == k_enb
    assert sec.generate_k_enb(k_asme, 1) != k_enb


def test_cipher_integrity_roundtrip_all_algs():
    key = bytes(range(16))
    data = b"hello lte world!" * 5
    for alg in (0, 1, 2, 3):
        enc = sec.CIPHER_ALGS[alg](key, 7, 3, 0, data, 8 * len(data))
        dec = sec.CIPHER_ALGS[alg](key, 7, 3, 0, enc, 8 * len(data))
        assert dec == data
    for alg in (1, 2, 3):
        mac = sec.INTEGRITY_ALGS[alg](key, 7, 3, 0, data)
        assert len(mac) == 4


def test_nas_golden_dedicated_bearer():
    """Golden NAS vector from the reference's srslte_asn1_nas_test.cc:52 —
    a security-protected Activate Dedicated EPS Bearer Context Request.
    The 6-byte security header (PD/type + MAC + seq) is stripped; the inner
    plain message must parse to the reference test's asserted fields and
    repack byte-exactly."""
    from srsran_tpu.stack import nas

    pdu = bytes([0x27, 0x35, 0x11, 0xfd, 0xf6, 0x07, 0x62, 0x00, 0xc5, 0x05, 0x01, 0x01, 0x07,
                 0x21, 0x31, 0x00, 0x03, 0x40, 0x08, 0xae, 0x5d, 0x02, 0x00, 0xc2, 0x81, 0x34,
                 0x01, 0x4d])
    inner = pdu[6:]
    m = nas.unpack(inner)
    assert m.pd == nas.PD_ESM and m.msg_type == nas.ACT_DED_BEARER_REQUEST
    # reference assertions (srslte_asn1_nas_test.cc:70-92)
    assert m.fields["ebi"] == 6
    assert m.fields["pti"] == 0
    assert m.fields["linked_ebi"] == 5
    assert m.fields["qci"] == 1
    tft = m.fields["tft"]
    assert tft.op_code == nas.TFT_OP_CREATE
    assert not tft.params
    assert len(tft.filters) == 1
    assert tft.filters[0].direction == nas.TFT_DIR_BIDIRECTIONAL
    assert tft.filters[0].fid == 1
    assert tft.filters[0].precedence == 0
    assert len(tft.filters[0].components) == 3
    # repack: message builder reproduces the inner message (sans optional IEs)
    rebuilt = nas.pack_activate_dedicated_bearer_request(
        ebi=6, linked_ebi=5, qci=1, tft=tft) + m.fields["opts"]
    assert rebuilt == inner
