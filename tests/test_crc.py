import numpy as np

from srsran_tpu.phy import common as C
from srsran_tpu.phy import crc


def crc_slow(bits: np.ndarray, poly: int, order: int) -> np.ndarray:
    """Bit-serial long division (the spec, TS 36.212 §5.1.1)."""
    reg = 0
    for b in bits:
        reg = (reg << 1) | int(b)
        if (reg >> order) & 1:
            reg ^= poly
    for _ in range(order):
        reg <<= 1
        if (reg >> order) & 1:
            reg ^= poly
    return np.array([(reg >> (order - 1 - j)) & 1 for j in range(order)], np.uint8)


def test_crc_matrix_matches_bitserial():
    rng = np.random.default_rng(0)
    for poly in (C.LTE_CRC24A, C.LTE_CRC24B, C.LTE_CRC16, C.LTE_CRC8):
        order = crc.crc_order(poly)
        for n in (8, 40, 123):
            bits = rng.integers(0, 2, n).astype(np.uint8)
            np.testing.assert_array_equal(
                crc.crc_compute_np(bits, poly), crc_slow(bits, poly, order)
            )


def test_crc16_known_value():
    # LTE CRC16 == CRC-16/XMODEM (poly 0x1021, init 0): "123456789" -> 0x31C3
    data = b"123456789"
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    got = crc.crc_compute_np(bits, C.LTE_CRC16)
    val = int("".join(map(str, got)), 2)
    assert val == 0x31C3


def test_attach_and_check_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 100).astype(np.uint8)
    coded = crc.crc_attach_np(bits, C.LTE_CRC24A)
    assert crc.crc_check_np(coded, C.LTE_CRC24A)
    corrupted = coded.copy()
    corrupted[5] ^= 1
    assert not crc.crc_check_np(corrupted, C.LTE_CRC24A)


def test_crc_device_batched():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, (4, 64)).astype(np.float32)
    got = np.asarray(crc.crc_compute(bits, C.LTE_CRC24B))
    for i in range(4):
        np.testing.assert_array_equal(
            got[i], crc.crc_compute_np(bits[i].astype(np.uint8), C.LTE_CRC24B)
        )
    with_crc = np.concatenate([bits, got.astype(np.float32)], axis=1)
    ok = np.asarray(crc.crc_ok(with_crc, C.LTE_CRC24B))
    assert ok.all()
    with_crc[1, 3] = 1 - with_crc[1, 3]
    ok2 = np.asarray(crc.crc_ok(with_crc, C.LTE_CRC24B))
    assert ok2[0] and not ok2[1]
