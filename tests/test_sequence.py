import numpy as np

from srsran_tpu.phy import sequence as seq


def gold_slow(c_init: int, length: int) -> np.ndarray:
    """Bit-serial TS 36.211 §7.2 reference implementation (the spec)."""
    n = seq.NC + length + 31
    x1 = np.zeros(n, dtype=np.uint8)
    x2 = np.zeros(n, dtype=np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(n - 31):
        x1[i + 31] = x1[i + 3] ^ x1[i]
        x2[i + 31] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    return (x1[seq.NC : seq.NC + length] ^ x2[seq.NC : seq.NC + length]).astype(
        np.uint8
    )


def test_gold_matches_spec():
    for c_init in (0, 1, 0x12345, (1 << 31) - 1, 301):
        for length in (1, 28, 100, 1000):
            np.testing.assert_array_equal(
                seq.gold_sequence(c_init, length), gold_slow(c_init, length)
            )


def test_gold_signs():
    s = seq.gold_sequence_signs(77, 64)
    c = seq.gold_sequence(77, 64)
    np.testing.assert_array_equal(s, 1.0 - 2.0 * c)


def test_gold_jax_matches_numpy():
    for c_init in (0, 7, 0xDEADBEE):
        got = np.asarray(seq.gold_sequence_jax(c_init, 333))
        np.testing.assert_array_equal(got, seq.gold_sequence(c_init, 333))
