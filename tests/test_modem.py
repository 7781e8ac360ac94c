import numpy as np
import pytest

from srsran_tpu.phy.modem import (
    LLR_SCALE_I8,
    LLR_SCALE_I16,
    Mod,
    constellation_np,
    demod_hard,
    demod_soft,
    modulate,
    quantize_llr,
)

ALL_MODS = [Mod.BPSK, Mod.QPSK, Mod.QAM16, Mod.QAM64, Mod.QAM256]


@pytest.mark.parametrize("mod", ALL_MODS)
def test_unit_energy(mod):
    t = constellation_np(mod)
    assert len(t) == 2**mod.bits_per_symbol
    np.testing.assert_allclose(np.mean(np.abs(t) ** 2), 1.0, rtol=1e-6)


def test_qpsk_table_reference():
    # lte_tables.c set_QPSKtable: 00→(+,+) 01→(+,-) 10→(-,+) 11→(-,-)
    a = 1 / np.sqrt(2)
    t = constellation_np(Mod.QPSK)
    np.testing.assert_allclose(t, [a + a * 1j, a - a * 1j, -a + a * 1j, -a - a * 1j], rtol=1e-6)


def test_16qam_table_reference():
    # lte_tables.c set_16QAMtable spot checks
    t = constellation_np(Mod.QAM16)
    L1, L2 = 1 / np.sqrt(10), 3 / np.sqrt(10)
    np.testing.assert_allclose(t[0], L1 + L1 * 1j, rtol=1e-6)
    np.testing.assert_allclose(t[5], L1 - L2 * 1j, rtol=1e-6)
    np.testing.assert_allclose(t[10], -L2 + L1 * 1j, rtol=1e-6)
    np.testing.assert_allclose(t[15], -L2 - L2 * 1j, rtol=1e-6)


def test_64qam_table_reference():
    t = constellation_np(Mod.QAM64)
    L1, L2, L3, L4 = (x / np.sqrt(42) for x in (1, 3, 5, 7))
    np.testing.assert_allclose(t[0], L2 + L2 * 1j, rtol=1e-6)
    np.testing.assert_allclose(t[1], L2 + L1 * 1j, rtol=1e-6)
    np.testing.assert_allclose(t[4], L2 + L3 * 1j, rtol=1e-6)
    np.testing.assert_allclose(t[5], L2 + L4 * 1j, rtol=1e-6)
    np.testing.assert_allclose(t[26], L4 - L2 * 1j, rtol=1e-6)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_mod_demod_roundtrip(mod):
    rng = np.random.default_rng(int(mod))
    bits = rng.integers(0, 2, 120 * mod.bits_per_symbol).astype(np.uint8)
    sym = np.asarray(modulate(mod, bits))
    assert sym.shape == (120,)
    hard = np.asarray(demod_hard(mod, sym))
    np.testing.assert_array_equal(hard, bits)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_demod_noisy_ber(mod):
    """At a comfortable per-modulation SNR the demapper is error-free."""
    snr_db = {Mod.BPSK: 10, Mod.QPSK: 12, Mod.QAM16: 20, Mod.QAM64: 26, Mod.QAM256: 32}[mod]
    rng = np.random.default_rng(42)
    n = 3000
    bits = rng.integers(0, 2, n * mod.bits_per_symbol).astype(np.uint8)
    sym = np.asarray(modulate(mod, bits))
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * np.sqrt(0.5) * 10 ** (-snr_db / 20)
    hard = np.asarray(demod_hard(mod, sym + noise.astype(np.complex64)))
    ber = np.mean(hard != bits)
    assert ber < 1e-3, f"{mod}: ber {ber}"


def test_demod_float_formulas_qam64():
    """Check exact zone formulas vs hand computation (demod_soft.c)."""
    sym = np.array([0.3 - 0.9j], np.complex64)
    llr = np.asarray(demod_soft(Mod.QAM64, sym))
    t1, t2 = 4 / np.sqrt(42), 2 / np.sqrt(42)
    exp = [-0.3, 0.9, abs(0.3) - t1, abs(-0.9) - t1]
    exp += [abs(exp[2]) - t2, abs(exp[3]) - t2]
    np.testing.assert_allclose(llr, np.array(exp, np.float32), rtol=1e-5)


def test_quantize_scales():
    sym = np.array([0.5 + 0.25j], np.complex64)
    llr = demod_soft(Mod.QPSK, sym)
    q16 = np.asarray(quantize_llr(llr, Mod.QPSK, np.int16))
    q8 = np.asarray(quantize_llr(llr, Mod.QPSK, np.int8))
    assert q16[0] == round(-0.5 * np.sqrt(2) * LLR_SCALE_I16[Mod.QPSK])
    assert q8[0] == round(-0.5 * np.sqrt(2) * LLR_SCALE_I8[Mod.QPSK])


def test_scrambling_roundtrip():
    from srsran_tpu.phy.scrambling import scramble_bits, scramble_soft
    from srsran_tpu.phy.sequence import gold_sequence, gold_sequence_signs

    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 256).astype(np.uint8)
    c = gold_sequence(12345, 256)
    tx = np.asarray(scramble_bits(bits, c))
    assert not np.array_equal(tx, bits)
    back = np.asarray(scramble_bits(tx, c))
    np.testing.assert_array_equal(back, bits)
    # soft descramble of BPSK-like LLRs
    llr = (1.0 - 2.0 * tx).astype(np.float32)
    soft = np.asarray(scramble_soft(llr, gold_sequence_signs(12345, 256)))
    np.testing.assert_array_equal(soft > 0, bits == 0)
