import numpy as np
import pytest

from srsran_tpu.phy.fec.conv import convcoder_encode_np, viterbi_decode
from srsran_tpu.phy.fec.rate_match import (
    conv_rate_match_rx,
    conv_rate_match_tx,
    turbo_rate_match_rx,
    turbo_rate_match_tx,
    turbo_rm_indices,
)
from srsran_tpu.phy.fec.turbo import turbo_decode, turbo_encode_np


def bpsk_llr(bits01, ebn0_db, rng, rate):
    sigma2 = 1.0 / (2.0 * rate * 10 ** (ebn0_db / 10))
    y = (1.0 - 2.0 * bits01.astype(np.float32)) + rng.standard_normal(
        bits01.shape
    ).astype(np.float32) * np.sqrt(sigma2)
    return (-2.0 * y / sigma2).astype(np.float32)


# --- convolutional ----------------------------------------------------------


def test_convcoder_known_props():
    # all-zero input (tail-biting) → all-zero output
    out = convcoder_encode_np(np.zeros(40, np.uint8))
    assert out.sum() == 0
    # single one → weight equals sum of poly weights (shifted through)
    out = convcoder_encode_np(np.eye(40, dtype=np.uint8)[5])
    assert out.sum() == sum(bin(p).count("1") for p in (0x6D, 0x4F, 0x57))


def test_viterbi_noiseless():
    rng = np.random.default_rng(0)
    for d in (40, 100):
        bits = rng.integers(0, 2, (3, d)).astype(np.uint8)
        coded = np.stack([convcoder_encode_np(b) for b in bits])  # (3,3,d)
        llr = (2.0 * coded.astype(np.float32) - 1.0) * 8.0
        dec = np.asarray(viterbi_decode(llr, d))
        np.testing.assert_array_equal(dec, bits)


def test_viterbi_awgn():
    """K=7 R=1/3 at Eb/N0 = 4 dB: essentially error-free for short blocks."""
    rng = np.random.default_rng(1)
    d = 40  # PBCH size
    bits = rng.integers(0, 2, (16, d)).astype(np.uint8)
    coded = np.stack([convcoder_encode_np(b) for b in bits])
    llr = bpsk_llr(coded, 4.0, rng, rate=1 / 3)
    dec = np.asarray(viterbi_decode(llr, d))
    ber = np.mean(dec != bits)
    assert ber < 1e-3, ber


def test_conv_rate_match_roundtrip():
    rng = np.random.default_rng(2)
    d = 120
    coded = rng.standard_normal((3, d)).astype(np.float32)
    for e in (100, 360, 500):  # punctured, exact, repeated
        tx = np.asarray(conv_rate_match_tx(coded, e))
        assert tx.shape == (e,)
        back = np.asarray(conv_rate_match_rx(tx, d))
        if e >= 3 * d:
            np.testing.assert_allclose(back.reshape(-1).sum(), tx.sum(), rtol=1e-5)


# --- turbo rate matching -----------------------------------------------------


def test_turbo_rm_indices_cover_all_rv0():
    k = 40
    e = 3 * (k + 4)
    idx = turbo_rm_indices(k, e, 0)
    # E == buffer size → every d position appears exactly once
    assert sorted(idx.tolist()) == list(range(3 * (k + 4)))


def test_turbo_rm_rv0_starts_with_systematic():
    # k0 = 2R skips only the first two systematic columns' worth;
    # most of the start of the RV0 output is systematic bits
    k = 512
    idx = turbo_rm_indices(k, 100, 0)
    assert np.mean(idx < (k + 4)) > 0.9


@pytest.mark.parametrize("k,e_frac", [(104, 1.5), (512, 0.7), (1024, 1.0)])
def test_turbo_rm_decode_roundtrip(k, e_frac):
    """encode → rate match → AWGN → de-rate-match → decode == input."""
    rng = np.random.default_rng(k)
    e = int(3 * (k + 4) * e_frac) // 8 * 8
    b = 4
    bits = rng.integers(0, 2, (b, k)).astype(np.uint8)
    d = np.stack([turbo_encode_np(r) for r in bits]).astype(np.float32)
    tx = np.asarray(turbo_rate_match_tx(d, e, rv=0))
    rate = k / e
    llr_e = bpsk_llr(tx, 4.5, rng, rate=rate)
    d_llr = turbo_rate_match_rx(llr_e, k, rv=0)
    dec, post, n_it = turbo_decode(d_llr, k, max_iterations=8)
    np.testing.assert_array_equal(np.asarray(dec), bits)


def test_turbo_rm_harq_combining():
    """RV0 transmission failing alone succeeds after combining with RV2."""
    rng = np.random.default_rng(99)
    k = 512
    e = int(3 * (k + 4) * 0.45) // 8 * 8  # heavy puncturing
    bits = rng.integers(0, 2, (2, k)).astype(np.uint8)
    d = np.stack([turbo_encode_np(r) for r in bits]).astype(np.float32)
    ebn0 = 0.0
    tx0 = np.asarray(turbo_rate_match_tx(d, e, rv=0))
    llr0 = bpsk_llr(tx0, ebn0, rng, rate=k / e)
    soft = turbo_rate_match_rx(llr0, k, rv=0)
    dec0, _, _ = turbo_decode(np.asarray(soft), k, max_iterations=6)
    tx2 = np.asarray(turbo_rate_match_tx(d, e, rv=2))
    llr2 = bpsk_llr(tx2, ebn0, rng, rate=k / e)
    soft2 = turbo_rate_match_rx(llr2, k, rv=2, softbuffer=soft)
    dec2, _, _ = turbo_decode(np.asarray(soft2), k, max_iterations=6)
    err0 = np.mean(np.asarray(dec0) != bits)
    err2 = np.mean(np.asarray(dec2) != bits)
    assert err2 == 0.0
    assert err0 > 0.0  # first transmission alone was not decodable