import jax.numpy as jnp
import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.phch.pucch import (
    PucchConfig,
    pucch_format1_decode,
    pucch_format1_encode_np,
    pucch_format2_decode,
    pucch_format2_encode_np,
    pucch_prb,
)


def chan(grid, h, noise, rng):
    out = grid * h
    out = out + (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * noise
    return out.astype(np.complex64)


def test_pucch_prb_hopping():
    assert pucch_prb(0, 0, 50) == 0
    assert pucch_prb(0, 1, 50) == 49
    assert pucch_prb(2, 0, 50) == 1
    assert pucch_prb(3, 0, 50) == 48


@pytest.mark.parametrize("bits", [[], [1], [0, 1], [1, 1]])
def test_pucch_format1_roundtrip(bits):
    cell = Cell(nof_prb=25, nof_ports=1, id=33)
    cfg = PucchConfig(n_pucch=5)
    rng = np.random.default_rng(len(bits))
    grid = pucch_format1_encode_np(cell, cfg, 3, bits)
    rx = chan(grid, np.complex64(0.7 * np.exp(1j * 0.4)), 0.05, rng)
    hat, metric = pucch_format1_decode(rx, cell, cfg, 3, len(bits))
    np.testing.assert_array_equal(np.asarray(hat), np.asarray(bits, np.uint8))
    assert float(metric) > 0.5


def test_pucch_format1_multiplexed_users():
    """Two UEs on different n_pucch in the same PRB don't collide."""
    cell = Cell(nof_prb=25, nof_ports=1, id=33)
    rng = np.random.default_rng(0)
    a = pucch_format1_encode_np(cell, PucchConfig(n_pucch=0), 2, [1])
    b = pucch_format1_encode_np(cell, PucchConfig(n_pucch=1), 2, [0])
    rx = chan(a + b, np.complex64(1.0), 0.03, rng)
    bit_a, _ = pucch_format1_decode(rx, cell, PucchConfig(n_pucch=0), 2, 1)
    bit_b, _ = pucch_format1_decode(rx, cell, PucchConfig(n_pucch=1), 2, 1)
    assert int(bit_a[0]) == 1 and int(bit_b[0]) == 0


def test_pucch_format1_dtx_low_metric():
    """No transmission → low detection metric (SR absent)."""
    cell = Cell(nof_prb=25, nof_ports=1, id=33)
    rng = np.random.default_rng(1)
    noise = (rng.standard_normal((14, 12)) + 1j * rng.standard_normal((14, 12))).astype(np.complex64) * 0.3
    _, metric = pucch_format1_decode(noise, cell, PucchConfig(n_pucch=3), 0, 0)
    assert float(metric) < 0.4


@pytest.mark.parametrize("nbits", [4, 10])
def test_pucch_format2_roundtrip(nbits):
    cell = Cell(nof_prb=25, nof_ports=1, id=17)
    cfg = PucchConfig(n_pucch=7)
    rng = np.random.default_rng(nbits)
    bits = rng.integers(0, 2, nbits).astype(np.uint8)
    grid = pucch_format2_encode_np(cell, cfg, 6, bits)
    rx = chan(grid, np.complex64(0.9 * np.exp(-1j * 1.2)), 0.08, rng)
    hat, metric = pucch_format2_decode(rx, cell, cfg, 6, nbits)
    np.testing.assert_array_equal(np.asarray(hat), bits)


def test_pucch_format2ab_roundtrip():
    from srsran_tpu.phy.phch.pucch import (
        PucchConfig,
        pucch_format2ab_decode,
        pucch_format2ab_encode_np,
    )

    cell = Cell(nof_prb=6, nof_ports=1, id=13)
    cfg = PucchConfig(n_pucch=3)
    rng = np.random.default_rng(2)
    for ack in ([0], [1], [0, 1], [1, 1], [0, 0]):
        cqi = rng.integers(0, 2, 6).astype(np.uint8)
        grid = pucch_format2ab_encode_np(cell, cfg, 2, cqi, ack)
        noisy = grid + (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.05
        cqi_hat, ack_hat, _ = pucch_format2ab_decode(noisy, cell, cfg, 2, 6, len(ack))
        assert list(np.asarray(ack_hat)) == ack
        np.testing.assert_array_equal(np.asarray(cqi_hat), cqi)


@pytest.mark.parametrize("nbits", [1, 4, 11, 12, 21])
def test_pucch_format3_roundtrip(nbits):
    from srsran_tpu.phy.phch.pucch import pucch_format3_decode, pucch_format3_encode_np

    cell = Cell(id=123, nof_prb=25)
    cfg = PucchConfig(n_pucch=7)
    rng = np.random.default_rng(nbits)
    bits = rng.integers(0, 2, nbits).astype(np.uint8)
    grid = pucch_format3_encode_np(cell, cfg, 3, bits, rnti=0x4601)
    # flat channel + noise
    grid = grid * 0.7 * np.exp(1j * 0.4)
    grid = grid + (
        rng.normal(0, 0.05, grid.shape) + 1j * rng.normal(0, 0.05, grid.shape)
    ).astype(np.complex64)
    out, metric = pucch_format3_decode(jnp.asarray(grid), cell, cfg, 3, nbits, rnti=0x4601)
    assert np.array_equal(np.asarray(out), bits)
    assert float(metric) > 0.5


def test_pucch_format3_orthogonal_covers_separate_users():
    """Two UEs on the same PRB with different n_oc must not interfere."""
    from srsran_tpu.phy.phch.pucch import pucch_format3_decode, pucch_format3_encode_np

    cell = Cell(id=42, nof_prb=25)
    rng = np.random.default_rng(0)
    bits_a = rng.integers(0, 2, 8).astype(np.uint8)
    bits_b = rng.integers(0, 2, 8).astype(np.uint8)
    ga = pucch_format3_encode_np(cell, PucchConfig(n_pucch=0), 2, bits_a, rnti=100)
    gb = pucch_format3_encode_np(cell, PucchConfig(n_pucch=1), 2, bits_b, rnti=200)
    mixed = jnp.asarray(ga + gb)
    # data symbols are separated by the length-5 covers; DMRS by cyclic shift
    out_a, _ = pucch_format3_decode(mixed, cell, PucchConfig(n_pucch=0), 2, 8, rnti=100)
    out_b, _ = pucch_format3_decode(mixed, cell, PucchConfig(n_pucch=1), 2, 8, rnti=200)
    assert np.array_equal(np.asarray(out_a), bits_a)
    assert np.array_equal(np.asarray(out_b), bits_b)
