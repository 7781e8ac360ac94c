import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.chest.chest_dl import ChestDlConfig, chest_dl
from srsran_tpu.phy.chest.refsignal_dl import crs_positions, crs_sequence, put_crs_np


def test_crs_positions():
    cell = Cell(nof_prb=6, nof_ports=2, id=0)
    syms, freqs = crs_positions(cell, 0)
    np.testing.assert_array_equal(syms, [0, 4, 7, 11])
    # port 0, ref 0: v=0, vshift=0 → k = 0, 6, 12...
    np.testing.assert_array_equal(freqs[0][:3], [0, 6, 12])
    # ref 1: v=3
    np.testing.assert_array_equal(freqs[1][:3], [3, 9, 15])
    syms1, freqs1 = crs_positions(cell, 1)
    np.testing.assert_array_equal(freqs1[0][:3], [3, 9, 15])


def test_crs_vshift():
    cell = Cell(nof_prb=6, nof_ports=1, id=7)  # vshift = 1
    _, freqs = crs_positions(cell, 0)
    np.testing.assert_array_equal(freqs[0][:3], [1, 7, 13])


def test_crs_sequence_properties():
    cell = Cell(nof_prb=50, nof_ports=2, id=301)
    seq = crs_sequence(cell, 3)
    assert seq.shape == (2, 4, 100)
    np.testing.assert_allclose(np.abs(seq), np.sqrt(0.5) * np.sqrt(2), rtol=1e-6)
    # different subframes give different sequences
    seq2 = crs_sequence(cell, 4)
    assert not np.allclose(seq, seq2)


def test_chest_flat_channel():
    """Perfect flat channel h=2+1j: estimator returns it everywhere."""
    cell = Cell(nof_prb=15, nof_ports=1, id=10)
    grid = np.zeros((1, cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_crs_np(grid, cell, 0)
    h = np.complex64(2.0 + 1.0j)
    res = chest_dl(grid[0] * h, cell, 0)
    ce = np.asarray(res["ce"])
    assert ce.shape == (1, 14, 180)
    np.testing.assert_allclose(ce, np.full_like(ce, h), atol=1e-3)
    assert float(res["noise"][0]) < 1e-6
    np.testing.assert_allclose(float(res["rsrp"][0]), abs(h) ** 2, rtol=1e-3)


def test_chest_frequency_selective():
    """Linear-phase (delay) channel is tracked to a few percent MSE."""
    cell = Cell(nof_prb=25, nof_ports=1, id=3)
    nre = cell.nof_re_per_symbol
    grid = np.zeros((1, cell.nsymb_per_sf, nre), np.complex64)
    put_crs_np(grid, cell, 2)
    k = np.arange(nre)
    h = np.exp(2j * np.pi * 2.5 * k / nre).astype(np.complex64)  # 2.5-sample delay
    res = chest_dl(grid[0] * h[None, :], cell, 2)
    ce = np.asarray(res["ce"])[0]
    mse = np.mean(np.abs(ce - h[None, :]) ** 2)
    assert mse < 0.01, mse


def test_chest_noise_estimate():
    cell = Cell(nof_prb=50, nof_ports=1, id=100)
    rng = np.random.default_rng(0)
    grid = np.zeros((1, cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_crs_np(grid, cell, 5)
    sigma2 = 0.01
    noise = (rng.standard_normal(grid[0].shape) + 1j * rng.standard_normal(grid[0].shape)).astype(np.complex64) * np.sqrt(sigma2 / 2)
    res = chest_dl(grid[0] + noise, cell, 5)
    est = float(res["noise"][0])
    assert 0.5 * sigma2 < est < 2.0 * sigma2, est
    snr_db = 10 * np.log10(float(res["snr"][0]))
    assert 17 < snr_db < 23  # true SNR = 20 dB


def test_chest_two_ports():
    cell = Cell(nof_prb=6, nof_ports=2, id=0)
    grid = np.zeros((2, cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_crs_np(grid, cell, 0)
    # channel: port0 → 1.0, port1 → -1j; rx = sum of both port signals
    rx = grid[0] * 1.0 + grid[1] * (-1j)
    res = chest_dl(rx, cell, 0, nof_ports=2)
    ce = np.asarray(res["ce"])
    np.testing.assert_allclose(ce[0], np.ones_like(ce[0]), atol=2e-2)
    np.testing.assert_allclose(ce[1], np.full_like(ce[1], -1j), atol=2e-2)


def test_chest_batched():
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    grid = np.zeros((1, cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_crs_np(grid, cell, 0)
    batch = np.stack([grid[0], grid[0] * 2.0])
    res = chest_dl(batch, cell, 0)
    assert np.asarray(res["ce"]).shape == (2, 1, 14, 72)
    np.testing.assert_allclose(np.asarray(res["ce"])[1], 2 * np.asarray(res["ce"])[0], atol=1e-4)


def test_chest_wiener_beats_linear_on_selective_channel():
    """Wiener MMSE estimator tracks a dispersive channel better than
    linear interpolation at moderate SNR."""
    from srsran_tpu.phy.chest.chest_dl import ChestDlConfig

    cell = Cell(nof_prb=50, nof_ports=1, id=3)
    nre = cell.nof_re_per_symbol
    rng = np.random.default_rng(7)
    grid = np.zeros((1, cell.nsymb_per_sf, nre), np.complex64)
    put_crs_np(grid, cell, 2)
    # dispersive channel with delays approaching the CP (72 samples @ 1024)
    taps = [(0, 1.0), (25, 0.6 * np.exp(1j)), (60, 0.4 * np.exp(-2j))]
    k = np.arange(nre)
    h = sum(a * np.exp(-2j * np.pi * k * d / cell.symbol_sz) for d, a in taps)
    h = h.astype(np.complex64)
    rx = grid[0] * h[None, :]
    rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.05
    mses = {}
    for alg in ("interpolate", "wiener"):
        res = chest_dl(rx, cell, 2, ChestDlConfig(algorithm=alg))
        ce = np.asarray(res["ce"])[0]
        mses[alg] = float(np.mean(np.abs(ce - h[None, :]) ** 2))
    assert mses["wiener"] < mses["interpolate"], mses
    assert mses["wiener"] < 0.01


def test_srs_roundtrip():
    from srsran_tpu.phy.chest.srs import put_srs_np, srs_estimate

    cell = Cell(nof_prb=25, nof_ports=1, id=9)
    rng = np.random.default_rng(0)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_srs_np(grid, cell, prb_start=4, nof_prb_srs=16)
    h = np.complex64(0.7 - 0.4j)
    rx = grid * h
    rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.02
    ce, snr = srs_estimate(rx[None], cell, 4, 16)
    ce = np.asarray(ce)[0]
    np.testing.assert_allclose(np.mean(ce), h, atol=0.02)
    assert float(np.asarray(snr)[0]) > 100


def test_adaptive_wiener_tracks_measured_channel():
    """The runtime-adapted Wiener (wiener_dl.c role) learns the channel's
    own delay spread from pilots and beats both linear interpolation and
    the fixed-model Wiener once adapted."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from srsran_tpu.phy.common import Cell
    from srsran_tpu.phy.chest.chest_dl import ChestDlConfig, chest_dl
    from srsran_tpu.phy.chest.refsignal_dl import crs_positions, crs_sequence_port
    from srsran_tpu.phy.chest.wiener_dl import chest_dl_adaptive, wiener_init

    cell = Cell(nof_prb=50, nof_ports=1, id=17)
    nre = cell.nof_re_per_symbol
    rng = np.random.default_rng(5)
    # 4-tap channel, ~2.2 us delay spread (longer than the fixed model's
    # default assumption), static across the subframe
    taus = np.array([0.0, 0.018, 0.045, 0.075])  # fractions of symbol span
    gains = np.array([1.0, 0.7, 0.5, 0.3]) * np.exp(2j * np.pi * rng.random(4))
    k = np.arange(nre)
    h_true = (gains[None, :] * np.exp(-2j * np.pi * np.outer(k, taus))).sum(1)
    h_true = (h_true / np.sqrt(np.mean(np.abs(h_true) ** 2))).astype(np.complex64)

    syms, freqs = crs_positions(cell, 0)
    snr_lin = 10 ** (15 / 10)

    def make_grid(sf_idx):
        grid = np.zeros((cell.nsymb_per_sf, nre), np.complex64)
        seq = crs_sequence_port(cell, sf_idx, 0)
        for s in range(len(syms)):
            grid[syms[s], freqs[s]] = seq[s] * h_true[freqs[s]]
        grid += (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
                 ).astype(np.complex64) * np.sqrt(0.5 / snr_lin)
        return jnp.asarray(grid)

    def mse(ce):
        est = np.asarray(ce)[0]  # port 0: (nsymb, nre)
        return float(np.mean(np.abs(est - h_true[None, :]) ** 2))

    state = wiener_init()
    adaptive_mse = None
    for sf in range(8):
        res, state = chest_dl_adaptive(make_grid(sf % 10), cell, sf % 10, state)
        adaptive_mse = mse(res["ce"])

    grid9 = make_grid(9)
    lin = mse(chest_dl(grid9, cell, 9, ChestDlConfig(algorithm="interpolate"))["ce"])
    fixed = mse(chest_dl(grid9, cell, 9, ChestDlConfig(algorithm="wiener"))["ce"])
    state_before = state
    res, state = chest_dl_adaptive(grid9, cell, 9, state)
    adaptive_mse = mse(res["ce"])

    assert adaptive_mse < lin, (adaptive_mse, lin)
    assert adaptive_mse < 0.6 * fixed, (adaptive_mse, fixed)
    assert adaptive_mse < 0.03
    # jit-compatibility of the carried state (scan-style usage)
    jitted = jax.jit(lambda g, st: chest_dl_adaptive(g, cell, 9, st))
    res2, _ = jitted(grid9, state_before)
    assert np.allclose(np.asarray(res2["ce"]), np.asarray(res["ce"]), atol=1e-4)
