import numpy as np
import pytest

from srsran_tpu.phy import common as C
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf, ofdm_tx_sf


def rand_grid(cfg, rng, batch=()):
    shape = batch + (cfg.nsymb_sf, cfg.nof_re)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


@pytest.mark.parametrize("nof_prb", [6, 25, 100])
@pytest.mark.parametrize("cp", [C.CP.NORM, C.CP.EXT])
def test_tx_rx_identity(nof_prb, cp):
    rng = np.random.default_rng(0)
    cfg = OfdmConfig(nof_prb=nof_prb, cp=cp, normalize=True)
    grid = rand_grid(cfg, rng)
    samples = np.asarray(ofdm_tx_sf(cfg, grid))
    assert samples.shape == (cfg.sf_sz,)
    back = np.asarray(ofdm_rx_sf(cfg, samples))
    np.testing.assert_allclose(back, grid, atol=2e-4)


def test_tx_rx_identity_batched():
    rng = np.random.default_rng(1)
    cfg = OfdmConfig(nof_prb=15, normalize=True)
    grid = rand_grid(cfg, rng, batch=(3, 2))
    samples = np.asarray(ofdm_tx_sf(cfg, grid))
    assert samples.shape == (3, 2, cfg.sf_sz)
    back = np.asarray(ofdm_rx_sf(cfg, samples))
    np.testing.assert_allclose(back, grid, atol=2e-4)


def test_re_mapping_single_tone():
    """RE k maps to the right FFT bin (negative half first, DC skipped)."""
    cfg = OfdmConfig(nof_prb=6, normalize=True)
    n, nre = cfg.symbol_sz, cfg.nof_re
    grid = np.zeros((cfg.nsymb_sf, nre), np.complex64)
    grid[0, 0] = 1.0  # most-negative subcarrier → bin N - nre/2
    grid[0, nre // 2] = 2.0  # first positive subcarrier → bin 1
    samples = np.asarray(ofdm_tx_sf(cfg, grid))
    # demod symbol 0 by hand
    cp0 = C.cp_len_norm(0, n)
    bins = np.fft.fft(samples[cp0 : cp0 + n]) / np.sqrt(n)
    assert abs(bins[n - nre // 2] - 1.0 / np.sqrt(n) * n / np.sqrt(n)) < 1e-3
    assert abs(bins[1] - 2.0 / np.sqrt(n) * n / np.sqrt(n)) < 1e-3
    assert abs(bins[0]) < 1e-5  # DC empty


def test_unnormalized_matches_reference_scaling():
    """normalize=False: tx is a plain unnormalized IFFT (scale N on rx FFT)."""
    rng = np.random.default_rng(2)
    cfg = OfdmConfig(nof_prb=6, normalize=False)
    grid = rand_grid(cfg, rng)
    samples = np.asarray(ofdm_tx_sf(cfg, grid))
    back = np.asarray(ofdm_rx_sf(cfg, samples))
    np.testing.assert_allclose(back, grid * cfg.symbol_sz, atol=2e-2)


def test_freq_shift_roundtrip():
    """UL half-subcarrier shift: tx +0.5 then rx -0.5 restores the grid."""
    rng = np.random.default_rng(3)
    tx_cfg = OfdmConfig(nof_prb=6, normalize=True, freq_shift_f=0.5)
    rx_cfg = OfdmConfig(nof_prb=6, normalize=True, freq_shift_f=-0.5)
    grid = rand_grid(tx_cfg, rng)
    samples = np.asarray(ofdm_tx_sf(tx_cfg, grid))
    back = np.asarray(ofdm_rx_sf(rx_cfg, samples))
    np.testing.assert_allclose(back, grid, atol=2e-4)


def test_rx_window_offset_flat_channel():
    """Advancing the DFT window into the CP is transparent (phase-compensated)."""
    rng = np.random.default_rng(4)
    cfg = OfdmConfig(nof_prb=6, normalize=True)
    rx_cfg = OfdmConfig(nof_prb=6, normalize=True, rx_window_offset=0.5)
    assert rx_cfg.window_offset_n > 0
    grid = rand_grid(cfg, rng)
    samples = np.asarray(ofdm_tx_sf(cfg, grid))
    back = np.asarray(ofdm_rx_sf(rx_cfg, samples))
    np.testing.assert_allclose(back, grid, atol=2e-3)


def test_symbol_starts():
    cfg = OfdmConfig(nof_prb=6)
    starts = cfg.symbol_starts()
    assert len(starts) == 14
    assert starts[0] == 10  # after first long CP
    assert starts[1] == 10 + 128 + 9
    assert starts[7] == cfg.slot_sz + 10
