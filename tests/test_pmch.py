"""eMBMS: MBSFN reference signals + PMCH (pmch.c / refsignal_dl.c MBSFN
unit-test analog) over an extended-CP MBSFN subframe."""

import numpy as np

from srsran_tpu.phy.common import CP, Cell
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf, ofdm_tx_sf
from srsran_tpu.phy.phch.pmch import (
    chest_mbsfn,
    mbsfn_rs_positions,
    pmch_decode,
    pmch_encode_np,
    put_mbsfn_rs_np,
)
from srsran_tpu.phy.phch.ra import dl_tbs


def test_mbsfn_rs_positions():
    cell = Cell(nof_prb=25, nof_ports=1, id=1, cp=CP.EXT)
    syms, freqs = mbsfn_rs_positions(cell)
    np.testing.assert_array_equal(syms, [2, 6, 10])
    assert freqs.shape == (3, 150)
    np.testing.assert_array_equal(freqs[0][:3], [0, 2, 4])
    np.testing.assert_array_equal(freqs[1][:3], [1, 3, 5])


def test_mbsfn_chest():
    cell = Cell(nof_prb=25, nof_ports=1, id=1, cp=CP.EXT)
    rng = np.random.default_rng(0)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_mbsfn_rs_np(grid, cell, 3, area_id=77)
    h = np.complex64(0.8 - 0.3j)
    rx = grid * h + (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.02
    ce, noise = chest_mbsfn(rx, cell, 3, 77)
    assert abs(complex(np.mean(np.asarray(ce))) - h) < 0.03
    assert float(np.asarray(noise)) < 0.01


def test_pmch_roundtrip_through_ofdm():
    """PMCH TB through the extended-CP OFDM chain with a dispersive
    channel, MBSFN-RS equalization, 16QAM, turbo decode CRC-OK."""
    cell = Cell(nof_prb=25, nof_ports=1, id=1, cp=CP.EXT)
    rng = np.random.default_rng(1)
    area_id = 5
    tbs = dl_tbs(10, 25)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    grid = pmch_encode_np(cell, 3, area_id, Mod.QAM16, tbs, tb)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf(ofdm, grid))
    # mildly dispersive channel
    k = np.arange(cell.nof_re_per_symbol)
    hfreq = (1.0 + 0.3 * np.exp(-2j * np.pi * k * 8 / cell.symbol_sz)).astype(np.complex64)
    rx_grid_clean = np.asarray(ofdm_rx_sf(ofdm, tx))
    rx = rx_grid_clean * hfreq[None, :]
    rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.01
    tb_hat, ok = pmch_decode(rx, cell, 3, area_id, Mod.QAM16, tbs)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_pmch_mixed_cp_mbsfn_subframe():
    """The real MBSFN layout (ofdm.c:429/543): 2 normal-CP control symbols +
    guard + extended-CP MBSFN region in ONE subframe.  CRS port 0 in the
    control region, PMCH in the MBSFN region; decode after the mixed-CP
    waveform roundtrip."""
    import jax.numpy as jnp

    from srsran_tpu.phy.ofdm import (
        mbsfn_guard_len,
        ofdm_rx_sf_mbsfn,
        ofdm_tx_sf_mbsfn,
    )

    cell = Cell(nof_prb=25, nof_ports=1, id=1, cp=CP.EXT)
    rng = np.random.default_rng(2)
    area_id = 9
    tbs = dl_tbs(9, 25)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    grid = pmch_encode_np(cell, 4, area_id, Mod.QAM16, tbs, tb)
    # fill the control region with noise-like QPSK (stands in for CRS/PDCCH;
    # the PMCH decoder must not look at it)
    ctrl = (rng.integers(0, 2, (2, cell.nof_re_per_symbol)) * 2 - 1).astype(np.complex64)
    grid[:2] = ctrl / np.sqrt(2)

    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf_mbsfn(ofdm, jnp.asarray(grid), 2))
    assert tx.shape == (ofdm.sf_sz,)
    # the guard between the regions must be silent
    from srsran_tpu.phy.common import cp_len_norm

    g0 = 2 * ofdm.symbol_sz + cp_len_norm(0, ofdm.symbol_sz) + cp_len_norm(1, ofdm.symbol_sz)
    glen = mbsfn_guard_len(2, ofdm.symbol_sz)
    assert np.max(np.abs(tx[g0 : g0 + glen])) == 0.0

    rx_grid = np.asarray(ofdm_rx_sf_mbsfn(ofdm, jnp.asarray(tx), 2))
    rx_grid = rx_grid + (
        rng.standard_normal(rx_grid.shape) + 1j * rng.standard_normal(rx_grid.shape)
    ).astype(np.complex64) * 0.01
    # control region survives the mixed demodulation
    assert np.max(np.abs(rx_grid[:2] - grid[:2])) < 0.1
    tb_hat, ok = pmch_decode(rx_grid, cell, 4, area_id, Mod.QAM16, tbs)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)
