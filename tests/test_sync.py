import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_tx_sf
from srsran_tpu.phy.sync.pss import (
    pss_cfo_estimate,
    pss_correlate,
    pss_find,
    pss_freq_np,
    pss_time_np,
    put_pss_grid,
)
from srsran_tpu.phy.sync.sss import put_sss_grid, sss_detect, sss_sequence_np


def test_pss_freq_properties():
    for i in range(3):
        d = pss_freq_np(i)
        assert d.shape == (62,)
        np.testing.assert_allclose(np.abs(d), 1.0, rtol=1e-6)
    # roots are distinct sequences
    assert not np.allclose(pss_freq_np(0), pss_freq_np(1))


def make_sf_with_sync(cell, n_id_2, n_id_1, sf_idx, cfo=0.0, noise=0.0, seed=0):
    """Subframe with PSS (slot0 last symbol) + SSS (second-to-last)."""
    rng = np.random.default_rng(seed)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_pss_grid(grid, n_id_2, cell.nof_prb, cell.nsymb_per_slot - 1)
    put_sss_grid(grid, n_id_1, n_id_2, sf_idx, cell.nof_prb, cell.nsymb_per_slot - 2)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf(ofdm, grid))
    if cfo:
        n = np.arange(len(tx))
        tx = tx * np.exp(2j * np.pi * cfo * n / cell.symbol_sz)
    if noise:
        tx = tx + (rng.standard_normal(tx.shape) + 1j * rng.standard_normal(tx.shape)).astype(np.complex64) * noise
    return tx.astype(np.complex64)


@pytest.mark.parametrize("n_id_2", [0, 1, 2])
def test_pss_detection_offset(n_id_2):
    cell = Cell(nof_prb=6, nof_ports=1, id=n_id_2)
    tx = make_sf_with_sync(cell, n_id_2, 0, 0, noise=0.02)
    nid2_hat, offset, peak, avg = [np.asarray(v) for v in pss_find(tx)]
    assert int(nid2_hat) == n_id_2
    # PSS symbol = slot0 symbol 6; starts at its post-CP position
    expected = cell.symbol_starts()[6] if hasattr(cell, "symbol_starts") else None
    ofdm = OfdmConfig.from_cell(cell)
    expected = ofdm.symbol_starts()[6]
    assert abs(int(offset) - expected) <= 1
    assert float(peak) / float(avg) > 10


def test_pss_detection_in_long_window():
    """Find PSS inside a 2-subframe window at an arbitrary placement."""
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    tx = make_sf_with_sync(cell, 1, 55, 0, noise=0.05)
    pad_front = 777
    window = np.concatenate(
        [np.zeros(pad_front, np.complex64), tx, np.zeros(1000, np.complex64)]
    )
    nid2_hat, offset, peak, avg = [np.asarray(v) for v in pss_find(window)]
    ofdm = OfdmConfig.from_cell(cell)
    assert int(nid2_hat) == 1
    assert abs(int(offset) - (pad_front + ofdm.symbol_starts()[6])) <= 1


def test_pss_cfo_estimate():
    cell = Cell(nof_prb=6, nof_ports=1, id=2)
    true_cfo = 0.31
    tx = make_sf_with_sync(cell, 2, 0, 0, cfo=true_cfo)
    ofdm = OfdmConfig.from_cell(cell)
    start = ofdm.symbol_starts()[6]
    sym = tx[start : start + 128]
    cfo_hat = float(np.asarray(pss_cfo_estimate(sym, 2)))
    assert abs(cfo_hat - true_cfo) < 0.03


def test_sss_sequences_distinct():
    s1 = sss_sequence_np(0, 0, 0)
    s2 = sss_sequence_np(1, 0, 0)
    s3 = sss_sequence_np(0, 0, 5)
    assert not np.array_equal(s1, s2)
    assert not np.array_equal(s1, s3)
    np.testing.assert_array_equal(np.abs(s1), np.ones(62))


@pytest.mark.parametrize("n_id_1,sf", [(0, 0), (167, 0), (55, 5), (301 // 3, 5)])
def test_sss_detection(n_id_1, sf):
    cell = Cell(nof_prb=6, nof_ports=1, id=3 * n_id_1 + 1)
    n_id_2 = 1
    tx = make_sf_with_sync(cell, n_id_2, n_id_1, sf, noise=0.03, seed=sf)
    # demodulate and extract the SSS symbol's central 62 REs
    from srsran_tpu.phy.ofdm import ofdm_rx_sf

    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    grid = np.asarray(ofdm_rx_sf(ofdm, tx))
    nre = cell.nof_re_per_symbol
    k0 = nre // 2 - 31
    sss_re = grid[cell.nsymb_per_slot - 2, k0 : k0 + 62]
    nid1_hat, sf_is_5, metric = [np.asarray(v) for v in sss_detect(sss_re, n_id_2)]
    assert int(nid1_hat) == n_id_1
    assert bool(sf_is_5) == (sf == 5)


def test_sss_detection_with_channel():
    """SSS under a phase-rotating channel, compensated by PSS-derived CE."""
    cell = Cell(nof_prb=6, nof_ports=1, id=3 * 100 + 2)
    n_id_2, n_id_1 = 2, 100
    tx = make_sf_with_sync(cell, n_id_2, n_id_1, 0, noise=0.02)
    h = np.complex64(0.8 * np.exp(1j * 2.2))
    from srsran_tpu.phy.ofdm import ofdm_rx_sf

    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    grid = np.asarray(ofdm_rx_sf(ofdm, tx * h))
    nre = cell.nof_re_per_symbol
    k0 = nre // 2 - 31
    sss_re = grid[cell.nsymb_per_slot - 2, k0 : k0 + 62]
    # CE from PSS symbol
    pss_re = grid[cell.nsymb_per_slot - 1, k0 : k0 + 62]
    from srsran_tpu.phy.sync.pss import pss_freq_np

    ce = pss_re * np.conj(pss_freq_np(n_id_2))
    nid1_hat, sf_is_5, _ = [np.asarray(v) for v in sss_detect(sss_re, n_id_2, ce=ce)]
    assert int(nid1_hat) == n_id_1 and not bool(sf_is_5)

def test_cfo_estimate_cp():
    from srsran_tpu.phy.sync.cfo import cfo_apply, cfo_estimate_cp
    import numpy as np

    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    rng = np.random.default_rng(0)
    grid = (rng.standard_normal((14, 72)) + 1j * rng.standard_normal((14, 72))).astype(np.complex64)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf(ofdm, grid))
    true_cfo = -0.23
    rx = np.asarray(cfo_apply(tx, -true_cfo, cell.symbol_sz))  # apply +cfo
    est = float(np.asarray(cfo_estimate_cp(rx, cell)))
    assert abs(est - true_cfo) < 0.02, est
    # correction restores the signal
    corr = np.asarray(cfo_apply(rx, est, cell.symbol_sz))
    np.testing.assert_allclose(corr, tx, atol=0.15)


def test_sfo_estimate():
    from srsran_tpu.phy.sync.cfo import sfo_estimate
    import numpy as np

    offs = np.array([0.0, 1.5, 3.1, 4.4, 6.2])  # ~1.55 samples / period
    sfo = float(np.asarray(sfo_estimate(offs, period_s=0.005)))
    assert abs(sfo - 1.55 / 0.005) < 40


def test_cp_detection():
    """Normal vs extended CP detection from guard-interval correlation
    (sync.c CP detect analog)."""
    from srsran_tpu.phy.common import CP
    from srsran_tpu.phy.sync.cfo import cp_detect

    rng = np.random.default_rng(3)
    for cp, expect_ext in ((CP.NORM, False), (CP.EXT, True)):
        cell = Cell(nof_prb=6, nof_ports=1, id=1, cp=cp)
        grid = (rng.standard_normal((cell.nsymb_per_sf, 72)) + 1j * rng.standard_normal((cell.nsymb_per_sf, 72))).astype(np.complex64)
        ofdm = OfdmConfig.from_cell(cell, normalize=True)
        tx = np.asarray(ofdm_tx_sf(ofdm, grid))
        tx = tx + (rng.standard_normal(len(tx)) + 1j * rng.standard_normal(len(tx))).astype(np.complex64) * 0.05
        is_ext, m_n, m_e = cp_detect(tx, cell.symbol_sz)
        assert is_ext == expect_ext, (cp, m_n, m_e)


def test_refsignal_dl_sync_validates_and_rejects():
    """CRS-based fine sync (refsignal_dl_sync.c): the detected cell's
    CRS replica correlates at the true frame boundary with an accurate
    CFO estimate; a WRONG PCI hypothesis is rejected by the false-alarm
    gates (decorrelated CRS)."""
    import numpy as np
    from srsran_tpu.phy.chest.refsignal_dl import put_crs_np
    from srsran_tpu.phy.common import Cell
    from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_tx_sf
    from srsran_tpu.phy.sync.pss import put_pss_grid
    from srsran_tpu.phy.sync.refsignal_dl_sync import refsignal_dl_sync_run
    from srsran_tpu.phy.sync.sss import put_sss_grid

    rng = np.random.default_rng(5)
    cell = Cell(nof_prb=6, nof_ports=1, id=123)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    sync_sym = cell.nsymb_per_slot - 1
    frame = []
    for sf in range(10):
        grid = np.zeros((1, cell.nsymb_per_sf, cell.nof_re_per_symbol),
                        np.complex64)
        put_crs_np(grid, cell, sf)
        if sf in (0, 5):
            put_pss_grid(grid[0], cell.n_id_2, cell.nof_prb, sync_sym)
            put_sss_grid(grid[0], cell.n_id_1, cell.n_id_2, sf,
                         cell.nof_prb, sync_sym - 1)
        frame.append(np.asarray(ofdm_tx_sf(ofdm, grid))[0])
    tx = np.concatenate(frame * 2)

    off = 1501
    cfo_true = 250.0  # Hz
    n = np.arange(len(tx))
    rx = tx * np.exp(2j * np.pi * cfo_true * n / cell.srate)
    rx = np.concatenate([np.zeros(off, np.complex64), rx])
    rx = (rx + 0.05 * (rng.standard_normal(len(rx))
                       + 1j * rng.standard_normal(len(rx)))
          ).astype(np.complex64)

    res = refsignal_dl_sync_run(rx, cell)
    assert res.found and not res.false_alarm
    assert res.peak_index % (10 * cell.sf_len) == off
    assert abs(res.cfo_hz - cfo_true) < 40.0

    # wrong-PCI hypothesis must NOT validate
    bad = Cell(nof_prb=6, nof_ports=1, id=124)
    res_bad = refsignal_dl_sync_run(rx, bad)
    assert not res_bad.found
