"""NB-IoT sync signal tests (npss.c / nsss.c unit-test analog)."""

import numpy as np

from srsran_tpu.phy.sync.nbiot import (
    npss_correlate,
    nsss_detect,
    nsss_sequence_np,
    put_npss_grid,
    put_nsss_grid,
)


def test_npss_detects_correct_subframe():
    rng = np.random.default_rng(0)
    sfs = (rng.standard_normal((10, 14, 12)) + 1j * rng.standard_normal((10, 14, 12))).astype(
        np.complex64
    ) * 0.3
    put_npss_grid(sfs[5])
    metric, best = npss_correlate(sfs)
    m = np.asarray(metric)
    assert int(np.asarray(best)) == 5
    assert m[5] > 3 * np.max(np.delete(m, 5))


def test_nsss_sequences_distinct():
    a = nsss_sequence_np(0, 0)
    b = nsss_sequence_np(1, 0)
    c = nsss_sequence_np(0, 1)
    assert np.abs(np.vdot(a, b)) / 132 < 0.3
    assert np.abs(np.vdot(a, c)) / 132 < 0.3
    np.testing.assert_allclose(np.abs(a), 1.0, atol=1e-5)


def test_nsss_detection_all_hypotheses():
    rng = np.random.default_rng(1)
    for nid, f4 in ((0, 0), (257, 2), (503, 3), (126, 1)):
        grid = np.zeros((14, 12), np.complex64)
        put_nsss_grid(grid, nid, f4)
        h = np.complex64(0.8 * np.exp(0.7j))
        rx = grid * h
        rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.05
        nid_hat, f4_hat, conf = nsss_detect(rx)
        assert int(np.asarray(nid_hat)) == nid
        assert int(np.asarray(f4_hat)) == f4
        assert float(np.asarray(conf)) > 0.5
