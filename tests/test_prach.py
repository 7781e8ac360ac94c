import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.phch.prach import (
    PrachConfig,
    prach_cp_len,
    prach_detect,
    prach_generate_np,
    prach_nfft,
)


def test_preamble_properties():
    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    cfg = PrachConfig(root_seq_index=0, zero_corr_zone=1)
    p = prach_generate_np(cell, cfg, 0)
    assert len(p) == prach_nfft(cell) + prach_cp_len(cell)
    # CP is a copy of the tail
    cp = prach_cp_len(cell)
    np.testing.assert_allclose(p[:cp], p[-cp:], atol=1e-5)


@pytest.mark.parametrize("pidx", [0, 5, 33, 63])
def test_prach_detection(pidx):
    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    cfg = PrachConfig(root_seq_index=0, zero_corr_zone=1)
    rng = np.random.default_rng(pidx)
    p = prach_generate_np(cell, cfg, pidx)
    cp = prach_cp_len(cell)
    rx = p[cp:] + (rng.standard_normal(len(p) - cp) + 1j * rng.standard_normal(len(p) - cp)).astype(np.complex64) * 0.05
    metric, delay, det = [np.asarray(v) for v in prach_detect(cell, cfg, rx)]
    assert det[pidx], metric[pidx]
    others = np.delete(np.arange(64), pidx)
    assert metric[pidx] > 3 * metric[others].max()
    assert delay[pidx] == 0


def test_prach_detection_with_delay():
    """Timing advance: detector reports the propagation delay."""
    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    cfg = PrachConfig(root_seq_index=4, zero_corr_zone=1)
    pidx = 7
    p = prach_generate_np(cell, cfg, pidx)
    cp = prach_cp_len(cell)
    d_samples = 12  # at 1.92 Msps
    rx = np.concatenate([np.zeros(d_samples, np.complex64), p[cp:]])
    metric, delay, det = [np.asarray(v) for v in prach_detect(cell, cfg, rx)]
    assert det[pidx]
    # delay is in ZC-sample units: d_zc = d_samples * 839 / nfft
    expected = round(d_samples * 839 / prach_nfft(cell))
    assert abs(int(delay[pidx]) - expected) <= 1


def test_prach_no_false_alarm():
    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    cfg = PrachConfig()
    rng = np.random.default_rng(9)
    noise = (rng.standard_normal(prach_nfft(cell)) + 1j * rng.standard_normal(prach_nfft(cell))).astype(np.complex64)
    metric, delay, det = [np.asarray(v) for v in prach_detect(cell, cfg, noise)]
    assert not det.any(), metric.max()
