import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.enb.enb_ul import (
    enb_ul_decode_pucch,
    enb_ul_decode_pusch,
    enb_ul_fft,
)
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.phch.pucch import PucchConfig
from srsran_tpu.phy.phch.pusch import UlGrant
from srsran_tpu.phy.ue.ue_ul import ue_ul_encode


def test_ul_pusch_pucch_same_subframe():
    """UE transmits PUSCH + PUCCH ACK in one subframe; eNB decodes both."""
    cell = Cell(nof_prb=25, nof_ports=1, id=7)
    grant = UlGrant(prb_start=6, nof_prb=10, mod=Mod.QPSK, tbs=1384, rnti=0x21)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    pcfg = PucchConfig(n_pucch=2)
    samples = ue_ul_encode(cell, 3, pusch=(grant, tb), pucch1=(pcfg, [1]))
    h = np.complex64(0.85 * np.exp(1j * 0.6))
    rx = samples * h
    rx = rx + (rng.standard_normal(len(rx)) + 1j * rng.standard_normal(len(rx))).astype(np.complex64) * 0.01
    grid = enb_ul_fft(cell, rx[None])
    tb_hat, ok, _, snr = enb_ul_decode_pusch(cell, 3, grid, grant)
    assert ok and np.array_equal(tb_hat, tb)
    assert snr > 15
    bits, metric = enb_ul_decode_pucch(cell, 3, grid, pcfg, "1", 1)
    assert int(np.asarray(bits)[0]) == 1
    assert float(metric) > 0.5


def test_ul_timing_advance_applied():
    cell = Cell(nof_prb=6, nof_ports=1, id=3)
    grant = UlGrant(prb_start=0, nof_prb=6, mod=Mod.QPSK, tbs=408, rnti=0x11)
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    s0 = ue_ul_encode(cell, 0, pusch=(grant, tb))
    s_ta = ue_ul_encode(cell, 0, pusch=(grant, tb), ta_samples=7)
    np.testing.assert_allclose(np.roll(s0, -7), s_ta, atol=1e-6)
