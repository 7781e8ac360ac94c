import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.chest.chest_ul import chest_ul
from srsran_tpu.phy.chest.refsignal_ul import base_sequence, pusch_dmrs
from srsran_tpu.phy.dft_precoding import dft_precode, dft_predecode, valid_nof_prb
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf, ofdm_tx_sf
from srsran_tpu.phy.phch.pusch import (
    UlGrant,
    _interleaver_indices,
    pusch_decode,
    pusch_encode_np,
)


def test_valid_prb():
    assert valid_nof_prb(1) and valid_nof_prb(50) and valid_nof_prb(96)
    assert not valid_nof_prb(7) and not valid_nof_prb(11)


def test_dft_precode_roundtrip():
    rng = np.random.default_rng(0)
    for m in (12, 36, 300):
        x = (rng.standard_normal((4, m)) + 1j * rng.standard_normal((4, m))).astype(np.complex64)
        y = np.asarray(dft_precode(x))
        np.testing.assert_allclose(np.mean(np.abs(y) ** 2), np.mean(np.abs(x) ** 2), rtol=1e-3)
        back = np.asarray(dft_predecode(y))
        np.testing.assert_allclose(back, x, atol=1e-4)


def test_base_sequence_cazac():
    for m in (12, 24, 36, 144):
        for u in (0, 7, 29):
            r = base_sequence(u, m)
            np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-6)


def test_interleaver_is_permutation():
    idx = _interleaver_indices(12 * 12 * 2, 2)
    assert sorted(idx.tolist()) == list(range(len(idx)))
    # time-first: first C_mux*Qm outputs are the first Qm bits of each column
    idx2 = _interleaver_indices(240, 2, c_mux=12)
    assert idx2[0] == 0 and idx2[1] == 1
    assert idx2[2] == 24  # next row (R'=10): second row's first group


def test_pusch_e2e_flat():
    cell = Cell(nof_prb=25, nof_ports=1, id=42)
    grant = UlGrant(prb_start=5, nof_prb=12, mod=Mod.QAM16, tbs=4392, rnti=0x55)
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grid = pusch_encode_np(cell, 4, grant, tb)
    tx_cfg = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=0.5)
    rx_cfg = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    tx = np.asarray(ofdm_tx_sf(tx_cfg, grid))
    h = np.complex64(0.8 * np.exp(1j * 1.1))
    rx = tx * h
    rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.01
    rx_grid = np.asarray(ofdm_rx_sf(rx_cfg, rx[None]))
    ce, noise = chest_ul(rx_grid, cell, grant.prb_start, grant.nof_prb)
    tb_hat, ok, _ = pusch_decode(
        rx_grid, np.asarray(ce), float(np.mean(np.asarray(noise))), cell, 4, grant
    )
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_pusch_e2e_selective_channel():
    """Frequency-selective channel across the allocation."""
    cell = Cell(nof_prb=25, nof_ports=1, id=3)
    grant = UlGrant(prb_start=0, nof_prb=25, mod=Mod.QPSK, tbs=2216, rnti=0x77)
    rng = np.random.default_rng(2)
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grid = pusch_encode_np(cell, 0, grant, tb)
    tx_cfg = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=0.5)
    rx_cfg = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    tx = np.asarray(ofdm_tx_sf(tx_cfg, grid))
    # 2-tap channel
    rx = 0.9 * tx + 0.3 * np.roll(tx, 5)
    rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.015
    rx_grid = np.asarray(ofdm_rx_sf(rx_cfg, rx[None]))
    ce, noise = chest_ul(rx_grid, cell, grant.prb_start, grant.nof_prb)
    tb_hat, ok, _ = pusch_decode(
        rx_grid, np.asarray(ce), float(np.mean(np.asarray(noise))), cell, 0, grant
    )
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_pusch_uci_multiplexing_roundtrip():
    """CQI + ACK + RI on PUSCH (TS 36.212 §5.2.2.6-8: RI-reserved and
    ACK-punctured channel interleaver, RM(32,O) CQI) — TB still decodes."""
    import numpy as np
    from srsran_tpu.phy.common import Cell
    from srsran_tpu.phy.chest.chest_ul import chest_ul
    from srsran_tpu.phy.enb.enb_ul import enb_ul_decode_pusch, enb_ul_fft
    from srsran_tpu.phy.modem import Mod
    from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_tx_sf
    from srsran_tpu.phy.phch.pusch import UciCfg, UlGrant, pusch_encode_np
    from srsran_tpu.phy.phch.ra import tbs_lookup

    rng = np.random.default_rng(9)
    cell = Cell(nof_prb=25, nof_ports=1, id=3)
    for mod, itbs in ((Mod.QPSK, 6), (Mod.QAM16, 14)):
        tbs = tbs_lookup(itbs, 10)
        grant = UlGrant(prb_start=3, nof_prb=10, mod=mod, tbs=tbs, rnti=0x47)
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        uci = UciCfg(cqi_bits=(1, 0, 1, 1), ack=(1,), ri=(0,))
        grid = pusch_encode_np(cell, 4, grant, tb, uci=uci)
        ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=0.5)
        smp = np.asarray(ofdm_tx_sf(ofdm, grid[None]))[0]
        smp = smp + 0.03 * (rng.standard_normal(smp.shape)
                            + 1j * rng.standard_normal(smp.shape)).astype(np.complex64)
        rx = enb_ul_fft(cell, smp[None])
        tb2, ok, _sb, _snr, uci_out = enb_ul_decode_pusch(cell, 4, rx, grant, uci=uci)
        assert bool(np.asarray(ok))
        assert np.array_equal(np.asarray(tb2), tb)
        assert uci_out["cqi_bits"] == (1, 0, 1, 1)
        assert uci_out["ack"] == (1,) and uci_out["ri"] == (0,)
