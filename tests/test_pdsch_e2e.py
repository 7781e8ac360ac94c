"""End-to-end PDSCH subframe loopback: the analog of the reference's
`lib/test/phy/phy_dl_test.c` (eNB-side generate → UE-side decode in memory).
"""

import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.chest.chest_dl import chest_dl
from srsran_tpu.phy.chest.refsignal_dl import put_crs_np
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf, ofdm_tx_sf
from srsran_tpu.phy.phch.pdsch import (
    DlGrant,
    pdsch_decode,
    pdsch_encode_np,
    pdsch_nof_re,
)
from srsran_tpu.phy.phch.sch import TbCoding, dlsch_decode, dlsch_encode_np


def awgn(rng, x, snr_db):
    p = np.mean(np.abs(x) ** 2)
    n0 = p * 10 ** (-snr_db / 10)
    n = (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape)).astype(
        np.complex64
    ) * np.sqrt(n0 / 2)
    return (x + n).astype(np.complex64), n0


def run_link(cell, sf_idx, cfi, grant, snr_db, seed=0, h=None, nrx=1):
    """TX grid → OFDM → channel → OFDM rx → chest → PDSCH decode."""
    rng = np.random.default_rng(seed)
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grid = pdsch_encode_np(cell, sf_idx, cfi, grant, tb)
    nof_ports = grid.shape[0]
    full = np.zeros((max(nof_ports, cell.nof_ports), cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    full[:nof_ports] += grid
    put_crs_np(full, cell, sf_idx)

    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf(ofdm, full))  # (nports, sf_len)

    if h is None:
        h = np.ones((nrx, full.shape[0]), np.complex64)  # flat per (rx, port)
    rx_t = np.einsum("rp,pt->rt", h, tx)
    rx_t, _ = awgn(rng, rx_t, snr_db)

    rx_grid = np.asarray(ofdm_rx_sf(ofdm, rx_t))  # (nrx, nsymb, nre)
    res = chest_dl(rx_grid, cell, sf_idx, nof_ports=full.shape[0])
    noise = float(np.mean(np.asarray(res["noise"])))
    tb_hat, ok, _ = pdsch_decode(
        rx_grid, np.asarray(res["ce"]), noise, cell, sf_idx, cfi, grant
    )
    return tb, tb_hat, ok


def test_dlsch_coding_roundtrip():
    rng = np.random.default_rng(1)
    for tbs, g in ((600, 1800), (6200, 12000)):
        cfg = TbCoding(tbs=tbs, g=g, qm=2)
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        cw = dlsch_encode_np(tb, cfg)
        assert cw.shape == (g,)
        llr = (2.0 * cw.astype(np.float32) - 1.0) * 8.0
        tb_hat, ok, _ = dlsch_decode(llr, cfg)
        assert ok
        np.testing.assert_array_equal(tb_hat, tb)


def test_pdsch_e2e_1p4mhz_qpsk():
    """BASELINE config 1: 1.4 MHz SISO QPSK PDSCH subframe decode."""
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    grant = DlGrant(prb=tuple(range(6)), mod=Mod.QPSK, tbs=600)
    tb, tb_hat, ok = run_link(cell, 1, 1, grant, snr_db=10.0)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_pdsch_e2e_10mhz_16qam():
    """BASELINE config 2 (reduced): 10 MHz SISO 16QAM full DL chain."""
    cell = Cell(nof_prb=50, nof_ports=1, id=301)
    n_re = pdsch_nof_re(cell, 2, 1, tuple(range(50)))
    g = n_re * 4
    tbs = 14112  # ≈ rate 0.47
    grant = DlGrant(prb=tuple(range(50)), mod=Mod.QAM16, tbs=tbs)
    tb, tb_hat, ok = run_link(cell, 2, 1, grant, snr_db=18.0)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_pdsch_e2e_txdiversity():
    """TM2: 2-port SFBC over 1 rx antenna."""
    cell = Cell(nof_prb=15, nof_ports=2, id=7)
    grant = DlGrant(prb=tuple(range(15)), mod=Mod.QPSK, tbs=1200, tx_scheme="diversity")
    rng = np.random.default_rng(5)
    h = np.array([[0.9 + 0.3j, -0.5 + 0.7j]], np.complex64)
    tb, tb_hat, ok = run_link(cell, 3, 2, grant, snr_db=14.0, h=h)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_pdsch_e2e_spatialmux_2x2():
    """TM4-style: 2-layer spatial multiplexing, 2x2, ZF."""
    cell = Cell(nof_prb=25, nof_ports=2, id=77)
    grant = DlGrant(
        prb=tuple(range(25)),
        mod=Mod.QAM16,
        tbs=6200,
        tx_scheme="spatialmux",
        nof_layers=2,
        pmi=0,
    )
    h = np.array(
        [[1.0 + 0.1j, 0.2 - 0.3j], [-0.25 + 0.15j, 0.8 - 0.4j]], np.complex64
    )
    tb, tb_hat, ok = run_link(cell, 4, 1, grant, snr_db=25.0, h=h, nrx=2)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


@pytest.mark.parametrize("pmi", [0, 1, 2, 3])
def test_pdsch_e2e_tm6_single_layer_closed_loop(pmi):
    """TM6: single-layer closed-loop precoding over 2 ports (DCI 1B's
    PHY; reference precoding.c codebook nof_layers=1 path), all 4 PMIs."""
    cell = Cell(nof_prb=25, nof_ports=2, id=77)
    grant = DlGrant(
        prb=tuple(range(25)), mod=Mod.QAM16, tbs=4392,
        tx_scheme="spatialmux", nof_layers=1, pmi=pmi,
    )
    h = np.array(
        [[0.9 + 0.2j, -0.3 + 0.5j], [0.1 - 0.6j, 0.7 + 0.3j]], np.complex64
    )
    tb, tb_hat, ok = run_link(cell, 3, 1, grant, snr_db=20.0, h=h, nrx=2)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_pdsch_e2e_tm5_mu_mimo_pair():
    """TM5 (MU-MIMO): two UEs share the 2x2 channel on orthogonal PMIs
    (DCI 1D's PHY).  Each decodes its own TB with the other's layer
    present as structured interference the MMSE predecoder rejects."""
    cell = Cell(nof_prb=25, nof_ports=2, id=77)
    rng = np.random.default_rng(5)
    tbs = 2216
    # the eNB pairs MU-MIMO UEs on ORTHOGONAL codebook entries (0: [1,1],
    # 1: [1,-1]); over a near-unitary channel the co-scheduled stream
    # stays orthogonal at the receiver
    grants = [
        DlGrant(prb=tuple(range(25)), mod=Mod.QPSK, tbs=tbs,
                tx_scheme="spatialmux", nof_layers=1, pmi=0, rnti=0x41),
        DlGrant(prb=tuple(range(25)), mod=Mod.QPSK, tbs=tbs,
                tx_scheme="spatialmux", nof_layers=1, pmi=1, rnti=0x42),
    ]
    tbs_bits = [rng.integers(0, 2, tbs).astype(np.uint8) for _ in grants]
    grid = np.zeros((2, cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    for g, tb in zip(grants, tbs_bits):
        pg = pdsch_encode_np(cell, 3, 1, g, tb)
        grid[: pg.shape[0]] += pg / np.sqrt(2)  # TM5 power offset -3 dB
    put_crs_np(grid, cell, 3)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf(ofdm, grid))
    th = 0.4  # unitary rotation (phase-shifted) channel
    h = (np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
         * np.exp(1j * 0.3)).astype(np.complex64)
    rx = np.einsum("rp,pt->rt", h, tx)
    rx, n0 = awgn(rng, rx, 30.0)
    rx_grid = np.asarray(ofdm_rx_sf(ofdm, rx))
    ch = chest_dl(rx_grid, cell, 3, nof_ports=2)
    ce = np.asarray(ch["ce"])
    noise = float(np.mean(np.asarray(ch["noise"])))
    for g, tb in zip(grants, tbs_bits):
        tb_hat, ok, _ = pdsch_decode(rx_grid, ce, noise, cell, 3, 1, g)
        assert ok, f"pmi {g.pmi}"
        np.testing.assert_array_equal(np.asarray(tb_hat).ravel()[: len(tb)], tb)


def test_pdsch_fails_at_low_snr_then_harq():
    """Sanity: CRC must fail at very low SNR (no false positives)."""
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    grant = DlGrant(prb=tuple(range(6)), mod=Mod.QAM64, tbs=2600)
    tb, tb_hat, ok = run_link(cell, 1, 1, grant, snr_db=-3.0)
    assert not ok


def test_pdsch_two_codeword_tm4_e2e():
    """TM4 2x2 spatial multiplexing with TWO transport blocks (DCI 2
    semantics): independent MCS per codeword, per-q scrambling,
    MMSE predecode, both CRCs pass through a random 2x2 channel."""
    from srsran_tpu.phy.modem import Mod
    from srsran_tpu.phy.phch.pdsch import DlGrant2, pdsch_decode2, pdsch_encode2_np
    from srsran_tpu.phy.phch.ra import dl_tbs

    cell = Cell(nof_prb=25, nof_ports=2, id=77)
    rng = np.random.default_rng(4)
    grant = DlGrant2(
        prb=tuple(range(25)),
        mod1=Mod.QAM16, tbs1=dl_tbs(10, 25),
        mod2=Mod.QPSK, tbs2=dl_tbs(5, 25),
        pmi=0, rnti=0x55,
    )
    tb1 = rng.integers(0, 2, grant.tbs1).astype(np.uint8)
    tb2 = rng.integers(0, 2, grant.tbs2).astype(np.uint8)
    grid = pdsch_encode2_np(cell, 3, 2, grant, tb1, tb2)  # (2, nsymb, nre)
    # 2x2 well-conditioned channel
    h = np.array([[1.0 + 0.1j, 0.3 - 0.2j], [-0.2 + 0.3j, 0.9 - 0.1j]], np.complex64)
    rx = np.einsum("rp,pln->rln", h, grid)
    rx += (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.02
    ce = np.broadcast_to(h[:, :, None, None], (2, 2) + grid.shape[1:]).astype(np.complex64)
    res = pdsch_decode2(rx, ce, 8e-4, cell, 3, 2, grant)
    (tb1h, ok1, _), (tb2h, ok2, _) = res
    assert bool(np.asarray(ok1)) and bool(np.asarray(ok2))
    np.testing.assert_array_equal(np.asarray(tb1h), tb1)
    np.testing.assert_array_equal(np.asarray(tb2h), tb2)


def test_pdsch_four_port_diversity_e2e():
    """TM2 with 4 tx ports (SFBC-FSTD) through 4 independent channels,
    4-port CRS channel estimation, TB CRC passes."""
    from srsran_tpu.phy.chest.chest_dl import chest_dl
    from srsran_tpu.phy.chest.refsignal_dl import put_crs_np
    from srsran_tpu.phy.modem import Mod
    from srsran_tpu.phy.phch.pdsch import DlGrant, pdsch_decode, pdsch_encode_np
    from srsran_tpu.phy.phch.ra import dl_tbs

    cell = Cell(nof_prb=25, nof_ports=4, id=91)
    rng = np.random.default_rng(8)
    grant = DlGrant(
        prb=tuple(range(25)), mod=Mod.QPSK, tbs=dl_tbs(4, 25),
        tx_scheme="diversity4", rnti=0x99,
    )
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grid = pdsch_encode_np(cell, 4, 2, grant, tb)  # (4, nsymb, nre)
    put_crs_np(grid, cell, 4)
    h = (rng.standard_normal(4) + 1j * rng.standard_normal(4)).astype(np.complex64)
    rx = np.einsum("p,pln->ln", h, grid)[None]  # 1 rx antenna
    rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.02
    ch = chest_dl(rx, cell, 4, nof_ports=4)
    ce = np.asarray(ch["ce"])  # (1, 4, nsymb, nre)
    # chest accuracy per port
    for p in range(4):
        assert np.abs(np.mean(ce[0, p]) - h[p]) < 0.1, p
    noise = float(np.mean(np.asarray(ch["noise"])))
    tb_hat, ok, _ = pdsch_decode(rx, ce, noise, cell, 4, 2, grant)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(tb_hat), tb)


def test_pdsch_cdd_tm3_e2e():
    """TM3 open-loop spatial multiplexing (large-delay CDD, 2 layers)
    through a well-conditioned 2x2 channel."""
    from srsran_tpu.phy.modem import Mod
    from srsran_tpu.phy.phch.pdsch import DlGrant, pdsch_decode, pdsch_encode_np
    from srsran_tpu.phy.phch.ra import dl_tbs

    cell = Cell(nof_prb=25, nof_ports=2, id=55)
    rng = np.random.default_rng(12)
    grant = DlGrant(
        prb=tuple(range(25)), mod=Mod.QPSK, tbs=dl_tbs(6, 25),
        tx_scheme="cdd", nof_layers=2, rnti=0x77,
    )
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grid = pdsch_encode_np(cell, 2, 2, grant, tb)
    h = np.array([[1.0, 0.2 + 0.3j], [-0.3j, 0.8]], np.complex64)
    rx = np.einsum("rp,pln->rln", h, grid)
    rx += (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.02
    ce = np.broadcast_to(h[:, :, None, None], (2, 2) + grid.shape[1:]).astype(np.complex64)
    tb_hat, ok, _ = pdsch_decode(rx, ce, 8e-4, cell, 2, 2, grant)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(tb_hat), tb)


def test_pdsch_256qam_e2e():
    """256QAM (the baseline's '195 Mbps w/ QAM256' configuration) at high
    SNR: full-band decode with zero bit errors."""
    from srsran_tpu.phy.modem import Mod
    from srsran_tpu.phy.phch.pdsch import DlGrant, pdsch_decode, pdsch_encode_np
    from srsran_tpu.phy.phch.ra import dl_mcs_to_mod, dl_tbs

    assert dl_mcs_to_mod(27, use_256qam=True) == Mod.QAM256
    cell = Cell(nof_prb=25, nof_ports=1, id=3)
    grant = DlGrant(
        prb=tuple(range(25)), mod=Mod.QAM256, tbs=dl_tbs(27, 25, use_256qam=True), rnti=0x11
    )
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grid = pdsch_encode_np(cell, 3, 1, grant, tb)
    rx = grid + (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.005
    ce = np.ones((1, 1) + grid.shape[1:], np.complex64)
    tb_hat, ok, _ = pdsch_decode(rx, ce, 5e-5, cell, 3, 1, grant)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(tb_hat), tb)


def test_pdsch_e2e_extended_cp():
    """Extended-CP cell (12 symbols/sf): full eNB render → UE decode chain
    (the reference's ext-CP paths through ofdm/chest/regs/pdsch)."""
    from srsran_tpu.phy.common import CP
    from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
    from srsran_tpu.phy.phch.dci import Dci1A
    from srsran_tpu.phy.phch.ra import dl_mcs_to_mod, dl_tbs, riv_encode
    from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe

    cell = Cell(nof_prb=25, nof_ports=1, id=33, cp=CP.EXT)
    rnti = 0x4601
    rng = np.random.default_rng(0)
    mcs, l = 10, 25
    tbs = dl_tbs(mcs, l)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    g = DlGrant(prb=tuple(range(l)), mod=dl_mcs_to_mod(mcs), tbs=tbs, rnti=rnti)
    d = Dci1A(riv=riv_encode(25, 0, l), mcs=mcs)
    sched = DlSched(cfi=1, dcis=[(d.pack(25), rnti, 4, 0)], grants=[(g, tb)])
    _, s = enb_dl_subframe(cell, 4, sched)
    res = ue_dl_decode_subframe(cell, s, 4, rnti, known_cfi=1)
    assert res.tbs and res.tbs[0][1]
    np.testing.assert_array_equal(np.asarray(res.tbs[0][0]).ravel()[:tbs], tb)
