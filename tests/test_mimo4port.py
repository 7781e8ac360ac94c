"""4-port codebook spatial multiplexing (TS 36.211 Table 6.3.4.2.3-2;
reference `precoding.c:847-1177` / `layermap.c` 4-layer paths):
rank 2/3/4 over 4 antenna ports, two codewords, NxN MMSE receiver.
"""

import numpy as np
import pytest

from srsran_tpu.phy import mimo
from srsran_tpu.phy.chest.refsignal_dl import put_crs_np
from srsran_tpu.phy.chest.chest_dl import chest_dl
from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf, ofdm_tx_sf
from srsran_tpu.phy.phch.pdsch import (
    DlGrant2,
    pdsch_decode2,
    pdsch_encode2_np,
    pdsch_nof_re,
)
from srsran_tpu.phy.phch.ra import dl_tbs


def test_codebook4_unitary():
    """Every W_n^(r) has orthonormal columns (scaled): W^H W = I/r."""
    for idx in range(16):
        for r in (1, 2, 3, 4):
            w = mimo._codebook_4(idx, r)
            g = w.conj().T @ w
            np.testing.assert_allclose(g, np.eye(r) / r, atol=1e-6)


@pytest.mark.parametrize("nof_layers", [2, 4])
def test_precode_predecode_roundtrip4(nof_layers):
    rng = np.random.default_rng(5)
    m = 240
    nrx = 4
    for idx in (0, 5, 11):
        layers = (rng.standard_normal((nof_layers, m))
                  + 1j * rng.standard_normal((nof_layers, m))).astype(np.complex64)
        ports = np.asarray(mimo.precode_spatialmux4(layers, idx))  # (4, m)
        h = (rng.standard_normal((nrx, 4)) + 1j * rng.standard_normal((nrx, 4))
             ).astype(np.complex64) / 2.0
        y = np.einsum("rp,pm->rm", h, ports)
        hfull = np.broadcast_to(h[:, :, None], (nrx, 4, m)).copy()
        xh, csi = mimo.predecode_spatialmux4(y, hfull, nof_layers, idx, 1e-6)
        np.testing.assert_allclose(np.asarray(xh), layers, atol=1e-2)


def test_pdsch_4port_rank4_e2e():
    """Full PDSCH chain: 2 codewords x 2 layers each over 4 ports through
    a random 4x4 channel — the reference's 4-port TM4 configuration."""
    rng = np.random.default_rng(11)
    cell = Cell(nof_prb=15, nof_ports=4, id=55)
    sf_idx = 3
    n_re = pdsch_nof_re(cell, sf_idx, 1, tuple(range(15)))
    # per-CW G = n_re * qm * 2 layers
    tbs = dl_tbs(7, 15) * 2  # roomy rate at QPSK over 2 layers
    grant = DlGrant2(prb=tuple(range(15)), mod1=Mod.QPSK, tbs1=tbs,
                     mod2=Mod.QPSK, tbs2=tbs, pmi=3, rnti=0x61,
                     tx_scheme="spatialmux4", nof_layers=4)
    tb1 = rng.integers(0, 2, tbs).astype(np.uint8)
    tb2 = rng.integers(0, 2, tbs).astype(np.uint8)
    grid = pdsch_encode2_np(cell, sf_idx, 1, grant, tb1, tb2)
    assert grid.shape[0] == 4
    full = np.zeros((4, cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    full += grid
    put_crs_np(full, cell, sf_idx)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf(ofdm, full))  # (4, sf_len)

    # well-conditioned random 4x4 channel
    h = (rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))).astype(np.complex64)
    u, s, vh = np.linalg.svd(h)
    h = (u * np.maximum(s, 0.6 * s.max())) @ vh
    rx = np.einsum("rp,pt->rt", h, tx)
    rx = rx + 0.015 * (rng.standard_normal(rx.shape)
                       + 1j * rng.standard_normal(rx.shape))
    rx = rx.astype(np.complex64)

    rx_grid = np.asarray(ofdm_rx_sf(ofdm, rx))
    ch = chest_dl(rx_grid, cell, sf_idx, nof_ports=4)
    ce = np.asarray(ch["ce"])
    noise = float(np.mean(np.asarray(ch["noise"])))
    out = pdsch_decode2(rx_grid, ce, noise, cell, sf_idx, 1, grant)
    (d1, ok1, _), (d2, ok2, _) = out
    assert ok1 and ok2
    np.testing.assert_array_equal(np.asarray(d1), tb1)
    np.testing.assert_array_equal(np.asarray(d2), tb2)
