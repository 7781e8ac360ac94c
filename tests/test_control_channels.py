import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.phch.pcfich import (
    cfi_codeword,
    pcfich_decode,
    pcfich_put_np,
    pcfich_re_indices,
)
from srsran_tpu.phy.phch.phich import (
    nof_phich_groups,
    phich_decode,
    phich_put_np,
    phich_re_indices,
    phich_sequence,
)
from srsran_tpu.phy.phch.uci import rm_decode, rm_encode


def test_cfi_codewords():
    cw1, cw2, cw3 = (cfi_codeword(c) for c in (1, 2, 3))
    np.testing.assert_array_equal(cw1[:6], [0, 1, 1, 0, 1, 1])
    np.testing.assert_array_equal(cw2[:6], [1, 0, 1, 1, 0, 1])
    np.testing.assert_array_equal(cw3[:6], [1, 1, 0, 1, 1, 0])
    # pairwise distance 21+ of 32
    assert np.sum(cw1 != cw2) >= 20


@pytest.mark.parametrize("cfi", [1, 2, 3])
def test_pcfich_roundtrip(cfi):
    cell = Cell(nof_prb=25, nof_ports=1, id=123)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    pcfich_put_np(grid, cell, 4, cfi)
    rng = np.random.default_rng(cfi)
    sym = grid[0, pcfich_re_indices(cell)]
    sym = sym + (rng.standard_normal(16) + 1j * rng.standard_normal(16)).astype(np.complex64) * 0.1
    cfi_hat, corr = pcfich_decode(sym, cell, 4)
    assert int(cfi_hat) == cfi


def test_pcfich_positions_avoid_crs():
    cell = Cell(nof_prb=6, nof_ports=2, id=7)
    idx = pcfich_re_indices(cell)
    assert len(idx) == 16
    assert all(k % 3 != (7 % 6) % 3 for k in idx)


def test_phich_sequences_orthogonal():
    for i in range(8):
        for j in range(8):
            w1, w2 = phich_sequence(i), phich_sequence(j)
            ip = np.vdot(w1, w2)
            if i == j:
                assert abs(ip) > 3.9
            elif (i % 4) != (j % 4):
                assert abs(ip) < 1e-6


@pytest.mark.parametrize("ack", [0, 1])
def test_phich_roundtrip_multiplexed(ack):
    """Two UEs' ACKs multiplexed on the same group with different covers."""
    cell = Cell(nof_prb=25, nof_ports=1, id=9)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    phich_put_np(grid, cell, 2, group=0, n_seq=0, ack=ack)
    phich_put_np(grid, cell, 2, group=0, n_seq=1, ack=1 - ack)
    rng = np.random.default_rng(ack)
    sym = grid[0, phich_re_indices(cell, 0)]
    sym = sym + (rng.standard_normal(12) + 1j * rng.standard_normal(12)).astype(np.complex64) * 0.05
    a0, m0 = phich_decode(sym, cell, 2, 0)
    a1, m1 = phich_decode(sym, cell, 2, 1)
    assert int(a0) == ack and int(a1) == 1 - ack
    # group count follows the cell's Ng (phich_resources enum): the
    # default Ng=1/2 halves it vs Ng=1
    assert nof_phich_groups(cell, ng=1.0) == 4
    assert nof_phich_groups(cell) == int(np.ceil(cell.nof_prb / 16))


def test_rm32_roundtrip():
    rng = np.random.default_rng(0)
    for o in (1, 4, 11):
        bits = rng.integers(0, 2, o).astype(np.uint8)
        for e in (20, 32, 64):
            cw = rm_encode(bits, e)
            llr = (2.0 * cw.astype(np.float32) - 1.0) * 4
            llr += rng.standard_normal(e).astype(np.float32) * 0.5
            hat, metric = rm_decode(llr, o)
            np.testing.assert_array_equal(np.asarray(hat), bits)
            assert float(metric) > 0.5


def test_rm20_roundtrip():
    from srsran_tpu.phy.phch.uci_data import RM20_BASIS

    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 5).astype(np.uint8)
    cw = rm_encode(bits, 20, RM20_BASIS)
    llr = (2.0 * cw.astype(np.float32) - 1.0) * 4
    hat, _ = rm_decode(llr, 5, use20=True)
    np.testing.assert_array_equal(np.asarray(hat), bits)
