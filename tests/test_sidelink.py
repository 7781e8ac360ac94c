"""Sidelink sync tests incl. golden-vector detection on the reference's
ideal TM2 capture (the psss_file_test analog)."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf, ofdm_tx_sf
from srsran_tpu.phy.sync.sidelink import (
    psss_find,
    psss_seq_np,
    put_sl_sync_grid,
    ssss_detect,
    ssss_seq_np,
)
import os

VEC = os.path.join(os.path.dirname(__file__), "vectors")


def test_psss_roots_distinct():
    a, b = psss_seq_np(0), psss_seq_np(1)
    assert np.abs(np.vdot(a, b)) / 62 < 0.2
    np.testing.assert_allclose(np.abs(a), 1.0, atol=1e-5)


def test_sl_sync_selfconsistent():
    """put → OFDM → find/detect roundtrip for a high N_sl_id (root 37)."""
    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    n_sl_id = 301
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_sl_sync_grid(grid, cell, n_sl_id)
    tx = np.asarray(ofdm_tx_sf(OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=0.5), grid))
    rng = np.random.default_rng(0)
    rx = tx + (rng.standard_normal(len(tx)) + 1j * rng.standard_normal(len(tx))).astype(np.complex64) * 0.01
    root, off, metric = psss_find(rx, 6)
    assert root == 1 and metric > 8
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    sf_start = off - ofdm.symbol_starts()[1]
    assert abs(sf_start) <= 2
    g = np.asarray(ofdm_rx_sf(ofdm, rx[max(sf_start, 0) : max(sf_start, 0) + cell.sf_len]))
    k0 = cell.nof_re_per_symbol // 2 - 31
    ce = g[1, k0 : k0 + 62] * np.conj(psss_seq_np(root))
    eq = g[cell.nsymb_per_slot + 4, k0 : k0 + 62] * np.conj(ce) / (np.abs(ce) ** 2 + 1e-3)
    nid, conf = ssss_detect(jnp.asarray(eq))
    assert int(np.asarray(nid)) == n_sl_id


def test_sidelink_golden_capture():
    """The reference's ideal TM2 capture (6 PRB, SLSS id 0): PSSS root 0
    found at the exact subframe start; SSSS resolves N_sl_id = 0 over all
    336 hypotheses."""
    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_ideal_tm2_p6_c0_s1.92e6.dat"), np.complex64
    )
    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    root, off, metric = psss_find(x, 6)
    assert root == 0 and metric > 8
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    sf_start = off - ofdm.symbol_starts()[1]
    assert sf_start == 0  # capture begins at the sync subframe
    grid = np.asarray(ofdm_rx_sf(ofdm, x[: cell.sf_len]))
    k0 = cell.nof_re_per_symbol // 2 - 31
    ce = grid[1, k0 : k0 + 62] * np.conj(psss_seq_np(root))
    eq = grid[cell.nsymb_per_slot + 4, k0 : k0 + 62] * np.conj(ce) / (np.abs(ce) ** 2 + 1e-3)
    nid, conf = ssss_detect(jnp.asarray(eq))
    assert int(np.asarray(nid)) == 0


def test_sidelink_golden_capture_25prb():
    """The 25-PRB ideal TM2 capture (SLSS id 168 → PSSS root 1) at the
    standard 7.68 Msps rate: root and the full 336-way id both resolve."""
    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_ideal_tm2_p25_c168_s7.68e6.dat"), np.complex64
    )
    cell = Cell(nof_prb=25, nof_ports=1, id=0)
    root, off, metric = psss_find(x, 25)
    assert root == 1 and metric > 10
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    sf_start = max(off - ofdm.symbol_starts()[1], 0)
    grid = np.asarray(ofdm_rx_sf(ofdm, x[sf_start : sf_start + cell.sf_len]))
    k0 = cell.nof_re_per_symbol // 2 - 31
    ce = grid[1, k0 : k0 + 62] * np.conj(psss_seq_np(root))
    eq = grid[cell.nsymb_per_slot + 4, k0 : k0 + 62] * np.conj(ce) / (np.abs(ce) ** 2 + 1e-3)
    nid, conf = ssss_detect(jnp.asarray(eq))
    assert int(np.asarray(nid)) == 168


def test_psbch_selfconsistent():
    from srsran_tpu.phy.phch.psbch import MibSl, psbch_decode, put_psbch_np

    cell = Cell(nof_prb=6, nof_ports=1, id=0)
    mib = MibSl(sl_bandwidth=0, direct_frame_number=123, direct_subframe_number=5, in_coverage=True)
    rng = np.random.default_rng(0)
    for nid in (0, 1, 255):
        grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
        put_psbch_np(grid, cell, mib, nid)
        rx = grid * np.complex64(0.8 * np.exp(0.3j))
        rx += (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.02
        mib_hat, ok = psbch_decode(rx, cell, nid)
        assert ok and mib_hat == mib
    # zero-signal guard: empty grid must NOT trivially pass CRC
    empty = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    _, ok = psbch_decode(empty, cell, 0)
    assert not ok


def test_psbch_golden_captures():
    """MIB-SL decodes from BOTH reference captures with the bandwidth field
    matching the capture's PRB count — over-the-air parity for the full
    sidelink chain (SC-FDMA DFT precoding, UL interleaver, PSBCH DMRS,
    TBCC) and for the per-symbol-referenced half-subcarrier shift."""
    from srsran_tpu.phy.phch.psbch import psbch_decode

    for fn, prb, nid, bw in (
        ("signal_sidelink_ideal_tm2_p6_c0_s1.92e6.dat", 6, 0, 0),
        ("signal_sidelink_ideal_tm2_p15_c84_s3.84e6.dat", 15, 84, 1),
        ("signal_sidelink_ideal_tm2_p25_c168_s7.68e6.dat", 25, 168, 2),
        ("signal_sidelink_ideal_tm2_p50_c252_s15.36e6.dat", 50, 252, 3),
        ("signal_sidelink_ideal_tm2_p100_c335_s30.72e6.dat", 100, 335, 5),
    ):
        x = np.fromfile(os.path.join(VEC, fn), np.complex64)
        cell = Cell(nof_prb=prb, nof_ports=1, id=0)
        ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
        grid = np.asarray(ofdm_rx_sf(ofdm, x[: cell.sf_len]))
        mib, ok = psbch_decode(grid, cell, nid)
        assert ok, fn
        assert mib.sl_bandwidth == bw
        assert mib.in_coverage


def test_pscch_selfconsistent():
    from srsran_tpu.phy.phch.pscch import Sci0, pscch_decode, put_pscch_np

    cell = Cell(nof_prb=50, nof_ports=1, id=0)
    sci = Sci0(riv=1001, trp_idx=10, mcs_idx=12, n_sa_id=99)
    rng = np.random.default_rng(0)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_pscch_np(grid, cell, sci, prb_idx=7)
    rx = grid * np.complex64(0.9 * np.exp(-0.2j))
    rx += (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.01
    s_hat, ok = pscch_decode(rx, cell, 7)
    assert ok and s_hat == sci
    # no false positives on other PRBs
    assert not pscch_decode(rx, cell, 8)[1]


def test_pscch_golden_capture():
    """SCI format 0 decodes (CRC16-confirmed) from the reference's 100-PRB
    ideal TM2 capture — over-the-air parity for the PSCCH chain."""
    from srsran_tpu.phy.phch.pscch import pscch_decode

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_ideal_tm2_p100_c335_s30.72e6.dat"), np.complex64
    )
    cell = Cell(nof_prb=100, nof_ports=1, id=0)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    grid = np.asarray(ofdm_rx_sf(ofdm, x[cell.sf_len : 2 * cell.sf_len]))  # sf 1
    sci, ok = pscch_decode(grid, cell, prb_idx=0)
    assert ok
    assert sci.trp_idx == 56 and sci.n_sa_id == 255 and not sci.freq_hopping


def test_pssch_selfconsistent():
    from srsran_tpu.phy.phch.pssch import pssch_decode, put_pssch_np
    from srsran_tpu.phy.phch.ra import tbs_lookup, ul_mcs_to_itbs

    cell = Cell(nof_prb=50, nof_ports=1, id=0)
    rng = np.random.default_rng(0)
    tbs = tbs_lookup(ul_mcs_to_itbs(5), 4)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    grid = np.zeros((cell.nsymb_per_sf, cell.nof_re_per_symbol), np.complex64)
    put_pssch_np(grid, cell, tb, n_x_id=255, mcs_idx=5, prb_start=10, nof_prb=4, sf_idx=3)
    rx = grid * np.complex64(0.9 * np.exp(0.1j))
    rx += (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.01
    tb_hat, ok = pssch_decode(rx, cell, 255, 5, 10, 4, 3)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_sidelink_full_chain_golden():
    """The complete sidelink TM2 receive chain against the reference's
    100-PRB capture: SCI-0 from the PSCCH drives a CRC24A-confirmed
    PSSCH transport-block decode (SL-SCH turbo chain, group-hopped DMRS,
    N_x_id scrambling) — PSSS→SSSS→MIB-SL→SCI→data all over the air."""
    from srsran_tpu.phy.phch.pscch import pscch_decode
    from srsran_tpu.phy.phch.pssch import pssch_decode
    from srsran_tpu.phy.phch.ra import riv_decode

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_ideal_tm2_p100_c335_s30.72e6.dat"), np.complex64
    )
    cell = Cell(nof_prb=100, nof_ports=1, id=0)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    # SCI from subframe 1
    grid1 = np.asarray(ofdm_rx_sf(ofdm, x[cell.sf_len : 2 * cell.sf_len]))
    sci, ok = pscch_decode(grid1, cell, prb_idx=0)
    assert ok
    rb0, l_crb = riv_decode(100, sci.riv)
    # data in subframe 3 (first TRP-allowed PSSCH subframe, rv 0)
    grid3 = np.asarray(ofdm_rx_sf(ofdm, x[3 * cell.sf_len : 4 * cell.sf_len]))
    tb, ok = pssch_decode(grid3, cell, sci.n_sa_id, sci.mcs_idx, rb0, l_crb, sf_idx=0, rv=0)
    assert ok
    assert np.packbits(tb).tobytes() == bytes.fromhex("c8e4")


def test_psbch_tm4_cmw500_golden():
    """A REAL Rohde & Schwarz CMW500 tester capture (50 PRB V2X, SLSS id
    169, reduced 11.52 Msps rate): PSSS root resolves and the TM4
    MIB-SL-V2X decodes CRC-confirmed with sl-Bandwidth = n50 — parity
    against commercial test equipment, not just the reference's own
    generator."""
    from srsran_tpu.phy.phch.psbch import psbch_decode_tm34
    from srsran_tpu.phy.sync.sidelink import psss_find

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_cmw500_f5.92e9_s11.52e6_50prb_slss_id169.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=50, nof_ports=1, id=0, use_standard_rates=False)
    root, off, metric = psss_find(x, 50, standard_rates=False)
    assert root == 1  # SLSS id 169 -> PSSS root index 1
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    st = max(off - ofdm.symbol_starts()[1], 0)
    grid = np.asarray(ofdm_rx_sf(ofdm, x[st : st + cell.sf_len]))
    bits, ok = psbch_decode_tm34(grid, cell, 169)
    assert ok
    assert int("".join(map(str, bits[:3])), 2) == 3  # sl-Bandwidth = n50


def test_tm4_uxm_tester_full_chain():
    """A REAL Keysight UXM tester capture (V2X TM4, 50 PRB, 10 subchannels
    of 5): SCI format 1 decodes in both subframes (mcs_idx = 12, matching
    the reference test's expected 'mcs=12'), and the SCI's CRC-derived
    N_x_id + resource allocation drive CRC24A-confirmed 1608-bit PSSCH
    transport blocks — the complete V2X receive chain against commercial
    test equipment."""
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34
    from srsran_tpu.phy.phch.pssch import pssch_decode_tm34
    from srsran_tpu.phy.phch.ra import riv_decode

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_uxm_s15.36e6_50prb_0prb_offset_mcs12.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=50, nof_ports=1, id=0)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    n_tb = 0
    for sf in range(2):
        grid = np.asarray(ofdm_rx_sf(ofdm, x[sf * cell.sf_len : (sf + 1) * cell.sf_len]))
        found = None
        for sub in range(10):
            for cs in (0, 3, 6, 9):
                sci, crc, ok = pscch_decode_tm34(grid, cell, sub * 5, cs, 10)
                if ok:
                    found = (sub, sci, crc)
        assert found is not None
        sub, sci, crc = found
        assert sci.mcs_idx == 12
        n_x_id = int("".join(map(str, crc)), 2)
        assert n_x_id == 23387
        l_subch, start_subch = riv_decode(10, sci.riv)[1], riv_decode(10, sci.riv)[0]
        # TS 36.213 §14.1.1.4C: pssch starts after the 2 PSCCH PRBs
        prb_start = sub * 5 + 2
        nof_prb = (l_subch + sub) * 5 - prb_start
        tb, ok = pssch_decode_tm34(grid, cell, n_x_id, sci.mcs_idx, prb_start, nof_prb, sf_idx=sf, rv=0)
        assert ok and len(tb) == 1608
        n_tb += 1
    assert n_tb == 2  # the reference expects num_decoded_tb=2 on this capture


def test_tm4_qualcomm_chipset_sci():
    """A REAL Qualcomm 9150 C-V2X chipset over-the-air capture: SCI
    format 1 decodes CRC-confirmed at subchannel 2 (the '20offset' = PRB
    20 in the filename), priority 2, with retransmission signalled."""
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_qc9150_f5.92e9_s15.36e6_50prb_20offset.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=50, nof_ports=1, id=0)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    grid = np.asarray(ofdm_rx_sf(ofdm, x[: cell.sf_len]))
    hits = []
    for sub in range(5):
        for cs in (0, 3, 6, 9):
            sci, crc, ok = pscch_decode_tm34(grid, cell, sub * 10, cs, 5)
            if ok:
                hits.append((sub, sci))
    assert len(hits) == 1
    sub, sci = hits[0]
    assert sub == 2 and sci.priority == 2 and sci.mcs_idx == 6 and sci.retransmission


def test_tm4_huawei_tester_sci_with_retx():
    """A REAL Huawei tester capture (reduced 11.52 Msps rate) containing an
    initial transmission and its PHY retransmission: both SCI-1s decode at
    subchannel 1 (the '10prb_offset'), identical scheduling fields, with
    the retransmission flag flipping between them (time_gap = 3 matches
    the 3-subframe spacing in the capture)."""
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_huawei_s11.52e6_50prb_10prb_offset_with_retx.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=50, nof_ports=1, id=0, use_standard_rates=False)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    found = {}
    for sf in range(4):
        grid = np.asarray(ofdm_rx_sf(ofdm, x[sf * cell.sf_len : (sf + 1) * cell.sf_len]))
        for sub in range(5):
            for cs in (0, 3, 6, 9):
                sci, crc, ok = pscch_decode_tm34(grid, cell, sub * 10, cs, 5)
                if ok:
                    found[sf] = (sub, sci)
    assert set(found) == {0, 3}
    (sub0, sci0), (sub3, sci3) = found[0], found[3]
    assert sub0 == sub3 == 1
    assert not sci0.retransmission and sci3.retransmission
    assert sci0.time_gap == sci3.time_gap == 3  # matches the 3-sf spacing
    assert (sci0.riv, sci0.mcs_idx) == (sci3.riv, sci3.mcs_idx)


def test_tm4_uxm_100prb_four_subframes():
    """The 100-PRB Keysight UXM capture (reduced 23.04 Msps rate): SCI-1
    decodes in all FOUR subframes (the reference expects
    num_decoded_sci=4) and each drives a CRC24A-confirmed 9528-bit
    multi-codeblock PSSCH transport block (48-PRB allocation from
    riv=40)."""
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34
    from srsran_tpu.phy.phch.pssch import pssch_decode_tm34

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_uxm_s23.04e6_100prb_1prb_offset_mcs12_padding.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=100, nof_ports=1, id=0, use_standard_rates=False)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    n_sci = n_tb = 0
    for sf in range(4):
        grid = np.asarray(ofdm_rx_sf(ofdm, x[sf * cell.sf_len : (sf + 1) * cell.sf_len]))
        sci_found = None
        for cs in (0, 3, 6, 9):
            sci, crc, ok = pscch_decode_tm34(grid, cell, 0, cs, 10)
            if ok:
                sci_found = (sci, int("".join(map(str, crc)), 2))
        assert sci_found is not None
        sci, n_x_id = sci_found
        assert sci.mcs_idx == 12 and sci.riv == 40 and n_x_id == 28300
        n_sci += 1
        tb, ok = pssch_decode_tm34(grid, cell, n_x_id, 12, 2, 48, sf_idx=sf, rv=0)
        assert ok and len(tb) == 9528
        n_tb += 1
    assert n_sci == 4 and n_tb == 4


def test_tm4_uxm_its_capture():
    """The 100-PRB UXM ITS capture at the standard 30.72 Msps rate:
    SCI-1 + a 9528-bit PSSCH TB decode with sf_idx = 6 — matching the
    reference test's '-m 6' subframe offset."""
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34
    from srsran_tpu.phy.phch.pssch import pssch_decode_tm34

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_uxm_s30.72e6_100prb_1prb_offset_mcs12_its.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=100, nof_ports=1, id=0)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    grid = np.asarray(ofdm_rx_sf(ofdm, x[: cell.sf_len]))
    hit = None
    for cs in (0, 3, 6, 9):
        sci, crc, ok = pscch_decode_tm34(grid, cell, 0, cs, 10)
        if ok:
            hit = (sci, int("".join(map(str, crc)), 2))
    assert hit is not None
    sci, n_x_id = hit
    assert sci.mcs_idx == 12
    tb, ok = pssch_decode_tm34(grid, cell, n_x_id, 12, 2, 48, sf_idx=6, rv=0)
    assert ok and len(tb) == 9528


def test_psbch_extended_cp_golden():
    """The reference's extended-CP TM2 vector (psbch_file_test -e): the
    tm12_ext symbol map (DMRS at l=2/8, 5 data symbols of a 6-symbol
    rate-match budget) decodes MIB-SL with sl-Bandwidth = n50."""
    from srsran_tpu.phy.common import CP
    from srsran_tpu.phy.phch.psbch import psbch_decode

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_ideal_tm2_p50_c252_s15.36e6_ext.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=50, nof_ports=1, id=0, cp=CP.EXT)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    grid = np.asarray(ofdm_rx_sf(ofdm, x[: cell.sf_len]))
    mib, ok = psbch_decode(grid, cell, 252)
    assert ok
    assert mib.sl_bandwidth == 3  # n50


def test_tm4_cmw500_1ms_sci():
    """The CMW500 1ms V2X capture (pssch_pscch_file_test -o 20): SCI-1
    decodes CRC-confirmed at subchannel 0 after the 20-sample offset."""
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_cmw500_f5.92e9_s11.52e6_50prb_0offset_1ms.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=50, nof_ports=1, id=0, use_standard_rates=False)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    x = np.pad(x[20:], (0, 20))  # reference applies a 20-sample file offset
    grid = np.asarray(ofdm_rx_sf(ofdm, x[: cell.sf_len]))
    hits = []
    for sub in range(5):
        for cs in (0, 3, 6, 9):
            sci, crc, ok = pscch_decode_tm34(grid, cell, sub * 10, cs, 5)
            if ok:
                hits.append((sub, sci))
    assert len(hits) == 1
    sub, sci = hits[0]
    assert sub == 0 and sci.mcs_idx == 5


def test_tm4_uxm_mcs28_five_subframes():
    """The UXM mcs-28 'padding' capture (pssch_pscch_file_test -m 1):
    SCI-1 with mcs_idx = 28 decodes in ALL FIVE subframes, and each drives
    a CRC24A-confirmed 14688-bit 64QAM transport block on the
    DFT-valid-reduced 20-PRB allocation (23 → 20,
    srslte_dft_precoding_get_valid_prb) at rv = 2."""
    from srsran_tpu.phy.dft_precoding import valid_nof_prb
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34
    from srsran_tpu.phy.phch.pssch import pssch_decode_tm34
    from srsran_tpu.phy.phch.ra import riv_decode

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_uxm_s15.36e6_50prb_0prb_offset_mcs28_padding_5ms.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=50, nof_ports=1, id=0)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    n_tb = 0
    for f in range(5):
        grid = np.asarray(ofdm_rx_sf(ofdm, x[f * cell.sf_len : (f + 1) * cell.sf_len]))
        found = None
        for cs in (0, 3, 6, 9):
            sci, crc, ok = pscch_decode_tm34(grid, cell, 0, cs, 10)
            if ok:
                found = (sci, crc)
        assert found is not None
        sci, crc = found
        assert sci.mcs_idx == 28
        n_x_id = int("".join(map(str, crc)), 2)
        start_subch, l_subch = riv_decode(10, sci.riv)
        prb_start = 2  # after the 2 PSCCH PRBs of subchannel 0
        nof_prb = l_subch * 5 - prb_start
        while not valid_nof_prb(nof_prb):
            nof_prb -= 1
        assert nof_prb == 20
        # -m 1: the file starts at LTE subframe 1; V2X blind-retx RV cycle
        tb, ok = pssch_decode_tm34(grid, cell, n_x_id, 28, prb_start, nof_prb, sf_idx=f + 1, rv=2)
        assert ok and len(tb) == 14688
        n_tb += 1
    assert n_tb == 5


def test_tm4_ideal_p100_sci():
    """The reference's ideal TM4 100-PRB vector (pssch_pscch_file_test
    -s 10 -n 10 -m 6; pass criterion there: num_decoded_sci > 0): SCI-1
    decodes CRC-confirmed in the occupied subframe with a full 10-subchannel
    allocation RIV."""
    from srsran_tpu.phy.phch.pscch import pscch_decode_tm34
    from srsran_tpu.phy.phch.ra import riv_decode

    x = np.fromfile(
        os.path.join(VEC, "signal_sidelink_ideal_tm4_p100_c335_size10_num10_cshift0_s30.72e6.dat"),
        np.complex64,
    )
    cell = Cell(nof_prb=100, nof_ports=1, id=0)
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)
    hits = []
    for f in range(len(x) // cell.sf_len):
        grid = np.asarray(ofdm_rx_sf(ofdm, x[f * cell.sf_len : (f + 1) * cell.sf_len]))
        for sub in range(10):
            for cs in (0, 3, 6, 9):
                sci, crc, ok = pscch_decode_tm34(grid, cell, sub * 10, cs, 10)
                if ok:
                    hits.append((f, sub, sci))
    assert len(hits) >= 1  # the reference's own pass bar
    f, sub, sci = hits[0]
    assert sub == 0 and sci.mcs_idx == 4
    start, l_subch = riv_decode(10, sci.riv)
    assert (start, l_subch) == (0, 10)  # full-band allocation
