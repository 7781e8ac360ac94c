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


def test_nrs_roundtrip_chest():
    import jax.numpy as jnp
    from srsran_tpu.phy.phch.npbch import nrs_chest, put_nrs_np

    rng = np.random.default_rng(2)
    grid = np.zeros((14, 12), np.complex64)
    put_nrs_np(grid, n_id_ncell=257, sf_idx=0)
    h_true = np.complex64(0.7 + 0.5j)
    rx = grid * h_true + (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) * 0.02
    h, noise = nrs_chest(jnp.asarray(rx), 257, 0)
    assert abs(complex(np.asarray(h)) - h_true) < 0.05
    assert float(np.asarray(noise)) < 0.01


def test_npbch_mib_nb_roundtrip():
    """MIB-NB through NPBCH with blind block detection and NRS-based
    equalization — the npdsch_ue-style receive chain for the anchor
    carrier."""
    import jax.numpy as jnp
    from srsran_tpu.phy.phch.npbch import (
        MibNb,
        npbch_decode,
        npbch_encode_np,
        npbch_re_indices,
        nrs_chest,
        put_nrs_np,
    )

    rng = np.random.default_rng(3)
    ncell = 123
    mib = MibNb(sfn_msb=9, sib1_sched=3, sys_info_tag=17, op_mode=3)
    blocks = npbch_encode_np(mib, ncell)
    idx = npbch_re_indices(ncell)
    for blk in (0, 5, 7):
        grid = np.zeros((14, 12), np.complex64)
        grid.reshape(-1)[idx] = blocks[blk]
        put_nrs_np(grid, ncell, 0)
        h_true = np.complex64(0.9 * np.exp(-0.4j))
        rx = grid * h_true
        rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)).astype(np.complex64) * 0.03
        h, noise = nrs_chest(jnp.asarray(rx), ncell, 0)
        hc = complex(np.asarray(h))
        eq = rx.reshape(-1)[idx] * np.conj(hc) / (abs(hc) ** 2 + float(np.asarray(noise)))
        mib_hat, blk_hat, ok = npbch_decode(eq, ncell)
        assert ok and blk_hat == blk
        assert mib_hat == mib


def test_nbiot_cell_search_end_to_end():
    """NPSS -> NSSS -> MIB-NB over a simulated anchor-carrier stream."""
    import jax.numpy as jnp
    from srsran_tpu.phy.sync.nbiot import nbiot_cell_search, put_npss_grid, put_nsss_grid
    from srsran_tpu.phy.phch.npbch import (
        MibNb, npbch_decode, npbch_encode_np, npbch_re_indices, nrs_chest, put_nrs_np,
    )

    rng = np.random.default_rng(7)
    ncell, f4 = 311, 1
    mib = MibNb(sfn_msb=2, op_mode=3)
    # one radio frame: sf0 = NPBCH, sf5 = NPSS, sf9 = NSSS
    frames = np.zeros((10, 14, 12), np.complex64)
    idx = npbch_re_indices(ncell)
    frames[0].reshape(-1)[idx] = npbch_encode_np(mib, ncell)[0]
    put_nrs_np(frames[0], ncell, 0)
    put_npss_grid(frames[5])
    put_nsss_grid(frames[9], ncell, f4)
    h = np.complex64(0.8 * np.exp(0.3j))
    rx = frames * h + (rng.standard_normal(frames.shape) + 1j * rng.standard_normal(frames.shape)).astype(np.complex64) * 0.04
    res = nbiot_cell_search(jnp.asarray(rx))
    assert res is not None
    nid, sf5, f4_hat, conf = res
    assert nid == ncell and sf5 == 5 and f4_hat == f4
    # decode MIB-NB at the frame's sf 0
    hc, noise = nrs_chest(jnp.asarray(rx[sf5 - 5]), nid, 0)
    hcv = complex(np.asarray(hc))
    eq = rx[sf5 - 5].reshape(-1)[idx] * np.conj(hcv) / (abs(hcv) ** 2 + float(np.asarray(noise)))
    mib_hat, blk, ok = npbch_decode(eq, nid)
    assert ok and blk == 0 and mib_hat == mib


def test_npdsch_roundtrip_and_dci_n1():
    """NPDSCH TB over multiple subframes with DCI N1 scheduling fields."""
    import jax.numpy as jnp
    from srsran_tpu.phy.phch.npdsch import (
        NB_TBS, DciN1, npdsch_decode, npdsch_encode_np, npdsch_re_indices,
    )

    dci = DciN1(i_sf=2, i_tbs=4, i_rep=0, ndi=1)
    back = DciN1.unpack(dci.pack())
    assert back == dci

    rng = np.random.default_rng(5)
    ncell, rnti = 77, 0x46
    tbs = NB_TBS[(dci.i_tbs, dci.i_sf)]
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    sym = npdsch_encode_np(tb, ncell, rnti, dci.i_sf)
    h = np.complex64(0.9 * np.exp(0.2j))
    rx = sym * h + (rng.standard_normal(sym.shape) + 1j * rng.standard_normal(sym.shape)).astype(np.complex64) * 0.05
    eq = rx * np.conj(h) / (abs(h) ** 2)
    tb_hat, ok = npdsch_decode(jnp.asarray(eq), ncell, rnti, dci.i_sf, tbs)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_npdcch_to_npdsch_chain():
    """NPDCCH DCI N1 blind decode drives an NPDSCH decode — the NB-IoT
    anchor downlink control->data chain."""
    import jax.numpy as jnp
    from srsran_tpu.phy.phch.npdsch import (
        NB_TBS, DciN1, npdcch_blind_search, npdcch_encode_np,
        npdsch_decode, npdsch_encode_np, npdsch_re_indices,
    )

    rng = np.random.default_rng(6)
    ncell, rnti = 100, 0x123
    dci = DciN1(i_sf=1, i_tbs=2, ndi=1, delay=0)
    ctrl_sym = npdcch_encode_np(dci.pack(), rnti, ncell, sf_idx=1)
    h = np.complex64(0.85)
    rx = ctrl_sym * h + (rng.standard_normal(ctrl_sym.shape) + 1j * rng.standard_normal(ctrl_sym.shape)).astype(np.complex64) * 0.05
    eq = rx * np.conj(h) / abs(h) ** 2
    dci_hat = npdcch_blind_search(jnp.asarray(eq), rnti, ncell, 1)
    assert dci_hat == dci
    # wrong RNTI → no detection
    assert npdcch_blind_search(jnp.asarray(eq), 0x999, ncell, 1) is None
    # use the decoded grant for the data
    tbs = NB_TBS[(dci_hat.i_tbs, dci_hat.i_sf)]
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    data = npdsch_encode_np(tb, ncell, rnti, dci_hat.i_sf, sf_idx0=2)
    tb_hat, ok = npdsch_decode(jnp.asarray(data), ncell, rnti, dci_hat.i_sf, tbs, sf_idx0=2)
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_nprach_detection():
    """NPRACH single-tone hopping preambles detect at the right candidate
    through noise; absent preambles stay below threshold."""
    import jax.numpy as jnp
    from srsran_tpu.phy.phch.nprach import nprach_detect, nprach_generate_np

    rng = np.random.default_rng(4)
    for n_init in (0, 5, 11):
        p = nprach_generate_np(n_init)
        rx = p * np.complex64(0.7) + (
            rng.standard_normal(len(p)) + 1j * rng.standard_normal(len(p))
        ).astype(np.complex64) * 0.1
        metric, det, delay = nprach_detect(jnp.asarray(rx))
        m = np.asarray(metric)
        d = np.asarray(det)
        assert d[n_init], (n_init, m)
        # the true candidate has the highest metric
        assert int(np.argmax(m)) == n_init
    # pure noise: nothing detected
    noise = (rng.standard_normal(5376) + 1j * rng.standard_normal(5376)).astype(np.complex64) * 0.1
    _, det, _ = nprach_detect(jnp.asarray(noise))
    assert not np.any(np.asarray(det))


def test_nbiot_ue_facade_acquire_and_data():
    """ue_sync_nbiot/ue_dl_nbiot analog: acquire the cell from a simulated
    anchor stream, then receive an NPDCCH-scheduled NPDSCH TB."""
    import jax.numpy as jnp
    from srsran_tpu.phy.phch.npbch import MibNb, npbch_encode_np, npbch_re_indices, put_nrs_np
    from srsran_tpu.phy.phch.npdsch import NB_TBS, DciN1, npdcch_encode_np, npdsch_encode_np, npdsch_re_indices
    from srsran_tpu.phy.sync.nbiot import put_npss_grid, put_nsss_grid
    from srsran_tpu.phy.ue.ue_nbiot import nbiot_ue_acquire, nbiot_ue_rx_data

    rng = np.random.default_rng(11)
    ncell, rnti = 42, 0x85
    mib = MibNb(sfn_msb=7, op_mode=3)
    frames = np.zeros((10, 14, 12), np.complex64)
    frames[0].reshape(-1)[npbch_re_indices(ncell)] = npbch_encode_np(mib, ncell)[0]
    put_nrs_np(frames[0], ncell, 0)
    put_npss_grid(frames[5])
    put_nsss_grid(frames[9], ncell, 0)
    # NPDCCH at sf 1, NPDSCH over sf 2-3
    dci = DciN1(i_sf=1, i_tbs=4, ndi=1)
    tbs = NB_TBS[(dci.i_tbs, dci.i_sf)]
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    idx = npdsch_re_indices(ncell)
    frames[1].reshape(-1)[idx] = npdcch_encode_np(dci.pack(), rnti, ncell, 1)
    put_nrs_np(frames[1], ncell, 1)
    data = npdsch_encode_np(tb, ncell, rnti, dci.i_sf, sf_idx0=2)
    for s in range(2):
        frames[2 + s].reshape(-1)[idx] = data[s]
        put_nrs_np(frames[2 + s], ncell, 2 + s)

    h = np.complex64(0.8 * np.exp(-0.5j))
    rx = frames * h + (rng.standard_normal(frames.shape) + 1j * rng.standard_normal(frames.shape)).astype(np.complex64) * 0.03

    cell = nbiot_ue_acquire(rx)
    assert cell is not None and cell.n_id_ncell == ncell and cell.mib == mib
    dci_hat, tb_hat, ok = nbiot_ue_rx_data(rx[1], rx[2:4], cell, rnti, 1, 2)
    assert ok and dci_hat == dci
    np.testing.assert_array_equal(tb_hat, tb)


def test_nbiot_raw_sample_acquisition():
    """ue_sync_nbiot.c / ue_cell_search_nbiot.c analog: acquire from RAW
    1.92 Msps baseband — unknown timing offset, CFO, channel phase —
    via NPSS time correlation + NPSS-based CFO estimation, then NSSS +
    MIB-NB through the grid chain.  No grid oracle anywhere."""
    from srsran_tpu.phy.phch.npbch import MibNb, npbch_encode_np, npbch_re_indices, put_nrs_np
    from srsran_tpu.phy.sync.nbiot import put_npss_grid, put_nsss_grid
    from srsran_tpu.phy.ue.ue_sync_nbiot import (
        SF_LEN, nbiot_acquire_raw, nbiot_cell_search_scan, nbiot_modulate_np)

    rng = np.random.default_rng(3)
    ncell = 257
    mib = MibNb(sfn_msb=5, op_mode=2)
    frame = np.zeros((10, 14, 12), np.complex64)
    frame[0].reshape(-1)[npbch_re_indices(ncell)] = npbch_encode_np(mib, ncell)[0]
    put_nrs_np(frame[0], ncell, 0)
    put_npss_grid(frame[5])
    put_nsss_grid(frame[9], ncell, 0)
    tx = nbiot_modulate_np(np.tile(frame, (4, 1, 1)))

    # impairments: timing offset, 300 Hz CFO (0.02 subcarrier), phase, AWGN
    cfo_norm = 0.02
    n = np.arange(len(tx))
    rx = tx * np.exp(2j * np.pi * cfo_norm * n / 128) * np.exp(0.7j) * 0.8
    rx = np.concatenate([np.zeros(777, np.complex64), rx])
    rx = (rx + 0.02 * (rng.standard_normal(len(rx))
                       + 1j * rng.standard_normal(len(rx)))).astype(np.complex64)

    res = nbiot_acquire_raw(rx)
    assert res is not None, "raw acquisition failed"
    assert res.cell.n_id_ncell == ncell
    assert res.cell.mib == mib
    assert abs(res.cfo - cfo_norm) < 0.005
    assert res.timing % (10 * SF_LEN) == 777 % (10 * SF_LEN)

    # EARFCN scan: noise-only carrier rejected, real carrier found
    noise = (0.1 * (rng.standard_normal(len(rx))
                    + 1j * rng.standard_normal(len(rx)))).astype(np.complex64)
    found = nbiot_cell_search_scan({2506: noise, 2510: rx})
    assert [e for e, _ in found] == [2510]
