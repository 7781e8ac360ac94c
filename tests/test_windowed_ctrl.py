"""Windowed control-plane engine tests (pipeline_ctrl): the batched
control path must reproduce the per-TTI host path bit-for-bit.

Reference anchors: ue_dl.c:383-450 (one FFT + blind search per
subframe), enb_dl.c control half, enb_ul.c:66-86 (shared UL FFT),
pucch.c, phich.c.
"""

import numpy as np
import pytest

from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.phch.dci import Dci0, Dci1A
from srsran_tpu.phy.phch.pdsch import DlGrant
from srsran_tpu.phy.phch.ra import dl_mcs_to_mod, dl_tbs, riv_encode
from srsran_tpu.pipeline_ctrl import (
    WindowedEnbUlFrontEnd,
    WindowedUeFrontEnd,
    enb_ctrl_overlay,
    phich_decode_np,
    pucch_format2_decode_np,
    window_blind_search,
)

W = 8
RNTI = 0x46
CELL = Cell(nof_prb=25, nof_ports=1, id=7)
CFI = 2


def _window(rng, mcs=8):
    """W host-rendered subframes, each with one 1A DL grant + one DCI0 +
    one PHICH, returns (samples (W,1,L), sfs, grants, payloads, scheds)."""
    sfs, grants, payloads, scheds, samples = [], [], [], [], []
    for t in range(W):
        sf = (t + 1) % 10
        tbs = dl_tbs(mcs, CELL.nof_prb)
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        dci = Dci1A(riv=riv_encode(CELL.nof_prb, 0, CELL.nof_prb),
                    mcs=mcs, ndi=t & 1, rv=0, harq_pid=t % 8)
        dci0 = Dci0(riv=riv_encode(CELL.nof_prb, 1, 20), mcs=5, ndi=0,
                    tpc=1)
        grant = DlGrant(prb=tuple(range(CELL.nof_prb)),
                        mod=dl_mcs_to_mod(mcs), tbs=tbs, rnti=RNTI)
        sched = DlSched(cfi=CFI, phich=[(0, 1, t & 1)])
        sched.dcis.append((dci.pack(CELL.nof_prb), RNTI, 4, 0))
        sched.dcis.append((dci0.pack(
            CELL.nof_prb, Dci1A.nof_bits(CELL.nof_prb)), RNTI, 4, 4))
        sched.grants.append((grant, tb))
        _, s = enb_dl_subframe(CELL, sf, sched)
        sfs.append(sf)
        grants.append(grant)
        payloads.append(tb)
        scheds.append(sched)
        samples.append(s[0])
    return np.stack(samples)[:, None], sfs, grants, payloads, scheds


def test_ue_frontend_blind_search_and_data():
    rng = np.random.default_rng(1)
    samples, sfs, grants, payloads, _ = _window(rng)
    fe = WindowedUeFrontEnd(CELL, cfi=CFI, w=W, ingest="float32")
    pf = fe.dispatch(samples, sfs)
    ctrl, rsrp, noise = fe.realize(pf)
    assert rsrp.shape == (W,) and np.all(rsrp > 0)

    len_1a = Dci1A.nof_bits(CELL.nof_prb)
    searches = [[(RNTI, "1A", len_1a, True)]] * W
    found = window_blind_search(ctrl, fe.layout, CELL, sfs, searches)
    for t in range(W):
        # both the DL 1A and the UL DCI0 (same payload size) must be found
        assert len(found[t]) == 2, f"TTI {t}: {found[t]}"
        flags = sorted(int(b[0]) for _, _, b, _, _ in found[t])
        assert flags == [0, 1]  # one DCI0 (flag 0) + one 1A (flag 1)
        for _, _, bits, agg, cce in found[t]:
            if bits[0] == 1:  # the 1A
                d = Dci1A.unpack(bits, CELL.nof_prb)
                assert d.mcs == 8 and cce == 0  # ACK resource anchor

    # PHICH rides the same equalized window
    for t in range(W):
        ph = ctrl[t, fe.layout.phich[0]]
        ack, _m = phich_decode_np(ph, CELL, sfs[t], 1)
        assert ack == bool(t & 1)

    # data pass from the STORED grids — no re-upload, bit-exact TBs
    p = fe.dispatch_data(pf, grants)
    res = fe.results(p)
    for (tb, ok, _n), want in zip(res, payloads):
        assert ok and np.array_equal(tb, want)


def test_windowed_enb_render_matches_host_render():
    """Device window render (template 'full' + ctrl overlay + PDSCH) vs
    the host enb_dl_subframe — same subframes to float tolerance, and a
    per-TTI UE decode of the windowed samples succeeds end-to-end."""
    from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe
    from srsran_tpu.pipeline_window import WindowedEnbDl

    rng = np.random.default_rng(2)
    host_samples, sfs, grants, payloads, scheds = _window(rng)
    gen = WindowedEnbDl(CELL, cfi=CFI, w=W, template="full")
    idx_rows, val_rows = [], []
    for t in range(W):
        idx, vals = enb_ctrl_overlay(CELL, CFI, sfs[t], scheds[t])
        idx_rows.append(idx)
        val_rows.append(vals)
    out = gen.dispatch_window(payloads, sfs, grants,
                              overlay=(np.stack(idx_rows),
                                       np.stack(val_rows)))
    win_samples = gen.samples(out)
    assert np.allclose(win_samples, host_samples[:, 0], atol=2e-3)
    # independent per-TTI receive chain decodes the windowed render
    res = ue_dl_decode_subframe(CELL, win_samples[3][None], sfs[3], RNTI,
                                known_cfi=CFI)
    assert res.tbs and res.tbs[0][1]
    assert np.array_equal(res.tbs[0][0], payloads[3])


def test_pucch_format2_np_mirror():
    from srsran_tpu.phy.phch.pucch import (
        PucchConfig, pucch_format2_decode, pucch_format2_encode_np)

    rng = np.random.default_rng(3)
    cfg = PucchConfig(n_pucch=3)
    bits = rng.integers(0, 2, 4).astype(np.uint8)
    grid = pucch_format2_encode_np(CELL, cfg, 4, bits)
    noisy = grid + (0.05 * rng.standard_normal(grid.shape)
                    + 0.05j * rng.standard_normal(grid.shape)
                    ).astype(np.complex64)
    b_ref, m_ref = pucch_format2_decode(noisy, CELL, cfg, 4, 4)
    b_np, m_np = pucch_format2_decode_np(noisy, CELL, cfg, 4, 4)
    assert np.array_equal(np.asarray(b_ref), b_np)
    assert abs(float(m_ref) - m_np) < 1e-3
    assert np.array_equal(b_np, bits)


def test_enb_ul_frontend_pucch_and_pusch():
    from srsran_tpu.phy.phch.pucch import (
        PucchConfig, pucch_f1_prb, pucch_format1_decode, _f1_covers)
    from srsran_tpu.phy.phch.pusch import UlGrant
    from srsran_tpu.phy.phch.ra import (tbs_lookup, ul_mcs_to_itbs,
                                        ul_mcs_to_mod)
    from srsran_tpu.phy.ue.ue_ul import ue_ul_encode

    rng = np.random.default_rng(4)
    fe = WindowedEnbUlFrontEnd(CELL, w=W, edge_prbs=4)
    grant = UlGrant(prb_start=4, nof_prb=16, mod=ul_mcs_to_mod(5),
                    tbs=tbs_lookup(ul_mcs_to_itbs(5), 16), rnti=RNTI)
    sfs, rows, tbs_bits, acks = [], [], [], []
    for t in range(W):
        sf = (t + 2) % 10
        tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
        ack = t & 1
        s = ue_ul_encode(CELL, sf, pusch=(grant, tb),
                         pucch1=(PucchConfig(n_pucch=2), [ack]))
        sfs.append(sf)
        rows.append(s)
        tbs_bits.append(tb)
        acks.append(ack)
    samples = np.stack(rows)[:, None]
    pf = fe.dispatch(samples, sfs)
    edge, prb_pow = fe.realize_pucch(pf)
    # DTX gate data: the PUSCH allocation carries power, PRB 0 does not
    assert np.all(prb_pow[:, 4:20].mean(axis=1) > 1e-5)
    cfgp = PucchConfig(n_pucch=2)
    for t in range(W):
        prbs = tuple(
            pucch_f1_prb(cfgp.n_pucch, 2 * sfs[t] + sl, CELL.nof_prb,
                         cfgp.delta_shift, covers=_f1_covers(CELL))
            for sl in range(2))
        grid = fe.pucch_prb_grid(edge, t, prbs)
        bits, metric = pucch_format1_decode(grid, CELL, cfgp, sfs[t], 1)
        assert metric > 0.25
        assert int(bits[0]) == acks[t]
    p = fe.dispatch_data(pf, [grant] * W)
    res = fe.results(p)
    for (tb, ok, _n), want in zip(res, tbs_bits):
        assert ok and np.array_equal(tb, want)


def test_conv_rate_match_rx_batch_matches_scalar():
    """The blind search's vectorized de-rate-match folds circular-buffer
    repetitions by cycle — must equal the scalar scatter form for every
    aggregation level's slice width."""
    from srsran_tpu.phy.fec.rate_match import (
        conv_rate_match_rx_batch_np, conv_rate_match_rx_np)

    rng = np.random.default_rng(6)
    d = 45 + 16
    for lvl in (1, 2, 4, 8):
        e = 72 * lvl
        rows = rng.standard_normal((5, e)).astype(np.float32)
        batch = conv_rate_match_rx_batch_np(rows, d)
        for k in range(5):
            ref = conv_rate_match_rx_np(rows[k], d)
            assert np.allclose(batch[k], ref, atol=1e-5), lvl


def test_pucch_f1_batch_decode_matches_scalar():
    """The windowed ACK stream's vectorized format-1 correlation equals
    the scalar decode bit-for-bit (same DTX metric)."""
    from srsran_tpu.phy.phch.pucch import (
        PucchConfig, pucch_format1_decode, pucch_format1_encode_np)
    from srsran_tpu.pipeline_ctrl import pucch_format1_decode_batch

    rng = np.random.default_rng(7)
    grids, sfs, want = [], [], []
    for i in range(12):
        sf = i % 10
        b = int(rng.integers(0, 2))
        g = pucch_format1_encode_np(CELL, PucchConfig(n_pucch=3), sf, [b])
        g = (g + 0.05 * (rng.standard_normal(g.shape)
                         + 1j * rng.standard_normal(g.shape))
             ).astype(np.complex64)
        grids.append(g)
        sfs.append(sf)
        want.append(b)
    bb, mm = pucch_format1_decode_batch(np.stack(grids), CELL, 3, sfs, 1)
    for i in range(12):
        bs, ms = pucch_format1_decode(grids[i], CELL,
                                      PucchConfig(n_pucch=3), sfs[i], 1)
        assert int(bs[0]) == int(bb[i, 0]) == want[i]
        assert abs(float(ms) - mm[i]) < 1e-3
        assert mm[i] > 0.25  # well above the DTX gate at this SNR
