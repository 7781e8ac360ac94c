"""On-device rate-match index computation vs the host reference
(`rate_match.turbo_rm_indices`) — the windowed pipeline's index engine."""

import numpy as np
import jax.numpy as jnp

from srsran_tpu.phy.fec.cbsegm import CB_SIZES, cbsegm, qpp_interleaver_np
from srsran_tpu.phy.fec.rate_match import turbo_rm_indices
from srsran_tpu.phy.fec.rate_match_dev import (
    codeword_scatter_dev,
    qpp_dev,
    tb_reassembly_gather_dev,
    turbo_rm_positions_dev,
)

K_MAX = 6144


def _host_positions(k, f, rv):
    """All transmitted positions (one full circular-buffer sweep) from the
    host path, re-expressed in the k_max-padded flat layout."""
    idx = turbo_rm_indices(k, 3 * (k + 4) - 2 * f, rv, f)  # exactly n_valid
    stream, pos = idx // (k + 4), idx % (k + 4)
    return stream * (K_MAX + 4) + pos


def test_positions_match_host_all_sizes():
    rng = np.random.default_rng(0)
    ks = [40, 48, 512, 6144] + [int(k) for k in rng.choice(CB_SIZES, 12)]
    for k in ks:
        for rv in (0, 1, 2, 3):
            f = 28 if (k, rv) == (512, 1) else 0
            pos, n_valid = turbo_rm_positions_dev(
                jnp.int32(k), jnp.int32(f), jnp.int32(rv), K_MAX)
            n_valid = int(n_valid)
            assert n_valid == 3 * (k + 4) - 2 * f
            np.testing.assert_array_equal(
                np.asarray(pos)[:n_valid], _host_positions(k, f, rv),
                err_msg=f"k={k} rv={rv} f={f}")
            assert np.all(np.asarray(pos)[n_valid:] == 3 * (K_MAX + 4))


def test_codeword_scatter_matches_host_segmented():
    """Multi-CB codeword (segmentation + filler + uneven e-split) scatters
    exactly like per-CB host indices."""
    from srsran_tpu.phy.phch.sch import _e_split

    tbs, g_max = 20000, 98304
    qm, rv, g = 6, 0, 61440
    segm = cbsegm(tbs)
    es = _e_split(g, segm.C, qm, 1)
    bsz = 8
    cb_k = np.zeros(bsz, np.int32)
    cb_e = np.zeros(bsz, np.int32)
    cb_f = np.zeros(bsz, np.int32)
    valid = np.zeros(bsz, bool)
    for i, k in enumerate(segm.cb_sizes):
        cb_k[i], cb_e[i] = k, es[i]
        cb_f[i] = segm.F if i == 0 else 0
        valid[i] = True
    tgt = np.asarray(codeword_scatter_dev(
        jnp.asarray(cb_k), jnp.asarray(cb_e), jnp.asarray(cb_f),
        jnp.asarray(valid), jnp.int32(rv), K_MAX, g_max))

    dflat = 3 * (K_MAX + 4)
    off = 0
    for i, k in enumerate(segm.cb_sizes):
        e = es[i]
        idx = turbo_rm_indices(k, e, rv, cb_f[i])
        stream, pos = idx // (k + 4), idx % (k + 4)
        expect = i * dflat + stream * (K_MAX + 4) + pos
        np.testing.assert_array_equal(tgt[off : off + e], expect, err_msg=f"cb {i}")
        off += e
    assert np.all(tgt[off:] == bsz * dflat)


def test_d_fill_gather_matches_scatter():
    """The gather-form de-rate-match (codeword_d_fill_dev) accumulates
    exactly what the host scatter indices produce — incl. repetition
    folds, filler exclusion, segmentation, and every RV."""
    import jax
    from srsran_tpu.phy.fec.rate_match_dev import codeword_d_fill_dev, ncb_max

    rng = np.random.default_rng(2)
    NCB = ncb_max(K_MAX)
    dflat = 3 * (K_MAX + 4)
    cases = [
        # (cb_sizes, fillers, es) — single CB w/ repetition, segmented+filler
        ([40], [0], [1000]),            # e >> n_valid: 7.5x fold
        ([512], [28], [700]),
        ([6144, 6144], [0, 0], [8378, 8380]),
        ([2752, 2752], [12, 0], [4000, 4100]),
    ]
    for rv in (0, 1, 2, 3):
        for cb_sizes, fs, es in cases:
            g = sum(es)
            llr = rng.standard_normal(g).astype(np.float32)
            llr_pad = jnp.asarray(np.concatenate([llr, np.zeros(NCB, np.float32)]))
            off = 0
            for k, f, e in zip(cb_sizes, fs, es):
                fill = np.asarray(codeword_d_fill_dev(
                    llr_pad, jnp.int32(off), jnp.int32(e), jnp.int32(k),
                    jnp.int32(f), jnp.int32(rv), K_MAX, 8)).reshape(-1)
                idx = turbo_rm_indices(k, e, rv, f)
                stream, pos = idx // (k + 4), idx % (k + 4)
                expect = np.zeros(dflat, np.float32)
                np.add.at(expect, stream * (K_MAX + 4) + pos, llr[off : off + e])
                np.testing.assert_allclose(
                    fill, expect, atol=1e-5,
                    err_msg=f"k={k} f={f} e={e} rv={rv}")
                off += e


def test_qpp_dev_matches_host():
    from srsran_tpu.phy.fec.cbsegm import F1, F2, cb_size_index

    ks = [40, 512, 4736, 6144]
    f1 = np.array([F1[cb_size_index(k)] for k in ks], np.int32)
    f2 = np.array([F2[cb_size_index(k)] for k in ks], np.int32)
    per, inv = qpp_dev(jnp.asarray(np.array(ks, np.int32)),
                       jnp.asarray(f1), jnp.asarray(f2), K_MAX)
    per, inv = np.asarray(per), np.asarray(inv)
    for b, k in enumerate(ks):
        expect = qpp_interleaver_np(k)
        np.testing.assert_array_equal(per[b, :k], expect, err_msg=f"k={k}")
        np.testing.assert_array_equal(per[b, k:], np.arange(k, K_MAX))
        np.testing.assert_array_equal(inv[b, per[b]], np.arange(K_MAX))


def test_tb_reassembly_gather():
    tbs = 20000
    segm = cbsegm(tbs)
    bsz, tbs_max = 8, 24576
    cb_k = np.zeros(bsz, np.int32)
    cb_f = np.zeros(bsz, np.int32)
    valid = np.zeros(bsz, bool)
    for i, k in enumerate(segm.cb_sizes):
        cb_k[i] = k
        cb_f[i] = segm.F if i == 0 else 0
        valid[i] = True
    crc_is_b = np.asarray(valid) & (segm.C > 1)
    tb_idx, crc_idx = tb_reassembly_gather_dev(
        jnp.asarray(cb_k), jnp.asarray(cb_f), jnp.asarray(valid),
        jnp.asarray(crc_is_b), jnp.int32(tbs), K_MAX, tbs_max)
    tb_idx, crc_idx = np.asarray(tb_idx), np.asarray(crc_idx)

    # host expectation (mirrors pipeline_dynamic._tb_descriptor)
    parts = []
    for i, k in enumerate(segm.cb_sizes):
        f = segm.F if i == 0 else 0
        end = k - (24 if segm.C > 1 else 0)
        parts.append(i * K_MAX + np.arange(f, end))
    flat = np.concatenate(parts)
    assert len(flat) == tbs + 24
    np.testing.assert_array_equal(tb_idx[: tbs_max - tbs], bsz * K_MAX)
    np.testing.assert_array_equal(tb_idx[tbs_max - tbs :], flat[:tbs])
    np.testing.assert_array_equal(crc_idx, flat[tbs:])
