"""Windowed dynamic-grant pipeline: W TTIs per dispatch, ONE program set.

The per-TTI dynamic pipeline (`pipeline_dynamic.py`) reaches zero
steady-state recompiles, but on a tunneled TPU each TTI still pays the
host↔device round-trips (measured ~25 ms/readback RPC) — two orders above
the 1 ms budget.  This module amortizes them the TPU way: a **window** of
W consecutive TTIs is decoded by one dispatch of a *fixed* three-stage
program, whatever the per-TTI grants are:

* every grant-dependent quantity is **data**, not trace constants —
  modulation (all four constellations demodulated, one-hot selected),
  PRB sets (padded RE index vectors), TB layout (per-CB size/rate-match
  lengths), redundancy version, and the rate-matching scatter itself,
  which is derived *on device* from five scalars per codeblock
  (`phy/fec/rate_match_dev.py`) instead of host-built LUTs;
* per-TTI constants that repeat across a connection (CRS references per
  subframe index, scrambling signs per (rnti, sf), RE index vectors per
  PRB set) are cached device-resident and stacked on device — zero
  steady-state uploads besides the samples themselves;
* the whole window returns as ONE packed uint8 array (TB bits packed
  8-per-byte + CRC flag + iteration count per TTI): one readback RPC
  per W TTIs.

This is the TPU analog of the reference's sf_worker pipeline
(`thread_pool.h:46-77`, 4 subframes in flight): latency is traded for
sustained real-time throughput, with W as the depth knob.  The reference
processes arbitrary grants in 1 ms on 4 cores (`cc_worker.cc:214-307`);
here one chip sustains W TTIs per dispatch with a bounded-for-life
compile set (exactly 3 programs + 2 stackers per (cell, W)).

Scope: single-codeword PDSCH grants, port0 (SISO/MRC) or TM2 SFBC
transmit diversity (`scheme="diversity"` — 2-port chest + Alamouti
combining); spatial-multiplexing windows fall back to the per-TTI
dynamic path.  The eNB uplink mirror (`WindowedEnbUl`) covers PUSCH
data grants with Bluestein IDFT de-precoding.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .phy.chest.chest_dl import ChestDlConfig, _chest_tables
from .phy.common import Cell
from .phy.fec.cbsegm import F1, F2, cb_size_index, cbsegm
from .phy.fec.rate_match_dev import (
    codeword_d_fill_grouped_dev,
    ncb_max,
    qpp_dev,
)
from .phy.fec.turbo_dyn import crc_table_ab, turbo_decode_dyn
from .phy.mimo import predecode_diversity2, predecode_single_mrc
from .phy.modem import Mod, demod_soft
from .phy.ofdm import OfdmConfig, ofdm_rx_sf
from .phy.phch.pdsch import DlGrant, pdsch_cinit
from .phy.phch.sch import FILLER_LLR, _e_split
from .phy.sequence import gold_sequence_signs
from .pipeline_dynamic import G_MAX, RE_BUCKETS, _padded_re_indices

K_MAX = 6144
B_CB = 16          # max codeblocks per TB (LTE max TBS 75376 → 13 CBs)
RE_MAX = RE_BUCKETS[-1]
TBS_MAX = 76800    # ≥ max LTE single-codeword TBS (75376), 8-divisible
TB_BYTES = TBS_MAX // 8
QMS = (2, 4, 6, 8)
MODS = (Mod.QPSK, Mod.QAM16, Mod.QAM64, Mod.QAM256)
REP = 8  # static bound on rate-matching repetition folds (e <= REP * n_valid)


def _c2ri(x):
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)


def _ri2c(x):
    return x[..., 0] + 1j * x[..., 1]


# --------------------------------------------------------------------------
# device-side stacking of cached constants (no host uploads in steady state)
# --------------------------------------------------------------------------


@lru_cache(maxsize=64)
def _stacker(n: int):
    return jax.jit(lambda *xs: jnp.stack(xs))


# --------------------------------------------------------------------------
# stage programs
# --------------------------------------------------------------------------


def _build_win_a(cell: Cell, w: int, nof_ports: int = 1):
    """Front-end for W subframes: OFDM demod + CRS chest (1 or 2 ports).

    Samples arrive as int8 I/Q + a per-TTI scale — the native ADC layout
    (the reference ingests int16 from UHD / cf32 from ZMQ), and 4x less
    host→device traffic than float32 on the ingest link.  The only
    subframe-dependent input is the conjugated CRS sequence — passed as
    data so one program serves all 10 subframe indices."""
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    cfg = ChestDlConfig()
    tabs = [_chest_tables(cell, 0, cfg, p) for p in range(nof_ports)]
    syms_d = [jnp.asarray(t[0]) for t in tabs]
    freqs_d = [jnp.asarray(t[1]) for t in tabs]
    wf_d = [jnp.asarray(t[3]) for t in tabs]
    wt_d = [jnp.asarray(t[4]) for t in tabs]

    def one(samples_i8, scale, ref_conj_ri):
        samples = _ri2c(samples_i8.astype(jnp.float32) * scale)
        grid = ofdm_rx_sf(ofdm, samples)     # (nrx, nsymb, nre)
        ces, noises = [], []
        for p in range(nof_ports):
            pilots = grid[..., syms_d[p][:, None], freqs_d[p]]
            ls = pilots * _ri2c(ref_conj_ri[p])  # (nrx, 4, npil)
            per_sym = jnp.einsum("snp,rsp->rsn", wf_d[p], ls)
            ces.append(jnp.einsum(
                "ls,rsn->rln", wt_d[p].astype(jnp.complex64), per_sym))
            resid = ls[..., 1:-1] - 0.5 * (ls[..., 2:] + ls[..., :-2])
            noises.append(jnp.mean(jnp.abs(resid) ** 2) / 1.5)
        ce = jnp.stack(ces, axis=1)  # (nrx, nports, nsymb, nre)
        noise = sum(noises) / nof_ports
        return _c2ri(grid), _c2ri(ce), noise

    @jax.jit
    def fn(samples_i8, scale, ref_conj_ri):
        return jax.vmap(one)(samples_i8, scale, ref_conj_ri)

    return fn


def _build_win_b(w: int, scheme: str = "port0"):
    """Grant front-end for W TTIs: RE gather → equalize (port0 MRC or
    TM2 SFBC combining) → demod (all constellations, one-hot select by
    the per-TTI Qm) → CSI weight → descramble.  Emits (W, G_MAX) masked
    LLRs."""

    def one(grid_ri, ce_ri, noise, idx, n_re, qm, signs):
        grid = _ri2c(grid_ri)
        ce = _ri2c(ce_ri)
        y = grid.reshape(grid.shape[0], -1)[:, idx]       # (nrx, RE_MAX)
        if scheme == "diversity":
            h = ce.reshape(ce.shape[0], ce.shape[1], -1)[:, :, idx]
            x, csi = predecode_diversity2(y, h)
        else:
            h = ce.reshape(ce.shape[0], ce.shape[1], -1)[:, 0, idx]
            x, csi = predecode_single_mrc(y, h, noise)
        llr = jnp.zeros((G_MAX,), jnp.float32)
        for mod_c, qm_c in zip(MODS, QMS):
            lc = demod_soft(mod_c, x) * jnp.repeat(csi, qm_c)
            lc = jnp.zeros((G_MAX,), jnp.float32).at[: RE_MAX * qm_c].set(lc)
            llr = jnp.where(qm == qm_c, lc, llr)
        llr = llr * signs.astype(jnp.float32)
        mask = jnp.arange(G_MAX) < n_re * qm
        return jnp.where(mask, llr, 0.0)

    @jax.jit
    def fn(grid_ri, ce_ri, noise, idx, n_re, qm, signs):
        return jax.vmap(one)(grid_ri, ce_ri, noise, idx, n_re, qm, signs)

    return fn


def _build_win_c(w: int, max_iterations: int):
    """TB decode for W TTIs: grouped-gather de-rate-match (HARQ combining)
    → dynamic-K turbo over all W*B_CB codeblocks with grouped interleaves
    → CB + TB CRC → packed (W, TB_BYTES+2) result [tb bytes | ok | n_it].

    Every index-dependent step uses one of the TPU's fast forms: indices
    shared across a batch axis, contiguous dynamic slices, or contiguous
    dynamic-update-slices — never per-row arbitrary gathers (measured
    7-10x slower at equal element count on the v5e)."""
    crc_ab = jnp.asarray(crc_table_ab(K_MAX))
    from .phy.common import LTE_CRC24A
    from .phy.crc import crc_matrix_np

    tb_table = jnp.asarray(crc_matrix_np(LTE_CRC24A, TBS_MAX).astype(np.float32))
    pow2 = jnp.asarray((1 << np.arange(7, -1, -1)).astype(np.uint8))
    NCB = ncb_max(K_MAX)
    SCRATCH = TBS_MAX + 24 + K_MAX  # stream + margin for padded CB writes

    def fill_one(llr, soft, e_eff, cls, k3, f3, rv):
        bounds = jnp.cumsum(e_eff)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), bounds[:-1]])
        llr_pad = jnp.concatenate([llr, jnp.zeros((NCB,), llr.dtype)])
        return soft + codeword_d_fill_grouped_dev(
            llr_pad, start, e_eff, cls, k3, f3, rv, K_MAX, REP)

    def reassemble_one(bits, k_cb, f_cb, nbits, tbs):
        """TB concatenation as in-order contiguous writes: CB c's bits
        [f_c, f_c + K_MAX) land at its stream offset; the next CB's write
        overwrites the previous one's padded tail (write order ascends)."""
        bounds = jnp.cumsum(nbits)
        startb = jnp.concatenate([jnp.zeros((1,), jnp.int32), bounds[:-1]])
        base = TBS_MAX + 24 - (tbs + 24)
        scratch = jnp.zeros((SCRATCH,), jnp.uint8)
        pad = jnp.zeros((K_MAX,), jnp.uint8)
        for c in range(B_CB):
            seg = jax.lax.dynamic_slice(
                jnp.concatenate([bits[c], pad]), (f_cb[c],), (K_MAX,))
            pos = jnp.where(nbits[c] > 0, base + startb[c], TBS_MAX + 24)
            scratch = jax.lax.dynamic_update_slice(scratch, seg, (pos,))
        return scratch[:TBS_MAX], scratch[TBS_MAX : TBS_MAX + 24]

    @jax.jit
    def fn(llr, cb_e, cls, k3, f3, f13, f23, rv, tbs, crcb, softbuffer):
        new_soft = jax.vmap(fill_one)(
            llr, softbuffer, cb_e, cls, k3, f3, rv)  # (W,B,3,D)
        d = new_soft.reshape(w * B_CB, 3, K_MAX + 4)
        cb_k = jnp.take_along_axis(k3, cls, axis=1)  # (W,B)
        cb_f = jnp.take_along_axis(f3, cls, axis=1)
        kf = cb_k.reshape(-1)
        ff = cb_f.reshape(-1)
        vf = (cb_e > 0).reshape(-1)
        bf = jnp.broadcast_to(crcb[:, None].astype(bool), (w, B_CB)).reshape(-1)
        # pin filler bits (known 0) in the systematic stream
        pin = jnp.arange(K_MAX + 4)[None, :] < ff[:, None]
        d = d.at[:, 0, :].set(jnp.where(pin, FILLER_LLR, d[:, 0, :]))
        # grouped QPP: 3 layout variants per TTI
        per3, inv3 = qpp_dev(
            k3.reshape(-1), f13.reshape(-1), f23.reshape(-1), K_MAX)
        per3 = per3.reshape(w, 3, K_MAX)
        inv3 = inv3.reshape(w, 3, K_MAX)
        bits, _post, n_it = turbo_decode_dyn(
            d, kf, None, None, vf, K_MAX, max_iterations,
            crc_table=crc_ab, crc_is_b=bf, perm_groups=(per3, inv3, cls))
        # final per-CB CRC: roll to buffer tail via contiguous slices
        fb = bits.astype(jnp.float32)
        cat = jnp.concatenate([fb, fb], axis=1)
        tail_bits = jax.vmap(
            lambda row, k: jax.lax.dynamic_slice(row, (k,), (K_MAX,))
        )(cat, kf)
        acc = jnp.matmul(tail_bits, crc_ab, preferred_element_type=jnp.float32)
        okA = jnp.all((acc[:, :24].astype(jnp.int32) & 1) == 0, axis=-1)
        okB = jnp.all((acc[:, 24:].astype(jnp.int32) & 1) == 0, axis=-1)
        cb_ok = jnp.where(bf, okB, okA).reshape(w, B_CB)

        nbits = jnp.where(cb_e > 0,
                          cb_k - cb_f - 24 * crcb[:, None], 0)  # (W,B)
        tbp, rx_crc = jax.vmap(reassemble_one)(
            bits.reshape(w, B_CB, K_MAX), cb_k, cb_f, nbits, tbs)
        crc_calc = (
            jnp.matmul(tbp.astype(jnp.float32), tb_table,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
            & 1
        ).astype(jnp.uint8)
        tb_ok = jnp.all(jnp.where(cb_e > 0, cb_ok, True), axis=1) & jnp.all(
            crc_calc == rx_crc, axis=1)
        tb_bytes = jnp.sum(
            tbp.reshape(w, TB_BYTES, 8) * pow2[None, None, :], axis=-1
        ).astype(jnp.uint8)
        packed = jnp.concatenate(
            [
                tb_bytes,
                tb_ok.astype(jnp.uint8)[:, None],
                jnp.broadcast_to(
                    jnp.clip(n_it, 0, 255).astype(jnp.uint8), (w,))[:, None],
            ],
            axis=1,
        )
        return packed, new_soft

    return fn


# --------------------------------------------------------------------------
# facade
# --------------------------------------------------------------------------


@dataclasses.dataclass
class PendingWindow:
    """A dispatched window (device arrays); realize with `results`."""

    packed: jnp.ndarray      # (W, TB_BYTES + 2) uint8
    softbuffer: jnp.ndarray  # (W, B_CB, 3, K_MAX + 4)
    tbs: list                # per-TTI true TB sizes


@lru_cache(maxsize=8)
def _soft_slicer():
    return jax.jit(lambda s, i: jax.lax.dynamic_index_in_dim(
        s, i, axis=0, keepdims=False))


def extract_softbuffer(p: PendingWindow, i: int) -> jnp.ndarray:
    """Device-resident softbuffer of window slot i (for HARQ carry into a
    LATER window at any slot — retransmissions rarely land in the same
    window position)."""
    return _soft_slicer()(p.softbuffer, jnp.int32(i))


@lru_cache(maxsize=64)
def _soft_zeros(w_unused: int) -> jnp.ndarray:
    return jnp.zeros((B_CB, 3, K_MAX + 4), jnp.float32)


def make_softbuffer(entries) -> jnp.ndarray:
    """Stack per-slot softbuffers (None = fresh) into a window buffer —
    all device-side, no host transfer."""
    w = len(entries)
    return _stacker(w)(*[
        e if e is not None else _soft_zeros(0) for e in entries])


class WindowedUeDl:
    """Decode ANY W-TTI mix of port0 PDSCH grants per dispatch.

    Exactly three XLA programs for the life of the object; one packed
    readback per window.  `decode_window` is the synchronous form;
    `dispatch_window`/`results` pipeline multiple windows in flight.
    """

    def __init__(self, cell: Cell, cfi: int = 1, w: int = 32,
                 max_iterations: int = 5, scheme: str = "port0"):
        assert scheme in ("port0", "diversity")
        self.cell = cell
        self.cfi = cfi
        self.w = w
        self.scheme = scheme
        self.nof_ports = 2 if scheme == "diversity" else 1
        self.max_iterations = max_iterations
        self._a = _build_win_a(cell, w, self.nof_ports)
        self._b = _build_win_b(w, scheme)
        self._c = _build_win_c(w, max_iterations)
        self._ref_dev: dict = {}    # sf_idx -> (4, npil, 2) device
        self._idx_dev: dict = {}    # (sf, prb) -> (RE_MAX,) device
        self._signs_dev: dict = {}  # (rnti, sf) -> (G_MAX,) int8 device
        self.stats = {"windows": 0, "ttis": 0, "crc_ok": 0}

    # -- cached device constants --
    def _ref(self, sf_idx: int):
        if sf_idx not in self._ref_dev:
            refs = []
            for p in range(self.nof_ports):
                ref_conj = _chest_tables(
                    self.cell, sf_idx, ChestDlConfig(), p)[2]
                refs.append(np.stack(
                    [ref_conj.real, ref_conj.imag], -1).astype(np.float32))
            self._ref_dev[sf_idx] = jnp.asarray(np.stack(refs))
        return self._ref_dev[sf_idx]

    def _idx(self, sf_idx: int, prb: tuple):
        key = (sf_idx, prb)
        if key not in self._idx_dev:
            pad, n_re, _bucket = _padded_re_indices(
                self.cell, sf_idx, self.cfi, prb)
            full = np.zeros(RE_MAX, np.int32)
            full[: len(pad)] = pad
            self._idx_dev[key] = (jnp.asarray(full), n_re)
        return self._idx_dev[key]

    def _signs(self, rnti: int, sf_idx: int):
        key = (rnti, sf_idx)
        if key not in self._signs_dev:
            cinit = pdsch_cinit(rnti, sf_idx, self.cell.id, q=0)
            self._signs_dev[key] = jnp.asarray(
                gold_sequence_signs(cinit, G_MAX).astype(np.int8))
        return self._signs_dev[key]

    def dispatch_window(self, samples, sf_indices, grants,
                        softbuffer=None, sharding=None) -> PendingWindow:
        """samples: (W, nrx, sf_len) complex64; sf_indices/grants: length-W
        lists (grants: DlGrant, port0 single-codeword).  Results stay on
        device until `results`.

        sharding: optional `NamedSharding` partitioning the window axis
        over a device mesh — W (carrier, TTI) slots shard across chips
        exactly like the reference's cc_worker x sf_worker grid; XLA
        propagates the partitioning through all three stages with no
        cross-device collectives (each slot is independent)."""
        w = self.w
        assert len(sf_indices) == w and len(grants) == w
        samples_ri = np.stack([samples.real, samples.imag], axis=-1)
        # int8 ADC quantization per TTI (peak-scaled, AGC's role)
        peak = np.maximum(
            np.abs(samples_ri).reshape(w, -1).max(axis=1), 1e-12)
        scale = (peak / 127.0).astype(np.float32)
        samples_i8 = np.clip(
            np.round(samples_ri / scale[:, None, None, None]), -127, 127
        ).astype(np.int8)

        refs = _stacker(w)(*[self._ref(s) for s in sf_indices])
        idx_pairs = [self._idx(s, tuple(g.prb))
                     for s, g in zip(sf_indices, grants)]
        idx = _stacker(w)(*[p[0] for p in idx_pairs])
        signs = _stacker(w)(*[self._signs(g.rnti, s)
                              for s, g in zip(sf_indices, grants)])

        # one packed int32 param upload for the whole window.  Header:
        # [n_re, qm, rv, tbs, crc_is_b, k3 x3, f3 x3, f1 x3, f2 x3];
        # per CB: [e, cls] — cls indexes the TB's <=3 CB layout variants
        # (CB0-with-filler / K- / K+).
        HDR = 17
        params = np.zeros((w, HDR + 2 * B_CB), np.int32)
        tbs_list = []
        for i, g in enumerate(grants):
            n_re = idx_pairs[i][1]
            segm = cbsegm(g.tbs)
            assert segm.C <= B_CB, f"TB with {segm.C} CBs exceeds B_CB"
            es = _e_split(n_re * g.qm, segm.C, g.qm, 1)
            cb_sizes = segm.cb_sizes
            k_minus = segm.K_minus if segm.C_minus > 0 else 40
            k3 = (cb_sizes[0], k_minus, segm.K_plus)
            f3 = (segm.F, 0, 0)
            params[i, :5] = (n_re, g.qm, getattr(g, "rv", 0), g.tbs,
                             1 if segm.C > 1 else 0)
            for v in range(3):
                ki = cb_size_index(k3[v])
                params[i, 5 + v] = k3[v]
                params[i, 8 + v] = f3[v]
                params[i, 11 + v] = F1[ki]
                params[i, 14 + v] = F2[ki]
            for c, k in enumerate(cb_sizes):
                f = segm.F if c == 0 else 0
                assert es[c] <= REP * (3 * (k + 4) - 2 * f), (
                    f"repetition fold {es[c]}/{3*(k+4)-2*f} exceeds REP={REP}")
                cls = 0 if c == 0 else (1 if k == k_minus else 2)
                params[i, HDR + 2 * c] = es[c]
                params[i, HDR + 2 * c + 1] = cls
            tbs_list.append(g.tbs)
        pdev = jnp.asarray(params)
        scale_d = jnp.asarray(scale)
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            samples_i8 = jax.device_put(samples_i8, sharding)
            scale_d = jax.device_put(
                scale_d, NamedSharding(sharding.mesh,
                                       PartitionSpec(sharding.spec[0])))

        grid_ri, ce_ri, noise = self._a(samples_i8, scale_d, refs)
        llr = self._b(grid_ri, ce_ri, noise, idx, pdev[:, 0], pdev[:, 1],
                      signs)
        if softbuffer is None:
            softbuffer = jnp.zeros((w, B_CB, 3, K_MAX + 4), jnp.float32)
        cb = pdev[:, HDR:].reshape(w, B_CB, 2)
        packed, new_soft = self._c(
            llr, cb[:, :, 0], cb[:, :, 1], pdev[:, 5:8], pdev[:, 8:11],
            pdev[:, 11:14], pdev[:, 14:17], pdev[:, 2], pdev[:, 3],
            pdev[:, 4], softbuffer)
        return PendingWindow(packed, new_soft, tbs_list)

    def results(self, p: PendingWindow):
        """Realize a window: ONE readback; returns [(tb, ok, n_it)] * W."""
        res = np.asarray(p.packed)
        out = []
        for i, tbs in enumerate(p.tbs):
            bits = np.unpackbits(res[i, :TB_BYTES])
            tb = bits[TBS_MAX - tbs : TBS_MAX]
            ok = bool(res[i, TB_BYTES])
            n_it = int(res[i, TB_BYTES + 1])
            self.stats["ttis"] += 1
            self.stats["crc_ok"] += int(ok)
            out.append((tb, ok, n_it))
        self.stats["windows"] += 1
        return out

    def decode_window(self, samples, sf_indices, grants, softbuffer=None):
        p = self.dispatch_window(samples, sf_indices, grants, softbuffer)
        return self.results(p), p.softbuffer


# --------------------------------------------------------------------------
# eNB UL (PUSCH) window — mirrors the DL design; shares stage C
# --------------------------------------------------------------------------

M_MAX = 1200  # max PUSCH allocation subcarriers (100 PRB)


def _build_win_a_ul(cell: Cell, w: int):
    """SC-FDMA demod for W subframes (grant independent)."""
    ofdm = OfdmConfig.from_cell(cell, normalize=True, freq_shift_f=-0.5)

    @jax.jit
    def fn(samples_i8, scale):
        def one(s_i8, sc):
            return _c2ri(ofdm_rx_sf(ofdm, _ri2c(s_i8.astype(jnp.float32) * sc)))

        return jax.vmap(one)(samples_i8, scale)

    return fn


def _build_win_b_ul(cell: Cell, w: int):
    """PUSCH grant front-end for W TTIs, every grant quantity data:
    allocation slice (contiguous dynamic-slice), DMRS chest with masked
    smoothing, MRC, **Bluestein IDFT** de-precoding (transform length is
    data — no per-width DFT matrices), 4-constellation demod select,
    descramble in transmit order, channel de-interleave (closed-form
    index math, TS 36.212 §5.2.2.8)."""
    from .phy.chest.refsignal_ul import dmrs_symbol_in_slot
    from .phy.dft_precoding import idft_bluestein
    from .phy.phch.pusch import pusch_symbols_data

    l_dmrs = dmrs_symbol_in_slot(cell)
    dmrs_syms = (l_dmrs, cell.nsymb_per_slot + l_dmrs)
    data_syms = tuple(pusch_symbols_data(cell))
    nsym = len(data_syms)

    t = np.zeros((cell.nsymb_per_sf, 2), np.float32)
    l0, l1 = dmrs_syms
    for l in range(cell.nsymb_per_sf):
        t[l] = (1.0, 0.0) if l <= l0 else ((0.0, 1.0) if l >= l1 else
                                           (1.0 - (l - l0) / (l1 - l0),
                                            (l - l0) / (l1 - l0)))
    t_data = jnp.asarray(t[list(data_syms)])  # (nsym, 2)

    def one(grid_ri, k0, m_sc, qm, dmrs_conj_ri, signs):
        grid = _ri2c(grid_ri)  # (nrx, nsymb, nre)
        nrx = grid.shape[0]
        gp = jnp.concatenate(
            [grid, jnp.zeros((nrx, grid.shape[1], M_MAX), grid.dtype)], axis=2)
        alloc = jax.lax.dynamic_slice(
            gp, (0, 0, k0), (nrx, grid.shape[1], M_MAX))
        m_mask = (jnp.arange(M_MAX) < m_sc)[None, :]
        pilots = alloc[:, jnp.asarray(dmrs_syms), :]
        ls = pilots * _ri2c(dmrs_conj_ri)[None]
        ls = jnp.where(m_mask[None], ls, 0.0)
        kern = jnp.ones((5,), jnp.float32)
        wsum = jnp.convolve(m_mask[0].astype(jnp.float32), kern, mode="same")
        sm = jax.vmap(jax.vmap(lambda row: (
            jnp.convolve(row.real, kern, mode="same")
            + 1j * jnp.convolve(row.imag, kern, mode="same")
        )))(ls) / jnp.maximum(wsum, 1.0)
        sm = jnp.where(m_mask[None], sm, 0.0)
        resid = jnp.where(m_mask[None], ls - sm, 0.0)
        noise = jnp.sum(jnp.abs(resid) ** 2) / jnp.maximum(
            2.0 * nrx * m_sc.astype(jnp.float32), 1.0)
        ce = jnp.einsum("ls,rsn->rln", t_data.astype(jnp.complex64), sm)
        y = alloc[:, jnp.asarray(data_syms), :]
        num = jnp.sum(y * jnp.conj(ce), axis=0)
        den = jnp.sum(jnp.abs(ce) ** 2, axis=0) + noise
        xf = jnp.where(m_mask, num / den, 0.0)  # (nsym, M_MAX)
        csi = jnp.where(m_mask, den, 0.0)
        x = idft_bluestein(xf, m_sc)  # (nsym, M_MAX)
        csi_t = jnp.sum(csi, axis=-1, keepdims=True) / jnp.maximum(
            m_sc.astype(jnp.float32), 1.0)
        wcsi = jnp.broadcast_to(csi_t, (nsym, M_MAX)).reshape(-1)
        # all four constellations over the padded layout; select by Qm
        llr_pad = jnp.zeros((G_MAX,), jnp.float32)
        xf_flat = x.reshape(-1)
        for mod_c, qm_c in zip(MODS, QMS):
            lc = demod_soft(mod_c, xf_flat) * jnp.repeat(wcsi, qm_c)
            lc = jnp.zeros((G_MAX,), jnp.float32).at[: nsym * M_MAX * qm_c].set(lc)
            llr_pad = jnp.where(qm == qm_c, lc, llr_pad)
        # compact to transmit order: i = c*(m_sc*qm) + u  ->  padded
        # position c*(M_MAX*qm) + u
        g_len = nsym * m_sc * qm
        i = jnp.arange(G_MAX, dtype=jnp.int32)
        cc = i // jnp.maximum(m_sc * qm, 1)
        u = i - cc * (m_sc * qm)
        llr_t = llr_pad[jnp.clip(cc * (M_MAX * qm) + u, 0, G_MAX - 1)]
        llr_t = jnp.where(i < g_len, llr_t, 0.0)
        llr_t = llr_t * signs.astype(jnp.float32)
        # de-interleave (§5.2.2.8): natural j = r*(12*qm)+c*qm+q comes
        # from transmit i = c*(r'*qm)+r*qm+q with r' = m_sc
        j = jnp.arange(G_MAX, dtype=jnp.int32)
        q = j % jnp.maximum(qm, 1)
        t2 = j // jnp.maximum(qm, 1)
        c2 = t2 % nsym
        r2 = t2 // nsym
        ii = c2 * (m_sc * qm) + r2 * qm + q
        llr_nat = llr_t[jnp.clip(ii, 0, G_MAX - 1)]
        return jnp.where(j < g_len, llr_nat, 0.0)

    @jax.jit
    def fn(grid_ri, k0, m_sc, qm, dmrs_conj_ri, signs):
        return jax.vmap(one)(grid_ri, k0, m_sc, qm, dmrs_conj_ri, signs)

    return fn


@lru_cache(maxsize=128)
def _win_ul_dmrs(cell: Cell, nof_prb: int) -> jnp.ndarray:
    from .phy.chest.refsignal_ul import pusch_dmrs

    r = np.zeros((2, M_MAX), np.complex64)
    for s in range(2):
        r[s, : 12 * nof_prb] = np.conj(np.asarray(pusch_dmrs(cell, nof_prb, 0, s)))
    return jnp.asarray(np.stack([r.real, r.imag], -1).astype(np.float32))


class WindowedEnbUl:
    """Decode ANY W-TTI mix of PUSCH data grants per dispatch — the eNB's
    multi-UE uplink at windowed throughput; shares the DL window's
    stage C (grouped de-rate-match + dynamic-K turbo)."""

    def __init__(self, cell: Cell, w: int = 32, max_iterations: int = 5):
        self.cell = cell
        self.w = w
        self.max_iterations = max_iterations
        self._a = _build_win_a_ul(cell, w)
        self._b = _build_win_b_ul(cell, w)
        self._c = _build_win_c(w, max_iterations)
        self._signs_dev: dict = {}
        from .phy.phch.pusch import pusch_symbols_data

        self._nsym = len(pusch_symbols_data(cell))
        self.stats = {"windows": 0, "ttis": 0, "crc_ok": 0}

    def _signs(self, rnti: int, sf_idx: int):
        from .phy.phch.pusch import pusch_cinit

        key = (rnti, sf_idx)
        if key not in self._signs_dev:
            cinit = pusch_cinit(rnti, sf_idx, self.cell.id)
            self._signs_dev[key] = jnp.asarray(
                gold_sequence_signs(cinit, G_MAX).astype(np.int8))
        return self._signs_dev[key]

    def dispatch_window(self, samples, sf_indices, grants,
                        softbuffer=None) -> PendingWindow:
        """samples: (W, nrx, sf_len) complex64; grants: UlGrant list."""
        w = self.w
        assert len(sf_indices) == w and len(grants) == w
        samples_ri = np.stack([samples.real, samples.imag], axis=-1)
        peak = np.maximum(
            np.abs(samples_ri).reshape(w, -1).max(axis=1), 1e-12)
        scale = (peak / 127.0).astype(np.float32)
        samples_i8 = np.clip(
            np.round(samples_ri / scale[:, None, None, None]), -127, 127
        ).astype(np.int8)

        dmrs = _stacker(w)(*[_win_ul_dmrs(self.cell, g.nof_prb)
                             for g in grants])
        signs = _stacker(w)(*[self._signs(g.rnti, s)
                              for s, g in zip(sf_indices, grants)])

        # [k0, qm, rv, tbs, crcb, m_sc, k3 x3, f3 x3, f1 x3, f2 x3] + CB pairs
        HDR = 18
        params = np.zeros((w, HDR + 2 * B_CB), np.int32)
        tbs_list = []
        for i, g in enumerate(grants):
            m_sc = 12 * g.nof_prb
            g_len = self._nsym * m_sc * g.qm
            segm = cbsegm(g.tbs)
            assert segm.C <= B_CB
            es = _e_split(g_len, segm.C, g.qm, 1)
            cb_sizes = segm.cb_sizes
            k_minus = segm.K_minus if segm.C_minus > 0 else 40
            k3 = (cb_sizes[0], k_minus,
                  segm.K_plus if segm.C_plus > 0 else 40)
            f3 = (segm.F, 0, 0)
            params[i, :6] = (g.prb_start * 12, g.qm, g.rv, g.tbs,
                             1 if segm.C > 1 else 0, m_sc)
            for v in range(3):
                ki = cb_size_index(k3[v])
                params[i, 6 + v] = k3[v]
                params[i, 9 + v] = f3[v]
                params[i, 12 + v] = F1[ki]
                params[i, 15 + v] = F2[ki]
            for c, k in enumerate(cb_sizes):
                f = segm.F if c == 0 else 0
                assert es[c] <= REP * (3 * (k + 4) - 2 * f)
                cls = 0 if c == 0 else (1 if k == k_minus else 2)
                params[i, HDR + 2 * c] = es[c]
                params[i, HDR + 2 * c + 1] = cls
            tbs_list.append(g.tbs)
        pdev = jnp.asarray(params)

        grid_ri = self._a(samples_i8, jnp.asarray(scale))
        llr = self._b(grid_ri, pdev[:, 0], pdev[:, 5], pdev[:, 1], dmrs,
                      signs)
        if softbuffer is None:
            softbuffer = jnp.zeros((w, B_CB, 3, K_MAX + 4), jnp.float32)
        cb = pdev[:, HDR:].reshape(w, B_CB, 2)
        packed, new_soft = self._c(
            llr, cb[:, :, 0], cb[:, :, 1], pdev[:, 6:9], pdev[:, 9:12],
            pdev[:, 12:15], pdev[:, 15:18], pdev[:, 2], pdev[:, 3],
            pdev[:, 4], softbuffer)
        return PendingWindow(packed, new_soft, tbs_list)

    results = WindowedUeDl.results

    def decode_window(self, samples, sf_indices, grants, softbuffer=None):
        p = self.dispatch_window(samples, sf_indices, grants, softbuffer)
        return self.results(p), p.softbuffer

# --------------------------------------------------------------------------
# 2-codeword (TM3/TM4) DL window — each TTI fills TWO stage-C slots
# --------------------------------------------------------------------------


def _build_win_b_mimo(w: int):
    """Spatial-multiplexing grant front-end for W TTIs: joint 2x2 MMSE
    (all 3 TM4 codebook PMIs computed + one-hot selected, or TM3
    large-delay CDD as variant 3) → layer demap → per-codeword demod/
    descramble.  Emits (W, 2, G_MAX) masked LLRs."""
    from .phy.mimo import layerdemap, predecode_cdd2, predecode_zf_mmse

    def one(grid_ri, ce_ri, noise, idx, n_re, qm1, qm2, pmi, signs1, signs2):
        grid = _ri2c(grid_ri)
        ce = _ri2c(ce_ri)
        y = grid.reshape(grid.shape[0], -1)[:, idx]             # (nrx, RE_MAX)
        h = ce.reshape(ce.shape[0], ce.shape[1], -1)[:, :, idx]  # (nrx,2,RE_MAX)
        xs, cs = [], []
        for p in range(3):  # TM4 codebook PMIs as static variants
            xv, cv = predecode_zf_mmse(y, h, 2, noise, pmi=p)
            xs.append(xv)
            cs.append(cv)
        xv, cv = predecode_cdd2(y, h, noise)  # TM3 (pmi == 3 selects CDD)
        xs.append(xv)
        cs.append(cv)
        x = jnp.where(pmi == 0, xs[0], jnp.where(pmi == 1, xs[1],
                      jnp.where(pmi == 2, xs[2], xs[3])))
        csi = jnp.where(pmi == 0, cs[0], jnp.where(pmi == 1, cs[1],
                        jnp.where(pmi == 2, cs[2], cs[3])))
        sym_cws = layerdemap(x, 2)
        csi_cws = layerdemap(csi.astype(jnp.complex64), 2)

        def demod_cw(sym, csi_c, qm, signs):
            llr = jnp.zeros((G_MAX,), jnp.float32)
            wcsi = jnp.real(csi_c)
            for mod_c, qm_c in zip(MODS, QMS):
                lc = demod_soft(mod_c, sym) * jnp.repeat(wcsi, qm_c)
                lc = jnp.zeros((G_MAX,), jnp.float32).at[: RE_MAX * qm_c].set(lc)
                llr = jnp.where(qm == qm_c, lc, llr)
            llr = llr * signs.astype(jnp.float32)
            mask = jnp.arange(G_MAX) < n_re * qm
            return jnp.where(mask, llr, 0.0)

        return jnp.stack([
            demod_cw(sym_cws[0], csi_cws[0], qm1, signs1),
            demod_cw(sym_cws[1], csi_cws[1], qm2, signs2),
        ])

    @jax.jit
    def fn(grid_ri, ce_ri, noise, idx, n_re, qm1, qm2, pmi, signs1, signs2):
        return jax.vmap(one)(grid_ri, ce_ri, noise, idx, n_re, qm1, qm2,
                             pmi, signs1, signs2)

    return fn


class WindowedUeDlMimo(WindowedUeDl):
    """2-codeword spatial-multiplexing windows (TM4 codebook PMIs 0-2 as
    data, TM3 CDD as pmi=3): W TTIs of DlGrant2 per dispatch — each TTI
    occupies TWO slots of the shared stage C (width 2W).  The reference's
    150 Mbps headline config (README.md:47) on the windowed dynamic
    path."""

    def __init__(self, cell: Cell, cfi: int = 1, w: int = 32,
                 max_iterations: int = 5):
        self.cell = cell
        self.cfi = cfi
        self.w = w
        self.scheme = "spatialmux"
        self.nof_ports = 2
        self.max_iterations = max_iterations
        self._a = _build_win_a(cell, w, 2)
        self._b = _build_win_b_mimo(w)
        self._c = _build_win_c(2 * w, max_iterations)
        self._ref_dev = {}
        self._idx_dev = {}
        self._signs_dev = {}
        self.stats = {"windows": 0, "ttis": 0, "crc_ok": 0}

    def _signs_q(self, rnti: int, sf_idx: int, q: int):
        key = (rnti, sf_idx, q)
        if key not in self._signs_dev:
            cinit = pdsch_cinit(rnti, sf_idx, self.cell.id, q=q)
            self._signs_dev[key] = jnp.asarray(
                gold_sequence_signs(cinit, G_MAX).astype(np.int8))
        return self._signs_dev[key]

    def dispatch_window(self, samples, sf_indices, grants,
                        softbuffer=None) -> PendingWindow:
        """samples: (W, nrx, sf_len) complex64; grants: DlGrant2 list
        (tx_scheme spatialmux -> pmi 0-2, cdd -> pmi slot 3)."""
        w = self.w
        assert len(sf_indices) == w and len(grants) == w
        samples_ri = np.stack([samples.real, samples.imag], axis=-1)
        peak = np.maximum(
            np.abs(samples_ri).reshape(w, -1).max(axis=1), 1e-12)
        scale = (peak / 127.0).astype(np.float32)
        samples_i8 = np.clip(
            np.round(samples_ri / scale[:, None, None, None]), -127, 127
        ).astype(np.int8)

        refs = _stacker(w)(*[self._ref(s) for s in sf_indices])
        idx_pairs = [self._idx(s, tuple(g.prb))
                     for s, g in zip(sf_indices, grants)]
        idx = _stacker(w)(*[p[0] for p in idx_pairs])
        signs1 = _stacker(w)(*[self._signs_q(g.rnti, s, 0)
                               for s, g in zip(sf_indices, grants)])
        signs2 = _stacker(w)(*[self._signs_q(g.rnti, s, 1)
                               for s, g in zip(sf_indices, grants)])

        HDR = 17
        params = np.zeros((2 * w, HDR + 2 * B_CB), np.int32)
        bparams = np.zeros((w, 4), np.int32)  # n_re, qm1, qm2, pmi
        tbs_list = []
        for i, g in enumerate(grants):
            n_re = idx_pairs[i][1]
            pmi = 3 if g.tx_scheme == "cdd" else g.pmi
            bparams[i] = (n_re, g.qm1, g.qm2, pmi)
            for cw, (tbs, qm, rv) in enumerate(
                ((g.tbs1, g.qm1, g.rv1), (g.tbs2, g.qm2, g.rv2))):
                row = 2 * i + cw
                segm = cbsegm(tbs)
                assert segm.C <= B_CB
                es = _e_split(n_re * qm, segm.C, qm, 1)
                cb_sizes = segm.cb_sizes
                k_minus = segm.K_minus if segm.C_minus > 0 else 40
                k3 = (cb_sizes[0], k_minus,
                      segm.K_plus if segm.C_plus > 0 else 40)
                f3 = (segm.F, 0, 0)
                params[row, :5] = (n_re, qm, rv, tbs,
                                   1 if segm.C > 1 else 0)
                for v in range(3):
                    ki = cb_size_index(k3[v])
                    params[row, 5 + v] = k3[v]
                    params[row, 8 + v] = f3[v]
                    params[row, 11 + v] = F1[ki]
                    params[row, 14 + v] = F2[ki]
                for c, k in enumerate(cb_sizes):
                    f = segm.F if c == 0 else 0
                    assert es[c] <= REP * (3 * (k + 4) - 2 * f)
                    cls = 0 if c == 0 else (1 if k == k_minus else 2)
                    params[row, HDR + 2 * c] = es[c]
                    params[row, HDR + 2 * c + 1] = cls
                tbs_list.append(tbs)
        pdev = jnp.asarray(params)
        bdev = jnp.asarray(bparams)

        grid_ri, ce_ri, noise = self._a(samples_i8, jnp.asarray(scale), refs)
        llr2 = self._b(grid_ri, ce_ri, noise, idx, bdev[:, 0], bdev[:, 1],
                       bdev[:, 2], bdev[:, 3], signs1, signs2)
        llr = llr2.reshape(2 * w, G_MAX)
        if softbuffer is None:
            softbuffer = jnp.zeros((2 * w, B_CB, 3, K_MAX + 4), jnp.float32)
        cb = pdev[:, HDR:].reshape(2 * w, B_CB, 2)
        packed, new_soft = self._c(
            llr, cb[:, :, 0], cb[:, :, 1], pdev[:, 5:8], pdev[:, 8:11],
            pdev[:, 11:14], pdev[:, 14:17], pdev[:, 2], pdev[:, 3],
            pdev[:, 4], softbuffer)
        return PendingWindow(packed, new_soft, tbs_list)

    def results(self, p: PendingWindow):
        """[( (tb1, ok1), (tb2, ok2), n_it )] * W."""
        rows = WindowedUeDl.results(self, p)
        self.stats["windows"] -= 1  # counted once per codeword pair below
        out = []
        for i in range(0, len(rows), 2):
            t1, ok1, n1 = rows[i]
            t2, ok2, n2 = rows[i + 1]
            out.append(((t1, ok1), (t2, ok2), max(n1, n2)))
        self.stats["windows"] += 1
        return out
