"""Pallas TPU kernel for the windowed max-log-MAP pass.

The TPU-native analog of the reference's SIMD windowed MAP
(`turbodecoder_win.h:576-787`): trellis states ride the VPU's 8 sublanes,
(codeblock x window) pairs fill the lanes, and one kernel runs the whole
pass with every intermediate in VMEM — no HBM round-trip for the
per-position state metrics (the XLA scan writes/reads ~50 MB of alphas per
pass at K=6144, B=256).

Design (v2 — the round-1 kernel lost to the XLA scan; this one is shaped
by what that measurement taught):

* **Fused counter-recursions.** Alpha runs forward while beta runs
  backward in the SAME fori_loop; they are independent until the
  posterior.  Training for both boundaries is likewise one fused loop.
  Sequential depth: T + lw instead of 2*(T + lw).
* **Posteriors emitted in the second half.**  At step j >= lw/2 both the
  live alpha carry (position j) and the stored beta (position j+1) exist,
  and symmetrically for the mirrored position lw-1-j — each late step
  emits two posterior rows.  Only the first half of each metric array is
  ever stored: scratch is lw/2 entries of alpha plus lw/2 of beta (half
  the round-1 kernel's footprint), so a 2048-lane tile fits VMEM in f32.
* **No MXU in the hot loop.**  The 8-state predecessor/successor
  permutations are static sublane slice-concats (round 1 used an 8x8
  one-hot matmul per step — per-step MXU latency swamped the VPU work).
* **No per-step renormalisation.**  float32 carries a window's worth of
  metric growth easily; constant per-lane offsets cancel in m1 - m0.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
import os as _os

# bf16 metric scratch halves VMEM → 4096-lane tiles → half the sequential
# steps (the pallas grid is serial on the v5e's single core).  Costs a
# per-step renorm + ~0.4 LLR units of storage quantisation.  Measured
# 2026-08 (r2) and RE-TESTED 2026-08-21 (r3): the bf16 variant still
# trips the axon remote Mosaic INTERNAL error (remote_compile HTTP 500,
# like chunked pl.ds reads) — stays opt-in until the toolchain accepts
# it; the f32/2048-lane default compiles and beats the scan (4.97 vs
# 6.2 ms per 256-CB decode at K=6144).  A plain-XLA bf16 scan was also
# measured r3: 8.7 ms — the per-step renorm it needs erases the gain,
# so the narrow-metric path is only worth it inside VMEM.
BF16_SCRATCH = _os.environ.get("TURBO_PALLAS_BF16", "0") == "1"
# r4 tile sweep on the v5e (K=6144, B=256 full decode, one process):
# 256→5.03 ms, 512→4.91 ms, 1024→5.18 ms, 2048→5.57 ms, 4096→Mosaic
# INTERNAL.  Narrow tiles win: the serial grid is not the limit (32
# tiles at 512 lanes beat 8 at 2048) — per-step VPU width is.
TILE_N = int(_os.environ.get(
    "TURBO_PALLAS_TILE", "1024" if BF16_SCRATCH else "512"))


@lru_cache(maxsize=1)
def _tables():
    from .turbo import _trellis

    t = _trellis()
    return dict(
        ps0=tuple(int(v) for v in t["prev_state"][:, 0]),
        ps1=tuple(int(v) for v in t["prev_state"][:, 1]),
        ns0=tuple(int(v) for v in t["next_state"][:, 0]),
        ns1=tuple(int(v) for v in t["next_state"][:, 1]),
    )


def _row_perm(v, idx):
    """Static sublane permutation of an (8, n) tensor (compiles to
    sublane shuffles — no MXU, no gather)."""
    return jnp.concatenate([v[i : i + 1] for i in idx], axis=0)


def _signs(n):
    """±1 branch-sign columns derived in-kernel from iota + trellis bit
    algebra (Mosaic only inlines scalar/splat constants):
      state s = r0 + 2 r1 + 4 r2;
        prev_u(s', u=0) sign   = ±(b0' ^ b2')
        prev_parity(s', u=0)   = ±(b0' ^ b1')
        parity(s, u=0)         = ±(r0 ^ r1)
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    b0, b1 = row & 1, (row >> 1) & 1
    b2 = (row >> 2) & 1
    f = lambda v: (2 * v - 1).astype(jnp.float32)
    c_spu0 = f(b0 ^ b2)
    c_spp0 = f(b0 ^ b1)
    c_sp0 = f(b0 ^ b1)
    return c_spu0, c_spp0, c_sp0


def _map_kernel(T: int, lw: int, dyn: bool = False):
    """dyn=True adds per-lane mid-stream beta injection for dynamic-K
    codeblocks (`turbo_dyn.map_decoder_dyn`): an extra (1, bn) float32
    input `kq` holds the backward-carry position (K - w*lw, in [1, lw])
    at which the lane's exact tail beta replaces the carry; 0 = never.
    The static kernel's end-of-window b_mask init is the q == lw special
    case of the same mechanism."""
    tb = _tables()
    ps0, ps1 = tb["ps0"], tb["ps1"]
    ns0, ns1 = tb["ns0"], tb["ns1"]
    assert list(ps0) == [0, 0, 1, 1, 2, 2, 3, 3] and list(ps1) == [4, 4, 5, 5, 6, 6, 7, 7]
    half = lw // 2

    # positions processed per fori iteration: the static unroll amortizes
    # the loop's per-iteration overhead.  Row access must stay in the
    # direct-index form — pl.ds BLOCK reads inside these loops trip an
    # INTERNAL error in the axon remote Mosaic compiler.  Measured on the
    # v5e (K=6144, B=256): CH=8 2.83 ms vs CH=1 2.90 ms vs XLA scan
    # 3.2 ms per MAP pass.
    import os

        # radix-4 training recursions (VERDICT r4 item 4): two trellis steps
    # merged into one 4-way ACS over composite predecessor tables — same
    # total VPU work but a shallower dependency chain per position pair.
    # Measured on the v5e (K=6144, B=1024, full decode, fresh process
    # each): 465 Mbps radix-2 vs 483 Mbps radix-4 (+3.8%) — the serial
    # training loop is partially latency-bound.  Bit-exact vs radix-2
    # (interpret-mode A/B).  Default ON; TURBO_PALLAS_RADIX4=0 reverts.
    RADIX4 = os.environ.get("TURBO_PALLAS_RADIX4", "1") == "1"
    CH = int(os.environ.get("TURBO_PALLAS_CHUNK", "8"))
    while CH > 1 and (half % CH or T % CH):
        CH //= 2  # adapt to layouts the requested chunk doesn't divide
    scr_t = jnp.bfloat16 if BF16_SCRATCH else jnp.float32
    renorm = BF16_SCRATCH  # keep magnitudes inside bf16's mantissa

    def kernel(
        axt_ref, azt_ref, ax_ref, az_ref, bxt_ref, bzt_ref,
        amask_ref, bmask_ref, bknown_ref, *rest,
    ):
        if dyn:
            kq_ref, out_ref, a_scr, b_scr = rest
        else:
            out_ref, a_scr, b_scr = rest
        n = axt_ref.shape[1]
        # sign constants hoisted out of the hot loops
        c_spu0, c_spp0, c_sp0 = _signs(n)

        def alpha_step(a, xt, zt):
            g = c_spu0 * xt + c_spp0 * zt
            a0 = jnp.repeat(a[:4], 2, axis=0)  # a[ps0]
            a1 = jnp.repeat(a[4:], 2, axis=0)  # a[ps1]
            return jnp.maximum(a0 + g, a1 - g)

        def beta_branches(b, xt, zt):
            gz = c_sp0 * zt
            bp0 = _row_perm(b, ns0)
            bp1 = _row_perm(b, ns1)
            return bp0 + (gz - xt), bp1 + (xt - gz)

        def read_rows(ref, start):
            """CH rows starting at `start`, as direct dynamic row reads
            (the only access form the axon remote Mosaic compiler accepts;
            pl.ds block reads inside these loops trip an INTERNAL error).
            CH > 1 still amortizes the fori_loop overhead via unrolling."""
            return [ref[start + i] for i in range(CH)]

        # --- fused boundary training (alpha forward, beta backward) ---
        # radix-4 composite predecessor/successor tables (two-step maps)
        ps00 = tuple(ps0[ps0[s]] for s in range(8))
        ps10 = tuple(ps1[ps0[s]] for s in range(8))
        ps01 = tuple(ps0[ps1[s]] for s in range(8))
        ps11 = tuple(ps1[ps1[s]] for s in range(8))
        ns00 = tuple(ns0[ns0[s]] for s in range(8))
        ns10 = tuple(ns1[ns0[s]] for s in range(8))
        ns01 = tuple(ns0[ns1[s]] for s in range(8))
        ns11 = tuple(ns1[ns1[s]] for s in range(8))

        def alpha_step2(a, x1, z1, x2, z2):
            """Two trellis steps as one 4-way ACS (radix-4): same total
            work, shallower dependency chain."""
            g1 = c_spu0 * x1 + c_spp0 * z1
            g2 = c_spu0 * x2 + c_spp0 * z2
            g1p0 = _row_perm(g1, ps0)
            g1p1 = _row_perm(g1, ps1)
            t0 = jnp.maximum(_row_perm(a, ps00) + g1p0,
                             _row_perm(a, ps10) - g1p0) + g2
            t1 = jnp.maximum(_row_perm(a, ps01) + g1p1,
                             _row_perm(a, ps11) - g1p1) - g2
            return jnp.maximum(t0, t1)

        def beta_step2(b, x1, z1, x2, z2):
            """Two backward steps: gamma of the FIRST consumed position
            (x1/z1) applies at the inner (later-position) transition."""
            gz1 = c_sp0 * z1 - x1          # u=0 branch metric at pos t
            gz2 = c_sp0 * z2 - x2          # u=0 branch metric at pos t-1
            g1n0 = _row_perm(gz1, ns0)
            g1n1 = _row_perm(gz1, ns1)
            t0 = jnp.maximum(_row_perm(b, ns00) + g1n0,
                             _row_perm(b, ns10) - g1n0) + gz2
            t1 = jnp.maximum(_row_perm(b, ns01) + g1n1,
                             _row_perm(b, ns11) - g1n1) - gz2
            return jnp.maximum(t0, t1)

        def tr_body(c, carry):
            a, b = carry
            t0 = c * CH
            ax = read_rows(axt_ref, t0)
            az = read_rows(azt_ref, t0)
            bx = read_rows(bxt_ref, T - CH - t0)
            bz = read_rows(bzt_ref, T - CH - t0)
            if RADIX4 and CH % 2 == 0:
                for i in range(0, CH, 2):
                    a = alpha_step2(a, ax[i][None, :], az[i][None, :],
                                    ax[i + 1][None, :], az[i + 1][None, :])
                    b = beta_step2(b, bx[CH - 1 - i][None, :],
                                   bz[CH - 1 - i][None, :],
                                   bx[CH - 2 - i][None, :],
                                   bz[CH - 2 - i][None, :])
            else:
                for i in range(CH):
                    a = alpha_step(a, ax[i][None, :], az[i][None, :])
                    b0, b1 = beta_branches(b, bx[CH - 1 - i][None, :], bz[CH - 1 - i][None, :])
                    b = jnp.maximum(b0, b1)
            # keep training magnitudes bounded (T can exceed a window)
            return a - a[0:1], b - b[0:1]

        z8 = jnp.zeros((8, n), jnp.float32)
        a, b = jax.lax.fori_loop(0, T // CH, tr_body, (z8, z8))
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        known = jnp.where(row == 0, 0.0, NEG_INF)  # exact state-0 start
        a = jnp.where(amask_ref[0][None, :] > 0, known, a)
        b = jnp.where(bmask_ref[0][None, :] > 0, bknown_ref[:], b)

        def inject(b, q):
            """Dynamic-K: replace the backward carry (beta at position q)
            with the lane's exact tail beta where q == kq."""
            if not dyn:
                return b
            return jnp.where(kq_ref[0][None, :] == q.astype(jnp.float32),
                             bknown_ref[:], b)

        # --- first half: pure recursions, metrics stored (no posteriors
        # are computable yet) ---
        def store_body(c, carry):
            a, b = carry
            j0 = c * CH
            m0 = lw - CH - j0  # mirrored chunk start
            ax = read_rows(ax_ref, j0)
            az = read_rows(az_ref, j0)
            bx = read_rows(ax_ref, m0)
            bz = read_rows(az_ref, m0)
            for i in range(CH):
                b = inject(b, m0 + (CH - i))
                a_scr[j0 + i] = a.astype(scr_t)
                # b_scr[t - half] holds beta at position t+1 for t in the
                # second half; carry here is beta at position m0+CH-i
                b_scr[m0 - half + CH - 1 - i] = b.astype(scr_t)
                a = alpha_step(a, ax[i][None, :], az[i][None, :])
                b0, b1 = beta_branches(b, bx[CH - 1 - i][None, :], bz[CH - 1 - i][None, :])
                b = jnp.maximum(b0, b1)
                if renorm:
                    a = a - a[0:1]
                    b = b - b[0:1]
            return a, b

        a, b = jax.lax.fori_loop(0, half // CH, store_body, (a, b))

        # --- second half: each iteration emits two CH-row posterior blocks;
        # the beta recursion's branch metrics double as the mirrored
        # posterior's ---
        def post_body(c, carry):
            a, b = carry
            j0 = half + c * CH
            m0 = lw - CH - c * CH - half  # mirrored chunk start
            ax = read_rows(ax_ref, j0)
            az = read_rows(az_ref, j0)
            bx = read_rows(ax_ref, m0)
            bz = read_rows(az_ref, m0)
            # beta at j+1 for rows j0.. / alpha at rows m0..
            b_next = [b_scr[j0 - half + i] for i in range(CH)]
            a_prev = [a_scr[m0 + i] for i in range(CH)]
            for i in range(CH):
                xa, za = ax[i][None, :], az[i][None, :]
                xb, zb = bx[CH - 1 - i][None, :], bz[CH - 1 - i][None, :]
                # mirrored posterior at t = m0+CH-1-i (shares the beta
                # recursion's branch metrics)
                b = inject(b, m0 + (CH - i))
                b0m, b1m = beta_branches(b, xb, zb)
                am = a_prev[CH - 1 - i].astype(jnp.float32)
                out_ref[m0 + CH - 1 - i] = (
                    jnp.max(am + b1m, axis=0) - jnp.max(am + b0m, axis=0))
                b = jnp.maximum(b0m, b1m)
                # forward posterior at t = j0+i: live alpha + stored beta
                b0, b1 = beta_branches(b_next[i].astype(jnp.float32), xa, za)
                out_ref[j0 + i] = (
                    jnp.max(a + b1, axis=0) - jnp.max(a + b0, axis=0))
                a = alpha_step(a, xa, za)
                if renorm:
                    a = a - a[0:1]
                    b = b - b[0:1]
            return a, b

        jax.lax.fori_loop(0, half // CH, post_body, (a, b))

    return kernel


@partial(jax.jit, static_argnames=("T", "lw", "interpret"))
def map_windows_pallas(
    ax_tr, az_tr, ax, az, bx_tr, bz_tr, a_mask, b_mask, b_known,
    T: int, lw: int, interpret: bool = False, kq=None,
):
    """Run the windowed MAP over all lanes.

    ax_tr/az_tr/bx_tr/bz_tr: (T, bn); ax/az: (lw, bn);
    a_mask/b_mask: (1, bn) 1.0 where the lane is window 0 / last window;
    b_known: (8, bn) exact beta_K for last-window lanes.
    kq: optional (1, bn) float32 — dynamic-K beta-injection positions
    (K - w*lw in [1, lw], 0 = never); with kq, pass b_mask zeros and
    b_known the per-lane tail beta (the q == lw case replaces the static
    init).  Returns posterior (lw, bn) float32.
    """
    assert lw % 2 == 0
    bn = ax.shape[1]
    # tile the lane axis: tn must divide bn AND be a multiple of 128
    # (Mosaic block rule) — otherwise fall back to one full-width tile
    # (block == array is always legal).  bn is not always a power of two
    # (e.g. 26 same-K codeblocks x 64 windows = 1664 lanes).
    tn = bn
    for tiles in range(-(-bn // TILE_N), bn + 1):
        if bn % tiles == 0 and (bn // tiles) % 128 == 0:
            tn = bn // tiles
            break
    tiles = bn // tn
    dyn = kq is not None
    kernel = _map_kernel(T, lw, dyn)
    if BF16_SCRATCH:
        # halve the double-buffered input VMEM too — the 4096-lane tile
        # otherwise exceeds the 16 MB scoped-vmem limit (observed 18.04M)
        ax_tr, az_tr, ax, az, bx_tr, bz_tr = (
            v.astype(jnp.bfloat16) for v in (ax_tr, az_tr, ax, az, bx_tr, bz_tr))

    def spec(rows):
        return pl.BlockSpec((rows, tn), lambda i: (0, i), memory_space=pltpu.VMEM)

    ins = [ax_tr, az_tr, ax, az, bx_tr, bz_tr, a_mask, b_mask, b_known]
    in_specs = [
        spec(T), spec(T), spec(lw), spec(lw), spec(T), spec(T),
        spec(1), spec(1), spec(8),
    ]
    if dyn:
        ins.append(kq)
        in_specs.append(spec(1))
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=spec(lw),
        out_shape=jax.ShapeDtypeStruct((lw, bn), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((lw // 2, 8, tn), jnp.bfloat16 if BF16_SCRATCH else jnp.float32),
            pltpu.VMEM((lw // 2, 8, tn), jnp.bfloat16 if BF16_SCRATCH else jnp.float32),
        ],
        interpret=interpret,
    )(*ins)
