"""Pallas TPU kernel for the windowed max-log-MAP pass.

The TPU-native analog of the reference's SIMD windowed MAP
(`turbodecoder_win.h:576-787`): trellis states ride the VPU's 8 sublanes,
(codeblock x window) pairs fill the lanes, and the whole
alpha-train / alpha / beta-train / beta+posterior recursion runs inside
one kernel with the alpha metrics held in VMEM scratch — no HBM traffic
for the per-position state tensor (the XLA scan version writes/reads
~50 MB of alphas per pass at K=6144, B=256).

The grid tiles the lane axis; each program owns TILE_N lanes end-to-end.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
TILE_N = 2048


@lru_cache(maxsize=1)
def _tables():
    from .turbo import _trellis

    t = _trellis()
    sp = (2.0 * t["parity"] - 1.0).astype(np.float32)  # (8,2)
    spp = (2.0 * t["prev_parity"] - 1.0).astype(np.float32)
    spu = (2.0 * t["prev_u"] - 1.0).astype(np.float32)
    return dict(
        spu0=spu[:, 0:1], spu1=spu[:, 1:2], spp0=spp[:, 0:1], spp1=spp[:, 1:2],
        sp0=sp[:, 0:1], sp1=sp[:, 1:2],
        ps0=t["prev_state"][:, 0], ps1=t["prev_state"][:, 1],
        ns0=t["next_state"][:, 0], ns1=t["next_state"][:, 1],
    )


def _perm_matrix(idx) -> np.ndarray:
    """(8,8) one-hot matrix P with (P @ a)[i] = a[idx[i]]."""
    p = np.zeros((8, 8), np.float32)
    p[np.arange(8), np.asarray(idx)] = 1.0
    return p


def _map_kernel(T: int, lw: int):
    tb = _tables()
    # row permutations are static python indices (sublane shuffles);
    # the ±1 sign patterns are derived in-kernel from iota + trellis bit
    # algebra, since Mosaic only inlines scalar/splat constants:
    #   state s = r0 + 2 r1 + 4 r2; branch into s' with input u:
    #     prev_u(s',r2)    = b0' ^ b2' ^ r2
    #     prev_parity(s')  = b0' ^ b1' ^ r2
    #     parity(s,u)      = r0 ^ r1 ^ u
    ps0, ps1 = tb["ps0"], tb["ps1"]
    ns0, ns1 = tb["ns0"], tb["ns1"]

    def _signs(n):
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        b0, b1, b2 = row & 1, (row >> 1) & 1, (row >> 2) & 1
        f = lambda v: (2 * v - 1).astype(jnp.float32)
        c_spu0 = f(b0 ^ b2)
        c_spp0 = f(b0 ^ b1)
        c_sp0 = f(b0 ^ b1)
        return c_spu0, -c_spu0, c_spp0, -c_spp0, c_sp0, -c_sp0

    # alpha's predecessor permutations are sublane repeats
    # (ps0 = [0,0,1,1,2,2,3,3], ps1 = ps0 + 4); beta's successor gather is
    # an (8,8) one-hot matmul pns0 @ b on the otherwise-idle MXU, and
    # ns1 = ns0 of the half-swapped rows, i.e. roll(pns0 @ b, 4 sublanes).
    assert list(ps0) == [0, 0, 1, 1, 2, 2, 3, 3] and list(ps1) == [4, 4, 5, 5, 6, 6, 7, 7]
    assert list(ns1) == [int(ns0[(i + 4) % 8]) for i in range(8)]

    def alpha_step(a, xt, zt, _pns0):
        c_spu0, c_spu1, c_spp0, c_spp1, _, _ = _signs(a.shape[1])
        a0 = jnp.repeat(a[:4], 2, axis=0)
        a1 = jnp.repeat(a[4:], 2, axis=0)
        new = jnp.maximum(a0 + (c_spu0 * xt + c_spp0 * zt), a1 + (c_spu1 * xt + c_spp1 * zt))
        return new - new[0:1]

    def beta_core(b, xt, zt, pns0):
        _, _, _, _, c_sp0, c_sp1 = _signs(b.shape[1])
        g0 = -xt + c_sp0 * zt
        g1 = xt + c_sp1 * zt
        bp0 = jnp.dot(pns0, b, preferred_element_type=jnp.float32)
        bp1 = pltpu.roll(bp0, 4, axis=0)
        return bp0 + g0, bp1 + g1

    def kernel(
        axt_ref, azt_ref, ax_ref, az_ref, bxt_ref, bzt_ref,
        amask_ref, bmask_ref, bknown_ref, pns0_ref, out_ref, alphas_scr,
    ):
        n = axt_ref.shape[1]
        pns0 = pns0_ref[:, :8]

        # --- alpha training (zero init) ---
        def a_tr_body(t, a):
            return alpha_step(a, axt_ref[t][None, :], azt_ref[t][None, :], pns0)

        a = jax.lax.fori_loop(0, T, a_tr_body, jnp.zeros((8, n), jnp.float32), unroll=4)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        known = jnp.where(row == 0, 0.0, NEG_INF)  # exact state-0 start
        a = jnp.where(amask_ref[0][None, :] > 0, known, a)

        # --- alpha main, storing pre-update metrics ---
        def a_body(t, a):
            alphas_scr[t] = a
            return alpha_step(a, ax_ref[t][None, :], az_ref[t][None, :], pns0)

        jax.lax.fori_loop(0, lw, a_body, a, unroll=4)

        # --- beta training (reverse over the training window) ---
        def b_tr_body(t, b):
            xt = bxt_ref[T - 1 - t][None, :]
            zt = bzt_ref[T - 1 - t][None, :]
            b0, b1 = beta_core(b, xt, zt, pns0)
            new = jnp.maximum(b0, b1)
            return new - new[0:1]

        b = jax.lax.fori_loop(0, T, b_tr_body, jnp.zeros((8, n), jnp.float32), unroll=4)
        b = jnp.where(bmask_ref[0][None, :] > 0, bknown_ref[:], b)

        # --- beta + posterior, backward ---
        def b_body(i, b):
            t = lw - 1 - i
            xt = ax_ref[t][None, :]
            zt = az_ref[t][None, :]
            b0, b1 = beta_core(b, xt, zt, pns0)
            a_t = alphas_scr[t]
            m0 = jnp.max(a_t + b0, axis=0)
            m1 = jnp.max(a_t + b1, axis=0)
            out_ref[t] = m1 - m0
            new = jnp.maximum(b0, b1)
            return new - new[0:1]

        jax.lax.fori_loop(0, lw, b_body, b, unroll=4)

    return kernel


@partial(jax.jit, static_argnames=("T", "lw", "interpret"))
def map_windows_pallas(
    ax_tr, az_tr, ax, az, bx_tr, bz_tr, a_mask, b_mask, b_known,
    T: int, lw: int, interpret: bool = False,
):
    """Run the windowed MAP over all lanes.

    ax_tr/az_tr/bx_tr/bz_tr: (T, bn); ax/az: (lw, bn);
    a_mask/b_mask: (1, bn) 1.0 where the lane is window 0 / last window;
    b_known: (8, bn) exact beta_K for last-window lanes.
    Returns posterior (lw, bn) float32.
    """
    bn = ax.shape[1]
    tiles = max(1, bn // TILE_N)
    tn = bn // tiles
    kernel = _map_kernel(T, lw)
    tb = _tables()
    pns0 = np.zeros((8, 128), np.float32)
    pns0[:, :8] = _perm_matrix(tb["ns0"])
    pns0_j = jnp.asarray(pns0)

    def spec(rows):
        return pl.BlockSpec((rows, tn), lambda i: (0, i), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            spec(T), spec(T), spec(lw), spec(lw), spec(T), spec(T),
            spec(1), spec(1), spec(8),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec(lw),
        out_shape=jax.ShapeDtypeStruct((lw, bn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((lw, 8, tn), jnp.float32)],
        interpret=interpret,
    )(ax_tr, az_tr, ax, az, bx_tr, bz_tr, a_mask, b_mask, b_known, pns0_j)
