"""UL channel estimation from PUSCH DMRS (re-design of
`lib/src/phy/ch_estimation/chest_ul.c`).

LS at the two DMRS symbols → average → optional frequency smoothing →
constant extrapolation across the slot's data symbols.  Same matmul
formulation as `chest_dl`.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

import jax.numpy as jnp
import numpy as np

from ..common import Cell
from .chest_dl import _smooth_matrix
from .refsignal_ul import dmrs_symbol_in_slot, pusch_dmrs


def chest_ul(rx_grid, cell: Cell, prb_start: int, nof_prb_alloc: int, cyclic_shift: int = 0, smooth_len: int = 5):
    """Estimate the UL channel over the allocation.

    rx_grid: (..., nsymb_sf, nre) received grid.
    Returns (ce (..., nsymb_sf, 12*nof_prb_alloc), noise_est (...,)).
    """
    return _chest_ul_fn(cell, prb_start, nof_prb_alloc, cyclic_shift, smooth_len)(rx_grid)


@_lru_cache(maxsize=512)
def _chest_ul_fn(cell: Cell, prb_start: int, nof_prb_alloc: int,
                 cyclic_shift: int, smooth_len: int):
    """Cached jitted estimator per static allocation (see chest_dl's
    `_chest_dl_fn`) — the eager version cost ~6 ms/call in per-op
    dispatch on the eNB control path."""
    import jax

    return jax.jit(lambda g: _chest_ul_impl(
        g, cell, prb_start, nof_prb_alloc, cyclic_shift, smooth_len))


def _chest_ul_impl(rx_grid, cell, prb_start, nof_prb_alloc, cyclic_shift, smooth_len):
    m_sc = 12 * nof_prb_alloc
    k0 = prb_start * 12
    l_dmrs = dmrs_symbol_in_slot(cell)
    syms = (l_dmrs, cell.nsymb_per_slot + l_dmrs)
    r = np.stack(
        [np.conj(pusch_dmrs(cell, nof_prb_alloc, cyclic_shift, s)) for s in range(2)]
    )
    pilots = rx_grid[..., jnp.asarray(syms), k0 : k0 + m_sc]  # (..., 2, m_sc)
    ls = pilots * jnp.asarray(r)
    sm = jnp.asarray(_smooth_matrix(m_sc, smooth_len))
    ls_s = jnp.einsum("np,...sp->...sn", sm, ls)
    # noise from residual
    resid = ls - ls_s
    noise = jnp.mean(jnp.abs(resid) ** 2, axis=(-1, -2))
    # time: linear interpolation between the two DMRS symbols, clamped
    t = np.zeros((cell.nsymb_per_sf, 2), np.float32)
    l0, l1 = syms
    for l in range(cell.nsymb_per_sf):
        if l <= l0:
            t[l, 0] = 1.0
        elif l >= l1:
            t[l, 1] = 1.0
        else:
            w = (l - l0) / (l1 - l0)
            t[l] = (1.0 - w, w)
    ce = jnp.einsum("ls,...sn->...ln", jnp.asarray(t), ls_s)
    return ce.astype(jnp.complex64), noise
