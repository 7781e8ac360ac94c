"""CFO estimation/correction helpers, re-design of `lib/src/phy/sync/cfo.c`
and the CP-based estimator in `sync.c` (srslte_sync_set_cfo_cp_enable).

Batched over leading axes; corrections are pure elementwise multiplies
(XLA fuses them into neighbouring ops).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..common import CP, Cell, cp_len_ext, cp_len_norm


def cfo_apply(samples, cfo: float, symbol_sz: int):
    """Shift by `cfo` subcarrier spacings (vec_apply_cfo)."""
    n = jnp.arange(samples.shape[-1])
    rot = jnp.exp(-2j * jnp.pi * cfo * n / symbol_sz).astype(jnp.complex64)
    return samples * rot


def cfo_estimate_cp(samples, cell: Cell, nof_symbols: int = 7):
    """CP-based CFO estimate from one slot of samples (..., >= slot_len).

    Correlates each symbol's CP against its tail: the phase advance over
    exactly `symbol_sz` samples is 2*pi*cfo.  Returns CFO in subcarrier
    units, averaged over `nof_symbols`.
    """
    n = cell.symbol_sz
    acc = 0.0
    t = 0
    for l in range(nof_symbols):
        cp = (
            cp_len_norm(l, n) if cell.cp == CP.NORM else cp_len_ext(n)
        )
        cp_part = samples[..., t : t + cp]
        tail = samples[..., t + n : t + n + cp]
        acc = acc + jnp.sum(cp_part * jnp.conj(tail), axis=-1)
        t += cp + n
    return -jnp.angle(acc) / (2 * jnp.pi)


def sfo_estimate(t_offsets, period_s: float):
    """Sampling-frequency offset from a series of timing offsets (samples
    per measurement period) — `srslte_sync_sfo_estimate` analog.

    t_offsets: (..., n) timing offsets in samples at consecutive periods.
    Returns SFO in Hz (samples drift per second).
    """
    d = jnp.diff(t_offsets, axis=-1)
    return jnp.mean(d, axis=-1) / period_s


def cp_detect(samples, symbol_sz: int):
    """Detect normal vs extended CP from CP-correlation energy
    (ref sync.c srslte_sync_detect_cp): correlate each candidate CP
    length's guard against the symbol tail over one slot.

    samples: (>= slot worth,) complex. Returns (is_extended, metric_norm,
    metric_ext).
    """
    import jax.numpy as jnp
    from ..common import cp_len_ext, cp_len_norm

    n = symbol_sz

    def metric(cp_lens):
        pos = 0
        acc = 0.0
        eng = 1e-12
        for cp in cp_lens:
            a = jnp.asarray(samples[pos : pos + cp])
            b = jnp.asarray(samples[pos + n : pos + n + cp])
            acc = acc + jnp.abs(jnp.sum(a * jnp.conj(b)))
            eng = eng + jnp.sqrt(jnp.sum(jnp.abs(a) ** 2) * jnp.sum(jnp.abs(b) ** 2))
            pos += cp + n
        return acc / eng

    norm_lens = [cp_len_norm(l, n) for l in range(7)]
    ext_lens = [cp_len_ext(n)] * 6
    m_norm = float(metric(norm_lens))
    m_ext = float(metric(ext_lens))
    return m_ext > m_norm, m_norm, m_ext
