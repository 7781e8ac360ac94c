"""Transform (DFT) precoding for SC-FDMA, TS 36.211 §5.3.3.

Re-design of `lib/src/phy/dft/dft_precoding.c`.  Sizes are 12*n with n
composed of factors 2/3/5 (`srslte_dft_precoding_valid_prb`), so instead of
non-power-of-2 FFT plans we apply a precomputed DFT matrix — an (M, M)
complex matmul per symbol batch, which is exactly what the MXU wants at
these sizes (M ≤ 1200).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

def valid_nof_prb(n: int) -> bool:
    """n must factor into 2/3/5 (TS 36.211 §5.3.3)."""
    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n == 1


@lru_cache(maxsize=64)
def _dft_matrix(m: int, inverse: bool) -> np.ndarray:
    n = np.arange(m)
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * np.outer(n, n) / m) / np.sqrt(m)
    return w.astype(np.complex64)


def dft_precode(symbols):
    """(..., nsym, M) → DFT along last axis (normalized)."""
    m = symbols.shape[-1]
    return jnp.matmul(symbols, jnp.asarray(_dft_matrix(m, False)))


def dft_predecode(symbols):
    """Inverse transform (IDFT), used at the receiver."""
    m = symbols.shape[-1]
    return jnp.matmul(symbols, jnp.asarray(_dft_matrix(m, True)))
