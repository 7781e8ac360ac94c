"""UCI coding: Reed-Muller block codes for CQI/ACK, TS 36.212 §5.2.2.6 / §5.2.3.3.

Re-design of `lib/src/phy/phch/uci.c` / `cqi.c`: the (32, O) and (20, A)
codes are linear — encoding is a GF(2) matmul with the spec basis matrices,
decoding is ML over all 2^O codewords as ONE correlation matmul (O ≤ 11/13).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .uci_data import RM20_BASIS, RM32_BASIS


def rm_encode(bits: np.ndarray, n_out: int, basis=RM32_BASIS) -> np.ndarray:
    """Encode O ≤ width(b) bits → n_out bits (circular repetition)."""
    basis = np.asarray(basis, np.uint8)
    o = len(bits)
    cw = (basis[:, :o] @ np.asarray(bits, np.uint8)) % 2
    reps = -(-n_out // len(cw))
    return np.tile(cw, reps)[:n_out].astype(np.uint8)


@lru_cache(maxsize=32)
def _codebook(o: int, n_out: int, use20: bool) -> np.ndarray:
    """(2^o, n_out) ±1 codeword matrix for ML decoding."""
    basis = np.asarray(RM20_BASIS if use20 else RM32_BASIS, np.uint8)
    msgs = ((np.arange(2**o)[:, None] >> np.arange(o)[None, :]) & 1).astype(np.uint8)
    cw = (msgs @ basis[:, :o].T) % 2  # (2^o, 32|20)
    reps = -(-n_out // cw.shape[1])
    cw = np.tile(cw, (1, reps))[:, :n_out]
    return (1.0 - 2.0 * cw).astype(np.float32)


def rm_decode(llr, o: int, use20: bool = False):
    """ML decode (..., E) LLRs (positive ⇒ bit 1) → ((..., o) bits, metric).

    One matmul against the full codebook — the TPU way to brute-force 2^O.
    """
    e = llr.shape[-1]
    book = jnp.asarray(_codebook(o, e, use20))  # (2^o, E) in ±1 (bit0→+1)
    # LLR>0 ⇒ bit 1 ⇒ soft value -LLR matches +1 for bit 0
    corr = jnp.einsum("...e,ce->...c", -llr, book)
    best = jnp.argmax(corr, axis=-1)
    bits = ((best[..., None] >> jnp.arange(o)) & 1).astype(jnp.uint8)
    metric = jnp.max(corr, axis=-1) / (jnp.sum(jnp.abs(llr), axis=-1) + 1e-9)
    return bits, metric
