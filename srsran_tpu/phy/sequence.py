"""Gold (pseudo-random) sequence generation, TS 36.211 §7.2.

Semantic parity with the reference generator (`lib/src/phy/common/sequence.c:
48-131`): length-31 Gold sequence, x1 seeded with 1, x2 seeded with c_init,
output starts after Nc=1600 steps.

Two implementations:

* `gold_sequence` — host-side numpy, word-parallel (28 new bits per python
  step, the same parallel-LFSR trick the reference uses with SSE).  Sequences
  are *data*: precompute per (cell, rnti, subframe) config, cache, and pass
  the resulting array into jitted kernels.  This keeps scrambling a pure
  XOR/elementwise multiply on device.

* `gold_sequence_jax` — in-graph version built on `lax.scan` over 28-bit
  words, vmappable over a batch of c_init values (used when the c_init is a
  traced value, e.g. batched blind-search candidates).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

NC = 1600
_STEP = 28  # bits generated per word step (tap span is 3 → 31-3=28 safe)
_MASK31 = (1 << 31) - 1


def _x1_word(s: int) -> int:
    # x1(n+31) = x1(n+3) ^ x1(n)
    return ((s >> 3) ^ s) & ((1 << _STEP) - 1)


def _x2_word(s: int) -> int:
    # x2(n+31) = x2(n+3) ^ x2(n+2) ^ x2(n+1) ^ x2(n)
    return ((s >> 3) ^ (s >> 2) ^ (s >> 1) ^ s) & ((1 << _STEP) - 1)


def _advance(state: int, nbits: int, word_fn) -> int:
    """Advance a 31-bit LFSR state by nbits (python ints, exact)."""
    while nbits >= _STEP:
        new = word_fn(state)
        state = ((state >> _STEP) | (new << (31 - _STEP))) & _MASK31
        nbits -= _STEP
    if nbits:
        new = word_fn(state) & ((1 << nbits) - 1)
        state = ((state >> nbits) | (new << (31 - nbits))) & _MASK31
    return state


@lru_cache(maxsize=4096)
def _gold_cached(c_init: int, length: int) -> bytes:
    x1 = _advance(1, NC, _x1_word)
    x2 = _advance(c_init & _MASK31, NC, _x2_word)
    nwords = -(-length // _STEP)
    words = np.empty(nwords, dtype=np.uint32)
    for i in range(nwords):
        # state bit k == sequence bit n+k, so the low 28 state bits are output
        words[i] = (x1 ^ x2) & ((1 << _STEP) - 1)
        x1 = _advance(x1, _STEP, _x1_word)
        x2 = _advance(x2, _STEP, _x2_word)
    bits = (words[:, None] >> np.arange(_STEP, dtype=np.uint32)[None, :]) & 1
    return bits.astype(np.uint8).reshape(-1)[:length].tobytes()


def gold_sequence(c_init: int, length: int) -> np.ndarray:
    """Gold sequence c(n), n=0..length-1 as uint8 {0,1} numpy array."""
    return np.frombuffer(_gold_cached(int(c_init), int(length)), dtype=np.uint8).copy()


def gold_sequence_signs(c_init: int, length: int) -> np.ndarray:
    """(-1)^c(n) as float32 — the form used to scramble LLRs/symbols."""
    return (1.0 - 2.0 * gold_sequence(c_init, length)).astype(np.float32)


# --- in-graph (traced c_init) version --------------------------------------


def _lfsr_scan_words(state0, nwords: int, taps_fn):
    """Return (nwords, 28) bits via lax.scan; state0 is int32 scalar."""

    def step(s, _):
        s = s.astype(jnp.uint32)
        new = taps_fn(s) & jnp.uint32((1 << _STEP) - 1)
        bits = (s >> jnp.arange(_STEP, dtype=jnp.uint32)) & 1
        s_next = ((s >> _STEP) | (new << (31 - _STEP))) & jnp.uint32(_MASK31)
        return s_next, bits

    _, out = jax.lax.scan(step, state0.astype(jnp.uint32), None, length=nwords)
    return out.reshape(-1)


def gold_sequence_jax(c_init, length: int):
    """Traced Gold sequence: c_init may be a traced uint32; length static.

    Returns uint8 {0,1} of shape (length,).  Cost: O(length/28) scan steps.
    """
    nwords_nc = NC // _STEP  # 1600 = 57*28 + 4 → advance 57 words then 4 bits
    rem = NC - nwords_nc * _STEP

    def x1_taps(s):
        return (s >> 3) ^ s

    def x2_taps(s):
        return (s >> 3) ^ (s >> 2) ^ (s >> 1) ^ s

    def advance(state, nwords, taps_fn):
        def step(s, _):
            new = taps_fn(s) & jnp.uint32((1 << _STEP) - 1)
            return ((s >> _STEP) | (new << (31 - _STEP))) & jnp.uint32(_MASK31), None

        s, _ = jax.lax.scan(step, state, None, length=nwords)
        return s

    def advance_bits(state, nbits, taps_fn):
        new = taps_fn(state) & jnp.uint32((1 << nbits) - 1)
        return ((state >> nbits) | (new << (31 - nbits))) & jnp.uint32(_MASK31)

    x1 = advance_bits(
        advance(jnp.uint32(1), nwords_nc, x1_taps), rem, x1_taps
    )
    x2 = advance_bits(
        advance(jnp.asarray(c_init, jnp.uint32) & jnp.uint32(_MASK31), nwords_nc, x2_taps),
        rem,
        x2_taps,
    )
    nwords = -(-length // _STEP)
    c1 = _lfsr_scan_words(x1, nwords, x1_taps)
    c2 = _lfsr_scan_words(x2, nwords, x2_taps)
    return ((c1 ^ c2)[:length]).astype(jnp.uint8)
