"""NPRACH: NB-IoT random access preamble, TS 36.211 §10.1.6 (re-design of
`lib/src/phy/phch/ra_nbiot.c` / npdsch_enodeb's RA detection).

A preamble is 4 symbol groups (CP + 5 identical 3.75 kHz single-tone
symbols each); the tone hops between symbol groups by the deterministic
pattern derived from the starting subcarrier: ±1 inside a 12-tone block
(level-1 hop), ±6 between repetitions (level-2, pseudo-random — fixed
first repetition modeled here).

Detection works in the frequency domain: for each candidate starting
subcarrier, correlate the received symbol groups at the hopped tone
positions; the energy-sum peak over candidates gives the preamble and a
timing estimate from the inter-group phase.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

N_SC = 12  # subcarriers per NPRACH block (3.75 kHz each)
N_GROUPS = 4
N_SYM = 5  # symbols per group
FFT = 256  # 3.75 kHz tones at 0.96 MHz sampling (modeled domain)


def _hop_pattern(n_init: int) -> np.ndarray:
    """Tone index for each of the 4 symbol groups (§10.1.6.1 level-1/2)."""
    a = n_init % N_SC
    # group 2: ±1 (odd/even), group 3: ±6 (mod 12), group 4: ±1 again
    g1 = a
    g2 = a + 1 if a % 2 == 0 else a - 1
    g3 = (g2 + 6) % N_SC
    g4 = g3 + 1 if g3 % 2 == 0 else g3 - 1
    return np.array([g1, g2, g3, g4], np.int32)


def nprach_generate_np(n_init: int, cp_len: int = 64) -> np.ndarray:
    """Time-domain preamble: 4 groups of (CP + 5 symbols) single tones."""
    pattern = _hop_pattern(n_init)
    out = []
    n = np.arange(FFT)
    for tone in pattern:
        sym = np.exp(2j * np.pi * tone * n / FFT).astype(np.complex64)
        group = np.concatenate([sym[-cp_len:], np.tile(sym, N_SYM)])
        out.append(group)
    return np.concatenate(out)


def nprach_detect(samples, cp_len: int = 64, threshold: float = 8.0):
    """Detect preambles: returns (metric (12,), detected (12,), delay).

    Correlates each symbol group's FFT at every candidate's hopped tone;
    the per-candidate metric is the coherently-combined group energy over
    the average bin energy.
    """
    group_len = cp_len + N_SYM * FFT
    gidx = np.arange(N_GROUPS) * group_len + cp_len
    # FFT of each group's first symbol (one shot, batched)
    segs = jnp.stack([samples[g : g + FFT] for g in gidx])  # (4, FFT)
    spec = jnp.fft.fft(segs, axis=-1)  # (4, FFT)
    power = jnp.abs(spec) ** 2
    avg = jnp.mean(power) + 1e-12
    metrics = []
    for cand in range(N_SC):
        pattern = _hop_pattern(cand)
        e = sum(power[g, int(pattern[g])] for g in range(N_GROUPS)) / N_GROUPS
        metrics.append(e / avg)
    metric = jnp.stack(metrics)
    detected = metric > threshold
    # timing from the phase slope across a group's symbols of the best cand
    best = int(np.asarray(jnp.argmax(metric)))
    pattern = _hop_pattern(best)
    g0 = int(gidx[0])
    s0 = samples[g0 : g0 + FFT]
    s1 = samples[g0 + FFT : g0 + 2 * FFT]
    tone = jnp.exp(-2j * jnp.pi * int(pattern[0]) * jnp.arange(FFT) / FFT)
    ph = jnp.angle(jnp.sum(s1 * tone) * jnp.conj(jnp.sum(s0 * tone)))
    delay_samples = -ph / (2 * np.pi) * FFT / max(int(pattern[0]), 1) if pattern[0] else 0.0
    return metric, detected, delay_samples
