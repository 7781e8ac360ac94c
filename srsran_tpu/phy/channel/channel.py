"""Composed, config-driven channel emulator (re-design of
`lib/src/phy/channel/channel.cc` + config `channel.h:43-79`).

Chains the individual impairment models — fading (EPA/EVA/ETU
sum-of-sinusoids), AWGN, delay drift, high-speed-train Doppler, periodic
radio-link-failure gating — driven by one `ChannelConfig`, advancing an
internal clock per call exactly like the reference's per-subframe
`srslte_channel_*_execute` chain. Used for BLER curves and fault
injection (SURVEY §5.3)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .fading import (
    FadingConfig,
    RlfConfig,
    apply_delay,
    apply_fading,
    apply_rlf,
    awgn,
    hst_doppler_shift,
)


@dataclasses.dataclass
class DelayConfig:
    """Periodic delay drift (delay.c; ue.conf.example [channel.dl.delay])."""

    min_us: float = 0.0
    max_us: float = 0.0
    period_s: float = 3600.0


@dataclasses.dataclass
class HstConfig:
    """High-speed-train Doppler profile (hst.c)."""

    fd_hz: float = 0.0
    period_s: float = 7.2


@dataclasses.dataclass
class ChannelConfig:
    """Mirrors the [channel.*] config section (channel.h:43-79)."""

    enable: bool = True
    fading: FadingConfig | None = None
    awgn_snr_db: float | None = None
    delay: DelayConfig | None = None
    hst: HstConfig | None = None
    rlf: RlfConfig | None = None
    srate: float = 1.92e6
    seed: int = 0


class Channel:
    """Stateful wrapper advancing time across calls (channel.cc)."""

    def __init__(self, cfg: ChannelConfig):
        self.cfg = cfg
        self.t = 0.0
        self.key = jax.random.PRNGKey(cfg.seed)

    def run(self, samples: jnp.ndarray) -> jnp.ndarray:
        """Apply the configured impairments to one block of samples."""
        cfg = self.cfg
        n = samples.shape[-1]
        dt = n / cfg.srate
        out = samples
        if not cfg.enable:
            self.t += dt
            return out
        if cfg.fading is not None:
            out, _ = apply_fading(cfg.fading, out, t0_seconds=self.t)
        if cfg.hst is not None and cfg.hst.fd_hz:
            shift = hst_doppler_shift(cfg.hst.fd_hz, cfg.hst.period_s, self.t)
            ph = 2j * jnp.pi * shift * jnp.arange(n) / cfg.srate
            out = out * jnp.exp(ph)
        if cfg.delay is not None and cfg.delay.max_us > 0:
            # triangular drift between min and max over the period
            frac = (self.t % cfg.delay.period_s) / cfg.delay.period_s
            tri = 2 * frac if frac < 0.5 else 2 * (1 - frac)
            d_us = cfg.delay.min_us + (cfg.delay.max_us - cfg.delay.min_us) * tri
            out = apply_delay(out, d_us * 1e-6 * cfg.srate)
        if cfg.rlf is not None:
            out = apply_rlf(cfg.rlf, out, self.t * 1e3)
        if cfg.awgn_snr_db is not None:
            self.key, sub = jax.random.split(self.key)
            out = awgn(sub, out, cfg.awgn_snr_db)
        self.t += dt
        return out
