import jax
import numpy as np
import pytest

from srsran_tpu.phy.channel.fading import (
    FadingConfig,
    RlfConfig,
    apply_delay,
    apply_fading,
    apply_rlf,
    awgn,
    freq_response,
    hst_doppler_shift,
    tap_gains,
)


def test_awgn_snr():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(100000) + 1j * rng.standard_normal(100000)).astype(np.complex64)
    y = np.asarray(awgn(jax.random.PRNGKey(0), x, 10.0))
    n = y - x
    snr = 10 * np.log10(np.mean(np.abs(x) ** 2) / np.mean(np.abs(n) ** 2))
    assert abs(snr - 10.0) < 0.3


def test_tap_gains_unit_power():
    cfg = FadingConfig(model="eva", doppler_hz=70.0)
    t = np.linspace(0, 10.0, 5000)
    g = np.asarray(tap_gains(cfg, t))
    total = np.mean(np.sum(np.abs(g) ** 2, axis=-1))
    assert 0.7 < total < 1.4, total


def test_fading_preserves_mean_power():
    cfg = FadingConfig(model="etu", doppler_hz=30.0, srate=1.92e6)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(1920) + 1j * rng.standard_normal(1920)).astype(np.complex64)
    powers = []
    for i in range(200):
        y, h = apply_fading(cfg, x, t0_seconds=i * 1e-3)
        powers.append(float(np.mean(np.abs(np.asarray(y)) ** 2)))
    assert 0.6 < np.mean(powers) / np.mean(np.abs(x) ** 2) < 1.6


def test_fading_is_frequency_selective():
    cfg = FadingConfig(model="etu", doppler_hz=5.0, srate=30.72e6)
    h = np.asarray(freq_response(cfg, 0.0, 2048))
    # ETU has 5 us delay spread → strong selectivity across 30.72 MHz
    assert np.std(np.abs(h)) > 0.2


def test_fading_time_varies_with_doppler():
    cfg = FadingConfig(model="epa", doppler_hz=300.0)
    g0 = np.asarray(tap_gains(cfg, 0.0))
    g1 = np.asarray(tap_gains(cfg, 0.01))  # 3 cycles later
    assert np.abs(g0[0] - g1[0]) > 1e-3


def test_delay_integer():
    x = np.zeros(64, np.complex64)
    x[10] = 1.0
    y = np.asarray(apply_delay(x, 3.0))
    assert np.argmax(np.abs(y)) == 13


def test_rlf_gating():
    cfg = RlfConfig(t_on_ms=5, t_off_ms=2)
    x = np.ones(10, np.complex64)
    on = np.asarray(apply_rlf(cfg, x, t_ms=3))
    off = np.asarray(apply_rlf(cfg, x, t_ms=6))
    assert on.sum() == 10 and off.sum() == 0


def test_hst_profile():
    assert abs(float(hst_doppler_shift(750.0, 10.0, 0.0)) - 750.0) < 1e-3
    assert abs(float(hst_doppler_shift(750.0, 10.0, 5.0)) + 750.0) < 1e-3


def test_pdsch_over_epa_fading():
    """Full link over EPA fading at high SNR still decodes (flat-ish per sf)."""
    from srsran_tpu.phy.common import Cell
    from srsran_tpu.phy.modem import Mod
    from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf, ofdm_tx_sf
    from srsran_tpu.phy.chest.chest_dl import chest_dl
    from srsran_tpu.phy.chest.refsignal_dl import put_crs_np
    from srsran_tpu.phy.phch.pdsch import DlGrant, pdsch_decode, pdsch_encode_np

    cell = Cell(nof_prb=15, nof_ports=1, id=11)
    grant = DlGrant(prb=tuple(range(15)), mod=Mod.QPSK, tbs=1096)
    rng = np.random.default_rng(3)
    tb = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grid = pdsch_encode_np(cell, 2, 1, grant, tb)
    put_crs_np(grid, cell, 2)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = np.asarray(ofdm_tx_sf(ofdm, grid))[0]
    cfg = FadingConfig(model="epa", doppler_hz=5.0, srate=cell.srate, seed=4)
    faded, _ = apply_fading(cfg, tx, 0.05)
    rx = np.asarray(awgn(jax.random.PRNGKey(1), faded, 25.0))
    rx_grid = np.asarray(ofdm_rx_sf(ofdm, rx[None]))
    res = chest_dl(rx_grid, cell, 2)
    tb_hat, ok, _ = pdsch_decode(
        rx_grid, np.asarray(res["ce"]), float(np.mean(np.asarray(res["noise"]))),
        cell, 2, 1, grant,
    )
    assert ok
    np.testing.assert_array_equal(tb_hat, tb)


def test_composed_channel_chain():
    """Config-driven composed channel (channel.cc analog): all stages on."""
    import jax.numpy as jnp
    from srsran_tpu.phy.channel.channel import Channel, ChannelConfig, DelayConfig, HstConfig
    from srsran_tpu.phy.channel.fading import FadingConfig, RlfConfig

    cfg = ChannelConfig(
        fading=FadingConfig(model="epa", doppler_hz=5.0, srate=1.92e6),
        awgn_snr_db=20.0,
        delay=DelayConfig(min_us=0, max_us=2, period_s=1.0),
        hst=HstConfig(fd_hz=100.0),
        rlf=RlfConfig(t_on_ms=100.0, t_off_ms=10.0),
        srate=1.92e6,
    )
    ch = Channel(cfg)
    x = jnp.ones(1920, jnp.complex64)
    y1 = np.asarray(ch.run(x))
    y2 = np.asarray(ch.run(x))
    assert y1.shape == x.shape and np.isfinite(y1).all()
    assert not np.allclose(y1, y2)  # time advances between calls
    assert ch.t > 1.9e-3
    # disabled channel is a passthrough
    off = Channel(ChannelConfig(enable=False))
    np.testing.assert_array_equal(np.asarray(off.run(x)), np.asarray(x))


def test_event_tracer():
    import json
    from srsran_tpu.runtime.trace import EventTracer

    tr = EventTracer()
    with tr.duration("noop"):  # disabled: no event recorded
        pass
    assert not tr._events
    tr.enable()
    with tr.duration("fft", symbols=14):
        pass
    tr.instant("prach")
    tr.counter("bler", errors=0)

    @tr.traced("decode")
    def f():
        return 41 + 1

    assert f() == 42
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "trace.json")
    tr.save(p)
    data = json.load(open(p))
    names = [e["name"] for e in data["traceEvents"]]
    assert names == ["fft", "prach", "bler", "decode"]
    assert data["traceEvents"][0]["ph"] == "X"
