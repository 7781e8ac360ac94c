import os
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from srsran_tpu.io import FileSink, FileSource, NetSink, NetSource, binsource
from srsran_tpu.phy.agc import Agc
from srsran_tpu.phy.resampling import (
    decimate,
    interp_linear,
    resample_fft,
    resample_fft_blocks,
)


def tone(n, f, fs):
    t = np.arange(n) / fs
    return np.exp(2j * np.pi * f * t).astype(np.complex64)


def test_interp_linear():
    x = np.array([0.0, 1.0, 2.0], np.complex64)
    y = np.asarray(interp_linear(x, 2))
    np.testing.assert_allclose(y.real, [0, 0.5, 1, 1.5, 2, 2.5], atol=1e-6)


def test_resample_fft_tone():
    fs = 1.92e6
    x = tone(1920, 100e3, fs)
    y = np.asarray(resample_fft(x, 2, 1))  # 2x upsample
    # the tone persists at the same absolute frequency
    spec = np.abs(np.fft.fft(y))
    peak = np.argmax(spec)
    f_peak = peak / len(y) * (2 * fs)
    assert abs(f_peak - 100e3) < 1e3
    z = np.asarray(resample_fft(y, 1, 2))
    np.testing.assert_allclose(z, x, atol=1e-2)


def test_resample_blocks_matches_full():
    rng = np.random.default_rng(0)
    # band-limited signal (tones well inside the band)
    n = 4096
    x = sum(tone(n, f, 1.92e6) for f in (50e3, -120e3, 333e3))
    x = x.astype(np.complex64)
    full = np.asarray(resample_fft(x, 2, 1))
    blocks = x.reshape(4, 1024)
    blk = np.asarray(resample_fft_blocks(blocks, 2, 1, halo=128)).reshape(-1)
    # interior matches closely (edges differ by design)
    err = np.abs(blk[2048 + 256 : 4096 + 2048 - 256] - full[2048 + 256 : 4096 + 2048 - 256])
    assert np.max(err) < 0.05, np.max(err)


def test_decimate_tone():
    fs = 7.68e6
    x = tone(7680, 200e3, fs)
    y = np.asarray(decimate(x, 4))
    assert len(y) == 1920
    spec = np.abs(np.fft.fft(y))
    f_peak = np.argmax(spec) / len(y) * (fs / 4)
    assert abs(f_peak - 200e3) < 2e3


def test_agc_converges():
    """Closed loop: AGC observes the post-gain signal it controls."""
    rng = np.random.default_rng(0)
    agc = Agc(target=0.3, gain_db=0.0)
    raw_amp = 0.001
    gain = 1.0
    for _ in range(10):
        raw = raw_amp * (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)) * np.sqrt(0.5)
        gain = agc.process(raw * gain)
    assert agc.state == "HOLD"
    rms = raw_amp * gain
    assert 0.15 < rms < 0.6, rms


def test_file_roundtrip(tmp_path):
    p = str(tmp_path / "iq.bin")
    rng = np.random.default_rng(1)
    data = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64)
    with FileSink(p) as sink:
        sink.write(data)
    src = FileSource(p)
    got = src.read(1000)
    np.testing.assert_array_equal(got, data)
    # repeat mode wraps
    src2 = FileSource(p, repeat=True)
    got2 = src2.read(1500)
    np.testing.assert_array_equal(got2[1000:], data[:500])


def test_binsource_deterministic():
    a, b = binsource(5, 100), binsource(5, 100)
    np.testing.assert_array_equal(a, b)
    assert set(np.unique(a)) <= {0, 1}


def test_net_udp_roundtrip():
    port = 45781
    src_holder = {}

    def serve():
        src_holder["src"] = NetSource("127.0.0.1", port, "udp")

    t = threading.Thread(target=serve)
    t.start()
    t.join()
    src = src_holder["src"]
    sink = NetSink("127.0.0.1", port, "udp")
    data = (np.arange(2048) + 1j * np.arange(2048)).astype(np.complex64)
    tx = threading.Thread(target=lambda: sink.write(data))
    tx.start()
    got = src.read(2048)
    tx.join()
    np.testing.assert_array_equal(got, data)
    sink.close()
    src.close()


def test_resample_arb_tone_accuracy():
    """Polyphase arbitrary resampler: a passband tone resampled by a
    non-rational rate matches the ideally resampled tone."""
    from srsran_tpu.phy.resampling import resample_arb

    n, f = 4096, 0.03
    x = np.exp(2j * np.pi * f * np.arange(n)).astype(np.complex64)
    for rate, bound_db in ((1.2345, -70), (0.75, -70), (1.92 / 1.5, -70), (0.5, -40)):
        y = np.asarray(resample_arb(jnp.asarray(x), rate))
        assert len(y) == int(np.floor(n * rate))
        t = np.arange(len(y)) / rate
        ref = np.exp(2j * np.pi * f * t)
        sl = slice(32, len(y) - 32)
        err = float(np.mean(np.abs(y[sl] - ref[sl]) ** 2))
        assert 10 * np.log10(err) < bound_db, (rate, 10 * np.log10(err))


def test_resample_arb_batched():
    from srsran_tpu.phy.resampling import resample_arb

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((3, 512)) + 1j * rng.standard_normal((3, 512))).astype(np.complex64)
    y = np.asarray(resample_arb(jnp.asarray(x), 1.5))
    y0 = np.asarray(resample_arb(jnp.asarray(x[1]), 1.5))
    assert y.shape == (3, 768)
    np.testing.assert_allclose(y[1], y0, rtol=1e-5, atol=1e-5)


class _MemSink:
    def __init__(self):
        self.data = []

    def write(self, samples):
        self.data.append(np.asarray(samples, np.complex64))

    def all(self):
        return np.concatenate(self.data) if self.data else np.zeros(0, np.complex64)


def test_radio_tx_gap_fill_and_trim():
    """radio.cc:489-545 semantics: zero-gap fill for short gaps, leading
    trim for overlaps, burst end for long gaps."""
    from srsran_tpu.io.radio import Radio

    sink = _MemSink()
    r = Radio(sink, srate_hz=1000.0, tx_max_gap=0.5)
    a = np.ones(100, np.complex64)
    assert r.tx(a, timestamp=1.0)
    # 50-sample gap (0.05 s < max): filled with zeros
    assert r.tx(a * 2, timestamp=1.15)
    out = sink.all()
    assert len(out) == 250
    assert np.all(out[:100] == 1) and np.all(out[100:150] == 0) and np.all(out[150:] == 2)
    assert r.stats["gap_zeros"] == 50
    # overlap by 30 samples: trimmed
    assert r.tx(a * 3, timestamp=1.25 - 0.03)
    out = sink.all()
    assert len(out) == 250 + 70
    assert np.all(out[250:] == 3)
    assert r.stats["trimmed"] == 30
    # entirely-past transmission is dropped
    assert r.tx(a, timestamp=0.0)
    assert len(sink.all()) == 320 and r.stats["late"] == 1
    # long gap ends the burst (no zero fill)
    assert r.tx(a * 4, timestamp=10.0)
    out = sink.all()
    assert len(out) == 420 and r.stats["burst_ends"] == 1
    assert np.all(out[320:] == 4)


def test_radio_channel_mapping_and_rx_timestamps():
    from srsran_tpu.io.radio import ChannelMapping, Radio

    m = ChannelMapping(2)
    assert m.allocate_freq(5, 2.4e9) and m.allocate_freq(9, 3.5e9)
    assert not m.allocate_freq(7, 1e9)  # full
    assert m.get_device_mapping(5) == 0 and m.get_device_mapping(9) == 1
    assert m.release_freq(5) and not m.is_allocated(5)
    assert m.allocate_freq(7, 1e9) and m.get_device_mapping(7) == 0

    class _Src:
        def __init__(self):
            self.n = 0

        def read(self, n):
            self.n += n
            return np.zeros(n, np.complex64)

    s0, s1 = _MemSink(), _MemSink()
    r = Radio([s0, s1], source=_Src(), srate_hz=100.0)
    r.mapping.allocate_freq(3, 1e9)
    r.mapping.allocate_freq(8, 2e9)
    r.tx(np.ones(10, np.complex64), 0.0, logical_ch=8)
    assert len(s1.all()) == 10 and len(s0.all()) == 0
    _, t0 = r.rx_now(100)
    _, t1 = r.rx_now(100)
    assert t0 == 0.0 and abs(t1 - 1.0) < 1e-9
