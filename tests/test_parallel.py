"""Sharded streaming ops on the virtual 8-device mesh: the halo-exchange
results must match the single-device (unsharded) computation."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srsran_tpu.parallel import (
    carrier_mesh,
    shard_carriers,
    sharded_fir,
    sharded_resample_fft,
)
from srsran_tpu.phy.resampling import resample_fft, resample_fft_blocks


def samples_mesh():
    return Mesh(np.array(jax.devices()), ("samples",))


def test_carrier_mesh_shapes():
    m = carrier_mesh(4, samples=2)
    assert m.shape == {"carriers": 4, "samples": 2}
    x = np.zeros((4, 128), np.complex64)
    xs = shard_carriers(m, x, extra_dims=1)
    assert xs.sharding.spec == P("carriers", None)


def test_sharded_resample_matches_blockwise():
    """ppermute halo exchange == the single-device blockwise overlap-save."""
    mesh = samples_mesh()
    n_dev = 8
    blk = 512
    halo = 64
    rng = np.random.default_rng(0)
    # smooth narrowband signal so halo truncation error is negligible
    t = np.arange(n_dev * blk)
    x = (np.exp(2j * np.pi * 0.01 * t) + 0.5 * np.exp(2j * np.pi * 0.03 * t)).astype(np.complex64)
    y_sharded = np.asarray(sharded_resample_fft(jnp.asarray(x), 2, 1, mesh, halo=halo))
    y_blocks = np.asarray(
        resample_fft_blocks(jnp.asarray(x.reshape(n_dev, blk)), 2, 1, halo=halo)
    ).reshape(-1)
    np.testing.assert_allclose(y_sharded, y_blocks, atol=1e-4)
    # and both approximate the unsharded whole-stream resample away from edges
    y_full = np.asarray(resample_fft(jnp.asarray(x), 2, 1))
    err = np.abs(y_sharded[1024:-1024] - y_full[1024:-1024])
    assert np.max(err) < 0.02


def test_sharded_fir_exact():
    """Sharded causal FIR == np.convolve on the whole stream (exact: the
    previous shard's tail is the filter state)."""
    mesh = samples_mesh()
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    taps = np.hamming(17).astype(np.float32)
    taps /= taps.sum()
    y = np.asarray(sharded_fir(jnp.asarray(x), taps, mesh))
    ref = np.convolve(np.concatenate([np.zeros(16, np.complex64), x]), taps, mode="valid")
    np.testing.assert_allclose(y, ref, atol=1e-4)
