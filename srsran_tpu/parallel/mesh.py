"""Mesh construction + carrier sharding helpers.

The primary scaling axis is `carriers` (SURVEY §2.6: one cc_worker per
component carrier in the reference → a shard axis here); a second
`samples` axis shards the I/Q stream of one wide carrier for the
overlap-save ops in `parallel.halo`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def carrier_mesh(n_carriers: int | None = None, samples: int = 1) -> Mesh:
    """Build a (carriers, samples) mesh over the available devices."""
    devs = jax.devices()
    n = len(devs)
    if n_carriers is None:
        n_carriers = n // samples
    assert n_carriers * samples <= n, f"need {n_carriers * samples} devices, have {n}"
    grid = np.array(devs[: n_carriers * samples]).reshape(n_carriers, samples)
    return Mesh(grid, ("carriers", "samples"))


def shard_carriers(mesh: Mesh, x, extra_dims: int = 0):
    """Place an array with a leading carriers axis onto the mesh."""
    spec = P("carriers", *([None] * extra_dims))
    return jax.device_put(x, NamedSharding(mesh, spec))
