"""Test config: run the suite on a virtual 8-device CPU mesh.

TPU hardware (single chip) is exercised separately by bench.py; unit tests
must be deterministic and runnable anywhere, and multi-chip sharding tests
need >1 device, so we force an 8-device CPU platform before JAX is imported.
"""

import os

# The session boot (sitecustomize) registers the tunneled `axon` TPU backend
# and force-sets jax.config jax_platforms="axon,cpu" — overriding any
# JAX_PLATFORMS env var.  Tests must run on CPU (the axon chip is
# single-device, very slow on first host readback, and shared with
# benchmarks), so override at the config level, which wins over the boot.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
