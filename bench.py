#!/usr/bin/env python
"""Benchmark: turbo-decode throughput per chip (the reference's headline
metric: >150 Mbps on SSE4.1/AVX2, README.md:29, turbodecoder_test.c:282).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbps", "vs_baseline": N}
Extra diagnostics go to stderr.

Robustness notes for the axon TPU tunnel (see .claude/skills/verify):
- tiny warmup readback first (first device->host transfer can take minutes)
- `block_until_ready()` does NOT await execution on this tunnel — timings
  must bracket a trailing scalar READBACK, which truly synchronizes
"""

import json
import sys
import time

import numpy as np

BASELINE_MBPS = 150.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from srsran_tpu.phy.fec.turbo import turbo_decode, turbo_encode_np
    from srsran_tpu.phy.crc import crc_matrix_np
    from srsran_tpu.phy.common import LTE_CRC24B
    from srsran_tpu.phy.crc import crc_attach_np

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    t = time.time()
    np.asarray(jnp.zeros((1,)))
    log(f"warmup readback: {time.time()-t:.1f}s")

    k = 6144
    batch = 256
    max_it = 5
    rng = np.random.default_rng(0)

    msgs = rng.integers(0, 2, (batch, k - 24)).astype(np.uint8)
    cbs = np.stack([crc_attach_np(m, LTE_CRC24B) for m in msgs])
    d = np.stack([turbo_encode_np(row) for row in cbs])
    # operating point: converges in ~2-3 iterations with CRC early stop
    ebn0 = 1.6
    sigma2 = 1.0 / (2.0 * (1.0 / 3.0) * 10 ** (ebn0 / 10))
    y = (1.0 - 2.0 * d.astype(np.float32)) + rng.standard_normal(d.shape).astype(
        np.float32
    ) * np.sqrt(sigma2)
    llr = jnp.asarray((-2.0 * y / sigma2).astype(np.float32))
    crc_table = jnp.asarray(crc_matrix_np(LTE_CRC24B, k).astype(np.float32))

    def run(x):
        bits, post, n_it = turbo_decode(x, k, max_it, crc_table=crc_table)
        return bits, n_it

    def sync(x):
        # block_until_ready lies on the tunnel; a scalar readback is the
        # only true synchronization point
        return float(jnp.sum(x.ravel()[:1].astype(jnp.float32)))

    t = time.time()
    bits, n_it = run(llr)
    sync(bits)
    log(f"compile+first run: {time.time()-t:.1f}s, iterations used: {int(n_it)}")
    errs = int(np.sum(np.asarray(bits) != cbs))
    log(f"bit errors: {errs}/{batch*k}")

    n_rep = 20
    t = time.time()
    for _ in range(n_rep):
        bits, n_it = run(llr)
    sync(bits)
    dt = (time.time() - t) / n_rep
    mbps = batch * k / dt / 1e6
    log(f"decode: {dt*1e3:.2f} ms for {batch} CBs of {k} -> {mbps:.1f} Mbps")

    print(
        json.dumps(
            {
                "metric": "turbo decode throughput per chip (K=6144, CRC early stop, Eb/N0 1.6dB)",
                "value": round(mbps, 1),
                "unit": "Mbps",
                "vs_baseline": round(mbps / BASELINE_MBPS, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
