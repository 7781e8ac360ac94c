#!/usr/bin/env python
"""Dynamic-grant pipeline demo: decode a random scheduler-driven grant mix
(MCS 0-28 x arbitrary PRB allocations x all subframes) through ONE bounded
set of pre-compiled programs — the TPU answer to the reference's
per-TTI-arbitrary-grant property (srsue/src/phy/cc_worker.cc:214-307).

  python examples/dynamic_grants.py [--prb 50] [--ttis 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", os.environ.get("SRSRAN_TPU_PLATFORM", "cpu"))

import numpy as np

from srsran_tpu.phy.chest.refsignal_dl import put_crs_np
from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_tx_sf
from srsran_tpu.phy.phch.pdsch import DlGrant, pdsch_encode_np
from srsran_tpu.phy.phch.ra import dl_mcs_to_mod, dl_tbs
from srsran_tpu.pipeline_dynamic import DynamicUeDl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prb", type=int, default=50)
    ap.add_argument("--ttis", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cell = Cell(nof_prb=args.prb, nof_ports=1, id=17)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    ue = DynamicUeDl(cell, cfi=1)

    n_ok = 0
    bits = 0
    t0 = time.time()
    for i in range(args.ttis):
        sf_idx = int(rng.integers(0, 10))
        mcs = int(rng.integers(0, 29))
        l = int(rng.integers(1, args.prb + 1))
        st = int(rng.integers(0, args.prb + 1 - l))
        tbs = dl_tbs(mcs, l)
        if tbs == 0:
            continue
        grant = DlGrant(prb=tuple(range(st, st + l)), mod=dl_mcs_to_mod(mcs),
                        tbs=tbs, rnti=0x46)
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        grid = pdsch_encode_np(cell, sf_idx, 1, grant, tb)
        put_crs_np(grid, cell, sf_idx)
        tx = np.asarray(ofdm_tx_sf(ofdm, grid))[0]
        rx = (tx + 0.05 * (rng.standard_normal(tx.shape)
                           + 1j * rng.standard_normal(tx.shape))).astype(np.complex64)
        tb_hat, ok, _, n_it = ue.decode(rx[None], sf_idx, grant)
        n_ok += int(ok and (tb_hat == tb).all())
        bits += tbs
        print(f"tti {i:3d}  sf {sf_idx}  mcs {mcs:2d}  prb [{st:3d},{st+l:3d})  "
              f"tbs {tbs:6d}  {'OK ' if ok else 'KO '} it={n_it}  "
              f"programs a/b/c = {ue.stats['compiles_a']}/"
              f"{ue.stats['compiles_b']}/{ue.stats['compiles_c']}")
    dt = time.time() - t0
    print(f"\n{n_ok}/{ue.stats['ttis']} grants decoded, {bits/1e6:.2f} Mbit, "
          f"{dt:.1f}s wall, {ue.total_compiles} XLA programs total "
          f"(bounded by the bucket grid, not the grant count)")


if __name__ == "__main__":
    main()
