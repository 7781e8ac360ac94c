"""NB-IoT UE receive facade (re-design of `lib/src/phy/ue/
ue_sync_nbiot.c` / `ue_mib_nbiot.c` / `ue_dl_nbiot.c`, grid domain).

One call per processing stage over (nsf, 14, 12) anchor-carrier subframe
grids: cell acquisition (NPSS subframe phase → NSSS cell id/frame
position → MIB-NB), then NPDCCH-scheduled NPDSCH reception.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sync.nbiot import nbiot_cell_search
from ..phch.npbch import MibNb, npbch_decode, npbch_re_indices, nrs_chest
from ..phch.npdsch import NB_TBS, DciN1, npdcch_blind_search, npdsch_decode, npdsch_re_indices


@dataclasses.dataclass
class NbiotCell:
    n_id_ncell: int
    mib: MibNb
    sf5_index: int  # position of the NPSS subframe in the scanned stream
    frame4: int


def nbiot_ue_acquire(sf_grids) -> NbiotCell | None:
    """Full acquisition: NPSS → NSSS → MIB-NB (ue_cell_search_nbiot +
    ue_mib_nbiot flow)."""
    import jax.numpy as jnp

    res = nbiot_cell_search(jnp.asarray(sf_grids))
    if res is None:
        return None
    nid, sf5, f4, _ = res
    sf0 = sf5 - 5
    if sf0 < 0:
        return None
    grid = sf_grids[sf0]
    h, noise = nrs_chest(jnp.asarray(grid), nid, 0)
    hc = complex(np.asarray(h))
    idx = npbch_re_indices(nid)
    eq = np.asarray(grid).reshape(-1)[idx] * np.conj(hc) / (abs(hc) ** 2 + float(np.asarray(noise)))
    mib, blk, ok = npbch_decode(eq, nid)
    if not ok:
        return None
    return NbiotCell(nid, mib, sf5, f4)


def nbiot_ue_rx_data(ctrl_grid, data_grids, cell: NbiotCell, rnti: int, sf_idx_ctrl: int, sf_idx_data0: int):
    """Decode an NPDCCH DCI N1 from `ctrl_grid`, then the scheduled NPDSCH
    from `data_grids` ((n_sf, 14, 12), equalized like the control grid).

    Returns (DciN1, tb_bits, ok) or (None, None, False)."""
    import jax.numpy as jnp

    nid = cell.n_id_ncell
    idx = npdsch_re_indices(nid)

    def eq(grid, sf):
        h, noise = nrs_chest(jnp.asarray(grid), nid, sf)
        hc = complex(np.asarray(h))
        return np.asarray(grid).reshape(-1)[idx] * np.conj(hc) / (abs(hc) ** 2 + float(np.asarray(noise)))

    dci = npdcch_blind_search(jnp.asarray(eq(ctrl_grid, sf_idx_ctrl)), rnti, nid, sf_idx_ctrl)
    if dci is None:
        return None, None, False
    tbs = NB_TBS[(dci.i_tbs, dci.i_sf)]
    sym = np.stack([eq(g, sf_idx_data0 + s) for s, g in enumerate(data_grids)])
    tb, ok = npdsch_decode(jnp.asarray(sym), nid, rnti, dci.i_sf, tbs, sf_idx0=sf_idx_data0)
    return dci, tb, ok
