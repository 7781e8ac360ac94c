"""UE downlink subframe processing — facade over the receive chain.

Re-design of `lib/src/phy/ue/ue_dl.c` (srslte_ue_dl_decode_fft_estimate
:383, blind DCI search :450-694, PDSCH decode :741): OFDM demod + channel
estimation once per subframe, then PCFICH → PDCCH blind search → grant
derivation → PDSCH decode.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..common import Cell
from ..chest.chest_dl import chest_dl
from ..ofdm import OfdmConfig, ofdm_rx_sf
from ..phch.dci import Dci1A
from ..phch.pcfich import pcfich_decode, pcfich_re_indices
from ..phch.pdcch import nof_cce, pdcch_blind_search, pdcch_re_indices
from ..phch.pdsch import DlGrant, pdsch_decode
from ..phch.ra import dl_mcs_to_mod, dl_tbs, riv_decode
from .. import tdd as tdd_mod


@dataclasses.dataclass
class UeDlResult:
    cfi: int = 0
    dcis: list = dataclasses.field(default_factory=list)
    tbs: list = dataclasses.field(default_factory=list)  # (tb_bits, crc_ok)
    rsrp: float = 0.0
    snr_db: float = 0.0
    noise: float = 0.0
    pdsch_symbols: np.ndarray | None = None  # equalized REs (for scopes)
    dci_used: "Dci1A | None" = None  # the 1A grant whose PDSCH was decoded
    cce_used: int = -1  # its CCE start (→ PUCCH 1a resource, pucch_proc.c:257)
    phich_ack: bool | None = None  # decoded HI when a resource was watched


def ue_dl_decode_subframe(
    cell: Cell,
    samples: np.ndarray,
    sf_idx: int,
    rnti: int,
    nrx: int = 1,
    known_cfi: int | None = None,
    max_iterations: int = 5,
    tdd: "TddConfig | None" = None,
    harq_softbuffers: dict | None = None,
    phich: tuple[int, int] | None = None,
) -> UeDlResult:
    """Process one subframe: samples (nrx, sf_len) → decoded TBs.

    Mirrors the cc_worker DL pipeline (srsue/src/phy/cc_worker.cc:214-307).
    With ``tdd`` set: UL subframes are skipped, special subframes decode
    only the DwPTS region with the 0.75-PRB TBS rule (ra_dl.c:399,430-432),
    and the DCI is parsed at its TDD size.
    """
    res = UeDlResult()
    is_tdd = tdd is not None
    last_symbol = None
    if is_tdd:
        sftype = tdd_mod.sf_type(tdd, sf_idx)
        if sftype == tdd_mod.SfType.U:
            return res
        if sftype == tdd_mod.SfType.S:
            last_symbol = tdd_mod.nof_dw(tdd)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    grid = np.asarray(ofdm_rx_sf(ofdm, samples))  # (nrx, nsymb, nre)
    ch = chest_dl(grid, cell, sf_idx, nof_ports=min(cell.nof_ports, 2),
                  last_symbol=last_symbol)
    ce = np.asarray(ch["ce"])  # (nrx, nports, nsymb, nre)
    noise = float(np.mean(np.asarray(ch["noise"])))
    res.noise = noise
    res.rsrp = float(np.mean(np.asarray(ch["rsrp"])))
    res.snr_db = float(10 * np.log10(np.mean(np.asarray(ch["snr"])) + 1e-12))

    ce0 = ce[0, 0].reshape(-1)
    nports_cell = min(max(cell.nof_ports, 1), 2)

    def equalize(idx):
        y = grid[0].reshape(-1)[idx]
        if nports_cell == 1:
            h = ce0[idx]
            return y * np.conj(h) / (np.abs(h) ** 2 + noise)
        # 2-port cell: control channels carry SFBC (TS 36.211 §6.7-6.9)
        from ..mimo import predecode_diversity2

        h2 = ce[0, :2].reshape(2, -1)[:, idx]
        x, _ = predecode_diversity2(y[None, :], h2[None])
        return np.asarray(x).reshape(-1)

    # CFI
    if known_cfi is None:
        cfi_hat, _ = pcfich_decode(equalize(pcfich_re_indices(cell)), cell, sf_idx)
        cfi = int(cfi_hat)
    else:
        cfi = known_cfi
    res.cfi = cfi

    if phich is not None:
        # HI for the watched (group, seq) resource (cc_worker decode_phich)
        from ..phch.phich import phich_decode, phich_re_indices

        group, n_seq = phich
        hi, _ = phich_decode(equalize(phich_re_indices(cell, group)), cell, sf_idx, n_seq)
        res.phich_ack = bool(np.asarray(hi))

    # PDCCH blind search (format 1A size)
    n = nof_cce(cell, sf_idx, cfi)
    dci_len = Dci1A.nof_bits(cell.nof_prb, tdd=is_tdd)
    idx = pdcch_re_indices(cell, sf_idx, cfi)[: n * 36]
    found = pdcch_blind_search(equalize(idx), cell, sf_idx, cfi, rnti, dci_len)
    res.dcis = found

    # decode each 1A grant
    for bits, agg, cce in found:
        try:
            dci = Dci1A.unpack(bits, cell.nof_prb, tdd=is_tdd)
        except ValueError:
            continue
        try:
            rb0, l_crb = riv_decode(cell.nof_prb, dci.riv)
        except ValueError:
            continue
        if rnti >= 0xFFF4 or rnti <= 0x0042:  # SI/P-RNTI or RA-RNTI space
            # TS 36.213 §7.1.7.2: QPSK, mcs = i_tbs, N_PRB from TPC LSB
            from ..phch.ra import tbs_lookup
            from ..modem import Mod

            scheme = "diversity" if nports_cell >= 2 else "port0"
            n_prb_1a = 3 if (dci.tpc & 1) else 2
            grant = DlGrant(
                prb=tuple(range(rb0, rb0 + l_crb)),
                mod=Mod.QPSK,
                tbs=tbs_lookup(dci.mcs, n_prb_1a),
                rv=dci.rv,
                rnti=rnti,
                tx_scheme=scheme,
            )
        else:
            scheme = "diversity" if nports_cell >= 2 else "port0"
            grant = DlGrant(
                prb=tuple(range(rb0, rb0 + l_crb)),
                mod=dl_mcs_to_mod(dci.mcs),
                tbs=dl_tbs(dci.mcs, l_crb, dwpts=last_symbol is not None),
                rv=dci.rv,
                rnti=rnti,
                tx_scheme=scheme,
            )
        # HARQ soft combining: the caller's per-process dict carries
        # (ndi, softbuffers) between retransmissions (softbuffer.c role);
        # a toggled NDI means a NEW transport block — stale LLRs from the
        # previous (possibly failed) TB must not be combined in
        sb = None
        if harq_softbuffers is not None:
            stored = harq_softbuffers.get(dci.harq_pid)
            if stored is not None and stored[0] == dci.ndi:
                sb = stored[1]
        tb, ok, sb_out = pdsch_decode(
            grid, ce, noise, cell, sf_idx, cfi, grant, max_iterations,
            softbuffers=sb, tdd=is_tdd, last_symbol=last_symbol,
        )
        if harq_softbuffers is not None:
            if ok:
                harq_softbuffers.pop(dci.harq_pid, None)  # reset on success
            else:
                harq_softbuffers[dci.harq_pid] = (dci.ndi, sb_out)
        res.tbs.append((tb, ok))
        res.dci_used = dci
        res.cce_used = cce
        from ..phch.pdsch import pdsch_re_indices

        res.pdsch_symbols = np.asarray(
            equalize(pdsch_re_indices(cell, sf_idx, cfi, grant.prb, is_tdd, last_symbol))
        )
        break  # one 1A grant per subframe (dedup across agg levels)
    return res
