"""TDD (frame structure type 2) numerology, timing, DCI and PHY tests.

Covers srsran_tpu.phy.tdd against the structural invariants of the
TS 36.211/36.213 tables (mirrored from the reference's phy_common.c and
srsue/src/phy/phy_common.cc), the TDD DCI sizing of dci.c, and an E2E
special-subframe (DwPTS) PDSCH decode that the reference eNB itself
cannot generate (enb_dl.c:658).
"""

import numpy as np
import pytest

from srsran_tpu.phy import tdd
from srsran_tpu.phy.common import Cell
from srsran_tpu.phy.modem import Mod
from srsran_tpu.phy.phch.dci import Dci0, Dci1, Dci1A, Dci1B, Dci1D, Dci2
from srsran_tpu.phy.phch.ra import dl_tbs


ALL_CFGS = [tdd.TddConfig(c, s) for c in range(7) for s in (0, 4)]


class TestTables:
    def test_frame_structure(self):
        # sf0 = D, sf1 = S, sf2 = U in every UL/DL configuration
        for c in range(7):
            cfg = tdd.TddConfig(c)
            assert tdd.sf_type(cfg, 0) == tdd.SfType.D
            assert tdd.sf_type(cfg, 1) == tdd.SfType.S
            assert tdd.sf_type(cfg, 2) == tdd.SfType.U
            # 5 ms switch-point configs repeat in the second half-frame
            if c in (0, 1, 2, 6):
                assert tdd.sf_type(cfg, 6) == tdd.SfType.S

    def test_fdd_fallback(self):
        assert tdd.sf_type(None, 3) == tdd.SfType.D
        assert tdd.nof_harq(None) == 8
        assert tdd.mi_value(None, 4) == 1
        assert tdd.ack_tti(None, 100) == 104
        assert tdd.pusch_tti(None, 100) == 104
        assert tdd.phich_tti(None, 100) == 104

    def test_special_subframe_symbols(self):
        for s in range(10):
            cfg = tdd.TddConfig(0, s)
            # the reference's table (phy_common.c:140) rows sum to <= 14
            # (row 8 counts 13); DwPTS always >= 3 so PSS/control fit
            assert tdd.nof_dw(cfg) + tdd.nof_gp(cfg) + tdd.nof_up(cfg) <= 14
            assert tdd.nof_dw(cfg) >= 3
            # DwPTS split over slots covers all DwPTS symbols
            assert tdd.nof_dw_slot(cfg, 0) + tdd.nof_dw_slot(cfg, 1) == tdd.nof_dw(cfg)

    def test_das_targets_are_downlink(self):
        # every association-set entry points k back from a U subframe to a D/S
        for c in range(7):
            cfg = tdd.TddConfig(c)
            for n in range(10):
                ks = tdd.das_set(cfg, n)
                if ks:
                    assert tdd.sf_type(cfg, n) == tdd.SfType.U
                for k in ks:
                    assert tdd.sf_type(cfg, (n - k) % 10) != tdd.SfType.U

    def test_das_covers_every_dl_subframe_once(self):
        # each D/S subframe is ACKed in exactly one UL subframe
        for c in range(7):
            cfg = tdd.TddConfig(c)
            covered = []
            for n in range(10):
                for k in tdd.das_set(cfg, n):
                    covered.append((n - k) % 10)
            dl_sfs = [i for i in range(10) if tdd.sf_type(cfg, i) != tdd.SfType.U]
            assert sorted(covered) == sorted(dl_sfs), f"cfg {c}"

    def test_ack_tti_inverts_das(self):
        for c in range(7):
            cfg = tdd.TddConfig(c)
            for tti in range(40, 60):
                if tdd.sf_type(cfg, tti % 10) == tdd.SfType.U:
                    continue
                a = tdd.ack_tti(cfg, tti)
                assert a > tti
                assert tdd.sf_type(cfg, a % 10) == tdd.SfType.U
                assert (a - tti) in tdd.das_set(cfg, a % 10)

    def test_k_pusch_targets_uplink(self):
        for c in range(7):
            cfg = tdd.TddConfig(c)
            for n in range(10):
                k = tdd.K_PUSCH[c][n]
                if k:
                    assert tdd.sf_type(cfg, n) != tdd.SfType.U  # grant on DL
                    assert tdd.sf_type(cfg, n + k) == tdd.SfType.U
        # config 0 UL-index path
        assert tdd.pusch_tti(tdd.TddConfig(0), 20, ul_idx=1) == 27

    def test_k_phich_from_uplink_to_dl(self):
        for c in range(7):
            cfg = tdd.TddConfig(c)
            for n in range(10):
                k = tdd.K_PHICH[c][n]
                if tdd.sf_type(cfg, n) == tdd.SfType.U:
                    assert k > 0
                    assert tdd.sf_type(cfg, n + k) != tdd.SfType.U
                else:
                    assert k == 0

    def test_every_ul_subframe_grantable(self):
        # every U subframe is reachable from some grant subframe
        for c in range(7):
            cfg = tdd.TddConfig(c)
            targets = set()
            for n in range(10):
                k = tdd.K_PUSCH[c][n]
                if k:
                    targets.add((n + k) % 10)
            if c == 0:  # UL-index adds the +7 opportunities
                targets |= {(n + 7) % 10 for n in range(10) if tdd.K_PUSCH[0][n]}
            ul = {i for i in range(10) if tdd.sf_type(cfg, i) == tdd.SfType.U}
            assert ul == targets, f"cfg {c}"

    def test_ul_pid_in_range(self):
        # #UL HARQ procs per TS 36.213 Table 8-1 (normal HARQ operation)
        nof_ul_harq = {0: 7, 1: 4, 2: 2, 3: 3, 4: 2, 5: 1, 6: 6}
        for c in range(7):
            cfg = tdd.TddConfig(c)
            pids = set()
            for tti in range(0, 140):
                if tdd.sf_type(cfg, tti % 10) == tdd.SfType.U:
                    pid = tdd.ul_pid(cfg, tti)
                    assert 0 <= pid < nof_ul_harq[c]
                    pids.add(pid)
            assert len(pids) == nof_ul_harq[c], f"cfg {c} uses all PIDs"

    def test_mi_value(self):
        assert tdd.mi_value(tdd.TddConfig(0), 0) == 2
        assert tdd.mi_value(tdd.TddConfig(1), 4) == 1
        assert tdd.mi_value(tdd.TddConfig(5), 8) == 1
        assert tdd.nof_harq(tdd.TddConfig(2)) == 2

    def test_masks(self):
        cfg = tdd.TddConfig(1)
        assert tdd.ul_sf_mask(cfg).sum() == 4
        assert tdd.dl_sf_mask(cfg).sum() == 6
        assert tdd.dl_sf_mask(cfg, include_special=False).sum() == 4


class TestDciTdd:
    def test_sizes_grow_per_reference_rules(self):
        # dci.c:142-143,178: +1 HARQ bit, +2 DAI before ambiguous-size
        # padding (so the padded totals differ by 2..4)
        for prb in (6, 15, 25, 50, 75, 100):
            for a, b in (
                (Dci1A.nof_bits(prb), Dci1A.nof_bits(prb, tdd=True)),
                (Dci2.nof_bits(prb, "2a", 2), Dci2.nof_bits(prb, "2a", 2, tdd=True)),
                (Dci1B.nof_bits(prb, 2), Dci1B.nof_bits(prb, 2, tdd=True)),
            ):
                assert 2 <= b - a <= 4, (prb, a, b)

    @pytest.mark.parametrize("prb", [6, 25, 50, 100])
    def test_1a_roundtrip(self, prb):
        d = Dci1A(riv=37 % (prb * 3), mcs=17, harq_pid=11, ndi=1, rv=2, tpc=3, dai=2)
        bits = d.pack(prb, tdd=True)
        assert len(bits) == Dci1A.nof_bits(prb, tdd=True)
        d2 = Dci1A.unpack(bits, prb, tdd=True)
        assert d2 == d

    def test_0_roundtrip_ulindex_and_dai(self):
        d = Dci0(riv=11, mcs=9, ndi=1, tpc=2, dmrs_cshift=5, cqi_request=True, ul_idx=2)
        bits = d.pack(50, tdd=True, tdd_cfg0=True)
        assert len(bits) == Dci1A.nof_bits(50, tdd=True)  # 0/1A stay matched
        assert Dci0.unpack(bits, 50, tdd=True, tdd_cfg0=True) == d
        d = Dci0(riv=11, mcs=9, dai=3)
        assert Dci0.unpack(d.pack(50, tdd=True), 50, tdd=True).dai == 3

    def test_1_1b_1d_2_roundtrip(self):
        d1 = Dci1(rbg_bitmap=0x1FF, mcs=20, harq_pid=13, ndi=1, rv=1, tpc=2, dai=1)
        assert Dci1.unpack(d1.pack(50, tdd=True), 50, tdd=True) == d1
        db = Dci1B(riv=99, mcs=12, harq_pid=9, tpmi=3, pmi_confirm=1, dai=2)
        assert Dci1B.unpack(db.pack(50, tdd=True), 50, tdd=True) == db
        dd = Dci1D(riv=99, mcs=12, harq_pid=9, tpmi=1, power_offset=1, dai=3)
        assert Dci1D.unpack(dd.pack(50, tdd=True), 50, tdd=True) == dd
        d2 = Dci2(rbg_bitmap=0xAAAA, tpc=1, harq_pid=12, mcs1=15, rv1=1,
                  mcs2=9, ndi2=1, rv2=2, precoding_info=2, fmt="2", dai=3)
        got = Dci2.unpack(d2.pack(50, tdd=True), 50, fmt="2", tdd=True)
        assert got == d2

    def test_fdd_unchanged(self):
        # FDD sizing must be identical to before (golden-vector safety)
        assert Dci1A.nof_bits(50) == Dci1A.nof_bits(50, tdd=False)
        d = Dci1A(riv=10, mcs=5)
        assert Dci1A.unpack(d.pack(50), 50) == d


class TestTddPhy:
    def _cell(self):
        return Cell(nof_prb=25, nof_ports=1, id=123)

    def test_sync_positions(self):
        from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe

        cell = self._cell()
        cfg = tdd.TddConfig(1, 4)
        g1, _ = enb_dl_subframe(cell, 1, DlSched(cfi=1), tdd=cfg)
        c0 = (cell.nof_prb // 2) * 12 - 36 + 6 * (cell.nof_prb % 2)
        # PSS on symbol 2 of sf 1 (TS 36.211 §6.11.1.2)
        assert np.abs(g1[0, 2, c0 + 5 : c0 + 67]).min() > 0
        g0, _ = enb_dl_subframe(cell, 0, DlSched(cfi=1), tdd=cfg)
        # SSS on the last symbol of sf 0 (§6.11.2.2)
        assert np.abs(g0[0, -1, c0 + 5 : c0 + 67]).min() > 0
        # FDD positions empty in TDD
        assert np.abs(g0[0, cell.nsymb_per_slot - 1]).max() == 0

    def test_uplink_subframe_is_silent(self):
        from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe

        _, samples = enb_dl_subframe(self._cell(), 2, DlSched(), tdd=tdd.TddConfig(1, 4))
        assert np.abs(samples).max() == 0

    @pytest.mark.parametrize("ss_config", [3, 4, 8])
    def test_special_subframe_pdsch_e2e(self, ss_config):
        """eNB renders a DwPTS PDSCH in sf 1; UE decodes it (CRC + payload)."""
        from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
        from srsran_tpu.phy.phch.dci import Dci1A
        from srsran_tpu.phy.phch.pdsch import DlGrant
        from srsran_tpu.phy.phch.ra import riv_encode
        from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe

        cell = self._cell()
        cfg = tdd.TddConfig(1, ss_config)
        rnti = 0x4601
        rng = np.random.default_rng(7)
        mcs, l_crb = 9, 25
        tbs = dl_tbs(mcs, l_crb, dwpts=True)
        assert tbs < dl_tbs(mcs, l_crb)  # the 0.75 rule bites
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        from srsran_tpu.phy.phch.ra import dl_mcs_to_mod

        grant = DlGrant(prb=tuple(range(l_crb)), mod=dl_mcs_to_mod(mcs), tbs=tbs, rnti=rnti)
        dci = Dci1A(riv=riv_encode(cell.nof_prb, 0, l_crb), mcs=mcs, dai=0)
        sched = DlSched(cfi=1, dcis=[(dci.pack(cell.nof_prb, tdd=True), rnti, 4, 0)],
                        grants=[(grant, tb)])
        _, samples = enb_dl_subframe(cell, 1, sched, tdd=cfg)
        res = ue_dl_decode_subframe(cell, samples, 1, rnti, known_cfi=1, tdd=cfg)
        assert res.tbs and res.tbs[0][1]
        np.testing.assert_array_equal(np.asarray(res.tbs[0][0]).ravel()[:tbs], tb)

    def test_ul_subframe_decode_skipped(self):
        from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe

        cell = self._cell()
        z = np.zeros((1, cell.sf_len), np.complex64)
        res = ue_dl_decode_subframe(cell, z, 2, 0x4601, tdd=tdd.TddConfig(1, 4))
        assert res.tbs == [] and res.dcis == []

    def test_cell_search_detects_frame_type(self):
        """Dual-hypothesis search (reference sync.c:746-763): a TDD frame
        is found as TDD with the right PCI, an FDD frame as FDD."""
        from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
        from srsran_tpu.phy.ue.ue_sync import cell_search

        cell = Cell(nof_prb=6, nof_ports=1, id=151)
        cfg = tdd.TddConfig(1, 4)
        rng = np.random.default_rng(5)

        def frames(tdd_cfg, n_sf=20):
            out = []
            for i in range(n_sf):
                _, s = enb_dl_subframe(cell, i % 10, DlSched(cfi=1), tdd=tdd_cfg)
                out.append(s[0])
            x = np.concatenate(out)
            return x + 0.02 * (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x))).astype(np.complex64)

        res = cell_search(frames(cfg), 6)
        assert res is not None and res.frame_type == "tdd"
        assert res.cell_id == 151 and res.sf_idx in (0, 5)

        res_fdd = cell_search(frames(None), 6)
        assert res_fdd is not None and res_fdd.frame_type == "fdd"
        assert res_fdd.cell_id == 151

    def test_ue_sync_tracks_tdd_stream(self):
        """UeSync FIND→TRACK on a TDD sample stream: subframe indices line
        up (PDSCH placed in sf 4 decodes at the delivered sf 4)."""
        from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
        from srsran_tpu.phy.phch.dci import Dci1A
        from srsran_tpu.phy.phch.pdsch import DlGrant
        from srsran_tpu.phy.phch.ra import dl_mcs_to_mod, riv_encode
        from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe
        from srsran_tpu.phy.ue.ue_sync import UeSync

        cell = Cell(nof_prb=6, nof_ports=1, id=151)
        cfg = tdd.TddConfig(1, 4)
        rnti = 0x4601
        rng = np.random.default_rng(11)
        mcs, l_crb = 7, 6
        tbs = dl_tbs(mcs, l_crb)
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        grant = DlGrant(prb=tuple(range(l_crb)), mod=dl_mcs_to_mod(mcs), tbs=tbs, rnti=rnti)
        dci = Dci1A(riv=riv_encode(cell.nof_prb, 0, l_crb), mcs=mcs)

        stream = []
        for i in range(30):
            sf_idx = i % 10
            sched = DlSched(cfi=2)
            if sf_idx == 4:  # D subframe in config 1
                sched = DlSched(cfi=2, dcis=[(dci.pack(cell.nof_prb, tdd=True), rnti, 4, 0)],
                                grants=[(grant, tb)])
            _, s = enb_dl_subframe(cell, sf_idx, sched, tdd=cfg)
            stream.append(s[0])
        x = np.concatenate(stream)

        sync = UeSync(nof_prb=6)
        sync.push(x)
        got = 0
        while True:
            out = sync.pop_subframe()
            if out is None:
                break
            sf, idx = out
            if idx == 4 and sync.state == UeSync.TRACK:
                res = ue_dl_decode_subframe(cell, sf[None, :], 4, rnti, known_cfi=2, tdd=cfg)
                if res.tbs and res.tbs[0][1]:
                    got += 1
        assert sync.frame_type == "tdd"
        assert got >= 1

    def test_full_stack_tdd_attach_and_traffic(self):
        """Complete attach + bidirectional IP over a TDD config-1 cell:
        PRACH on sf 2, RAR/Msg3 with Table 8-2 timing, DL data on D
        subframes only, UL PUSCH on U subframes — the run_lte.sh analog
        in frame structure 2 (which the reference eNB cannot do at all)."""
        from srsran_tpu.apps.full_stack import EnbStack, UeStack
        from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
        from srsran_tpu.stack import security as sec
        from srsran_tpu.stack.nas_ue import Usim

        imsi = "001010123456789"
        key = bytes.fromhex("00112233445566778899aabbccddeeff")
        opc = sec.compute_opc(key, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))
        cell = Cell(nof_prb=15, nof_ports=1, id=7)
        cfg = tdd.TddConfig(1, 4)
        hss = Hss()
        hss.add_subscriber(Subscriber("ue1", imsi, key, opc, amf=b"\x80\x00", sqn=0))
        spgw = Spgw()
        mme = Mme(hss, spgw)
        enb = EnbStack(cell, mme, spgw, mcs=5, tdd_cfg=cfg)
        ue = UeStack(cell, Usim(imsi, key, opc), tdd_cfg=cfg)

        ul = None
        for _ in range(200):
            dl = enb.run_tti(ul)
            ul = ue.run_tti(dl)
            # a UE must never transmit PUSCH on a non-UL subframe
            if ul is not None and np.abs(ul).max() > 0:
                assert tdd.sf_type(cfg, ue.tti - 1) == tdd.SfType.U
            if (ue.rrc_state == UeStack.RRC_ACTIVE and ue.nas.state == ue.nas.REGISTERED):
                break
        assert ue.nas.state == ue.nas.REGISTERED
        assert enb.stats["prach_detected"] == 1 and ue.stats["rar"] == 1

        # DL + UL IP traffic
        pkts = [bytes([i]) * 48 for i in range(3)]
        for p in pkts:
            spgw.sgi_tx(ue.ue_ip, p)
            ue.send_ip_packet(bytes([0x80 ^ p[0]]) * 40)
        for _ in range(80):
            dl = enb.run_tti(ul)
            ul = ue.run_tti(dl)
            if len(ue.ip_rx) >= 3 and len(spgw.sgi_rx) >= 3:
                break
        assert ue.ip_rx[:3] == pkts
        assert len(spgw.sgi_rx) >= 3

    def test_normal_dl_subframe_tdd_e2e(self):
        """A plain D subframe decodes with TDD DCI sizing end-to-end."""
        from srsran_tpu.phy.enb.enb_dl import DlSched, enb_dl_subframe
        from srsran_tpu.phy.phch.dci import Dci1A
        from srsran_tpu.phy.phch.pdsch import DlGrant
        from srsran_tpu.phy.phch.ra import riv_encode
        from srsran_tpu.phy.ue.ue_dl import ue_dl_decode_subframe

        cell = self._cell()
        cfg = tdd.TddConfig(2, 4)
        rnti = 0x4601
        rng = np.random.default_rng(3)
        mcs, l_crb = 12, 25
        tbs = dl_tbs(mcs, l_crb)
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        from srsran_tpu.phy.phch.ra import dl_mcs_to_mod

        grant = DlGrant(prb=tuple(range(l_crb)), mod=dl_mcs_to_mod(mcs), tbs=tbs, rnti=rnti)
        dci = Dci1A(riv=riv_encode(cell.nof_prb, 0, l_crb), mcs=mcs, dai=1)
        sched = DlSched(cfi=1, dcis=[(dci.pack(cell.nof_prb, tdd=True), rnti, 4, 0)],
                        grants=[(grant, tb)])
        _, samples = enb_dl_subframe(cell, 4, sched, tdd=cfg)
        res = ue_dl_decode_subframe(cell, samples, 4, rnti, known_cfi=1, tdd=cfg)
        assert res.tbs and res.tbs[0][1]
        np.testing.assert_array_equal(np.asarray(res.tbs[0][0]).ravel()[:tbs], tb)


class TestAckMultiplexing:
    """TDD HARQ-ACK multiplexing with channel selection (TS 36.213 Tables
    10.1.3-2/3/4, mirrored from the reference's pucch_proc.c:470-585)."""

    def test_no_false_acks(self):
        """Over every reachable state pattern: a decoded ACK must imply a
        truly transmitted ACK (spurious retx allowed, false delivery never)."""
        import itertools

        from srsran_tpu.phy.phch.pucch import (
            ACK, DTX, NACK, tdd_channel_selection, tdd_channel_selection_decode)

        for m in (2, 3, 4):
            for states in itertools.product((ACK, NACK, DTX), repeat=m):
                if all(s == DTX for s in states):
                    continue
                res, (b0, b1) = tdd_channel_selection(list(states))
                mask = tdd_channel_selection_decode(res, b0, b1, m)
                for i, s in enumerate(states):
                    if mask[i]:
                        assert s == ACK, (m, states, res, (b0, b1), mask)

    def test_all_ack_roundtrip(self):
        from srsran_tpu.phy.phch.pucch import (
            ACK, tdd_channel_selection, tdd_channel_selection_decode)

        for m in (2, 3, 4):
            res, (b0, b1) = tdd_channel_selection([ACK] * m)
            assert tdd_channel_selection_decode(res, b0, b1, m) == (True,) * m

    def test_selected_resource_known_without_dtx(self):
        """When every grant was detected (no DTX), the selected resource's
        position is always a detected one — the UE can anchor on it.  (One
        reference row, pucch_proc.c M=4 'A,ND,A,N', picks an ND position;
        with a true DTX there the stack's guard keeps the UE silent, which
        the eNB reads as DTX → NACK-all → retransmission.)"""
        import itertools

        from srsran_tpu.phy.phch.pucch import ACK, NACK, _CS_ROWS, tdd_channel_selection

        for m in (2, 3, 4):
            for states in itertools.product((ACK, NACK), repeat=m):
                res, _ = tdd_channel_selection(list(states))
                assert 0 <= res < m  # a real, detectable position

    def test_e2e_tdd_cfg2_traffic_multiplexed(self):
        """TDD config 2 (M=4 association sets): attach + DL traffic flows
        with multiplexed ACKs driving the scheduler."""
        from srsran_tpu.apps.full_stack import EnbStack, UeStack
        from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber
        from srsran_tpu.stack import security as sec
        from srsran_tpu.stack.nas_ue import Usim

        imsi = "001010123456789"
        key = bytes.fromhex("00112233445566778899aabbccddeeff")
        opc = sec.compute_opc(key, bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d"))
        cell = Cell(nof_prb=15, nof_ports=1, id=7)
        cfg = tdd.TddConfig(2, 4)
        hss = Hss()
        hss.add_subscriber(Subscriber("ue1", imsi, key, opc, amf=b"\x80\x00", sqn=0))
        spgw = Spgw()
        mme = Mme(hss, spgw)
        enb = EnbStack(cell, mme, spgw, mcs=5, tdd_cfg=cfg)
        ue = UeStack(cell, Usim(imsi, key, opc), tdd_cfg=cfg)

        ul = None
        for _ in range(250):
            dl = enb.run_tti(ul)
            ul = ue.run_tti(dl)
            if ue.rrc_state == UeStack.RRC_ACTIVE and ue.nas.state == ue.nas.REGISTERED:
                break
        assert ue.nas.state == ue.nas.REGISTERED
        pkts = [bytes([i]) * 64 for i in range(4)]
        for p in pkts:
            spgw.sgi_tx(ue.ue_ip, p)
        for _ in range(120):
            dl = enb.run_tti(ul)
            ul = ue.run_tti(dl)
            if len(ue.ip_rx) >= len(pkts):
                break
        assert sorted(ue.ip_rx) == sorted(pkts)
        assert enb.stats.get("dl_ack", 0) > 0
