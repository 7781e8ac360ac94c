"""EPC + NAS attach flow tests (the srsepc/test + srsue/test/upper/nas
equivalents): full UE<->MME attach with Milenage auth, NAS security,
bearer setup, and GTP-U user-plane forwarding."""

from srsran_tpu.epc import Hss, Mme, Spgw, Subscriber, s1ap
from srsran_tpu.stack import nas, security as sec
from srsran_tpu.stack.gtpu import GtpuEndpoint, gtpu_pack, gtpu_unpack
from srsran_tpu.stack.nas_ue import UeNas, Usim

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")
OP = bytes.fromhex("63bfa50ee6523365ff14c1f45f88737d")


def make_epc():
    hss = Hss()
    hss.add_subscriber(
        Subscriber(name="ue1", imsi=IMSI, key=KEY, opc=sec.compute_opc(KEY, OP), amf=b"\x80\x00", sqn=0)
    )
    spgw = Spgw()
    return Mme(hss, spgw), spgw


def test_gtpu_roundtrip():
    a, b = GtpuEndpoint(), GtpuEndpoint()
    a.add_bearer(local_teid=1, remote_teid=2)
    b.add_bearer(local_teid=2, remote_teid=1)
    pkt = a.tx(1, b"ip packet")
    b.rx(pkt)
    assert b.read(2) == b"ip packet"
    hdr, payload = gtpu_unpack(pkt)
    assert hdr.teid == 2 and payload == b"ip packet"


def test_gtpu_echo():
    ep = GtpuEndpoint()
    resp = ep.rx(gtpu_pack(0, b"", seq=7, msg_type=1))
    hdr, _ = gtpu_unpack(resp)
    assert hdr.msg_type == 2 and hdr.seq == 7


def test_nas_imsi_bcd_roundtrip():
    for imsi in ("001010123456789", "262011234567890"):
        assert nas.bcd_to_imsi(nas.imsi_to_bcd(imsi)) == imsi


def run_attach(mme, ue_nas, enb_ue_id=1):
    """Drive the S1AP attach flow as the eNB would (s1ap.cc glue)."""
    msgs = mme.handle(s1ap.pack_initial_ue_message(enb_ue_id, ue_nas.attach_request()))
    k_enb = None
    spgw_ul_teid = None
    for _ in range(10):
        nxt = []
        for m_bytes in msgs:
            name, ies = s1ap.unpack(m_bytes)
            if name == "dl_nas_transport":
                resp = ue_nas.handle_dl(ies["nas_pdu"])
                if resp is not None:
                    nxt += mme.handle(
                        s1ap.pack_ul_nas(ies["mme_ue_s1ap_id"], enb_ue_id, resp)
                    )
            elif name == "init_context_setup_request":
                k_enb = ies["security_key"].to_bytes(32, "big")
                erab = ies["erab_to_be_setup_list_ctxt_su_req"][0]
                spgw_ul_teid = int.from_bytes(erab["gtp_teid"], "big")
                resp = ue_nas.handle_dl(erab["nas_pdu"])
                mme_id = ies["mme_ue_s1ap_id"]
                nxt += mme.handle(
                    s1ap.pack_initial_context_setup_response(
                        mme_id, enb_ue_id, enb_teid=100 + enb_ue_id, ebi=erab["erab_id"]
                    )
                )
                if resp is not None:
                    nxt += mme.handle(s1ap.pack_ul_nas(mme_id, enb_ue_id, resp))
        if not nxt:
            break
        msgs = nxt
    return k_enb, spgw_ul_teid


def test_full_attach_flow():
    mme, spgw = make_epc()
    ue = UeNas(Usim(IMSI, KEY, sec.compute_opc(KEY, OP)))
    k_enb, spgw_teid = run_attach(mme, ue)
    assert ue.state == UeNas.REGISTERED
    assert IMSI in mme.attached_imsis
    assert ue.ue_ip.startswith("172.16.")
    assert k_enb is not None and len(k_enb) == 32
    # both sides derived the same K_eNB
    assert ue.get_k_enb() == k_enb
    # user plane: downlink IP packet reaches the eNB tunnel with its DL TEID
    spgw.sgi_tx(ue.ue_ip, b"downlink ip packet")
    pkt = spgw.pop_tx()
    hdr, payload = gtpu_unpack(pkt)
    assert hdr.teid == 101 and payload == b"downlink ip packet"
    # uplink through the SPGW to SGi
    spgw.rx_from_enb(gtpu_pack(spgw_teid, b"uplink ip packet"))
    ip, pl = spgw.sgi_rx.popleft()
    assert ip == ue.ue_ip and pl == b"uplink ip packet"


def test_attach_wrong_key_fails():
    mme, _ = make_epc()
    bad = UeNas(Usim(IMSI, bytes(16), sec.compute_opc(KEY, OP)))
    run_attach(mme, bad)
    assert bad.state != UeNas.REGISTERED
    assert IMSI not in mme.attached_imsis


def test_s1_setup():
    mme, _ = make_epc()
    out = mme.handle(s1ap.pack_s1_setup_request(enb_id=0x19B))
    name, ies = s1ap.unpack(out[0])
    assert name == "s1_setup_response"
    assert ies["served_gummeis"][0]["served_plmns"] == [mme.plmn]


def test_hss_csv(tmp_path):
    p = tmp_path / "user_db.csv"
    p.write_text(
        "#comment\n"
        f"ue1,mil,{IMSI},{KEY.hex()},opc,{sec.compute_opc(KEY, OP).hex()},8000,0,9,dynamic\n"
    )
    hss = Hss()
    hss.load_csv(str(p))
    av = hss.get_auth_vector(IMSI)
    assert av is not None and len(av.rand) == 16 and len(av.autn) == 16


def test_mbms_gw_to_pmch_e2e():
    """SGi-mb IP packet → MBMS-GW GTP-U (M1-U) → eNB M1-U receiver → PMCH
    over a mixed-CP MBSFN subframe → UE-side decode returns the packet."""
    import jax.numpy as jnp
    import numpy as np

    from srsran_tpu.epc import M1uReceiver, MbmsGw
    from srsran_tpu.phy.common import CP, Cell
    from srsran_tpu.phy.modem import Mod
    from srsran_tpu.phy.ofdm import OfdmConfig, ofdm_rx_sf_mbsfn, ofdm_tx_sf_mbsfn
    from srsran_tpu.phy.phch.pmch import pmch_decode, pmch_encode_np
    from srsran_tpu.phy.phch.ra import dl_tbs

    gw = MbmsGw()
    rx_m1u = M1uReceiver()
    ip_pkt = bytes(range(200)) * 3  # pretend multicast IP packet
    gw.sgi_mb_rx(ip_pkt)
    wire = gw.pop_tx()
    assert wire is not None
    rx_m1u.rx(wire)
    sdu = rx_m1u.read_mch_sdu()
    assert sdu == ip_pkt

    # schedule the MCH SDU onto a PMCH subframe (length-prefixed MAC-style)
    cell = Cell(nof_prb=50, nof_ports=1, id=1, cp=CP.EXT)
    tbs = dl_tbs(11, 50)
    payload = len(sdu).to_bytes(2, "big") + sdu
    tb = np.unpackbits(np.frombuffer(payload.ljust(tbs // 8, b"\0"), np.uint8))[:tbs]
    grid = pmch_encode_np(cell, 2, 1, Mod.QAM16, tbs, tb)
    ofdm = OfdmConfig.from_cell(cell, normalize=True)
    tx = ofdm_tx_sf_mbsfn(ofdm, jnp.asarray(grid), 2)
    rx_grid = np.asarray(ofdm_rx_sf_mbsfn(ofdm, tx, 2))
    tb_hat, ok = pmch_decode(rx_grid, cell, 2, 1, Mod.QAM16, tbs)
    assert ok
    out = np.packbits(tb_hat).tobytes()
    n = int.from_bytes(out[:2], "big")
    assert out[2 : 2 + n] == ip_pkt
