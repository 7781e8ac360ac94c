"""GTP-Cv2 (TS 29.274) codec + S11 session plane + idle-mode paging chain
(the `srsepc/src/mme/mme_gtpc.cc` / `spgw/gtpc.cc` equivalents)."""

from srsran_tpu.epc import s1ap
from srsran_tpu.stack import gtpc, nas, security as sec
from srsran_tpu.stack.gtpu import gtpu_unpack
from srsran_tpu.stack.nas_ue import UeNas, Usim

from test_epc import IMSI, KEY, OP, make_epc, run_attach


# --- codec ---

def test_gtpc_header_roundtrip():
    msg = gtpc.pack(gtpc.ECHO_REQUEST, None, 0x1234, [(gtpc.IE_RECOVERY, 0, 7)])
    mt, teid, seq, ies = gtpc.unpack(msg)
    assert (mt, teid, seq) == (gtpc.ECHO_REQUEST, None, 0x1234)
    assert gtpc.find_ie(ies, gtpc.IE_RECOVERY) == 7

    msg = gtpc.pack(gtpc.MODIFY_BEARER_REQUEST, 0xDEADBEEF, 99, [])
    mt, teid, seq, ies = gtpc.unpack(msg)
    assert (mt, teid, seq, ies) == (gtpc.MODIFY_BEARER_REQUEST, 0xDEADBEEF, 99, [])


def test_gtpc_ie_roundtrip():
    bearer = [(gtpc.IE_EBI, 0, 5),
              (gtpc.IE_BEARER_QOS, 0, {"qci": 9, "pl": 15}),
              (gtpc.IE_FTEID, 2, {"iface": gtpc.FTEID_S1U_ENB, "teid": 42, "ip": "10.0.0.2"})]
    ies = [
        (gtpc.IE_IMSI, 0, "001010123456789"),  # odd digit count → 0xF pad
        (gtpc.IE_CAUSE, 0, gtpc.CAUSE_REQUEST_ACCEPTED),
        (gtpc.IE_APN, 0, "srsapn.mnc001.mcc001"),
        (gtpc.IE_AMBR, 0, (1_000_000, 2_000_000)),
        (gtpc.IE_PAA, 0, "172.16.0.2"),
        (gtpc.IE_RAT_TYPE, 0, gtpc.RAT_TYPE_EUTRAN),
        (gtpc.IE_FTEID, 0, {"iface": gtpc.FTEID_S11_MME, "teid": 0x1001, "ip": "127.0.1.2"}),
        (gtpc.IE_BEARER_CONTEXT, 0, bearer),
    ]
    msg = gtpc.pack(gtpc.CREATE_SESSION_REQUEST, 0, 1, ies)
    _, _, _, out = gtpc.unpack(msg)
    assert gtpc.find_ie(out, gtpc.IE_IMSI) == "001010123456789"
    assert gtpc.find_ie(out, gtpc.IE_APN) == "srsapn.mnc001.mcc001"
    assert gtpc.find_ie(out, gtpc.IE_AMBR) == (1_000_000, 2_000_000)
    assert gtpc.find_ie(out, gtpc.IE_PAA) == "172.16.0.2"
    fteid = gtpc.find_ie(out, gtpc.IE_FTEID, 0)
    assert fteid == {"iface": gtpc.FTEID_S11_MME, "teid": 0x1001, "ip": "127.0.1.2"}
    bctx = gtpc.find_ie(out, gtpc.IE_BEARER_CONTEXT, 0)
    assert gtpc.find_ie(bctx, gtpc.IE_EBI) == 5
    assert gtpc.find_ie(bctx, gtpc.IE_BEARER_QOS)["qci"] == 9
    assert gtpc.find_ie(bctx, gtpc.IE_FTEID, 2)["teid"] == 42


def test_spgw_echo():
    _, spgw = make_epc()
    resp = spgw.handle_gtpc(gtpc.pack(gtpc.ECHO_REQUEST, None, 3, []))
    mt, teid, seq, _ = gtpc.unpack(resp)
    assert (mt, teid, seq) == (gtpc.ECHO_RESPONSE, None, 3)


# --- session plane driven by the attach flow ---

def _attached_pair():
    mme, spgw = make_epc()
    ue = UeNas(Usim(IMSI, KEY, sec.compute_opc(KEY, OP)))
    run_attach(mme, ue)
    assert ue.state == UeNas.REGISTERED
    return mme, spgw, ue


def test_create_session_over_s11():
    mme, spgw, ue = _attached_pair()
    assert len(spgw.sessions) == 1
    sess = next(iter(spgw.sessions.values()))
    assert sess.imsi == IMSI and sess.ue_ip == ue.ue_ip
    # Modify Bearer switched the S1-U path to the eNB TEID (run_attach uses 101)
    assert sess.enb_teid == 101
    mctx = next(iter(mme.ues.values()))
    assert mctx.sgw_ctrl_teid == sess.ctrl_teid
    assert mctx.spgw_teid == sess.ctrl_teid  # srsepc-style: S1-U == ctrl TEID
    assert mctx.m_tmsi == ue.m_tmsi != 0


def test_delete_session():
    mme, spgw, _ = _attached_pair()
    mctx = next(iter(mme.ues.values()))
    mme.delete_session(mctx)
    assert not spgw.sessions and not spgw.ip_to_teid


# --- idle-mode: release → DDN → paging → service request → resume ---

def test_idle_paging_service_request_chain():
    mme, spgw, ue = _attached_pair()
    mctx = next(iter(mme.ues.values()))

    # 1. eNB reports UL inactivity → S1 release
    out = mme.handle(s1ap.pack_ue_context_release_request(mctx.mme_ue_id, mctx.enb_ue_id))
    assert s1ap.unpack(out[0])[0] == "ue_context_release_cmd"
    mme.handle(s1ap.pack_ue_context_release_complete(mctx.mme_ue_id, mctx.enb_ue_id))
    assert not mctx.ecm_connected
    sess = next(iter(spgw.sessions.values()))
    assert sess.enb_teid == 0  # access bearers released

    # 2. DL packet while idle → buffered + Downlink Data Notification
    spgw.sgi_tx(ue.ue_ip, b"wake up")
    assert spgw.pop_tx() is None and len(sess.buffered_dl) == 1
    ddn = spgw.gtpc_tx.popleft()
    assert gtpc.unpack(ddn)[0] == gtpc.DOWNLINK_DATA_NOTIFICATION

    # 3. MME turns the DDN into S1AP Paging by s-TMSI
    paging = mme.handle_gtpc(ddn)
    name, ies = s1ap.unpack(paging[0])
    assert name == "paging" and ies["cn_domain"] == "ps"
    kind, pid = ies["ue_paging_id"]
    assert kind == "s_tmsi"
    assert int.from_bytes(pid["m_tmsi"], "big") == ue.m_tmsi

    # 4. UE answers with a SERVICE REQUEST over a fresh RRC connection
    sr = ue.service_request()
    msg = nas.unpack(sr)
    assert msg.msg_type == nas.SERVICE_REQUEST
    out = mme.handle(s1ap.pack_initial_ue_message(
        enb_ue_id=55, nas_pdu=sr, cause="mt_access", m_tmsi=ue.m_tmsi))
    name, ies = s1ap.unpack(out[0])
    assert name == "init_context_setup_request"
    erab = ies["erab_to_be_setup_list_ctxt_su_req"][0]
    assert "nas_pdu" not in erab  # no NAS piggyback on service request
    # both sides agree on the service-request K_eNB
    assert ies["security_key"].to_bytes(32, "big") == ue.get_k_enb_service()

    # 5. eNB context setup → Modify Bearer → buffered DL flushed to new TEID
    mme.handle(s1ap.pack_initial_context_setup_response(
        mctx.mme_ue_id, 55, enb_teid=777))
    assert sess.enb_teid == 777 and not sess.buffered_dl
    hdr, payload = gtpu_unpack(spgw.pop_tx())
    assert hdr.teid == 777 and payload == b"wake up"
    assert mctx.ecm_connected


def test_service_request_bad_mac_rejected():
    mme, _, ue = _attached_pair()
    sr = bytearray(ue.service_request())
    sr[2] ^= 0xFF  # corrupt the short MAC
    out = mme.handle(s1ap.pack_initial_ue_message(
        enb_ue_id=56, nas_pdu=bytes(sr), cause="mt_access", m_tmsi=ue.m_tmsi))
    assert out == []
