"""MME: S1AP endpoint + per-UE NAS EMM state machine (re-design of
`srsepc/src/mme/mme.cc`, `nas.cc` 1,969 LoC).

Message-driven: `handle(s1ap_bytes) -> [s1ap_bytes...]` — the caller owns
the transport (TCP socket or in-process queue). Attach call flow per
TS 23.401 §5.3.2:

  InitialUEMessage(AttachRequest)
    → DownlinkNASTransport(AuthenticationRequest)
  UplinkNASTransport(AuthenticationResponse)      [XRES check]
    → DownlinkNASTransport(SecurityModeCommand)   [integrity, new ctx]
  UplinkNASTransport(SecurityModeComplete)        [protected]
    → InitialContextSetupRequest(AttachAccept + ActivateDefaultBearer,
                                 K_eNB, SPGW UL TEID)
  InitialContextSetupResponse(eNB DL TEID)        [bearer switched]
"""

from __future__ import annotations

import dataclasses

from ..stack import nas, security as sec
from . import s1ap
from .hss import Hss
from .spgw import Spgw

EMM_DEREGISTERED = 0
EMM_AUTH_PENDING = 1
EMM_SMC_PENDING = 2
EMM_ATTACH_ACCEPTED = 3
EMM_REGISTERED = 4


@dataclasses.dataclass
class UeCtx:
    mme_ue_id: int
    enb_ue_id: int
    imsi: str = ""
    state: int = EMM_DEREGISTERED
    xres: bytes = b""
    k_asme: bytes = b""
    sec_ctx: nas.NasSecurityContext | None = None
    ue_ip: str = ""
    spgw_teid: int = 0
    ebi: int = 5


class Mme:
    def __init__(self, hss: Hss, spgw: Spgw, eea: int = 2, eia: int = 2, plmn: bytes = b"\x00\xf1\x10"):
        self.hss = hss
        self.spgw = spgw
        self.eea = eea
        self.eia = eia
        self.plmn = plmn
        self.next_mme_ue_id = 1
        self.ues: dict[int, UeCtx] = {}
        self.attached_imsis: set[str] = set()

    def handle(self, data: bytes) -> list[bytes]:
        """Process ONE S1AP PDU (the SCTP-datagram framing contract)."""
        name, ies = s1ap.unpack(data)
        if name == "s1_setup_request":
            return [s1ap.pack_s1_setup_response(plmn=self.plmn)]
        if name == "init_ue_msg":
            return self._initial_ue(ies)
        if name == "ul_nas_transport":
            return self._ul_nas(ies)
        if name == "init_context_setup_response":
            return self._ctx_setup_response(ies)
        return []

    # --- procedures ---
    def _initial_ue(self, ies: dict) -> list[bytes]:
        enb_ue_id = ies["enb_ue_s1ap_id"]
        ue = UeCtx(self.next_mme_ue_id, enb_ue_id)
        self.next_mme_ue_id += 1
        self.ues[ue.mme_ue_id] = ue
        msg = nas.unpack(ies["nas_pdu"])
        if msg.msg_type != nas.ATTACH_REQUEST:
            return []
        ue.imsi = msg.fields["imsi"]
        av = self.hss.get_auth_vector(ue.imsi, self.plmn)
        if av is None:
            return []  # unknown IMSI → (attach reject elided)
        ue.xres = av.xres
        ue.k_asme = av.k_asme
        ue.state = EMM_AUTH_PENDING
        pdu = nas.pack_authentication_request(av.rand, av.autn)
        return [self._dl_nas(ue, pdu)]

    def _ul_nas(self, ies: dict) -> list[bytes]:
        ue = self.ues.get(ies["mme_ue_s1ap_id"])
        if ue is None:
            return []
        pdu = ies["nas_pdu"]
        if ue.sec_ctx is not None and (pdu[0] >> 4) != nas.SEC_HDR_PLAIN:
            inner = ue.sec_ctx.unprotect(pdu)
            if inner is None:
                return []
        else:
            inner = pdu
        msg = nas.unpack(inner)
        if msg.msg_type == nas.AUTHENTICATION_RESPONSE and ue.state == EMM_AUTH_PENDING:
            if msg.fields["res"] != ue.xres:
                return []  # auth failure
            k_enc, k_int = sec.generate_nas_keys(ue.k_asme, self.eea, self.eia)
            ue.sec_ctx = nas.NasSecurityContext(k_enc, k_int, self.eea, self.eia, is_ue=False)
            ue.state = EMM_SMC_PENDING
            smc = nas.pack_security_mode_command(self.eea, self.eia)
            # SMC: integrity only, new context (TS 24.301 §5.4.3)
            prot = ue.sec_ctx.protect(smc, ciphered=False, new_ctx=True)
            return [self._dl_nas(ue, prot)]
        if msg.msg_type == nas.SECURITY_MODE_COMPLETE and ue.state == EMM_SMC_PENDING:
            # allocate bearer now; eNB DL TEID arrives in ctx setup response
            ue.spgw_teid, ue.ue_ip = self.spgw.alloc_bearer(enb_dl_teid=0)
            accept = nas.pack_attach_accept(ue.ue_ip, ebi=ue.ebi)
            prot = ue.sec_ctx.protect(accept)
            k_enb = sec.generate_k_enb(ue.k_asme, 0)
            ue.state = EMM_ATTACH_ACCEPTED
            return [
                s1ap.pack_initial_context_setup_request(
                    ue.mme_ue_id, ue.enb_ue_id, prot, k_enb,
                    spgw_teid=ue.spgw_teid, ebi=ue.ebi,
                )
            ]
        if msg.msg_type == nas.ATTACH_COMPLETE and ue.state == EMM_ATTACH_ACCEPTED:
            ue.state = EMM_REGISTERED
            self.attached_imsis.add(ue.imsi)
            return []
        return []

    def _ctx_setup_response(self, ies: dict) -> list[bytes]:
        ue = self.ues.get(ies["mme_ue_s1ap_id"])
        if ue is None:
            return []
        enb_teid = int.from_bytes(ies["erab_setup_list_ctxt_su_res"][0]["gtp_teid"], "big")
        self.spgw.teid_to_enb[ue.spgw_teid] = enb_teid
        self.spgw.gtpu.tx_map[ue.spgw_teid] = enb_teid
        return []

    def _dl_nas(self, ue: UeCtx, pdu: bytes) -> bytes:
        return s1ap.pack_dl_nas(ue.mme_ue_id, ue.enb_ue_id, pdu)
