"""S1AP-lite: the eNB↔MME control protocol (re-design of the semantics of
`srsenb/src/stack/upper/s1ap.cc` / `srsepc/src/mme/s1ap*.cc`).

The reference uses full ASN.1 PER S1AP over SCTP (lib/src/asn1/
s1ap_asn1.cc, 60 kLoC generated). Here the same procedures are carried by
a compact deterministic TLV codec over any reliable byte pipe (TCP or an
in-process queue) — the procedure set and IE semantics match; the wire
format is this framework's own.

Procedures: S1SetupRequest/Response, InitialUEMessage, Downlink/Uplink
NASTransport, InitialContextSetupRequest/Response, UEContextRelease.
"""

from __future__ import annotations

import dataclasses

# message types
S1_SETUP_REQUEST = 1
S1_SETUP_RESPONSE = 2
INITIAL_UE_MESSAGE = 3
DOWNLINK_NAS_TRANSPORT = 4
UPLINK_NAS_TRANSPORT = 5
INITIAL_CONTEXT_SETUP_REQUEST = 6
INITIAL_CONTEXT_SETUP_RESPONSE = 7
UE_CONTEXT_RELEASE = 8

# IE tags
IE_ENB_ID = 1
IE_MME_UE_ID = 2
IE_ENB_UE_ID = 3
IE_NAS_PDU = 4
IE_TEID_UL = 5
IE_TEID_DL = 6
IE_KENB = 7
IE_EBI = 8
IE_PLMN = 9
IE_TAC = 10
IE_CAUSE = 11
IE_ADDR = 12


def pack(msg_type: int, ies: dict[int, bytes | int]) -> bytes:
    body = bytearray()
    for tag, val in sorted(ies.items()):
        if isinstance(val, int):
            val = val.to_bytes(4, "big")
        body += bytes([tag]) + len(val).to_bytes(2, "big") + val
    return bytes([msg_type]) + len(body).to_bytes(2, "big") + bytes(body)


@dataclasses.dataclass
class S1apMessage:
    msg_type: int
    ies: dict[int, bytes]

    def u32(self, tag: int) -> int:
        return int.from_bytes(self.ies[tag], "big")


def unpack(data: bytes) -> tuple[S1apMessage, bytes] | None:
    """Parse one message from a byte stream; returns (msg, remainder)."""
    if len(data) < 3:
        return None
    length = int.from_bytes(data[1:3], "big")
    if len(data) < 3 + length:
        return None
    body = data[3 : 3 + length]
    ies = {}
    pos = 0
    while pos + 3 <= len(body):
        tag = body[pos]
        ln = int.from_bytes(body[pos + 1 : pos + 3], "big")
        ies[tag] = body[pos + 3 : pos + 3 + ln]
        pos += 3 + ln
    return S1apMessage(data[0], ies), data[3 + length :]
