"""RRC-lite: connection-management messages + procedures (re-design of the
semantics of `srsue/src/stack/rrc/rrc.cc` and `srsenb/src/stack/rrc/`).

The reference encodes RRC with generated ASN.1 PER (lib/src/asn1/
rrc_asn1.cc, 119 kLoC). Here the same procedure set — connection
establishment, NAS transfer, AS security activation, reconfiguration
with DRB setup — is carried by a compact TLV codec (this framework's own
wire format; the IE semantics match TS 36.331).

CCCH messages (ConnectionRequest/Setup) ride SRB0 = RLC TM; everything
else rides SRB1 = RLC AM under PDCP with integrity.
"""

from __future__ import annotations

import dataclasses

# message types (TS 36.331 procedure set)
CONN_REQUEST = 1
CONN_SETUP = 2
CONN_SETUP_COMPLETE = 3
DL_INFO_TRANSFER = 4
UL_INFO_TRANSFER = 5
SECURITY_MODE_COMMAND = 6
SECURITY_MODE_COMPLETE = 7
CONN_RECONFIGURATION = 8
CONN_RECONFIGURATION_COMPLETE = 9
CONN_RELEASE = 10

# IE tags
IE_UE_IDENTITY = 1
IE_NAS_PDU = 2
IE_CIPHER_ALG = 3
IE_INTEGRITY_ALG = 4
IE_DRB_ID = 5
IE_DRB_LCID = 6
IE_EPS_BEARER_ID = 7
IE_CRNTI = 8


def pack(msg_type: int, ies: dict[int, bytes | int] | None = None) -> bytes:
    body = bytearray()
    for tag, val in sorted((ies or {}).items()):
        if isinstance(val, int):
            val = val.to_bytes(4, "big")
        body += bytes([tag, len(val)]) + val
    return bytes([msg_type, len(body)]) + bytes(body)


@dataclasses.dataclass
class RrcMessage:
    msg_type: int
    ies: dict[int, bytes]

    def u32(self, tag: int) -> int:
        return int.from_bytes(self.ies[tag], "big")


def unpack(data: bytes) -> RrcMessage:
    ies = {}
    pos = 2
    end = 2 + data[1]
    while pos + 2 <= end:
        tag, ln = data[pos], data[pos + 1]
        ies[tag] = data[pos + 2 : pos + 2 + ln]
        pos += 2 + ln
    return RrcMessage(data[0], ies)
