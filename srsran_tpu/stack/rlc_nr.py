"""NR RLC entities, TS 38.322 (re-design of `lib/src/upper/rlc_um_nr.cc`
/ `rlc_am_nr.cc` — 5G-NR scaffolding).

NR differs from LTE RLC: one RLC SDU per PDU (no concatenation/LI
chains); segmentation uses an SI field (2 bits: full / first / middle /
last) plus a 16-bit Segment Offset on non-first segments.

UM: 6- or 12-bit SN; the SN is only present for segmented SDUs.
AM: 12- or 18-bit SN, SO-based status reporting with NACK ranges.
This module implements UM fully and the AM data-path header codec
(the LTE-style AM machinery in `rlc.py` covers the 4G data plane).
"""

from __future__ import annotations

import dataclasses
from collections import deque

SI_FULL, SI_FIRST, SI_LAST, SI_MIDDLE = 0, 1, 2, 3


def um_pack(si: int, sn: int | None, so: int | None, data: bytes, sn_bits: int = 6) -> bytes:
    """UMD PDU header (TS 38.322 §6.2.2.3)."""
    if si == SI_FULL:
        return bytes([si << 6]) + data
    if sn_bits == 6:
        hdr = bytearray([(si << 6) | (sn & 0x3F)])
    else:
        hdr = bytearray([(si << 6) | ((sn >> 8) & 0xF), sn & 0xFF])
    if si in (SI_MIDDLE, SI_LAST):
        hdr += so.to_bytes(2, "big")
    return bytes(hdr) + data


def um_unpack(pdu: bytes, sn_bits: int = 6):
    """Returns (si, sn, so, data)."""
    si = (pdu[0] >> 6) & 3
    if si == SI_FULL:
        return si, None, None, pdu[1:]
    if sn_bits == 6:
        sn = pdu[0] & 0x3F
        pos = 1
    else:
        sn = ((pdu[0] & 0xF) << 8) | pdu[1]
        pos = 2
    so = None
    if si in (SI_MIDDLE, SI_LAST):
        so = int.from_bytes(pdu[pos : pos + 2], "big")
        pos += 2
    return si, sn, so, pdu[pos:]


class RlcUmNr:
    """NR UM entity: SDU in/out with SO-based segmentation."""

    def __init__(self, sn_bits: int = 6):
        self.sn_bits = sn_bits
        self.mod = 1 << sn_bits
        self.tx_sdus: deque[bytes] = deque()
        self.tx_sn = 0
        self.tx_partial: tuple[bytes, int] | None = None  # (rest, so)
        self.rx_segments: dict[int, dict[int, bytes]] = {}
        self.rx_last_so: dict[int, int] = {}
        self.rx_sdu_queue: deque[bytes] = deque()

    def write_sdu(self, sdu: bytes):
        self.tx_sdus.append(bytes(sdu))

    def has_data(self) -> bool:
        return bool(self.tx_sdus) or self.tx_partial is not None

    def read_pdu(self, nof_bytes: int) -> bytes | None:
        hdr_max = 1 + (0 if self.sn_bits == 6 else 1) + 2
        if nof_bytes <= hdr_max or not self.has_data():
            return None
        if self.tx_partial is not None:
            rest, so = self.tx_partial
            room = nof_bytes - hdr_max
            if len(rest) <= room:
                self.tx_partial = None
                pdu = um_pack(SI_LAST, self.tx_sn, so, rest, self.sn_bits)
                self.tx_sn = (self.tx_sn + 1) % self.mod
                return pdu
            self.tx_partial = (rest[room:], so + room)
            return um_pack(SI_MIDDLE, self.tx_sn, so, rest[:room], self.sn_bits)
        sdu = self.tx_sdus[0]
        if len(sdu) + 1 <= nof_bytes:
            self.tx_sdus.popleft()
            return um_pack(SI_FULL, None, None, sdu)
        room = nof_bytes - (1 if self.sn_bits == 6 else 2)
        self.tx_sdus.popleft()
        self.tx_partial = (sdu[room:], room)
        return um_pack(SI_FIRST, self.tx_sn, None, sdu[:room], self.sn_bits)

    def write_pdu(self, pdu: bytes):
        si, sn, so, data = um_unpack(pdu, self.sn_bits)
        if si == SI_FULL:
            self.rx_sdu_queue.append(data)
            return
        segs = self.rx_segments.setdefault(sn, {})
        segs[so or 0] = data
        if si == SI_LAST:
            self.rx_last_so[sn] = (so or 0) + len(data)
        if sn in self.rx_last_so:
            total = self.rx_last_so[sn]
            buf = bytearray(total)
            covered = 0
            for off, seg in sorted(segs.items()):
                buf[off : off + len(seg)] = seg
                covered += len(seg)
            if covered >= total:
                self.rx_sdu_queue.append(bytes(buf))
                del self.rx_segments[sn]
                del self.rx_last_so[sn]

    def read_sdu(self) -> bytes | None:
        return self.rx_sdu_queue.popleft() if self.rx_sdu_queue else None


# --- AM data PDU header codec (TS 38.322 §6.2.2.4) -------------------------


def am_pack(si: int, sn: int, so: int | None, data: bytes, poll: bool = False, sn_bits: int = 12) -> bytes:
    b0 = 0x80 | ((1 if poll else 0) << 6) | (si << 4)
    if sn_bits == 12:
        hdr = bytearray([b0 | ((sn >> 8) & 0xF), sn & 0xFF])
    else:  # 18-bit
        hdr = bytearray([b0 | ((sn >> 16) & 0x3), (sn >> 8) & 0xFF, sn & 0xFF])
    if si in (SI_MIDDLE, SI_LAST):
        hdr += (so or 0).to_bytes(2, "big")
    return bytes(hdr) + data


def am_unpack(pdu: bytes, sn_bits: int = 12):
    """Returns (si, sn, so, poll, data)."""
    poll = bool(pdu[0] & 0x40)
    si = (pdu[0] >> 4) & 3
    if sn_bits == 12:
        sn = ((pdu[0] & 0xF) << 8) | pdu[1]
        pos = 2
    else:
        sn = ((pdu[0] & 0x3) << 16) | (pdu[1] << 8) | pdu[2]
        pos = 3
    so = None
    if si in (SI_MIDDLE, SI_LAST):
        so = int.from_bytes(pdu[pos : pos + 2], "big")
        pos += 2
    return si, sn, so, poll, pdu[pos:]
