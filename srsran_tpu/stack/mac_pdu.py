"""MAC PDU pack/unpack, TS 36.321 §6 (re-design of `lib/src/mac/pdu.cc`).

Supports R/R/E/LCID(/F/L) subheaders with multiple SDUs and padding — the
subset needed to carry data bearers and be dissectable by Wireshark's
MAC-LTE dissector (pcaps from `runtime.pcap`).
"""

from __future__ import annotations

LCID_PADDING = 31
LCID_DTCH = 3  # first data bearer


def _sdu_subheader(lcid: int, length: int, is_last: bool) -> bytes:
    """R/R/E/LCID (+F/L unless last-in-chain)."""
    if is_last:
        return bytes([lcid & 0x1F])  # E=0, no L
    if length < 128:
        return bytes([0x20 | (lcid & 0x1F), length & 0x7F])
    return bytes([0x20 | (lcid & 0x1F), 0x80 | ((length >> 8) & 0x7F), length & 0xFF])


def mac_pack(sdus: list[tuple[int, bytes]], tb_size: int) -> bytes:
    """Pack (lcid, payload) SDUs into a TB of tb_size bytes, padding as
    needed (TS 36.321 §6.1.2: 1-2 padding subheaders lead the chain; larger
    padding is one E=0 padding subheader at the end of it)."""
    assert sdus, "at least one SDU"

    def layout(trailing_pad: bool):
        hdr = bytearray()
        for i, (lcid, pl) in enumerate(sdus):
            is_last = (i == len(sdus) - 1) and not trailing_pad
            hdr += _sdu_subheader(lcid, len(pl), is_last)
        if trailing_pad:
            hdr.append(LCID_PADDING)  # E=0 padding subheader closes the chain
        return hdr

    body = sum(len(p) for _, p in sdus)
    # first try: no trailing padding subheader
    hdr = layout(False)
    pad = tb_size - len(hdr) - body
    if pad < 0:
        raise ValueError(f"TB too small: need {len(hdr)+body}, have {tb_size}")
    if pad in (1, 2):
        # 1-2 single-byte padding subheaders at the START of the header
        pdu = bytes([0x20 | LCID_PADDING] * pad) + bytes(hdr) + b"".join(p for _, p in sdus)
        return pdu
    if pad > 2:
        hdr = layout(True)
        pdu = bytes(hdr) + b"".join(p for _, p in sdus)
        return pdu + b"\x00" * (tb_size - len(pdu))
    return bytes(hdr) + b"".join(p for _, p in sdus)


def mac_unpack(pdu: bytes) -> list[tuple[int, bytes]]:
    """Unpack a MAC PDU → list of (lcid, payload), padding stripped."""
    subheaders = []  # (lcid, length or None)
    pos = 0
    while pos < len(pdu):
        b = pdu[pos]
        pos += 1
        e = (b >> 5) & 1
        lcid = b & 0x1F
        if lcid == LCID_PADDING:
            if e:
                subheaders.append((lcid, 0))
                continue
            subheaders.append((lcid, None))
            break
        if e == 0:
            subheaders.append((lcid, None))  # last: rest of PDU
            break
        f_l = pdu[pos]
        pos += 1
        if f_l & 0x80:
            length = ((f_l & 0x7F) << 8) | pdu[pos]
            pos += 1
        else:
            length = f_l & 0x7F
        subheaders.append((lcid, length))
    out = []
    for i, (lcid, length) in enumerate(subheaders):
        if lcid == LCID_PADDING:
            continue
        if length is None:
            payload = pdu[pos:]
            out.append((lcid, payload))
            break
        out.append((lcid, pdu[pos : pos + length]))
        pos += length
    return out
