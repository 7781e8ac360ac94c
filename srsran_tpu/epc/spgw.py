"""SPGW: GTP-U user-plane anchor + IP address pool (re-design of
`srsepc/src/spgw/spgw.cc`, `gtpc.cc`, `gtpu.cc`).

The SGi side is a queue pair standing in for the TUN device: packets the
UE sends come out of `sgi_rx`; packets pushed into `sgi_tx(ip, pkt)` are
tunneled down to the right eNB bearer.
"""

from __future__ import annotations

from collections import deque

from ..stack.gtpu import GtpuEndpoint, gtpu_pack, gtpu_unpack


class Spgw:
    def __init__(self, pool_base: str = "172.16.0.0"):
        self.gtpu = GtpuEndpoint()
        self.next_teid = 1
        self.next_ip = 2
        self.pool_base = [int(x) for x in pool_base.split(".")]
        self.ip_to_teid: dict[str, int] = {}  # UE IP -> our (UL) TEID
        self.teid_to_enb: dict[int, int] = {}  # our TEID -> eNB DL TEID
        self.sgi_rx: deque[tuple[str, bytes]] = deque()
        self.tx_queue: deque[bytes] = deque()  # wire packets toward eNB

    def alloc_bearer(self, enb_dl_teid: int, static_ip: str | None = None) -> tuple[int, str]:
        """Create a default bearer; returns (our UL TEID, UE IP)."""
        teid = self.next_teid
        self.next_teid += 1
        if static_ip:
            ip = static_ip
        else:
            b = self.pool_base.copy()
            b[3] = self.next_ip & 0xFF
            b[2] += self.next_ip >> 8
            self.next_ip += 1
            ip = ".".join(map(str, b))
        self.ip_to_teid[ip] = teid
        self.teid_to_enb[teid] = enb_dl_teid
        self.gtpu.add_bearer(teid, enb_dl_teid)
        return teid, ip

    def rx_from_enb(self, pkt: bytes):
        """Uplink wire packet from an eNB → SGi."""
        out = gtpu_unpack(pkt)
        if out is None:
            return
        hdr, payload = out
        if hdr.teid in self.teid_to_enb:
            # IPv4 source address from the inner packet, else teid owner
            ip = next((k for k, v in self.ip_to_teid.items() if v == hdr.teid), "?")
            self.sgi_rx.append((ip, payload))

    def sgi_tx(self, ue_ip: str, pkt: bytes):
        """Downlink IP packet from the internet side → tunnel to eNB."""
        teid = self.ip_to_teid.get(ue_ip)
        if teid is None:
            return
        self.tx_queue.append(gtpu_pack(self.teid_to_enb[teid], pkt))

    def pop_tx(self) -> bytes | None:
        return self.tx_queue.popleft() if self.tx_queue else None
