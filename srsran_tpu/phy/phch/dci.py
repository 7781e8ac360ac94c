"""DCI pack/unpack, TS 36.212 §5.3.3 (re-design of lib/src/phy/phch/dci.c).

Round-1 scope: formats 1A (compact DL scheduling) and 0 (UL grant) — the two
that carry the LTE data plane.  Other formats follow the same Bits helper.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def riv_nbits(nof_prb: int) -> int:
    return int(math.ceil(math.log2(nof_prb * (nof_prb + 1) / 2)))


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):
        self.bits += [(value >> (n - 1 - i)) & 1 for i in range(n)]

    def array(self) -> np.ndarray:
        return np.array(self.bits, np.uint8)


class _BitReader:
    def __init__(self, bits):
        self.bits = list(map(int, bits))
        self.pos = 0

    def get(self, n: int) -> int:
        v = int("".join(map(str, self.bits[self.pos : self.pos + n])), 2)
        self.pos += n
        return v


@dataclasses.dataclass
class Dci1A:
    """DCI format 1A (FDD, C-RNTI)."""

    riv: int = 0
    mcs: int = 0
    harq_pid: int = 0
    ndi: int = 0
    rv: int = 0
    tpc: int = 0
    distributed: bool = False

    @staticmethod
    def nof_bits(nof_prb: int) -> int:
        n = 1 + 1 + riv_nbits(nof_prb) + 5 + 3 + 1 + 2 + 2
        # format 0/1A are padded to equal size; 1A is already >= format 0 here
        return n

    def pack(self, nof_prb: int) -> np.ndarray:
        w = _BitWriter()
        w.put(1, 1)  # flag: 1 = format 1A
        w.put(int(self.distributed), 1)
        w.put(self.riv, riv_nbits(nof_prb))
        w.put(self.mcs, 5)
        w.put(self.harq_pid, 3)
        w.put(self.ndi, 1)
        w.put(self.rv, 2)
        w.put(self.tpc, 2)
        return w.array()

    @classmethod
    def unpack(cls, bits, nof_prb: int) -> "Dci1A":
        r = _BitReader(bits)
        flag = r.get(1)
        if flag != 1:
            raise ValueError("not format 1A")
        dist = bool(r.get(1))
        riv = r.get(riv_nbits(nof_prb))
        mcs = r.get(5)
        harq = r.get(3)
        ndi = r.get(1)
        rv = r.get(2)
        tpc = r.get(2)
        return cls(riv, mcs, harq, ndi, rv, tpc, dist)


@dataclasses.dataclass
class Dci0:
    """DCI format 0 (UL grant, FDD)."""

    riv: int = 0
    mcs: int = 0
    ndi: int = 0
    tpc: int = 0
    dmrs_cshift: int = 0
    cqi_request: bool = False
    hopping: bool = False

    def pack(self, nof_prb: int, target_len: int | None = None) -> np.ndarray:
        w = _BitWriter()
        w.put(0, 1)  # flag: 0 = format 0
        w.put(int(self.hopping), 1)
        w.put(self.riv, riv_nbits(nof_prb))
        w.put(self.mcs, 5)
        w.put(self.ndi, 1)
        w.put(self.tpc, 2)
        w.put(self.dmrs_cshift, 3)
        w.put(int(self.cqi_request), 1)
        out = w.array()
        tgt = target_len or Dci1A.nof_bits(nof_prb)
        if len(out) < tgt:
            out = np.concatenate([out, np.zeros(tgt - len(out), np.uint8)])
        return out

    @classmethod
    def unpack(cls, bits, nof_prb: int) -> "Dci0":
        r = _BitReader(bits)
        if r.get(1) != 0:
            raise ValueError("not format 0")
        hop = bool(r.get(1))
        riv = r.get(riv_nbits(nof_prb))
        mcs = r.get(5)
        ndi = r.get(1)
        tpc = r.get(2)
        cs = r.get(3)
        cqi = bool(r.get(1))
        return cls(riv, mcs, ndi, tpc, cs, cqi, hop)
