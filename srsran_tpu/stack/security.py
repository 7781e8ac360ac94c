"""LTE security algorithms, TS 33.401 / TS 35.20x (re-design of
`lib/src/common/liblte_security.cc`, `s3g.cc`, `zuc.cc`).

Implements from the public 3GPP specifications:
  - 128-EEA1 / 128-EIA1  (SNOW 3G, UEA2/UIA2 spec)
  - 128-EEA2 / 128-EIA2  (AES-CTR / AES-CMAC, NIST SP 800-38A/B)
  - 128-EEA3 / 128-EIA3  (ZUC)
  - Milenage f1/f1*/f2345/f5* + OPc derivation (TS 35.206)
  - TS 33.401 key derivation (K_ASME, K_eNB, NAS/RRC/UP keys) via
    HMAC-SHA256 (Annex A)

All functions are host-side (control plane / per-PDU crypto is not a TPU
workload). AES is a self-contained pure-Python implementation with the
S-box computed from its GF(2^8) definition; SNOW3G's SQ box and ZUC's
S0/S1/D tables are constants from the respective algorithm specs.

Validated against the 3GPP conformance test vectors (the same sets the
reference checks in lib/test/common/test_eea*.cc, test_eia*.cc,
test_f12345.cc).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache as _lru_cache

import numpy as np
import hmac as _hmac

# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), pure Python
# ---------------------------------------------------------------------------


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_sbox():
    # multiplicative inverse in GF(2^8) + affine transform (FIPS-197 §5.1.1)
    sbox = [0] * 256
    for x in range(256):
        inv = 0
        if x:
            # x^254 = x^-1
            inv = x
            for _ in range(6):
                inv = _gf_mul(_gf_mul(inv, inv), x)
            inv = _gf_mul(inv, inv)
        b = inv
        res = 0x63
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
            ) & 1
            res ^= bit << i
        sbox[x] = res
    return bytes(sbox)


AES_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _aes_expand_key(key: bytes) -> list[bytes]:
    words = [key[4 * i : 4 * i + 4] for i in range(4)]
    for i in range(4, 44):
        t = words[i - 1]
        if i % 4 == 0:
            t = bytes(AES_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ _RCON[i // 4 - 1], t[1], t[2], t[3]])
        words.append(bytes(a ^ b for a, b in zip(words[i - 4], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(11)]


def _aes_encrypt_block(rks: list[bytes], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rks[0])]
    for rnd in range(1, 11):
        s = [AES_SBOX[b] for b in s]
        # ShiftRows (state is column-major: s[r + 4c])
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < 10:
            ns = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                ns += [
                    _gf_mul(col[0], 2) ^ _gf_mul(col[1], 3) ^ col[2] ^ col[3],
                    col[0] ^ _gf_mul(col[1], 2) ^ _gf_mul(col[2], 3) ^ col[3],
                    col[0] ^ col[1] ^ _gf_mul(col[2], 2) ^ _gf_mul(col[3], 3),
                    _gf_mul(col[0], 3) ^ col[1] ^ col[2] ^ _gf_mul(col[3], 2),
                ]
            s = ns
        s = [b ^ k for b, k in zip(s, rks[rnd])]
    return bytes(s)


def aes128_encrypt(key: bytes, block: bytes) -> bytes:
    """Encrypt one 16-byte block."""
    return _aes_encrypt_block(_aes_expand_key(key), block)



# Vectorized AES tables: ShiftRows permutation of the column-major state
# (s[r + 4c]) and the GF(2^8) xtime multiples used by MixColumns.
_SBOX_NP = np.frombuffer(AES_SBOX, np.uint8)
_SHIFT_ROWS = np.array([(i + 4 * (i % 4)) % 16 for i in range(16)])
_GM2 = np.array([_gf_mul(x, 2) for x in range(256)], np.uint8)
_GM3 = np.array([_gf_mul(x, 3) for x in range(256)], np.uint8)


@_lru_cache(maxsize=32)
def _aes_expand_key_np(key: bytes) -> np.ndarray:
    return np.frombuffer(b"".join(_aes_expand_key(key)), np.uint8).reshape(11, 16)


def _aes_encrypt_blocks_np(rks: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """Encrypt (n, 16) uint8 blocks at once (FIPS-197, batched over n)."""
    s = blocks ^ rks[0]
    for rnd in range(1, 11):
        s = _SBOX_NP[s][:, _SHIFT_ROWS]
        if rnd < 10:
            a = s.reshape(-1, 4, 4)  # (n, col, row)
            r0, r1, r2, r3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
            s = np.stack(
                [
                    _GM2[r0] ^ _GM3[r1] ^ r2 ^ r3,
                    r0 ^ _GM2[r1] ^ _GM3[r2] ^ r3,
                    r0 ^ r1 ^ _GM2[r2] ^ _GM3[r3],
                    _GM3[r0] ^ r1 ^ r2 ^ _GM2[r3],
                ],
                axis=-1,
            ).reshape(-1, 16)
        s = s ^ rks[rnd]
    return s


def aes128_ctr(key: bytes, counter0: bytes, data: bytes) -> bytes:
    """AES-CTR keystream XOR, 128-bit big-endian counter increment.

    The keystream blocks are independent, so all of them are encrypted in
    one numpy-vectorized pass (`_aes_encrypt_blocks_np`) — per-PDU EEA2 on
    the full-stack control path was the single biggest host cost with the
    scalar block cipher (~30 ms/TTI at 25 PRB)."""
    n = (len(data) + 15) // 16
    if n == 0:
        return b""
    ctr = int.from_bytes(counter0, "big")
    ctrs = np.frombuffer(
        b"".join(((ctr + i) & ((1 << 128) - 1)).to_bytes(16, "big") for i in range(n)),
        np.uint8,
    ).reshape(n, 16)
    ks = _aes_encrypt_blocks_np(_aes_expand_key_np(key), ctrs).reshape(-1)[: len(data)]
    return (np.frombuffer(data, np.uint8) ^ ks).tobytes()


def aes128_cmac(key: bytes, msg: bytes) -> bytes:
    """AES-CMAC (NIST SP 800-38B), full 16-byte tag."""
    rks = _aes_expand_key(key)

    def dbl(b: bytes) -> bytes:
        i = int.from_bytes(b, "big") << 1
        if i & (1 << 128):
            i = (i & ((1 << 128) - 1)) ^ 0x87
        return i.to_bytes(16, "big")

    l = _aes_encrypt_block(rks, b"\x00" * 16)
    k1 = dbl(l)
    k2 = dbl(k1)
    n = max(1, (len(msg) + 15) // 16)
    last = msg[16 * (n - 1) :]
    if len(last) == 16:
        last = bytes(a ^ b for a, b in zip(last, k1))
    else:
        last = last + b"\x80" + b"\x00" * (15 - len(last))
        last = bytes(a ^ b for a, b in zip(last, k2))
    x = b"\x00" * 16
    for i in range(n - 1):
        x = _aes_encrypt_block(rks, bytes(a ^ b for a, b in zip(x, msg[16 * i : 16 * i + 16])))
    return _aes_encrypt_block(rks, bytes(a ^ b for a, b in zip(x, last)))


# ---------------------------------------------------------------------------
# SNOW 3G (UEA2/UIA2 spec) — 128-EEA1 / 128-EIA1
# ---------------------------------------------------------------------------

# SQ: the Dickson-polynomial S-box from the SNOW 3G spec §3.3.2
_SQ = bytes(
    [
        0x25, 0x24, 0x73, 0x67, 0xD7, 0xAE, 0x5C, 0x30, 0xA4, 0xEE, 0x6E, 0xCB, 0x7D, 0xB5, 0x82, 0xDB,
        0xE4, 0x8E, 0x48, 0x49, 0x4F, 0x5D, 0x6A, 0x78, 0x70, 0x88, 0xE8, 0x5F, 0x5E, 0x84, 0x65, 0xE2,
        0xD8, 0xE9, 0xCC, 0xED, 0x40, 0x2F, 0x11, 0x28, 0x57, 0xD2, 0xAC, 0xE3, 0x4A, 0x15, 0x1B, 0xB9,
        0xB2, 0x80, 0x85, 0xA6, 0x2E, 0x02, 0x47, 0x29, 0x07, 0x4B, 0x0E, 0xC1, 0x51, 0xAA, 0x89, 0xD4,
        0xCA, 0x01, 0x46, 0xB3, 0xEF, 0xDD, 0x44, 0x7B, 0xC2, 0x7F, 0xBE, 0xC3, 0x9F, 0x20, 0x4C, 0x64,
        0x83, 0xA2, 0x68, 0x42, 0x13, 0xB4, 0x41, 0xCD, 0xBA, 0xC6, 0xBB, 0x6D, 0x4D, 0x71, 0x21, 0xF4,
        0x8D, 0xB0, 0xE5, 0x93, 0xFE, 0x8F, 0xE6, 0xCF, 0x43, 0x45, 0x31, 0x22, 0x37, 0x36, 0x96, 0xFA,
        0xBC, 0x0F, 0x08, 0x52, 0x1D, 0x55, 0x1A, 0xC5, 0x4E, 0x23, 0x69, 0x7A, 0x92, 0xFF, 0x5B, 0x5A,
        0xEB, 0x9A, 0x1C, 0xA9, 0xD1, 0x7E, 0x0D, 0xFC, 0x50, 0x8A, 0xB6, 0x62, 0xF5, 0x0A, 0xF8, 0xDC,
        0x03, 0x3C, 0x0C, 0x39, 0xF1, 0xB8, 0xF3, 0x3D, 0xF2, 0xD5, 0x97, 0x66, 0x81, 0x32, 0xA0, 0x00,
        0x06, 0xCE, 0xF6, 0xEA, 0xB7, 0x17, 0xF7, 0x8C, 0x79, 0xD6, 0xA7, 0xBF, 0x8B, 0x3F, 0x1F, 0x53,
        0x63, 0x75, 0x35, 0x2C, 0x60, 0xFD, 0x27, 0xD3, 0x94, 0xA5, 0x7C, 0xA1, 0x05, 0x58, 0x2D, 0xBD,
        0xD9, 0xC7, 0xAF, 0x6B, 0x54, 0x0B, 0xE0, 0x38, 0x04, 0xC8, 0x9D, 0xE7, 0x14, 0xB1, 0x87, 0x9C,
        0xDF, 0x6F, 0xF9, 0xDA, 0x2A, 0xC4, 0x59, 0x16, 0x74, 0x91, 0xAB, 0x26, 0x61, 0x76, 0x34, 0x2B,
        0xAD, 0x99, 0xFB, 0x72, 0xEC, 0x33, 0x12, 0xDE, 0x98, 0x3B, 0xC0, 0x9B, 0x3E, 0x18, 0x10, 0x3A,
        0x56, 0xE1, 0x77, 0xC9, 0x1E, 0x9E, 0x95, 0xA3, 0x90, 0x19, 0xA8, 0x6C, 0x09, 0xD0, 0xF0, 0x86,
    ]
)

_M32 = 0xFFFFFFFF


def _mulx(v: int, c: int) -> int:
    return ((v << 1) ^ c) & 0xFF if v & 0x80 else (v << 1) & 0xFF


def _mulx_pow(v: int, i: int, c: int) -> int:
    for _ in range(i):
        v = _mulx(v, c)
    return v


def _mul_alpha(c: int) -> int:
    return (
        (_mulx_pow(c, 23, 0xA9) << 24)
        | (_mulx_pow(c, 245, 0xA9) << 16)
        | (_mulx_pow(c, 48, 0xA9) << 8)
        | _mulx_pow(c, 239, 0xA9)
    )


def _div_alpha(c: int) -> int:
    return (
        (_mulx_pow(c, 16, 0xA9) << 24)
        | (_mulx_pow(c, 39, 0xA9) << 16)
        | (_mulx_pow(c, 6, 0xA9) << 8)
        | _mulx_pow(c, 64, 0xA9)
    )


_MUL_ALPHA = [_mul_alpha(c) for c in range(256)]
_DIV_ALPHA = [_div_alpha(c) for c in range(256)]


def _s3g_sbox_word(w: int, box: bytes, c: int) -> int:
    """AES-MixColumns-style diffusion over per-byte S-box outputs
    (SNOW 3G spec S1 with SR/0x1b, S2 with SQ/0x69)."""
    t = [box[(w >> 24) & 0xFF], box[(w >> 16) & 0xFF], box[(w >> 8) & 0xFF], box[w & 0xFF]]

    def m2(b):
        return _mulx(b, c)

    def m3(b):
        return _mulx(b, c) ^ b

    # circulant matrix rows (2,1,1,3), (3,2,1,1), (1,3,2,1), (1,1,3,2)
    r0 = m2(t[0]) ^ t[1] ^ t[2] ^ m3(t[3])
    r1 = m3(t[0]) ^ m2(t[1]) ^ t[2] ^ t[3]
    r2 = t[0] ^ m3(t[1]) ^ m2(t[2]) ^ t[3]
    r3 = t[0] ^ t[1] ^ m3(t[2]) ^ m2(t[3])
    return (r0 << 24) | (r1 << 16) | (r2 << 8) | r3


class _Snow3G:
    def __init__(self, k: list[int], iv: list[int]):
        K = 0xFFFFFFFF
        k0, k1, k2, k3 = k  # k3 = MSBs of the 128-bit key
        # UEA2/UIA2 spec §4.1 layout: IV0→s15, IV1→s12, IV2→s10, IV3→s9
        s = [
            k0 ^ K, k1 ^ K, k2 ^ K, k3 ^ K,
            k0, k1, k2, k3,
            k0 ^ K, k1 ^ K ^ iv[3], k2 ^ K ^ iv[2], k3 ^ K,
            k0 ^ iv[1], k1, k2, k3 ^ iv[0],
        ]
        self.s = s
        self.r1 = self.r2 = self.r3 = 0
        for _ in range(32):
            f = self._clock_fsm()
            self._clock_lfsr(f)

    def _clock_fsm(self) -> int:
        s = self.s
        f = ((s[15] + self.r1) & _M32) ^ self.r2
        r = (self.r2 + (self.r3 ^ s[5])) & _M32
        self.r3 = _s3g_sbox_word(self.r2, _SQ, 0x69)
        self.r2 = _s3g_sbox_word(self.r1, AES_SBOX, 0x1B)
        self.r1 = r
        return f

    def _clock_lfsr(self, f: int = 0):
        s = self.s
        v = (
            ((s[0] << 8) & _M32)
            ^ _MUL_ALPHA[(s[0] >> 24) & 0xFF]
            ^ s[2]
            ^ (s[11] >> 8)
            ^ _DIV_ALPHA[s[11] & 0xFF]
            ^ f
        )
        self.s = s[1:] + [v]

    def keystream(self, n: int) -> list[int]:
        self._clock_fsm()
        self._clock_lfsr()
        out = []
        for _ in range(n):
            f = self._clock_fsm()
            out.append(f ^ self.s[0])
            self._clock_lfsr()
        return out


def _key_words(key: bytes) -> list[int]:
    # k3 = key[0:4] (most significant)
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(4)]
    return [w[3], w[2], w[1], w[0]]  # [k0, k1, k2, k3]


def eea1(key: bytes, count: int, bearer: int, direction: int, data: bytes, len_bits: int) -> bytes:
    """128-EEA1 encrypt/decrypt (SNOW 3G f8)."""
    iv2 = ((bearer & 0x1F) << 27) | ((direction & 1) << 26)
    iv = [iv2, count & _M32, iv2, count & _M32]  # [IV0, IV1, IV2, IV3] per f8
    c = _Snow3G(_key_words(key), iv)
    n_words = (len_bits + 31) // 32
    ks = c.keystream(n_words)
    ksb = b"".join(w.to_bytes(4, "big") for w in ks)
    n_bytes = (len_bits + 7) // 8
    out = bytearray(a ^ b for a, b in zip(data[:n_bytes], ksb))
    if len_bits % 8:
        out[-1] &= 0xFF << (8 - len_bits % 8) & 0xFF
    return bytes(out)


def _gf64_mul(a: int, b: int) -> int:
    """Carryless multiply mod x^64 + x^4 + x^3 + x + 1 (0x1b)."""
    r = 0
    for i in range(63, -1, -1):
        r = ((r << 1) ^ 0x1B) & ((1 << 64) - 1) if r & (1 << 63) else (r << 1)
        if (b >> i) & 1:
            r ^= a
    return r


def eia1(key: bytes, count: int, bearer: int, direction: int, msg: bytes, len_bits: int | None = None) -> bytes:
    """128-EIA1 MAC (SNOW 3G f9), 4 bytes."""
    if len_bits is None:
        len_bits = 8 * len(msg)
    fresh = (bearer & 0x1F) << 27
    iv = [
        fresh ^ ((direction & 1) << 15),  # IV0
        (count ^ ((direction & 1) << 31)) & _M32,  # IV1
        fresh,  # IV2
        count & _M32,  # IV3
    ]
    z = _Snow3G(_key_words(key), iv).keystream(5)
    p = (z[0] << 32) | z[1]
    q = (z[2] << 32) | z[3]
    d = (len_bits + 63) // 64 + 1
    padded = msg + b"\x00" * (8 * (d - 1) - len(msg))
    ev = 0
    for i in range(d - 1):
        m = int.from_bytes(padded[8 * i : 8 * i + 8], "big")
        ev = _gf64_mul(ev ^ m, p)
    ev = _gf64_mul(ev ^ len_bits, q)
    mac = ((ev >> 32) ^ z[4]) & _M32
    return mac.to_bytes(4, "big")


# ---------------------------------------------------------------------------
# 128-EEA2 / 128-EIA2 (AES)
# ---------------------------------------------------------------------------


def eea2(key: bytes, count: int, bearer: int, direction: int, data: bytes, len_bits: int) -> bytes:
    ctr0 = count.to_bytes(4, "big") + bytes([((bearer & 0x1F) << 3) | ((direction & 1) << 2)]) + b"\x00" * 11
    n_bytes = (len_bits + 7) // 8
    out = bytearray(aes128_ctr(key, ctr0, data[:n_bytes]))
    if len_bits % 8:
        out[-1] &= 0xFF << (8 - len_bits % 8) & 0xFF
    return bytes(out)


def eia2(key: bytes, count: int, bearer: int, direction: int, msg: bytes, len_bits: int | None = None) -> bytes:
    """128-EIA2 (AES-CMAC over the exact bit string COUNT||BEARER||DIR||0^26||M)."""
    if len_bits is None:
        len_bits = 8 * len(msg)
    hdr = count.to_bytes(4, "big") + bytes([((bearer & 0x1F) << 3) | ((direction & 1) << 2)]) + b"\x00" * 3
    if len_bits % 8 == 0:
        return aes128_cmac(key, hdr + msg[: len_bits // 8])[:4]
    # bit-exact CMAC for non-byte-aligned message lengths
    total_bits = 64 + len_bits
    m_int = (int.from_bytes(hdr, "big") << len_bits) | (
        int.from_bytes(msg[: (len_bits + 7) // 8], "big") >> ((8 - len_bits % 8) % 8)
    )
    rks = _aes_expand_key(key)

    def dbl(b: bytes) -> bytes:
        i = int.from_bytes(b, "big") << 1
        if i & (1 << 128):
            i = (i & ((1 << 128) - 1)) ^ 0x87
        return i.to_bytes(16, "big")

    k1 = dbl(_aes_encrypt_block(rks, b"\x00" * 16))
    k2 = dbl(k1)
    n = max(1, (total_bits + 127) // 128)
    last_bits = total_bits - 128 * (n - 1)
    x = b"\x00" * 16
    for i in range(n - 1):
        blk = ((m_int >> (total_bits - 128 * (i + 1))) & ((1 << 128) - 1)).to_bytes(16, "big")
        x = _aes_encrypt_block(rks, _xor(x, blk))
    last = (m_int & ((1 << last_bits) - 1)) if last_bits < 128 else (m_int & ((1 << 128) - 1))
    if last_bits == 128:
        lb = _xor(last.to_bytes(16, "big"), k1)
    else:
        lb = _xor((((last << 1) | 1) << (127 - last_bits)).to_bytes(16, "big"), k2)
    return _aes_encrypt_block(rks, _xor(x, lb))[:4]


# ---------------------------------------------------------------------------
# ZUC — 128-EEA3 / 128-EIA3
# ---------------------------------------------------------------------------

_ZUC_S0 = bytes(
    [
        0x3E, 0x72, 0x5B, 0x47, 0xCA, 0xE0, 0x00, 0x33, 0x04, 0xD1, 0x54, 0x98, 0x09, 0xB9, 0x6D, 0xCB,
        0x7B, 0x1B, 0xF9, 0x32, 0xAF, 0x9D, 0x6A, 0xA5, 0xB8, 0x2D, 0xFC, 0x1D, 0x08, 0x53, 0x03, 0x90,
        0x4D, 0x4E, 0x84, 0x99, 0xE4, 0xCE, 0xD9, 0x91, 0xDD, 0xB6, 0x85, 0x48, 0x8B, 0x29, 0x6E, 0xAC,
        0xCD, 0xC1, 0xF8, 0x1E, 0x73, 0x43, 0x69, 0xC6, 0xB5, 0xBD, 0xFD, 0x39, 0x63, 0x20, 0xD4, 0x38,
        0x76, 0x7D, 0xB2, 0xA7, 0xCF, 0xED, 0x57, 0xC5, 0xF3, 0x2C, 0xBB, 0x14, 0x21, 0x06, 0x55, 0x9B,
        0xE3, 0xEF, 0x5E, 0x31, 0x4F, 0x7F, 0x5A, 0xA4, 0x0D, 0x82, 0x51, 0x49, 0x5F, 0xBA, 0x58, 0x1C,
        0x4A, 0x16, 0xD5, 0x17, 0xA8, 0x92, 0x24, 0x1F, 0x8C, 0xFF, 0xD8, 0xAE, 0x2E, 0x01, 0xD3, 0xAD,
        0x3B, 0x4B, 0xDA, 0x46, 0xEB, 0xC9, 0xDE, 0x9A, 0x8F, 0x87, 0xD7, 0x3A, 0x80, 0x6F, 0x2F, 0xC8,
        0xB1, 0xB4, 0x37, 0xF7, 0x0A, 0x22, 0x13, 0x28, 0x7C, 0xCC, 0x3C, 0x89, 0xC7, 0xC3, 0x96, 0x56,
        0x07, 0xBF, 0x7E, 0xF0, 0x0B, 0x2B, 0x97, 0x52, 0x35, 0x41, 0x79, 0x61, 0xA6, 0x4C, 0x10, 0xFE,
        0xBC, 0x26, 0x95, 0x88, 0x8A, 0xB0, 0xA3, 0xFB, 0xC0, 0x18, 0x94, 0xF2, 0xE1, 0xE5, 0xE9, 0x5D,
        0xD0, 0xDC, 0x11, 0x66, 0x64, 0x5C, 0xEC, 0x59, 0x42, 0x75, 0x12, 0xF5, 0x74, 0x9C, 0xAA, 0x23,
        0x0E, 0x86, 0xAB, 0xBE, 0x2A, 0x02, 0xE7, 0x67, 0xE6, 0x44, 0xA2, 0x6C, 0xC2, 0x93, 0x9F, 0xF1,
        0xF6, 0xFA, 0x36, 0xD2, 0x50, 0x68, 0x9E, 0x62, 0x71, 0x15, 0x3D, 0xD6, 0x40, 0xC4, 0xE2, 0x0F,
        0x8E, 0x83, 0x77, 0x6B, 0x25, 0x05, 0x3F, 0x0C, 0x30, 0xEA, 0x70, 0xB7, 0xA1, 0xE8, 0xA9, 0x65,
        0x8D, 0x27, 0x1A, 0xDB, 0x81, 0xB3, 0xA0, 0xF4, 0x45, 0x7A, 0x19, 0xDF, 0xEE, 0x78, 0x34, 0x60,
    ]
)

_ZUC_S1 = bytes(
    [
        0x55, 0xC2, 0x63, 0x71, 0x3B, 0xC8, 0x47, 0x86, 0x9F, 0x3C, 0xDA, 0x5B, 0x29, 0xAA, 0xFD, 0x77,
        0x8C, 0xC5, 0x94, 0x0C, 0xA6, 0x1A, 0x13, 0x00, 0xE3, 0xA8, 0x16, 0x72, 0x40, 0xF9, 0xF8, 0x42,
        0x44, 0x26, 0x68, 0x96, 0x81, 0xD9, 0x45, 0x3E, 0x10, 0x76, 0xC6, 0xA7, 0x8B, 0x39, 0x43, 0xE1,
        0x3A, 0xB5, 0x56, 0x2A, 0xC0, 0x6D, 0xB3, 0x05, 0x22, 0x66, 0xBF, 0xDC, 0x0B, 0xFA, 0x62, 0x48,
        0xDD, 0x20, 0x11, 0x06, 0x36, 0xC9, 0xC1, 0xCF, 0xF6, 0x27, 0x52, 0xBB, 0x69, 0xF5, 0xD4, 0x87,
        0x7F, 0x84, 0x4C, 0xD2, 0x9C, 0x57, 0xA4, 0xBC, 0x4F, 0x9A, 0xDF, 0xFE, 0xD6, 0x8D, 0x7A, 0xEB,
        0x2B, 0x53, 0xD8, 0x5C, 0xA1, 0x14, 0x17, 0xFB, 0x23, 0xD5, 0x7D, 0x30, 0x67, 0x73, 0x08, 0x09,
        0xEE, 0xB7, 0x70, 0x3F, 0x61, 0xB2, 0x19, 0x8E, 0x4E, 0xE5, 0x4B, 0x93, 0x8F, 0x5D, 0xDB, 0xA9,
        0xAD, 0xF1, 0xAE, 0x2E, 0xCB, 0x0D, 0xFC, 0xF4, 0x2D, 0x46, 0x6E, 0x1D, 0x97, 0xE8, 0xD1, 0xE9,
        0x4D, 0x37, 0xA5, 0x75, 0x5E, 0x83, 0x9E, 0xAB, 0x82, 0x9D, 0xB9, 0x1C, 0xE0, 0xCD, 0x49, 0x89,
        0x01, 0xB6, 0xBD, 0x58, 0x24, 0xA2, 0x5F, 0x38, 0x78, 0x99, 0x15, 0x90, 0x50, 0xB8, 0x95, 0xE4,
        0xD0, 0x91, 0xC7, 0xCE, 0xED, 0x0F, 0xB4, 0x6F, 0xA0, 0xCC, 0xF0, 0x02, 0x4A, 0x79, 0xC3, 0xDE,
        0xA3, 0xEF, 0xEA, 0x51, 0xE6, 0x6B, 0x18, 0xEC, 0x1B, 0x2C, 0x80, 0xF7, 0x74, 0xE7, 0xFF, 0x21,
        0x5A, 0x6A, 0x54, 0x1E, 0x41, 0x31, 0x92, 0x35, 0xC4, 0x33, 0x07, 0x0A, 0xBA, 0x7E, 0x0E, 0x34,
        0x88, 0xB1, 0x98, 0x7C, 0xF3, 0x3D, 0x60, 0x6C, 0x7B, 0xCA, 0xD3, 0x1F, 0x32, 0x65, 0x04, 0x28,
        0x64, 0xBE, 0x85, 0x9B, 0x2F, 0x59, 0x8A, 0xD7, 0xB0, 0x25, 0xAC, 0xAF, 0x12, 0x03, 0xE2, 0xF2,
    ]
)

_ZUC_D = [
    0x44D7, 0x26BC, 0x626B, 0x135E, 0x5789, 0x35E2, 0x7135, 0x09AF,
    0x4D78, 0x2F13, 0x6BC4, 0x1AF1, 0x5E26, 0x3C4D, 0x789A, 0x47AC,
]

_M31 = 0x7FFFFFFF


def _rotl32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _M32


class _Zuc:
    def __init__(self, key: bytes, iv: bytes):
        self.s = [((key[i] << 23) | (_ZUC_D[i] << 8) | iv[i]) for i in range(16)]
        self.r1 = self.r2 = 0
        for _ in range(32):
            w = self._f()
            self._lfsr(w >> 1)
        self._f()
        self._lfsr(0)

    def _bitreorg(self):
        s = self.s
        x0 = (((s[15] & 0x7FFF8000) << 1) | (s[14] & 0xFFFF)) & _M32
        x1 = (((s[11] & 0xFFFF) << 16) | (s[9] >> 15)) & _M32
        x2 = (((s[7] & 0xFFFF) << 16) | (s[5] >> 15)) & _M32
        x3 = (((s[2] & 0xFFFF) << 16) | (s[0] >> 15)) & _M32
        return x0, x1, x2, x3

    @staticmethod
    def _sbox(u: int) -> int:
        return (
            (_ZUC_S0[(u >> 24) & 0xFF] << 24)
            | (_ZUC_S1[(u >> 16) & 0xFF] << 16)
            | (_ZUC_S0[(u >> 8) & 0xFF] << 8)
            | _ZUC_S1[u & 0xFF]
        )

    def _f(self) -> int:
        x0, x1, x2, _ = self._bitreorg()
        w = (((x0 ^ self.r1) + self.r2) & _M32)
        w1 = (self.r1 + x1) & _M32
        w2 = self.r2 ^ x2
        u = ((w1 << 16) & _M32) | (w2 >> 16)
        v = ((w2 << 16) & _M32) | (w1 >> 16)
        l1 = u ^ _rotl32(u, 2) ^ _rotl32(u, 10) ^ _rotl32(u, 18) ^ _rotl32(u, 24)
        l2 = v ^ _rotl32(v, 8) ^ _rotl32(v, 14) ^ _rotl32(v, 22) ^ _rotl32(v, 30)
        self.r1 = self._sbox(l1)
        self.r2 = self._sbox(l2)
        return w

    def _lfsr(self, u: int):
        def addm(a, b):
            c = a + b
            return (c & _M31) + (c >> 31)

        def mulpow(x, k):
            return ((x << k) | (x >> (31 - k))) & _M31

        s = self.s
        f = s[0]
        f = addm(f, mulpow(s[0], 8))
        f = addm(f, mulpow(s[4], 20))
        f = addm(f, mulpow(s[10], 21))
        f = addm(f, mulpow(s[13], 17))
        f = addm(f, mulpow(s[15], 15))
        f = addm(f, u)
        if f == 0:
            f = _M31
        self.s = s[1:] + [f]

    def keystream(self, n: int) -> list[int]:
        out = []
        for _ in range(n):
            x0, x1, x2, x3 = self._bitreorg()
            w = self._f()
            out.append(w ^ x3)
            self._lfsr(0)
        return out


def eea3(key: bytes, count: int, bearer: int, direction: int, data: bytes, len_bits: int) -> bytes:
    """128-EEA3 encrypt/decrypt (ZUC)."""
    cb = count.to_bytes(4, "big")
    iv5 = ((bearer & 0x1F) << 3) | ((direction & 1) << 2)
    iv = bytes([cb[0], cb[1], cb[2], cb[3], iv5, 0, 0, 0, cb[0], cb[1], cb[2], cb[3], iv5, 0, 0, 0])
    n_words = (len_bits + 31) // 32
    ks = _Zuc(key, iv).keystream(n_words)
    ksb = b"".join(w.to_bytes(4, "big") for w in ks)
    n_bytes = (len_bits + 7) // 8
    out = bytearray(a ^ b for a, b in zip(data[:n_bytes], ksb))
    if len_bits % 8:
        out[-1] &= 0xFF << (8 - len_bits % 8) & 0xFF
    return bytes(out)


def eia3(key: bytes, count: int, bearer: int, direction: int, msg: bytes, len_bits: int | None = None) -> bytes:
    """128-EIA3 MAC (ZUC), 4 bytes."""
    if len_bits is None:
        len_bits = 8 * len(msg)
    cb = count.to_bytes(4, "big")
    d = direction & 1
    iv = bytes(
        [
            cb[0], cb[1], cb[2], cb[3],
            (bearer & 0x1F) << 3, 0, 0, 0,
            cb[0] ^ (d << 7), cb[1], cb[2], cb[3],
            (bearer & 0x1F) << 3, 0, (d << 7), 0,
        ]
    )
    n_words = (len_bits + 63) // 32 + 1
    z = _Zuc(key, iv).keystream(n_words)
    zbits = 0
    for w in z:
        zbits = (zbits << 32) | w
    total = 32 * n_words

    def get_word(i):
        return (zbits >> (total - 32 - i)) & _M32

    t = 0
    for i in range(len_bits):
        if (msg[i // 8] >> (7 - i % 8)) & 1:
            t ^= get_word(i)
    t ^= get_word(len_bits)
    mac = t ^ z[-1]
    return mac.to_bytes(4, "big")


# ---------------------------------------------------------------------------
# Milenage (TS 35.206)
# ---------------------------------------------------------------------------


def _rot(block: bytes, bits: int) -> bytes:
    i = int.from_bytes(block, "big")
    return (((i << bits) | (i >> (128 - bits))) & ((1 << 128) - 1)).to_bytes(16, "big")


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def compute_opc(k: bytes, op: bytes) -> bytes:
    return _xor(aes128_encrypt(k, op), op)


def milenage_f1(k: bytes, opc: bytes, rand: bytes, sqn: bytes, amf: bytes, sresync: bool = False):
    """Returns MAC-A (or MAC-S with sresync=True), 8 bytes."""
    temp = aes128_encrypt(k, _xor(rand, opc))
    in1 = sqn + amf + sqn + amf
    out1 = _xor(aes128_encrypt(k, _xor(temp, _rot(_xor(in1, opc), 64))), opc)
    return out1[8:16] if sresync else out1[0:8]


def milenage_f2345(k: bytes, opc: bytes, rand: bytes):
    """Returns (RES(8), CK(16), IK(16), AK(6))."""
    temp = aes128_encrypt(k, _xor(rand, opc))
    tx = _xor(temp, opc)

    def out(rbits, cval):
        inp = _rot(tx, (128 - rbits) % 128) if rbits else tx
        c = (cval).to_bytes(16, "big")
        return _xor(aes128_encrypt(k, _xor(inp, c)), opc)

    # TS 35.206: r2=0,c2=1; r3=32,c3=2; r4=64,c4=4; r5=96,c5=8
    # rot in the spec is left-rotate by r bits of (TEMP^OPc)
    def out_l(r, cval):
        inp = _rot(tx, r) if r else tx
        return _xor(aes128_encrypt(k, _xor(inp, cval.to_bytes(16, "big"))), opc)

    out2 = out_l(0, 1)
    out3 = out_l(32, 2)
    out4 = out_l(64, 4)
    out5 = out_l(96, 8)
    res = out2[8:16]
    ak = out2[0:6]
    ck = out3
    ik = out4
    ak_resync = out5[0:6]
    return res, ck, ik, ak, ak_resync


# ---------------------------------------------------------------------------
# TS 33.401 key derivation (Annex A), HMAC-SHA256
# ---------------------------------------------------------------------------


def _kdf(key: bytes, fc: int, *params: bytes) -> bytes:
    s = bytes([fc])
    for p in params:
        s += p + len(p).to_bytes(2, "big")
    return _hmac.new(key, s, hashlib.sha256).digest()


def generate_k_asme(ck: bytes, ik: bytes, plmn: bytes, sqn_xor_ak: bytes) -> bytes:
    """A.2: K_ASME from CK||IK, serving network id (3 bytes), SQN^AK (6)."""
    return _kdf(ck + ik, 0x10, plmn, sqn_xor_ak)


def generate_k_enb(k_asme: bytes, nas_count: int) -> bytes:
    """A.3."""
    return _kdf(k_asme, 0x11, nas_count.to_bytes(4, "big"))


def generate_nas_keys(k_asme: bytes, enc_alg: int, int_alg: int) -> tuple[bytes, bytes]:
    """A.7: (K_NASenc, K_NASint), truncated to 128 bits each."""
    k_enc = _kdf(k_asme, 0x15, bytes([0x01]), bytes([enc_alg]))[16:]
    k_int = _kdf(k_asme, 0x15, bytes([0x02]), bytes([int_alg]))[16:]
    return k_enc, k_int


def generate_as_keys(k_enb: bytes, enc_alg: int, int_alg: int):
    """A.7: (K_RRCenc, K_RRCint, K_UPenc), 128 bits each."""
    rrc_enc = _kdf(k_enb, 0x15, bytes([0x03]), bytes([enc_alg]))[16:]
    rrc_int = _kdf(k_enb, 0x15, bytes([0x04]), bytes([int_alg]))[16:]
    up_enc = _kdf(k_enb, 0x15, bytes([0x05]), bytes([enc_alg]))[16:]
    return rrc_enc, rrc_int, up_enc


# dispatch tables: EEA0/EIA0 are null algorithms
CIPHER_ALGS = {
    0: lambda key, count, bearer, direction, data, len_bits: bytes(data[: (len_bits + 7) // 8]),
    1: eea1,
    2: eea2,
    3: eea3,
}
INTEGRITY_ALGS = {1: eia1, 2: eia2, 3: eia3}
