"""Keccak-256 + ABI selector derivation (driver-side utility).

The reference derives each table's selector from its ABI item:
``generate_parse_sql.py:16-25`` (``Web3.keccak(text="Name(type,...)")``,
full hash for events, first 4 bytes for functions) and
``parse_table_definition_logic.py:116,190`` (``event_abi_to_log_topic``/
``function_abi_to_4byte_selector`` from eth_utils). This module provides
the same derivation without web3: a compact pure-Python Keccak-f[1600]
sponge (the original Keccak padding 0x01, NOT the FIPS-202 SHA3 0x06 —
hashlib.sha3_256 gives DIFFERENT digests) plus the canonical-signature
builder, including tuple expansion ``(t1,t2,...)`` per the public
Solidity ABI spec.

Runs once per spec at plan time — never in the row path — so pure
Python is the right cost/complexity tradeoff here.
"""

from __future__ import annotations

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROTC = [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
         27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44]
_PILN = [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
         15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1]
_MASK = (1 << 64) - 1


def _rol(x: int, s: int) -> int:
    return ((x << s) | (x >> (64 - s))) & _MASK


def _keccak_f(st: list[int]) -> None:
    for rnd in range(24):
        # theta
        bc = [st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20] for i in range(5)]
        for i in range(5):
            t = bc[(i + 4) % 5] ^ _rol(bc[(i + 1) % 5], 1)
            for j in range(0, 25, 5):
                st[j + i] ^= t
        # rho + pi
        t = st[1]
        for i in range(24):
            j = _PILN[i]
            t, st[j] = st[j], _rol(t, _ROTC[i])
        # chi
        for j in range(0, 25, 5):
            row = st[j:j + 5]
            for i in range(5):
                st[j + i] = row[i] ^ ((~row[(i + 1) % 5]) & row[(i + 2) % 5] & _MASK)
        # iota
        st[0] ^= _RC[rnd]


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest (Ethereum's hash; original 0x01 padding)."""
    rate = 136  # bytes: (1600 - 2*256) / 8
    st = [0] * 25
    buf = bytearray(data)
    pad = rate - (len(buf) % rate)
    if pad == 1:
        buf += b"\x81"
    else:
        buf += b"\x01" + b"\x00" * (pad - 2) + b"\x80"
    for off in range(0, len(buf), rate):
        block = buf[off:off + rate]
        for i in range(rate // 8):
            st[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        _keccak_f(st)
    out = b"".join(st[i].to_bytes(8, "little") for i in range(4))
    return out[:32]


def canonical_signature(abi_item: dict) -> str:
    """``Name(type1,type2,...)`` with tuples expanded to
    ``(comp1,comp2,...)`` and elementary-type aliases normalized
    (``uint``→``uint256``, ``int``→``int256``, including array
    suffixes) — the public ABI canonical form the reference hashes
    (generate_parse_sql.py:21-23; eth_utils event_abi_to_log_topic
    applies the same normalization, so an ABI item written with
    shorthand types must derive the SAME selector here)."""
    import re as _re

    _alias = _re.compile(r"^(uint|int)((\[\d*\])*)$")

    def canon(inp: dict) -> str:
        typ = inp["type"]
        if typ.startswith("tuple"):
            inner = ",".join(canon(c) for c in inp.get("components", []))
            return f"({inner}){typ[len('tuple'):]}"  # keeps [] / [k] suffixes
        m = _alias.match(typ)
        if m:
            return f"{m.group(1)}256{m.group(2)}"
        return typ

    args = ",".join(canon(i) for i in abi_item.get("inputs", []))
    return f"{abi_item['name']}({args})"


def event_selector(abi_item: dict) -> str:
    """topic0 for an event ABI item: 0x + full keccak256 of the
    canonical signature (ref event_abi_to_log_topic)."""
    return "0x" + keccak256(canonical_signature(abi_item).encode()).hex()


def function_selector(abi_item: dict) -> str:
    """4-byte call selector: 0x + first 4 bytes (ref
    function_abi_to_4byte_selector; generate_parse_sql.py:23 hex[:10])."""
    return "0x" + keccak256(canonical_signature(abi_item).encode()).hex()[:8]
