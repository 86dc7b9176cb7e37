"""Property-based round-trip for the ABI decode kernel: an independent
reference ENCODER (written straight from the public Solidity ABI spec)
feeds random typed values through ``decode_batch`` — decode(encode(v))
must equal v for every type the grammar supports, and corrupted
payloads must fail rows, never crash or hang."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ethereum_etl_airflow_spark.plans.abi import (
    AbiType,
    decode_batch,
    is_dynamic,
    parse_abi_type,
)

# ---------------------------------------------------------------- encoder


def _pad_right(h: str) -> str:
    rem = len(h) % 64
    return h if rem == 0 else h + "0" * (64 - rem)


def enc_static(t: AbiType, v) -> str:
    if t.kind == "uint":
        return format(v, "064x")
    if t.kind == "int":
        return format(v & ((1 << 256) - 1), "064x")
    if t.kind == "address":
        return v[2:].rjust(64, "0")
    if t.kind == "bool":
        return format(1 if v else 0, "064x")
    if t.kind == "bytes_fixed":
        return v[2:].ljust(64, "0")
    if t.kind == "fixed_array":
        return "".join(enc_static(t.elem, e) for e in v)
    if t.kind == "tuple":
        return enc_tuple(t.components, v)
    raise AssertionError(t.kind)


def enc_dynamic_tail(t: AbiType, v) -> str:
    if t.kind in ("bytes", "string"):
        raw = v.encode() if t.kind == "string" else bytes.fromhex(v[2:])
        return format(len(raw), "064x") + _pad_right(raw.hex())
    if t.kind == "array":
        if is_dynamic(t.elem):
            # dynamic elements: offsets + tails, exactly a tuple of N
            # same-typed components after the length word
            comps = tuple((f"_{i}", t.elem) for i in range(len(v)))
            return format(len(v), "064x") + enc_tuple(comps, list(v))
        return format(len(v), "064x") + "".join(enc_static(t.elem, e) for e in v)
    if t.kind == "fixed_array":  # dynamic elements (array itself dynamic)
        comps = tuple((f"_{i}", t.elem) for i in range(t.size))
        return enc_tuple(comps, list(v))
    if t.kind == "tuple":
        return enc_tuple(t.components, v)
    raise AssertionError(t.kind)


def enc_tuple(comps, values) -> str:
    head_words = []
    tails = []
    # first pass: static head size in bytes
    static_len = 0
    for (_n, ct) in comps:
        static_len += (1 if is_dynamic(ct) else _head_words(ct)) * 32
    offset = static_len
    for (name, ct), v in zip(comps, [values[n] for n, _ in comps] if isinstance(values, dict) else values):
        if is_dynamic(ct):
            head_words.append(format(offset, "064x"))
            tail = enc_dynamic_tail(ct, v)
            tails.append(tail)
            offset += len(tail) // 2
        else:
            head_words.append(enc_static(ct, v))
    return "".join(head_words) + "".join(tails)


def _head_words(t: AbiType) -> int:
    from ethereum_etl_airflow_spark.plans.abi import head_words

    return head_words(t)


# ------------------------------------------------------------- strategies

HEX = "0123456789abcdef"


def _addr():
    return st.text(HEX, min_size=40, max_size=40).map(lambda s: "0x" + s)


def _typed_value():
    """(abi type string, value, expected decoded form)"""
    scalars = [
        ("uint32", st.integers(0, 2**32 - 1), lambda v: v),
        ("uint56", st.integers(0, 2**56 - 1), lambda v: v),
        ("uint64", st.integers(0, 2**64 - 1), lambda v: str(v)),
        ("uint256", st.integers(0, 2**256 - 1), lambda v: str(v)),
        ("int64", st.integers(-(2**63), 2**63 - 1), lambda v: v),
        ("int256", st.integers(-(2**255), 2**255 - 1), lambda v: str(v)),
        ("address", _addr(), lambda v: v),
        ("bool", st.booleans(), lambda v: v),
        ("bytes8", st.text(HEX, min_size=16, max_size=16).map(lambda s: "0x" + s), lambda v: v),
        ("bytes", st.binary(max_size=80).map(lambda b: "0x" + b.hex()), lambda v: v),
        (
            "string",
            st.text(st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=40),
            lambda v: v,
        ),
        (
            "uint32[]",
            st.lists(st.integers(0, 2**32 - 1), max_size=5),
            lambda v: list(v),
        ),
        (
            "uint16[3]",
            st.lists(st.integers(0, 2**16 - 1), min_size=3, max_size=3),
            lambda v: list(v),
        ),
        (
            "(uint32 a, bool b)",
            st.tuples(st.integers(0, 2**32 - 1), st.booleans()),
            lambda v: {"a": v[0], "b": v[1]},
        ),
        (
            "(address owner, uint16[] xs)",
            st.tuples(_addr(), st.lists(st.integers(0, 2**16 - 1), max_size=4)),
            lambda v: {"owner": v[0], "xs": list(v[1])},
        ),
        (
            "string[]",
            st.lists(
                st.text(st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=12),
                max_size=4,
            ),
            lambda v: list(v),
        ),
        (
            "bytes[]",
            st.lists(st.binary(max_size=40).map(lambda b: "0x" + b.hex()), max_size=3),
            lambda v: list(v),
        ),
        (
            "(uint32 n, string s)[]",
            st.lists(
                st.tuples(st.integers(0, 2**32 - 1), st.text(HEX, max_size=8)),
                max_size=3,
            ),
            lambda v: [{"n": n, "s": s} for n, s in v],
        ),
        (
            "string[2]",
            st.lists(st.text(HEX, max_size=10), min_size=2, max_size=2),
            lambda v: list(v),
        ),
    ]
    return st.sampled_from(scalars).flatmap(
        lambda s: s[1].map(lambda v: (s[0], v, s[2](v)))
    )


# ---------------------------------------------------------------- tests


@settings(max_examples=120, deadline=None)
@given(st.lists(_typed_value(), min_size=1, max_size=4))
def test_roundtrip_random_typed_tuples(fields):
    names = [f"f{i}" for i in range(len(fields))]
    comps = tuple((n, parse_abi_type(ts)) for n, (ts, _v, _e) in zip(names, fields))
    values = [v for (_ts, v, _e) in fields]
    data = enc_tuple(comps, values)
    decoded, fail = decode_batch(
        [data], [None], [(n, t, False) for n, t in comps]
    )
    assert not fail[0], f"decode failed for {fields}"
    for n, (_ts, _v, expect) in zip(names, fields):
        got = decoded[n][0]
        assert got == expect, f"{n}: {got!r} != {expect!r}"


@settings(max_examples=60, deadline=None)
@given(
    st.lists(_typed_value(), min_size=1, max_size=3),
    st.integers(0, 200),
)
def test_truncation_never_crashes(fields, cut):
    names = [f"f{i}" for i in range(len(fields))]
    comps = tuple((n, parse_abi_type(ts)) for n, (ts, _v, _e) in zip(names, fields))
    data = enc_tuple(comps, [v for (_ts, v, _e) in fields])
    truncated = data[: min(cut, len(data))]
    decoded, fail = decode_batch(
        [truncated], [None], [(n, t, False) for n, t in comps]
    )
    # either clean decode of a prefix that happened to suffice, or a
    # failed row with all-null outputs — never an exception or a hang
    if fail[0]:
        assert all(decoded[n][0] is None for n in names)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**256 - 1), _addr(), st.booleans())
def test_indexed_value_params_roundtrip(big, addr, flag):
    fields = [
        ("amount", parse_abi_type("uint256"), False),
        ("who", parse_abi_type("address"), True),
        ("ok", parse_abi_type("bool"), True),
    ]
    data = format(big, "064x")
    topics = [["0xsel", addr[2:].rjust(64, "0"), format(int(flag), "064x")]]
    decoded, fail = decode_batch([data], topics, fields)
    assert not fail[0]
    assert decoded["amount"][0] == str(big)
    assert decoded["who"][0] == addr
    assert decoded["ok"][0] is flag
