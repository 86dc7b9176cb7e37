"""Multi-folder corpus sweep: REAL dataset folders end-to-end
(VERDICT r4 missing #5).

Five real reference dataset folders — chosen to span the corpus'
contract_address forms and def types — are driven through
``load_dataset_folder -> toposort -> ParseDatasetExecutor.run ->
stitch`` against a synthetic feed whose payloads are ABI-encoded by a
generic encoder in this file, so every spec's decode is exercised with
value-level assertions (not just lifecycle):

* ``mellow``      — a runnable SQL view (literal UNION ALL) that a
                    JSON def consumes via ``SELECT vault_address FROM
                    ref('view_...')`` (view feeding a contract filter);
* ``aera``        — inline UNNEST address lists + simple ref() chains;
* ``decentraland``— UNNEST list;
* ``prisma``      — 6 trace (call) defs: the 4-byte-selector data path;
* ``sushiswap``   — ``SELECT col FROM ref('X')`` factory chains.

The encoder implements the standard ABI head/tail layout the decoder
in ``plans/abi.py`` consumes (offsets in bytes, length-prefixed
dynamics, indexed-composite params as their topic hash verbatim).
Reference flow mirrored: ``parse_dataset_folder_logic.py:21-136``.
"""

from __future__ import annotations

import os
import re

import pytest
import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.plans.abi import (
    AbiType,
    head_words,
    is_dynamic,
    parse_abi_type,
)
from ethereum_etl_airflow_spark.plans.compiler import _contract_literals
from ethereum_etl_airflow_spark.plans.defs import load_dataset_folder
from ethereum_etl_airflow_spark.plans.executor import ParseDatasetExecutor
from ethereum_etl_airflow_spark.plans.planner import toposort
from ethereum_etl_airflow_spark.plans.spec import REF_REGEX, SqlViewSpec

DEFS = "/root/reference/dags/resources/stages/parse/table_definitions"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEFS), reason="reference table_definitions not present"
)

FOLDERS = [
    "mellow",
    "aera",
    "decentraland",
    "prisma",
    "sushiswap",
    "gnosis",  # 11 defs, factory ref chain (SELECT instantiation FROM ref)
    "idex",  # 4 defs, bare literals
]

ROWS_PER_SPEC = 2

# ------------------------------------------------------------------ encoder


def _w(v: int) -> str:
    return format(v, "064x")


def _addr_hex(seed: int) -> str:
    return format((seed * 2654435761 + 1) % (1 << 160), "040x")


def _pad_right(h: str) -> str:
    return h.ljust(((len(h) + 63) // 64) * 64, "0") if h else ""


def _enc_static(t: AbiType, seed: int) -> str:
    if t.kind == "uint":
        return _w(seed % (1 << min(t.bits, 24)))
    if t.kind == "int":
        return _w(seed % (1 << min(t.bits - 1, 24)))
    if t.kind == "address":
        return "0" * 24 + _addr_hex(seed)
    if t.kind == "bool":
        return _w(seed % 2)
    if t.kind == "bytes_fixed":
        return (format(seed % 256, "02x") * t.bits).ljust(64, "0")
    if t.kind == "fixed_array":
        return "".join(_enc_static(t.elem, seed + 31 * i) for i in range(t.size))
    if t.kind == "tuple":
        return "".join(
            _enc_static(ct, seed + 13 * i) for i, (_n, ct) in enumerate(t.components)
        )
    raise AssertionError(f"static encode of {t.kind}")


def _enc_members(parts: list[tuple[AbiType, int]]) -> str:
    """Head+tail encoding of a component sequence (the tuple body)."""
    head_len = sum(1 if is_dynamic(t) else head_words(t) for t, _ in parts) * 32
    heads, tails = [], []
    off = head_len
    for t, s in parts:
        if is_dynamic(t):
            enc = _enc_dyn(t, s)
            heads.append(_w(off))
            tails.append(enc)
            off += len(enc) // 2
        else:
            heads.append(_enc_static(t, s))
    return "".join(heads) + "".join(tails)


def _enc_dyn(t: AbiType, seed: int) -> str:
    if t.kind == "string":
        b = f"s{seed % 997}".encode()
        return _w(len(b)) + _pad_right(b.hex())
    if t.kind == "bytes":
        b = bytes([seed % 256]) * (seed % 5)
        return _w(len(b)) + _pad_right(b.hex())
    if t.kind == "array":
        k = 1 + seed % 2
        return _w(k) + _enc_members([(t.elem, seed + 31 * i) for i in range(k)])
    if t.kind == "fixed_array":  # dynamic elements
        return _enc_members([(t.elem, seed + 31 * i) for i in range(t.size)])
    if t.kind == "tuple":
        return _enc_members(
            [(ct, seed + 13 * i) for i, (_n, ct) in enumerate(t.components)]
        )
    raise AssertionError(f"dynamic encode of {t.kind}")


def _expected(t: AbiType, seed: int):
    """Decoded value per the engine's typing (pre out_type coercion)."""
    if t.kind == "uint":
        v = seed % (1 << min(t.bits, 24))
        return v if t.bits <= 56 else str(v)
    if t.kind == "int":
        v = seed % (1 << min(t.bits - 1, 24))
        return v if t.bits <= 64 else str(v)
    if t.kind == "address":
        return "0x" + _addr_hex(seed)
    if t.kind == "bool":
        return bool(seed % 2)
    if t.kind == "bytes_fixed":
        return "0x" + format(seed % 256, "02x") * t.bits
    if t.kind == "string":
        return f"s{seed % 997}"
    if t.kind == "bytes":
        return "0x" + (bytes([seed % 256]) * (seed % 5)).hex()
    if t.kind == "array":
        k = 1 + seed % 2
        return [_expected(t.elem, seed + 31 * i) for i in range(k)]
    if t.kind == "fixed_array":
        return [_expected(t.elem, seed + 31 * i) for i in range(t.size)]
    if t.kind == "tuple":
        return {
            n: _expected(ct, seed + 13 * i) for i, (n, ct) in enumerate(t.components)
        }
    raise AssertionError(t.kind)


def _coerce_expected(v, t: AbiType, out_type: str | None):
    """Apply the compiler's declared-STRING output coercion (scalars and
    scalar arrays only — nested types keep engine typing)."""
    if (out_type or "").upper() != "STRING":
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, list) and not (
        t.elem and (t.elem.kind in ("tuple",) or t.elem.kind.endswith("array"))
    ):
        return [
            ("true" if x else "false") if isinstance(x, bool)
            else str(x) if isinstance(x, int) else x
            for x in v
        ]
    return v


def _seed(eid: int, field_idx: int) -> int:
    return eid * 101 + field_idx * 7 + 3


_COMPOSITE = ("tuple", "array", "fixed_array")

_SIMPLE_REF_SQL = re.compile(
    r"^SELECT (?:DISTINCT ?\(?)?`?([A-Za-z_][A-Za-z0-9_]*)`?\)? "
    r"FROM ref\('([^']+)'\)\s*$"
)


def _build_feed_rows(order, specs):
    """Plant ROWS_PER_SPEC decodable rows per JSON spec, in toposort
    order so dependent specs can target an upstream row's decoded
    address. Returns (rows, per-spec {name: (uid, [eids])})."""
    rows, planted = [], {}
    eid = 0
    for name in order:
        spec = specs[name]
        if isinstance(spec, SqlViewSpec):
            continue
        uid = _uid_for(spec, specs, planted)
        eids = []
        for _ in range(ROWS_PER_SPEC):
            fields = [
                (f.name, parse_abi_type(f.abi_type), f.indexed)
                for f in spec.parser.fields
            ]
            topics = [spec.parser.selector]
            for i, (_n, t, ix) in enumerate(fields):
                if not ix:
                    continue
                s = _seed(eid, i)
                if is_dynamic(t) or t.kind in _COMPOSITE:
                    topics.append(_w(s))  # hash stand-in, surfaced verbatim
                else:
                    topics.append(_enc_static(t, s))
            data = _enc_members(
                [(t, _seed(eid, i)) for i, (_n, t, ix) in enumerate(fields) if not ix]
            )
            if spec.parser.type == "trace":
                data = spec.parser.selector + data
                topics = []
            rows.append((eid, 0, uid or "0x" + "00" * 20, data, topics))
            eids.append(eid)
            eid += 1
        planted[name] = (uid, eids)
    return rows, planted


def _uid_for(spec, specs, planted):
    """user_id that passes this spec's contract filter, or None when the
    filter can't be satisfied by planting (rows then drop — the table
    still materializes empty, like a quiet contract in production)."""
    ca = spec.parser.contract_address
    if not ca:
        return "0x" + "ab" * 20
    refs = REF_REGEX.findall(ca)
    if not refs:
        lits = _contract_literals(ca)
        return lits[0] if lits else None
    m = _SIMPLE_REF_SQL.match(ca.strip())
    if not m:
        return None
    col, up_bare = m.group(1), m.group(2)
    up_name = up_bare if up_bare in specs else None
    if up_name is None:
        return None
    upstream = specs[up_name]
    if isinstance(upstream, SqlViewSpec):
        # literal-table view (mellow): first planted address literal
        m2 = re.search(r"'(0x[a-f0-9]{40})'", upstream.sql)
        return m2.group(1) if m2 else None
    up_uid, up_eids = planted.get(up_name, (None, []))
    if up_uid is None or not up_eids:
        return None
    for i, f in enumerate(upstream.parser.fields):
        if f.name != col:
            continue
        t = parse_abi_type(f.abi_type)
        if f.indexed and (is_dynamic(t) or t.kind in _COMPOSITE):
            return None
        v = _expected(t, _seed(up_eids[0], i))
        return v if isinstance(v, str) and v.startswith("0x") else None
    return None


def _row_value(v):
    """collect()ed cell -> plain python (Rows -> dicts, recursively)."""
    if hasattr(v, "asDict"):
        return {k: _row_value(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_row_value(x) for x in v]
    return v


# -------------------------------------------------------------------- sweep


@pytest.mark.parametrize("folder", FOLDERS)
def test_real_folder_executes_end_to_end(spark, tmp_path, folder):
    specs = load_dataset_folder(os.path.join(DEFS, folder))
    order = toposort(specs)
    assert len(order) == len(specs)
    pos = {n: i for i, n in enumerate(order)}
    for name, spec in specs.items():
        for ref in spec.refs:
            assert pos[ref] < pos[name]

    rows, planted = _build_feed_rows(order, specs)
    n_events = len(rows)
    feed = spark.createDataFrame(
        rows, "event_id long, ts long, user_id string, data string, "
        "topics array<string>",
    )
    ex = ParseDatasetExecutor(spark, str(tmp_path / folder), specs)
    report = ex.run(feed, upto_pos=n_events)

    json_specs = [n for n in order if not isinstance(specs[n], SqlViewSpec)]
    views = [n for n in order if isinstance(specs[n], SqlViewSpec)]
    assert all(report[n] == "full_refresh" for n in json_specs)
    assert all(report[n] == "view" for n in views)

    # every spec whose contract filter we satisfied decodes ALL its
    # planted rows (null-on-failure would silently drop a bad decode),
    # with value-level equality on every decoded column of the first row
    checked = 0
    for name in json_specs:
        uid, eids = planted[name]
        if uid is None:
            continue
        spec = specs[name]
        got = {r["event_id"]: r for r in ex.read(name).collect()}
        # subset, not equality: a sibling spec sharing this selector AND
        # a common contract address legitimately cross-matches rows
        assert set(eids) <= set(got), (
            f"{name}: planted rows dropped (decode failure) — "
            f"{sorted(set(eids) - set(got))}"
        )
        r0 = got[eids[0]]
        for i, f in enumerate(spec.parser.fields):
            t = parse_abi_type(f.abi_type)
            s = _seed(eids[0], i)
            if f.indexed and (is_dynamic(t) or t.kind in _COMPOSITE):
                exp = "0x" + _w(s)
            else:
                exp = _coerce_expected(_expected(t, s), t, f.out_type)
            assert _row_value(r0[f.name]) == exp, (
                f"{name}.{f.name} ({f.abi_type}): {_row_value(r0[f.name])!r} != {exp!r}"
            )
        checked += 1
    assert checked >= len(json_specs) // 2, (
        f"{folder}: only {checked}/{len(json_specs)} specs had satisfiable "
        "contract filters — feed synthesis regressed"
    )

    # replays are fenced
    assert all(
        v in ("fenced", "view") for v in ex.run(feed, upto_pos=n_events).values()
    )

    # stitch: serves history + live rows past the last pos. Target: a
    # planted spec whose refs (if any) are all materialized JSON specs
    # (stitch resolves refs via table reads — a view ref has no table).
    target = next(
        (
            n
            for n in json_specs
            if planted[n][0]
            and all(
                r in specs and not isinstance(specs[r], SqlViewSpec)
                for r in specs[n].refs
            )
        ),
        None,
    )
    if target is None:
        return  # no stitchable spec (all refs are views) — lifecycle done
    uid, eids = planted[target]
    spec = specs[target]
    live_eid = n_events + 50
    fields = [
        (f.name, parse_abi_type(f.abi_type), f.indexed) for f in spec.parser.fields
    ]
    topics = [spec.parser.selector]
    for i, (_n, t, ix) in enumerate(fields):
        if ix:
            s = _seed(live_eid, i)
            topics.append(
                _w(s)
                if is_dynamic(t) or t.kind in _COMPOSITE
                else _enc_static(t, s)
            )
    data = _enc_members(
        [(t, _seed(live_eid, i)) for i, (_n, t, ix) in enumerate(fields) if not ix]
    )
    if spec.parser.type == "trace":
        data = spec.parser.selector + data
        topics = []
    live = feed.unionByName(
        spark.createDataFrame([(live_eid, 0, uid, data, topics)], feed.schema)
    )
    stitched = ex.stitch(target, live)
    ids = {r["event_id"] for r in stitched.collect()}
    assert set(eids) <= ids and live_eid in ids
