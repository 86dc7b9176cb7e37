"""Extraction specs: the engine's declarative query language.

The reference's parse stage is driven by 7,062 table-definition JSON
files (``dags/resources/stages/parse/table_definitions/**.json``, read
by ``table_definition_reader.py:14-40``), each declaring: a parser
(ABI item + selector + contract filter) and an output table schema.
The JSON **is** the query language — ``build_parse_dag.py`` compiles
each spec into SQL + a JS decode UDF.

This module defines the engine's equivalent spec (same information,
engine-neutral), its validation (mirror of
``tests/test_validate_json.py:41-73``), and content hashing for the
incremental planner (mirror of ``table_definition_reader.py:115-118``).

``contract_address`` may be a literal value, empty, or a ``ref('X')``
expression naming another spec's output — the cross-spec dependency
edge (``parse_table_definition_logic.py:16`` ref_regex;
``parse_dataset_folder_logic.py:108-121``).
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field

REF_REGEX = re.compile(r"ref\(\s*'([^']+)'\s*\)")

#: fully-qualified backticked table reference to another parse output,
#: as the reference's own ``replace_refs`` emits them: ``ref('X')`` ->
#: ``\`<project>.ethereum_<dataset>.<table>\`` (parse_table_definition_
#: logic.py:409-413; dataset = 'ethereum_' + declared dataset_name at
#: :34). The corpus' SQL views reference sibling parse tables in this
#: pre-expanded form; raw-chain tables (``bigquery-public-data.
#: crypto_ethereum.*``) and UDFs don't carry the ``ethereum_`` dataset
#: prefix and intentionally do not match.
BQ_TABLE_REGEX = re.compile(r"`[\w-]+\.ethereum_(\w+)\.(\w+)`")

ALLOWED_TYPES = {"string", "bigint", "int", "double", "boolean", "decimal(38,9)"}

#: JSON-payload field paths are single-level '$.key' (both decode paths
#: — JVM from_json and the pandas UDF — honor exactly this grammar)
PATH_REGEX = re.compile(r"^\$\.[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class FieldSpec:
    name: str
    path: str  # JSON path into the payload ('$.x'), the ABI-slot analogue
    type: str  # Spark SQL type name (json encoding) or '' (hex encoding)
    abi_type: str | None = None  # hex encoding: ABI type string, e.g. 'uint256'
    indexed: bool = False  # hex encoding: param rides topics, not data
    #: declared output type from table.schema of a REAL reference def
    #: ('STRING' coerces primitive decodes to string — the reference
    #: emits every scalar column as STRING); None = engine-native typing
    out_type: str | None = None


@dataclass(frozen=True)
class ParserSpec:
    type: str  # 'log' | 'trace'
    selector: str  # topic0 / 4-byte selector analogue
    contract_address: str | None  # literal | ref('other') | None
    fields: tuple[FieldSpec, ...]
    encoding: str = "json"  # 'json' (stand-in payloads) | 'hex' (ABI data+topics)


@dataclass(frozen=True)
class TableSpec:
    dataset_name: str
    table_name: str


@dataclass(frozen=True)
class ExtractionSpec:
    parser: ParserSpec
    table: TableSpec
    raw: str = field(compare=False, default="")

    @property
    def name(self) -> str:
        return f"{self.dataset_name}.{self.table.table_name}"

    @property
    def dataset_name(self) -> str:
        return self.table.dataset_name

    @property
    def content_hash(self) -> str:
        """sha256 of the canonical spec JSON (the incremental planner's
        change signal — table_definition_reader.py:115-118)."""
        return hashlib.sha256(self.raw.encode()).hexdigest()

    @property
    def refs(self) -> tuple[str, ...]:
        """Names of specs this spec depends on via ref('X')."""
        if not self.parser.contract_address:
            return ()
        return tuple(REF_REGEX.findall(self.parser.contract_address))


class SpecValidationError(ValueError):
    pass


#: contract_address grammar pinned by the reference's published
#: JSON-Schema (test_cases/schema/default_schema.json anyOf): a
#: lowercase 40-hex literal, NULL, a ref('X') subquery, or an inline
#: UNNEST address list.  JSON-Schema ``pattern`` is UNANCHORED
#: (re.search semantics) — the literal form anchors itself via ^..\Z.
_ADDR_LITERAL_RE = re.compile(r"^0x[a-f0-9]{40}\Z")
_ADDR_REF_SQL_RE = re.compile(r"SELECT .* FROM ref\('.*'\)")
_ADDR_UNNEST_SQL_RE = re.compile(
    r"SELECT .* FROM.*UNNEST\(\[(('0x[a-f0-9]{40}', )+)'0x[a-f0-9]{40}']\)"
)


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise SpecValidationError(msg)


def validate_reference_def(d: dict) -> None:
    """Schema-parity validation for REAL reference table definitions.

    Re-expresses the constraints of the reference's published
    JSON-Schema (``test_cases/schema/default_schema.json``, enforced by
    ``tests/test_validate_json.py:41-73``) as native checks, so a def
    the reference's CI would reject is rejected here too — notably the
    ``contract_address`` grammar (its three fixtures ``wrong_a..c.json``
    all fail on it: uppercase hex, free text, malformed subquery).

    Only constraints the schema actually pins are checked; presence
    requirements apply to keys, type/pattern constraints only when the
    key is present (JSON-Schema semantics).
    """
    p, t = d.get("parser"), d.get("table")
    _require(isinstance(p, dict), "parser must be an object")
    _require(isinstance(t, dict), "table must be an object")
    for key in ("abi", "contract_address", "type"):
        _require(key in p, f"parser.{key} is required for reference defs")
    abi = p["abi"]
    _require(isinstance(abi, dict), "parser.abi must be an object")
    for key in ("inputs", "name", "type"):
        _require(key in abi, f"parser.abi.{key} is required")
    _require(isinstance(abi["name"], str), "parser.abi.name must be a string")
    _require(isinstance(abi["type"], str), "parser.abi.type must be a string")
    if "anonymous" in abi:
        _require(
            isinstance(abi["anonymous"], bool),
            "parser.abi.anonymous must be a boolean",
        )
    _require(isinstance(abi["inputs"], list), "parser.abi.inputs must be an array")
    for i, inp in enumerate(abi["inputs"]):
        _require(isinstance(inp, dict), f"abi.inputs[{i}] must be an object")
        for key in ("name", "type"):
            _require(key in inp, f"abi.inputs[{i}].{key} is required")
        _require(
            isinstance(inp["name"], str) and len(inp["name"]) >= 1,
            f"abi.inputs[{i}].name must be a non-empty string",
        )
        _require(
            isinstance(inp["type"], str), f"abi.inputs[{i}].type must be a string"
        )
        if "indexed" in inp:
            _require(
                isinstance(inp["indexed"], bool),
                f"abi.inputs[{i}].indexed must be a boolean",
            )
        if "internalType" in inp:
            _require(
                isinstance(inp["internalType"], str),
                f"abi.inputs[{i}].internalType must be a string",
            )
    if "field_mapping" in p:
        _require(
            isinstance(p["field_mapping"], dict),
            "parser.field_mapping must be an object",
        )
    ca = p["contract_address"]
    if ca is not None:
        _require(
            isinstance(ca, str)
            and bool(
                _ADDR_LITERAL_RE.search(ca)
                or _ADDR_REF_SQL_RE.search(ca)
                or _ADDR_UNNEST_SQL_RE.search(ca)
            ),
            f"parser.contract_address {ca!r} matches none of the allowed "
            "forms (lowercase 0x-hex literal | null | ref() subquery | "
            "UNNEST address list)",
        )
    for key in ("dataset_name", "schema", "table_description", "table_name"):
        _require(key in t, f"table.{key} is required for reference defs")
    for key in ("dataset_name", "table_description", "table_name"):
        _require(isinstance(t[key], str), f"table.{key} must be a string")
    _require(isinstance(t["schema"], list), "table.schema must be an array")
    for i, col in enumerate(t["schema"]):
        _require(isinstance(col, dict), f"table.schema[{i}] must be an object")
        for key in ("name", "type"):
            _require(key in col, f"table.schema[{i}].{key} is required")
        _require(
            isinstance(col["name"], str) and len(col["name"]) >= 1,
            f"table.schema[{i}].name must be a non-empty string",
        )
        _require(
            isinstance(col["type"], str), f"table.schema[{i}].type must be a string"
        )
        if "description" in col:
            _require(
                isinstance(col["description"], str),
                f"table.schema[{i}].description must be a string",
            )


def _abi_type_string(inp: dict) -> str:
    """ABI input dict -> canonical type string our parser accepts.
    Tuples arrive as type 'tuple'/'tuple[]'/… plus a ``components``
    list; flatten to '(t1 name1, t2 name2)[...]' recursively (the same
    canonicalization eth_utils applies for selector hashing)."""
    t = inp.get("type", "")
    if t.startswith("tuple"):
        comps = ", ".join(
            _abi_type_string(c) + (f" {c['name']}" if c.get("name") else "")
            for c in inp.get("components") or []
        )
        return "(" + comps + ")" + t[5:]
    return t


def _fields_from_abi(p: dict, t: dict) -> list[dict]:
    """Derive decode fields for a REAL reference table definition
    (``parser.abi.inputs`` + ``table.schema`` + ``field_mapping`` —
    reader at dags/ethereumetl_airflow/parse/table_definition_reader.py:
    14-40; all 7,062 reference defs carry no ``parser.fields``). Each
    ABI input becomes one hex field: ``field_mapping`` renames the
    output column, ``indexed`` routes it through topics, and the
    declared ``table.schema`` type (STRING everywhere in the corpus)
    coerces the decoded value to the reference's output contract."""
    mapping = p.get("field_mapping") or {}
    declared = {s.get("name"): s for s in (t.get("schema") or [])}
    out = []
    for inp in p["abi"]["inputs"]:
        name = mapping.get(inp.get("name"), inp.get("name"))
        if not name:
            raise SpecValidationError("abi input without a name")
        out.append(
            {
                "name": name,
                "abi_type": _abi_type_string(inp),
                "indexed": bool(inp.get("indexed", False)),
                "out_type": (declared.get(name) or {}).get("type"),
            }
        )
    return out


@dataclass(frozen=True)
class SqlViewSpec:
    """SQL-type table definition: a raw-SQL view over other specs'
    outputs, referenced via ``ref('X')`` (reference:
    ``parse_dataset_folder_logic.py:108-121`` SQL filetype branch +
    ``replace_refs``; 19 such .sql views under table_definitions/).

    Planner-compatible by duck typing: exposes the same ``refs`` /
    ``content_hash`` / ``name`` surface as :class:`ExtractionSpec`, so
    mixed JSON+SQL spec DAGs toposort and hash-diff uniformly."""

    dataset_name: str
    table_name: str
    sql: str

    @property
    def name(self) -> str:
        return f"{self.dataset_name}.{self.table_name}"

    @property
    def refs(self) -> tuple[str, ...]:
        """Dependency edges: ``ref('X')`` forms plus pre-expanded
        backticked parse-table names (both are the same edge — the
        reference's replace_refs turns the former into the latter)."""
        names = list(REF_REGEX.findall(self.sql))
        names += [
            f"{m.group(1)}.{m.group(2)}"
            for m in BQ_TABLE_REGEX.finditer(self.sql)
        ]
        seen: set[str] = set()
        out = []
        for n in names:
            if n not in seen:
                seen.add(n)
                out.append(n)
        return tuple(out)

    @property
    def content_hash(self) -> str:
        return hashlib.sha256(self.sql.encode()).hexdigest()


def parse_spec(doc: dict | str, expected_name: str | None = None) -> ExtractionSpec:
    """Load + validate one spec (mirror of test_validate_json.py checks:
    required keys, known types, table_name matches file name)."""
    raw = doc if isinstance(doc, str) else json.dumps(doc, sort_keys=True)
    d = json.loads(raw) if isinstance(doc, str) else doc

    for key in ("parser", "table"):
        if key not in d:
            raise SpecValidationError(f"missing top-level key: {key}")
    p, t = d["parser"], d["table"]
    if p.get("type") not in ("log", "trace"):
        raise SpecValidationError(f"parser.type must be log|trace, got {p.get('type')}")
    raw_fields = p.get("fields")
    abi = p.get("abi") or {}
    if raw_fields is None and abi.get("name") and "inputs" in abi:
        # a real reference def: no parser.fields, no encoding key —
        # the ABI *is* the field list (possibly empty: zero-argument
        # events like Paused() still need their derived selector), and
        # the decode is the hex path; such defs must satisfy the
        # reference's published JSON-Schema constraints
        validate_reference_def(d)
        raw_fields = _fields_from_abi(p, t)
        encoding = p.get("encoding", "hex")
    else:
        raw_fields = raw_fields or []
        encoding = p.get("encoding", "json")
    if encoding not in ("json", "hex"):
        raise SpecValidationError(f"parser.encoding must be json|hex, got {encoding}")
    selector = p.get("selector")
    if not selector and encoding == "hex" and p.get("abi"):
        # derive selector from the ABI item (ref generate_parse_sql.py:16-25:
        # keccak of the canonical signature — topic0 for events, 4-byte
        # prefix for calls; parse_table_definition_logic.py:116,190)
        from ethereum_etl_airflow_spark.functions.keccak import (
            event_selector,
            function_selector,
        )

        derive = event_selector if p["type"] == "log" else function_selector
        selector = derive(p["abi"])
    if not selector:
        raise SpecValidationError("parser.selector is required")
    fields = []
    seen: set[str] = set()
    for f in raw_fields:
        if f["name"] in seen:
            raise SpecValidationError(f"duplicate field {f['name']}")
        seen.add(f["name"])
        if encoding == "hex":
            if not f.get("abi_type"):
                raise SpecValidationError(
                    f"field {f['name']}: hex specs require abi_type"
                )
            from ethereum_etl_airflow_spark.plans.abi import AbiTypeError, parse_abi_type

            try:
                parse_abi_type(f["abi_type"])
            except AbiTypeError as e:
                raise SpecValidationError(f"field {f['name']}: {e}") from e
            fields.append(
                FieldSpec(
                    f["name"], "", "", abi_type=f["abi_type"],
                    indexed=bool(f.get("indexed", False)),
                    out_type=f.get("out_type"),
                )
            )
            continue
        if f["type"] not in ALLOWED_TYPES:
            raise SpecValidationError(f"unknown type {f['type']} for field {f['name']}")
        path = f.get("path", f"$.{f['name']}")
        if not PATH_REGEX.match(path):
            raise SpecValidationError(
                f"field {f['name']}: path {path!r} must match '$.key' (single level)"
            )
        fields.append(FieldSpec(f["name"], path, f["type"]))
    for key in ("dataset_name", "table_name"):
        if not t.get(key):
            raise SpecValidationError(f"table.{key} is required")
    if expected_name is not None and t["table_name"] != expected_name:
        raise SpecValidationError(
            f"table_name {t['table_name']!r} != file name {expected_name!r}"
        )
    return ExtractionSpec(
        parser=ParserSpec(
            type=p["type"],
            selector=selector,
            contract_address=p.get("contract_address"),
            fields=tuple(fields),
            encoding=encoding,
        ),
        table=TableSpec(dataset_name=t["dataset_name"], table_name=t["table_name"]),
        raw=json.dumps(d, sort_keys=True),
    )
