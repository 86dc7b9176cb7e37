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
        return tuple(REF_REGEX.findall(self.sql))

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
        # the decode is the hex path
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
