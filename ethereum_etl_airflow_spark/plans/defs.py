"""Loader for REAL reference table-definition dataset folders.

The reference drives its parse stage from per-dataset folders of
``*.json`` (ABI parse specs) and ``*.sql`` (view definitions) files
(reader: ``dags/ethereumetl_airflow/parse/table_definition_reader.py:
14-40``; 7,062 JSON defs + 19 SQL views in the shipped corpus). This
module is the engine-side equivalent: point it at such a folder and
get back the spec dict the planner/executor pipeline consumes —
``plans.planner.toposort`` orders it, ``plans.executor.
ParseDatasetExecutor`` materializes it.

Semantics mirrored from the reference reader:

* table name = file stem; duplicate names rejected
  (``table_definition_reader.py:21-23``);
* JSON defs validate through :func:`plans.spec.parse_spec`, which
  derives the decode fields from ``parser.abi.inputs`` when no
  ``parser.fields`` list is present (every real def);
* SQL files become :class:`plans.spec.SqlViewSpec` (the reference's
  SQL filetype branch, ``parse_dataset_folder_logic.py:108-121``);
* every ``ref('X')`` edge must resolve inside the dataset
  (``validate_ref_dependencies``) unless ``allow_external_refs``.
"""

from __future__ import annotations

import glob
import os

from ethereum_etl_airflow_spark.plans.spec import (
    ExtractionSpec,
    SpecValidationError,
    SqlViewSpec,
    parse_spec,
)


def load_definition(path: str, dataset_name: str | None = None):
    """One table-definition file -> ExtractionSpec (json) or
    SqlViewSpec (sql). The table name is the file stem and must match
    the JSON's ``table.table_name`` (test_validate_json.py:41-73)."""
    name = os.path.splitext(os.path.basename(path))[0]
    with open(path) as f:
        content = f.read()
    if path.endswith(".json"):
        return parse_spec(content, expected_name=name)
    if path.endswith(".sql"):
        ds = dataset_name or os.path.basename(os.path.dirname(path))
        return SqlViewSpec(ds, name, content)
    raise SpecValidationError(f"unsupported definition file: {path}")


def load_dataset_folder(
    folder: str, allow_external_refs: bool = False
) -> dict[str, ExtractionSpec | SqlViewSpec]:
    """All definitions of one dataset folder as
    ``{"dataset.table": spec}``, ready for ``planner.toposort`` /
    ``ParseDatasetExecutor`` directly.

    The reference's defs reference each other by BARE table name
    (``ref('Factory_event_Created')``) while the engine's planner and
    executor address specs by the qualified ``dataset.table`` form —
    so in-dataset refs are QUALIFIED during loading (a pure textual
    ``ref('X')`` -> ``ref('dataset.X')`` rewrite, mirroring the
    reference's per-dataset ``validate_ref_dependencies`` scope).
    Qualification always uses the TARGET def's own declared
    ``table.dataset_name`` (folder basename only as fallback), so a
    folder checked out under a different directory name still
    self-resolves."""
    import json as _json

    from ethereum_etl_airflow_spark.plans.spec import REF_REGEX

    json_paths = sorted(glob.glob(os.path.join(folder, "*.json")))
    sql_paths = sorted(glob.glob(os.path.join(folder, "*.sql")))
    paths = json_paths + sql_paths
    if not paths:
        raise SpecValidationError(f"no table definitions under {folder}")
    names = {os.path.splitext(os.path.basename(p))[0] for p in paths}
    if len(names) != len(paths):
        raise SpecValidationError(f"duplicate table names under {folder}")

    fallback_ds = os.path.basename(os.path.abspath(folder))
    # pass 1: each table's dataset (its own declaration wins) — the
    # qualification map every ref rewrite consults
    docs: dict[str, dict] = {}
    ds_of: dict[str, str] = {}
    for path in json_paths:
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            docs[name] = _json.load(f)
        ds_of[name] = (
            docs[name].get("table", {}).get("dataset_name") or fallback_ds
        )
    # SQL views adopt the folder's dataset: the declared name of the
    # JSON defs when they agree (the reference corpus always does),
    # else the folder basename
    declared = set(ds_of.values())
    view_ds = declared.pop() if len(declared) == 1 else fallback_ds
    for path in sql_paths:
        ds_of[os.path.splitext(os.path.basename(path))[0]] = view_ds

    def qualify(text: str) -> str:
        return REF_REGEX.sub(
            lambda m: (
                f"ref('{ds_of[m.group(1)]}.{m.group(1)}')"
                if m.group(1) in names
                else m.group(0)
            ),
            text,
        )

    specs: dict[str, ExtractionSpec | SqlViewSpec] = {}
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        if path.endswith(".json"):
            d = docs[name]
            ca = (d.get("parser") or {}).get("contract_address")
            if ca:
                d["parser"]["contract_address"] = qualify(ca)
            spec = parse_spec(d, expected_name=name)
        else:
            with open(path) as f:
                spec = SqlViewSpec(ds_of[name], name, qualify(f.read()))
        specs[spec.name] = spec
    if not allow_external_refs:
        for name, spec in specs.items():
            for ref in spec.refs:
                if ref not in specs:
                    raise SpecValidationError(
                        f"{name} references unknown table {ref!r}"
                    )
    return specs
