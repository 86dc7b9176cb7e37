"""File → table loaders mirroring the reference's load-stage options.

The reference loads newline-JSON exports and seed CSVs into raw
tables with explicit schemas and tolerant parsing
(``build_load_dag.py:93-117``: schema from JSON file at :96-99,
``ignore_unknown_values`` at :105, CSV ``skip_leading_rows=1`` +
``allow_quoted_newlines`` at :109-113; seed CSV ``build_amend_dag.py:52-76``).

Spark mapping is 1:1:
  ignore_unknown_values  -> PERMISSIVE mode (default) + explicit schema
                            (unknown fields dropped, malformed rows
                            captured in _corrupt_record if requested)
  skip_leading_rows=1    -> header=True
  allow_quoted_newlines  -> multiLine=True
  WRITE_TRUNCATE         -> mode("overwrite") on the write side
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def schema_from_json(doc: str | list) -> T.StructType:
    """Build a schema from a BigQuery-style field list
    (``[{"name": ..., "type": ..., "mode": ...}, ...]`` — the shape of
    dags/resources/stages/raw/schemas/*.json)."""
    fields = json.loads(doc) if isinstance(doc, str) else doc
    type_map = {
        "STRING": T.StringType(),
        "INT64": T.LongType(),
        "INTEGER": T.LongType(),
        "FLOAT64": T.DoubleType(),
        "FLOAT": T.DoubleType(),
        "NUMERIC": T.DecimalType(38, 9),
        "BOOLEAN": T.BooleanType(),
        "TIMESTAMP": T.TimestampType(),
        "DATE": T.DateType(),
    }

    def field_type(f: dict) -> T.DataType:
        if f.get("type", "").upper() == "RECORD":
            inner = T.StructType([mk(sub) for sub in f.get("fields", [])])
            base: T.DataType = inner
        else:
            base = type_map[f["type"].upper()]
        if f.get("mode", "").upper() == "REPEATED":
            return T.ArrayType(base)
        return base

    def mk(f: dict) -> T.StructField:
        return T.StructField(
            f["name"], field_type(f), f.get("mode", "NULLABLE").upper() != "REQUIRED"
        )

    return T.StructType([mk(f) for f in fields])


def load_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Newline-delimited JSON with explicit schema; unknown fields are
    ignored (schema projection), malformed rows null out (PERMISSIVE)
    or land in _corrupt_record when kept."""
    if keep_corrupt:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """Seed-CSV loader: header skip + quoted-newline tolerance."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
