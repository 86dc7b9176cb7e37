"""Loader tests: BigQuery-style schema mapping, tolerant NDJSON parse
(unknown fields ignored, malformed rows isolated), CSV options."""

from __future__ import annotations

from pyspark.sql import types as T

from ethereum_etl_airflow_spark.sources.loaders import (
    load_csv,
    load_ndjson,
    schema_from_json,
)


def test_schema_from_json_bigquery_shapes():
    s = schema_from_json(
        [
            {"name": "number", "type": "INT64", "mode": "REQUIRED"},
            {"name": "hash", "type": "STRING"},
            {"name": "difficulty", "type": "NUMERIC"},
            {"name": "topics", "type": "STRING", "mode": "REPEATED"},
            {
                "name": "withdrawals",
                "type": "RECORD",
                "mode": "REPEATED",
                "fields": [
                    {"name": "index", "type": "INT64"},
                    {"name": "address", "type": "STRING"},
                ],
            },
        ]
    )
    assert s["number"].dataType == T.LongType() and not s["number"].nullable
    assert s["difficulty"].dataType == T.DecimalType(38, 9)
    assert s["topics"].dataType == T.ArrayType(T.StringType())
    w = s["withdrawals"].dataType
    assert isinstance(w, T.ArrayType) and isinstance(w.elementType, T.StructType)


def test_ndjson_tolerant_load(spark, tmp_path):
    p = tmp_path / "data.json"
    p.write_text(
        '{"a": 1, "b": "x", "unknown_field": 99}\n'
        '{"a": 2, "b": "y"}\n'
        "not json at all\n"
    )
    schema = schema_from_json([{"name": "a", "type": "INT64"}, {"name": "b", "type": "STRING"}])
    df = load_ndjson(spark, str(p), schema, keep_corrupt=True)
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    # unknown field silently ignored (ignore_unknown_values), bad row isolated
    assert {(r.a, r.b) for r in good} == {(1, "x"), (2, "y")}
    assert len(bad) == 1


def test_csv_header_and_quoted_newlines(spark, tmp_path):
    p = tmp_path / "seed.csv"
    p.write_text('address,symbol\n0xabc,"TOK\nEN"\n0xdef,TOK2\n')
    schema = schema_from_json(
        [{"name": "address", "type": "STRING"}, {"name": "symbol", "type": "STRING"}]
    )
    rows = {r.address: r.symbol for r in load_csv(spark, str(p), schema).collect()}
    assert rows == {"0xabc": "TOK\nEN", "0xdef": "TOK2"}