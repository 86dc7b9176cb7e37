"""Self-describing JSON change-envelope ingest: the same feed driven
through the CDC core twice — once as typed parquet change rows, once
as raw JSON envelopes decoded per batch by ``envelope_to_changes``
(``ChangeLogTailer(transform=...)``) — must converge to the identical
final table state, including delete tombstoning and crash-resume."""

from __future__ import annotations

import pyspark.sql.functions as F

from ethereum_etl_airflow_spark.streaming.tailer import (
    ChangeLogTailer,
    envelope_to_changes,
)

SCHEMA = (
    "op string, doc_id string, seq long, tokens array<int>, "
    "n_tok int, source string"
)


def _typed(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.timestamp_seconds(F.col("seq")).cast("timestamp_ntz")
    )


def _as_envelopes(df):
    """typed change rows -> one raw JSON envelope per row (deletes get
    a null ``after`` payload, like a real WAL emitter)."""
    after = F.when(
        F.col("op") != "D",
        F.struct(F.col("tokens"), F.col("n_tok"), F.col("source")),
    )
    return df.select(
        F.to_json(
            F.struct(
                F.col("op"), F.col("doc_id"), F.col("seq"), F.col("ts"),
                after.alias("after"),
            )
        ).alias("envelope")
    )


BATCHES = [
    [
        ("I", "a", 1, [1, 2], 2, "s0"),
        ("I", "b", 2, [3], 1, "s0"),
        ("I", "c", 3, [4, 5, 6], 3, "s1"),
    ],
    [
        ("U", "a", 4, [7, 8, 9], 3, "s0"),
        ("D", "b", 5, None, None, None),
        ("I", "d", 6, [10], 1, "s1"),
    ],
]


def _write_feeds(spark, tmp_path):
    typed_feed = str(tmp_path / "typed")
    env_feed = str(tmp_path / "env")
    for i, rows in enumerate(BATCHES):
        df = _typed(spark, rows)
        df.write.parquet(f"{typed_feed}/batch-{i}")
        _as_envelopes(df).write.parquet(f"{env_feed}/batch-{i}")
    return typed_feed, env_feed


def _state(table):
    return sorted(
        (r.doc_id, r.tokens, r.n_tok, r.source) for r in table.read().collect()
    )


def test_envelope_ingest_matches_typed_ingest(spark, tmp_path):
    typed_feed, env_feed = _write_feeds(spark, tmp_path)

    t1 = ChangeLogTailer(spark, typed_feed, str(tmp_path / "t1"), app_id="typed")
    t1.replay_batches()

    t2 = ChangeLogTailer(
        spark,
        env_feed,
        str(tmp_path / "t2"),
        app_id="env",
        transform=envelope_to_changes,
    )
    lineage = t2.replay_batches()

    assert _state(t1.table) == _state(t2.table)
    # delete applied: b gone; a carries the batch-1 update
    state = dict((d, (tok, n)) for d, tok, n, _ in _state(t2.table))
    assert "b" not in state
    assert state["a"] == ([7, 8, 9], 3)
    assert [li["events_in"] for li in lineage] == [3, 3]


def test_envelope_ingest_resume_is_exactly_once(spark, tmp_path):
    _, env_feed = _write_feeds(spark, tmp_path)
    root = str(tmp_path / "t")

    ChangeLogTailer(
        spark, env_feed, root, app_id="env", transform=envelope_to_changes
    ).replay_batches(end=0)
    resumed = ChangeLogTailer(
        spark, env_feed, root, app_id="env", transform=envelope_to_changes
    )
    lineage = resumed.replay_batches()  # epoch 0 fenced, epoch 1 applied

    assert [li["epoch"] for li in lineage] == [1]
    docs = sorted(r.doc_id for r in resumed.table.read().collect())
    assert docs == ["a", "c", "d"]
