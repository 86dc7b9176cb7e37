"""BPE merge learning: the determinism contract's edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F


def _merges(spark, docs, n=4):
    """The registered pipeline's body over an in-memory corpus (the
    registered fn only adds the parquet read on top of this)."""
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    words = (
        df.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"), "cnt")
        .localCheckpoint()
    )
    out = []
    for r in range(n):
        sarr = F.split("sym", " ")
        pairs_arr = F.when(
            F.size(sarr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(sarr) - 1),
                lambda j: F.concat_ws(
                    " ", F.element_at(sarr, j), F.element_at(sarr, j + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            words.select("cnt", F.explode(pairs_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, merged = top[0]["pair"], top[0]["pair"].replace(" ", "")
        out.append((pair, merged, int(top[0]["c"])))
        words = words.select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                )
            ).alias("sym"),
            "cnt",
        ).localCheckpoint()
    return out, words


def test_run_merge_is_left_to_right_nonoverlapping(spark):
    # "aaa" symbols "a a a": merging "a a" must give "aa a", not "a aa"
    merges, words = _merges(spark, ["aaa"], n=1)
    assert merges[0][:2] == ("a a", "aa")
    assert [r["sym"] for r in words.collect()] == ["aa a"]


def test_merges_compose_hierarchically(spark):
    # 'ab' dominant -> merge 1 = "a b"; then "ab c" can win round 2
    merges, _ = _merges(spark, ["abc abc abc ab ab"], n=2)
    assert merges[0][:2] == ("a b", "ab")
    assert merges[1][:2] == ("ab c", "abc")


def test_tie_breaks_lexicographic(spark):
    # "xy" and "ab" both appear once -> "a b" wins the tie
    merges, _ = _merges(spark, ["xy ab"], n=1)
    assert merges[0][0] == "a b"


def test_loop_stops_when_no_pairs_left(spark):
    merges, _ = _merges(spark, ["a b c"], n=5)
    assert merges == []  # single-char words only -> nothing to merge


def test_counts_weighted_by_word_frequency(spark):
    # 'q q q' as three words: pair counts come from the dict weighted
    # by word count, so "q"-internal pairs don't exist but repeated
    # words multiply their internal pairs
    merges, _ = _merges(spark, ["do do do re"], n=1)
    assert merges[0] == ("d o", "do", 3)
