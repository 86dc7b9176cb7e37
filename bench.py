#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Two measurements:

1. **Headline queries** — every registered operator query from
   ``ethereum_etl_airflow_spark.queries`` run at ``$SPARK_GRAFT_SF_DIR``
   (default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``,
   each materialized with a ``noop`` write (full compute, zero sink
   cost). Per-query wall seconds land in ``"queries"``.

2. **CDC replay throughput** — the north-rule metric: sustained
   change-events/sec applying an ordered insert/update/delete feed into
   the snapshot table via the keyed LWW MERGE
   (``operators/cdc.apply_changes``). The feed is generated
   deterministically (``sources/feed.py``) and PRE-MATERIALIZED to
   parquet so generation cost is excluded. Scaling evidence for the
   BASELINE rule (throughput efficiency >= 0.8 from N to 4N executors)
   is produced by replaying the SAME feed at ``local[8]`` and
   ``local[32]`` (sandbox proxy for N vs 4N executors, BASELINE.md):
   ``efficiency = (events_per_sec[4N] / events_per_sec[N]) / 4``.

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir            (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     big parallelism      (default 32)
  SPARK_GRAFT_CPUS_LO  small parallelism    (default max(1, CPUS//4))
  SPARK_GRAFT_BENCH_EVENTS  CDC feed size   (default 4_000_000)
  SPARK_GRAFT_SCALING  "0" skips the low-parallelism rerun
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CPUS_LO = int(os.environ.get("SPARK_GRAFT_CPUS_LO", str(max(1, CPUS // 4))))
BENCH_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "4000000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def make_session(cpus: int):
    from ethereum_etl_airflow_spark.session import get_spark

    return get_spark(
        app_name=f"bench-local{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )


def run_headline_queries(spark) -> dict[str, float]:
    from ethereum_etl_airflow_spark.queries import get_queries

    timings: dict[str, float] = {}
    for name, fn in get_queries().items():
        t0 = time.time()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench JSON line coming no matter what
            print(f"[bench] query {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
    return timings


def cdc_feed_config(n_events: int):
    from ethereum_etl_airflow_spark.sources.feed import FeedConfig

    n_batches = 4
    return FeedConfig(
        n_docs=max(1000, n_events // 4),
        events_per_batch=n_events // n_batches,
        n_batches=n_batches,
        seed=42,
        dup_tail=10_000,
        max_tokens=64,
    )


def materialize_feed(spark, cfg, feed_dir: str) -> None:
    from ethereum_etl_airflow_spark.sources.feed import write_feed

    write_feed(spark, cfg, feed_dir)


def replay(spark, feed_dir: str, table_root: str, cpus: int) -> dict:
    """Replay all feed batches into a fresh snapshot table; return metrics."""
    from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer

    shutil.rmtree(table_root, ignore_errors=True)
    tailer = ChangeLogTailer(
        spark,
        feed_dir,
        table_root,
        app_id=f"bench{cpus}",
        verify=False,
    )
    t0 = time.time()
    lineage = tailer.replay_batches()
    wall = time.time() - t0
    events = sum(li["events_in"] for li in lineage)
    return {
        "events": events,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(events / wall, 1) if wall else None,
        "batches": len(lineage),
    }


def main() -> None:
    work = tempfile.mkdtemp(prefix="spark_graft_bench_")
    feed_dir = os.path.join(work, "feed")
    cfg = cdc_feed_config(BENCH_EVENTS)

    # ---- big session: headline queries + feed gen + CDC replay
    spark = make_session(CPUS)
    queries = run_headline_queries(spark)
    materialize_feed(spark, cfg, feed_dir)
    cdc_hi = replay(spark, feed_dir, os.path.join(work, f"table{CPUS}"), CPUS)
    spark.stop()

    scaling = None
    if DO_SCALING:
        spark_lo = make_session(CPUS_LO)
        cdc_lo = replay(spark_lo, feed_dir, os.path.join(work, f"table{CPUS_LO}"), CPUS_LO)
        spark_lo.stop()
        ratio = CPUS / CPUS_LO
        eff = (
            round((cdc_hi["events_per_sec"] / cdc_lo["events_per_sec"]) / ratio, 3)
            if cdc_lo["events_per_sec"]
            else None
        )
        scaling = {
            f"local{CPUS_LO}_events_per_sec": cdc_lo["events_per_sec"],
            f"local{CPUS}_events_per_sec": cdc_hi["events_per_sec"],
            "core_ratio": ratio,
            "efficiency": eff,
        }

    shutil.rmtree(work, ignore_errors=True)

    ok = {k: v for k, v in queries.items() if v >= 0}
    out = {
        "metric": "cdc_change_events_per_sec",
        "value": cdc_hi["events_per_sec"],
        "unit": "events/sec",
        "queries": queries,
        "sf": _sf_from_dir(SF_DIR),
        "headline_total_sec": round(sum(ok.values()), 3),
        "cdc": cdc_hi,
        "cdc_feed_events": BENCH_EVENTS,
        "scaling": scaling,
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
