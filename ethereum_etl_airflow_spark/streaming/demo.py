"""End-to-end CDC drive: generate a feed, tail it with Structured
Streaming, kill/resume, print lineage + final-state verification.

Usage: python -m ethereum_etl_airflow_spark.streaming.demo [workdir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

from ethereum_etl_airflow_spark.session import get_spark
from ethereum_etl_airflow_spark.sources.feed import FeedConfig, lww_expected_state, write_feed
from ethereum_etl_airflow_spark.streaming.tailer import ChangeLogTailer


def main(workdir: str | None = None) -> int:
    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="cdc_demo_")
    spark = get_spark("cdc_demo")
    cfg = FeedConfig(
        n_docs=5_000, events_per_batch=20_000, n_batches=4, dup_tail=500, evolve_at_batch=3
    )
    feed = f"{workdir}/feed"
    print(f"writing feed -> {feed}", file=sys.stderr)
    write_feed(spark, cfg, feed)

    tailer = ChangeLogTailer(spark, feed, f"{workdir}/table", app_id="demo")
    print("replaying batches 0-1, then simulated crash + resume from 0", file=sys.stderr)
    tailer.replay_batches(start=0, end=1)
    resumed = ChangeLogTailer(spark, feed, f"{workdir}/table", app_id="demo")
    resumed.replay_batches()  # epochs 0-1 fenced, 2-3 applied

    for li in resumed.lineage().orderBy("epoch").collect():
        print(json.dumps(li.asDict(recursive=True)), file=sys.stderr)

    final = resumed.table.read()
    want = lww_expected_state(spark, cfg, cfg.n_batches - 1)
    cols = ["doc_id", "tokens", "n_tok", "source", "lang"]
    diff = final.select(cols).exceptAll(want.select(cols))
    diff2 = want.select(cols).exceptAll(final.select(cols))
    n_rows, n_diff = final.count(), diff.count() + diff2.count()
    bad_ntok = final.where(
        F.col("n_tok").isNotNull() & (F.col("n_tok") != F.size("tokens"))
    ).count()
    print(
        json.dumps(
            {
                "rows": n_rows,
                "state_diff_vs_oracle": n_diff,
                "n_tok_invariant_violations": bad_ntok,
                "schema": final.schema.simpleString(),
                "verdict": "MATCH" if n_diff == 0 and bad_ntok == 0 else "MISMATCH",
            }
        )
    )
    if own_tmp:
        shutil.rmtree(workdir, ignore_errors=True)
    return 0 if n_diff == 0 and bad_ntok == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
