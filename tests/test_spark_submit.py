"""spark-submit --py-files launch-path integration test.

The north rule's deployment shape is ``spark-submit --py-files
engine.zip scripts/run_cdc.py`` on a cluster. This test proves the
packaging actually works: the engine is zipped, run_cdc.py is COPIED
to a neutral directory (so its repo-relative sys.path fallback points
at an empty dir), and a real ``spark-submit`` subprocess replays a
feed importing the package ONLY from the --py-files zip. The final
table state is then checked against the first-principles LWW fold.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

from ethereum_etl_airflow_spark.sinks.snapshot_table import SnapshotTable
from ethereum_etl_airflow_spark.sources.feed import (
    FeedConfig,
    lww_expected_state,
    write_feed,
)

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")

CFG = FeedConfig(n_docs=300, events_per_batch=600, n_batches=3, dup_tail=50)


def _zip_engine(dest: Path) -> Path:
    zpath = dest / "engine.zip"
    pkg = REPO / "ethereum_etl_airflow_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_replay(spark, tmp_path):
    feed = tmp_path / "feed"
    write_feed(spark, CFG, str(feed))

    stage = tmp_path / "stage"
    stage.mkdir()
    zpath = _zip_engine(stage)
    shutil.copy(REPO / "scripts" / "run_cdc.py", stage / "run_cdc.py")

    env = {
        k: v
        for k, v in os.environ.items()
        # the subprocess must find the package in the zip, not via an
        # inherited interpreter path into the repo
        if k not in ("PYTHONPATH",)
    }
    table_root = tmp_path / "t"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(stage / "run_cdc.py"),
            "--feed-dir", str(feed),
            "--table-root", str(table_root),
            "--mode", "replay",
            "--app-id", "submit-test",
            "--buckets", "8",
        ],
        cwd=str(stage),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # per-batch lineage JSON lines on stdout (offset range + counts)
    lineage = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{") and '"epoch"' in line
    ]
    assert [li["epoch"] for li in lineage] == list(range(CFG.n_batches))
    assert all(li["events_in"] > 0 for li in lineage)

    # final state == the LWW fold of the whole feed (token-array equality)
    table = SnapshotTable(spark, str(table_root), num_buckets=8)
    got = sorted(
        (r.doc_id, tuple(r.tokens or []), r.n_tok, r.source)
        for r in table.read().select("doc_id", "tokens", "n_tok", "source").collect()
    )
    want = sorted(
        (r.doc_id, tuple(r.tokens or []), r.n_tok, r.source)
        for r in lww_expected_state(spark, CFG, CFG.n_batches - 1)
        .select("doc_id", "tokens", "n_tok", "source")
        .collect()
    )
    assert got == want
