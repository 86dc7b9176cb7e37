"""Import-cycle regression: a Spark Python worker imports the module
of whatever function it unpickles FIRST, so every registration module
must be importable as the entry point of the cycle (module -> queries
-> full import block -> back into partially-initialized modules).

This bit once: an import-time ``REGISTRY["ann_topk_cosine"]`` lookup in
annaudit.py crashed every worker that happened to unpickle a
similarity-module function, 38 queries into a driver run — the
registry was transiently incomplete because similarity itself was
mid-import further up the stack. Lazy oracle resolution fixed it; this
test pins the property for every registration module.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)

MODULES = [
    "functions.similarity",
    "functions.annaudit",
    "functions.ivf",
    "functions.dedup",
    "functions.quantize",
    "functions.phrase",
    "functions.corpus",
    "operators.quarantine",
]


@pytest.mark.parametrize("mod", MODULES)
def test_module_first_import(mod):
    code = (
        f"import ethereum_etl_airflow_spark.{mod}; "
        "import ethereum_etl_airflow_spark.queries as q; "
        "qs = q.get_queries(); os_ = q.get_oracles(); "
        "assert len(qs) >= 93 and len(os_) >= 93, (len(qs), len(os_)); "
        "assert all(isinstance(s, str) and s.strip() for s in os_.values())"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert r.returncode == 0, f"{mod} as entry point failed:\n{r.stderr[-2000:]}"
