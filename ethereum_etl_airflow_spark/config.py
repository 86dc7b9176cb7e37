"""Engine-wide constants.

NUM_BUCKETS mirrors the reference's hash-partition fan-out
(``build_partition_dag.py:112,119``: ``MOD(ABS(FARM_FINGERPRINT(key)),
3999)``) scaled to sandbox cores; at cluster scale this would be set
to >= 4x total executor cores (SURVEY §7.3).
"""

from __future__ import annotations

import os

# salted hash-bucket fan-out for the CDC target table
NUM_BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "128"))

# vocabulary size for synthetic token ids (int32 range)
VOCAB_SIZE = 50_000

# sources mirrored from testdata documents.source
SOURCES = ["web", "books", "code", "wiki"]
