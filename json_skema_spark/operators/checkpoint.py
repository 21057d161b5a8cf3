"""Checkpointed, partition-granular resume (north rule).

A validation run over a partitioned table writes results per *input
partition bucket* and records each completed bucket in a JSON manifest.
A killed run restarts, reads the manifest, and filters already-committed
buckets out of the scan — at 100 TB this is partition pruning on the
bucket column, so resumed work re-reads only incomplete buckets.

The reference has no persistence at all (in-memory, single document); the
semantic anchor is its collect-don't-fail-fast error handling
(SchemaLoader.kt:494,551-553): progress isn't discarded because one unit
failed. Manifests also carry per-bucket metrics (rows, violations, wall
seconds) — the north rule's "lineage + metrics intact".

File layout under ``manifest_dir`` (driver-side fs, tiny):
    manifest.json        {"completed": {"<bucket>": {metrics...}}, ...}
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PartitionManifest:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        self.path = os.path.join(manifest_dir, "manifest.json")
        os.makedirs(manifest_dir, exist_ok=True)
        self._state = {"completed": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._state = json.load(f)

    @property
    def completed(self) -> dict[str, dict]:
        return self._state["completed"]

    def is_done(self, bucket) -> bool:
        return str(bucket) in self._state["completed"]

    def mark_done(self, bucket, metrics: dict) -> None:
        self._state["completed"][str(bucket)] = metrics
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # atomic commit per bucket

    def metrics(self) -> dict[str, dict]:
        return dict(self._state["completed"])


def bucket_column(key_col, num_buckets: int):
    """Deterministic bucket id for a key column (hash-mod)."""
    return F.pmod(F.xxhash64(key_col), F.lit(num_buckets))


def run_resumable(df: DataFrame, key: str, num_buckets: int,
                  manifest: PartitionManifest,
                  process: Callable[[DataFrame, int], dict]) -> dict:
    """Process each hash bucket of ``df`` exactly once across restarts.

    ``process(bucket_df, bucket_id) -> metrics dict``; its side effects
    (sink writes) plus the manifest commit form the per-bucket transaction.
    Buckets are processed in order, each as its own Spark job; the bucket
    filter is a pushed-down predicate on the hash, so a resume never
    recomputes committed buckets.

    Returns the full metrics map (committed + newly processed).
    """
    b = bucket_column(F.col(key), num_buckets)
    tagged = df.withColumn("_bucket", b)
    for bucket in range(num_buckets):
        if manifest.is_done(bucket):
            continue
        t0 = time.time()
        bucket_df = tagged.filter(F.col("_bucket") == bucket).drop("_bucket")
        metrics = process(bucket_df, bucket) or {}
        metrics.setdefault("wall_s", round(time.time() - t0, 3))
        manifest.mark_done(bucket, metrics)
    return manifest.metrics()
