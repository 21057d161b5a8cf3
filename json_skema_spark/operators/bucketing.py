"""Bucketed-table support: co-located (shuffle-free) joins.

The referential checks in operators/referential.py shuffle both sides on
the join key unless one side broadcasts. For the recurring 100 TB case —
clips joined to a reference-transcripts table on ``clip_id`` every run —
the scale answer is to *pre-bucket both tables on the key*: Spark's bucketed
scan exposes the hash-partitioning to the planner, so a sort-merge join
runs with ZERO Exchange on either side, every run, forever. The write cost
is paid once; every subsequent join is shuffle-free.

This is the engine analogue of the reference's pre-registered schema map
(SchemaClient.kt:28-34): do the expensive resolution once, up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str, *,
                   buckets: int = 64, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by ``key``. Both sides of a recurring join must use the SAME bucket
    count for the co-located plan."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table_name)


def _bucket_spec(spark: SparkSession, table: str) -> tuple[int | None, str | None]:
    """(num_buckets, bucket_column) from the catalog, (None, None) when the
    table is not bucketed."""
    n, col = None, None
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        name = (row.col_name or "").strip()
        if name == "Num Buckets":
            try:
                n = int(row.data_type.strip())
            except (TypeError, ValueError):
                pass
        elif name == "Bucket Columns":
            col = row.data_type.strip().strip("[]` ")
    return n, col


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With both
    sides bucketed, the planner emits SortMergeJoin with no Exchange
    (verify with ``.explain``; tests pin this plan shape).

    The bucket specs are VALIDATED from the catalog first: a mismatched
    bucket count or key (e.g. one table later rewritten 128-way) would
    silently fall back to a full-shuffle join — the recurring 100 TB join
    paying the full cost every run with no signal (review r04)."""
    ln, lc = _bucket_spec(spark, left_table)
    rn, rc = _bucket_spec(spark, right_table)
    problems = []
    for t, n, c in ((left_table, ln, lc), (right_table, rn, rc)):
        if n is None:
            problems.append(f"{t} is not bucketed")
        elif c != key:
            problems.append(f"{t} is bucketed on {c!r}, not {key!r}")
    if not problems and ln != rn:
        problems.append(f"bucket counts differ: {left_table}={ln}, "
                        f"{right_table}={rn}")
    if problems:
        raise ValueError(
            "cobucketed_join would silently fall back to a full-shuffle "
            "join: " + "; ".join(problems) +
            " — rewrite with write_bucketed using the same key and count")
    return spark.table(left_table).join(spark.table(right_table),
                                        on=key, how=how)
