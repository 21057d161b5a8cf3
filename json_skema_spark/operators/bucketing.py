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


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With both
    sides bucketed, the planner emits SortMergeJoin with no Exchange
    (verify with ``.explain``; tests pin this plan shape)."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=key, how=how)
