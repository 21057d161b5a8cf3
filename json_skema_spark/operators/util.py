"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input is under-partitioned for CPU-heavy work.

    A small parquet file arrives as one split; shingling/hashing 5k docs on
    one core wastes the other 31. The round-robin shuffle this introduces is
    tiny (it only ever fires when the input is small: at 100 TB the source
    has thousands of splits and this is a no-op).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
