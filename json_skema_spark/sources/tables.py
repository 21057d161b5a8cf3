"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Equivalent of the reference's instance sources (string / stream / URI,
JsonParser.kt:176-190) at table scale: ``spark.read.parquet`` with schema
known from the file footer; predicate pushdown + column pruning come free.
An Iceberg catalog is the production target (BASELINE.json), but the runtime
jars are absent in this sandbox, so the parquet path is the tested one; the
API takes a format parameter so an Iceberg table name drops in unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = ("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(f"{sf_dir}.{name}")
    raise ValueError(f"unknown format {fmt!r}")


def read_table(spark: SparkSession, path_or_name: str, *,
               format: str = "parquet") -> DataFrame:
    """Production input dispatch for ``runner.py --format``.

    - ``parquet``: ``path_or_name`` is a directory/file path.
    - ``iceberg``: ``path_or_name`` is a catalog table name
      (``catalog.db.table``). Requires the Iceberg runtime on the
      cluster: ``--packages org.apache.iceberg:iceberg-spark-runtime-...``
      plus ``spark.sql.catalog.<name>`` conf. Not testable in this
      sandbox (no jars) — the dispatch raises a targeted error instead
      of Spark's raw ClassNotFound.

    Iceberg + resume recipe: if the table is partitioned with a
    ``bucket(N, clip_id)`` transform, skip the staging pass entirely —
    pass the table's data directory as ``pre_staged_dir`` to
    ``checkpoint.run_resumable`` with ``num_buckets=N`` (the layout is
    already the ``_bucket=<id>`` shape staging would produce, modulo the
    partition dir name; see operators/checkpoint.py:17-20).
    """
    if format == "parquet":
        return spark.read.parquet(path_or_name)
    if format == "iceberg":
        try:
            return spark.read.format("iceberg").load(path_or_name)
        except Exception as e:
            # only the missing-runtime case is rewritten; a genuine error
            # (table not found, bad catalog, permission denied) from a
            # properly configured cluster propagates as-is — masking it as
            # "install the jars" would send the operator down the wrong
            # debugging path (review r04)
            msg = str(e)
            if ("ClassNotFound" in msg or "DATA_SOURCE_NOT_FOUND" in msg
                    or "Failed to find data source" in msg
                    or "Failed to find the data source" in msg):
                raise RuntimeError(
                    "format=iceberg requires the Iceberg runtime jars "
                    "(org.apache.iceberg:iceberg-spark-runtime) and a "
                    "spark.sql.catalog.<name> configuration on the "
                    f"cluster; loading {path_or_name!r} failed") from e
            raise
    raise ValueError(f"unknown format {format!r} (parquet|iceberg)")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
