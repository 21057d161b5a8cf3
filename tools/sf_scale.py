"""Deterministic N-times expansion of the driver testdata (VERDICT r04 #1:
sf1.0 evidence — every scale claim was extrapolated from sf0.1).

The driver's generators aren't in this repo, so sf1.0 is a seed-free,
purely-arithmetic expansion of the sf0.1 tables: each base row yields one
row per replica r in [0, R) with keys shifted by r * (a power-of-ten
stride above the base key range), preserving referential structure
(orders.custkey -> customer, lineitem.orderkey -> orders) and every value
distribution, while AVOIDING artificial cross-replica duplicate pathologies
that would change workload shape instead of size:

- documents: every token gets a ``~r`` suffix in replica r>0 — near-dup
  relations (3-gram shingles) are preserved exactly WITHIN a replica (the
  same rewrite applies to both docs of a pair) and destroyed ACROSS
  replicas (every shingle differs), so the minhash pair count scales ~R,
  not R^2 (10 identical copies of every doc would make every doc a
  10-member exact cluster — a different workload, not a bigger one).
- embeddings: replica r applies a deterministic per-coordinate sign-flip
  matrix (orthogonal: norms and within-replica inner products preserved
  exactly; cross-replica cosines ~ 0), so ANN and near-dup structure
  scales organically instead of planting cosine-±1.0 duplicates.
- orders/lineitem/customer: key shifts only; values (prices, dates, flags,
  injected violations) replicate as-is, so per-replica violation rates and
  duplicate-key multiplicities match the base table exactly.

Usage: python tools/sf_scale.py [--replicas 10] [--out /tmp/spark_graft_sf1.0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"

# key strides: a power of ten comfortably above each base table's key range
# (base sf0.1: orderkey < 600k, custkey < 150k, doc_id < 5k, vec_id < 2k,
# event_id < 100k) so replica key spaces never collide
O_STRIDE = 10_000_000
C_STRIDE = 1_000_000
D_STRIDE = 100_000
V_STRIDE = 100_000
E_STRIDE = 1_000_000


def _replicate(df: DataFrame, replicas: int) -> DataFrame:
    """Cross-join with the replica index (tiny broadcast side)."""
    r = F.broadcast(
        df.sparkSession.range(replicas).select(F.col("id").alias("_r")))
    return df.crossJoin(r)


def scale_tables(spark: SparkSession, out_dir: str, *, replicas: int = 10,
                 base_dir: str = BASE) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def t(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(base_dir, f"{name}.parquet"))

    def w(df: DataFrame, name: str, parts: int = 64) -> None:
        # repartition before write: the replicate crossJoin inherits the
        # BASE table's split count (sf0.1 files are single-split), so
        # without this every scaled table lands as ONE file with ONE row
        # group — and a parquet row group is the unit of scan parallelism,
        # so every downstream scan would run single-task regardless of
        # cluster size (review r05: the sf10 minhash probe spent minutes
        # in a 1-of-19-tasks straggler for exactly this reason)
        df.drop("_r").repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))

    cust = _replicate(t("customer"), replicas)
    w(cust.withColumn("c_custkey",
                      F.col("c_custkey") + F.col("_r") * C_STRIDE),
      "customer")

    orders = _replicate(t("orders"), replicas)
    w(orders
      .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_r") * O_STRIDE)
      .withColumn("o_custkey", F.col("o_custkey") + F.col("_r") * C_STRIDE),
      "orders")

    li = _replicate(t("lineitem"), replicas)
    w(li.withColumn("l_orderkey",
                    F.col("l_orderkey") + F.col("_r") * O_STRIDE),
      "lineitem")

    docs = _replicate(t("documents"), replicas)
    w(docs
      .withColumn("doc_id", F.col("doc_id") + F.col("_r") * D_STRIDE)
      .withColumn(
          "text",
          F.when(F.col("_r") == 0, F.col("text")).otherwise(
              F.regexp_replace(F.col("text"), r"(\S+)",
                               F.concat(F.lit("$1~"),
                                        F.col("_r").cast("string"))))),
      "documents")

    emb = _replicate(t("embeddings"), replicas)
    # per-(replica, coordinate) deterministic SIGN FLIPS: replica r applies
    # the diagonal ±1 matrix D_r with D_r[i] = sign(xxhash64(r, i)). An
    # orthogonal transform, so all norms and WITHIN-replica inner products
    # are preserved exactly (near-dup structure scales organically), while
    # cross-replica cosines of the same base vector are sums of ±v_i^2
    # with random signs ~ 0 for gaussian vectors. Unlike the earlier
    # rotation(+negation) scheme — where replica r >= dim reused replica
    # r-(dim-1)'s rotation negated, planting exact cosine = -1 antipodal
    # pairs (review r05) — sign patterns never repeat for distinct r
    # (a repeat needs a 64-way xxhash64 collision), so ANY replica count
    # is safe.
    signed = F.expr(
        "transform(embedding, (x, i) -> CASE WHEN "
        "pmod(xxhash64(_r, i), 2) = 0 THEN x ELSE -x END)")
    w(emb
      .withColumn("vec_id", F.col("vec_id") + F.col("_r") * V_STRIDE)
      .withColumn("embedding",
                  F.when(F.col("_r") == 0, F.col("embedding"))
                  .otherwise(signed.cast("array<float>"))),
      "embeddings")

    ev = _replicate(t("events"), replicas)
    w(ev.withColumn("event_id", F.col("event_id") + F.col("_r") * E_STRIDE),
      "events")

    # dimension tables replicate as-is (TPC-H keeps nations/regions fixed)
    for name in ("region", "nation", "supplier", "part"):
        w(t(name), name, parts=1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--replicas", type=int, default=10)
    p.add_argument("--out", default="/tmp/spark_graft_sf1.0")
    p.add_argument("--base", default=BASE)
    args = p.parse_args()
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("sf_scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    scale_tables(spark, args.out, replicas=args.replicas, base_dir=args.base)
    for name in ("lineitem", "orders", "customer", "documents",
                 "embeddings", "events"):
        n = spark.read.parquet(
            os.path.join(args.out, f"{name}.parquet")).count()
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
