"""sf1.0 evidence run (VERDICT r04 #1): the headline suite plus the
shuffle-heavy family at 10x data, recording per-query wall time, output
rows, per-query SHUFFLE VOLUME (read/write bytes from the Spark REST API,
attributed by stage-id delta), and PLAN SHAPE (physical Exchange count at
sf0.1 vs sf1.0 — a query whose plan grows new exchanges at scale failed
the design review, whatever its wall time).

Usage:
  python tools/sf_scale.py                  # generate /tmp/spark_graft_sf1.0
  python tools/sf1_evidence.py [--reps 2]   # prints one JSON line

The output lands in BENCH/sf1_evidence_r05.json (driver commits it) and is
summarized in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1.0")

HEADLINE = [
    "validate_orders_verdict",
    "validate_orders_violations",
    "validate_lineitem_verdict",
    "lineitem_violation_summary",
    "unique_duplicate_orderkeys",
    "referential_customers_without_orders",
    "profile_lineitem",
    "dedup_exact_documents",
    "dedup_minhash_pairs",
    "text_token_stats",
    "text_lang_id",
    "similarity_topk_embeddings",
    "window_canonical_order",
    "agg_pricing_summary",
]
SHUFFLE_HEAVY = ["dedup_minhash_clusters", "pack_chunk_assignments"]


def _rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def _app_id(spark) -> str:
    return spark.sparkContext.applicationId


def _stage_metrics(spark, app_id: str) -> dict[int, tuple[int, int]]:
    out = {}
    for st in _rest(spark, f"applications/{app_id}/stages?status=complete"):
        sid = st["stageId"]
        prev = out.get(sid, (0, 0))
        out[sid] = (max(prev[0], st.get("shuffleReadBytes", 0)),
                    max(prev[1], st.get("shuffleWriteBytes", 0)))
    return out


def _exchange_count(df) -> int:
    jq = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    return len(re.findall(r"\bExchange\b", jq.explainString(mode)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = p.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("sf1_evidence")
             .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.files.maxPartitionBytes", "33554432")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "48g"))
             .config("spark.ui.enabled", "true")  # REST metrics source
             .config("spark.ui.retainedStages", "5000")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    app = _app_id(spark)
    queries = entry.queries()
    names = HEADLINE + SHUFFLE_HEAVY

    # warm-up: page cache + python workers
    spark.range(0, args.cpus * 8, 1, args.cpus * 2).selectExpr(
        "sum(id)").collect()

    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        # plan shape at both scales, BEFORE execution (pure compile)
        x01 = _exchange_count(fn(spark, SF01))
        x1 = _exchange_count(fn(spark, SF1))

        walls = []
        rows = None
        before = _stage_metrics(spark, app)
        for _ in range(args.reps):
            t0 = time.time()
            rows = fn(spark, SF1).count()
            walls.append(round(time.time() - t0, 3))
        after = _stage_metrics(spark, app)
        new_stages = {sid: m for sid, m in after.items() if sid not in before}
        sh_read = sum(m[0] for m in new_stages.values())
        sh_write = sum(m[1] for m in new_stages.values())
        results[name] = {
            "wall_s": min(walls), "walls": walls, "rows": rows,
            "shuffle_read_mb": round(sh_read / 1e6 / args.reps, 2),
            "shuffle_write_mb": round(sh_write / 1e6 / args.reps, 2),
            "exchanges_sf01": x01, "exchanges_sf1": x1,
            "plan_shape_stable": x01 == x1,
        }
        print(f"  {name}: {min(walls)}s rows={rows} "
              f"shW={results[name]['shuffle_write_mb']}MB "
              f"x={x01}->{x1}", file=sys.stderr)

    print(json.dumps({
        "sf": 1.0, "base_sf": 0.1, "cpus": args.cpus, "reps": args.reps,
        "queries": results,
        "all_plans_stable": all(r["plan_shape_stable"]
                                for r in results.values()),
    }))


if __name__ == "__main__":
    main()
