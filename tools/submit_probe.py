"""spark-submit driver for the north-rule throughput probe.

This file is the PRIMARY script of a real ``spark-submit --py-files
dist/json_skema_spark.zip`` invocation (north rule: "run via spark-submit
--py-files on a multi-executor cluster at two cluster sizes") — unlike
tools/scaling_probe.py it never touches the repo checkout: the orchestrator
(tools/submit_scaling.py) copies THIS file into a scratch cwd outside the
repo, so ``import json_skema_spark`` can only resolve through the shipped
zip (zipimport). With ``JSS_EXPECT_ZIP=1`` the driver hard-fails if the
package resolved from anywhere else, making zip self-containment a checked
property instead of an assumption.

Prints one JSON line:
  {"cpus": N, "package_source": ".../json_skema_spark.zip/...",
   "constraint": {"best_s":..., "rows_per_s":..., "n":..., "runs":[[s,steal]...],
                  "settled": bool, "verdict_counts": {...}},
   "audio": {... or null}}
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True,
                    help="pre-materialized constraint-probe parquet")
    ap.add_argument("--audio", default=None,
                    help="pre-materialized audio-probe parquet (optional)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import json_skema_spark
    pkg_src = getattr(json_skema_spark, "__file__", "") or ""
    if os.environ.get("JSS_EXPECT_ZIP") == "1" and ".zip" not in pkg_src:
        raise SystemExit(
            f"json_skema_spark resolved from {pkg_src!r}, not the --py-files "
            "zip — the self-containment proof is void; check cwd/PYTHONPATH")

    from pyspark.sql import SparkSession

    from json_skema_spark import compile_schema
    from json_skema_spark.functions import audio as jaudio
    from json_skema_spark.sources.clips import CLIPS_CONSTRAINT_SCHEMA
    # the SAME floor-stability rule as tools/scaling_probe.py, imported
    # from the package (arrives via the --py-files zip)
    from json_skema_spark.timing import timed_floor as _timed_floor

    # master / memory / shuffle partitions come from the spark-submit
    # command line — the driver must not override the cluster shape
    spark = SparkSession.builder.appName("jss_submit_probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    clips = spark.read.parquet(args.clips)
    n = clips.count()
    plan = compile_schema(CLIPS_CONSTRAINT_SCHEMA, clips.schema)

    verdict_counts: dict[str, int] = {}

    def probe():
        rows = (plan.apply(clips, mode="verdict")
                .groupBy("passed").count().collect())
        verdict_counts.clear()
        verdict_counts.update({str(r["passed"]): r["count"] for r in rows})

    probe()  # warm-up: page cache + codegen JIT
    c_best, c_runs, c_settled = _timed_floor(
        probe, min_reps=min(args.reps, 3), max_reps=args.reps + 4)
    result = {
        "cpus": cpus,
        "package_source": pkg_src,
        "constraint": {
            "n": n,
            "best_s": round(c_best, 3),
            "rows_per_s": round(n / c_best, 1),
            "runs": [[round(s, 3), st] for s, st in c_runs],
            "settled": c_settled,
            "verdict_counts": verdict_counts,
        },
        "audio": None,
    }

    if args.audio:
        aclips = spark.read.parquet(args.audio)
        an = aclips.count()
        invariant_counts: dict[str, int] = {}

        def aprobe():
            rows = (jaudio.pcm_invariant_check(aclips)
                    .groupBy("invariant_ok").count().collect())
            invariant_counts.clear()
            invariant_counts.update({str(r["invariant_ok"]): r["count"]
                                  for r in rows})

        aprobe()  # warm-up: Python workers
        a_best, a_runs, a_settled = _timed_floor(
            aprobe, min_reps=2, max_reps=args.reps + 2)
        result["audio"] = {
            "n": an,
            "best_s": round(a_best, 3),
            "rows_per_s": round(an / a_best, 1),
            "runs": [[round(s, 3), st] for s, st in a_runs],
            "settled": a_settled,
            "invariant_counts": invariant_counts,
        }

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
