"""Round-6 optimization measurement harness (guide §1) — NOT the driver
contract; ``bench.py`` stays frozen. This file isolates each headline query
with the noop sink (times the computation, not the sink), records
``.count()`` timings with the same floor rule as ``bench.py``, and dumps
``.explain('formatted')`` for every query into ``plans/r06/``.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--tag after]
  [--queries name1,name2]  [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES, CPUS, SF_DIR, build_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-plans", action="store_true")
    ap.add_argument("--skip-probes", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from json_skema_spark import compile_schema
    from json_skema_spark.functions import audio
    from json_skema_spark.sources import clips as clips_src

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py: every Python worker up, codegen JIT'd
    spark.range(0, CPUS * 8, 1, CPUS * 4).selectExpr("sum(id)").collect()
    clips_src.clips_df(spark, CPUS * 16, audio=True, inject=True,
                       partitions=CPUS * 4).count()

    names = [q for q in args.queries.split(",") if q] or BENCH_QUERIES
    qs = entry.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    out: dict[str, dict] = {}

    for name in names:
        if name not in qs:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = qs[name](spark, SF_DIR)
        if not args.skip_plans:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        counts, noops = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            counts.append(round(time.perf_counter() - t0, 3))
        for _ in range(args.reps):
            d2 = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            noop(d2)
            noops.append(round(time.perf_counter() - t0, 3))
        out[name] = {"count": counts, "noop": noops,
                     "count_min": min(counts), "noop_min": min(noops)}
        print(f"{name}: count={counts} noop={noops}", flush=True)
        spark.sparkContext.setJobDescription(None)

    if not args.skip_probes:
        # clips constraint probe (identical shape to bench.py)
        CLIPS_N = int(os.environ.get("SPARK_GRAFT_CLIPS_N", "20000000"))
        AUDIO_N = int(os.environ.get("SPARK_GRAFT_AUDIO_N", "40000"))
        cpath = clips_src.ensure_clips_parquet(spark, CLIPS_N, audio=False)
        clips = spark.read.parquet(cpath)
        plan = compile_schema(clips_src.CLIPS_CONSTRAINT_SCHEMA, clips.schema)
        probe_df = plan.apply(clips, mode="verdict").groupBy("passed").count()
        if not args.skip_plans:
            with open(os.path.join(plans_dir,
                                   f"clips_constraint_eval_{args.tag}.txt"),
                      "w") as f:
                f.write(probe_df._sc._jvm.PythonSQLUtils.explainString(
                    probe_df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription("bench_extra:clips_constraint_eval")
        reps = []
        for _ in range(args.reps + 1):  # first is warm-up
            t0 = time.perf_counter()
            plan.apply(clips, mode="verdict").groupBy("passed").count().collect()
            reps.append(round(time.perf_counter() - t0, 3))
        out["clips_constraint_eval"] = {"reps": reps, "min": min(reps[1:])}
        print(f"clips_constraint_eval: {reps}", flush=True)

        apath = clips_src.ensure_clips_parquet(spark, AUDIO_N, audio=True)
        aclips = spark.read.parquet(apath)
        snr_df = audio.pcm_invariant_check(aclips).groupBy(
            "invariant_ok").count()
        if not args.skip_plans:
            with open(os.path.join(plans_dir,
                                   f"clips_audio_snr_{args.tag}.txt"),
                      "w") as f:
                f.write(snr_df._sc._jvm.PythonSQLUtils.explainString(
                    snr_df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription("bench_extra:clips_audio_snr")
        reps = []
        for _ in range(args.reps + 1):
            t0 = time.perf_counter()
            audio.pcm_invariant_check(aclips).groupBy(
                "invariant_ok").count().collect()
            reps.append(round(time.perf_counter() - t0, 3))
        out["clips_audio_snr"] = {"reps": reps, "min": min(reps[1:])}
        print(f"clips_audio_snr: {reps}", flush=True)

    fname = f"/tmp/bench_extra_{args.tag}.json"
    with open(fname, "w") as f:
        json.dump({"sf": SF_DIR, "cpus": CPUS, "results": out}, f, indent=1)
    print(json.dumps({k: v.get("count_min", v.get("min"))
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
