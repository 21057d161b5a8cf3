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

from bench import BENCH_QUERIES as HEADLINE  # single source of truth

SHUFFLE_HEAVY = ["dedup_minhash_clusters", "pack_chunk_assignments",
                 # VERDICT r05 #7: the variant/open-JSON path (heaviest
                 # per-row compile output — kind dispatch + coverage
                 # algebra) joins the scale-evidence set
                 "validate_events_open_json", "validate_events_unevaluated"]

# queries that MATERIALIZE during DataFrame construction (iterative
# localCheckpoint loops): building them just to read the explain would
# execute a full run, and the residual post-checkpoint plan's Exchange
# count is trivially 0 at any scale — record their plan shape as
# not-capturable instead of vacuously "stable" (review r05); their scale
# evidence is the measured wall + shuffle bytes
EAGER = {"dedup_minhash_clusters"}


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
    """Count physical shuffle Exchange NODES. Formatted explain prints
    each operator twice — once in the tree ("+- Exchange (5)") and once
    as a detail header ("(5) Exchange") — so a bare token count reported
    ~2x the real number (review r05c); collecting the operator IDs from
    both forms and deduplicating counts nodes, not mentions."""
    jq = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    txt = jq.explainString(mode)
    ids = set(re.findall(r"\bExchange \((\d+)\)", txt))
    ids |= set(re.findall(r"\((\d+)\) Exchange\b", txt))
    return len(ids)


def _settled_stage_metrics(spark, app_id: str) -> dict[int, tuple[int, int]]:
    """Stage metrics once the async status store has caught up: the REST
    snapshot taken immediately after count() returns can miss the last
    stages (their completion events still queued on the listener bus),
    silently dropping their shuffle bytes from the delta (review r05c).
    Poll until two reads agree on the completed-stage set."""
    prev = _stage_metrics(spark, app_id)
    for _ in range(10):
        time.sleep(0.3)
        cur = _stage_metrics(spark, app_id)
        if set(cur) == set(prev):
            return cur
        prev = cur
    return prev


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--only", help="comma list restricting the query set "
                   "(e.g. the shuffle-heavy family for a 100x spot run)")
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
    if args.only:
        only = [q.strip() for q in args.only.split(",")]
        unknown = set(only) - set(names)
        if unknown:
            raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
        names = only

    # warm-up. The JVM-side pass below spins NO Python workers, so a
    # pandas-UDF query timed first would absorb serialized worker
    # cold-start (~2s/worker) in its wall (review r05c) — spin them with
    # a no-op mapInPandas too, one task per core.
    spark.range(0, args.cpus * 8, 1, args.cpus * 2).selectExpr(
        "sum(id)").collect()

    def _noop(batches):
        yield from batches
    spark.range(0, args.cpus * 100, 1, args.cpus).mapInPandas(
        _noop, "id long").count()

    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        # plan shape at both scales, BEFORE execution (pure compile)
        if name in EAGER:
            x01 = x1 = None
        else:
            x01 = _exchange_count(fn(spark, SF01))
            x1 = _exchange_count(fn(spark, SF1))

        walls = []
        rows = None
        before = _settled_stage_metrics(spark, app)
        for _ in range(args.reps):
            t0 = time.time()
            rows = fn(spark, SF1).count()
            walls.append(round(time.time() - t0, 3))
        after = _settled_stage_metrics(spark, app)
        new_stages = {sid: m for sid, m in after.items() if sid not in before}
        sh_read = sum(m[0] for m in new_stages.values())
        sh_write = sum(m[1] for m in new_stages.values())
        results[name] = {
            "wall_s": min(walls), "walls": walls, "rows": rows,
            "shuffle_read_mb": round(sh_read / 1e6 / args.reps, 2),
            "shuffle_write_mb": round(sh_write / 1e6 / args.reps, 2),
            "exchanges_sf01": x01, "exchanges_sf1": x1,
            "plan_shape_stable": None if x01 is None else (x01 == x1),
        }
        print(f"  {name}: {min(walls)}s rows={rows} "
              f"shW={results[name]['shuffle_write_mb']}MB "
              f"x={x01}->{x1}", file=sys.stderr)

    # scale labels from the actual dirs — the tool also runs 100x (or any
    # replica count) via SPARK_GRAFT_SF1_DIR; a hardcoded "sf": 1.0 would
    # misstate the artifact's own scale (review r05)
    def _sf_label(d: str):
        m = re.search(r"sf([\d.]+)/?$", d)
        return float(m.group(1)) if m else None

    print(json.dumps({
        "sf": _sf_label(SF1), "sf_dir": SF1,
        "base_sf": _sf_label(SF01), "base_dir": SF01,
        "cpus": args.cpus, "reps": args.reps,
        "queries": results,
        # compared-only aggregate: a skipped capture (EAGER query) must
        # not vacuously satisfy the headline boolean (review r05c); the
        # count says how many plans the claim actually covers
        "all_compared_plans_stable": all(
            r["plan_shape_stable"] for r in results.values()
            if r["plan_shape_stable"] is not None),
        "plans_compared": sum(1 for r in results.values()
                              if r["plan_shape_stable"] is not None),
        "plan_capture_skipped": sorted(EAGER & set(names)),
    }))


if __name__ == "__main__":
    main()
