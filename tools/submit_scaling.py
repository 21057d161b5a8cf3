"""North-rule ship-path evidence: run the throughput probe through the REAL
``spark-submit --py-files dist/json_skema_spark.zip`` pipeline at two
parallelism levels (local[8] and local[32] — the sandbox analogue of N and
4N executors) on identical pre-materialized input, and report throughput at
both plus the scaling efficiency.

What this adds over tools/scaling_bench.py (in-process SparkSession): the
submitted driver runs from a scratch cwd OUTSIDE the repo with
JSS_EXPECT_ZIP=1, so the whole engine must load through the shipped zip via
zipimport — the exact deployment path BASELINE.json's north_star names
("ships via spark-submit --py-files to multi-executor clusters"). A packaging
regression (missing module, repo-relative import, data file outside the zip)
fails HERE even when every in-process test is green.

    python tools/submit_scaling.py                # full 20M-row evidence run
    SPARK_GRAFT_CLIPS_N=200000 python tools/submit_scaling.py   # quick pass

Writes BENCH/submit_scaling_r05.json. The BASELINE.md addendum table is
authored FROM that artifact by hand — after a rerun, reconcile the
addendum's numbers with the fresh JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# both N-vs-4N pairs, same rationale as tools/scaling_bench.py: 4->16
# leaves per-core memory-bus headroom (the single-box analogue of adding
# NODES, which bring their own bus); 8->32 saturates the shared bus, which
# a real 4N-node cluster would not
LEVELS = (4, 16, 8, 32)
PAIRS = ((4, 16), (8, 32))
CYCLES = int(os.environ.get("SPARK_GRAFT_SUBMIT_CYCLES", "2"))
CLIPS_N = int(os.environ.get("SPARK_GRAFT_CLIPS_N", "20000000"))
AUDIO_N = int(os.environ.get("SPARK_GRAFT_AUDIO_N", "40000"))
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "4"))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")


def build_zip() -> str:
    from tools.make_pyfiles import main as make_zip
    return make_zip()


def materialize_inputs() -> tuple[str, str]:
    """Write the shared probe parquet once with a short-lived in-process
    session; every submitted run at every level reads the SAME files."""
    from pyspark.sql import SparkSession

    from json_skema_spark.sources import clips as clips_src
    spark = (SparkSession.builder.master("local[32]")
             .appName("submit_scaling_materialize")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "48g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    cpath = clips_src.ensure_clips_parquet(spark, CLIPS_N, audio=False)
    apath = clips_src.ensure_clips_parquet(spark, AUDIO_N, audio=True)
    spark.stop()
    return cpath, apath


def run_submit(cpus: int, zip_path: str, cpath: str, apath: str,
               scratch: str) -> dict:
    probe_src = os.path.join(REPO, "tools", "submit_probe.py")
    driver = os.path.join(scratch, "submit_probe.py")
    shutil.copyfile(probe_src, driver)
    env = dict(os.environ, JSS_EXPECT_ZIP="1")
    # the scratch cwd must not reach the repo through the environment either
    env.pop("PYTHONPATH", None)
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cpus}]",
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "48g"),
        "--conf", f"spark.sql.shuffle.partitions={2 * cpus}",
        "--conf", "spark.sql.files.maxPartitionBytes=33554432",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        driver,
        "--clips", cpath, "--audio", apath, "--reps", str(REPS),
    ]
    out = subprocess.run(cmd, cwd=scratch, env=env, capture_output=True,
                         text=True, timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"spark-submit at local[{cpus}] failed (rc={out.returncode}):\n"
            + out.stderr[-3000:])
    return json.loads(lines[-1])


def pick_best(runs: list[dict], key: str) -> dict:
    with_key = [r[key] for r in runs if r.get(key)]
    return min(with_key, key=lambda p: p["best_s"])


def main() -> None:
    zip_path = build_zip()
    cpath, apath = materialize_inputs()
    all_runs: dict[int, list[dict]] = {c: [] for c in LEVELS}
    scratch = tempfile.mkdtemp(prefix="jss_submit_")
    try:
        for cycle in range(CYCLES):
            for cpus in LEVELS:  # interleaved: interference hits both levels
                r = run_submit(cpus, zip_path, cpath, apath, scratch)
                all_runs[cpus].append(r)
                print(f"cycle {cycle} local[{cpus}]: "
                      f"constraint {r['constraint']['best_s']}s "
                      f"({r['constraint']['rows_per_s']:.0f} rows/s), "
                      f"audio {r['audio']['best_s']}s, "
                      f"pkg={r['package_source'][:80]}", file=sys.stderr)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    report = {
        "ts": datetime.now(timezone.utc).isoformat(),
        "clips_n": CLIPS_N, "audio_n": AUDIO_N, "cycles": CYCLES,
        "levels": {}, "efficiency": {},
    }
    for cpus in LEVELS:
        report["levels"][str(cpus)] = {
            "constraint": pick_best(all_runs[cpus], "constraint"),
            "audio": pick_best(all_runs[cpus], "audio"),
            "package_source": all_runs[cpus][0]["package_source"],
            "n_runs": len(all_runs[cpus]),
        }
    for lo, hi in PAIRS:
        ratio = hi / lo
        for fam in ("constraint", "audio"):
            lo_p = report["levels"][str(lo)][fam]
            hi_p = report["levels"][str(hi)][fam]
            eff = hi_p["rows_per_s"] / (ratio * lo_p["rows_per_s"])
            report["efficiency"][f"{fam}_{lo}to{hi}"] = {
                "pair": f"local[{lo}]->local[{hi}]",
                "raw": round(eff, 3),
                # efficiency is only meaningful when BOTH legs found a floor
                "valid": bool(lo_p["settled"] and hi_p["settled"]),
            }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_json = os.path.join(REPO, "BENCH", "submit_scaling_r05.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    print(f"wrote {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
