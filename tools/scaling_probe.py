"""One parallelism level of the north-rule scaling probe (fresh JVM).

Runs ONLY the two throughput probes (constraint-eval over the shared clips
parquet; audio decode+SNR over the shared audio parquet) with per-run
/proc/stat steal accounting: this box is a VM with intermittent
noisy-neighbor interference (observed: identical probe runs ranging
2.9s..67s), so each timed run records its CPU-steal percentage for the
report; the reported figure is the floor-stability MINIMUM over all runs
(rerun until the two best agree within tolerance — see timed_floor).

Prints one JSON line:
  {"cpus": N, "constraint": {"best_s":..., "rows_per_s":..., "runs": [[s, steal_pct]...]},
   "audio": {...}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
CLIPS_N = int(os.environ.get("SPARK_GRAFT_CLIPS_N", "20000000"))
AUDIO_N = int(os.environ.get("SPARK_GRAFT_AUDIO_N", "40000"))
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "5"))

# ONE workload definition shared with bench.py (review r05c: was a
# verbatim copy that could silently desynchronize the scaling evidence
# from the headline metric)
from json_skema_spark.sources.clips import CLIPS_CONSTRAINT_SCHEMA as SCHEMA


# timing helpers shared with tools/submit_probe.py via the package
from json_skema_spark.timing import timed_floor  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from json_skema_spark import compile_schema
    from json_skema_spark.functions import audio
    from json_skema_spark.sources import clips as clips_src

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scaling_probe")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cpath = clips_src.ensure_clips_parquet(spark, CLIPS_N, audio=False)
    clips = spark.read.parquet(cpath)
    plan = compile_schema(SCHEMA, clips.schema)

    def probe():
        plan.apply(clips, mode="verdict").groupBy("passed").count().collect()

    probe()  # warm-up (page cache, codegen JIT)
    c_best, c_runs, c_settled = timed_floor(probe, min_reps=min(REPS, 3),
                                        max_reps=REPS + 4)

    apath = clips_src.ensure_clips_parquet(spark, AUDIO_N, audio=True)
    aclips = spark.read.parquet(apath)

    def aprobe():
        audio.pcm_invariant_check(aclips).groupBy("invariant_ok").count().collect()

    aprobe()  # warm-up (spins up Python workers)
    a_best, a_runs, a_settled = timed_floor(aprobe, min_reps=2,
                                        max_reps=REPS + 2)

    # transfer-only floor: the identical scan + Arrow ship of the bytes
    # column into a NO-OP mapInPandas — the cost any Python-side decode
    # check pays before one instruction of engine code runs. Recording it
    # per level lets the artifact separate ENGINE scaling
    # (audio - transfer) from the single-box memory-bus scaling the
    # transfer term measures (BENCH/BASELINE.md round-5 addendum: after
    # the 5.8x check speedup, transfer is 68-79% of the audio wall).
    import pandas as _pd

    def _noop(batches):
        for pdf in batches:
            yield _pd.DataFrame({"n": [int(sum(
                len(b) if b is not None else 0 for b in pdf["bytes"]))]})

    sel = aclips.select("clip_id", "codec", "bytes", "sr_hz", "dur_ms",
                        "transcript")

    def tprobe():
        sel.mapInPandas(_noop, "n long").groupBy().sum("n").collect()

    tprobe()
    t_best, t_runs, t_settled = timed_floor(tprobe, min_reps=2,
                                        max_reps=REPS + 2)
    # the decomposition is a SUBTRACTION of two independently-measured
    # floors, so it is only meaningful when BOTH legs actually found
    # their floor (settled) and the ordering makes sense. One-sided
    # checks fabricate numbers in the opposite stomp direction too: an
    # interference-stomped AUDIO leg with a clean transfer leg would
    # report an inflated check_s as valid (review r05c), just as a
    # stomped transfer leg used to clamp it near zero (review r05).
    valid = a_settled and t_settled and a_best > t_best
    check_s = a_best - t_best if valid else None
    invalid_reason = (
        None if valid else
        "audio leg never settled (max_reps exhausted without two-best "
        "agreement)" if not a_settled else
        "transfer leg never settled" if not t_settled else
        "transfer floor exceeds audio floor — interference-stomped leg")

    print(json.dumps({
        "cpus": CPUS,
        "constraint": {"best_s": round(c_best, 3),
                       "rows_per_s": round(CLIPS_N / c_best, 1),
                       "runs": [[round(s, 3), st] for s, st in c_runs]},
        "audio": {"best_s": round(a_best, 3),
                  "rows_per_s": round(AUDIO_N / a_best, 1),
                  "runs": [[round(s, 3), st] for s, st in a_runs]},
        "transfer": {"best_s": round(t_best, 3),
                     "runs": [[round(s, 3), st] for s, st in t_runs]},
        "settled": {"constraint": c_settled, "audio": a_settled,
                    "transfer": t_settled},
        "audio_check_only": (
            {"best_s": round(check_s, 3),
             "rows_per_s": round(AUDIO_N / check_s, 1), "valid": True}
            if valid else
            {"best_s": None, "rows_per_s": None, "valid": False,
             "reason": invalid_reason}),
    }))


if __name__ == "__main__":
    main()
