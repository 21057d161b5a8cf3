"""Round-robin floor finder (r06): the sandbox suffers noisy-neighbor
stomps that are invisible to /proc/stat steal and can last minutes, so
single-burst reps routinely measure 3-30x above the real floor. This tool
runs the full headline suite + clips probes in interleaved CYCLES (each
query gets one rep per cycle), so every query gets shots at whatever quiet
windows occur, and reports the per-query floor (min across cycles) — the
same quantity bench.py's timed_floor hunts for, measured more robustly.

Usage: SPARK_GRAFT_SF_DIR=... python tools/floor_bench.py [cycles] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, CPUS, SF_DIR, build_spark  # noqa: E402


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/floor_bench.json"

    import __spark_entry__ as entry
    from json_skema_spark import compile_schema
    from json_skema_spark.functions import audio
    from json_skema_spark.sources import clips as clips_src

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, CPUS * 8, 1, CPUS * 4).selectExpr("sum(id)").collect()
    clips_src.clips_df(spark, CPUS * 16, audio=True, inject=True,
                       partitions=CPUS * 4).count()

    qs = entry.queries()
    cpath = clips_src.ensure_clips_parquet(
        spark, int(os.environ.get("SPARK_GRAFT_CLIPS_N", "20000000")),
        audio=False)
    apath = clips_src.ensure_clips_parquet(
        spark, int(os.environ.get("SPARK_GRAFT_AUDIO_N", "40000")), audio=True)
    clips = spark.read.parquet(cpath)
    aclips = spark.read.parquet(apath)
    plan = compile_schema(clips_src.CLIPS_CONSTRAINT_SCHEMA, clips.schema)

    def probe_constraint():
        plan.apply(clips, mode="verdict").groupBy("passed").count().collect()

    def probe_audio():
        audio.pcm_invariant_check(aclips).groupBy(
            "invariant_ok").count().collect()

    tasks = [(name, (lambda n=name: qs[n](spark, SF_DIR).count()))
             for name in BENCH_QUERIES]
    tasks += [("clips_constraint_eval", probe_constraint),
              ("clips_audio_snr", probe_audio)]

    samples: dict[str, list[float]] = {name: [] for name, _ in tasks}
    for c in range(cycles):
        for name, fn in tasks:
            spark.sparkContext.setJobDescription(f"floor:{name}:c{c}")
            t0 = time.perf_counter()
            fn()
            samples[name].append(round(time.perf_counter() - t0, 3))
        floors = {n: min(v) for n, v in samples.items()}
        with open(out_path, "w") as f:
            json.dump({"cycle": c + 1, "cycles": cycles, "sf": SF_DIR,
                       "floors": floors, "total_floor":
                       round(sum(floors.values()), 3),
                       "samples": samples}, f, indent=1)
        print(f"cycle {c+1}/{cycles}: total_floor="
              f"{round(sum(floors.values()), 3)}", flush=True)
    print(json.dumps({"floors": floors,
                      "total_floor": round(sum(floors.values()), 3)}))


if __name__ == "__main__":
    main()
