"""The ship path is a checked property: `spark-submit --py-files
dist/json_skema_spark.zip` from a scratch cwd must run the constraint probe
with the engine resolved ONLY through the zip (north rule: "run via
spark-submit --py-files on a multi-executor cluster"). A packaging
regression — module missing from the zip, repo-relative import, data file
outside the package — fails here even when every in-process test is green.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which(os.environ.get("SPARK_SUBMIT", "spark-submit"))


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submit_probe_runs_from_zip_only(spark, tmp_path):
    from json_skema_spark import compile_schema
    from json_skema_spark.sources import clips as clips_src
    from json_skema_spark.sources.clips import CLIPS_CONSTRAINT_SCHEMA

    sys.path.insert(0, REPO)
    try:
        from tools.make_pyfiles import main as make_zip
        zip_path = make_zip()
    finally:
        sys.path.remove(REPO)

    cpath = str(tmp_path / "clips")
    clips_src.clips_df_fast(spark, 5000, inject=True,
                            partitions=4).write.parquet(cpath)
    # audio leg too: r05c caught the ship-path audio probe referencing a
    # column pcm_invariant_check no longer emits — CI stayed green because
    # this test omitted --audio, while every evidence run crashed
    apath = str(tmp_path / "audio")
    clips_src.clips_df(spark, 200, audio=True).write.parquet(apath)

    # expected verdict counts from the in-process engine on the same files
    df = spark.read.parquet(cpath)
    plan = compile_schema(CLIPS_CONSTRAINT_SCHEMA, df.schema)
    expected = {str(r["passed"]): r["count"]
                for r in plan.apply(df, mode="verdict")
                .groupBy("passed").count().collect()}

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    driver = scratch / "submit_probe.py"
    shutil.copyfile(os.path.join(REPO, "tools", "submit_probe.py"), driver)
    env = dict(os.environ, JSS_EXPECT_ZIP="1")
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         str(driver), "--clips", cpath, "--audio", apath, "--reps", "1"],
        cwd=scratch, env=env, capture_output=True, text=True, timeout=600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert out.returncode == 0 and lines, (
        f"spark-submit failed (rc={out.returncode}):\n{out.stderr[-3000:]}")
    r = json.loads(lines[-1])

    # the self-containment proof: the engine came from the zip, not the repo
    assert ".zip" in r["package_source"], r["package_source"]
    assert r["constraint"]["n"] == 5000
    assert r["constraint"]["verdict_counts"] == expected
    assert r["constraint"]["rows_per_s"] > 0
    assert r["audio"]["n"] == 200
    counts = r["audio"]["invariant_counts"]
    assert sum(counts.values()) > 0 and "True" in counts
