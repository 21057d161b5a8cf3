"""Regressions for the round-5 second review pass (least-revisited files:
render, suite loader, util, tdigest, validate_stream)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from json_skema_spark import compile_schema


def test_to_json_document_null_failures_renders_as_pass(spark):
    """A SQL-NULL failures array (left-outer join, writer nulling empty
    arrays) must render NULL, not the 'multiple validation failures'
    aggregate — size(NULL) is NULL and used to fall through both when()
    branches into otherwise(agg)."""
    from json_skema_spark.plans.render import to_json_document

    arr_t = ("array<struct<instance_location:string,keyword_location:string,"
             "dynamic_path:string,message:string,keyword:string>>")
    df = spark.createDataFrame([("r1",), ("r2",)], "k string").withColumn(
        "failures",
        F.when(F.col("k") == "r2", F.expr(
            "array(named_struct('instance_location','#','keyword_location',"
            "'#/type','dynamic_path','#','message','boom','keyword','type'))"
        )).otherwise(F.lit(None)).cast(arr_t))
    out = {r["row_key"]: r["failure_json"]
           for r in to_json_document(df, "k").collect()}
    assert out["r1"] is None
    assert json.loads(out["r2"])["keyword"] == "type"


def test_parse_bytes_tera_peta_and_unknown_suffix():
    from json_skema_spark.operators.util import _parse_bytes

    assert _parse_bytes("1t") == 1 << 40
    assert _parse_bytes("2tb") == 2 << 40
    assert _parse_bytes("1p") == 1 << 50
    assert _parse_bytes("3pb") == 3 << 50
    # unknown suffix = unparseable -> Spark default, NOT bytes ("1t" as
    # 1 byte made ensure_parallelism skip the repartition silently)
    assert _parse_bytes("7zz") == 128 << 20


def test_suite_format_dir_is_segment_matched(tmp_path):
    """'not-optional/format' must NOT be the format dir (substring match
    made it run with assertion ALWAYS); files under optional/format/sub/
    must load instead of being silently skipped."""
    from json_skema_spark.sources.suite import load_suite_groups

    group = [{"description": "g", "schema": True,
              "tests": [{"description": "t", "data": 1, "valid": True}]}]
    base = tmp_path / "draft2020-12"
    for rel in ("not-optional/format", "optional/format/sub"):
        d = base / rel
        d.mkdir(parents=True)
        (d / "date.json").write_text(json.dumps(group))

    groups = load_suite_groups(str(tmp_path))
    by_file = {g.file: g for g in groups}
    assert by_file["not-optional/format/date.json"].is_format is False
    assert "optional/format/sub/date.json" in by_file
    assert by_file["optional/format/sub/date.json"].is_format is True


def test_tdigest_raises_on_non_numeric_values(spark):
    """Silent errors='coerce' dropped unparseable values and returned
    plausible quantiles over an unannounced subset."""
    from json_skema_spark.operators.tdigest import tdigest_quantiles

    bad = spark.createDataFrame(
        [("1",), ("2",), ("oops",), (None,)], "x string")
    with pytest.raises(Exception, match="non-numeric|unparseable"):
        tdigest_quantiles(bad, "x", [0.5])
    # numeric-as-string with only nulls as gaps still works
    ok = spark.createDataFrame(
        [("1",), ("2",), ("3",), (None,)], "x string")
    (q,) = tdigest_quantiles(ok, "x", [0.5])
    assert q == pytest.approx(2.0)


DOC = {
    "type": "object",
    "properties": {
        "a": {"type": "integer", "minimum": 3},
        "b": {"enum": ["x", "y"]},
    },
    "required": ["a"],
}


def test_violation_rate_counts_match_full_plan_and_prefilters(spark):
    """violation_rate must count exactly what the full-message explode
    counts, while filtering on the boolean verdict before array
    construction (light-message recompile, same as summary())."""
    from json_skema_spark.streaming.validate_stream import violation_rate

    rows = [(i if i % 5 else None,
             "x" if i % 3 == 0 else ("y" if i % 3 == 1 else "z"),
             f"2024-01-01 00:{i % 60:02d}:00") for i in range(120)]
    df = (spark.createDataFrame(rows, "a int, b string, ts string")
          .withColumn("ts", F.col("ts").cast("timestamp")))

    got = {(r["keyword"], r["window_start"]): r["n_violations"]
           for r in violation_rate(df, DOC, "ts", window="1 hour").collect()}

    plan = compile_schema(DOC, df.schema)
    full = (df.withColumn("failures", plan.failures)
            .select(F.window("ts", "1 hour").alias("w"),
                    F.explode("failures").alias("f"))
            .groupBy(F.col("f.keyword"), F.col("w.start"))
            .count().collect())
    want = {(r["keyword"], r["start"]): r["count"] for r in full}
    assert got == want and got  # non-vacuous

    # structural: a verdict Filter sits in the plan (passing rows never
    # build failure arrays)
    opt = (violation_rate(df, DOC, "ts", window="1 hour")
           ._jdf.queryExecution().optimizedPlan().toString())
    assert "Filter" in opt
