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


def test_get_field_exotic_property_names(spark):
    """Spark variant bracket paths have NO escape sequences: an escaped
    quote raised INVALID_VARIANT_GET_PATH (job death for a legal schema)
    and an escaped backslash looked up the wrong key (property silently
    absent). Pin the quote-style selection end-to-end through a compiled
    open-JSON schema."""
    import json

    from pyspark.sql import types as T
    from json_skema_spark.plans.compile import Compiler
    from json_skema_spark.plans import variant as V

    keys = ["a'b", 'a"b', "a\\b", "a'\"b"]
    doc = json.dumps({k: 5 for k in keys})
    df = spark.createDataFrame([(doc,)], "j string")
    schema = {"type": "object",
              "properties": {k: {"minimum": 3} for k in keys},
              "required": keys}
    comp = Compiler(schema)
    c = comp.compile_value(F.parse_json(F.col("j")), T.VariantType())
    rows = df.select(c.passed.alias("p")).collect()
    assert rows[0]["p"] is True
    # a failing value is SEEN (not silently absent) for the backslash key
    bad = spark.createDataFrame([(json.dumps({k: 1 for k in keys}),)],
                                "j string")
    c2 = Compiler({"type": "object",
                   "properties": {"a\\b": {"minimum": 3}}}).compile_value(
        F.parse_json(F.col("j")), T.VariantType())
    assert bad.select(c2.passed.alias("p")).collect()[0]["p"] is False
    # both quotes + a dot is unrepresentable: loud compile-time error
    with pytest.raises(Exception, match="variant extraction path"):
        df.select(V.get_field(F.parse_json(F.col("j")), "a'\".b")).collect()


def test_windowed_drift_all_null_baseline_no_false_alarm(spark):
    """approx_distinct==0 on both sides (all-null column in baseline AND
    window) is an identical distribution — the batch drift_report guard
    (review r04) must be mirrored in the streaming twin."""
    from json_skema_spark.streaming.drift_stream import windowed_drift

    rows = [(None, f"2024-01-01 00:00:{i:02d}") for i in range(10)]
    df = (spark.createDataFrame(rows, "x string, ts string")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    baseline = {"x": {"null_fraction": 1.0, "approx_distinct": 0}}
    out = windowed_drift(df, baseline, "ts", window="1 hour").collect()
    assert len(out) == 1
    assert out[0]["distinct_drift"] is False
    assert out[0]["null_drift"] is False
    assert out[0]["distinct_ratio"] == 1.0


def test_contamination_probes_normalized_to_shingle_form(spark):
    """Case-mismatched probes must match (shingles lowercase the text) and
    a double-spaced probe must word-count AFTER collapsing — both used to
    make the gate silently inert."""
    from json_skema_spark.operators.contamination import (
        contamination_flags, decontaminate)

    df = spark.createDataFrame(
        [("d1", "contains the quick fox indeed"), ("d2", "clean text here")],
        "id string, text string")
    out = {r["id"]: r["contaminated"] for r in contamination_flags(
        df, "text", "id", ["The  Quick   Fox"], n=3).collect()}
    assert out == {"d1": True, "d2": False}
    kept = [r["id"] for r in decontaminate(
        df, "text", "id", ["The Quick Fox"], n=3).collect()]
    assert kept == ["d2"]
    # 2 real words hiding behind a double space: still raises for n=3
    with pytest.raises(ValueError, match="2 words"):
        contamination_flags(df, "text", "id", ["the  fox"], n=3)
