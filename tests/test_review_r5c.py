"""Regressions for the round-5 session-3 review pass (review r05c):
streaming drift anchor/naming/guards, dedup-stream column collision,
zero-row annotation counts, and the lazy full-message compile."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from json_skema_spark.operators.stats import profile
from json_skema_spark.streaming.drift_stream import (baseline_map,
                                                     windowed_drift)


def _drain(out, ckpt):
    got = []
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: got.extend(b.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return got


def test_nullable_high_cardinality_column_does_not_alarm(spark, tmp_path):
    """distinct-ratio anchor must use the NON-NULL count: a healthy
    nullable id column (60% null, one distinct value per non-null row)
    previously alarmed forever because the anchor was total window rows
    (review r05c finding 1)."""
    base_df = spark.createDataFrame(
        [(datetime(2026, 1, 1), None if i % 5 < 3 else f"id{i}")
         for i in range(1000)], "ts timestamp, uid string")
    baseline = baseline_map(profile(base_df, ["uid"]))
    assert baseline["uid"]["approx_distinct"] > 300

    src = str(tmp_path / "in")
    rows = [(datetime(2026, 1, 1, 12, 0, s % 60),
             None if s % 5 < 3 else f"w{s}") for s in range(40)]
    rows.append((datetime(2026, 1, 1, 12, 5), "x"))
    spark.createDataFrame(rows, "ts timestamp, uid string").write.parquet(src)

    out = windowed_drift(
        spark.readStream.schema("ts timestamp, uid string").parquet(src),
        baseline, "ts", window="1 minute", watermark="1 minute")
    w0 = {r.column_name: r for r in _drain(out, str(tmp_path / "ck"))
          if r.window_start.minute == 0}
    # 16 distinct non-null uids over 16 non-null rows: ratio ~1.0. The old
    # anchor min(400, 40 rows) gave 0.4 < 0.5 -> permanent false alarm.
    assert w0["uid"].distinct_ratio > 0.8
    assert not w0["uid"].distinct_drift
    assert not w0["uid"].null_drift  # same 60% null fraction as baseline


def test_windowed_drift_dotted_column_name(spark, tmp_path):
    """profile() supports a top-level column literally named 'a.b'
    (quoted_col); the streaming monitor must too (review r05c finding 2)."""
    src = str(tmp_path / "in")
    rows = [(datetime(2026, 1, 1, 12, 0, s), float(s)) for s in range(20)]
    rows.append((datetime(2026, 1, 1, 12, 5), 1.0))
    df = spark.createDataFrame(rows, "ts timestamp, v double") \
        .withColumnRenamed("v", "a.b")
    df.write.parquet(src)
    baseline = baseline_map(profile(df, ["a.b"]))

    stream = (spark.readStream.schema(df.schema).parquet(src))
    out = windowed_drift(stream, baseline, "ts",
                         window="1 minute", watermark="1 minute")
    w0 = {r.column_name: r for r in _drain(out, str(tmp_path / "ck"))
          if r.window_start.minute == 0}
    assert not w0["a.b"].distinct_drift and not w0["a.b"].null_drift


def test_baseline_map_refuses_per_partition_parts(spark):
    """Duplicate column_name rows (per-partition profile parts) must raise,
    not silently keep one arbitrary partition (review r05c finding 4)."""
    parts = spark.createDataFrame(
        [("v", 0.0, 10), ("v", 0.5, 3)],
        "column_name string, null_fraction double, approx_distinct long")
    with pytest.raises(ValueError, match="duplicate column 'v'"):
        baseline_map(parts)


def test_windowed_drift_empty_baseline_raises(spark):
    """An empty baseline previously crashed at stream start with an obscure
    star-expansion AnalysisException (review r05c finding 5)."""
    df = spark.createDataFrame([(datetime(2026, 1, 1), 1.0)],
                               "ts timestamp, v double")
    with pytest.raises(ValueError, match="empty baseline"):
        windowed_drift(df, {}, "ts")


def test_exact_dedup_stream_survives_user_digest_column(spark, tmp_path):
    """An input column literally named '_digest' (batch-dedup output
    re-ingested) previously broke the unionByName (review r05c finding 3)."""
    from json_skema_spark.streaming.dedup_stream import exact_dedup_stream
    src = str(tmp_path / "in")
    rows = [
        (datetime(2026, 1, 1, 12, 0, 0), "dup text", "keep0"),
        (datetime(2026, 1, 1, 12, 0, 1), "dup text", "keep1"),
        (datetime(2026, 1, 1, 12, 0, 2), None, "keepnull"),
        (datetime(2026, 1, 1, 12, 0, 3), "other", "keep3"),
    ]
    spark.createDataFrame(rows, "ts timestamp, text string, _digest string") \
        .write.parquet(src)
    out = exact_dedup_stream(
        spark.readStream.schema("ts timestamp, text string, _digest string")
        .parquet(src), "text", "ts")
    got = _drain(out, str(tmp_path / "ck"))
    # one of the two dups dropped; the USER's _digest values pass through
    assert len(got) == 3
    digests = {r["_digest"] for r in got}
    assert "keepnull" in digests and "keep3" in digests
    assert digests & {"keep0", "keep1"}


def test_deprecated_usage_zero_row_table_counts_zero(spark):
    """F.sum over zero rows is NULL; the report must say 0 present / 0.0
    fraction — the 'safe to delete' answer (review r05c finding 6)."""
    from json_skema_spark.operators.annotations import deprecated_usage
    df = spark.createDataFrame([], "a string, b double")
    doc = {"properties": {"a": {"deprecated": True},
                          "b": {"type": "number"}}}
    rows = deprecated_usage(df, doc).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_present"] == 0 and r["n_rows"] == 0
    assert r["frac_present"] == 0.0


def test_violation_rate_compiles_once(spark, monkeypatch):
    """violation_rate reads only the light plan; the full-message compile
    must not run at all (review r05c finding 7)."""
    from json_skema_spark.plans import compile as compile_mod
    from json_skema_spark.streaming.validate_stream import violation_rate

    calls = []
    orig = compile_mod.Compiler.compile_root

    def counting(self, struct_type):
        calls.append(1)
        return orig(self, struct_type)

    monkeypatch.setattr(compile_mod.Compiler, "compile_root", counting)
    df = spark.createDataFrame([(datetime(2026, 1, 1), 1.0)],
                               "ts timestamp, v double")
    rate = violation_rate(df, {"properties": {"v": {"minimum": 2}}}, "ts")
    assert len(calls) == 1  # light only — full plan never built
    assert "n_violations" in rate.columns


def test_compile_schema_still_fails_at_construction(spark):
    """The batch entry keeps fail-before-side-effects: a schema mistake
    raises from compile_schema itself, not at first column use — the
    runner builds manifests/output dirs right after (review r05c)."""
    from pyspark.sql import types as T

    from json_skema_spark.plans.compile import CompileError, compile_schema
    st = T.StructType([T.StructField("a", T.StringType())])
    with pytest.raises(CompileError):
        compile_schema({"properties": {"a": 5}}, st)


def test_deprecated_usage_dotted_column_still_counts(spark):
    """The quoted_col migration (review r05c finding 8) keeps the r04
    dotted-name behavior."""
    from json_skema_spark.operators.annotations import deprecated_usage
    df = spark.createDataFrame([("x",), (None,)], ["v"]) \
        .withColumnRenamed("v", "a.b")
    doc = {"properties": {"a.b": {"deprecated": True}}}
    r = deprecated_usage(df, doc).collect()[0]
    assert r["n_present"] == 1 and r["n_rows"] == 2
    assert r["frac_present"] == 0.5
