"""Pins the `stream_violation_windows` driver-gate query in-repo: the
multi-batch Structured Streaming drain must emit the SAME per-window
keyword counts as a plain batch pass of the identical compiled plan.

The driver's DuckDB oracle certifies cross-engine equality; this test
certifies the stream/batch equality within Spark (so a regression in the
streaming substrate — watermark plumbing, complete-mode state merge, the
staging layout — is caught by pytest without waiting for a driver run),
and that the drain is genuinely multi-batch.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as e
    return e


def _batch_replica(spark, sf_dir, schema):
    """The same windowed keyword counts computed as a BATCH query through
    the same compiled plan (violations explode), independently of any
    streaming machinery."""
    from json_skema_spark.plans.compile import compile_schema

    df = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
          .withColumn("ts", F.col("ts").cast("timestamp")))
    plan = compile_schema(schema, df.schema)
    # event_id is unique in the generated events table, so it serves as
    # the row key and the lineage join-back is exact
    viol = plan.violations(df, "event_id")
    joined = viol.join(df.select(F.col("event_id").alias("row_key"), "ts"),
                       "row_key")
    return (joined.filter(F.col("ts").isNotNull())
            .groupBy(F.window("ts", "1 day").alias("w"), "keyword")
            .agg(F.count("*").alias("n_violations"))
            .select(F.col("w.start").cast("long").alias("w_start"),
                    "keyword", "n_violations"))


def test_stream_matches_batch_on_events(spark, entry_mod):
    got = entry_mod._q_stream_violation_windows(spark, SF_DIR)
    want = _batch_replica(spark, SF_DIR, entry_mod.STREAM_EVENTS_SCHEMA)
    g = {(r.w_start, r.keyword): r.n_violations for r in got.collect()}
    w = {(r.w_start, r.keyword): r.n_violations for r in want.collect()}
    assert len(g) > 0
    assert g == w


def test_drain_is_multi_batch(spark, entry_mod, monkeypatch):
    """Force a single-file staging (collapse the _STREAM_STAGE_FILES
    knob) and the drain guard must actually raise — so a future refactor
    can't silently collapse the multi-batch claim while the docstring
    keeps asserting it."""
    monkeypatch.setattr(entry_mod, "_STREAM_STAGE_FILES", 1)
    with pytest.raises(RuntimeError, match="micro-batch"):
        entry_mod._q_stream_violation_windows(spark, SF_DIR)


def test_query_runs_real_streaming_path(spark, entry_mod, monkeypatch):
    import json_skema_spark.streaming.validate_stream as vs
    real = vs.violation_rate

    def spy(stream, schema, ts_col, **kw):
        spy.called = True
        assert stream.isStreaming
        return real(stream, schema, ts_col, **kw)
    spy.called = False
    monkeypatch.setattr(vs, "violation_rate", spy)
    entry_mod._q_stream_violation_windows(spark, SF_DIR)
    assert spy.called, "driver query must run the real streaming path"


def test_parity_is_timezone_pinned(spark, entry_mod):
    """The query must produce UTC-aligned windows (and restore the
    session timezone) even when the caller's session is non-UTC —
    review r05c reproduced a 51-vs-48-row gate mismatch under
    TZ=Asia/Kolkata before the pin."""
    before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        got = entry_mod._q_stream_violation_windows(spark, SF_DIR)
        g = {(r.w_start, r.keyword): r.n_violations for r in got.collect()}
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Kolkata"
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    want = _batch_replica(spark, SF_DIR, entry_mod.STREAM_EVENTS_SCHEMA)
    w = {(r.w_start, r.keyword): r.n_violations for r in want.collect()}
    assert g == w
