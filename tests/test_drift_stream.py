"""Streaming drift monitor (streaming/drift_stream.py): per-window column
profiles vs a literal baseline, watermarked append mode."""

from datetime import datetime

from json_skema_spark.operators.stats import profile
from json_skema_spark.streaming.drift_stream import (
    baseline_map, windowed_drift)

DDL = "ts timestamp, v double, tag string"


def _rows(minute, vals):
    return [(datetime(2026, 1, 1, 12, minute, s % 60), v, t)
            for s, (v, t) in enumerate(vals)]


def test_windowed_drift_flags_null_surge(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # baseline: no nulls, diverse values
    base_df = spark.createDataFrame(
        _rows(0, [(float(i), f"t{i}") for i in range(20)]), DDL)
    baseline = baseline_map(profile(base_df, ["v", "tag"]))
    assert baseline["v"]["null_fraction"] == 0.0

    # window 12:00 matches baseline; window 12:01 goes half-null and
    # constant — then a late 12:05 row advances the watermark past both
    healthy = _rows(0, [(float(i), f"t{i}") for i in range(20)])
    broken = _rows(1, [(None if i % 2 else 1.0, "same") for i in range(20)])
    flush = _rows(5, [(1.0, "x")])
    spark.createDataFrame(healthy + broken + flush, DDL) \
        .write.mode("overwrite").parquet(src)

    out = windowed_drift(
        spark.readStream.schema(DDL).parquet(src), baseline, "ts",
        window="1 minute", watermark="1 minute")
    assert set(out.columns) == {
        "window_start", "window_end", "column_name", "null_fraction",
        "null_delta", "null_drift", "approx_distinct", "distinct_ratio",
        "distinct_drift"}

    got = []
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _id: got.extend(bdf.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    by_key = {(r.window_start.minute, r.column_name): r for r in got
              if r.window_start.minute in (0, 1)}
    assert set(by_key) == {(0, "v"), (0, "tag"), (1, "v"), (1, "tag")}

    assert not by_key[(0, "v")].null_drift
    assert not by_key[(0, "tag")].distinct_drift

    r = by_key[(1, "v")]
    assert r.null_fraction == 0.5 and r.null_drift
    # tag collapsed to a single value: distinct ratio ~1/20
    assert by_key[(1, "tag")].distinct_drift


def test_distinct_ratio_scale_anchored_and_missing_column(spark, tmp_path):
    """A healthy window of a high-cardinality column must NOT fire
    distinct_drift just because the window holds fewer rows than the
    baseline table; a baseline column missing from the stream emits a
    drifted row."""
    base_df = spark.createDataFrame(
        [(datetime(2026, 1, 1), f"id{i}", float(i)) for i in range(400)],
        "ts timestamp, uid string, gone double")
    from json_skema_spark.operators.stats import profile
    baseline = baseline_map(profile(base_df, ["uid", "gone"]))
    assert baseline["uid"]["approx_distinct"] > 300

    src = str(tmp_path / "in")
    stream_rows = [(datetime(2026, 1, 1, 12, 0, s % 60), f"w{s}")
                   for s in range(40)] + [(datetime(2026, 1, 1, 12, 5), "x")]
    spark.createDataFrame(stream_rows, "ts timestamp, uid string") \
        .write.parquet(src)  # note: no 'gone' column
    out = windowed_drift(
        spark.readStream.schema("ts timestamp, uid string").parquet(src),
        baseline, "ts", window="1 minute", watermark="1 minute")
    got = []
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: got.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    w0 = {r.column_name: r for r in got if r.window_start.minute == 0}
    # 40 distinct uids in a 40-row window vs 400-distinct baseline:
    # anchored ratio ~1.0 -> healthy, NOT drifted
    assert not w0["uid"].distinct_drift
    assert w0["gone"].distinct_drift and w0["gone"].null_drift
