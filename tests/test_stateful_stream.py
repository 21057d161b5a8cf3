"""applyInPandasWithState running-tally operator: state persists across
micro-batches."""

import time

from json_skema_spark.streaming.stateful import running_violation_tally


def test_running_tally_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema_ddl = "key string, sr_hz int"
    doc = {"properties": {"sr_hz": {"enum": [8000, 16000]}}}

    # batch 1: key a -> 1 bad of 2; key b -> 1 good
    spark.createDataFrame(
        [("a", 8000), ("a", 99), ("b", 16000)], schema_ddl) \
        .write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema_ddl).parquet(src)
    out = running_violation_tally(stream, doc, "key")
    results = {}

    def sink(bdf, _id):
        for r in bdf.collect():
            results[r.key] = (r.rows_seen, r.rows_failed)

    q = (out.writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert results == {"a": (2, 1), "b": (1, 0)}

    # batch 2 (new file): state must accumulate, not reset
    spark.createDataFrame([("a", 99)], schema_ddl) \
        .write.mode("append").parquet(src)
    q2 = (running_violation_tally(
        spark.readStream.schema(schema_ddl).parquet(src), doc, "key")
        .writeStream.outputMode("update").foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert results["a"] == (3, 2)


def test_stream_dedup_passes_null_text_through(spark, tmp_path):
    """Null-text rows bypass streaming dedup instead of being dropped as
    'duplicates' of each other."""
    import datetime as dt

    from json_skema_spark.streaming.dedup_stream import exact_dedup_stream

    src = str(tmp_path / "in")
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, None), (2, t0, None), (3, t0, "x"), (4, t0, "x")]
    df = spark.createDataFrame(rows, "doc_id int, ts timestamp, text string")
    df.coalesce(1).write.parquet(src)
    got = []
    q = (exact_dedup_stream(
            spark.readStream.schema(df.schema).parquet(src), "text", "ts")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: got.extend(b.collect()))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    ids = sorted(r.doc_id for r in got)
    assert 1 in ids and 2 in ids          # both null-text rows survive
    assert len([i for i in ids if i in (3, 4)]) == 1  # dup text collapsed


def test_running_tally_integer_key(spark, tmp_path):
    """Review regression: a non-string key column (int shard ids) must not
    kill the query at Arrow conversion — it is cast to the declared
    string key."""
    src = str(tmp_path / "iin")
    spark.createDataFrame([(7, 8000), (7, 99)], "shard int, sr_hz int") \
        .write.parquet(src)
    out = running_violation_tally(
        spark.readStream.schema("shard int, sr_hz int").parquet(src),
        {"properties": {"sr_hz": {"enum": [8000]}}}, "shard")
    res = {}
    q = (out.writeStream.outputMode("update")
         .foreachBatch(lambda b, _i: res.update(
             {r.key: (r.rows_seen, r.rows_failed) for r in b.collect()}))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert res == {"7": (2, 1)}
