"""Mergeable profiles (operators/stats.py): parts over disjoint slices
merge to the same answer as one pass over the whole table."""

import pytest
from pyspark.sql import functions as F

from json_skema_spark.operators import stats
from json_skema_spark.operators.drift import drift_report


def _table(spark):
    return spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise((F.col("id") % 97).cast("double")).alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 37).cast("string")).alias("tag"))


def test_merged_equals_single_pass(spark):
    df = _table(spark)
    parts = [stats.mergeable_profile(df.filter(F.col("id") % 4 == k))
             for k in range(4)]
    merged = stats.merge_profiles(parts[0].unionByName(parts[1])
                                  .unionByName(parts[2]).unionByName(parts[3]))
    one_pass = stats.profile(df)

    m = {r.column_name: r for r in merged.collect()}
    p = {r.column_name: r for r in one_pass.collect()}
    assert set(m) == set(p) == {"id", "v", "tag"}
    for c in p:
        assert m[c].n_rows == p[c].n_rows == 2000
        assert m[c].null_fraction == pytest.approx(p[c].null_fraction)
        assert float(m[c].min_value or "nan") == pytest.approx(
            float(p[c].min_value)) if c != "tag" else \
            m[c].min_value == p[c].min_value
        # HLL estimates: datasketches union vs HLL++ single-pass, both ~2%
        assert m[c].approx_distinct == pytest.approx(
            p[c].approx_distinct, rel=0.08)
        assert m[c].quantiles is None


def test_merge_handles_empty_slice(spark):
    df = _table(spark)
    full = stats.mergeable_profile(df)
    empty = stats.mergeable_profile(df.filter(F.lit(False)))
    merged = stats.merge_profiles(full.unionByName(empty))
    got = {r.column_name: r for r in merged.collect()}
    assert got["id"].n_rows == 2000
    assert got["v"].null_fraction == pytest.approx(0.1)


def test_merged_profile_feeds_drift(spark):
    df = _table(spark)
    baseline = stats.profile(df)
    cur_parts = stats.mergeable_profile(df.filter("v < 30 or v is null"))
    rep = drift_report(stats.merge_profiles(cur_parts), baseline)
    rows = {r.column_name: r for r in rep.collect()}
    assert rows["v"].distinct_drift  # distinct count roughly halved
    assert not rows["v"].quantile_drift  # merged profile has no quantiles


def test_runner_drift_uses_merged_bucket_profiles(spark, tmp_path):
    """validate_table's drift step merges the per-bucket profile parts it
    already wrote — no second scan of the input."""
    import os

    from json_skema_spark.runner import validate_table
    from json_skema_spark.sources import clips as clips_src

    clips = clips_src.clips_df(spark, 150, audio=False, inject=False)
    baseline = stats.profile(clips.select("clip_id", "sr_hz", "dur_ms",
                                          "codec", "transcript"))
    out = str(tmp_path / "out")
    validate_table(spark, clips, out, num_buckets=3, check_audio=False,
                   baseline_profile=baseline)
    drift = spark.read.parquet(os.path.join(out, "drift"))
    rows = {r.column_name: r for r in drift.collect()}
    assert set(rows) >= {"sr_hz", "dur_ms", "codec"}
    # same data vs its own baseline: nothing drifts
    assert not any(r.drifted for r in rows.values())
    # per-bucket parts on disk are the mergeable schema (sketch column)
    parts = spark.read.parquet(os.path.join(out, "profile"))
    assert "distinct_sketch" in parts.columns and "bucket" in parts.columns
