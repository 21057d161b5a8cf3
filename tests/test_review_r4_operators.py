"""Round-4 review-pass regressions for the profile/drift/sampling/packing/
infer/annotations family (all findings confirmed against concrete failure
scenarios before fixing)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F


def test_infer_decimal_enum_and_bounds(spark):
    """DecimalType columns: enum values and min/max must render without a
    json.dumps TypeError, and integral decimals past 2^53 must mine EXACT
    bounds (a float round-trip mines a maximum below the data max)."""
    from json_skema_spark.operators.infer import suggest_constraints
    big = Decimal("10000000000000000001")  # > 2^53, float rounds DOWN
    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("2.25"),), (big,)],
        "price decimal(38,2)")
    sug = {(r.column_name, r.keyword): r.value
           for r in suggest_constraints(df).collect()}
    assert ("price", "maximum") in sug or ("price", "enum") in sug
    rendered = " ".join(sug.values())
    assert "10000000000000000001" in rendered  # exact, not 1e19


def test_pack_greedy_null_tokens_counts_as_zero(spark):
    from json_skema_spark.operators.packing import pack_greedy
    df = spark.createDataFrame(
        [("a", 10), ("b", None), ("c", 5)], "doc_id string, n int")
    out = pack_greedy(df, "doc_id", "n", max_tokens=16, buckets=1).collect()
    assert len(out) == 3  # null row packed (as 0), task did not die
    assert {r.doc_id for r in out} == {"a", "b", "c"}


def test_chunk_assignments_null_tokens_no_null_chunks(spark):
    from json_skema_spark.operators.packing import chunk_assignments
    df = spark.createDataFrame(
        [("a", 10), ("b", None), ("c", 5)], "doc_id string, n int")
    out = chunk_assignments(df, "doc_id", "n", max_tokens=8).collect()
    assert all(r.chunk_id is not None for r in out)


def test_chunk_id_exact_past_double_precision(spark):
    """chunk_id must use exact arithmetic: cumulative token streams past
    2^53 round under double division while chunk_offset (long pmod) stays
    exact — the pair would disagree."""
    from json_skema_spark.operators.packing import chunk_assignments
    big = (1 << 53) + 4097  # odd offset past the double-exact boundary
    df = spark.createDataFrame(
        [("a", big), ("b", 10), ("c", 7)], "doc_id string, n long")
    out = {r.doc_id: r for r in
           chunk_assignments(df, "doc_id", "n", max_tokens=2048).collect()}
    for doc, start in (("a", 0), ("b", big), ("c", big + 10)):
        assert out[doc].chunk_id == start // 2048, doc
        assert out[doc].chunk_offset == start % 2048, doc


def test_stratified_sample_keeps_null_keys_at_full_rate(spark):
    from json_skema_spark.operators.sampling import stratified_sample
    df = spark.createDataFrame(
        [("k1", "fr"), (None, "fr"), ("k2", "en")],
        "doc_id string, lang string")
    kept = stratified_sample(df, "doc_id", "lang",
                             {"fr": 1.0, "en": 0.0}).collect()
    assert {r.lang for r in kept} == {"fr"} and len(kept) == 2


def test_drift_all_null_column_not_flagged(spark):
    """approx_distinct 0 on BOTH sides = identical distribution, not
    drift."""
    from json_skema_spark.operators.drift import drift_report
    prof = spark.createDataFrame(
        [("ghost", 100, 1.0, None, None, 0, None)],
        "column_name string, n_rows long, null_fraction double, "
        "min_value string, max_value string, approx_distinct long, "
        "quantiles array<double>")
    rep = drift_report(prof, prof).collect()
    assert len(rep) == 1 and rep[0].drifted is False


def test_deprecated_usage_dotted_column_name(spark):
    from json_skema_spark.operators.annotations import deprecated_usage
    df = spark.createDataFrame([(1.0, 2.0), (None, 3.0)],
                               "`legacy.score` double, score double")
    schema = {"properties": {"legacy.score": {"deprecated": True}}}
    rep = deprecated_usage(df, schema).collect()
    row = next(r for r in rep if r.property_path == "legacy.score")
    assert row.n_present == 1  # one non-null usage counted, no crash


def test_merged_profile_long_minmax_exact(spark):
    """Long min/max past 2^53 must survive the mergeable fold EXACTLY —
    the double path rounds 2^63-1 to 9.223372036854776E18."""
    from json_skema_spark.operators.stats import (mergeable_profile,
                                                  merge_profiles)
    big = (1 << 63) - 1
    df = spark.createDataFrame([(big,), (big - 1,), (5,)], "id long")
    merged = merge_profiles(mergeable_profile(df)).collect()[0]
    assert merged.max_value == str(big)
    assert merged.min_value == "5"


def test_merge_hll_tolerates_different_lg_k(spark):
    from json_skema_spark.operators.stats import hll_sketches, merge_hll
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = hll_sketches(df, ["id"], lg_k=12)
    b = hll_sketches(df, ["id"], lg_k=13)
    est = merge_hll(a.unionByName(b)).collect()[0].approx_distinct
    assert 80 <= est <= 120  # merge succeeded, estimate sane


def test_profile_per_partition_name_collision_raises(spark):
    from json_skema_spark.operators.stats import profile
    df = spark.createDataFrame([(1, 2)], "partition_id int, v int")
    with pytest.raises(ValueError, match="partition_id"):
        profile(df, ["v"], per_partition=True)
