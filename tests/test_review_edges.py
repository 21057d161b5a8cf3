"""Edge cases from the round-3 high-effort review of the core compile
path: compile-time crashes that escaped the CompileError contract,
ANSI-mode runtime crashes, and convention inconsistencies between the
struct / map / variant object representations."""

import pytest
from pyspark.sql import functions as F

from json_skema_spark import CompileError, compile_schema, validate_open_json
from json_skema_spark.plans.compile import Compiler
from json_skema_spark.plans.verdict import ValidationPlan


def _passed(spark, df, doc, **kw):
    plan = ValidationPlan(Compiler(doc, **kw), df.schema)
    return [r.p for r in df.select(plan.passed.alias("p")).collect()]


def test_root_object_const(spark):
    """const with an object value at the table root (inst.col is None)
    must compile, not AttributeError."""
    df = spark.createDataFrame([(1, None), (2, None), (1, "x")],
                               "a int, b string")
    got = _passed(spark, df, {"const": {"a": 1}})
    assert got == [True, False, False]  # b must be absent, a must equal 1


def test_variant_unknown_type_name_never_matches(spark):
    """A typo'd type name on the variant path is always-false (same as the
    typed path), not a KeyError."""
    df = spark.createDataFrame([('{"x": 1}',)], "payload string")
    out = validate_open_json(df, "payload", {"type": "nul"})
    assert [r.json_passed for r in out.collect()] == [False]


def test_java_only_pattern_on_struct_is_compile_error(spark):
    """patternProperties with Java-only regex syntax against a fixed
    struct: a pointered CompileError, not an uncaught re.error."""
    df = spark.createDataFrame([("v",)], "alpha string")
    with pytest.raises(CompileError, match="patternProperties"):
        compile_schema({"patternProperties": {r"\p{Alpha}+": {"type": "string"}}},
                       df.schema)


def test_unique_items_all_null_elements(spark):
    """[null, null] duplicates by SQL semantics: the failure message path
    must not element_at an empty pair array (ANSI crash)."""
    df = spark.createDataFrame([([None, None],), ([1, None],)],
                               "arr array<int>")
    doc = {"properties": {"arr": {"uniqueItems": True}}}
    plan = ValidationPlan(Compiler(doc), df.schema)
    rows = plan.violations(df.withColumn("k", F.monotonically_increasing_id()),
                           "k").collect()
    assert len(rows) == 1 and rows[0].keyword == "uniqueItems"
    assert "null" in rows[0].message


def test_temporal_columns_validate_as_strings(spark):
    """Date/Timestamp carry json type 'string': enum/pattern/minLength
    evaluate over the canonical text instead of silently failing/skipping."""
    df = spark.sql("SELECT DATE'2024-01-01' AS d UNION ALL "
                   "SELECT DATE'2025-06-15'")
    assert sorted(_passed(spark, df, {"properties": {
        "d": {"enum": ["2024-01-01"]}}})) == [False, True]
    assert _passed(spark, df, {"properties": {
        "d": {"pattern": r"^\d{4}-\d{2}-\d{2}$", "minLength": 10,
              "maxLength": 10}}}) == [True, True]


def test_map_variant_null_members_are_absent_everywhere(spark):
    """{'x': null} (non-strict): additionalProperties:false and
    propertyNames must agree with required/minProperties that x is
    absent."""
    df = spark.createDataFrame([('{"x": null}',), ('{"x": 1}',)],
                               "payload string")
    ap = validate_open_json(df, "payload", {"additionalProperties": False})
    assert [r.json_passed for r in ap.collect()] == [True, False]
    pn = validate_open_json(df, "payload",
                            {"propertyNames": {"maxLength": 0}})
    assert [r.json_passed for r in pn.collect()] == [True, False]


def test_struct_variant_field_null_is_absent_for_required(spark):
    """struct<a:variant> decoding {'a': null} (non-strict): required must
    agree with the value keywords that a is absent."""
    df = spark.createDataFrame([('{"a": null}',), ('{"a": 1}',), ("{}",)],
                               "payload string").select(
        F.from_json("payload", "a variant").alias("doc"))
    doc = {"properties": {"doc": {"required": ["a"]}}}
    assert _passed(spark, df, doc) == [False, True, False]


def test_variant_unique_items_beyond_double_precision(spark):
    """Distinct int64 values above 2^53 must not collide through the
    double-normalized equality key; 5 vs 5.0 still collide (JSON numeric
    equality)."""
    df = spark.createDataFrame(
        [('[9007199254740993, 9007199254740992]',), ('[5, 5.0]',)],
        "payload string")
    out = validate_open_json(df, "payload", {"uniqueItems": True})
    assert [r.json_passed for r in out.collect()] == [True, False]


def test_multiple_of_extreme_divisors(spark):
    """multipleOf 1e-13 must not become decimal zero (ANSI divide-by-zero);
    multipleOf <= 0 is a pointered CompileError."""
    df = spark.createDataFrame([(1.0,), (1.05e-13,)], "v double")
    got = _passed(spark, df, {"properties": {"v": {"multipleOf": 1e-13}}})
    assert got[0] is True  # 1.0 = 1e13 * 1e-13 exactly at scale 22
    with pytest.raises(CompileError, match="multipleOf"):
        compile_schema({"properties": {"v": {"multipleOf": 0}}}, df.schema)
