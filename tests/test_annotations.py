"""deprecated-usage report (operators/annotations.py).

Reference parity anchor: jsonsKema stores `deprecated` as an annotation
with no validation effect (Schema.kt:14, SchemaLoader.kt:500,534); the
table-level usage report is the Spark-native surfacing of it.
"""

import pyspark.sql.functions as F
import pytest

from json_skema_spark.operators.annotations import (
    deprecated_paths, deprecated_usage)

SCHEMA = {
    "type": "object",
    "properties": {
        "a": {"type": "string", "deprecated": True},
        "b": {"type": "integer"},
        "meta": {
            "type": "object",
            "properties": {
                "legacy": {"type": "number", "deprecated": True},
                "keep": {"type": "string"},
            },
        },
        "tags": {"type": "array",
                 "items": {"type": "string", "deprecated": True}},
    },
}


def test_deprecated_paths_walks_nested_and_items():
    got = dict(deprecated_paths(SCHEMA))
    assert got == {
        "#/properties/a": ["a"],
        "#/properties/meta/properties/legacy": ["meta", "legacy"],
        "#/properties/tags/items": ["tags", "[]"],
    }


def test_deprecated_paths_escapes_pointer_tokens():
    doc = {"properties": {"a/b": {"deprecated": True}}}
    assert deprecated_paths(doc) == [("#/properties/a~1b", ["a/b"])]


def test_usage_counts(spark):
    rows = [
        ("x", 1, {"legacy": 1.5, "keep": "k"}, ["t1"]),
        (None, 2, {"legacy": None, "keep": "k"}, []),
        ("y", 3, None, None),
        (None, 4, {"legacy": 2.0, "keep": None}, ["t2", "t3"]),
    ]
    df = spark.createDataFrame(
        rows, "a string, b int, "
              "meta struct<legacy: double, keep: string>, "
              "tags array<string>")
    rep = {r.property_path: r for r in deprecated_usage(df, SCHEMA).collect()}
    assert set(rep) == {"a", "meta.legacy", "tags.[]"}
    assert rep["a"].n_present == 2 and rep["a"].n_rows == 4
    assert rep["meta.legacy"].n_present == 2  # null leaf + null parent excluded
    assert rep["tags.[]"].n_present == 2      # empty array and null excluded
    assert rep["a"].frac_present == pytest.approx(0.5)


def test_usage_single_aggregation_job(spark):
    """The report is ONE aggregate over the table — the physical plan has
    exactly one scan of the input (no per-path jobs)."""
    df = spark.range(100).select(
        F.col("id").cast("string").alias("a"), F.col("id").alias("b"))
    rep = deprecated_usage(df, SCHEMA)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") + plan.count("Range ") <= 2  # one source
    assert rep.count() == 1  # only "a" exists in df


def test_no_deprecated_marks_empty_result(spark):
    df = spark.createDataFrame([("x",)], "a string")
    out = deprecated_usage(df, {"properties": {"a": {"type": "string"}}})
    assert out.count() == 0
    assert out.columns == ["schema_pointer", "property_path", "n_present",
                           "n_rows", "frac_present"]


def test_missing_nested_field_is_skipped(spark):
    """Review regression: a deprecated nested field ALREADY dropped from
    the struct (the exact lifecycle this report serves) is skipped, not an
    AnalysisException."""
    df = spark.createDataFrame(
        [("x", {"keep": "k"})],
        "a string, meta struct<keep: string>")
    rep = deprecated_usage(df, SCHEMA)  # SCHEMA marks meta.legacy + tags.[]
    got = {r.property_path for r in rep.collect()}
    assert got == {"a"}  # meta.legacy and tags.[] absent from the table


def test_map_backed_object_column(spark):
    """Review regression: MapType is the engine's open-document object
    representation — deprecated paths through string-keyed maps resolve."""
    df = spark.createDataFrame(
        [("a", {"legacy": "1", "keep": "k"}),
         ("b", {"keep": "k"}),
         ("c", None)],
        "a string, meta map<string,string>")
    doc = {"properties": {"meta": {"properties": {
        "legacy": {"deprecated": True}}}}}
    rows = deprecated_usage(df, doc).collect()
    assert len(rows) == 1
    assert rows[0].property_path == "meta.legacy"
    assert rows[0].n_present == 1 and rows[0].n_rows == 3
