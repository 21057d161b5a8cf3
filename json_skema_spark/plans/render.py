"""Violation rendering with the reference's exact output contracts.

``ValidationFailure.toJSON()`` (reference ValidationFailure.kt:35-50) emits
``{instanceRef, schemaRef, dynamicPath, message, keyword, causes}``;
``toString()`` (ValidationFailure.kt:13-33) renders
``"Line L, character C: <message>"`` — our positional anchor is the row key
instead of text coordinates. Both renderers are pure Column expressions so
they distribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_json_rows(violations: DataFrame) -> DataFrame:
    """Violations table -> reference-field-named JSON documents (one string
    per violation), matching ``ValidationFailure.toJSON()`` keys."""
    return violations.select(
        "row_key",
        F.to_json(F.struct(
            F.col("instance_location").alias("instanceRef"),
            F.col("keyword_location").alias("schemaRef"),
            F.col("dynamic_path").alias("dynamicPath"),
            F.col("message").alias("message"),
            F.col("keyword").alias("keyword"),
        )).alias("json"),
    )


def _leaf_struct(f):
    # field order matches ValidationFailure.toJSON() key order
    # (ValidationFailure.kt:35-50)
    return F.struct(
        f.getField("instance_location").alias("instanceRef"),
        f.getField("keyword_location").alias("schemaRef"),
        f.getField("dynamic_path").alias("dynamicPath"),
        f.getField("message").alias("message"),
        f.getField("keyword").alias("keyword"),
    )


def to_json_document(df: DataFrame, row_key: str, *,
                     failures_col: str = "failures",
                     out_col: str = "failure_json") -> DataFrame:
    """Per-row failure JSON with the reference's ``causes`` hierarchy
    (ValidationFailure.toJSON(), ValidationFailure.kt:35-50): null on pass
    (Validator.validate returns null, Validator.kt:163-182), the single leaf
    object for one failure, and for several an aggregate node —
    message "multiple validation failures", no keyword, ``causes`` = child
    failures (AggregatingValidationFailure, ValidationFailure.kt:62-82).

    Input: a DataFrame carrying the compiled ``failures`` array column
    (``plan.apply(df, mode="full")``). Pure Column expressions; ``to_json``
    omits null fields, so ``keyword``/``causes`` disappear exactly where the
    reference omits them.
    """
    fails = F.col(failures_col)
    # NULL failures (e.g. this table left-outer-joined against another, or
    # a writer that nulls empty arrays) must render as pass, not fall
    # through both when() branches into the "multiple validation failures"
    # aggregate — size(NULL) is NULL, never 0 (review r05)
    n = F.coalesce(F.size(fails), F.lit(0))
    leaf = F.to_json(_leaf_struct(F.element_at(fails, 1)))
    agg = F.to_json(F.struct(
        F.lit("#").alias("instanceRef"),
        F.lit("#").alias("schemaRef"),
        F.lit("#").alias("dynamicPath"),
        F.lit("multiple validation failures").alias("message"),
        F.lit(None).cast("string").alias("keyword"),
        F.transform(fails, _leaf_struct).alias("causes"),
    ))
    return df.select(
        F.col(row_key).cast("string").alias("row_key"),
        F.when(n == 0, F.lit(None).cast("string"))
        .when(n == 1, leaf).otherwise(agg).alias(out_col),
    )


def to_text(violations: DataFrame) -> DataFrame:
    """Violations -> reference-style one-line text: the row key stands in for
    the reference's "Line L, character C" source location."""
    return violations.select(
        "row_key",
        F.format_string(
            "row %s, at %s: %s (keyword: %s, schema: %s)",
            F.col("row_key"), F.col("instance_location"), F.col("message"),
            F.col("keyword"), F.col("keyword_location")).alias("text"),
    )
