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
