"""Annotation surfacing: deprecated-field usage report.

The reference stores ``deprecated`` as a schema annotation
(Schema.kt:14, SchemaLoader.kt:534) but — per draft 2020-12 §9.3 — it has
no validation effect, so a single-document validator can only expose it on
the schema object. The Spark-native analogue is a TABLE-level report: for
every schema location marked ``"deprecated": true``, how many rows still
carry a value at the corresponding instance location. That is the question
a producer asks before deleting a field from a petabyte table.

Scale: ONE aggregation pass emitting one counter per deprecated path
(map-side combinable, output one row regardless of table size), unpivoted
to ``(schema_pointer, property_path, n_present, n_rows, frac_present)``.

Scope: walks ``properties`` recursively through nested objects and
``items``/``prefixItems`` element schemas (array elements count per-row:
"at least one element present"). ``$ref`` targets are not followed —
deprecation of a shared ``$defs`` schema is a property of the definition,
not of one usage site; mark the usage site instead.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_skema_spark.operators.util import quoted_col


def deprecated_paths(schema_doc: dict) -> list[tuple[str, list[Any]]]:
    """All (schema_pointer, instance_path) pairs whose subschema carries
    ``"deprecated": true``. Instance-path steps are property names; the
    sentinel ``"[]"`` marks descent into array elements."""
    out: list[tuple[str, list[Any]]] = []

    def walk(node: Any, ptr: str, path: list[Any]) -> None:
        if not isinstance(node, dict):
            return
        if node.get("deprecated") is True:
            out.append((ptr, list(path)))
        for name, sub in (node.get("properties") or {}).items():
            esc = name.replace("~", "~0").replace("/", "~1")
            walk(sub, f"{ptr}/properties/{esc}", path + [name])
        items = node.get("items")
        if isinstance(items, dict):
            walk(items, f"{ptr}/items", path + ["[]"])
        for i, sub in enumerate(node.get("prefixItems") or []):
            walk(sub, f"{ptr}/prefixItems/{i}", path + ["[]"])

    walk(schema_doc, "#", [])
    return out


def _presence(root: DataFrame, path: list[Any]) -> Column | None:
    """Column: does this row carry a value at ``path``? Structured columns
    cannot distinguish absent from null (same convention as the verdict
    compiler), so presence == non-null at every step; array steps mean
    "some element carries a value below"."""
    if not path:
        return None  # root object itself marked deprecated: meaningless per-row

    def descend(col: Column | None, steps: list[Any]) -> Column:
        step, rest = steps[0], steps[1:]
        if step == "[]":
            base = col if col is not None else None
            if base is None:
                return F.lit(False)  # array sentinel at root: not a table shape
            if not rest:
                return base.isNotNull() & (F.size(base) > 0)
            return base.isNotNull() & F.exists(
                base, lambda e: descend(e, rest))
        # quote the top-level step (util.quoted_col — this module is where
        # the fix originated in r04): _path_exists matched it as one exact
        # fieldName, so it must resolve as one, never as struct access
        nxt = quoted_col(step) if col is None else col.getField(step)
        if not rest:
            return nxt.isNotNull()
        return nxt.isNotNull() & descend(nxt, rest)

    return descend(None, path)


def _path_exists(dtype: T.DataType, path: list[Any]) -> bool:
    """Does the FULL instance path resolve in the table's Spark schema?
    (checking only the head would let ``getField`` on a dropped nested
    field fail analysis — exactly the already-deleted-field lifecycle this
    report serves)."""
    if not path:
        return True
    step, rest = path[0], path[1:]
    if step == "[]":
        return isinstance(dtype, T.ArrayType) and \
            _path_exists(dtype.elementType, rest)
    if isinstance(dtype, T.StructType) and step in dtype.fieldNames():
        return _path_exists(dtype[step].dataType, rest)
    if isinstance(dtype, T.MapType) and isinstance(dtype.keyType, T.StringType):
        # MapType is the engine's other object representation (open
        # documents); any string key resolves, value type drives descent
        return _path_exists(dtype.valueType, rest)
    return False


def deprecated_usage(df: DataFrame, schema_doc: dict) -> DataFrame:
    """Per deprecated schema location: rows still carrying a value there.

    Returns ``(schema_pointer, property_path, n_present, n_rows,
    frac_present)``, one row per ``"deprecated": true`` location whose
    instance path exists in ``df``'s schema; empty result when the schema
    marks nothing deprecated.
    """
    spark = df.sparkSession
    found = deprecated_paths(schema_doc)
    counters: list[tuple[str, str]] = []  # (pointer, dotted path) per agg slot
    aggs = [F.count(F.lit(1)).alias("_rows")]
    table_type = df.schema
    for ptr, path in found:
        if not path or not _path_exists(table_type, path):
            continue
        pres = _presence(df, path)
        if pres is None:
            continue
        slot = f"_c{len(counters)}"
        counters.append((ptr, ".".join(str(s) for s in path)))
        # coalesce: F.sum over a ZERO-ROW table is NULL, and a consumer's
        # "n_present == 0 -> safe to delete" check must read 0 (review r05c)
        aggs.append(F.coalesce(F.sum(pres.cast("long")), F.lit(0))
                    .alias(slot))
    if not counters:
        return spark.createDataFrame(
            [], "schema_pointer string, property_path string, "
                "n_present long, n_rows long, frac_present double")
    row = df.agg(*aggs)
    stacked = row.select(
        F.col("_rows"),
        F.explode(F.array(*[
            F.struct(F.lit(ptr).alias("schema_pointer"),
                     F.lit(p).alias("property_path"),
                     F.col(f"_c{i}").alias("n_present"))
            for i, (ptr, p) in enumerate(counters)])).alias("e"))
    return stacked.select(
        F.col("e.schema_pointer"), F.col("e.property_path"),
        F.col("e.n_present"),
        F.col("_rows").alias("n_rows"),
        (F.col("e.n_present") / F.greatest(F.col("_rows"), F.lit(1)))
        .alias("frac_present"))
