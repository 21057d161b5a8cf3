"""VariantType helpers: runtime type dispatch for open JSON documents.

Typed columns resolve JSON types at compile time; a ``VariantType`` column
(Spark 4, ``parse_json``) carries per-row dynamic values — the closest
Spark analogue of the reference's tagged-union ``JsonValue``
(JsonValue.kt:129-151): ``requireX()/maybeX()`` dispatch becomes
``schema_of_variant`` kind tests + ``try_variant_get`` accessors, all
JVM-side expressions.

Convention: a missing member extracts as SQL NULL (absent); an explicit
JSON ``null`` extracts as a VOID-kind variant and is also treated as
absent, consistent with the engine's NULL=absent rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT_KINDS = ("BIGINT", "INT", "SMALLINT", "TINYINT")


def kind(col: Column) -> Column:
    return F.schema_of_variant(col)


def is_string(col: Column) -> Column:
    return kind(col) == "STRING"


def is_boolean(col: Column) -> Column:
    return kind(col) == "BOOLEAN"


def is_number(col: Column) -> Column:
    k = kind(col)
    return k.isin("DOUBLE", "FLOAT", *_INT_KINDS) | k.startswith("DECIMAL")


def is_integer(col: Column) -> Column:
    k = kind(col)
    d = as_double(col)
    return k.isin(*_INT_KINDS) | (is_number(col)
                                  & d.isNotNull() & (d == F.floor(d)))


def is_array(col: Column) -> Column:
    return kind(col).startswith("ARRAY")


def is_object(col: Column) -> Column:
    return kind(col).startswith("OBJECT")


def is_json_null(col: Column) -> Column:
    return kind(col) == "VOID"


def is_absent(col: Column) -> Column:
    """SQL NULL (missing) or JSON null — both 'absent' for value keywords."""
    return col.isNull() | (kind(col) == "VOID")


def as_double(col: Column) -> Column:
    # gate on numeric kind: try_variant_get would also coerce booleans
    return F.when(is_number(col),
                  F.try_variant_get(col, "$", "double")).otherwise(F.lit(None))


def as_string(col: Column) -> Column:
    return F.try_variant_get(col, "$", "string")


def as_boolean(col: Column) -> Column:
    return F.when(is_boolean(col),
                  F.try_variant_get(col, "$", "boolean")).otherwise(F.lit(None))


def as_array(col: Column) -> Column:
    """array<variant> or NULL when not an array."""
    return F.try_variant_get(col, "$", "array<variant>")


def get_field(col: Column, name: str) -> Column:
    # Spark's variant path parser takes bracket-quoted keys LITERALLY — no
    # escape sequences exist (empirically pinned, review r05): escaping a
    # quote raises INVALID_VARIANT_GET_PATH at runtime (killing the job for
    # a legal schema) and escaping a backslash looks up the wrong literal
    # key (property silently validates as absent). Pick the quote style the
    # key doesn't use; a dot path accepts anything except '.'/'[' as the
    # both-quotes fallback.
    if "'" not in name:
        path = f"$['{name}']"
    elif '"' not in name:
        path = f'$["{name}"]'
    elif "." not in name and "[" not in name:
        path = f"$.{name}"
    else:
        raise ValueError(
            f"property name {name!r} cannot be expressed as a Spark variant "
            f"extraction path (contains both quote characters plus '.' or "
            f"'[' — no quoting style can represent it)")
    return F.try_variant_get(col, path, "variant")


def json_type_name(col: Column) -> Column:
    """Per-row JSON type name for failure messages
    ('expected type: X, actual: Y', reference Type.kt:25)."""
    return (F.when(col.isNull() | is_json_null(col), "null")
            .when(is_string(col), "string")
            .when(is_boolean(col), "boolean")
            .when(is_integer(col), "integer")
            .when(is_number(col), "number")
            .when(is_array(col), "array")
            .when(is_object(col), "object")
            .otherwise("unknown"))


def equality_key(col: Column) -> Column:
    """Canonical string key implementing JSON deep-equality classes:
    numbers normalize by VALUE (5 == 5.0, BigDecimal.compareTo semantics
    JsonValue.kt:288-292); composites use their JSON text (documented
    caveat: object key order matters for nested objects).

    The numeric key is ``double-repr ':' integral-repr``: the double part
    alone would collide distinct int64 values above 2^53 (both round to
    the same double), so the exact decimal(38,0) rendering — which agrees
    for 5 vs 5.0 but separates 2^53 from 2^53+1 — disambiguates; values
    outside decimal(38,0) (fractional, |x| >= 1e38) fall back to "" where
    the double part already separates them."""
    num_key = F.concat(
        F.lit("n:"), as_double(col).cast("string"), F.lit(":"),
        F.coalesce(F.try_variant_get(col, "$", "decimal(38,0)")
                   .cast("string"), F.lit("")))
    return (F.when(is_number(col), num_key)
            .when(is_string(col), F.concat(F.lit("s:"), as_string(col)))
            .when(is_boolean(col), F.concat(F.lit("b:"), as_string(col)))
            .when(is_json_null(col), F.lit("z:null"))
            .otherwise(F.concat(F.lit("j:"), as_string(col))))
