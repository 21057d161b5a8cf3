"""Deterministic stratified sampling for training-data mixes.

No reference analogue; the pipeline op that turns a raw corpus into a
weighted training mix ("50% en, 25% de, all fr ..."). Three properties a
10^12-row pipeline needs that ``DataFrame.sample`` does not give:

- **deterministic in the row key** — resuming / re-running selects the SAME
  rows (no RNG state, no partition-order dependence);
- **exactly reproducible across engines** — the survival test is an md5
  bucket of the key, bit-identical in Spark and DuckDB (oracle-checkable);
- **map-side only** — a filter, no shuffle, no count pass.

A row survives iff ``md5_bucket(key, seed) < rate[stratum]`` where the
bucket is the first 8 md5 hex chars as a uint32 scaled to [0, 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_skema_spark.functions.text import md5_hex_slice


def hash_fraction(key: Column, seed: int = 42) -> Column:
    """Deterministic uniform [0,1) value per key: first 32 bits of
    md5(key || seed). Cross-engine reproducible (md5, not xxhash64)."""
    return (md5_hex_slice(key.cast("string"), 1, 8, seed=seed)
            .cast("double") / float(1 << 32))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates: dict[str, float], *, seed: int = 42,
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically in
    ``key_col``. Unlisted strata fall back to ``default_rate``."""
    rate: Column = F.lit(float(default_rate))
    for stratum, r in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))) \
            .otherwise(rate)
    # NULL keys hash to NULL and an un-coalesced NULL predicate would
    # silently drop them at ANY rate (review r04). They cannot be
    # deterministically SAMPLED either: any single shared draw keeps or
    # drops the whole NULL-key population all-or-nothing at fractional
    # rates (review r05c). The honest deterministic semantics: their draw
    # is the supremum 1 - 2^-32 — kept only by a keep-everything rate
    # >= 1.0, dropped by every fractional rate. Repair or filter NULL keys
    # upstream (required/uniqueness checks) to include them in a mix.
    draw = F.coalesce(hash_fraction(F.col(key_col), seed),
                      F.lit(1.0 - 2.0 ** -32))
    return df.filter(draw < rate)
