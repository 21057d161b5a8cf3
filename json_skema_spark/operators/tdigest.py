"""Mergeable quantile sketches (t-digest style) via Arrow-batched partials.

SURVEY.md §4 "needs custom work": ``percentile_approx`` is the built-in
fallback (operators/stats.py); this module adds the *mergeable* path the
north rule's resumable profiling needs — per-partition digests that persist
as rows and merge across runs, like HLL sketches do for distinct counts.

Design (classic two-phase sketch):
  1. partial: ``mapInPandas`` compresses each Arrow batch into <= ``delta``
     weighted centroids (numpy, no per-row Python) — output is
     ``(centroid_mean, centroid_weight)`` rows, ~delta per partition.
  2. final: centroids are tiny (delta x n_partitions), so the merge +
     quantile evaluation runs driver-side on numpy after a ``collect`` of
     kilobytes — the same partial/final split as Spark's own HLL aggs.

The centroid compression uses quantile-spaced bins (scale-function-free
simplification of Dunning's t-digest; accuracy is bounded by bin width
1/delta rather than the tail-tight k-scale, which is fine for drift
scoring's mid-quantiles)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

CENTROID_SCHEMA = "mean double, weight long"


def _compress(values: np.ndarray, weights: np.ndarray, delta: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """Merge (value, weight) pairs into <= delta weight-balanced centroids."""
    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    total = w.sum()
    if len(v) <= delta:
        return v, w
    # cumulative-weight bin edges -> one centroid per bin
    cum = np.cumsum(w) - w / 2.0
    bins = np.minimum((cum / total * delta).astype(np.int64), delta - 1)
    means = np.zeros(delta)
    weights_out = np.zeros(delta, dtype=np.int64)
    np.add.at(weights_out, bins, w)
    np.add.at(means, bins, v * w)
    nz = weights_out > 0
    return means[nz] / weights_out[nz], weights_out[nz]


def partial_digests(df: DataFrame, col: str, *, delta: int = 200) -> DataFrame:
    """Per-partition centroid rows for ``col`` (nulls excluded).

    Non-null values that are not numeric raise (deterministically, on every
    task that sees one) rather than silently coercing to NaN and vanishing:
    quantiles computed over an unannounced subset of a mistyped column are
    plausible-looking wrong statistics — the docstring contract excludes
    only NULLs (review r05)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_v = np.empty(0)
        acc_w = np.empty(0, dtype=np.int64)
        for pdf in batches:
            coerced = pd.to_numeric(pdf[col], errors="coerce")
            bad = int((pdf[col].notna() & coerced.isna()).sum())
            if bad:
                raise ValueError(
                    f"tdigest over non-numeric column {col!r}: {bad} "
                    f"non-null unparseable value(s) in one batch — clean or "
                    f"cast the column first")
            vals = coerced.dropna().to_numpy(float)
            if len(vals) == 0:
                continue
            v, w = _compress(np.concatenate([acc_v, vals]),
                             np.concatenate([acc_w, np.ones(len(vals), np.int64)]),
                             delta)
            acc_v, acc_w = v, w
        yield pd.DataFrame({"mean": acc_v, "weight": acc_w})

    return df.select(col).mapInPandas(run, CENTROID_SCHEMA)


def merge_digests(centroids: list[tuple[float, int]], *, delta: int = 200
                  ) -> tuple[np.ndarray, np.ndarray]:
    v = np.array([c[0] for c in centroids], dtype=float)
    w = np.array([c[1] for c in centroids], dtype=np.int64)
    if len(v) == 0:
        return v, w
    return _compress(v, w, delta)


def quantiles_from_digest(means: np.ndarray, weights: np.ndarray,
                          probs: list[float]) -> list[float]:
    if len(means) == 0:
        return [float("nan")] * len(probs)
    order = np.argsort(means)
    m, w = means[order], weights[order]
    cum = np.cumsum(w) - w / 2.0
    cum = cum / w.sum()
    return [float(np.interp(p, cum, m)) for p in probs]


def tdigest_quantiles(df: DataFrame, col: str, probs: list[float], *,
                      delta: int = 200) -> list[float]:
    """End-to-end: partial digests -> driver merge -> quantiles.

    For resumable pipelines persist ``partial_digests`` output per bucket and
    merge across runs with ``merge_digests``."""
    rows = partial_digests(df, col, delta=delta).collect()
    m, w = merge_digests([(r["mean"], r["weight"]) for r in rows], delta=delta)
    return quantiles_from_digest(m, w, probs)
