"""_compile_fast_pattern must be EXACTLY equivalent to col.rlike(pat) on
the subset it accepts, and must decline (return None) everything else so
the real Java engine keeps those."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from json_skema_spark.plans.compile import _compile_fast_pattern

SUBSET = [
    "^clip_[0-9a-f]{12}$",
    "^[1-5]-",
    "^abc",
    "^a\\-c$",
    "^[a-c]{2}",
    "^$",
    "^",
    "^x\\.y$",
    "^[-x]z",
    "^[x-]z",
    "^id[0-9]{3}[a-z]",
    "^[0-9][0-9]$",
    "^\\[ok\\]$",
]

FALLBACK = [
    "a+", "^a|b", "^[^a]", "^\\d+", "^(ab)$", "^a*", "^a{2}", "^[a-c",
    "abc", "^a.c$", "^[a\\]b]$", "^x$y", "^[a&&b]$", "^a?", "^[0-9]{0}",
    "^é{2}$",  # quantified literal: fallback keeps the real engine
]


def test_fallback_patterns_decline():
    for p in FALLBACK:
        assert _compile_fast_pattern(p) is None, p


def _eval(spark, pats, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    cols = []
    for i, p in enumerate(pats):
        fast = _compile_fast_pattern(p)
        assert fast is not None, p
        cols.append(fast(F.col("s")).alias(f"f{i}"))
        cols.append(F.col("s").rlike(p).alias(f"r{i}"))
    rows = df.select(*cols).collect()
    for r in rows:
        for i, p in enumerate(pats):
            assert r[f"f{i}"] == r[f"r{i}"], \
                f"pattern {p!r} diverges on {values[rows.index(r)]!r}: " \
                f"fast={r[f'f{i}']} rlike={r[f'r{i}']}"


def test_equivalence_targeted(spark):
    values = [
        None, "", "c", "clip_0123456789ab", "clip_0123456789abc",
        "clip_0123456789aB", "clip_0123456789a", "Xlip_0123456789ab",
        "1-urgent", "6-none", "1", "-", "abc", "abcd", "ab", "a-c", "a.c",
        "axc", "x.y", "xzy", "-z", "xz", "z", "id123a", "id123A", "id12a",
        "99", "9", "990", "[ok]", "ok", "é", "éé", "clip_àéîöü6789ab",
        "𝕏𝕏", "clip_𝕏123456789ab", "  ", "\n", "a\nc",
    ]
    _eval(spark, SUBSET, values)


def test_equivalence_fuzz(spark):
    rng = random.Random(7)
    alphabet = "0123456789abcdefxyz_-. ACZé"
    values = ["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 20)))
              for _ in range(300)]
    # plus near-miss strings derived from the patterns themselves
    values += ["clip_" + "".join(rng.choice("0123456789abcdefg")
                                 for _ in range(12)) for _ in range(100)]
    _eval(spark, SUBSET, values)
