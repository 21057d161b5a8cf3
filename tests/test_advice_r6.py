"""ADVICE r05 fixes (applied in the r06 optimization round).

1. contains+maxContains under a fail_row depth cutoff must REFUSE at
   compile time (the conservative per-element failure undercounts
   match_cnt, so maxContains would wrongfully PASS a too-deep instance).
2. Huge-int const equality must not round: a fractional decimal column
   value that HALF_UP-rounds onto the const, and a double whose exact
   binary value differs from the const, must both be not-equal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_skema_spark import compile_schema
from json_skema_spark.plans.compile import AggregateCompileError, CompileError


DEEP_MAX = {
    "$defs": {"deep": {"items": {"$ref": "#/$defs/deep"}}},
    "contains": {"$ref": "#/$defs/deep"}, "maxContains": 1,
}
DEEP_PLAIN = {
    "$defs": {"deep": {"items": {"$ref": "#/$defs/deep"}}},
    "contains": {"$ref": "#/$defs/deep"},
}


def test_maxcontains_depth_cutoff_refuses(spark):
    # a VARIANT instance nests unboundedly, so the fail_row cutoff is in
    # play; under maxContains it must refuse at compile time instead of
    # undercounting match_cnt (typed columns prune the recursion
    # statically and never reach the cutoff)
    from json_skema_spark.plans.compile import Compiler
    comp = Compiler(DEEP_MAX, max_depth=3, on_max_depth="fail_row",
                    collect_errors=False)
    with pytest.raises((CompileError, AggregateCompileError),
                       match="max_depth"):
        comp.compile_value(F.parse_json(F.lit("[[1]]")), T.VariantType())


def test_plain_contains_depth_cutoff_still_compiles(spark):
    # without maxContains the conservative cutoff stays monotone
    # (minContains can only over-fail, never wrongly accept)
    from json_skema_spark.plans.compile import Compiler
    comp = Compiler(DEEP_PLAIN, max_depth=3, on_max_depth="fail_row",
                    collect_errors=False)
    comp.compile_value(F.parse_json(F.lit("[[1]]")), T.VariantType())


def test_const_decimal_fraction_does_not_round_onto_const(spark):
    big = 10_000_000_000_000_000_001
    df = spark.createDataFrame(
        [("i", "10000000000000000001.00"), ("f", "10000000000000000000.75")],
        "k string, v string").select(
        "k", F.col("v").cast(T.DecimalType(38, 2)).alias("v"))
    plan = compile_schema(
        {"type": "object", "properties": {"v": {"const": big}}}, df.schema)
    got = {r.k: r.passed for r in
           plan.apply(df, mode="verdict").select("k", "passed").collect()}
    assert got == {"i": True, "f": False}


def test_const_double_exact_binary_value(spark):
    df = spark.createDataFrame([("x", 1e30), ("y", float(2 ** 100))],
                               "k string, v double")
    exact_1e30 = int(1e30)          # ...019884624838656, != 10**30
    plan_a = compile_schema(
        {"type": "object", "properties": {"v": {"const": 10 ** 30}}},
        df.schema)
    got_a = {r.k: r.passed for r in
             plan_a.apply(df, mode="verdict").select("k", "passed").collect()}
    assert got_a["x"] is False, "(double)1e30 != 10**30 exactly"
    plan_b = compile_schema(
        {"type": "object", "properties": {"v": {"const": exact_1e30}}},
        df.schema)
    got_b = {r.k: r.passed for r in
             plan_b.apply(df, mode="verdict").select("k", "passed").collect()}
    assert got_b["x"] is True, "the exact binary value must still match"
    plan_c = compile_schema(
        {"type": "object", "properties": {"v": {"const": 2 ** 100}}},
        df.schema)
    got_c = {r.k: r.passed for r in
             plan_c.apply(df, mode="verdict").select("k", "passed").collect()}
    assert got_c["y"] is True, "2**100 is exactly representable as double"


def test_const_variant_decimal_fraction_not_rounded(spark):
    big = 10_000_000_000_000_000_001
    df = spark.createDataFrame(
        [("i", "10000000000000000001"), ("t", "10000000000000000001.000"),
         ("f", "10000000000000000000.75")],
        "k string, j string").select("k", F.parse_json("j").alias("v"))
    from json_skema_spark.plans.compile import Compiler
    comp = Compiler({"const": big})
    compiled = comp.compile_value(F.col("v"), T.VariantType())
    got = {r.k: r.p for r in
           df.select("k", compiled.passed.alias("p")).collect()}
    assert got == {"i": True, "t": True, "f": False}
