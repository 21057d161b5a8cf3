"""Differential testing: the compiled Column predicates vs a pure-Python
reference interpreter (tests/reference_interp.py) over seeded-random
schemas and instances — the randomized complement of the hand-written
conformance corpus (reference test strategy, SURVEY.md §5).

Deterministic (numpy PRNG, seed 42); each dtype shape runs as ONE Spark job
over all its (schema x instance) pairs, so the whole sweep costs a handful
of collects.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_skema_spark.plans.compile import Compiler
from tests.reference_interp import validate as ref_validate

try:
    # third independent leg (python-jsonschema): triangulates the sweep —
    # a spec misunderstanding SHARED by the engine and reference_interp
    # (both authored in this repo) would pass two-way differential but
    # disagree with the outside implementation. The generators emit only
    # binary-exact multipleOf divisors (0.5/1/2/3) and no $vocabulary or
    # format, so jsonschema's two known divergences (see
    # test_jsonschema_crosscheck.py) are out of scope here by design.
    import jsonschema as _jsonschema
except ImportError:  # env-legit: sandbox images without the wheel
    _jsonschema = None


def _strip_absent(v):
    """Map the engine's default null convention into jsonschema's model:
    a null-valued field in a typed/lenient document means ABSENT (parquet
    typed columns cannot distinguish the two), whereas python-jsonschema
    would read Python None as JSON null. List elements are kept verbatim
    (position matters; the generators emit no null elements)."""
    if isinstance(v, dict):
        return {k: _strip_absent(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_strip_absent(x) for x in v]
    return v


def third_validate(schema, inst):
    # a null top-level instance is "absent" under the engine's lenient
    # convention — vacuously valid, nothing for jsonschema to check
    if _jsonschema is None or inst is None:
        return None
    return _jsonschema.Draft202012Validator(schema).is_valid(
        _strip_absent(inst))

RNG = np.random.default_rng(42)

INTS = [-5, -1, 0, 1, 2, 3, 4, 5, 7, 10, 12, None]
DOUBLES = [-2.5, -1.0, 0.0, 0.5, 1.0, 2.0, 2.5, 3.0, 4.5, 10.0, None]
STRINGS = ["", "a", "ab", "abc", "b7", "aXbY", "zzz", "a b", None]
ARRAYS = [[], [1], [1, 2], [2, 2], [1, 2, 3, 4], [5, 5, 5], [0, 9], None]


def _num_schema(rng, integer=False):
    pool = []
    lo, hi = sorted(rng.choice([-3, -1, 0, 1, 2, 3, 5, 8], 2, replace=False).tolist())
    opts = {
        "minimum": lo, "maximum": hi, "exclusiveMinimum": lo,
        "exclusiveMaximum": hi,
        "multipleOf": int(rng.choice([1, 2, 3])) if integer else float(rng.choice([0.5, 1, 2])),
        "enum": sorted(rng.choice(INTS[:-1], 3, replace=False).tolist()),
        "const": int(rng.choice(INTS[:-1])),
        "type": "integer" if integer else "number",
    }
    for k in rng.choice(list(opts), rng.integers(1, 4), replace=False):
        pool.append((k, opts[k]))
    return dict(pool)


def _str_schema(rng):
    opts = {
        "minLength": int(rng.integers(0, 4)),
        "maxLength": int(rng.integers(1, 5)),
        "pattern": str(rng.choice(["^a", "b$", "[0-9]", "a.b", "^$"])),
        "enum": ["a", "ab", "zzz"],
        "const": str(rng.choice(["a", "abc"])),
        "type": "string",
    }
    keys = rng.choice(list(opts), rng.integers(1, 4), replace=False)
    return {k: opts[k] for k in keys}


def _arr_schema(rng):
    opts = {
        "minItems": int(rng.integers(0, 3)),
        "maxItems": int(rng.integers(1, 5)),
        "uniqueItems": True,
        "items": _num_schema(rng, integer=True),
        "prefixItems": [_num_schema(rng, integer=True)],
        "contains": {"minimum": int(rng.integers(0, 6))},
    }
    keys = rng.choice(list(opts), rng.integers(1, 4), replace=False)
    s = {k: opts[k] for k in keys}
    if "contains" in s and rng.random() < 0.5:
        s["minContains"] = int(rng.integers(0, 3))
    if "contains" in s and rng.random() < 0.3:
        s["maxContains"] = int(rng.integers(1, 4))
    return s


def _combinator(rng, leaf_fn):
    kind = rng.choice(["allOf", "anyOf", "oneOf", "not", "ifte", "plain"])
    if kind == "plain":
        return leaf_fn(rng)
    if kind == "not":
        return {"not": leaf_fn(rng)}
    if kind == "ifte":
        return {"if": leaf_fn(rng), "then": leaf_fn(rng), "else": leaf_fn(rng)}
    return {kind: [leaf_fn(rng) for _ in range(int(rng.integers(2, 4)))]}


def _struct_schema(rng):
    s = {"properties": {
        "a": _combinator(rng, lambda r: _num_schema(r, integer=True)),
        "b": _str_schema(rng),
    }}
    if rng.random() < 0.5:
        s["required"] = rng.choice(["a", "b", "c"],
                                   rng.integers(1, 3), replace=False).tolist()
    if rng.random() < 0.3:
        s["minProperties"] = int(rng.integers(0, 3))
    if rng.random() < 0.3:
        s["maxProperties"] = int(rng.integers(1, 3))
    if rng.random() < 0.3:
        s["dependentRequired"] = {"a": ["b"]}
    return s


STR_ARRAYS = [[], ["a"], ["a", "a"], ["a", "ab", "zzz"], ["", "b7"], None]


def _str_arr_schema(rng):
    opts = {
        "minItems": int(rng.integers(0, 3)),
        "maxItems": int(rng.integers(1, 4)),
        "uniqueItems": True,
        "items": _str_schema(rng),
        "contains": {"minLength": int(rng.integers(0, 3))},
    }
    keys = rng.choice(list(opts), rng.integers(1, 4), replace=False)
    return {k: opts[k] for k in keys}


SHAPES = [
    ("int", lambda r: _combinator(r, lambda g: _num_schema(g, integer=True)), INTS),
    ("double", lambda r: _combinator(r, lambda g: _num_schema(g)), DOUBLES),
    ("string", lambda r: _combinator(r, _str_schema), STRINGS),
    ("array<int>", _arr_schema, ARRAYS),
    ("array<string>", _str_arr_schema, STR_ARRAYS),
    ("struct<a:int,b:string,c:double>", _struct_schema, None),
]


def _struct_instances(rng, n):
    out = []
    for _ in range(n):
        out.append((
            None if rng.random() < 0.3 else int(rng.choice(INTS[:-1])),
            None if rng.random() < 0.3 else str(rng.choice(STRINGS[:-1])),
            None if rng.random() < 0.5 else float(rng.choice(DOUBLES[:-1])),
        ))
    return out


def _to_py(dtype_ddl, v):
    if v is None:
        return None
    if dtype_ddl.startswith("struct"):
        d = {}
        for name, x in zip(["a", "b", "c"], v):
            d[name] = x
        return d
    return v


VARIANT_INSTANCES = [
    5, 5.0, 5.5, -1, "a", "ab", "", True, False,
    [1, 2], [1, 2, 2], ["a", 1], [],
    {"a": 1, "b": "x"}, {"a": None}, {"b": "ab"}, {}, {"a": 7, "b": "a", "c": 1},
]


def _variant_schema(rng):
    kind = rng.choice(["num", "str", "obj", "arr", "comb", "typed"])
    if kind == "num":
        return _num_schema(rng, integer=bool(rng.random() < 0.5))
    if kind == "str":
        return _str_schema(rng)
    if kind == "obj":
        s = {"properties": {"a": _num_schema(rng, integer=True),
                            "b": _str_schema(rng)}}
        if rng.random() < 0.5:
            s["required"] = rng.choice(["a", "b"], rng.integers(1, 3),
                                       replace=False).tolist()
        if rng.random() < 0.3:
            s["minProperties"] = int(rng.integers(0, 3))
        return s
    if kind == "arr":
        return {"minItems": int(rng.integers(0, 3)),
                "items": {"type": str(rng.choice(["integer", "string"]))}}
    if kind == "typed":
        return {"type": str(rng.choice(["string", "integer", "number",
                                        "boolean", "array", "object"]))}
    return _combinator(rng, lambda g: _num_schema(g))


@pytest.mark.parametrize("shape", [s[0] for s in SHAPES])
def test_differential_random(spark, shape):
    name = shape
    gen = dict((s[0], s) for s in SHAPES)[name]
    _, schema_fn, instances = gen
    rng = np.random.default_rng([42, hash(name) % (2**31)])
    dtype = T._parse_datatype_string(name)
    n_schemas = 25

    mismatches = []
    for si in range(n_schemas):
        schema = schema_fn(rng)
        if instances is None:
            insts = _struct_instances(rng, 10)
        else:
            insts = instances
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(insts)],
            T.StructType([T.StructField("i", T.IntegerType()),
                          T.StructField("v", dtype)]))
        comp = Compiler(schema)
        c = comp.compile_value(F.col("v"), dtype)
        got = {r.i: r.p for r in df.select("i", c.passed.alias("p")).collect()}
        for i, v in enumerate(insts):
            pv = _to_py(name, v)
            expected = ref_validate(pv, schema)
            if got[i] != expected:
                mismatches.append(("spark-vs-interp", schema, v,
                                   got[i], expected))
            third = third_validate(schema, pv)
            if third is not None and third != expected:
                mismatches.append(("jsonschema-vs-interp", schema, v,
                                   third, expected))
    assert not mismatches, \
        f"{len(mismatches)} mismatches, first: {mismatches[0]}"


def test_differential_variant(spark):
    """Open-document path: the same schemas evaluated over parse_json'd
    heterogeneous values must agree with the Python interpreter."""
    import json

    from json_skema_spark.plans.compile import Compiler
    rng = np.random.default_rng([42, 777])
    json_strs = [json.dumps(v) for v in VARIANT_INSTANCES]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(json_strs)], "i int, j string")
    mismatches = []
    for si in range(30):
        schema = _variant_schema(rng)
        comp = Compiler(schema)
        c = comp.compile_value(F.parse_json(F.col("j")), T.VariantType())
        got = {r.i: r.p for r in df.select("i", c.passed.alias("p")).collect()}
        for i, v in enumerate(VARIANT_INSTANCES):
            expected = ref_validate(v, schema)
            if got[i] != expected:
                mismatches.append(("spark-vs-interp", schema, v,
                                   got[i], expected))
            third = third_validate(schema, v)
            if third is not None and third != expected:
                mismatches.append(("jsonschema-vs-interp", schema, v,
                                   third, expected))
    assert not mismatches, \
        f"{len(mismatches)} mismatches, first: {mismatches[0]}"


# ---------------------------------------------------------------------------
# unevaluatedItems / unevaluatedProperties differential fuzz — targets the
# annotation-flow algebra (coverage only from SUCCESSFUL branches), where a
# real bug was found in r01 (prefix_cov gating, ADVICE r01)
# ---------------------------------------------------------------------------

def _uneval_arr_schema(rng):
    branch_a = {"prefixItems": [_num_schema(rng, integer=True)
                                for _ in range(int(rng.integers(1, 3)))]}
    branch_b = rng.choice([{"minItems": int(rng.integers(0, 3))},
                           {"items": _num_schema(rng, integer=True)},
                           {"contains": {"minimum": int(rng.integers(0, 6))}}])
    comb = str(rng.choice(["anyOf", "allOf", "oneOf"]))
    s = {comb: [branch_a, branch_b]}
    s["unevaluatedItems"] = (False if rng.random() < 0.5
                             else {"maximum": int(rng.integers(0, 8))})
    return s


def _uneval_struct_schema(rng):
    branch_a = {"properties": {"a": _num_schema(rng, integer=True)}}
    branch_b = rng.choice([{"properties": {"b": _str_schema(rng)}},
                           {"required": ["a"]},
                           {"minProperties": int(rng.integers(0, 3))}])
    comb = str(rng.choice(["anyOf", "allOf", "oneOf"]))
    s = {comb: [branch_a, branch_b]}
    s["unevaluatedProperties"] = (False if rng.random() < 0.5
                                  else {"type": str(rng.choice(
                                      ["integer", "string", "number"]))})
    return s


@pytest.mark.parametrize("kind", ["array", "struct"])
def test_differential_unevaluated(spark, kind):
    from tests.reference_interp import validate_with_unevaluated
    rng = np.random.default_rng(4242 if kind == "array" else 2424)
    if kind == "array":
        ddl, gen, insts = "array<int>", _uneval_arr_schema, ARRAYS
    else:
        ddl, gen, insts = "struct<a:int,b:string,c:double>", \
            _uneval_struct_schema, _struct_instances(rng, 10)
    dtype = T._parse_datatype_string(ddl)
    schema_t = T.StructType([T.StructField("i", T.IntegerType()),
                             T.StructField("v", dtype)])
    rows = [(i, v) for i, v in enumerate(insts)]
    df = spark.createDataFrame(rows, schema_t)
    for trial in range(30):
        s = gen(rng)
        comp = Compiler(s)
        c = comp.compile_value(F.col("v"), dtype)
        got = {r.i: r.p for r in df.select("i", c.passed.alias("p")).collect()}
        for i, v in rows:
            expected = validate_with_unevaluated(_to_py(ddl, v), s)
            assert got[i] == expected, (
                f"{kind} trial {trial}: schema={s} value={v}: "
                f"engine={got[i]} interp={expected}")


# ---------------------------------------------------------------------------
# strict-null differential fuzz: the variant path with strict_nulls=True
# (official JSON semantics — what the suite runner uses) vs an independent
# official-semantics interpreter, over null-bearing instances
# ---------------------------------------------------------------------------

STRICT_INSTANCES = [
    None, 5, 5.0, 0, -1, "a", "", True, False,
    [1, None, 2], [None], [], ["a", None],
    {"a": None}, {"a": None, "b": 1}, {"a": 1, "b": None, "c": "x"},
    {}, {"a": 7, "b": "a"}, [None, None],
]


def _strict_schema(rng):
    kind = rng.choice(["null_kw", "obj", "arr", "comb", "uneval_obj",
                       "uneval_arr"])
    if kind == "null_kw":
        return rng.choice([
            {"type": "null"},
            {"type": ["string", "null"]},
            {"const": None},
            {"enum": [None, 1, "a"]},
        ])
    if kind == "obj":
        s = {"properties": {"a": rng.choice([
                {"type": "null"}, {"type": "integer"},
                {"type": ["integer", "null"]}])}}
        if rng.random() < 0.5:
            s["required"] = ["a"]
        if rng.random() < 0.5:
            s["minProperties"] = int(rng.integers(0, 3))
        if rng.random() < 0.3:
            s["maxProperties"] = int(rng.integers(0, 3))
        if rng.random() < 0.3:
            s["dependentRequired"] = {"a": ["b"]}
        return s
    if kind == "arr":
        return rng.choice([
            {"items": {"type": "null"}},
            {"items": {"type": ["integer", "null"]}},
            {"contains": {"type": "null"}, "minContains": int(rng.integers(0, 3))},
            {"uniqueItems": True},
            {"prefixItems": [{"type": "null"}], "items": {"type": "integer"}},
        ])
    if kind == "uneval_obj":
        return {"properties": {"a": True},
                "unevaluatedProperties": rng.choice(
                    [False, {"type": "null"}, {"type": "integer"}])}
    if kind == "uneval_arr":
        return {"prefixItems": [True],
                "unevaluatedItems": rng.choice(
                    [False, {"type": "null"}, {"type": "integer"}])}
    return {"anyOf": [{"type": "null"}, {"minimum": 3}]}


def test_differential_strict_nulls(spark):
    """strict_nulls=True variant path vs the official-semantics Python
    interpreter (tests/reference_interp.validate_strict): JSON null is a
    present 'null'-typed value everywhere — type, const/enum, required,
    property counting, array elements, unevaluated coverage."""
    import json

    from tests.reference_interp import validate_strict

    rng = np.random.default_rng([42, 31337])
    json_strs = [json.dumps(v) for v in STRICT_INSTANCES]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(json_strs)], "i int, j string")
    mismatches = []
    for si in range(40):
        schema = _strict_schema(rng)
        if isinstance(schema, np.ndarray):  # rng.choice wraps dicts
            schema = schema.item()
        comp = Compiler(schema, strict_nulls=True)
        c = comp.compile_value(F.parse_json(F.col("j")), T.VariantType())
        got = {r.i: r.p for r in df.select("i", c.passed.alias("p")).collect()}
        for i, v in enumerate(STRICT_INSTANCES):
            expected = validate_strict(v, schema)
            if got[i] != expected:
                mismatches.append((schema, v, got[i], expected))
    assert not mismatches, \
        f"{len(mismatches)} mismatches, first: {mismatches[0]}"
