"""Schema-evolution compatibility analysis (plans/compat.py).

The core guarantee fuzz-pinned here is the delta contract: for instances
valid under v1,   valid under v2  <=>  valid under delta_schema(v1, v2)
(with delta None meaning "valid under v2" unconditionally). The
differential oracle is the same annotation-correct interpreter the
compile fuzz uses (tests/reference_interp.py).
"""

import copy

import numpy as np
import pytest

from json_skema_spark.plans.compat import (
    NARROWING, UNKNOWN, WIDENING, compat_report, delta_schema,
    is_backward_compatible)
from tests.reference_interp import validate
from tests.test_differential import (
    ARRAYS, INTS, STR_ARRAYS, STRINGS, _arr_schema, _combinator,
    _num_schema, _str_arr_schema, _str_schema, _struct_schema)

# ---------------------------------------------------------------- unit cases

V1 = {"type": "object",
      "properties": {"price": {"type": "number", "minimum": 0,
                               "maximum": 100},
                     "tag": {"enum": ["a", "b"]}},
      "required": ["price"]}


def _kinds(old, new):
    return {(c.pointer, c.kind) for c in compat_report(old, new)}


def test_widening_detected():
    v2 = copy.deepcopy(V1)
    v2["properties"]["price"]["maximum"] = 200          # relaxed
    v2["properties"]["tag"]["enum"] = ["a", "b", "c"]   # grew
    del v2["required"]                                  # dropped
    assert is_backward_compatible(V1, v2)
    assert delta_schema(V1, v2) is None


def test_narrowing_produces_minimal_delta():
    v2 = copy.deepcopy(V1)
    v2["properties"]["price"]["maximum"] = 50           # tightened
    v2["required"] = ["price", "tag"]                   # tag newly required
    assert not is_backward_compatible(V1, v2)
    d = delta_schema(V1, v2)
    assert d == {"properties": {"price": {"maximum": 50}},
                 "required": ["tag"]}


def test_pattern_change_is_unknown():
    old = {"pattern": "^a"}
    new = {"pattern": "^b"}
    assert _kinds(old, new) == {("#/pattern", UNKNOWN)}
    assert delta_schema(old, new) == {"pattern": "^b"}


def test_min_contains_default_is_one():
    old = {"contains": {"minimum": 0}, "minContains": 0}
    new = {"contains": {"minimum": 0}}                  # effective 0 -> 1
    assert _kinds(old, new) == {("#/minContains", NARROWING)}
    old2 = {"contains": {"minimum": 0}, "minContains": 2}
    new2 = {"contains": {"minimum": 0}}                 # effective 2 -> 1
    assert _kinds(old2, new2) == {("#/minContains", WIDENING)}


def test_multiple_of_divisor_widens():
    assert _kinds({"multipleOf": 4}, {"multipleOf": 2}) == \
        {("#/multipleOf", WIDENING)}
    assert _kinds({"multipleOf": 2}, {"multipleOf": 4}) == \
        {("#/multipleOf", NARROWING)}


def test_removed_property_depends_on_additional_properties():
    old = {"properties": {"a": {"type": "integer"}, "b": {"type": "string"}}}
    new_open = {"properties": {"a": {"type": "integer"}}}
    assert is_backward_compatible(old, new_open)
    new_closed = {"properties": {"a": {"type": "integer"}},
                  "additionalProperties": False}
    rep = compat_report(old, new_closed)
    assert any(c.kind != WIDENING for c in rep)
    d = delta_schema(old, new_closed)
    # the delta must forbid b AND carry the additionalProperties context
    assert d is not None


def test_defs_change_falls_back_to_full_doc():
    old = {"$defs": {"p": {"minimum": 0}},
           "properties": {"a": {"$ref": "#/$defs/p"}}}
    new = {"$defs": {"p": {"minimum": 5}},
           "properties": {"a": {"$ref": "#/$defs/p"}}}
    assert delta_schema(old, new) == new
    assert not is_backward_compatible(old, new)


def test_ref_in_delta_carries_defs():
    old = {"$defs": {"p": {"minimum": 0}},
           "properties": {"a": {"type": "integer"}}}
    new = {"$defs": {"p": {"minimum": 0}},
           "properties": {"a": {"$ref": "#/$defs/p"}}}
    d = delta_schema(old, new)
    assert d["$defs"] == {"p": {"minimum": 0}}


# ------------------------------------------------------- differential fuzz

def _mutate(rng, doc):
    """One structural mutation: drop / tweak / graft a keyword somewhere."""
    d = copy.deepcopy(doc)
    nodes = []

    def collect(n):
        if isinstance(n, dict):
            nodes.append(n)
            for v in n.values():
                collect(v)
        elif isinstance(n, list):
            for v in n:
                collect(v)

    collect(d)
    node = nodes[int(rng.integers(0, len(nodes)))]
    op = rng.choice(["drop", "tweak", "add"])
    keys = [k for k in node if not isinstance(node[k], (dict, list))
            or k in ("enum", "required")]
    if op == "drop" and node:
        node.pop(list(node)[int(rng.integers(0, len(node)))], None)
    elif op == "tweak" and keys:
        k = keys[int(rng.integers(0, len(keys)))]
        v = node[k]
        if isinstance(v, bool):
            node[k] = not v
        elif isinstance(v, (int, float)):
            node[k] = v + int(rng.choice([-2, -1, 1, 2]))
            if k == "multipleOf" and node[k] <= 0:
                node[k] = abs(node[k]) or 1  # spec: multipleOf > 0
        elif isinstance(v, str) and k != "type":
            node[k] = v + "x"
        elif isinstance(v, list) and v:
            if rng.random() < 0.5 and len(v) > 1:
                node[k] = v[:-1]
            else:
                node[k] = v + [v[0]]
    else:
        node[rng.choice(["minimum", "minLength", "minItems"])] = \
            int(rng.integers(0, 4))
    return d


_SHAPE_POOLS = [
    (lambda r: _combinator(r, lambda g: _num_schema(g, integer=True)), INTS),
    (lambda r: _combinator(r, _str_schema), STRINGS),
    (_arr_schema, ARRAYS),
    (_str_arr_schema, STR_ARRAYS),
]


def _struct_pool(rng, n=24):
    out = []
    for _ in range(n):
        d = {}
        if rng.random() < 0.8:
            d["a"] = int(rng.choice([x for x in INTS if x is not None]))
        if rng.random() < 0.8:
            d["b"] = str(rng.choice([x for x in STRINGS if x is not None]))
        if rng.random() < 0.4:
            d["c"] = float(rng.integers(-2, 5))
        out.append(d)
    return out


@pytest.mark.parametrize("mode", ["mutated", "independent"])
def test_delta_contract_fuzz(mode):
    rng = np.random.default_rng(2026 if mode == "mutated" else 20262)
    checked = 0
    for trial in range(400):
        kind = int(rng.integers(0, 5))
        if kind < 4:
            gen, pool = _SHAPE_POOLS[kind]
            v1 = gen(rng)
            instances = [x for x in pool if x is not None]
        else:
            v1 = _struct_schema(rng)
            instances = _struct_pool(rng)
        v2 = _mutate(rng, v1) if mode == "mutated" else (
            _SHAPE_POOLS[kind][0](rng) if kind < 4 else _struct_schema(rng))

        delta = delta_schema(v1, v2)
        bc = is_backward_compatible(v1, v2)
        for x in instances:
            if not validate(x, v1):
                continue
            checked += 1
            under_v2 = validate(x, v2)
            under_delta = True if delta is None else validate(x, delta)
            assert under_v2 == under_delta, (
                f"delta contract broken: v1={v1} v2={v2} delta={delta} "
                f"x={x!r} v2={under_v2} delta_verdict={under_delta}")
            if bc:
                assert under_v2, (
                    f"claimed backward-compatible but rejects: v1={v1} "
                    f"v2={v2} x={x!r}")
    assert checked > 500  # the fuzz actually exercised v1-valid instances


# -------------------------------------------------- Spark integration

def test_delta_compiles_and_matches_v2_on_spark(spark):
    """The delta document compiles through the real engine and its verdict
    equals v2's verdict on v1-valid rows."""
    from json_skema_spark.plans.compile import Compiler
    from json_skema_spark.plans.verdict import ValidationPlan

    v1 = {"properties": {"price": {"type": "number", "minimum": 0,
                                   "maximum": 100},
                         "qty": {"type": "integer", "minimum": 0}},
          "required": ["price"]}
    v2 = copy.deepcopy(v1)
    v2["properties"]["price"]["maximum"] = 50
    v2["required"] = ["price", "qty"]

    df = spark.createDataFrame(
        [(10.0, 1), (60.0, 2), (40.0, None), (200.0, 3), (None, 4)],
        "price double, qty int")
    d = delta_schema(v1, v2)

    def verdict(doc):
        plan = ValidationPlan(Compiler(doc), df.schema)
        return [r.passed for r in df.select(plan.passed.alias("passed"))
                .collect()]

    ok_v1 = verdict(v1)
    ok_v2 = verdict(v2)
    ok_d = verdict(d)
    for i, valid1 in enumerate(ok_v1):
        if valid1:
            assert ok_v2[i] == ok_d[i]
    # and the delta really is smaller: one property + required only
    assert set(d) == {"properties", "required"}
    assert set(d["properties"]) == {"price"}


def test_corpus_schemas_self_compatible():
    """Identity sanity over the whole conformance corpus: diffing any real
    schema against itself reports nothing, and a deep copy is
    backward-compatible with a None delta."""
    from json_skema_spark.sources.corpus import CASES
    for case in CASES:
        assert compat_report(case.schema, case.schema) == []
        twin = copy.deepcopy(case.schema)
        assert is_backward_compatible(case.schema, twin), case.name
        assert delta_schema(case.schema, twin) is None, case.name


def test_pattern_properties_beside_additional_properties_not_widening():
    """Review regression: removing patternProperties re-routes keys to
    additionalProperties — NOT a pure widening, delta must carry context."""
    old = {"patternProperties": {"^x": {}}, "additionalProperties": False}
    new = {"additionalProperties": False}
    assert not is_backward_compatible(old, new)
    # delta is the full new node -> carries the additionalProperties
    # context ({'x1': 1} is v1-valid, v2-invalid; a context-free delta
    # would pass it)
    assert delta_schema(old, new) == new

    changed = {"patternProperties": {"^y": {}}, "additionalProperties": False}
    d2 = delta_schema(old, changed)
    assert d2 == changed  # not a context-free patternProperties copy


def test_internal_ref_into_body_falls_back_to_full_doc():
    """Review regression: a $ref into the document body couples its site
    to changes the local diff cannot see."""
    old = {"properties": {"x": {"minimum": 0},
                          "y": {"$ref": "#/properties/x"}}}
    new = {"properties": {"x": {"minimum": 5},
                          "y": {"$ref": "#/properties/x"}}}
    assert delta_schema(old, new) == new  # y must be re-checked too
    assert not is_backward_compatible(old, new)


def _ap_schema(rng):
    """Object schemas exercising the context-coupled keywords: properties
    name-sets, patternProperties, additionalProperties (bool and schema)."""
    s = {}
    props = {}
    for name in ("a", "b"):
        if rng.random() < 0.6:
            props[name] = _num_schema(rng, integer=True)
    if props:
        s["properties"] = props
    r = rng.random()
    if r < 0.35:
        s["additionalProperties"] = False
    elif r < 0.6:
        s["additionalProperties"] = _num_schema(rng, integer=True)
    if rng.random() < 0.5:
        s["patternProperties"] = {
            str(rng.choice(["^x", "^y", "[0-9]$"])):
            _num_schema(rng, integer=True)}
    if rng.random() < 0.4:
        s["required"] = [str(rng.choice(["a", "b", "x1"]))]
    return s


def _ap_pool(rng, n=24):
    keys = ["a", "b", "x1", "x2", "y9", "q"]
    out = []
    for _ in range(n):
        d = {}
        for k in keys:
            if rng.random() < 0.45:
                d[k] = int(rng.choice([x for x in INTS if x is not None]))
        out.append(d)
    return out


@pytest.mark.parametrize("mode", ["mutated", "independent"])
def test_delta_contract_fuzz_additional_pattern_properties(mode):
    """Review regression fuzz: the delta contract must hold when
    properties / patternProperties / additionalProperties interact."""
    rng = np.random.default_rng(77 if mode == "mutated" else 778)
    checked = 0
    for _ in range(400):
        v1 = _ap_schema(rng)
        v2 = _mutate(rng, v1) if mode == "mutated" else _ap_schema(rng)
        delta = delta_schema(v1, v2)
        bc = is_backward_compatible(v1, v2)
        for x in _ap_pool(rng):
            if not validate(x, v1):
                continue
            checked += 1
            under_v2 = validate(x, v2)
            under_delta = True if delta is None else validate(x, delta)
            assert under_v2 == under_delta, (
                f"delta contract broken: v1={v1} v2={v2} delta={delta} x={x}")
            if bc:
                assert under_v2, f"bc but rejects: v1={v1} v2={v2} x={x}"
    assert checked > 1000


def test_polarity_inverting_ref_blocks_certification():
    """Review regression: a body-ref under `not` inverts polarity — a
    widening at the target narrows the site, so a 'pure widening' report
    must not certify, and the delta must be the full document."""
    old = {"properties": {"x": {"minimum": 5},
                          "y": {"not": {"$ref": "#/properties/x"}}}}
    new = {"properties": {"x": {"minimum": 0},   # widened at the target...
                          "y": {"not": {"$ref": "#/properties/x"}}}}
    # ...but {'x': 7, 'y': 3} is v1-valid and v2-invalid (3 now matches x)
    assert not is_backward_compatible(old, new)
    assert delta_schema(old, new) == new


def test_dangling_defs_ref_never_certified():
    """ADVICE r03: removing $defs while a '#/$defs/x' $ref remains must
    not classify as a pure widening — v2 cannot compile."""
    from json_skema_spark.plans.compat import (delta_schema,
                                               is_backward_compatible)
    old = {"properties": {"a": {"$ref": "#/$defs/pos"}},
           "$defs": {"pos": {"type": "integer", "minimum": 0}}}
    new = {"properties": {"a": {"$ref": "#/$defs/pos"}}}  # $defs removed
    assert is_backward_compatible(old, new) is False
    # no silent None (skip-revalidation): the full doc comes back so the
    # compiler raises loudly on the dangling ref
    assert delta_schema(old, new) == new

    # removing one definition among several, same story
    old2 = {"properties": {"a": {"$ref": "#/$defs/x"},
                           "b": {"$ref": "#/$defs/y"}},
            "$defs": {"x": {"minimum": 0}, "y": {"maximum": 9}}}
    new2 = {"properties": {"a": {"$ref": "#/$defs/x"},
                           "b": {"$ref": "#/$defs/y"}},
            "$defs": {"x": {"minimum": 0}}}
    assert is_backward_compatible(old2, new2) is False
    assert delta_schema(old2, new2) == new2

    # control: intact $defs with a true widening still certifies
    old3 = {"properties": {"a": {"$ref": "#/$defs/x"}}, "required": ["a"],
            "$defs": {"x": {"minimum": 0}}}
    new3 = {"properties": {"a": {"$ref": "#/$defs/x"}},
            "$defs": {"x": {"minimum": 0}}}
    assert is_backward_compatible(old3, new3) is True
    assert delta_schema(old3, new3) is None


def test_defs_ref_with_list_index_not_misjudged_dangling():
    """Review regression: '#/$defs/x/allOf/0' steps through a LIST — the
    dangling-ref probe must use the resolver's pointer walk, not a
    dict-only reimplementation, or a pure widening triggers a full
    10^12-row re-validation."""
    from json_skema_spark.plans.compat import (delta_schema,
                                               is_backward_compatible)
    old = {"properties": {"a": {"$ref": "#/$defs/x/allOf/0"}},
           "required": ["a"],
           "$defs": {"x": {"allOf": [{"minimum": 0}]}}}
    new = {"properties": {"a": {"$ref": "#/$defs/x/allOf/0"}},
           "$defs": {"x": {"allOf": [{"minimum": 0}]}}}
    assert is_backward_compatible(old, new) is True
    assert delta_schema(old, new) is None


def test_items_delta_carries_prefix_context():
    """Review r04 (confirmed by execution): delta carrying items without
    prefixItems applies items to tuple-prefix slots and rejects v2-valid
    rows."""
    from json_skema_spark.plans.compat import delta_schema
    old = {"prefixItems": [{"type": "string"}]}
    new = {"prefixItems": [{"type": "string"}], "items": {"type": "integer"}}
    assert delta_schema(old, new) == {"items": {"type": "integer"},
                                      "prefixItems": [True]}
    # narrowed items beside unchanged prefix: same carry
    old2 = {"prefixItems": [{"type": "string"}], "items": {"type": "number"}}
    new2 = {"prefixItems": [{"type": "string"}], "items": {"type": "integer"}}
    d2 = delta_schema(old2, new2)
    assert d2["prefixItems"] == [True] and "items" in d2


def test_const_null_not_invisible():
    """Review r04 (confirmed): .get() conflated absent with const:null —
    adding const:null certified a hard narrowing as compatible."""
    from json_skema_spark.plans.compat import (compat_report, delta_schema,
                                               is_backward_compatible)
    old = {"type": ["string", "null"]}
    new = {"type": ["string", "null"], "const": None}
    assert is_backward_compatible(old, new) is False
    assert delta_schema(old, new) == {"const": None}
    assert is_backward_compatible({"const": 5}, {"const": None}) is False
    assert delta_schema({"const": 5}, {"const": None}) == {"const": None}
    assert is_backward_compatible({"const": None}, {}) is True   # removal widens
    assert compat_report({"const": None}, {"const": None}) == []  # unchanged


def test_id_change_refuses_certification():
    """Review r04 (confirmed): changing $id rebases relative $ref
    resolution — an $id-only diff must not certify."""
    from json_skema_spark.plans.compat import (delta_schema,
                                               is_backward_compatible)
    old = {"$id": "https://ex/v1/r.json",
           "properties": {"x": {"$ref": "item.json"}}}
    new = {"$id": "https://ex/v2/r.json",
           "properties": {"x": {"$ref": "item.json"}}}
    assert is_backward_compatible(old, new) is False
    assert delta_schema(old, new) == new


def test_multiple_of_tolerance_is_relative():
    """Review r04 (confirmed): absolute 1e-12 tolerance called any
    sub-picoscale divisor pair integer multiples."""
    from json_skema_spark.plans.compat import is_backward_compatible
    assert is_backward_compatible({"multipleOf": 1.5e-13},
                                  {"multipleOf": 1e-13}) is False
    assert is_backward_compatible({"multipleOf": 4},
                                  {"multipleOf": 2}) is True
    assert is_backward_compatible({"multipleOf": 0.3},
                                  {"multipleOf": 0.1}) is True
