"""Schema-document model: pointers, anchors, registry, YAML loading —
mirrors the reference's loader tests (SchemaLoaderTest / RefResolutionTest)."""

import pytest

from json_skema_spark.plans.model import (Resolver, SchemaError,
                                          evaluate_pointer,
                                          load_schema_document,
                                          pointer_escape, pointer_unescape)


def test_pointer_escaping_rfc6901():
    assert pointer_unescape("a~1b") == "a/b"
    assert pointer_unescape("m~0n") == "m~n"
    assert pointer_escape("a/b~c") == "a~1b~0c"


def test_evaluate_pointer():
    doc = {"a": {"b": [10, {"c": 3}]}, "x/y": 7, "": 9}
    assert evaluate_pointer(doc, "/a/b/0") == 10
    assert evaluate_pointer(doc, "/a/b/1/c") == 3
    assert evaluate_pointer(doc, "/x~1y") == 7
    assert evaluate_pointer(doc, "") == doc
    with pytest.raises(SchemaError):
        evaluate_pointer(doc, "/missing")
    with pytest.raises(SchemaError):
        evaluate_pointer(doc, "/a/b/9")


def test_resolver_anchors_and_ids():
    doc = {
        "$id": "https://example.test/root.json",
        "$defs": {
            "a": {"$anchor": "alpha", "minimum": 1},
            "sub": {"$id": "sub.json",
                    "$defs": {"b": {"$anchor": "beta", "maximum": 2}}},
        },
    }
    r = Resolver(doc)
    node, _ = r.resolve("#alpha", "https://example.test/root.json")
    assert node["minimum"] == 1
    node, scope = r.resolve("sub.json#beta", "https://example.test/root.json")
    assert node["maximum"] == 2
    node, _ = r.resolve("#/$defs/a", "https://example.test/root.json")
    assert node["minimum"] == 1
    with pytest.raises(SchemaError):
        r.resolve("#nope", "https://example.test/root.json")
    with pytest.raises(SchemaError):
        r.resolve("https://other.test/x.json#/a", "https://example.test/root.json")


def test_dynamic_anchor_outermost_wins():
    doc = {
        "$id": "https://e.test/r",
        "$dynamicAnchor": "node", "minimum": 0,
        "$defs": {"inner": {"$id": "https://e.test/inner",
                            "$dynamicAnchor": "node", "maximum": 5}},
    }
    r = Resolver(doc)
    hit = r.resolve_dynamic("#node", ["https://e.test/r", "https://e.test/inner"])
    assert hit is not None and hit[0]["minimum"] == 0  # outermost scope wins


def test_registry_from_dir(tmp_path):
    from json_skema_spark.plans.model import registry_from_dir
    (tmp_path / "pos.json").write_text('{"$id": "https://e.test/pos", "minimum": 0}')
    (tmp_path / "name.yaml").write_text("type: string\nminLength: 1\n")
    reg = registry_from_dir(str(tmp_path), base_uri="https://e.test/schemas/")
    assert reg["https://e.test/pos"]["minimum"] == 0
    assert reg["https://e.test/schemas/pos.json"]["minimum"] == 0
    assert reg["https://e.test/schemas/name.yaml"]["minLength"] == 1
    r = Resolver({"$ref": "https://e.test/pos"}, registry=reg)
    node, _ = r.resolve("https://e.test/pos", "")
    assert node["minimum"] == 0


def test_load_schema_document_json_and_yaml():
    assert load_schema_document('{"type": "string"}') == {"type": "string"}
    assert load_schema_document("type: string\nminLength: 2\n") == {
        "type": "string", "minLength": 2}


def test_compile_errors_collected_into_one_aggregate():
    """Reference contract (SchemaLoader.kt:336-341,494,551-553): every
    independent schema mistake surfaces in ONE aggregate raise with its
    schema pointer, not one recompile at a time (VERDICT r02 #4)."""
    import pytest
    from pyspark.sql import types as T

    from json_skema_spark.plans.compile import (AggregateCompileError,
                                                CompileError, Compiler)

    st = T.StructType([T.StructField("a", T.StringType()),
                       T.StructField("b", T.LongType())])
    doc = {"properties": {"a": 5,                      # not a schema node
                          "b": {"$ref": "#/$defs/r"}},  # infinite recursion
           "$defs": {"r": {"$ref": "#/$defs/r"}}}
    with pytest.raises(AggregateCompileError) as ei:
        Compiler(doc, max_depth=8).compile_root(st)
    locs = {e.location for e in ei.value.errors}
    assert "#/properties/a" in locs
    assert any(loc and "$defs/r" in loc for loc in locs)
    assert len(ei.value.errors) == 2
    # both pointers appear in the rendered message too
    assert "#/properties/a" in str(ei.value)
    # aggregate IS-A CompileError: existing first-error callers keep working
    assert isinstance(ei.value, CompileError)
    # opt-out restores fail-fast
    with pytest.raises(CompileError) as ei2:
        Compiler(doc, max_depth=8, collect_errors=False).compile_root(st)
    assert not isinstance(ei2.value, AggregateCompileError)


def test_driver_contract_fully_oracled():
    """Every queries() entry must carry a DuckDB oracle (the correctness
    gate); a key present on only one side is a silent coverage hole."""
    import __spark_entry__ as e
    qs, oracles = set(e.queries()), set(e.oracle_sql())
    assert oracles == qs, (sorted(qs - oracles), sorted(oracles - qs))


def test_anchor_under_property_named_const_or_enum():
    """The anchor indexer's enum/const stop-list is position-aware: a
    PROPERTY literally named 'const' or 'enum' is a schema and must be
    indexed (only keyword-position enum/const hold raw data)."""
    from json_skema_spark.plans.model import Resolver

    doc = {"properties": {
        "const": {"$anchor": "A", "type": "integer"},
        "enum": {"$anchor": "B", "type": "string"},
    }}
    r = Resolver(doc)
    node, _ = r.resolve("#A", "")
    assert node["type"] == "integer"
    node2, _ = r.resolve("#B", "")
    assert node2["type"] == "string"
    # keyword-position const/enum values stay un-indexed (raw data)
    data_doc = {"const": {"$anchor": "C"}}
    import pytest as _pytest

    from json_skema_spark.plans.model import SchemaError
    with _pytest.raises(SchemaError):
        Resolver(data_doc).resolve("#C", "")
