"""Reference-contract renderers (toJSON / toString field parity)."""

import json

from json_skema_spark import compile_schema
from json_skema_spark.plans.render import to_json_rows, to_text


def test_render_json_and_text(spark):
    df = spark.createDataFrame([("k1", 99)], "id string, sr int")
    plan = compile_schema({"properties": {"sr": {"enum": [1, 2]}}}, df.schema)
    v = plan.violations(df, "id")
    j = json.loads(to_json_rows(v).collect()[0].json)
    # exact ValidationFailure.toJSON() keys (ValidationFailure.kt:35-50)
    assert set(j) == {"instanceRef", "schemaRef", "dynamicPath", "message",
                      "keyword"}
    assert j["instanceRef"] == "#/sr"
    assert j["schemaRef"] == "#/properties/sr/enum"
    t = to_text(v).collect()[0].text
    assert t.startswith("row k1, at #/sr: the instance is not equal")


def test_causes_hierarchy_golden(spark):
    """Nested-causes JSON doc parity with ValidationFailure.toJSON():
    pass -> null; 1 failure -> leaf object; >1 -> aggregate node with
    message 'multiple validation failures', no keyword, causes children
    (AggregatingValidationFailure, ValidationFailure.kt:62-82)."""
    from json_skema_spark.plans.render import to_json_document

    df = spark.createDataFrame(
        [("ok", 1, "x"), ("one", 99, "x"), ("two", 99, "toolong")],
        "id string, sr int, name string")
    plan = compile_schema(
        {"properties": {"sr": {"enum": [1, 2]},
                        "name": {"maxLength": 3}}}, df.schema)
    out = {r.row_key: r.failure_json
           for r in to_json_document(plan.apply(df), "id").collect()}
    assert out["ok"] is None
    leaf = json.loads(out["one"])
    assert set(leaf) == {"instanceRef", "schemaRef", "dynamicPath",
                         "message", "keyword"}
    assert leaf["keyword"] == "enum"
    agg = json.loads(out["two"])
    assert agg["message"] == "multiple validation failures"
    assert "keyword" not in agg
    assert {c["keyword"] for c in agg["causes"]} == {"enum", "maxLength"}
    for c in agg["causes"]:
        assert set(c) == {"instanceRef", "schemaRef", "dynamicPath",
                          "message", "keyword"}
