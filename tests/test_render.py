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
