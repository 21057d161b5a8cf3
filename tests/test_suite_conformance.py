"""JSON-Schema-Test-Suite-format conformance gate.

Mirrors the reference's TestSuiteTest (TestSuiteTest.kt:97-161): loads every
group under tests/suite/draft2020-12 (skipping /remotes/ and /optional/
except the nine supported format files), drives each case through the
compiled VariantType path with strict JSON-null semantics, and fails on any
case that is neither green nor on the explicit skip-list below.

Provenance: the sandbox has no network and the reference's test-suite
submodule is not checked out, so tests/suite/ is a re-authored corpus in
the official file format (see sources/suite.py docstring). Pointing
``SUITE_ROOT`` at a real json-schema-org checkout runs it unchanged.
"""

import os

import pytest

from json_skema_spark.sources.suite import load_suite_groups, run_suite

# Drop-in switch for the OFFICIAL corpus: point JSON_SCHEMA_SUITE_ROOT at
# the `tests/` directory of a json-schema-org/JSON-Schema-Test-Suite
# checkout (the dir containing draft2020-12/) and this gate runs it
# unchanged. Default: the re-authored in-repo corpus (same file format).
def _suite_root() -> str:
    return os.environ.get(
        "JSON_SCHEMA_SUITE_ROOT",
        os.path.join(os.path.dirname(__file__), "suite"))


SUITE_ROOT = _suite_root()
_OFFICIAL = "JSON_SCHEMA_SUITE_ROOT" in os.environ

# (file, group description, test description) -> reason. Empty = everything
# green. Entries here must name a documented engine divergence, never hide
# an unexplained failure.
SKIP: dict[tuple[str, str, str], str] = {}

# every keyword family the corpus must exercise (coverage self-check so a
# deleted file cannot silently shrink the gate)
REQUIRED_FILES = {
    "type.json", "enum.json", "const.json", "multipleOf.json",
    "maximum.json", "minimum.json", "exclusiveMaximum.json",
    "exclusiveMinimum.json", "maxLength.json", "minLength.json",
    "pattern.json", "properties.json", "required.json",
    "additionalProperties.json", "patternProperties.json",
    "propertyNames.json", "maxProperties.json", "minProperties.json",
    "dependentRequired.json", "dependentSchemas.json", "items.json",
    "prefixItems.json", "contains.json", "maxContains.json",
    "minContains.json", "maxItems.json", "minItems.json",
    "uniqueItems.json", "allOf.json", "anyOf.json", "oneOf.json",
    "not.json", "if-then-else.json", "boolean_schema.json", "default.json",
    "format.json", "content.json", "ref.json", "refRemote.json",
    "defs.json", "anchor.json", "dynamicRef.json", "id.json",
    "unevaluatedItems.json", "unevaluatedProperties.json",
    "infinite-loop-detection.json", "vocabulary.json",
    "unknownKeyword.json",
    "optional/format/date.json", "optional/format/date-time.json",
    "optional/format/time.json", "optional/format/duration.json",
    "optional/format/email.json", "optional/format/ipv4.json",
    "optional/format/ipv6.json", "optional/format/uri.json",
    "optional/format/uuid.json",
}


@pytest.mark.skipif(_OFFICIAL, reason="coverage floor pins the in-repo "
                    "corpus; the official checkout has its own file set")
def test_suite_files_cover_required_keywords():
    groups = load_suite_groups(SUITE_ROOT)
    files = {g.file for g in groups}
    missing = REQUIRED_FILES - files
    assert not missing, f"suite corpus lost keyword files: {sorted(missing)}"


def test_suite_conformance(spark):
    results = run_suite(spark, SUITE_ROOT)
    assert len(results) > 900  # corpus size floor
    failures = []
    skipped = []
    for r in results:
        key = (r.file, r.group, r.test)
        if key in SKIP:
            skipped.append((key, SKIP[key]))
            continue
        if not r.ok:
            failures.append(
                f"{r.file} / {r.group} / {r.test}: expected "
                f"{r.expected}, got {r.got} {r.error or ''}")
    n_pass = len(results) - len(failures) - len(skipped)
    print(f"\nsuite: {n_pass}/{len(results)} pass, "
          f"{len(skipped)} skipped (documented)")
    assert not failures, "\n".join(failures[:25])


def test_official_checkout_layout_runs_unchanged(spark, tmp_path,
                                                 monkeypatch):
    """The JSON_SCHEMA_SUITE_ROOT switch: a directory in the official
    checkout layout (<root>/draft2020-12/*.json) loads and runs without
    edits — proof a real json-schema-org checkout drops in."""
    import json as _json
    d = tmp_path / "official" / "draft2020-12"
    d.mkdir(parents=True)
    (d / "type.json").write_text(_json.dumps([{
        "description": "integer type",
        "schema": {"type": "integer"},
        "tests": [
            {"description": "an int", "data": 3, "valid": True},
            {"description": "a string", "data": "x", "valid": False},
        ]}]))
    monkeypatch.setenv("JSON_SCHEMA_SUITE_ROOT",
                       str(tmp_path / "official"))
    root = _suite_root()  # the same resolution the module does at import
    assert root.endswith("official")
    results = run_suite(spark, root)
    assert len(results) == 2 and all(r.ok for r in results)
