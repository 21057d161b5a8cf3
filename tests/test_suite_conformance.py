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

SUITE_ROOT = os.path.join(os.path.dirname(__file__), "suite")

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
    "optional/format/date.json", "optional/format/date-time.json",
    "optional/format/time.json", "optional/format/duration.json",
    "optional/format/email.json", "optional/format/ipv4.json",
    "optional/format/ipv6.json", "optional/format/uri.json",
    "optional/format/uuid.json",
}


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
