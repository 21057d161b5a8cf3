"""Tiny pure-Python validation interpreter used ONLY as a differential-test
oracle: implements the engine's documented semantics (draft 2020-12 keyword
subset + NULL=absent convention) the way the reference's interpreted walk
does (one value at a time), so randomized schemas/instances can cross-check
the compiled Column predicates.

Semantics notes (must match plans/compile.py):
- value None = absent: every value keyword passes; `required` fails on
  absent members; `type: "null"` passes on absent.
- numeric min/max compare as doubles; multipleOf is exact (Fraction).
- pattern is unanchored search (same as rlike).
"""

from __future__ import annotations

import math
import re
from fractions import Fraction


def _json_type(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(v)


def _type_ok(t, v):
    a = _json_type(v)
    if t == a:
        return True
    if t == "number" and a == "integer":
        return True
    if t == "integer" and a == "number":
        return float(v) == math.floor(v)
    return False


def _eq(a, b):
    ta, tb = _json_type(a), _json_type(b)
    if {ta, tb} <= {"integer", "number"}:
        return float(a) == float(b) and isinstance(a, bool) == isinstance(b, bool)
    if ta != tb:
        return False
    if ta == "array":
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if ta == "object":
        # engine convention: absent (None) members don't count as present
        ka = {k for k, v in a.items() if v is not None}
        kb = {k for k, v in b.items() if v is not None}
        return ka == kb and all(_eq(a[k], b[k]) for k in ka)
    return a == b


def validate(value, schema) -> bool:
    """True = valid under the engine's semantics."""
    if schema is True or schema == {}:
        return True
    if schema is False:
        return value is None  # absent passes (keyword never applies)

    s = schema
    if value is None:
        # absent: only combinators over absent still evaluate vacuously-true
        # except `required`-style checks live at the parent; replicate the
        # engine: everything passes on absent except type:"null" which also
        # passes. Combinators recurse but their leaf keywords also pass.
        pass

    ok = True
    if "$ref" in s and isinstance(s.get("$defs_root"), dict):
        pass  # refs resolved by caller (generator emits none)

    if "type" in s and value is not None:
        ts = s["type"] if isinstance(s["type"], list) else [s["type"]]
        ok &= any(_type_ok(t, value) if t != "null" else value is None
                  for t in ts)
    if "const" in s and value is not None:
        ok &= _eq(value, s["const"])
    if "enum" in s and value is not None:
        ok &= any(_eq(value, v) for v in s["enum"])

    if value is not None and isinstance(value, (int, float)) \
            and not isinstance(value, bool):
        if "minimum" in s:
            ok &= float(value) >= float(s["minimum"])
        if "maximum" in s:
            ok &= float(value) <= float(s["maximum"])
        if "exclusiveMinimum" in s:
            ok &= float(value) > float(s["exclusiveMinimum"])
        if "exclusiveMaximum" in s:
            ok &= float(value) < float(s["exclusiveMaximum"])
        if "multipleOf" in s:
            q = Fraction(str(value)) / Fraction(str(s["multipleOf"]))
            ok &= q.denominator == 1

    if value is not None and isinstance(value, str):
        if "minLength" in s:
            ok &= len(value) >= s["minLength"]
        if "maxLength" in s:
            ok &= len(value) <= s["maxLength"]
        if "pattern" in s:
            ok &= re.search(s["pattern"], value) is not None

    if value is not None and isinstance(value, dict):
        present = {k for k, v in value.items() if v is not None}
        if "required" in s:
            ok &= all(k in present for k in s["required"])
        if "minProperties" in s:
            ok &= len(present) >= s["minProperties"]
        if "maxProperties" in s:
            ok &= len(present) <= s["maxProperties"]
        for k, sub in (s.get("properties") or {}).items():
            if k in value:
                ok &= validate(value.get(k), sub)
        pprops = s.get("patternProperties") or {}
        for pat, sub in pprops.items():
            for k in present:
                if re.search(pat, k):
                    ok &= validate(value[k], sub)
        if "additionalProperties" in s:
            named = set(s.get("properties") or {})
            for k in present:
                if k in named or any(re.search(p, k) for p in pprops):
                    continue
                ok &= validate(value[k], s["additionalProperties"])
        for k, deps in (s.get("dependentRequired") or {}).items():
            if k in present:
                ok &= all(d in present for d in deps)

    if value is not None and isinstance(value, list):
        if "minItems" in s:
            ok &= len(value) >= s["minItems"]
        if "maxItems" in s:
            ok &= len(value) <= s["maxItems"]
        if s.get("uniqueItems"):
            for i in range(len(value)):
                for j in range(i + 1, len(value)):
                    if _eq(value[i], value[j]):
                        ok = False
        prefix = s.get("prefixItems") or []
        for i, sub in enumerate(prefix):
            if i < len(value):
                ok &= validate(value[i], sub)
        if "items" in s:
            for x in value[len(prefix):]:
                ok &= validate(x, s["items"])
        if "contains" in s:
            cnt = sum(1 for x in value if validate(x, s["contains"]))
            lo = s.get("minContains", 1)
            hi = s.get("maxContains")
            ok &= cnt >= lo and (hi is None or cnt <= hi)

    if "allOf" in s:
        ok &= all(validate(value, sub) for sub in s["allOf"])
    if "anyOf" in s:
        ok &= any(validate(value, sub) for sub in s["anyOf"])
    if "oneOf" in s and value is not None:
        ok &= sum(1 for sub in s["oneOf"] if validate(value, sub)) == 1
    if "not" in s:
        ok &= not (value is not None and validate(value, s["not"]))
    if "if" in s:
        if validate(value, s["if"]):
            ok &= validate(value, s["then"]) if "then" in s else True
        else:
            ok &= validate(value, s["else"]) if "else" in s else True
    return bool(ok)


def _covered_indices(value, s):
    """Array indices evaluated by ``s``'s own prefixItems/items/contains plus
    those of SUCCESSFUL applicator branches — annotations only flow from
    succeeding subschemas (2020-12 §7.7.1)."""
    cov = set()
    prefix = s.get("prefixItems") or []
    cov |= set(range(min(len(prefix), len(value))))
    if "items" in s:
        cov |= set(range(len(value)))
    if "contains" in s:
        cov |= {i for i, x in enumerate(value) if validate(x, s["contains"])}
    for comb in ("allOf", "anyOf", "oneOf"):
        for sub in s.get(comb) or []:
            if validate(value, sub):
                cov |= _covered_indices(value, sub)
    if "if" in s:
        if validate(value, s["if"]):
            cov |= _covered_indices(value, s["if"])
            if "then" in s and validate(value, s["then"]):
                cov |= _covered_indices(value, s["then"])
        elif "else" in s and validate(value, s["else"]):
            cov |= _covered_indices(value, s["else"])
    return cov


def _covered_props(value, s):
    """Property names evaluated by ``s``'s own properties plus successful
    applicator branches (same annotation-flow rule)."""
    cov = set(k for k in (s.get("properties") or {}) if k in value)
    if "additionalProperties" in s:
        cov |= set(value)
    for comb in ("allOf", "anyOf", "oneOf"):
        for sub in s.get(comb) or []:
            if validate(value, sub):
                cov |= _covered_props(value, sub)
    if "if" in s:
        if validate(value, s["if"]):
            cov |= _covered_props(value, s["if"])
            if "then" in s and validate(value, s["then"]):
                cov |= _covered_props(value, s["then"])
        elif "else" in s and validate(value, s["else"]):
            cov |= _covered_props(value, s["else"])
    return cov


def validate_with_unevaluated(value, schema) -> bool:
    """validate() plus unevaluatedItems/unevaluatedProperties (kept separate
    so the base interpreter stays minimal)."""
    ok = validate(value, schema)
    s = schema if isinstance(schema, dict) else {}
    if "unevaluatedItems" in s and isinstance(value, list):
        cov = _covered_indices(value, s)
        for i, x in enumerate(value):
            if i not in cov:
                ok &= validate(x, s["unevaluatedItems"])
    if "unevaluatedProperties" in s and isinstance(value, dict):
        cov = _covered_props(value, s)
        for k, v in value.items():
            if k not in cov and v is not None:
                ok &= validate(v, s["unevaluatedProperties"])
    return bool(ok)


# ---------------------------------------------------------------------------
# OFFICIAL draft 2020-12 semantics (strict JSON nulls): null is a real value
# of type "null"; object members with null values are present. This is the
# oracle for the engine's strict_nulls=True variant path. ABSENT is a
# separate sentinel distinct from None so the interpreter can model missing
# members exactly.
# ---------------------------------------------------------------------------

_ABSENT = object()


def _jeq(a, b):
    """Official deep equality: numbers by value, bools are not numbers,
    all object members count (including null-valued ones)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(_jeq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(_jeq(a[k], b[k]) for k in a)
    return a == b


def _jtype_ok(t, v):
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if isinstance(v, bool):
        return False
    if t == "integer":
        return isinstance(v, int) or (isinstance(v, float) and v == math.floor(v))
    if t == "number":
        return isinstance(v, (int, float))
    if t == "string":
        return isinstance(v, str)
    if t == "array":
        return isinstance(v, list)
    if t == "object":
        return isinstance(v, dict)
    return False


def _covered_indices_strict(value, s):
    cov = set()
    prefix = s.get("prefixItems") or []
    cov |= set(range(min(len(prefix), len(value))))
    if "items" in s:
        cov |= set(range(len(value)))
    if "contains" in s:
        cov |= {i for i, x in enumerate(value) if validate_strict(x, s["contains"])}
    if "unevaluatedItems" in s:
        cov |= set(range(len(value)))
    for comb in ("allOf", "anyOf", "oneOf"):
        for sub in s.get(comb) or []:
            if validate_strict(value, sub):
                cov |= _covered_indices_strict(value, sub)
    if "if" in s:
        if validate_strict(value, s["if"]):
            cov |= _covered_indices_strict(value, s["if"])
            if "then" in s and validate_strict(value, s["then"]):
                cov |= _covered_indices_strict(value, s["then"])
        elif "else" in s and validate_strict(value, s["else"]):
            cov |= _covered_indices_strict(value, s["else"])
    return cov


def _covered_props_strict(value, s):
    cov = {k for k in (s.get("properties") or {}) if k in value}
    for pat in (s.get("patternProperties") or {}):
        cov |= {k for k in value if re.search(pat, k)}
    if "additionalProperties" in s or "unevaluatedProperties" in s:
        cov |= set(value)
    for comb in ("allOf", "anyOf", "oneOf"):
        for sub in s.get(comb) or []:
            if validate_strict(value, sub):
                cov |= _covered_props_strict(value, sub)
    if "if" in s:
        if validate_strict(value, s["if"]):
            cov |= _covered_props_strict(value, s["if"])
            if "then" in s and validate_strict(value, s["then"]):
                cov |= _covered_props_strict(value, s["then"])
        elif "else" in s and validate_strict(value, s["else"]):
            cov |= _covered_props_strict(value, s["else"])
    return cov


def validate_strict(value, schema) -> bool:
    """Official draft 2020-12 validation over a plain-Python JSON value
    (None = JSON null, a present value). No $ref support (the fuzz
    generators emit none)."""
    if value is _ABSENT:
        return True
    if schema is True or schema == {}:
        return True
    if schema is False:
        return False
    s = schema
    ok = True

    if "type" in s:
        ts = s["type"] if isinstance(s["type"], list) else [s["type"]]
        ok &= any(_jtype_ok(t, value) for t in ts)
    if "const" in s:
        ok &= _jeq(value, s["const"])
    if "enum" in s:
        ok &= any(_jeq(value, v) for v in s["enum"])

    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in s:
            ok &= float(value) >= float(s["minimum"])
        if "maximum" in s:
            ok &= float(value) <= float(s["maximum"])
        if "exclusiveMinimum" in s:
            ok &= float(value) > float(s["exclusiveMinimum"])
        if "exclusiveMaximum" in s:
            ok &= float(value) < float(s["exclusiveMaximum"])
        if "multipleOf" in s:
            q = Fraction(str(value)) / Fraction(str(s["multipleOf"]))
            ok &= q.denominator == 1

    if isinstance(value, str):
        if "minLength" in s:
            ok &= len(value) >= s["minLength"]
        if "maxLength" in s:
            ok &= len(value) <= s["maxLength"]
        if "pattern" in s:
            ok &= re.search(s["pattern"], value) is not None

    if isinstance(value, dict):
        if "required" in s:
            ok &= all(k in value for k in s["required"])
        if "minProperties" in s:
            ok &= len(value) >= s["minProperties"]
        if "maxProperties" in s:
            ok &= len(value) <= s["maxProperties"]
        for k, sub in (s.get("properties") or {}).items():
            if k in value:
                ok &= validate_strict(value[k], sub)
        for pat, sub in (s.get("patternProperties") or {}).items():
            for k in value:
                if re.search(pat, k):
                    ok &= validate_strict(value[k], sub)
        if "additionalProperties" in s:
            named = set(s.get("properties") or {})
            pats = list(s.get("patternProperties") or {})
            for k in value:
                if k in named or any(re.search(p, k) for p in pats):
                    continue
                ok &= validate_strict(value[k], s["additionalProperties"])
        if "propertyNames" in s:
            ok &= all(validate_strict(k, s["propertyNames"]) for k in value)
        for k, deps in (s.get("dependentRequired") or {}).items():
            if k in value:
                ok &= all(d in value for d in deps)
        for k, sub in (s.get("dependentSchemas") or {}).items():
            if k in value:
                ok &= validate_strict(value, sub)

    if isinstance(value, list):
        if "minItems" in s:
            ok &= len(value) >= s["minItems"]
        if "maxItems" in s:
            ok &= len(value) <= s["maxItems"]
        if s.get("uniqueItems"):
            for i in range(len(value)):
                for j in range(i + 1, len(value)):
                    if _jeq(value[i], value[j]):
                        ok = False
        prefix = s.get("prefixItems") or []
        for i, sub in enumerate(prefix):
            if i < len(value):
                ok &= validate_strict(value[i], sub)
        if "items" in s:
            for x in value[len(prefix):]:
                ok &= validate_strict(x, s["items"])
        if "contains" in s or "minContains" in s or "maxContains" in s:
            if "contains" in s:
                cnt = sum(1 for x in value if validate_strict(x, s["contains"]))
                lo = s.get("minContains", 1)
                hi = s.get("maxContains")
                ok &= cnt >= lo and (hi is None or cnt <= hi)

    if "allOf" in s:
        ok &= all(validate_strict(value, sub) for sub in s["allOf"])
    if "anyOf" in s:
        ok &= any(validate_strict(value, sub) for sub in s["anyOf"])
    if "oneOf" in s:
        ok &= sum(1 for sub in s["oneOf"] if validate_strict(value, sub)) == 1
    if "not" in s:
        ok &= not validate_strict(value, s["not"])
    if "if" in s:
        if validate_strict(value, s["if"]):
            ok &= validate_strict(value, s["then"]) if "then" in s else True
        else:
            ok &= validate_strict(value, s["else"]) if "else" in s else True

    if ok and "unevaluatedItems" in s and isinstance(value, list):
        sub = dict(s)
        sub.pop("unevaluatedItems")
        cov = _covered_indices_strict(value, sub)
        for i, x in enumerate(value):
            if i not in cov:
                ok &= validate_strict(x, s["unevaluatedItems"])
    if ok and "unevaluatedProperties" in s and isinstance(value, dict):
        sub = dict(s)
        sub.pop("unevaluatedProperties")
        cov = _covered_props_strict(value, sub)
        for k, v in value.items():
            if k not in cov:
                ok &= validate_strict(v, s["unevaluatedProperties"])
    return bool(ok)
