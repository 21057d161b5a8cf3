"""Schema-evolution compatibility: can v2 replace v1 without re-validating?

The reference validates one document against one schema; a table engine
also has to answer the evolution question — a 100 TB table already passed
schema v1, v2 is about to deploy. Three outcomes per changed keyword:

- **widening**: every v1-valid instance is v2-valid (bound relaxed, enum
  grew, required dropped…) — deploy v2, re-validate NOTHING.
- **narrowing**: v2 rejects some v1-valid instances (bound tightened, new
  required, enum shrank…) — but only the narrowed keywords can newly fail,
  so re-validation needs only the DELTA schema (``delta_schema``), not v2.
- **unknown**: not statically comparable (pattern text changed, combinator
  restructured…) — the delta conservatively carries v2's version.

The delta contract (pinned differentially by ``tests/test_compat.py``):
for every instance that is valid under v1,

    valid under v2  <=>  valid under delta_schema(v1, v2)

so re-validating 10^12 rows against 2 tightened keywords replaces a full
v2 pass — the delta plan scans fewer columns (column pruning) and
evaluates a fraction of the predicates.

Keyword-local deltas are emitted only where the keyword's assertion is
self-contained; context-coupled changes (``additionalProperties`` depends
on sibling property names, ``unevaluated*`` on every sibling applicator,
``minContains`` on ``contains``, ``prefixItems`` length on ``items``)
fall back to copying the whole changed subschema from v2 — still exact,
just less minimal. All analysis is driver-side over two small documents;
no Spark jobs.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Any

# keywords where a LOWER value accepts more instances
_MIN_STYLE = ("minimum", "exclusiveMinimum", "minLength", "minItems",
              "minProperties", "minContains")
# keywords where a HIGHER value accepts more instances
_MAX_STYLE = ("maximum", "exclusiveMaximum", "maxLength", "maxItems",
              "maxProperties", "maxContains")
# annotation-only keywords: never affect validation (2020-12 §9)
_ANNOTATIONS = {"title", "description", "default", "examples", "deprecated",
                "$comment", "readOnly", "writeOnly"}
# NOTE: "$id" is deliberately NOT an annotation here: changing it rebases
# every relative $ref resolved against it (2020-12 §8.2), which this
# structural diff cannot track — an $id change refuses certification.
# "$schema" is NOT one either: in this engine the dialect's $vocabulary
# gates WHICH keywords are enforced and whether format asserts
# (compile.py vocabulary gating), so a byte-identical body under a new
# dialect can enforce previously-stripped keywords — certifying that as
# compatible would skip re-validation of rows the deployed v2 rejects
# (review r05). "$anchor"/"$dynamicAnchor" likewise: renaming or moving
# one silently re-targets every '#name' ref, and an annotation-only diff
# would take the `if not changes` early-out PAST the unlocalizable-ref
# refusal (review r05).

_MISSING = object()  # distinguishes an ABSENT keyword from a JSON null value
# self-contained applicators: v2's assertion for the keyword does not
# depend on sibling keywords, so the delta may carry it verbatim
_OPAQUE_LOCAL = ("allOf", "anyOf", "oneOf", "not", "$ref", "$dynamicRef",
                 "dependentSchemas", "dependentRequired", "propertyNames",
                 "patternProperties", "$defs")
# grouped keywords: changing one member requires carrying the whole group
_GROUPS = (("if", "then", "else"),
           ("contains", "minContains", "maxContains"))
_STRUCTURAL = ("properties", "items", "prefixItems", "required")

WIDENING = "widening"
NARROWING = "narrowing"
UNKNOWN = "unknown"


@dataclass(frozen=True)
class Change:
    pointer: str        # schema location (JSON pointer)
    keyword: str
    kind: str           # widening | narrowing | unknown
    detail: str


def _esc(name: str) -> str:
    return name.replace("~", "~0").replace("/", "~1")


def _type_set(v: Any) -> set[str] | None:
    if v is None:
        return None
    ts = set(v if isinstance(v, list) else [v])
    if "integer" in ts and "number" in ts:
        ts.discard("integer")  # number subsumes integer
    return ts


def _hashable(v: Any):
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    return (type(v).__name__, v)


def _divides(a: Any, b: Any) -> bool:
    """Is ``b`` an exact integer multiple of ``a`` — DECIMAL-exact
    (``Fraction`` over the literal decimal strings, the same arithmetic
    the compiler's scale-adaptive decimal multipleOf enforces). ANY
    tolerance here is unsound: the r04 relative-1e-12 version certified
    3 as "dividing" 3000000000001 (residue 1 within tolerance of 3e12),
    classifying the change as pure widening and skipping re-validation of
    rows the deployed v2 rejects (review r05c)."""
    try:
        if isinstance(a, bool) or isinstance(b, bool):
            return False
        q = Fraction(str(b)) / Fraction(str(a))
        return q.denominator == 1
    except Exception:
        return False


def _classify(kw: str, old: Any, new: Any) -> tuple[str, str]:
    """(kind, detail) for a changed self-contained validation keyword."""
    if kw == "minContains":
        # unlike every other min/max keyword, minContains has an implicit
        # default of 1 (2020-12 §6.4.5): absence is NOT "no constraint"
        o_eff = 1 if old is None else old
        n_eff = 1 if new is None else new
        return ((WIDENING if n_eff <= o_eff else NARROWING),
                f"effective {o_eff!r} -> {n_eff!r}")
    if kw in _MIN_STYLE or kw in _MAX_STYLE:
        if old is None:
            return NARROWING, f"{kw} added: {new!r}"
        if new is None:
            return WIDENING, f"{kw} removed"
        lower_is_wider = kw in _MIN_STYLE
        wider = new < old if lower_is_wider else new > old
        return (WIDENING if wider else NARROWING), f"{old!r} -> {new!r}"
    if kw == "type":
        o, n = _type_set(old), _type_set(new)
        if o is None:
            return NARROWING, f"type added: {sorted(n)}"
        if n is None:
            return WIDENING, "type removed"
        if n >= o:
            return WIDENING, f"{sorted(o)} -> {sorted(n)}"
        if n <= o:
            return NARROWING, f"{sorted(o)} -> {sorted(n)}"
        return UNKNOWN, f"type sets overlap: {sorted(o)} -> {sorted(n)}"
    if kw == "enum":
        if old is None:
            return NARROWING, "enum added"
        if new is None:
            return WIDENING, "enum removed"
        o = {_hashable(v) for v in old}
        n = {_hashable(v) for v in new}
        if n >= o:
            return WIDENING, f"enum grew by {len(n - o)}"
        if n <= o:
            return NARROWING, f"enum shrank by {len(o - n)}"
        return UNKNOWN, "enum replaced"
    # (const never reaches here: the diff loop handles it with a _MISSING
    # sentinel because its value can legitimately be JSON null)
    if kw == "multipleOf":
        if new is None:
            return WIDENING, "multipleOf removed"
        if old is not None and _divides(new, old):
            return WIDENING, f"{old} -> {new} (divisor)"
        return NARROWING, f"{old!r} -> {new!r}"
    if kw in ("pattern", "format"):
        if old is None:
            return NARROWING, f"{kw} added"
        if new is None:
            return WIDENING, f"{kw} removed"
        return UNKNOWN, f"{kw} changed"
    if kw == "uniqueItems":
        if bool(new) and not bool(old):
            return NARROWING, "uniqueItems enabled"
        return WIDENING, "uniqueItems disabled"
    return UNKNOWN, f"{old!r} -> {new!r}"


def _norm(s: Any) -> Any:
    return {} if s is True else s


def _diff(old: Any, new: Any, ptr: str, changes: list[Change]) -> Any | None:
    """Append classified changes; return the delta subschema — on v1-valid
    instances, exactly equivalent to ``new`` — or ``None`` when ``new`` is
    a pure widening of ``old`` at this location."""
    old, new = _norm(old), _norm(new)
    if old == new:
        return None

    # boolean schemas / schema-kind swaps
    if new is False:
        changes.append(Change(ptr, "<schema>", NARROWING,
                              "subschema now rejects everything"))
        return False
    if new == {}:
        changes.append(Change(ptr, "<schema>", WIDENING,
                              "subschema now accepts everything"))
        return None
    if old is False:
        changes.append(Change(ptr, "<schema>", WIDENING,
                              "previously rejected everything"))
        return None

    delta: dict[str, Any] = {}
    # unevaluated* couples to EVERY sibling applicator: any change at a
    # node carrying it needs the full v2 node to stay exact
    uses_uneval = any(k in old or k in new
                      for k in ("unevaluatedProperties", "unevaluatedItems"))
    fallback = uses_uneval
    grouped = {kw for grp in _GROUPS for kw in grp}

    for kw in sorted((set(old) | set(new)) - _ANNOTATIONS
                     - set(_STRUCTURAL) - grouped
                     - {"unevaluatedProperties", "unevaluatedItems"}):
        o, n = old.get(kw), new.get(kw)
        if kw == "const":
            # const is the one keyword whose VALUE can be JSON null, so
            # .get()'s None conflates "absent" with "const: null" —
            # adding const:null would otherwise be invisible and certify
            # a hard narrowing as compatible (review r04)
            o = old["const"] if "const" in old else _MISSING
            n = new["const"] if "const" in new else _MISSING
            same = (o is _MISSING and n is _MISSING) or (
                o is not _MISSING and n is not _MISSING
                and _hashable(o) == _hashable(n))
            if same:
                continue
            if n is _MISSING:
                changes.append(Change(f"{ptr}/const", kw, WIDENING,
                                      "const removed"))
            else:
                changes.append(Change(
                    f"{ptr}/const", kw, NARROWING,
                    f"const {'<absent>' if o is _MISSING else repr(o)} "
                    f"-> {n!r}"))
                delta[kw] = n
            continue
        if o == n:
            continue
        if kw == "$id":
            changes.append(Change(f"{ptr}/$id", kw, UNKNOWN,
                                  "$id changed: rebases relative $ref "
                                  "resolution"))
            fallback = True
            continue
        if kw == "$schema":
            changes.append(Change(f"{ptr}/$schema", kw, UNKNOWN,
                                  "dialect changed: $vocabulary keyword "
                                  "gating and format assertion may differ"))
            fallback = True
            continue
        if kw in ("$anchor", "$dynamicAnchor"):
            changes.append(Change(f"{ptr}/{kw}", kw, UNKNOWN,
                                  f"{kw} changed: '#name' refs may "
                                  f"re-target or stop resolving"))
            fallback = True
            continue
        if kw == "additionalProperties":
            # assertion depends on sibling property names: full-node copy
            changes.append(Change(f"{ptr}/{kw}", kw, UNKNOWN,
                                  "additionalProperties changed"))
            fallback = True
            continue
        if kw == "patternProperties" and \
                ("additionalProperties" in old
                 or "additionalProperties" in new):
            # patternProperties defines part of additionalProperties'
            # residual set: changing (or removing) it beside an
            # additionalProperties assertion re-routes which keys that
            # assertion covers — NOT a local change, and removal is NOT a
            # pure widening (keys may fall to a stricter additional schema)
            changes.append(Change(f"{ptr}/{kw}", kw, UNKNOWN,
                                  "patternProperties changed beside "
                                  "additionalProperties"))
            fallback = True
            continue
        if kw in _OPAQUE_LOCAL:
            kind = WIDENING if n is None else UNKNOWN
            changes.append(Change(f"{ptr}/{kw}", kw, kind,
                                  "applicator removed" if n is None
                                  else "applicator changed"))
            if n is not None:
                delta[kw] = n
            continue
        kind, detail = _classify(kw, o, n)
        changes.append(Change(f"{ptr}/{kw}", kw, kind, detail))
        if kind != WIDENING and n is not None:
            delta[kw] = n

    if uses_uneval:
        changes.append(Change(ptr, "unevaluated", UNKNOWN,
                              "node carries unevaluated*; siblings changed"))

    # grouped keywords: carry the whole group when any member changed
    for grp in _GROUPS:
        if any(old.get(k) != new.get(k) for k in grp):
            present = {k: new[k] for k in grp if k in new}
            kinds = []
            for k in grp:
                if old.get(k) == new.get(k):
                    continue
                if k in ("minContains", "maxContains"):
                    kind, detail = _classify(k, old.get(k), new.get(k))
                else:
                    kind, detail = ((WIDENING, f"{k} removed")
                                    if new.get(k) is None
                                    else (UNKNOWN, f"{k} changed"))
                kinds.append(kind)
                changes.append(Change(f"{ptr}/{k}", k, kind, detail))
            if present and any(k != WIDENING for k in kinds):
                delta.update(present)

    # required: only NEWLY required names can newly fail
    o_req = set(old.get("required") or [])
    n_req = set(new.get("required") or [])
    if n_req - o_req:
        changes.append(Change(f"{ptr}/required", "required", NARROWING,
                              f"newly required: {sorted(n_req - o_req)}"))
        delta["required"] = sorted(n_req - o_req)
    if o_req - n_req:
        changes.append(Change(f"{ptr}/required", "required", WIDENING,
                              f"no longer required: {sorted(o_req - n_req)}"))

    # properties: recurse matched; classify added/removed. A name-set
    # change while v2 has patternProperties re-routes which subschema a
    # key validates against -> full-node copy.
    op = old.get("properties") or {}
    np_ = new.get("properties") or {}
    if set(op) != set(np_) and "patternProperties" in new:
        changes.append(Change(f"{ptr}/properties", "properties", UNKNOWN,
                              "property names changed beside "
                              "patternProperties"))
        fallback = True
    dprops: dict[str, Any] = {}
    for name in sorted(set(op) | set(np_)):
        p = f"{ptr}/properties/{_esc(name)}"
        if name in op and name in np_:
            sub = _diff(op[name], np_[name], p, changes)
            if sub is not None:
                dprops[name] = sub
        elif name in np_:
            if _norm(np_[name]) == {}:
                continue  # unconstrained addition
            changes.append(Change(p, "properties", NARROWING,
                                  f"property {name!r} now constrained"))
            dprops[name] = np_[name]
        else:
            ap = new.get("additionalProperties")
            if ap is False:
                changes.append(Change(p, "properties", NARROWING,
                                      f"property {name!r} removed "
                                      "(now forbidden)"))
                dprops[name] = False
            elif ap is None or _norm(ap) == {}:
                changes.append(Change(p, "properties", WIDENING,
                                      f"property {name!r} schema removed"))
            else:
                changes.append(Change(p, "properties", UNKNOWN,
                                      f"property {name!r} now falls to "
                                      "additionalProperties"))
                dprops[name] = ap
    if dprops:
        delta["properties"] = dprops

    # items / prefixItems: a prefix-length change re-routes which schema
    # governs trailing indices when items is present -> full-node copy
    oi, ni = old.get("items"), new.get("items")
    opre = old.get("prefixItems") or []
    npre = new.get("prefixItems") or []
    if len(opre) != len(npre) and (oi is not None or ni is not None):
        changes.append(Change(f"{ptr}/prefixItems", "prefixItems", UNKNOWN,
                              "prefix length changed beside items"))
        fallback = True
    if oi != ni:
        if ni is None:
            changes.append(Change(f"{ptr}/items", "items", WIDENING,
                                  "items schema removed"))
        elif oi is None:
            if _norm(ni) == {}:
                # items: true where there was none asserts nothing (and
                # can only EVALUATE more items for enclosing unevaluated*
                # scopes — monotone widening); without this check the
                # semantic no-op forced a full-table re-validation
                # (review r05; same convention as the prefixItems slots)
                changes.append(Change(f"{ptr}/items", "items", WIDENING,
                                      "items schema added (unconstrained)"))
            else:
                changes.append(Change(f"{ptr}/items", "items", NARROWING,
                                      "items schema added"))
                delta["items"] = ni
        else:
            sub = _diff(oi, ni, f"{ptr}/items", changes)
            if sub is not None:
                delta["items"] = sub
    if opre != npre:
        dpre: list[Any] = []
        any_delta = False
        for i in range(max(len(opre), len(npre))):
            p = f"{ptr}/prefixItems/{i}"
            if i < len(opre) and i < len(npre):
                sub = _diff(opre[i], npre[i], p, changes)
            elif i < len(npre):
                sub = None if _norm(npre[i]) == {} else npre[i]
                changes.append(Change(
                    p, "prefixItems",
                    WIDENING if sub is None else NARROWING,
                    f"tuple slot {i} "
                    + ("unconstrained" if sub is None else "added")))
            else:
                changes.append(Change(p, "prefixItems", WIDENING,
                                      f"tuple slot {i} dropped"))
                sub = None
            if i < len(npre):
                dpre.append(True if sub is None else sub)
                any_delta = any_delta or sub is not None
        if any_delta:
            delta["prefixItems"] = dpre

    # items in the delta needs its prefix CONTEXT: without prefixItems,
    # the delta's items governs ALL indices and rejects v2-valid tuple
    # prefixes (review r04) — carry True placeholders so items keeps
    # applying only to trailing indices
    if "items" in delta and npre and "prefixItems" not in delta:
        delta["prefixItems"] = [True] * len(npre)

    if fallback:
        return {k: v for k, v in new.items()}
    return delta or None


def compat_report(old_doc: Any, new_doc: Any) -> list[Change]:
    """Every classified difference between two schema documents."""
    changes: list[Change] = []
    _diff(old_doc, new_doc, "#", changes)
    return changes


def is_backward_compatible(old_doc: Any, new_doc: Any) -> bool:
    """True iff every change is a widening: all v1-valid rows stay valid.

    Refuses to certify (returns False) when the documents carry a
    reference into the document body (``#/properties/...``, anchors,
    ``$dynamicRef``): a ref site under ``not``/``oneOf``/``if`` INVERTS
    polarity, so a widening at the target can be a narrowing at the site —
    per-keyword classification cannot see that."""
    changes = compat_report(old_doc, new_doc)
    if not changes:
        return True  # annotation-only diffs can't affect any ref site
    if _has_unlocalizable_ref(old_doc) or _has_unlocalizable_ref(new_doc):
        return False
    if _has_dangling_defs_ref(new_doc):
        return False  # v2 cannot compile — never certify it
    return all(c.kind == WIDENING for c in changes)


def _collect_defs_refs(node: Any, out: list[str]) -> None:
    if isinstance(node, dict):
        v = node.get("$ref")
        if isinstance(v, str) and v.startswith("#/$defs/"):
            out.append(v)
        for val in node.values():
            _collect_defs_refs(val, out)
    elif isinstance(node, list):
        for val in node:
            _collect_defs_refs(val, out)


def _has_dangling_defs_ref(doc: Any) -> bool:
    """True when the document carries a ``#/$defs/...`` $ref whose target
    no longer resolves — e.g. v2 removed ``$defs`` but a ref site remains.

    Without this probe, the removal classifies as a pure widening
    ("applicator removed") and the early-outs certify a document that
    cannot even compile (ADVICE r03)."""
    from json_skema_spark.plans.model import SchemaError, evaluate_pointer
    refs: list[str] = []
    _collect_defs_refs(doc, refs)
    for ref in refs:
        try:
            # the resolver's pointer walk (lists, bounds, percent-decoding,
            # RFC 6901 unescape) — not a reimplementation that would
            # misjudge '#/$defs/x/allOf/0' as dangling
            evaluate_pointer(doc, ref[1:])
        except SchemaError:
            return True
    return False


def _contains_ref(node: Any) -> bool:
    if isinstance(node, dict):
        if "$ref" in node or "$dynamicRef" in node:
            return True
        return any(_contains_ref(v) for v in node.values())
    if isinstance(node, list):
        return any(_contains_ref(v) for v in node)
    return False


def _declares_id(node: Any) -> bool:
    if isinstance(node, dict):
        if "$id" in node:
            return True
        return any(_declares_id(v) for v in node.values())
    if isinstance(node, list):
        return any(_declares_id(v) for v in node)
    return False


def _has_unlocalizable_ref(node: Any) -> bool:
    """True when the document contains an internal reference whose target
    the local diff cannot track: a ``$ref`` into the document body (e.g.
    ``#/properties/x`` — a change AT the target silently changes every ref
    site, which a structural diff of the sites cannot see), an anchor ref
    (``#name``), or any ``$dynamicRef`` (resolution depends on dynamic
    scope, wherever it points). ``#/$defs/...`` targets are fine — a
    changed ``$defs`` already forces the full-document fallback. External
    URIs resolve through a registry this diff does not claim to cover —
    UNLESS the document declares an ``$id`` anywhere, in which case an
    absolute/relative ref can resolve back INTO this document (e.g.
    ``$id: https://s`` + ``$ref: https://s#/properties/a``), the same
    polarity-inversion blindness as a textual ``#/...`` ref
    (review r05c); such documents are conservatively refused."""
    return _scan_unlocalizable(node, _declares_id(node))


def _scan_unlocalizable(node: Any, has_id: bool) -> bool:
    if isinstance(node, dict):
        for kw in ("$ref", "$dynamicRef"):
            v = node.get(kw)
            if not isinstance(v, str):
                continue
            if kw == "$dynamicRef":
                return True
            if v.startswith("#"):
                if not v.startswith("#/$defs/"):
                    return True
            elif has_id:
                return True
        return any(_scan_unlocalizable(v, has_id) for v in node.values())
    if isinstance(node, list):
        return any(_scan_unlocalizable(v, has_id) for v in node)
    return False


def delta_schema(old_doc: Any, new_doc: Any) -> Any | None:
    """Minimal schema equivalent to v2 ON v1-VALID instances; ``None``
    when v2 is purely widening (re-validate nothing).

    ``$defs`` note: a changed definition alters semantics at every ``$ref``
    site, which local diffing can't see — the delta falls back to the full
    v2 document. An unchanged ``$defs`` is copied into the delta whenever
    the delta still contains a ``$ref`` so it compiles standalone.
    """
    changes: list[Change] = []
    d = _diff(old_doc, new_doc, "#", changes)
    if changes and (_has_unlocalizable_ref(old_doc)
                    or _has_unlocalizable_ref(new_doc)):
        # a ref into the document body (or an anchor/dynamic ref) couples
        # its site to changes elsewhere — including polarity inversion
        # under not/oneOf/if, where a widening at the target narrows the
        # site — so this must preempt even the "pure widening" (d is None)
        # early-out; only the full document is sound
        return new_doc
    if changes and _has_dangling_defs_ref(new_doc):
        # e.g. $defs removed while a '#/$defs/x' ref site remains: v2
        # cannot compile, so there is no sound delta — return the full
        # document and let the compiler raise loudly instead of silently
        # skipping re-validation (ADVICE r03)
        return new_doc
    if d is None:
        return None
    if any(c.keyword == "$defs" for c in changes):
        # a changed definition alters every $ref site: local diff is blind
        return new_doc
    if isinstance(d, dict) and isinstance(new_doc, dict) \
            and "$schema" in new_doc and "$schema" not in d:
        # an UNCHANGED $schema never appears in the diff, but the
        # dialect's $vocabulary gates which keywords ASSERT (format-
        # assertion on/off, validation vocab omitted): a $schema-less
        # delta compiles under the default dialect and certifies rows the
        # deployed v2 rejects — or flags rows it accepts (review r05c)
        d = dict(d)
        d["$schema"] = new_doc["$schema"]
    if isinstance(d, dict) and _contains_ref(d) \
            and isinstance(new_doc, dict) and "$defs" in new_doc \
            and "$defs" not in d:
        d = dict(d)
        d["$defs"] = new_doc["$defs"]
    return d
