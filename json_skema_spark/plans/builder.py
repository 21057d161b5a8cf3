"""Fluent programmatic schema builder.

Re-expresses the reference's ``SchemaBuilder`` DSL
(/root/reference/src/main/kotlin/com/github/erosb/jsonsKema/
CompositeSchemaBuilder.kt:23-112,177-383): a chainable API that assembles a
plain draft 2020-12 schema *document* (dict), so everything downstream —
compile, verdicts, violations — is identical to the JSON-loaded path. Where
the reference synthesizes fake source locations from the Java call stack
(``callingSourceLocation`` CompositeSchemaBuilder.kt:7-21) so failures cite
builder call sites, our lineage pointers come from the generated document
structure itself (keyword_location is already exact).

    schema = (SchemaBuilder.object()
              .prop("clip_id", SchemaBuilder.string().pattern("^clip_"))
              .prop("sr_hz", SchemaBuilder.enum(8000, 16000, 44100))
              .required("clip_id", "sr_hz")
              .build())
"""

from __future__ import annotations

from typing import Any


def _dual(fn):
    """Class access -> factory (``SchemaBuilder.string()``); instance
    access -> MERGE into the existing document, so
    ``SchemaBuilder.string().enum("a", "b")`` keeps ``type: "string"``.
    A plain classmethod here would shadow ``__getattr__``'s keyword
    setters and silently DISCARD the accumulated document when chained —
    the natural chain would build a weaker schema than written."""
    class _Desc:
        __doc__ = fn.__doc__

        def __get__(self, obj, owner):
            if obj is None:
                return lambda *a, **k: fn(owner, *a, **k)

            def merged(*a, **k):
                obj._doc.update(fn(type(obj), *a, **k)._doc)
                return obj
            return merged
    return _Desc()


class SchemaBuilder:
    def __init__(self, doc: dict | None = None):
        self._doc: dict[str, Any] = dict(doc or {})

    # -- constructors (dual: factories on the class, merging keyword
    # setters on instances) -------------------------------------------------
    object = _dual(lambda cls: cls({"type": "object"}))
    string = _dual(lambda cls: cls({"type": "string"}))
    integer = _dual(lambda cls: cls({"type": "integer"}))
    number = _dual(lambda cls: cls({"type": "number"}))
    boolean = _dual(lambda cls: cls({"type": "boolean"}))
    enum = _dual(lambda cls, *values: cls({"enum": list(values)}))
    const = _dual(lambda cls, value: cls({"const": value}))
    ref = _dual(lambda cls, pointer: cls({"$ref": pointer}))

    @staticmethod
    def _array_doc(cls, items=None):
        b = cls({"type": "array"})
        return b.items(items) if items is not None else b

    array = _dual(lambda cls, items=None: SchemaBuilder._array_doc(cls, items))

    # -- generic -----------------------------------------------------------
    def kw(self, keyword: str, value: Any) -> "SchemaBuilder":
        self._doc[keyword] = _unwrap(value)
        return self

    # draft 2020-12 keyword surface reachable as attribute names ($-core
    # keywords can't be Python identifiers; use .kw for those and for
    # extension vocabularies)
    _KNOWN_KEYWORDS = frozenset({
        "type", "enum", "const",
        "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
        "multipleOf",
        "minLength", "maxLength", "pattern", "format",
        "properties", "patternProperties", "additionalProperties",
        "propertyNames", "minProperties", "maxProperties",
        "dependentRequired", "dependentSchemas",
        "contains", "minContains", "maxContains",
        "minItems", "maxItems", "uniqueItems",
        "unevaluatedItems", "unevaluatedProperties",
        "allOf", "anyOf", "oneOf", "then",
        "prefixItems", "required", "items",  # also settable as attributes
        "title", "description", "default", "examples", "deprecated",
        "readOnly", "writeOnly",
        "contentEncoding", "contentMediaType", "contentSchema",
    })

    def __getattr__(self, keyword: str):
        # a KNOWN-keyword method is a setter: .minimum(5), .pattern("..").
        # Unknown names raise: a typo (.minimun) would otherwise silently
        # build a WEAKER schema than written — the unknown keyword is a
        # no-op annotation at validation time, so rows violating the
        # intended constraint pass with no error anywhere (review r05c).
        # Extension/custom keywords go through the explicit .kw() hatch.
        if keyword.startswith("_") or keyword not in self._KNOWN_KEYWORDS:
            raise AttributeError(
                f"{keyword!r} is not a draft 2020-12 keyword this builder "
                "knows — a typo here would silently weaken the schema; "
                f"use .kw({keyword!r}, value) for extension keywords")

        def setter(value: Any = True) -> "SchemaBuilder":
            return self.kw(keyword, value)

        return setter

    # -- object ------------------------------------------------------------
    def prop(self, name: str, schema: "SchemaBuilder | dict | bool") -> "SchemaBuilder":
        self._doc.setdefault("properties", {})[name] = _unwrap(schema)
        return self

    def pattern_prop(self, pattern: str, schema) -> "SchemaBuilder":
        self._doc.setdefault("patternProperties", {})[pattern] = _unwrap(schema)
        return self

    def required(self, *names: str) -> "SchemaBuilder":
        # order-preserving dedupe: the 2020-12 meta-schema constrains
        # required to a uniqueItems array
        cur = self._doc.setdefault("required", [])
        for n in names:
            if n not in cur:
                cur.append(n)
        return self

    def additional_properties(self, schema) -> "SchemaBuilder":
        return self.kw("additionalProperties", schema)

    # -- arrays ------------------------------------------------------------
    def items(self, schema) -> "SchemaBuilder":
        return self.kw("items", schema)

    def prefix_items(self, *schemas) -> "SchemaBuilder":
        return self.kw("prefixItems", [_unwrap(s) for s in schemas])

    # -- combinators --------------------------------------------------------
    def all_of(self, *schemas) -> "SchemaBuilder":
        return self.kw("allOf", [_unwrap(s) for s in schemas])

    def any_of(self, *schemas) -> "SchemaBuilder":
        return self.kw("anyOf", [_unwrap(s) for s in schemas])

    def one_of(self, *schemas) -> "SchemaBuilder":
        return self.kw("oneOf", [_unwrap(s) for s in schemas])

    def not_(self, schema) -> "SchemaBuilder":
        return self.kw("not", schema)

    def if_then_else(self, if_s, then_s=None, else_s=None) -> "SchemaBuilder":
        self.kw("if", if_s)
        if then_s is not None:
            self.kw("then", then_s)
        if else_s is not None:
            self.kw("else", else_s)
        return self

    def build(self) -> dict:
        # deep copy: returning the live _doc would let post-build chaining
        # (or reuse of this builder) mutate documents already handed out
        return _unwrap({k: v for k, v in self._doc.items()})


def _unwrap(v: Any) -> Any:
    if isinstance(v, SchemaBuilder):
        # build() deep-copies, so attaching a sub-builder cannot alias —
        # reusing one sub-builder for two properties, or chaining more
        # keywords after attachment, no longer mutates the already-built
        # parent schema (review r04)
        return v.build()
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v
