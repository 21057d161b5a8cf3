"""Schema-document model: URIs, JSON Pointers, anchors, $ref resolution.

Re-expresses the reference's driver-side schema loading
(/root/reference/src/main/kotlin/com/github/erosb/jsonsKema/SchemaLoader.kt:229-466):
a first pass walks the raw document registering ``$id`` / ``$anchor`` /
``$dynamicAnchor`` into a URI -> node symbol table (reference
``lookupAnchors`` SchemaLoader.kt:229-263), then ``$ref`` strings resolve
against the lexical base-URI scope (reference ``resolve``
SchemaLoader.kt:381-405, JSON Pointer evaluation :407-466).

Everything here runs on the Spark *driver* at compile time — schema
documents are tiny; only the compiled Column predicates ship to executors.
Network I/O is opt-in: by default remote documents must be pre-registered in
the resolver's ``registry`` (the reference's pre-registered-URI map,
SchemaClient.kt:28-34); with ``fetch_remote=True`` an unregistered http(s)
``$ref`` is fetched driver-side with redirect following and process-wide
memoization (the reference's DefaultSchemaClient + MemoizingSchemaClient,
SchemaClient.kt:63-140).
"""

from __future__ import annotations

from typing import Any
from urllib.parse import unquote, urldefrag, urljoin


class SchemaError(Exception):
    """Raised for malformed schema documents or unresolvable references."""


def pointer_unescape(segment: str) -> str:
    """RFC 6901 unescape: ``~1`` -> ``/``, ``~0`` -> ``~``.

    Mirrors reference JsonValue.kt:25-36 (JsonPointer escaping).
    """
    return segment.replace("~1", "/").replace("~0", "~")


def pointer_escape(segment: str) -> str:
    return segment.replace("~", "~0").replace("/", "~1")


def evaluate_pointer(doc: Any, pointer: str) -> Any:
    """Evaluate a JSON Pointer (the fragment part, no leading '#')."""
    if pointer in ("", "/"):
        return doc if pointer == "" else _step(doc, "")
    if not pointer.startswith("/"):
        raise SchemaError(f"invalid JSON pointer: {pointer!r}")
    node = doc
    for raw in pointer[1:].split("/"):
        node = _step(node, pointer_unescape(unquote(raw)))
    return node


def _step(node: Any, key: str) -> Any:
    if isinstance(node, dict):
        if key not in node:
            raise SchemaError(f"pointer segment {key!r} not found")
        return node[key]
    if isinstance(node, list):
        try:
            idx = int(key)
        except ValueError as exc:
            raise SchemaError(f"array index expected, got {key!r}") from exc
        if not 0 <= idx < len(node):
            raise SchemaError(f"array index {idx} out of bounds")
        return node[idx]
    raise SchemaError(f"cannot descend into {type(node).__name__} with {key!r}")


def load_schema_document(text: str) -> Any:
    """Parse a schema document from text: JSON first, YAML fallback —
    mirrors the reference's dual-format loading (JsonValue.kt:234-251,
    YamlSupport.kt:12-54). Driver-side only; schema documents are tiny."""
    import json

    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover
            raise SchemaError("schema is not JSON and pyyaml is unavailable") from exc
        return yaml.safe_load(text)


def registry_from_dir(directory: str, base_uri: str = "") -> dict[str, Any]:
    """Build a $ref registry from a directory of schema documents
    (*.json / *.yaml / *.yml): each file registers under
    ``base_uri + filename`` and additionally under its own ``$id`` if it
    declares one — the filesystem analogue of the reference's pre-registered
    schema client (SchemaClient.kt:28-34); no network, ever."""
    import os

    registry: dict[str, Any] = {}
    for fname in sorted(os.listdir(directory)):
        if not fname.endswith((".json", ".yaml", ".yml")):
            continue
        with open(os.path.join(directory, fname)) as f:
            doc = load_schema_document(f.read())
        registry[base_uri + fname] = doc
        if isinstance(doc, dict) and isinstance(doc.get("$id"), str):
            registry[doc["$id"]] = doc
    return registry


# process-wide fetch memo, URI -> parsed document (the reference's
# MemoizingSchemaClient cache, SchemaClient.kt:128-140): schema compiles are
# driver-side and repeated per query, so each remote doc is fetched once
_FETCH_MEMO: dict[str, Any] = {}


# Remote fetch is bounded: a hostile schema's $ref/$schema URIs are a
# driver-side SSRF / memory vector once fetch_remote=True (ADVICE r02), so
# the body read is capped and the caller may restrict schemes/hosts.
FETCH_MAX_BYTES = 8 << 20  # 8 MiB — far above any real meta-schema


def fetch_schema_document(uri: str, *, timeout: float = 10.0,
                          max_bytes: int = FETCH_MAX_BYTES,
                          allow_http: bool = True,
                          host_allowlist: set[str] | None = None) -> Any:
    """Fetch + parse a remote schema document over http(s), following
    redirects (reference DefaultSchemaClient.get, SchemaClient.kt:63-125:
    handles 301/302/303/307/308 by re-issuing against Location — urllib's
    HTTPRedirectHandler does the same, capped at 10 hops) and memoizing
    process-wide. Driver-side only.

    Security: ``fetch_remote=True`` implies trusting every URI reachable
    from the schema document. Mitigations here: body read capped at
    ``max_bytes`` (oversize -> SchemaError, not OOM), optional
    ``allow_http=False`` to require TLS, optional ``host_allowlist``.
    Redirect targets are re-checked against the same policy."""
    import urllib.parse
    import urllib.request

    def _check(u: str) -> None:
        parsed = urllib.parse.urlparse(u)
        if parsed.scheme not in ("http", "https"):
            raise SchemaError(f"fetch_remote supports only http(s) URIs, got {u!r}")
        if parsed.scheme == "http" and not allow_http:
            raise SchemaError(f"plain http fetch disabled (allow_http=False): {u!r}")
        if host_allowlist is not None and parsed.hostname not in host_allowlist:
            raise SchemaError(f"host {parsed.hostname!r} not in allowlist: {u!r}")

    # policy BEFORE memo: the memo only skips network I/O — a caller with
    # a stricter allowlist must not receive a document another caller's
    # laxer policy fetched earlier in the same process
    _check(uri)
    if uri in _FETCH_MEMO:
        return _FETCH_MEMO[uri]

    class _PolicyRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            _check(newurl)
            return super().redirect_request(req, fp, code, msg, headers, newurl)

    opener = urllib.request.build_opener(_PolicyRedirect)
    req = urllib.request.Request(uri, headers={"Accept": "application/json"})
    try:
        with opener.open(req, timeout=timeout) as resp:
            body = resp.read(max_bytes + 1)
    except SchemaError:
        raise
    except Exception as exc:
        raise SchemaError(f"failed to fetch remote schema {uri!r}: {exc}") from exc
    if len(body) > max_bytes:
        raise SchemaError(
            f"remote schema {uri!r} exceeds max_bytes={max_bytes} — refusing to parse")
    doc = load_schema_document(body.decode("utf-8"))
    _FETCH_MEMO[uri] = doc
    return doc


# Official draft 2020-12 dialect: the $vocabulary map of the standard
# meta-schema (public spec facts recorded as data; the reference instead
# bundles the full meta-schema documents as resources, SchemaClient.kt:172-181
# + src/main/resources/json-meta-schemas/draft2020-12/)
DRAFT2020_12_DIALECT_URI = "https://json-schema.org/draft/2020-12/schema"
BUILTIN_DIALECTS: dict[str, dict[str, bool]] = {
    DRAFT2020_12_DIALECT_URI: {
        "https://json-schema.org/draft/2020-12/vocab/core": True,
        "https://json-schema.org/draft/2020-12/vocab/applicator": True,
        "https://json-schema.org/draft/2020-12/vocab/unevaluated": True,
        "https://json-schema.org/draft/2020-12/vocab/validation": True,
        "https://json-schema.org/draft/2020-12/vocab/meta-data": True,
        "https://json-schema.org/draft/2020-12/vocab/format-annotation": True,
        "https://json-schema.org/draft/2020-12/vocab/content": True,
    },
}


def vocabulary_of(schema_doc: Any, registry: dict[str, Any] | None = None,
                  *, fetch_remote: bool = False) -> dict[str, bool]:
    """The vocabulary set governing ``schema_doc``: its inline ``$vocabulary``
    if it declares one (it is then its own meta-schema), else the
    ``$schema``-referenced meta-schema's ``$vocabulary`` — looked up in the
    caller registry, the builtin dialect table, or (opt-in) fetched remotely.
    Mirrors Validator.kt:250-261 + SchemaClient.kt:172-181. Unknown dialects
    resolve to the empty map (format stays annotation-only — the reference's
    DEPENDS_ON_VOCABULARY default)."""
    if not isinstance(schema_doc, dict):
        return {}
    if isinstance(schema_doc.get("$vocabulary"), dict):
        return dict(schema_doc["$vocabulary"])
    meta_uri = schema_doc.get("$schema")
    if not isinstance(meta_uri, str):
        return {}
    meta = (registry or {}).get(meta_uri)
    if meta is None and meta_uri in BUILTIN_DIALECTS:
        return dict(BUILTIN_DIALECTS[meta_uri])
    if meta is None and fetch_remote and meta_uri.startswith(("http://", "https://")):
        try:
            meta = fetch_schema_document(meta_uri)
        except SchemaError:
            return {}
    if isinstance(meta, dict) and isinstance(meta.get("$vocabulary"), dict):
        return dict(meta["$vocabulary"])
    return {}


# 2020-12 validation-vocabulary keywords (spec section 6): when a schema's
# governing meta-schema declares a $vocabulary WITHOUT the validation vocab,
# these keywords are not applied (official vocabulary.json suite behavior).
VALIDATION_VOCAB_URI = "https://json-schema.org/draft/2020-12/vocab/validation"
VALIDATION_KEYWORDS = frozenset({
    "type", "enum", "const", "multipleOf", "maximum", "exclusiveMaximum",
    "minimum", "exclusiveMinimum", "maxLength", "minLength", "pattern",
    "maxItems", "minItems", "uniqueItems", "maxContains", "minContains",
    "maxProperties", "minProperties", "required", "dependentRequired",
})

_SCHEMA_MAP_KW = {"properties", "patternProperties", "dependentSchemas",
                  "$defs", "definitions"}
_SCHEMA_LIST_KW = {"allOf", "anyOf", "oneOf", "prefixItems"}
_SCHEMA_VALUE_KW = {"items", "not", "if", "then", "else", "contains",
                    "additionalProperties", "propertyNames",
                    "unevaluatedItems", "unevaluatedProperties"}
# identifier indexing additionally descends into contentSchema (a schema
# position the validation-stripper doesn't touch)
_INDEX_SCHEMA_VALUE_KW = _SCHEMA_VALUE_KW | {"contentSchema"}


def strip_validation_keywords(node):
    """Schema-position-aware removal of validation-vocabulary keywords
    (never descends into ``enum``/``const`` data subtrees). Applied when
    the governing meta-schema's $vocabulary omits the validation vocab -
    those keywords then have no defined behavior and are not applied.
    Limitation: only the root document (incl. its $defs) is stripped;
    registry-resolved external documents keep their own governance."""
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if k in VALIDATION_KEYWORDS:
            continue
        if k in _SCHEMA_MAP_KW and isinstance(v, dict):
            out[k] = {n: strip_validation_keywords(x) for n, x in v.items()}
        elif k in _SCHEMA_LIST_KW and isinstance(v, list):
            out[k] = [strip_validation_keywords(x) for x in v]
        elif k in _SCHEMA_VALUE_KW:
            out[k] = strip_validation_keywords(v)
        else:
            out[k] = v
    return out


class Resolver:
    """Symbol table + $ref resolution for one root document (plus registry).

    ``registry`` maps absolute URI -> raw schema document (dict/bool), the
    Spark-side analogue of the reference's pre-registered schema client
    (SchemaClient.kt:28-34) with memoization (SchemaClient.kt:128-140).
    """

    def __init__(self, root_doc: Any, registry: dict[str, Any] | None = None,
                 base_uri: str = "", fetch_remote: bool = False):
        self.registry: dict[str, Any] = dict(registry or {})
        self.root_doc = root_doc
        self.root_base = base_uri
        self.fetch_remote = fetch_remote
        # uri (no fragment) -> document node whose lexical scope starts there
        self._id_index: dict[str, Any] = {}
        # (base_uri, anchor) -> node
        self._anchor_index: dict[tuple[str, str], Any] = {}
        self._dynamic_anchor_index: dict[tuple[str, str], Any] = {}
        # id(node) -> base uri in effect at that node (lexical scope)
        self._scope_of: dict[int, str] = {}
        self._index_document(root_doc, base_uri)
        for uri, doc in self.registry.items():
            self._index_document(doc, uri)
        if base_uri:
            self._id_index.setdefault(base_uri, root_doc)

    # -- indexing (reference lookupAnchors, SchemaLoader.kt:229-263) --------
    def _index_document(self, node: Any, base: str, *,
                        in_schema_map: bool = False) -> None:
        if isinstance(node, bool):
            return
        if isinstance(node, dict):
            if in_schema_map:
                # keys are property/definition NAMES, values are schemas:
                # a property literally named "enum"/"const" must still be
                # indexed (the stop-list applies to keyword POSITIONS only,
                # same position-awareness as strip_validation_keywords)
                for child in node.values():
                    self._index_document(child, base)
                return
            sid = node.get("$id")
            if isinstance(sid, str):
                base = urldefrag(urljoin(base, sid)).url
                self._id_index[base] = node
            anchor = node.get("$anchor")
            if isinstance(anchor, str):
                self._anchor_index[(base, anchor)] = node
            dyn = node.get("$dynamicAnchor")
            if isinstance(dyn, str):
                self._dynamic_anchor_index[(base, dyn)] = node
                # a $dynamicAnchor is also a plain anchor target
                self._anchor_index.setdefault((base, dyn), node)
            self._scope_of[id(node)] = base
            # recurse ONLY through known schema positions: identifiers in
            # raw-data subtrees (enum/const/default) or under UNKNOWN
            # keywords are not real identifiers and must not be indexed or
            # rebase the scope (shouldStopAnchorLookup,
            # SchemaLoader.kt:298-315; official suite unknownKeyword.json)
            for key, child in node.items():
                if key in _SCHEMA_MAP_KW and isinstance(child, dict):
                    self._index_document(child, base, in_schema_map=True)
                elif key in _SCHEMA_LIST_KW and isinstance(child, list):
                    for item in child:
                        self._index_document(item, base)
                elif key in _INDEX_SCHEMA_VALUE_KW:
                    self._index_document(child, base)
        elif isinstance(node, list):
            for child in node:
                self._index_document(child, base)

    # -- resolution (reference resolve, SchemaLoader.kt:381-466) ------------
    def scope_of(self, node: Any, default: str = "") -> str:
        return self._scope_of.get(id(node), default or self.root_base)

    def pointer_of(self, node: Any) -> str | None:
        """Canonical JSON pointer of a subschema node within the ROOT
        document (lazy id-indexed walk). Failure lineage uses it so an
        anchor-form ``$ref`` ('#A') reports the target's REAL schema
        location ('#/$defs/s'), not an anchor/pointer hybrid that no
        tooling can dereference (review r05c). Nodes from registry/remote
        documents return None — their pointers are relative to a
        different document."""
        if getattr(self, "_ptr_of", None) is None:
            self._ptr_of: dict[int, str] = {}

            def walk(nd: Any, ptr: str) -> None:
                if isinstance(nd, dict):
                    self._ptr_of.setdefault(id(nd), ptr)
                    for k, v in nd.items():
                        walk(v, f"{ptr}/{pointer_escape(k)}")
                elif isinstance(nd, list):
                    self._ptr_of.setdefault(id(nd), ptr)
                    for i, v in enumerate(nd):
                        walk(v, f"{ptr}/{i}")

            walk(self.root_doc, "")
        return self._ptr_of.get(id(node))

    def resolve(self, ref: str, scope: str) -> tuple[Any, str]:
        """Resolve ``ref`` against base-uri ``scope``.

        Returns ``(node, new_scope)``.
        """
        base = scope or self.root_base or ""
        if ref.startswith("#") and base:
            # fragment-only ref: RFC 3986 §5.2 resolves it against the
            # base URI sans fragment REGARDLESS of scheme; urljoin only
            # implements that for hierarchical schemes in uses_relative —
            # under a urn: base it returns the bare fragment, silently
            # re-rooting the pointer at the ROOT document instead of the
            # urn-identified resource (review r05c)
            target = urldefrag(base)[0] + ref
        else:
            target = urljoin(base, ref) if base else ref
        uri, frag = urldefrag(target)
        if uri:
            if uri in self._id_index:
                doc = self._id_index[uri]
            elif uri in self.registry:
                doc = self.registry[uri]
            elif self.fetch_remote and uri.startswith(("http://", "https://")):
                doc = fetch_schema_document(uri)
                self.registry[uri] = doc
                self._index_document(doc, uri)
            else:
                raise SchemaError(f"unresolvable $ref: {ref!r} (uri {uri!r} not registered)")
            new_scope = uri
        else:
            doc = self.root_doc
            new_scope = scope or self.root_base
        frag = unquote(frag) if frag.startswith("/") is False else frag
        if frag == "":
            return doc, new_scope
        if frag.startswith("/"):
            node = evaluate_pointer(doc, frag)
            # entering a subtree may change scope if it carries $id
            return node, self._scope_of.get(id(node), new_scope)
        # plain-name fragment: $anchor lookup
        key = (new_scope, frag)
        if key in self._anchor_index:
            node = self._anchor_index[key]
            return node, self._scope_of.get(id(node), new_scope)
        raise SchemaError(f"unresolvable anchor {frag!r} in scope {new_scope!r}")

    def resolve_dynamic(self, ref: str, dynamic_scopes: list[str]) -> tuple[Any, str] | None:
        """$dynamicRef: outermost dynamic scope wins (SchemaVisitor.kt:36-53).

        ``dynamic_scopes`` is the stack of base URIs entered so far, outermost
        first. Returns None if no dynamic anchor matches (caller falls back to
        plain $ref semantics).

        PINNED DIVERGENCE from 2020-12 §8.2.3 (reference parity, review
        r05c): the spec's *bookending* requirement — dynamic resolution
        applies only when the initially-resolved target is itself a
        ``$dynamicAnchor`` — is not checked, matching the Kotlin
        reference's SchemaVisitor behavior: a ``$dynamicRef`` whose
        lexical target is a plain ``$anchor`` still participates in
        dynamic scope search. The vendored suite's bookending cases all
        include the bookend anchor, so both behaviors pass it.
        """
        uri, frag = urldefrag(ref)
        if not frag or frag.startswith("/"):
            return None
        for scope in dynamic_scopes:
            key = (scope, frag)
            if key in self._dynamic_anchor_index:
                node = self._dynamic_anchor_index[key]
                return node, self._scope_of.get(id(node), scope)
        return None
