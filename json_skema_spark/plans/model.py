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
No network I/O: remote documents must be pre-registered in the resolver's
``registry`` (the reference's pre-registered-URI map,
SchemaClient.kt:28-34; its HTTP client is intentionally not reproduced).
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


_ANCHOR_STOP_KEYWORDS = {"enum", "const"}  # raw-data subtrees; cf. SchemaLoader.kt:300-315


class Resolver:
    """Symbol table + $ref resolution for one root document (plus registry).

    ``registry`` maps absolute URI -> raw schema document (dict/bool), the
    Spark-side analogue of the reference's pre-registered schema client
    (SchemaClient.kt:28-34) with memoization (SchemaClient.kt:128-140).
    """

    def __init__(self, root_doc: Any, registry: dict[str, Any] | None = None,
                 base_uri: str = ""):
        self.registry: dict[str, Any] = dict(registry or {})
        self.root_doc = root_doc
        self.root_base = base_uri
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
    def _index_document(self, node: Any, base: str) -> None:
        if isinstance(node, bool):
            return
        if isinstance(node, dict):
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
            for key, child in node.items():
                if key in _ANCHOR_STOP_KEYWORDS:
                    continue
                self._index_document(child, base)
        elif isinstance(node, list):
            for child in node:
                self._index_document(child, base)

    # -- resolution (reference resolve, SchemaLoader.kt:381-466) ------------
    def scope_of(self, node: Any, default: str = "") -> str:
        return self._scope_of.get(id(node), default or self.root_base)

    def resolve(self, ref: str, scope: str) -> tuple[Any, str]:
        """Resolve ``ref`` against base-uri ``scope``.

        Returns ``(node, new_scope)``.
        """
        target = urljoin(scope or self.root_base or "", ref) if (scope or self.root_base) else ref
        uri, frag = urldefrag(target)
        if uri:
            if uri in self._id_index:
                doc = self._id_index[uri]
            elif uri in self.registry:
                doc = self.registry[uri]
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
