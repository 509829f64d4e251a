"""Driver-side ruleset loading and ``$ref`` bundling.

Mirrors the reference's schema-document pipeline: load a YAML/JSON
JSON-Schema file and inline external ``$ref``s before compilation
(reference: ``$RefParser.bundle`` at ``/root/reference/index.ts:278-282``;
``allOf + $ref`` composition fixture at
``/root/reference/demo/content/creative-work.schema.yaml:1-7``).

This is pure Python on the driver — it runs once per ruleset before any
Spark job, exactly like the reference bundles once per file validation.
Load/parse failures raise :class:`RulesetLoadError`, which callers turn
into run-level artifacts instead of job crashes (reference guard:
``index.ts:283-291``).
"""

from __future__ import annotations

import json
import posixpath
from pathlib import Path

try:  # PyYAML is present in this sandbox; JSON-only fallback keeps imports safe
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None


class RulesetLoadError(Exception):
    """Schema file load/parse error (reference: index.ts:283-291)."""


class RulesetCompileError(Exception):
    """Malformed schema document (reference: index.ts:335-340)."""


def load_document(path: str | Path) -> dict:
    p = Path(path)
    try:
        text = p.read_text()
    except OSError as exc:
        raise RulesetLoadError(f"YAML schema file load/parse: {p} — {exc}") from exc
    try:
        if p.suffix in (".yaml", ".yml") and _yaml is not None:
            doc = _yaml.safe_load(text)
        else:
            doc = json.loads(text)
    except Exception as exc:
        raise RulesetLoadError(f"YAML schema file load/parse: {p} — {exc}") from exc
    if not isinstance(doc, dict):
        raise RulesetLoadError(f"YAML schema file load/parse: {p} — not a mapping")
    return doc


def _is_remote(ref: str) -> bool:
    return ref.startswith("http://") or ref.startswith("https://")


def _parse_text(text: str, name: str) -> dict:
    """Parse fetched ruleset text (YAML when available, JSON fallback)."""
    try:
        if _yaml is not None:
            doc = _yaml.safe_load(text)
        else:  # pragma: no cover
            doc = json.loads(text)
    except Exception as exc:
        raise RulesetLoadError(
            f"YAML schema file load/parse: {name} — {exc}") from exc
    if not isinstance(doc, dict):
        raise RulesetLoadError(
            f"YAML schema file load/parse: {name} — not a mapping")
    return doc


def bundle(path: str | Path, _depth: int = 0, *, fetch=None) -> dict:
    """Load a ruleset file and inline every external ``$ref``.

    File-relative refs are read from disk; http(s) refs are resolved via
    ``fetch`` — an injectable ``Callable[[str], str]`` returning the
    document text (the reference resolves remote refs through
    json-schema-ref-parser, ``index.ts:278-282``; live example
    ``demo/pipeline.ts:15``). No fetcher + a remote ref is a load error
    (G2 guard: the routing layer turns it into a run artifact, not a
    crash) — this sandbox has no network, so the default stays offline.
    External refs are *inlined* (bundle semantics, not dereference-by-name;
    the reference deliberately chose bundling, CHANGELOG v3.14.0).
    """
    if _depth > 16:
        raise RulesetCompileError(f"$ref nesting too deep at {path}")
    base = Path(path).parent
    doc = load_document(path)
    return _inline_refs(doc, base, _depth, fetch)


def bundle_dict(doc: dict, base_dir: str | Path = ".", *, fetch=None) -> dict:
    """Bundle an already-parsed schema dict (the ``embed`` path,
    reference ``Settings.embed`` at index.ts:44)."""
    return _inline_refs(doc, Path(base_dir), 0, fetch)


def _bundle_remote(url: str, depth: int, fetch) -> dict:
    """Fetch + parse + recursively bundle a remote ruleset. Refs inside the
    fetched document resolve against the URL (relative -> urljoin), so a
    remote schema tree bundles exactly like a local one."""
    if depth > 16:
        raise RulesetCompileError(f"$ref nesting too deep at {url}")
    if fetch is None:
        raise RulesetLoadError(
            f"remote $ref {url!r} needs a fetcher: pass "
            "fetch=Callable[[str], str] to bundle()/bundle_dict()")
    try:
        text = fetch(url)
    except Exception as exc:
        raise RulesetLoadError(
            f"YAML schema file load/parse: {url} — {exc}") from exc
    doc = _parse_text(text, url)
    return _inline_refs(doc, url, depth, fetch)


def _join_ref(base, ref_path: str):
    """Resolve a ref target against the enclosing document's base — a
    directory Path for local documents, the document URL for remote ones."""
    if isinstance(base, str):  # base is a URL
        from urllib.parse import urljoin
        return urljoin(base, ref_path)
    return base / ref_path


def _inline_refs(node, base, depth: int, fetch=None):
    if isinstance(node, dict):
        ref = node.get("$ref")
        if isinstance(ref, str) and not ref.startswith("#"):
            # external ref (file or http(s)): bundle it in place
            ref_path, _, frag = ref.partition("#")
            if _is_remote(ref_path) or isinstance(base, str):
                url = ref_path if _is_remote(ref_path) \
                    else _join_ref(base, ref_path)
                sub = _bundle_remote(url, depth + 1, fetch)
                provenance = url
            else:
                sub = bundle(_join_ref(base, ref_path), depth + 1,
                             fetch=fetch)
                provenance = posixpath.normpath(ref_path)
            # inline the resource's OWN plain-name anchor refs before any
            # fragment selection: once this subtree is merged into the
            # caller's document, compile-time `#name` resolution scopes
            # to the CALLER's resource (anchors are per-resource), so a
            # self-reference like `$ref: '#item'` inside this file must
            # be resolved here, against this file, or it dangles
            sub = _inline_local_anchors(sub, depth + 1)
            if frag:
                sub = _resolve_fragment(sub, frag)
            # record where this subtree came from so schema_path provenance
            # can keep the two-part form (file + pointer), as the reference's
            # bundled refs do (demo/pipeline.ts:74-79)
            out = dict(sub)
            out.setdefault("$bundled_from", provenance)
            extra = {k: v for k, v in node.items() if k != "$ref"}
            out.update(_inline_refs(extra, base, depth, fetch) if extra else {})
            return out
        return {k: _inline_refs(v, base, depth, fetch) for k, v in node.items()}
    if isinstance(node, list):
        return [_inline_refs(v, base, depth, fetch) for v in node]
    return node


def _inline_local_anchors(resource: dict, depth: int, _node=None):
    """Resolve every ``$ref: '#name'`` plain-name anchor ref WITHIN one
    schema resource by inlining the anchored subtree (the bundling move,
    applied to anchors). Pointer-form ``#/...`` refs are left alone;
    nested ``$bundled_from`` subtrees are their own resources and were
    processed when they were bundled. Cyclic anchors hit the shared
    nesting limit."""
    if depth > 16:
        raise RulesetCompileError("$ref nesting too deep (anchor cycle?)")
    node = resource if _node is None else _node
    if isinstance(node, dict):
        ref = node.get("$ref")
        if (isinstance(ref, str) and ref.startswith("#")
                and "/" not in ref and len(ref) > 1):
            target = _resolve_anchor(resource, ref[1:])
            out = dict(_inline_local_anchors(resource, depth + 1, target))
            extra = {k: v for k, v in node.items() if k != "$ref"}
            out.update(_inline_local_anchors(resource, depth, extra))
            return out
        if _node is not None and "$bundled_from" in node:
            return node  # foreign resource, already processed
        return {k: _inline_local_anchors(resource, depth, v)
                for k, v in node.items()}
    if isinstance(node, list):
        return [_inline_local_anchors(resource, depth, v) for v in node]
    return node


def _resolve_pointer(doc: dict, pointer: str):
    cur = doc
    for part in pointer.strip("/").split("/"):
        if not part:
            continue
        part = part.replace("~1", "/").replace("~0", "~")
        try:
            cur = cur[int(part)] if isinstance(cur, list) else cur[part]
        except (KeyError, IndexError, ValueError) as exc:
            raise RulesetCompileError(f"bad $ref pointer {pointer!r}") from exc
    return cur


def _resolve_anchor(doc: dict, name: str):
    """Plain-name fragment resolution: the subtree carrying ``$anchor:
    name`` (2019-09) or the draft-07 location-independent form ``$id:
    "#name"``. Anchors are scoped to one SCHEMA RESOURCE: bundled-in
    subtrees (marked ``$bundled_from``) are foreign resources, so the
    walk does not descend into them — a root anchor never collides with
    (or silently resolves to) one defined inside a bundled file. Within
    the resource, duplicates are a compile error (the spec's uniqueness
    rule), not a silent first-wins."""
    hits: list = []

    def walk(node, is_root=False):
        if isinstance(node, dict):
            if not is_root and "$bundled_from" in node:
                return  # foreign resource boundary
            if node.get("$anchor") == name or node.get("$id") == f"#{name}":
                hits.append(node)
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(doc, is_root=True)
    if not hits:
        raise RulesetCompileError(f"unresolved $ref anchor #{name}")
    if len(hits) > 1:
        raise RulesetCompileError(
            f"duplicate $anchor {name!r}: anchors must be unique within a "
            "schema resource")
    return hits[0]


def _resolve_fragment(doc: dict, frag: str):
    """A ``#``-fragment is a plain-name anchor only when it LOOKS like
    one (no ``/`` — anchor names are ``[A-Za-z][A-Za-z0-9.:_-]*``, which
    cannot contain a slash); everything else goes to the pointer path,
    including the spec-sloppy-but-previously-working
    ``#definitions/foo`` form that ``_resolve_pointer`` tolerates."""
    if not frag or "/" in frag:
        return _resolve_pointer(doc, frag)
    return _resolve_anchor(doc, frag)


def resolve_internal_ref(root: dict, ref: str) -> dict:
    """Resolve an internal ``#/definitions/...`` pointer or ``#anchor``
    plain-name fragment against the root."""
    if not ref.startswith("#"):
        raise RulesetCompileError(f"external ref {ref!r} must be bundled first")
    return _resolve_fragment(root, ref[1:])


# ---------------------------------------------------------------------------
# draft 2019-09 / 2020-12 dynamic references — static unrolling
# ---------------------------------------------------------------------------

def _collect_dynamic_anchors(node, out, root, is_root=True,
                             res="root"):
    """Preorder walk: first occurrence of a $dynamicAnchor name wins —
    in a single bundled resource the preorder-first node IS the
    outermost dynamic scope, which is what $dynamicRef resolves to.
    Each anchor is recorded with its RESOURCE (the nearest enclosing
    non-root ``$id`` subtree, or ``"root"``) so resolution can refuse
    to cross resource boundaries."""
    if isinstance(node, dict):
        if not is_root and isinstance(node.get("$id"), str):
            res = id(node)
        a = node.get("$dynamicAnchor")
        if isinstance(a, str) and a not in out:
            out[a] = (node, res)
        if is_root and node.get("$recursiveAnchor") is True:
            out["\x00recursive"] = (node, res)
        for v in node.values():
            _collect_dynamic_anchors(v, out, root, is_root=False,
                                     res=res)
    elif isinstance(node, list):
        for v in node:
            _collect_dynamic_anchors(v, out, root, is_root=False,
                                     res=res)


def unroll_dynamic_refs(schema: dict, max_depth: int) -> dict:
    """Resolve ``$dynamicRef``/``$recursiveRef`` by STATIC UNROLLING to
    ``max_depth`` expansions — the Spark-first take on dynamic scope:
    the compiler binds schema nodes to column TYPES, and a Spark struct
    type has finite nesting, so a recursive schema only ever meets
    ``max_depth`` levels of real data. Beyond that the expansion
    becomes ``{}`` (vacuously true — there is no deeper column to
    check), which is exactly what a run-time dynamic resolver would
    conclude on data of that shape.

    Resolution model (documented approximation, single bundled
    resource): ``$dynamicRef: "#name"`` binds to the preorder-first
    (outermost) ``$dynamicAnchor: name``; ``$recursiveRef: "#"`` binds
    to the root when it carries ``$recursiveAnchor: true``. Sibling
    keywords merge over the expansion (the bundler's $ref-with-siblings
    rule). Unresolvable names are left in place, so they surface in
    ``unknown`` exactly as before. The anchor declarations themselves
    are dropped from the output (resolution metadata, not checks).

    Multi-resource guard: the lexical preorder-first rule is only
    equivalent to 2020-12 dynamic-scope resolution WITHIN one schema
    resource. When the bundle embeds nested resources (non-root
    ``$id``), a dynamic ref whose preorder-first anchor lives in a
    DIFFERENT resource than the ref site is deliberately NOT resolved
    — it stays in place and surfaces as ``unknown``, the honest
    artifact — because the spec resolver could legitimately pick a
    different anchor there. Same-resource refs still unroll."""
    anchors: dict = {}
    _collect_dynamic_anchors(schema, anchors, schema)

    def expand(node, depth, res):
        if isinstance(node, list):
            return [expand(v, depth, res) for v in node]
        if not isinstance(node, dict):
            return node
        if node is not schema and isinstance(node.get("$id"), str):
            res = id(node)
        target = ares = None
        ref = node.get("$dynamicRef")
        if isinstance(ref, str) and ref.startswith("#") \
                and ref[1:] in anchors:
            target, ares = anchors[ref[1:]]
            ref_key = "$dynamicRef"
        elif node.get("$recursiveRef") == "#" \
                and "\x00recursive" in anchors:
            target, ares = anchors["\x00recursive"]
            ref_key = "$recursiveRef"
        if target is not None and ares != res:
            # cross-resource dynamic ref: refuse the approximation,
            # keep the ref keyword so the compiler collects it into
            # ``unknown`` (fail-loud, never a silently-different check)
            target = None
        if target is not None:
            siblings = {k: v for k, v in node.items() if k != ref_key}
            if depth <= 0:
                out = {}
            else:
                out = dict(expand(target, depth - 1, ares))
            out.update(expand(siblings, depth, res))
            out.pop("$dynamicAnchor", None)
            out.pop("$recursiveAnchor", None)
            return out
        out = {k: expand(v, depth, res)
               for k, v in node.items()
               if k not in ("$dynamicAnchor", "$recursiveAnchor")}
        return out

    if not anchors:
        return schema
    return expand(schema, int(max_depth), "root")
