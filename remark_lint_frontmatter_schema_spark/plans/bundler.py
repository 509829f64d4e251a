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


def bundle(path: str | Path, _depth: int = 0) -> dict:
    """Load a ruleset file and inline every external ``$ref``.

    Only file-relative refs are supported (no network in this sandbox; the
    reference also supports http(s) refs via json-schema-ref-parser —
    ``demo/pipeline.ts:15`` — which would slot in here).
    External refs are *inlined* (bundle semantics, not dereference-by-name;
    the reference deliberately chose bundling, CHANGELOG v3.14.0).
    """
    if _depth > 16:
        raise RulesetCompileError(f"$ref nesting too deep at {path}")
    base = Path(path).parent
    doc = load_document(path)
    return _inline_refs(doc, base, _depth)


def bundle_dict(doc: dict, base_dir: str | Path = ".") -> dict:
    """Bundle an already-parsed schema dict (the ``embed`` path,
    reference ``Settings.embed`` at index.ts:44)."""
    return _inline_refs(doc, Path(base_dir), 0)


def _inline_refs(node, base: Path, depth: int):
    if isinstance(node, dict):
        ref = node.get("$ref")
        if isinstance(ref, str) and not ref.startswith("#"):
            # external file ref: bundle it in place, keep provenance
            ref_path, _, frag = ref.partition("#")
            sub = bundle(base / ref_path, depth + 1)
            if frag:
                sub = _resolve_pointer(sub, frag)
            # record where this subtree came from so schema_path provenance
            # can keep the two-part form (file + pointer), as the reference's
            # bundled refs do (demo/pipeline.ts:74-79)
            out = dict(sub)
            out.setdefault("$bundled_from", posixpath.normpath(ref_path))
            extra = {k: v for k, v in node.items() if k != "$ref"}
            out.update(_inline_refs(extra, base, depth) if extra else {})
            return out
        return {k: _inline_refs(v, base, depth) for k, v in node.items()}
    if isinstance(node, list):
        return [_inline_refs(v, base, depth) for v in node]
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


def resolve_internal_ref(root: dict, ref: str) -> dict:
    """Resolve an internal ``#/definitions/...`` pointer against the root."""
    if not ref.startswith("#"):
        raise RulesetCompileError(f"external ref {ref!r} must be bundled first")
    return _resolve_pointer(root, ref[1:])
