"""Compile a JSON-Schema-shaped constraint document into Spark Columns.

This is the engine's analog of the reference's Ajv JIT compile
(``/root/reference/index.ts:322`` — ``ajv.compile(schema)`` generates a
specialized validator function). Here the "specialized function" is a set
of Catalyst Column expressions: one boolean ``violated`` expression per
constraint plus fully-precomputed message metadata, later assembled into a
single projection (see ``operators/validate.py``) so that **all checks run
in one scan with no short-circuit** — the reference's ``allErrors: true``
semantics (``index.ts:312``).

Message fidelity mirrors ``pushErrors`` (``index.ts:105-119``):

    reason = Capitalize(ajv_message) + [": `v1`, `v2`"] + [" • schemaRelPath"] + " • " + schemaPath

Every message is schema-determined, so templates are baked at compile time
(the reference recomputes them per error; at 10^12 rows they must be
literals that Catalyst constant-folds).

Unknown keywords warn-don't-fail, mirroring Ajv ``strict: false``
(``index.ts:313``); they are collected into ``CompiledRuleset.unknown``.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field, replace as _dc_replace

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bundler import RulesetCompileError, resolve_internal_ref
from . import variant as _vr
from ..functions import content as _content
from ..functions.formats import (FORMAT_ALWAYS_OK, FORMAT_FINITE,
                                 FORMAT_NUMERIC_RANGE, FORMAT_REGEX,
                                 FORMAT_UDF_CHECKERS)

# JSON type name -> predicate over a Spark DataType: "statically satisfied"
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)

_STATIC_TYPE_OK = {
    "string": lambda t: isinstance(t, T.StringType),
    "integer": lambda t: isinstance(t, _INTEGRAL),
    "number": lambda t: isinstance(t, _NUMERIC),
    "boolean": lambda t: isinstance(t, T.BooleanType),
    "array": lambda t: isinstance(t, T.ArrayType),
    "object": lambda t: isinstance(t, (T.StructType, T.MapType)),
    "null": lambda t: False,
}

_KNOWN_KEYWORDS = {
    "type", "enum", "const", "required", "maxLength", "minLength", "pattern",
    "contentEncoding", "contentMediaType", "contentSchema",
    "format", "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
    "multipleOf", "properties", "patternProperties", "items",
    "additionalItems", "prefixItems", "additionalProperties", "allOf",
    "anyOf", "oneOf", "not", "$ref", "$schema", "$id", "$anchor",
    "$bundled_from",
    "title", "description", "definitions", "$defs", "default", "examples",
    # annotation-only keywords (Ajv collects, never validates): known so
    # strict mode doesn't false-flag documented schemas
    "$comment", "readOnly", "writeOnly", "deprecated",
    "contentEncoding", "contentMediaType",
    "maxItems", "minItems",
    "uniqueItems", "contains", "minContains", "maxContains",
    "minProperties", "maxProperties", "dependentRequired", "dependencies",
    "dependentSchemas", "unevaluatedProperties", "unevaluatedItems",
    "if", "then", "else", "propertyNames",
    # engine extension points (reference analog: custom Ajv keywords via
    # ajvOptions, index.ts:49): named vectorized pandas-UDF check, plus
    # table-level declarations (uniqueness / referential / drift) that
    # compile into CompiledRuleset.table_checks and run as separate
    # relational passes
    "x-spark-check", "x-unique", "x-ref", "x-ref-asof", "x-ref-interval",
    "x-drift", "x-severity",
    "x-dedup", "x-langid", "x-rate", "x-decontaminate", "x-label-conflict",
    "x-repair",  # per-property opt-out consumed by operators/repair.py
    "x-outlier",
    "x-skew", "x-reconcile", "x-calendar", "x-freshness", "x-benford",
    "x-corr", "x-mask",
    "x-monotonic",
    "x-dup-ngram",
    "x-gopher",
    "x-c4",
    "x-leakage",
    "x-embedding",
    "x-fd",
    "x-gap",
    "x-gibberish",
    "x-lm-ppl",
    "x-finite",
    "x-encoding",
    "x-readability",
    "x-quantile",
    "x-volume",
}


@dataclass(frozen=True)
class Check:
    """One compiled constraint — the unit that becomes a violation struct."""

    constraint_id: str
    keyword: str
    instance_path: str   # Ajv instancePath, e.g. "/props/take" (index.ts:123)
    schema_path: str     # two-part provenance "file.yaml#/ptr" (pipeline.ts:74-79)
    message: str         # fully-assembled reason, reference format (index.ts:105-119)
    violated: Column     # boolean Column: True => emit violation row
    actual: Column       # offending value stringified (index.ts:139)
    expected: tuple | None = None  # allowed values (enum/const, index.ts:168,173)
    severity: str = "warning"


@dataclass
class CompiledRuleset:
    name: str
    checks: list = field(default_factory=list)
    static_failures: list = field(default_factory=list)  # (path, keyword, why)
    static_passes: list = field(default_factory=list)
    unknown: list = field(default_factory=list)          # strict:false analog
    columns_read: set = field(default_factory=set)       # for column pruning
    # table-level declarations (x-unique / x-ref): not row expressions —
    # they need aggregates/joins, so validate() ignores them and
    # operators.table_checks runs them as separate relational passes
    table_checks: list = field(default_factory=list)     # (kind, column, params)
    # (name, Column) pairs to project BELOW the checks projection (see
    # operators.validate.stage_columns): variant expressions are
    # CodegenFallback — interpreted — so tag/string/double views of each
    # variant node are computed once here instead of once per keyword
    staged: list = field(default_factory=list)
    ruleset_hash: str = ""
    options: dict = field(default_factory=dict)          # ajvOptions analog

    def summary(self) -> dict:
        return {
            "name": self.name,
            "n_checks": len(self.checks),
            "static_failures": self.static_failures,
            "static_passes": self.static_passes,
            "unknown_keywords": self.unknown,
            "columns_read": sorted(self.columns_read),
            "ruleset_hash": self.ruleset_hash,
        }


@dataclass
class _Ctx:
    """Compilation context for one schema node."""

    col: Column | None          # Column expr for the instance at this node (None = root row)
    dtype: T.DataType | None    # Spark type at this node (None = root / unknown)
    instance_path: str          # "/codec"
    schema_path: str            # "#/properties/codec"
    schema_file: str            # provenance file prefix ("" on embed path, index.ts:181-183)
    df_schema: T.StructType
    root_schema: dict
    out: CompiledRuleset
    extra_checks: dict          # name -> callable(Column) -> Column for x-spark-check
    silent: bool = False        # True while compiling anyOf/oneOf/not children
    severity: str = "warning"   # x-severity, inherited down the node tree
    # staging registrar `(hint, Column) -> Column` writing into
    # out.staged, or None where staging is illegal (inside HOF lambdas,
    # probe rulesets — their checks are folded into one expression and
    # the probe's staged list would be discarded)
    stage: object = None
    # per-variant-node staged views {"t": tag, "s": string, "d": double,
    # "actual": rendered actual} — set by _compile_variant_node, consumed
    # by _variant_scalar_checks / _type_check / _add
    vstage: dict | None = None


def balanced_reduce(op, cols: list):
    """Fold ``cols`` with ``op`` as a BALANCED tree, not a left-deep chain.

    Catalyst codegen recurses once per tree level; a 500-term ``a+b+c+...``
    chain is ~500 frames deep and intermittently blows the executor thread
    stack (observed as StackOverflowError in BinaryArithmetic codegen on
    the 500-constraint stress test). Balanced pairing makes the depth
    log2(n) (~9 for 500 terms) — same result, codegen-safe at any ruleset
    width."""
    assert cols
    while len(cols) > 1:
        cols = [op(cols[i], cols[i + 1]) if i + 1 < len(cols) else cols[i]
                for i in range(0, len(cols), 2)]
    return cols[0]


def _cap(msg: str) -> str:
    """Capitalize first letter (reference index.ts:106-109)."""
    return msg[:1].upper() + msg[1:]


def _reason(ajv_message: str, ctx: _Ctx, kw: str, expected=None) -> str:
    """Assemble the reason string exactly as index.ts:105-119."""
    expected_part = ""
    if expected:
        expected_part = ": " + ", ".join(f"`{v}`" for v in expected)
    s_path = f" • {ctx.schema_file}" if ctx.schema_file else ""
    schema_ptr = f"{ctx.schema_path}/{kw}"
    return f"{_cap(ajv_message)}{expected_part}{s_path} • {schema_ptr}"


def _schema_path(ctx: _Ctx, kw: str) -> str:
    """Two-part schema provenance: 'file.yaml#/ptr/keyword' (pipeline.ts:74-79)."""
    ptr = f"{ctx.schema_path}/{kw}"
    return f"{ctx.schema_file}{ptr}" if ctx.schema_file else ptr


def _actual_str(col: Column | None, dtype: T.DataType | None) -> Column:
    """Stringify the incriminated value (index.ts:139 node.toString()).

    Binary payloads are truncated to a hex prefix — never carry audio bytes
    into the violations relation (payload discipline at 10^12 rows).
    """
    if col is None:
        return F.lit(None).cast("string")
    if isinstance(dtype, T.BinaryType):
        return F.hex(F.substring(col, 1, 16))
    if _vr.is_variant(dtype):
        # bare value for scalars, JSON text for object/array; a present
        # JSON null renders as "null" (Ajv's node.toString()), not SQL NULL
        return F.when(_vr.is_json_null(col), F.lit("null")) \
                .otherwise(_vr.as_string(col))
    if isinstance(dtype, (T.MapType, T.ArrayType)) and _has_variant(dtype):
        # variant object/array VIEWS: cast-to-string has no variant path,
        # to_json does
        return F.to_json(col)
    return col.cast("string")


def _has_variant(dtype: T.DataType) -> bool:
    """Variant anywhere inside a (possibly nested) complex type."""
    if _vr.is_variant(dtype):
        return True
    if isinstance(dtype, T.ArrayType):
        return _has_variant(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return _has_variant(dtype.keyType) or _has_variant(dtype.valueType)
    if isinstance(dtype, T.StructType):
        return any(_has_variant(f.dataType) for f in dtype.fields)
    return False


def _add(ctx: _Ctx, kw: str, violated: Column, message: str,
         expected=None, actual: Column | None = None,
         instance_path: str | None = None) -> Column:
    """Register a check (unless compiling silently) and return its predicate."""
    ipath = ctx.instance_path if instance_path is None else instance_path
    if not ctx.silent:
        cid = f"{ctx.out.name}:{ipath or '/'}:{kw}"
        # disambiguate duplicate ids (e.g. two allOf branches constraining same key)
        existing = {c.constraint_id for c in ctx.out.checks}
        if cid in existing:
            i = 2
            while f"{cid}#{i}" in existing:
                i += 1
            cid = f"{cid}#{i}"
        ctx.out.checks.append(
            Check(
                constraint_id=cid,
                keyword=kw,
                instance_path=ipath,
                schema_path=_schema_path(ctx, kw),
                message=message,
                violated=violated,
                actual=actual if actual is not None
                else (ctx.vstage["actual"] if ctx.vstage is not None
                      else _actual_str(ctx.col, ctx.dtype)),
                expected=tuple(str(v) for v in expected) if expected else None,
                severity=ctx.severity,
            )
        )
    return violated


# ---------------------------------------------------------------------------
# keyword compilers — each returns the `violated` Column it registered
# ---------------------------------------------------------------------------

def _present(ctx: _Ctx) -> Column:
    """Instance exists at this path — Ajv skips value keywords on missing
    properties (only `required` fires); NULL column == absent property."""
    return ctx.col.isNotNull()


def _type_check(ctx: _Ctx, json_type) -> None:
    types = json_type if isinstance(json_type, list) else [json_type]
    msg = _reason(f"must be {types[0] if len(types) == 1 else ','.join(types)}",
                  ctx, "type")
    if ctx.col is None:  # root node — a row is always an object
        if "object" in types:
            ctx.out.static_passes.append((ctx.instance_path, "type"))
        else:
            # a well-formed but unsatisfiable root type (e.g. "string"):
            # statically violated for every row, never a compile crash
            ctx.out.static_failures.append(
                (ctx.instance_path, "type",
                 f"root is always an object, never {types}"))
            _add(ctx, "type", F.lit(True), msg)
        return
    dtype = ctx.dtype
    ok_static = dtype is not None and any(
        _STATIC_TYPE_OK.get(t, lambda _: False)(dtype) for t in types
    )
    if ok_static:
        # "null" in JSON-Schema union adds nothing: absent == NULL already skips
        ctx.out.static_passes.append((ctx.instance_path, "type"))
        return
    # dynamic check paths
    if isinstance(dtype, T.StringType):
        casts = []
        for t in types:
            if t == "integer":
                casts.append(ctx.col.try_cast("bigint").isNotNull())
            elif t == "number":
                casts.append(ctx.col.try_cast("double").isNotNull())
            elif t == "boolean":
                casts.append(F.lower(ctx.col).isin("true", "false"))
            elif t == "null":
                casts.append(F.lit(False))
        if casts:
            ok = casts[0]
            for c in casts[1:]:
                ok = ok | c
            _add(ctx, "type", _present(ctx) & ~ok, msg)
            return
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)) \
            and "integer" in types:
        # JSON Schema: 1.0 is a valid integer (zero fractional part).
        # `in` not `==`: a union like ["integer", "null"] or
        # ["integer", "string"] on a float column reduces to the integer
        # check (a number can never satisfy the non-numeric alternatives,
        # "null" is the presence guard) — the == spelling sent unions to
        # the always-violated fallthrough
        _add(ctx, "type", _present(ctx) & (ctx.col != F.floor(ctx.col)), msg)
        return
    if _vr.is_variant(dtype):
        # variant keeps the value's own JSON type per row
        # (schema_of_variant tag), so this is the one column kind where
        # `type` has exact Ajv semantics dynamically: "10" is a string,
        # 10 is a number/integer, JSON null is type "null" (present)
        vs = ctx.vstage or {}
        oks = [ok for t in types
               if (ok := _vr.type_ok(ctx.col, t, t=vs.get("t"),
                                     d=vs.get("d"))) is not None]
        if not oks:
            ctx.out.static_failures.append(
                (ctx.instance_path, "type",
                 f"no JSON type in {types} is testable"))
            _add(ctx, "type", _present(ctx), msg)
            return
        any_ok = oks[0]
        for o in oks[1:]:
            any_ok = any_ok | o
        _add(ctx, "type", _present(ctx) & ~any_ok, msg)
        return
    # statically impossible (e.g. int column where string required):
    # every present value violates
    ctx.out.static_failures.append((ctx.instance_path, "type",
                                    f"column type {dtype} never satisfies {types}"))
    _add(ctx, "type", _present(ctx), msg)


# keyword -> shape predicate; violations of these are "JSON schema malformed"
# (the guard the reference hits when Ajv compile throws, index.ts:335-340)
_NUM = (int, float)


def _regex_ok(p) -> bool:
    """Compile-time regex validation (Ajv fails compile on a bad regex,
    index.ts:335-340 guard; without this the error surfaces as an executor
    PatternSyntaxException mid-job). The check uses the JVM's own
    ``java.util.regex.Pattern`` when a session is up (the authoritative
    dialect, since ``rlike`` executes Java regex — Python ``re`` would
    reject Java-valid patterns like ``\\p{Lu}+`` and accept Java-invalid
    ones); falls back to Python ``re`` only when no JVM is available."""
    if not isinstance(p, str):
        return False
    try:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
    except Exception:
        spark = None
    if spark is not None:
        try:
            spark._jvm.java.util.regex.Pattern.compile(p)  # noqa: SLF001
            return True
        except Exception:
            return False
    try:
        re.compile(p)
        return True
    except re.error:
        return False


_KEYWORD_SHAPE = {
    "enum": lambda v: isinstance(v, list) and len(v) > 0,
    "required": lambda v: isinstance(v, list) and all(isinstance(p, str) for p in v),
    "maxLength": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "minLength": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "pattern": _regex_ok,
    "contentEncoding": lambda v: isinstance(v, str),
    "contentMediaType": lambda v: isinstance(v, str),
    "contentSchema": lambda v: isinstance(v, dict),
    "format": lambda v: isinstance(v, str),
    "minimum": lambda v: isinstance(v, _NUM) and not isinstance(v, bool),
    "maximum": lambda v: isinstance(v, _NUM) and not isinstance(v, bool),
    "exclusiveMinimum": lambda v: isinstance(v, _NUM) and not isinstance(v, bool),
    "exclusiveMaximum": lambda v: isinstance(v, _NUM) and not isinstance(v, bool),
    "multipleOf": lambda v: isinstance(v, _NUM) and not isinstance(v, bool) and v > 0,
    "maxItems": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "minItems": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "properties": lambda v: isinstance(v, dict),
    "patternProperties": lambda v: isinstance(v, dict) and all(
        _regex_ok(p) and isinstance(s, dict) for p, s in v.items()),
    "items": lambda v: isinstance(v, dict) or (
        isinstance(v, list) and all(isinstance(s, dict) for s in v)),
    "prefixItems": lambda v: isinstance(v, list) and all(
        isinstance(s, dict) for s in v),
    "additionalItems": lambda v: isinstance(v, (bool, dict)),
    "allOf": lambda v: isinstance(v, list) and all(isinstance(s, dict) for s in v),
    "anyOf": lambda v: isinstance(v, list) and len(v) > 0 and all(isinstance(s, dict) for s in v),
    "oneOf": lambda v: isinstance(v, list) and len(v) > 0 and all(isinstance(s, dict) for s in v),
    "not": lambda v: isinstance(v, dict),
    "type": lambda v: isinstance(v, str) or (isinstance(v, list) and all(isinstance(t, str) for t in v)),
    "uniqueItems": lambda v: isinstance(v, bool),
    "contains": lambda v: isinstance(v, dict),
    "minContains": lambda v: isinstance(v, int) and not isinstance(v, bool) and v >= 0,
    "maxContains": lambda v: isinstance(v, int) and not isinstance(v, bool) and v >= 0,
    "minProperties": lambda v: isinstance(v, int) and not isinstance(v, bool) and v >= 0,
    "maxProperties": lambda v: isinstance(v, int) and not isinstance(v, bool) and v >= 0,
    "dependentRequired": lambda v: isinstance(v, dict) and all(
        isinstance(r, list) and all(isinstance(p, str) for p in r)
        for r in v.values()),
    # draft-07 `dependencies`: array form (property deps) or dict form (schema deps)
    "dependencies": lambda v: isinstance(v, dict) and all(
        (isinstance(r, list) and all(isinstance(p, str) for p in r))
        or isinstance(r, dict)
        for r in v.values()),
    "dependentSchemas": lambda v: isinstance(v, dict) and all(
        isinstance(r, dict) for r in v.values()),
    "unevaluatedProperties": lambda v: isinstance(v, (bool, dict)),
    "unevaluatedItems": lambda v: isinstance(v, (bool, dict)),
    "x-embedding": lambda v: isinstance(v, dict)
    and (v.get("dim") is None
         or (isinstance(v["dim"], int) and not isinstance(v["dim"], bool)
             and v["dim"] > 0))
    and all(v.get(k) is None or isinstance(v[k], bool)
            for k in ("finite", "nonzero", "normalized"))
    and (v.get("norm_tol") is None
         or (isinstance(v["norm_tol"], _NUM)
             and not isinstance(v["norm_tol"], bool) and v["norm_tol"] > 0)),
    "if": lambda v: isinstance(v, dict),
    "then": lambda v: isinstance(v, dict),
    "else": lambda v: isinstance(v, dict),
    "propertyNames": lambda v: isinstance(v, dict),
    "x-unique": lambda v: isinstance(v, bool) or (
        isinstance(v, list) and len(v) >= 2
        and all(isinstance(k, str) for k in v)
        and len(set(v)) == len(v)),
    "x-outlier": lambda v: isinstance(v, dict)
    and (v.get("id") is None or isinstance(v["id"], str))
    and (v.get("k") is None
         or (isinstance(v["k"], _NUM) and not isinstance(v["k"], bool)
             and v["k"] > 0))
    and (v.get("approx") is None or isinstance(v["approx"], bool))
    and (v.get("by") is None or isinstance(v["by"], str)),
    "x-skew": lambda v: isinstance(v, dict)
    and isinstance(v.get("max_share"), _NUM)
    and not isinstance(v.get("max_share"), bool)
    and 0 < v["max_share"] <= 1
    and (v.get("top_k") is None
         or (isinstance(v["top_k"], int) and not isinstance(v["top_k"], bool)
             and v["top_k"] > 0))
    and (v.get("by") is None or isinstance(v["by"], str)),
    "x-mask": lambda v: isinstance(v, dict)
    and isinstance(v.get("expect"), str) and v["expect"] != ""
    and (v.get("min_share") is None
         or (isinstance(v["min_share"], _NUM)
             and not isinstance(v["min_share"], bool)
             and 0 < v["min_share"] <= 1))
    and (v.get("by") is None or isinstance(v["by"], str)),
    "x-corr": lambda v: isinstance(v, dict)
    and isinstance(v.get("with"), str)
    and isinstance(v.get("min_abs"), _NUM)
    and not isinstance(v.get("min_abs"), bool)
    and 0 < v["min_abs"] <= 1
    and (v.get("by") is None or isinstance(v["by"], str)),
    "x-benford": lambda v: isinstance(v, dict)
    and (v.get("max_mad") is None
         or (isinstance(v["max_mad"], _NUM)
             and not isinstance(v["max_mad"], bool) and v["max_mad"] > 0))
    and (v.get("by") is None or isinstance(v["by"], str)),
    "x-calendar": lambda v: isinstance(v, dict)
    and v.get("unit", "day") in ("minute", "hour", "day", "week", "month")
    and (v.get("by") is None or isinstance(v["by"], str))
    and (v.get("max_buckets") is None
         or (isinstance(v["max_buckets"], int)
             and not isinstance(v["max_buckets"], bool)
             and v["max_buckets"] > 0)),
    "x-freshness": lambda v: isinstance(v, dict)
    and isinstance(v.get("max_age_seconds"), _NUM)
    and not isinstance(v.get("max_age_seconds"), bool)
    and v["max_age_seconds"] > 0
    and (v.get("as_of") is None or isinstance(v["as_of"], str))
    and (v.get("by") is None or isinstance(v["by"], str)),
    "x-reconcile": lambda v: isinstance(v, dict)
    and isinstance(v.get("fact"), str)
    and isinstance(v.get("key"), str)
    and isinstance(v.get("fact_value"), str)
    and (v.get("fact_key") is None or isinstance(v["fact_key"], str))
    and v.get("agg", "sum") in ("sum", "count", "avg", "min", "max")
    and (v.get("tolerance") is None
         or (isinstance(v["tolerance"], _NUM)
             and not isinstance(v["tolerance"], bool)
             and v["tolerance"] >= 0))
    and v.get("on_missing", "violate") in ("violate", "ignore"),
    "x-severity": lambda v: v in ("error", "warning", "info"),
    "x-monotonic": lambda v: isinstance(v, dict)
    and isinstance(v.get("order_by"), str)
    and (v.get("by") is None or isinstance(v["by"], str))
    and (v.get("id") is None or isinstance(v["id"], str))
    # explicit null (YAML `direction:`) means "use the default"
    and (v.get("direction") is None or v["direction"] in (
        "non-decreasing", "increasing", "non-increasing", "decreasing"))
    and (v.get("n_buckets") is None
         or (isinstance(v["n_buckets"], int)
             and not isinstance(v["n_buckets"], bool)
             and v["n_buckets"] > 0)),
    "x-finite": lambda v: isinstance(v, bool),
    "x-gibberish": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and isinstance(v.get("min_logp"), _NUM)
    and not isinstance(v["min_logp"], bool),
    "x-readability": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and ("lo" in v or "hi" in v)
    and all(isinstance(v[b], _NUM) and not isinstance(v[b], bool)
            for b in ("lo", "hi") if b in v)
    and (("lo" not in v or "hi" not in v) or v["lo"] <= v["hi"]),
    "x-volume": lambda v: isinstance(v, dict)
    and v.get("unit", "day") in ("minute", "hour", "day", "week", "month")
    and (v.get("k") is None
         or (isinstance(v["k"], _NUM) and not isinstance(v["k"], bool)
             and v["k"] > 0))
    and (v.get("by") is None or isinstance(v["by"], str)),
    "x-quantile": lambda v: isinstance(v, dict)
    and isinstance(v.get("q"), _NUM) and not isinstance(v["q"], bool)
    and 0 <= v["q"] <= 1
    and ("lo" in v or "hi" in v)
    and all(isinstance(v[b], _NUM) and not isinstance(v[b], bool)
            for b in ("lo", "hi") if b in v)
    and (("lo" not in v or "hi" not in v) or v["lo"] <= v["hi"])
    and (v.get("by") is None or isinstance(v["by"], str))
    and isinstance(v.get("approx", False), bool),
    "x-lm-ppl": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and isinstance(v.get("max_ppl"), _NUM)
    and not isinstance(v["max_ppl"], bool) and v["max_ppl"] > 0
    and (v.get("n") is None
         or (isinstance(v["n"], int) and not isinstance(v["n"], bool)
             and v["n"] >= 2))
    and (v.get("k") is None
         or (isinstance(v["k"], _NUM) and not isinstance(v["k"], bool)
             and v["k"] > 0)),
    "x-gap": lambda v: isinstance(v, dict)
    and isinstance(v.get("max_seconds"), _NUM)
    and not isinstance(v["max_seconds"], bool) and v["max_seconds"] > 0
    and (v.get("by") is None or isinstance(v["by"], str))
    and (v.get("id") is None or isinstance(v["id"], str))
    and (v.get("n_buckets") is None
         or (isinstance(v["n_buckets"], int)
             and not isinstance(v["n_buckets"], bool)
             and v["n_buckets"] > 0)),
    "x-fd": lambda v: isinstance(v, dict)
    and isinstance(v.get("determined_by"), list)
    and len(v["determined_by"]) > 0
    and all(isinstance(c, str) for c in v["determined_by"])
    and (v.get("id") is None or isinstance(v["id"], str)),
    "x-ref": lambda v: isinstance(v, dict) and isinstance(v.get("dim"), str)
    and isinstance(v.get("key"), str)
    and (v.get("n_items") is None
         or (isinstance(v["n_items"], int) and not isinstance(v["n_items"], bool)
             and v["n_items"] > 0)),
    "x-ref-interval": lambda v: isinstance(v, dict)
    and isinstance(v.get("dim"), str) and isinstance(v.get("key"), str)
    and isinstance(v.get("ts"), str) and isinstance(v.get("start"), str)
    and isinstance(v.get("end"), str)
    and isinstance(v.get("bucket"), (int, float))
    and not isinstance(v["bucket"], bool) and v["bucket"] > 0,
    "x-ref-asof": lambda v: isinstance(v, dict)
    and isinstance(v.get("dim"), str) and isinstance(v.get("key"), str)
    and isinstance(v.get("ts"), str) and isinstance(v.get("dim_ts"), str)
    and (v.get("tolerance") is None
         or (isinstance(v["tolerance"], (int, float))
             and not isinstance(v["tolerance"], bool)
             and v["tolerance"] > 0))
    and v.get("direction", "backward") in ("backward", "forward")
    and (v.get("bucket") is None
         or (isinstance(v["bucket"], (int, float))
             and not isinstance(v["bucket"], bool) and v["bucket"] > 0)),
    "x-dup-ngram": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and (v.get("n") is None
         or (isinstance(v["n"], int) and not isinstance(v["n"], bool)
             and v["n"] > 0))
    and (v.get("max_frac") is None
         or (isinstance(v["max_frac"], _NUM)
             and not isinstance(v["max_frac"], bool)
             and 0 <= v["max_frac"] < 1)),
    "x-leakage": lambda v: isinstance(v, dict)
    and isinstance(v.get("group"), str),
    "x-c4": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and all(v.get(k) is None
            or (isinstance(v[k], int) and not isinstance(v[k], bool)
                and v[k] > 0)
            for k in ("min_words_per_line", "min_sentences")),
    "x-gopher": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and (v.get("rules") is None
         or (isinstance(v["rules"], list) and len(v["rules"]) > 0
             and all(isinstance(r, str) for r in v["rules"])
             and set(v["rules"]) <= {
                 "word_count", "mean_word_len", "symbol_ratio",
                 "bullet_lines", "ellipsis_lines", "alpha_words",
                 "stopwords"})),
    "x-dedup": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and v.get("method", "exact") in ("exact", "jaccard", "acoustic", "url")
    and (v.get("block") is None or isinstance(v["block"], str))
    and (v.get("threshold") is None
         or (isinstance(v["threshold"], _NUM)
             and not isinstance(v["threshold"], bool)))
    and (v.get("n") is None
         or (isinstance(v["n"], int) and not isinstance(v["n"], bool)
             and v["n"] > 0))
    and (v.get("max_distance") is None
         or (isinstance(v["max_distance"], int)
             and not isinstance(v["max_distance"], bool)
             and 0 <= v["max_distance"] <= 7)),
    "x-langid": lambda v: isinstance(v, dict)
    and isinstance(v.get("declared"), str)
    and (v.get("min_tokens") is None
         or (isinstance(v["min_tokens"], int)
             and not isinstance(v["min_tokens"], bool)
             and v["min_tokens"] >= 0)),
    "x-encoding": lambda v: isinstance(v, dict)
    and (v.get("max_artifacts") is None
         or (isinstance(v["max_artifacts"], int)
             and not isinstance(v["max_artifacts"], bool)
             and v["max_artifacts"] >= 0))
    and (v.get("patterns") is None
         or (isinstance(v["patterns"], list) and v["patterns"]
             and all(isinstance(p, str) for p in v["patterns"]))),
    "x-rate": lambda v: isinstance(v, dict)
    and isinstance(v.get("duration"), str)
    and all(v.get(k) is None
            or (isinstance(v[k], _NUM) and not isinstance(v[k], bool))
            for k in ("lo", "hi"))
    and (v.get("lo") is None or v.get("hi") is None
         or float(v["lo"]) < float(v["hi"])),
    "x-decontaminate": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and isinstance(v.get("bench"), str)
    and (v.get("bloom") is None or isinstance(v["bloom"], bool))
    and all(v.get(k) is None
            or (isinstance(v[k], int) and not isinstance(v[k], bool)
                and v[k] > 0)
            for k in ("n", "min_shared", "n_items")),
    "x-label-conflict": lambda v: isinstance(v, dict)
    and isinstance(v.get("id"), str)
    and isinstance(v.get("transcript"), str)
    and (v.get("max_distance") is None
         or (isinstance(v["max_distance"], int)
             and not isinstance(v["max_distance"], bool)
             and 0 <= v["max_distance"] <= 7))
    and isinstance(v.get("grade", False), bool)
    and (v.get("contradiction_below") is None
         or (isinstance(v["contradiction_below"], (int, float))
             and not isinstance(v["contradiction_below"], bool)
             and 0 <= v["contradiction_below"] <= 1)),
    "x-drift": lambda v: isinstance(v, dict)
    and isinstance(v.get("partition_col"), str)
    and v.get("side_a") is not None and v.get("side_b") is not None
    and isinstance(v.get("lo"), _NUM) and not isinstance(v.get("lo"), bool)
    and isinstance(v.get("hi"), _NUM) and not isinstance(v.get("hi"), bool)
    # optional knobs must coerce cleanly — a bad type must fail compile
    # (G2 artifact), not raise a raw ValueError mid-routing
    and all(v.get(k) is None
            or (isinstance(v[k], _NUM) and not isinstance(v[k], bool))
            for k in ("n_buckets", "ks_threshold", "psi_threshold",
                      "emd_threshold", "jsd_threshold", "cvm_threshold"))
    # per-segment form carries ks/psi only (emd/jsd/cvm are global)
    and (v.get("by") is None
         or (isinstance(v["by"], str)
             and all(v.get(k) is None for k in
                     ("emd_threshold", "jsd_threshold",
                      "cvm_threshold")))),
}


def _shape_walk(schema: dict, path: str = "#") -> None:
    """Meta-validate the whole schema tree BEFORE binding to columns.

    Ajv compiles the full schema up front, so a malformed keyword fails
    even inside a subtree the instance never reaches (e.g. a property
    whose column is absent). The per-node checks in ``_compile_keywords``
    can't see skipped subtrees, hence this pure pre-pass.
    """
    for kw, v in schema.items():
        if kw in _KEYWORD_SHAPE and not _KEYWORD_SHAPE[kw](v):
            raise RulesetCompileError(
                f"JSON schema malformed: bad value for {kw!r} at {path}: {v!r}")
    for prop, sub in (schema.get("properties") or {}).items():
        if not isinstance(sub, dict):
            raise RulesetCompileError(
                f"JSON schema malformed: schema for property {prop!r} at "
                f"{path} is not an object: {sub!r}")
        _shape_walk(sub, f"{path}/properties/{prop}")
    for pat, sub in (schema.get("patternProperties") or {}).items():
        if isinstance(sub, dict):
            _shape_walk(sub, f"{path}/patternProperties/{pat}")
    if isinstance(schema.get("additionalItems"), dict):
        _shape_walk(schema["additionalItems"], f"{path}/additionalItems")
    for key in ("allOf", "anyOf", "oneOf"):
        for i, sub in enumerate(schema.get(key) or []):
            _shape_walk(sub, f"{path}/{key}/{i}")
    items = schema.get("items")
    if isinstance(items, dict):
        _shape_walk(items, f"{path}/items")
    elif isinstance(items, list):  # tuple-form items (draft-07)
        for i, sub in enumerate(items):
            if isinstance(sub, dict):
                _shape_walk(sub, f"{path}/items/{i}")
    for i, sub in enumerate(schema.get("prefixItems") or []):
        if isinstance(sub, dict):
            _shape_walk(sub, f"{path}/prefixItems/{i}")
    if isinstance(schema.get("not"), dict):
        _shape_walk(schema["not"], f"{path}/not")
    if isinstance(schema.get("additionalProperties"), dict):
        _shape_walk(schema["additionalProperties"],
                    f"{path}/additionalProperties")
    for key in ("contains", "if", "then", "else", "propertyNames",
                "contentSchema"):
        if isinstance(schema.get(key), dict):
            _shape_walk(schema[key], f"{path}/{key}")
    for dep_kw in ("dependencies", "dependentSchemas"):
        for dep, sub in (schema.get(dep_kw) or {}).items():
            if isinstance(sub, dict):
                _shape_walk(sub, f"{path}/{dep_kw}/{dep}")
    for kw in ("unevaluatedProperties", "unevaluatedItems"):
        if isinstance(schema.get(kw), dict):
            _shape_walk(schema[kw], f"{path}/{kw}")
    for key in ("definitions", "$defs"):
        for name, sub in (schema.get(key) or {}).items():
            if isinstance(sub, dict):
                _shape_walk(sub, f"{path}/{key}/{name}")


# keyword routing for Spark-4 VariantType nodes (plans/variant.py):
# scalars compile against per-row JSON type tags; object/array keywords
# reuse the generic MapType/ArrayType machinery through typed views;
# composition re-enters the generic body on the variant column itself
_VARIANT_ARRAY_KWS = frozenset((
    "items", "additionalItems", "prefixItems", "maxItems", "minItems",
    "contains", "minContains", "maxContains", "unevaluatedItems"))
_VARIANT_OBJECT_KWS = frozenset((
    "required", "properties", "patternProperties", "additionalProperties",
    "minProperties", "maxProperties", "propertyNames", "dependentRequired",
    "dependencies", "dependentSchemas", "unevaluatedProperties"))
_VARIANT_PASSTHROUGH_KWS = frozenset((
    "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
    # user callable receives the variant Column itself
    "x-spark-check"))
# known keywords with no variant compile: surfaced in `unknown` (strict
# mode flags them), never a silent vacuous pass. uniqueItems needs value
# equality and Catalyst defines no ordering on VARIANT; content keywords
# and the relational x- declarations are typed-column operators.
_VARIANT_UNSUPPORTED_KWS = frozenset((
    "uniqueItems", "contentEncoding", "contentMediaType", "contentSchema",
    "x-unique", "x-ref", "x-ref-asof", "x-ref-interval", "x-drift",
    "x-dedup", "x-langid",
    "x-rate", "x-encoding", "x-decontaminate", "x-label-conflict", "x-repair", "x-outlier",
    "x-skew", "x-reconcile", "x-calendar", "x-freshness", "x-benford",
    "x-corr", "x-mask",
    "x-monotonic", "x-dup-ngram", "x-gopher", "x-c4", "x-leakage", "x-embedding",
    "x-fd", "x-gap", "x-gibberish", "x-lm-ppl", "x-readability",
    "x-quantile", "x-volume"))


def _compile_variant_node(schema: dict, ctx: _Ctx) -> None:
    """One schema node bound to a VariantType column.

    The value's own JSON type survives per row, so this path has exact
    Ajv type semantics (``type: "number"`` fires on the JSON string
    ``"10"``) — the fidelity the ``from_json``-to-map path coerces away.
    Null-vs-missing is exact too: a missing property is SQL NULL (value
    keywords vacuous, ``required`` fires), JSON ``null`` is a present
    VOID variant (``required`` satisfied, ``type`` fires).
    """
    for kw in schema:
        if kw not in _KNOWN_KEYWORDS:
            ctx.out.unknown.append((ctx.instance_path, kw))
        elif kw in _KEYWORD_SHAPE and not _KEYWORD_SHAPE[kw](schema[kw]):
            raise RulesetCompileError(
                f"JSON schema malformed: bad value for {kw!r} at "
                f"{ctx.instance_path or '/'}: {schema[kw]!r}")
        elif kw in _VARIANT_UNSUPPORTED_KWS:
            ctx.out.unknown.append((ctx.instance_path, f"{kw}:variant"))
    if "x-severity" in schema:
        ctx.severity = schema["x-severity"]

    # Stage this node's expensive views once (variant expressions are
    # CodegenFallback; without staging every keyword re-walks the binary —
    # the SimHash/text-profile inlining trap, plans/variant.py docstring).
    # Only at row-level contexts: inside HOF lambdas / probes stage is None.
    if ctx.stage is not None and ctx.col is not None and ctx.vstage is None:
        hint = ctx.instance_path or "root"
        vcol = ctx.stage(hint, ctx.col)
        t_st = ctx.stage(f"{hint}.tag", _vr.tag(vcol))
        s_st = ctx.stage(f"{hint}.str", _vr.as_string(vcol))
        d_st = ctx.stage(f"{hint}.dbl", _vr.as_double(vcol))
        act = F.when(t_st == "VOID", F.lit("null")).otherwise(s_st)
        ctx = _dc_replace(ctx, col=vcol,
                          vstage={"t": t_st, "s": s_st, "d": d_st,
                                  "actual": act})

    if "$ref" in schema and isinstance(schema["$ref"], str):
        sub = resolve_internal_ref(ctx.root_schema, schema["$ref"])
        _compile_keywords(sub, _dc_replace(ctx))
    _variant_scalar_checks(schema, ctx)
    arr = {k: v for k, v in schema.items() if k in _VARIANT_ARRAY_KWS}
    if arr:
        # array<variant> view: NULL for non-arrays, so array keywords are
        # vacuous there (JSON Schema semantics); element probes recurse
        # back through the variant entry
        arr_view = _vr.as_array(ctx.col)
        if ctx.stage is not None:
            arr_view = ctx.stage(f"{ctx.instance_path or 'root'}.arr",
                                 arr_view)
        _compile_keywords(arr, _dc_replace(
            ctx, col=arr_view, vstage=None,
            dtype=T.ArrayType(_vr.VariantType())))
    obj = {k: v for k, v in schema.items() if k in _VARIANT_OBJECT_KWS}
    if obj:
        # map<string,variant> view: keeps a JSON-null field as a PRESENT
        # entry, so map_contains_key == Ajv `required`; property values
        # are variants that recurse back through the variant entry
        obj_view = _vr.as_object(ctx.col)
        if ctx.stage is not None:
            obj_view = ctx.stage(f"{ctx.instance_path or 'root'}.obj",
                                 obj_view)
        _compile_keywords(obj, _dc_replace(
            ctx, col=obj_view, vstage=None,
            dtype=T.MapType(T.StringType(), _vr.VariantType())))
    comp = {k: v for k, v in schema.items() if k in _VARIANT_PASSTHROUGH_KWS}
    if comp:
        # composition probes need the variant column itself; the flag
        # suppresses re-entry for THIS node only — probe recursion into
        # sub-schemas comes back through the variant entry as usual
        _compile_keywords(comp, _dc_replace(ctx), _variant_entry_done=True)


def _variant_scalar_checks(schema: dict, ctx: _Ctx) -> None:
    """Scalar keywords on a variant node — every check is a pure-JVM
    Catalyst expression over the variant binary; messages byte-match the
    typed-column compilers so report fidelity is path-independent."""
    col = ctx.col
    vs = ctx.vstage or {}
    vt, vss, vd = vs.get("t"), vs.get("s"), vs.get("d")
    if "type" in schema:
        _type_check(ctx, schema["type"])

    if "enum" in schema:
        allowed = schema["enum"]
        eqs = [_vr.value_eq(col, v, t=vt, s=vss, d=vd) for v in allowed]
        if any(e is None for e in eqs):
            # object/array enum members: JSON equality is key-order
            # insensitive, a serialized compare would not be — surface
            ctx.out.unknown.append(
                (ctx.instance_path, "enum:variant-composite-literal"))
        else:
            ok = eqs[0]
            for e in eqs[1:]:
                ok = ok | e
            msg = _reason("must be equal to one of the allowed values",
                          ctx, "enum", expected=allowed)
            _add(ctx, "enum", _present(ctx) & ~ok, msg, expected=allowed)

    if "const" in schema:
        v = schema["const"]
        eq = _vr.value_eq(col, v, t=vt, s=vss, d=vd)
        if eq is None:
            ctx.out.unknown.append(
                (ctx.instance_path, "const:variant-composite-literal"))
        else:
            msg = _reason("must be equal to constant", ctx, "const",
                          expected=[v])
            _add(ctx, "const", _present(ctx) & ~eq, msg, expected=[v])

    # string keywords: Ajv applies them to string instances only — the
    # per-row STRING tag is the guard (a number is vacuously valid); the
    # unguarded string VIEW would coerce numbers ("10" vs 10)
    s = vss if vss is not None else _vr.as_string(col)
    is_str = _vr.is_string(col, vt)
    if "maxLength" in schema:
        n = schema["maxLength"]
        msg = _reason(f"must NOT have more than {n} characters", ctx,
                      "maxLength")
        _add(ctx, "maxLength",
             _present(ctx) & is_str & (F.length(s) > n), msg)
    if "minLength" in schema:
        n = schema["minLength"]
        msg = _reason(f"must NOT have fewer than {n} characters", ctx,
                      "minLength")
        _add(ctx, "minLength",
             _present(ctx) & is_str & (F.length(s) < n), msg)
    if "pattern" in schema:
        p = schema["pattern"]
        msg = _reason(f'must match pattern "{p}"', ctx, "pattern")
        _add(ctx, "pattern", _present(ctx) & is_str & ~s.rlike(p), msg)
    if "format" in schema:
        f = schema["format"]
        msg = _reason(f'must match format "{f}"', ctx, "format")
        if f in FORMAT_REGEX:
            _add(ctx, "format",
                 _present(ctx) & is_str & ~s.rlike(FORMAT_REGEX[f]), msg)
        elif f in FORMAT_ALWAYS_OK:
            ctx.out.static_passes.append((ctx.instance_path, f"format:{f}"))
        else:
            # numeric-range / finite / UDF formats stay typed-column-only
            ctx.out.unknown.append(
                (ctx.instance_path, f"format:{f}:variant"))

    # numeric keywords: guarded by the numeric tag (Ajv: non-numbers are
    # vacuously valid; the double view alone would coerce "10" and true)
    d = vd if vd is not None else _vr.as_double(col)
    is_num = _vr.is_numeric(col, vt)
    for kw, op, txt in (
        ("minimum", lambda c, n: c < n, "must be >= {}"),
        ("maximum", lambda c, n: c > n, "must be <= {}"),
        ("exclusiveMinimum", lambda c, n: c <= n, "must be > {}"),
        ("exclusiveMaximum", lambda c, n: c >= n, "must be < {}"),
    ):
        if kw in schema:
            n = schema[kw]
            msg = _reason(txt.format(n), ctx, kw)
            _add(ctx, kw, _present(ctx) & is_num & op(d, F.lit(n)), msg)
    if "multipleOf" in schema:
        k = schema["multipleOf"]
        msg = _reason(f"must be multiple of {k}", ctx, "multipleOf")
        _add(ctx, "multipleOf",
             _present(ctx) & is_num & (F.pmod(d, F.lit(k)) != 0), msg)


def _compile_keywords(schema: dict, ctx: _Ctx, *,
                      _variant_entry_done: bool = False) -> None:
    """Compile every keyword of one schema node (no short-circuit)."""
    if (not _variant_entry_done and ctx.col is not None
            and _vr.is_variant(ctx.dtype)):
        # Spark-4 VariantType node: scalar keywords compile against
        # per-row JSON type tags; object/array keywords reuse this very
        # body through map<string,variant> / array<variant> views
        # (plans/variant.py module docstring)
        _compile_variant_node(schema, ctx)
        return
    for kw in schema:
        if kw not in _KNOWN_KEYWORDS:
            ctx.out.unknown.append((ctx.instance_path, kw))
        elif kw in _KEYWORD_SHAPE and not _KEYWORD_SHAPE[kw](schema[kw]):
            raise RulesetCompileError(
                f"JSON schema malformed: bad value for {kw!r} at "
                f"{ctx.instance_path or '/'}: {schema[kw]!r}")

    if "x-severity" in schema:
        # severity annotation: applies to every check compiled at this
        # node and below (engine extension; the reference's messages are
        # uniformly warnings — remark-lint message() semantics)
        ctx.severity = schema["x-severity"]

    if "$ref" in schema and isinstance(schema["$ref"], str):
        sub = resolve_internal_ref(ctx.root_schema, schema["$ref"])
        # shallow ctx copy: keywords inside the $ref'd subtree (notably
        # x-severity) must not leak into the referring node's remaining
        # keywords via the shared mutable ctx
        _compile_keywords(sub, _dc_replace(ctx))

    if "type" in schema:
        _type_check(ctx, schema["type"])

    if "enum" in schema and ctx.col is not None:
        allowed = schema["enum"]
        msg = _reason("must be equal to one of the allowed values",
                      ctx, "enum", expected=allowed)
        _add(ctx, "enum", _present(ctx) & ~ctx.col.isin(*allowed), msg,
             expected=allowed)

    if "const" in schema and ctx.col is not None:
        v = schema["const"]
        msg = _reason("must be equal to constant", ctx, "const", expected=[v])
        _add(ctx, "const", _present(ctx) & (ctx.col != F.lit(v)), msg,
             expected=[v])

    if "maxLength" in schema and ctx.col is not None:
        n = schema["maxLength"]
        msg = _reason(f"must NOT have more than {n} characters", ctx, "maxLength")
        _add(ctx, "maxLength", _present(ctx) & (F.length(ctx.col) > n), msg)

    if "minLength" in schema and ctx.col is not None:
        n = schema["minLength"]
        msg = _reason(f"must NOT have fewer than {n} characters", ctx, "minLength")
        _add(ctx, "minLength", _present(ctx) & (F.length(ctx.col) < n), msg)

    if "pattern" in schema and ctx.col is not None:
        p = schema["pattern"]
        msg = _reason(f'must match pattern "{p}"', ctx, "pattern")
        # Ajv `pattern` is an unanchored search; rlike has identical semantics
        _add(ctx, "pattern", _present(ctx) & ~ctx.col.rlike(p), msg)

    if "format" in schema and ctx.col is not None:
        f = schema["format"]
        msg = _reason(f'must match format "{f}"', ctx, "format")
        if f in FORMAT_REGEX:
            _add(ctx, "format", _present(ctx) & ~ctx.col.rlike(FORMAT_REGEX[f]), msg)
        elif f in FORMAT_NUMERIC_RANGE and isinstance(ctx.dtype, _NUMERIC):
            # ajv-formats type:"number" formats — integral + in-range
            lo, hi = FORMAT_NUMERIC_RANGE[f]
            bad = (ctx.col < F.lit(lo)) | (ctx.col > F.lit(hi))
            if not isinstance(ctx.dtype, _INTEGRAL):
                bad = bad | (ctx.col != F.floor(ctx.col))
            _add(ctx, "format", _present(ctx) & bad, msg)
        elif f in FORMAT_ALWAYS_OK:
            # ajv-formats registers these as unconditionally valid
            ctx.out.static_passes.append((ctx.instance_path, f"format:{f}"))
        elif f in FORMAT_FINITE:
            if isinstance(ctx.dtype, (T.FloatType, T.DoubleType)):
                bad = F.isnan(ctx.col) | (F.abs(ctx.col) == float("inf"))
                _add(ctx, "format", _present(ctx) & bad, msg)
            elif isinstance(ctx.dtype, _NUMERIC):
                # integral/decimal values are always finite
                ctx.out.static_passes.append(
                    (ctx.instance_path, f"format:{f}"))
            else:
                ctx.out.unknown.append((ctx.instance_path, f"format:{f}"))
        elif f in FORMAT_UDF_CHECKERS:
            # vectorized Python probe (e.g. `regex` = re.compile validity):
            # an Arrow-batched pandas UDF in an otherwise pure-JVM
            # projection — opt-in via the udf_formats engine option
            if ctx.out.options.get("udf_formats"):
                ok = FORMAT_UDF_CHECKERS[f](ctx.col)
                _add(ctx, "format",
                     _present(ctx) & ~F.coalesce(ok, F.lit(False)), msg)
            else:
                ctx.out.unknown.append(
                    (ctx.instance_path, f"format:{f}:requires-udf_formats"))
        else:
            ctx.out.unknown.append((ctx.instance_path, f"format:{f}"))

    # draft-07 content keywords — ASSERTED, a documented deviation from
    # Ajv's annotate-only default (functions/content.py module docstring);
    # unverifiable encodings/types fall to `unknown`, never vacuous-pass
    if "contentEncoding" in schema and ctx.col is not None:
        enc = schema["contentEncoding"]
        if (isinstance(ctx.dtype, T.StringType)
                and enc in _content.SUPPORTED_ENCODINGS):
            msg = _reason(f'must be {enc} encoded', ctx, "contentEncoding")
            _add(ctx, "contentEncoding",
                 _present(ctx) & ~_content.base64_ok(ctx.col), msg)
        else:
            ctx.out.unknown.append(
                (ctx.instance_path, f"contentEncoding:{enc}"))

    if "contentMediaType" in schema and ctx.col is not None:
        mt = schema["contentMediaType"]
        enc = schema.get("contentEncoding")
        msg = _reason(f'must be media type "{mt}"', ctx,
                      "contentMediaType")
        ok = None
        if isinstance(ctx.dtype, T.BinaryType):
            # binary instance: sniff the payload's own magic bytes
            ok = _content.magic_ok(ctx.col, mt)
        elif isinstance(ctx.dtype, T.StringType) and enc == "base64":
            if mt == "application/json":
                # full decode is unavoidable for JSON; the CASE guard
                # keeps unbase64 off malformed payloads
                ok = F.when(
                    _content.base64_ok(ctx.col),
                    _content.json_ok(F.unbase64(ctx.col).cast("string")))
            else:
                ok = _content.magic_ok(_content.b64_probe(ctx.col), mt)
        elif isinstance(ctx.dtype, T.StringType) and enc is None \
                and mt == "application/json":
            ok = _content.json_ok(ctx.col)
        if ok is not None:
            _add(ctx, "contentMediaType",
                 _present(ctx) & ~F.coalesce(ok, F.lit(False)), msg)
        else:
            ctx.out.unknown.append(
                (ctx.instance_path, f"contentMediaType:{mt}"))

    if "contentSchema" in schema and ctx.col is not None:
        # 2019-09 contentSchema: validate the EMBEDDED document against a
        # schema. Spark-4 composition: try_parse_json -> VariantType ->
        # the whole variant keyword machinery (exact JSON types, staged
        # views) applies to the parsed content. Unparsable content stays
        # vacuous here — contentMediaType is the wellformedness check, so
        # the two keywords layer exactly like Ajv's annotations would.
        sub = schema["contentSchema"]
        mt = schema.get("contentMediaType")
        enc = schema.get("contentEncoding")
        if (isinstance(sub, dict) and mt == "application/json"
                and isinstance(ctx.dtype, T.StringType)
                and _vr.HAVE_VARIANT):
            raw = (F.unbase64(ctx.col).cast("string") if enc == "base64"
                   else ctx.col)
            sub_ctx = _dc_replace(
                ctx, col=F.try_parse_json(raw), dtype=_vr.VariantType(),
                schema_path=f"{ctx.schema_path}/contentSchema",
                vstage=None)
            _compile_keywords(sub, sub_ctx)
        else:
            ctx.out.unknown.append((ctx.instance_path, "contentSchema"))

    for kw, op, txt in (
        ("minimum", lambda c, n: c < n, "must be >= {}"),
        ("maximum", lambda c, n: c > n, "must be <= {}"),
        ("exclusiveMinimum", lambda c, n: c <= n, "must be > {}"),
        ("exclusiveMaximum", lambda c, n: c >= n, "must be < {}"),
    ):
        if kw in schema and ctx.col is not None:
            n = schema[kw]
            num = (ctx.col.try_cast("double")
                   if isinstance(ctx.dtype, T.StringType) else ctx.col)
            msg = _reason(txt.format(n), ctx, kw)
            _add(ctx, kw, _present(ctx) & op(num, F.lit(n)), msg)

    if "multipleOf" in schema and ctx.col is not None:
        k = schema["multipleOf"]
        num = (ctx.col.try_cast("double")
               if isinstance(ctx.dtype, T.StringType) else ctx.col)
        msg = _reason(f"must be multiple of {k}", ctx, "multipleOf")
        _add(ctx, "multipleOf", _present(ctx) & (F.pmod(num, F.lit(k)) != 0), msg)

    if schema.get("x-finite") is True:
        if ctx.col is not None and isinstance(ctx.dtype,
                                              (T.FloatType, T.DoubleType)):
            # NaN/±Inf slip through minimum alone (NaN sorts above every
            # double so `>= min` holds); JSON has no non-finite numbers,
            # so the reference's Ajv never faces them — table columns do
            msg = _reason("must be finite", ctx, "x-finite")
            _add(ctx, "x-finite",
                 _present(ctx) & (F.isnan(ctx.col)
                                  | (F.abs(ctx.col)
                                     == F.lit(float("inf")))),
                 msg)
        elif not ctx.silent:
            # non-float columns cannot hold NaN/Inf — surface the no-op
            # declaration instead of a silent vacuous pass
            ctx.out.unknown.append((ctx.instance_path, "x-finite"))

    for kw, op, txt in (
        ("maxItems", lambda c, n: F.size(c) > n, "must NOT have more than {} items"),
        ("minItems", lambda c, n: F.size(c) < n, "must NOT have fewer than {} items"),
    ):
        if kw in schema and ctx.col is not None and isinstance(ctx.dtype, T.ArrayType):
            n = schema[kw]
            msg = _reason(txt.format(n), ctx, kw)
            _add(ctx, kw, _present(ctx) & op(ctx.col, F.lit(n)), msg)

    if "required" in schema:
        for prop in schema["required"]:
            child_col, child_t, exists = _child(ctx, prop)
            msg = _reason(f"must have required property '{prop}'", ctx, "required")
            if not exists:
                # property absent from the schema entirely: statically
                # violated — but only when the enclosing object EXISTS
                # (Ajv skips the whole subschema on an absent object; an
                # unguarded lit(True) fired on NULL parents too)
                ctx.out.static_failures.append(
                    (ctx.instance_path, "required", f"no column for {prop!r}"))
                violated = F.lit(True) if ctx.col is None \
                    else ctx.col.isNotNull()
            elif isinstance(ctx.dtype, T.MapType):
                violated = ~F.map_contains_key(ctx.col, prop)
                if ctx.col is not None:
                    violated = ctx.col.isNotNull() & violated
            else:
                violated = child_col.isNull()
                if ctx.col is not None:
                    # nested object: required fires only when the object exists
                    violated = ctx.col.isNotNull() & violated
            # Ajv reports required at the *object's* path with param
            # missingProperty (index.ts:175-177)
            _add(ctx, "required", violated, msg,
                 actual=F.lit(None).cast("string"))

    if "properties" in schema:
        for prop, sub in schema["properties"].items():
            child_col, child_t, exists = _child(ctx, prop)
            if not exists:
                # property constrained but column missing: value keywords are
                # vacuous on an absent property (Ajv semantics) — skip. But
                # unknown keywords must still surface (a typo'd keyword is a
                # schema bug whether or not the column exists today; Ajv
                # strict flags it at compile time, data-independent)
                for kw in sub if isinstance(sub, dict) else ():
                    if kw not in _KNOWN_KEYWORDS:
                        ctx.out.unknown.append(
                            (f"{ctx.instance_path}/{prop}", kw))
                ctx.out.static_passes.append(
                    (f"{ctx.instance_path}/{prop}", "absent-column"))
                continue
            sub_ctx = _Ctx(
                col=child_col, dtype=child_t,
                instance_path=f"{ctx.instance_path}/{prop}",
                schema_path=f"{ctx.schema_path}/properties/{prop}",
                schema_file=_sub_file(ctx, sub),
                df_schema=ctx.df_schema, root_schema=ctx.root_schema,
                out=ctx.out, extra_checks=ctx.extra_checks, silent=ctx.silent,
                severity=ctx.severity, stage=ctx.stage,
            )
            _compile_keywords(sub, sub_ctx)

    if "patternProperties" in schema:
        _pattern_properties(ctx, schema["patternProperties"])

    if "prefixItems" in schema and ctx.col is not None \
            and isinstance(ctx.dtype, T.ArrayType):
        # 2020-12 positional form: `items` (dict) is the TAIL schema when
        # prefixItems is present (same role additionalItems plays in
        # draft-07); compiled through the shared tuple path
        tail = schema["items"] if isinstance(schema.get("items"), dict) \
            else schema.get("additionalItems")
        _tuple_items_check(ctx, schema["prefixItems"], tail,
                           kw="prefixItems")
    elif "items" in schema and ctx.col is not None \
            and isinstance(ctx.dtype, T.ArrayType):
        if isinstance(schema["items"], dict):
            _items_check(ctx, schema["items"])
        elif isinstance(schema["items"], list):
            _tuple_items_check(ctx, schema["items"],
                               schema.get("additionalItems"))

    if schema.get("additionalProperties") is False \
            or isinstance(schema.get("additionalProperties"), dict):
        _additional_properties(ctx, schema)

    if "unevaluatedProperties" in schema:
        _unevaluated_properties(ctx, schema)

    if "unevaluatedItems" in schema:
        _unevaluated_items(ctx, schema)

    if "allOf" in schema:
        for i, sub in enumerate(schema["allOf"]):
            sub_ctx = _Ctx(
                col=ctx.col, dtype=ctx.dtype,
                instance_path=ctx.instance_path,
                schema_path=f"{ctx.schema_path}/allOf/{i}",
                schema_file=_sub_file(ctx, sub),
                df_schema=ctx.df_schema, root_schema=ctx.root_schema,
                out=ctx.out, extra_checks=ctx.extra_checks, silent=ctx.silent,
                severity=ctx.severity, stage=ctx.stage, vstage=ctx.vstage,
            )
            _compile_keywords(sub, sub_ctx)

    # Composition keywords at a property node are guarded by presence:
    # Ajv skips all value keywords on an absent property (only the parent's
    # `required` fires), and an absent value makes every child schema
    # vacuously valid — without the guard, oneOf (n_ok == len(children) != 1)
    # and not would fire on NULLs.
    def _guard(violated: Column) -> Column:
        return violated if ctx.col is None else _present(ctx) & violated

    if "anyOf" in schema:
        vals = [_validity(sub, ctx, f"{ctx.schema_path}/anyOf/{i}")
                for i, sub in enumerate(schema["anyOf"])]
        any_ok = vals[0]
        for v in vals[1:]:
            any_ok = any_ok | v
        msg = _reason("must match a schema in anyOf", ctx, "anyOf")
        _add(ctx, "anyOf", _guard(~any_ok), msg)

    if "oneOf" in schema:
        vals = [_validity(sub, ctx, f"{ctx.schema_path}/oneOf/{i}")
                for i, sub in enumerate(schema["oneOf"])]
        n_ok = balanced_reduce(lambda a, b: a + b,
                               [v.cast("int") for v in vals])
        msg = _reason("must match exactly one schema in oneOf", ctx, "oneOf")
        _add(ctx, "oneOf", _guard(n_ok != 1), msg)

    if "not" in schema:
        ok = _validity(schema["not"], ctx, f"{ctx.schema_path}/not")
        msg = _reason("must NOT be valid", ctx, "not")
        _add(ctx, "not", _guard(ok), msg)

    if schema.get("uniqueItems") is True and ctx.col is not None \
            and isinstance(ctx.dtype, T.ArrayType):
        msg = _reason("must NOT have duplicate items", ctx, "uniqueItems")
        _add(ctx, "uniqueItems",
             _present(ctx) & (F.size(F.array_distinct(ctx.col))
                              < F.size(ctx.col)), msg)

    if "contains" in schema and ctx.col is not None \
            and isinstance(ctx.dtype, T.ArrayType):
        elem_ok = _element_validity_fn(ctx, schema["contains"],
                                       f"{ctx.schema_path}/contains")
        n_match = F.size(F.filter(ctx.col, elem_ok))
        lo = schema.get("minContains", 1)
        if lo > 0:
            msg = _reason(f"must contain at least {lo} valid item(s)",
                          ctx, "contains")
            _add(ctx, "contains", _present(ctx) & (n_match < lo), msg)
        if "maxContains" in schema:
            hi = schema["maxContains"]
            msg = _reason(f"must contain at most {hi} valid item(s)",
                          ctx, "maxContains")
            _add(ctx, "maxContains", _present(ctx) & (n_match > hi), msg)

    for kw, cmp_fn, txt in (
        ("minProperties", lambda n, k: n < k,
         "must NOT have fewer than {} properties"),
        ("maxProperties", lambda n, k: n > k,
         "must NOT have more than {} properties"),
    ):
        if kw in schema:
            k = schema[kw]
            n_props = _property_count(ctx)
            if n_props is None:
                continue
            msg = _reason(txt.format(k), ctx, kw)
            violated = cmp_fn(n_props, F.lit(k))
            if ctx.col is not None:
                violated = _present(ctx) & violated
            _add(ctx, kw, violated, msg)

    # dependentRequired/dependentSchemas (2019-09) + draft-07 `dependencies`
    for dep_kw in ("dependentRequired", "dependencies", "dependentSchemas"):
        for trigger, reqs in (schema.get(dep_kw) or {}).items():
            t_col, _t, t_exists = _child(ctx, trigger)
            if not t_exists:
                ctx.out.static_passes.append(
                    (f"{ctx.instance_path}/{trigger}", dep_kw))
                continue
            t_present = (F.map_contains_key(ctx.col, trigger)
                         if isinstance(ctx.dtype, T.MapType)
                         else t_col.isNotNull())
            if isinstance(reqs, dict):  # dependencies schema form
                dep_ok = _validity(reqs, ctx,
                                   f"{ctx.schema_path}/{dep_kw}/{trigger}")
                msg = _reason(f'must match "{trigger}" dependency schema',
                              ctx, dep_kw)
                _add(ctx, dep_kw, t_present & ~dep_ok, msg)
                continue
            for req in reqs:
                r_col, _rt, r_exists = _child(ctx, req)
                msg = _reason(
                    f"must have property {req} when property {trigger} "
                    f"is present", ctx, dep_kw)
                if not r_exists:
                    violated = t_present
                elif isinstance(ctx.dtype, T.MapType):
                    violated = t_present & ~F.map_contains_key(ctx.col, req)
                else:
                    violated = t_present & r_col.isNull()
                _add(ctx, dep_kw, violated, msg,
                     actual=F.lit(None).cast("string"))

    if "if" in schema:
        cond_ok = _validity(schema["if"], ctx, f"{ctx.schema_path}/if")
        if "then" in schema:
            then_ok = _validity(schema["then"], ctx,
                                f"{ctx.schema_path}/then")
            msg = _reason('must match "then" schema', ctx, "if")
            _add(ctx, "if", _guard(cond_ok & ~then_ok), msg)
        if "else" in schema:
            else_ok = _validity(schema["else"], ctx,
                                f"{ctx.schema_path}/else")
            msg = _reason('must match "else" schema', ctx, "if")
            _add(ctx, "if", _guard(~cond_ok & ~else_ok), msg)

    if "propertyNames" in schema:
        _property_names(ctx, schema["propertyNames"])

    # table-level declarations: only meaningful on top-level columns
    # (instance_path "/col") — aggregates/joins have no analog for nested
    # struct fields, so deeper uses surface as unknown keywords
    is_top = ctx.instance_path.count("/") == 1 and ctx.col is not None
    if schema.get("x-unique") is True and not ctx.silent:
        if is_top:
            ctx.out.table_checks.append(
                ("unique", ctx.instance_path[1:],
                 {"severity": ctx.severity}))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-unique"))

    if isinstance(schema.get("x-unique"), list) and not ctx.silent:
        # composite-key form: only meaningful at the ROOT (the key is a
        # tuple of top-level columns, it belongs to no single property);
        # columns missing from the bound schema fall to unknown so a
        # typo'd key never silently passes
        cols = schema["x-unique"]
        if ctx.instance_path == "" and all(
                c in ctx.df_schema.fieldNames() for c in cols):
            ctx.out.table_checks.append(
                ("unique_multi", "", {"keys": list(cols),
                                      "severity": ctx.severity}))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-unique"))

    if "x-ref" in schema and not ctx.silent:
        if is_top:
            p = schema["x-ref"]
            ctx.out.table_checks.append(
                ("ref", ctx.instance_path[1:],
                 {"dim": p["dim"], "key": p["key"],
                  "bloom": bool(p.get("bloom", False)),
                  # optional dim row-count: sizes the Bloom bitmap without
                  # an extra dim scan (referential.build_bloom)
                  "n_items": p.get("n_items"),
                  "severity": ctx.severity}))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-ref"))

    if "x-ref-asof" in schema and not ctx.silent:
        # TEMPORAL referential (operators/asof.py asof_ref_violations):
        # a dim row with this key must be IN FORCE at the fact row's
        # timestamp — relational pass like x-ref, top-level columns only
        if is_top:
            p = schema["x-ref-asof"]
            ctx.out.table_checks.append(
                ("ref_asof", ctx.instance_path[1:], {
                    "dim": p["dim"], "key": p["key"], "ts": p["ts"],
                    "dim_ts": p["dim_ts"],
                    "tolerance": p.get("tolerance"),
                    "direction": p.get("direction", "backward"),
                    "bucket": p.get("bucket"),
                    "severity": ctx.severity}))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-ref-asof"))

    if "x-ref-interval" in schema and not ctx.silent:
        # INTERVAL referential (operators/intervals.py
        # interval_ref_violations): the row's timestamp must fall inside
        # a dim interval of its key — relational pass, top-level only
        if is_top:
            p = schema["x-ref-interval"]
            ctx.out.table_checks.append(
                ("ref_interval", ctx.instance_path[1:], {
                    "dim": p["dim"], "key": p["key"], "ts": p["ts"],
                    "start": p["start"], "end": p["end"],
                    "bucket": float(p["bucket"]),
                    "severity": ctx.severity}))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-ref-interval"))

    if "x-outlier" in schema and not ctx.silent:
        # robust distributional outlier (median/MAD modified z-score,
        # operators/outliers.py) — a relational pass like x-drift, so
        # top-level NUMERIC columns only: a non-numeric column would
        # cast-to-double to all-NULL and vacuously pass, so it falls to
        # unknown instead (strict mode flags it)
        if is_top and isinstance(ctx.dtype, _NUMERIC):
            p = schema["x-outlier"]
            ctx.out.table_checks.append(
                ("outlier", ctx.instance_path[1:], {
                    # id defaults to the caller's row_id at run time;
                    # explicit-null k (YAML `k:`) takes the default too
                    "id": p.get("id"),
                    "k": float(p["k"]) if p.get("k") is not None else 3.5,
                    "by": p.get("by"),
                    "approx": bool(p.get("approx", False)),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-outlier"))

    if "x-skew" in schema and not ctx.silent:
        # key-distribution skew lint (operators/skew.py skew_violations):
        # fires when the hottest value of this column holds more than
        # max_share of all rows — the declarative "salt before you
        # shuffle on this" warning. A relational pass over the whole
        # column like x-unique, so top-level columns only (skew of a
        # nested field isn't a shuffle key)
        if is_top:
            p = schema["x-skew"]
            ctx.out.table_checks.append(
                ("skew", ctx.instance_path[1:], {
                    "max_share": float(p["max_share"]),
                    "top_k": int(p.get("top_k", 10)),
                    # per-segment form ("skew per tenant"): a violation
                    # row per group whose hottest key crosses max_share
                    "by": p.get("by"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-skew"))

    if "x-reconcile" in schema and not ctx.silent:
        # aggregate reconciliation (operators/reconcile.py): this
        # column's stored per-key value must equal the aggregate
        # recomputed from the fact table named in `fact` (resolved from
        # the dims mapping, x-ref's plumbing). Numeric top-level columns
        # only — a non-numeric stored aggregate casts to all-NULL and
        # would vacuously mismatch, so it falls to unknown instead
        if is_top and isinstance(ctx.dtype, _NUMERIC):
            p = schema["x-reconcile"]
            ctx.out.table_checks.append(
                ("reconcile", ctx.instance_path[1:], {
                    "fact": p["fact"],
                    "key": p["key"],
                    "fact_key": p.get("fact_key"),
                    "fact_value": p["fact_value"],
                    "agg": p.get("agg", "sum"),
                    "tolerance": float(p.get("tolerance", 0.0)),
                    "on_missing": p.get("on_missing", "violate"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-reconcile"))

    if "x-monotonic" in schema and not ctx.silent:
        # adjacent-pair ordering constraint (operators/sequence.py): the
        # column must be monotone over an order key, optionally per group
        # — a relational (window) pass like x-drift, so top-level only;
        # JSON Schema has no row-relating keyword (the reference validates
        # one document at a time, index.ts:201-320)
        if is_top:
            p = schema["x-monotonic"]
            ctx.out.table_checks.append(
                ("monotonic", ctx.instance_path[1:], {
                    "order_by": p["order_by"],
                    "by": p.get("by"),
                    "direction": p.get("direction") or "non-decreasing",
                    "n_buckets": int(p.get("n_buckets") or 64),
                    "id": p.get("id"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-monotonic"))

    if "x-volume" in schema and not ctx.silent:
        # ingest-volume anomaly gate (operators/outliers.py
        # volume_violations): time buckets with outlier row counts —
        # x-calendar's thin/flooded companion; top-level only
        if is_top:
            p = schema["x-volume"]
            ctx.out.table_checks.append(
                ("volume", ctx.instance_path[1:], {
                    "unit": p.get("unit", "day"),
                    # `or`, not a default-arg get: an explicit `k: null`
                    # passes the shape validator and must fall back, not
                    # crash float(None) (k=0 is rejected at validation)
                    "k": float(p.get("k") or 3.5),
                    "by": p.get("by"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-volume"))

    if "x-quantile" in schema and not ctx.silent:
        # order-statistics band gate (operators/stats.py
        # quantile_violations) — one-aggregate relational pass like
        # x-benford; numeric top-level columns only
        p = schema["x-quantile"]
        if (is_top and isinstance(ctx.dtype, _NUMERIC)
                and (p.get("by") is None
                     or p["by"] in ctx.df_schema.fieldNames())):
            ctx.out.table_checks.append(
                ("quantile", ctx.instance_path[1:], {
                    "q": float(p["q"]),
                    "lo": (None if p.get("lo") is None
                           else float(p["lo"])),
                    "hi": (None if p.get("hi") is None
                           else float(p["hi"])),
                    "by": p.get("by"),
                    "approx": bool(p.get("approx", False)),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-quantile"))

    if "x-readability" in schema and not ctx.silent:
        # Flesch reading-ease band gate (operators/text.py
        # readability_violations) — map-only per-row pass like x-gopher;
        # string top-level columns only
        if is_top and isinstance(ctx.dtype, T.StringType):
            p = schema["x-readability"]
            ctx.out.table_checks.append(
                ("readability", ctx.instance_path[1:], {
                    "id": p["id"],
                    "lo": float(p.get("lo", 0.0)),
                    "hi": float(p.get("hi", 121.0)),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-readability"))

    if "x-gibberish" in schema and not ctx.silent:
        # corpus-relative language-plausibility gate (operators/text.py
        # gibberish_violations) — needs the whole corpus's bigram
        # distribution, so a relational pass; top-level only
        if is_top:
            p = schema["x-gibberish"]
            ctx.out.table_checks.append(
                ("gibberish", ctx.instance_path[1:], {
                    "id": p["id"],
                    "min_logp": float(p["min_logp"]),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-gibberish"))

    if "x-lm-ppl" in schema and not ctx.silent:
        # corpus-relative n-gram LM perplexity gate (operators/lm.py
        # lm_ppl_violations, the CCNet recipe) — trains on the whole
        # corpus, so a relational pass; top-level only
        if is_top:
            p = schema["x-lm-ppl"]
            ctx.out.table_checks.append(
                ("lm_ppl", ctx.instance_path[1:], {
                    "id": p["id"],
                    "max_ppl": float(p["max_ppl"]),
                    "n": int(p.get("n") or 2),
                    "k": float(p.get("k") or 0.5),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-lm-ppl"))

    if "x-mask" in schema and not ctx.silent:
        # shape-conformance gate (operators/stats.py mask_violations):
        # the column's dominant value mask must cover min_share of rows
        # — relational aggregate pass, top-level columns only
        if is_top:
            p = schema["x-mask"]
            ctx.out.table_checks.append(
                ("mask", ctx.instance_path[1:], {
                    "expect": p["expect"],
                    "min_share": float(p.get("min_share", 0.99)),
                    "by": p.get("by"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-mask"))

    if "x-corr" in schema and not ctx.silent:
        # derived-column expectation (operators/stats.py
        # correlation_violations): |corr(this, with)| >= min_abs —
        # relational aggregate pass, numeric top-level columns only;
        # the partner column must exist in the bound schema
        p = schema["x-corr"]
        if (is_top and isinstance(ctx.dtype, _NUMERIC)
                and p["with"] in ctx.df_schema.fieldNames()):
            ctx.out.table_checks.append(
                ("corr", ctx.instance_path[1:], {
                    "with": p["with"],
                    "min_abs": float(p["min_abs"]),
                    "by": p.get("by"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-corr"))

    if "x-benford" in schema and not ctx.silent:
        # Benford first-digit conformance gate (operators/drift.py
        # benford_violations, MAD-thresholded) — a relational pass like
        # x-outlier, numeric top-level columns only
        if is_top and isinstance(ctx.dtype, _NUMERIC):
            p = schema["x-benford"]
            ctx.out.table_checks.append(
                ("benford", ctx.instance_path[1:], {
                    "max_mad": float(p.get("max_mad", 0.015)),
                    # per-segment form ("Benford per region"): one
                    # violation row per non-conforming group
                    "by": p.get("by"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-benford"))

    if "x-calendar" in schema and not ctx.silent:
        # calendar completeness (operators/sequence.py
        # calendar_violations): every time bucket between the observed
        # min and max must contain rows — relational pass, top-level only
        if is_top:
            p = schema["x-calendar"]
            ctx.out.table_checks.append(
                ("calendar", ctx.instance_path[1:], {
                    "unit": p.get("unit", "day"),
                    "by": p.get("by"),
                    "max_buckets": int(p.get("max_buckets") or 100_000),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-calendar"))

    if "x-freshness" in schema and not ctx.silent:
        # freshness (operators/sequence.py freshness_violations): the
        # newest row (per group) must be younger than max_age_seconds at
        # as_of (run time when omitted) — relational pass, top-level only
        if is_top:
            p = schema["x-freshness"]
            ctx.out.table_checks.append(
                ("freshness", ctx.instance_path[1:], {
                    "max_age_seconds": float(p["max_age_seconds"]),
                    "as_of": p.get("as_of"),
                    "by": p.get("by"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-freshness"))

    if "x-gap" in schema and not ctx.silent:
        # continuity check (operators/sequence.py gap_violations): the
        # monotonic machinery ordered by the column itself — relational
        # window pass, top-level columns only
        if is_top:
            p = schema["x-gap"]
            ctx.out.table_checks.append(
                ("gap", ctx.instance_path[1:], {
                    "max_seconds": float(p["max_seconds"]),
                    "by": p.get("by"),
                    "n_buckets": int(p.get("n_buckets") or 64),
                    "id": p.get("id"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-gap"))

    if "x-fd" in schema and not ctx.silent:
        # functional dependency (operators/fd.py): the column must take a
        # single value per determinant group — a relational (two-scan
        # groupBy+join) pass like x-unique, so top-level columns only
        if is_top:
            p = schema["x-fd"]
            ctx.out.table_checks.append(
                ("fd", ctx.instance_path[1:], {
                    "determined_by": list(p["determined_by"]),
                    "id": p.get("id"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-fd"))

    if "x-drift" in schema and not ctx.silent:
        if is_top:
            p = schema["x-drift"]
            ctx.out.table_checks.append(
                ("drift", ctx.instance_path[1:], {
                    "partition_col": p["partition_col"],
                    "side_a": p["side_a"], "side_b": p["side_b"],
                    "lo": float(p["lo"]), "hi": float(p["hi"]),
                    "n_buckets": int(p.get("n_buckets", 25)),
                    "ks_threshold": float(p.get("ks_threshold", 0.1)),
                    "psi_threshold": float(p.get("psi_threshold", 0.2)),
                    # optional third statistic: 1-D Wasserstein in the
                    # value's units (magnitude-aware; None = not checked)
                    "emd_threshold": (
                        float(p["emd_threshold"])
                        if p.get("emd_threshold") is not None else None),
                    # optional 4th/5th statistics on the same histogram:
                    # JSD (finite under disjoint supports) and CvM
                    # (L2 of the CDF gap); None = not checked
                    "jsd_threshold": (
                        float(p["jsd_threshold"])
                        if p.get("jsd_threshold") is not None else None),
                    "cvm_threshold": (
                        float(p["cvm_threshold"])
                        if p.get("cvm_threshold") is not None else None),
                    # per-segment form ("drift per event type"): one
                    # violation row per drifted group (ks/psi only)
                    "by": p.get("by"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-drift"))

    if "x-dedup" in schema and not ctx.silent:
        # duplicate-content declaration: exact sha256 groups, n-gram
        # Jaccard near-dup clusters, acoustic-fingerprint clusters over a
        # binary audio column, or canonical-URL groups (operators/
        # clusters.dedup_violations); a relational pass like x-unique,
        # so top-level only
        if is_top:
            p = schema["x-dedup"]
            ctx.out.table_checks.append(
                ("dedup", ctx.instance_path[1:], {
                    "id": p["id"],
                    "method": p.get("method", "exact"),
                    "block": p.get("block"),
                    "n": int(p.get("n", 3)),
                    "threshold": float(p.get("threshold", 0.55)),
                    "max_distance": int(p.get("max_distance", 3)),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-dedup"))

    if "x-dup-ngram" in schema and not ctx.silent:
        # cross-corpus partial-overlap declaration (operators/dedup.
        # cross_doc_dup_fraction): flags documents whose duplicated
        # word-n-gram fraction exceeds max_frac — a relational pass like
        # x-dedup, so top-level only
        if is_top:
            p = schema["x-dup-ngram"]
            ctx.out.table_checks.append(
                ("dup_ngram", ctx.instance_path[1:], {
                    "id": p["id"],
                    "n": int(p.get("n", 5)),
                    "max_frac": float(p.get("max_frac", 0.5)),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-dup-ngram"))

    if "x-gopher" in schema and not ctx.silent:
        # Gopher quality-rule declaration (operators/text.gopher_violations):
        # flags documents failing the enabled Rae et al. 2021 rules — a
        # map-only per-row pass, but routed as a table check because the
        # rules read a whole text column, not the validated node's value
        if is_top:
            p = schema["x-gopher"]
            ctx.out.table_checks.append(
                ("gopher", ctx.instance_path[1:], {
                    "id": p["id"],
                    "rules": list(p["rules"]) if p.get("rules") else None,
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-gopher"))

    if "x-leakage" in schema and not ctx.silent:
        # split-leakage declaration on the SPLIT column (operators/
        # sampling.leakage_violations): groups spanning >1 split
        if is_top:
            p = schema["x-leakage"]
            ctx.out.table_checks.append(
                ("leakage", ctx.instance_path[1:], {
                    "group": p["group"],
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-leakage"))

    if "x-c4" in schema and not ctx.silent:
        # C4 page-gate declaration (operators/text.c4_violations) — same
        # routing rationale as x-gopher
        if is_top:
            p = schema["x-c4"]
            ctx.out.table_checks.append(
                ("c4", ctx.instance_path[1:], {
                    "id": p["id"],
                    "min_words_per_line": int(p.get("min_words_per_line")
                                              or 5),
                    "min_sentences": int(p.get("min_sentences") or 3),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-c4"))

    if "x-decontaminate" in schema and not ctx.silent:
        # benchmark-overlap declaration: like x-ref, names a dim (the
        # benchmark table) resolved from the dims dict at run time
        if is_top:
            p = schema["x-decontaminate"]
            ctx.out.table_checks.append(
                ("decontaminate", ctx.instance_path[1:], {
                    "id": p["id"],
                    "bench": p["bench"],
                    "bench_text_col": p.get("bench_text_col"),
                    "bench_id_col": p.get("bench_id_col"),
                    "n": int(p.get("n", 8)),
                    "min_shared": int(p.get("min_shared", 1)),
                    "bloom": bool(p.get("bloom", False)),
                    "n_items": p.get("n_items"),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-decontaminate"))

    if "x-label-conflict" in schema and not ctx.silent:
        # transcript-vs-acoustic-near-dup consistency: declared on the
        # binary audio column, names the id and transcript columns; a
        # separate relational pass (fingerprint self-join) like x-dedup
        if is_top:
            p = schema["x-label-conflict"]
            # explicit nulls pass the shape check (None is "use the
            # default"), and dict.get does NOT apply its default for
            # present-but-null keys — coerce explicitly
            md = p.get("max_distance")
            cb = p.get("contradiction_below")
            ctx.out.table_checks.append(
                ("label_conflict", ctx.instance_path[1:], {
                    "id": p["id"],
                    "transcript": p["transcript"],
                    "max_distance": 2 if md is None else int(md),
                    # edit-similarity grading: contradiction (below the
                    # knee) escalates to error, ASR noise stays warning
                    "grade": bool(p.get("grade", False)),
                    "contradiction_below": 0.5 if cb is None else float(cb),
                    "severity": ctx.severity,
                }))
        else:
            ctx.out.unknown.append((ctx.instance_path, "x-label-conflict"))

    if "x-langid" in schema and ctx.col is not None:
        # declared-vs-detected language consistency: a pure row expression
        # (marker-token argmax, operators/text.lang_guess) so it rides the
        # one-projection scan — no extra pass
        from ..operators import text as _text

        p = schema["x-langid"]
        declared = p["declared"]
        if declared not in ctx.df_schema.fieldNames():
            # declared column absent from the table: can't evaluate —
            # surfaced, never silently vacuous
            ctx.out.unknown.append(
                (ctx.instance_path, f"x-langid:{declared}"))
        else:
            if not ctx.silent:
                ctx.out.columns_read.add(declared)
            dcol = F.col(declared)
            guess = _text.lang_guess(ctx.col)
            min_toks = int(p.get("min_tokens", 5))
            violated = (_present(ctx) & dcol.isNotNull()
                        & (_text.token_count(ctx.col) >= min_toks)
                        & (guess != F.lit("und"))
                        & (guess != dcol))
            msg = _reason(
                f'must match declared language in "{declared}"', ctx,
                "x-langid")
            _add(ctx, "x-langid", violated, msg, actual=guess)

    if "x-rate" in schema and ctx.col is not None:
        # transcript-vs-duration plausibility (the audio-tier cross-field
        # check, functions/audio.speaking_rate_violations as a DSL row
        # expression): chars/sec of this string column against a declared
        # millisecond duration column must land in [lo, hi]
        p = schema["x-rate"]
        dur_name = p["duration"]
        if dur_name not in ctx.df_schema.fieldNames():
            ctx.out.unknown.append(
                (ctx.instance_path, f"x-rate:{dur_name}"))
        else:
            if not ctx.silent:
                ctx.out.columns_read.add(dur_name)
            lo = float(p.get("lo", 1.0))
            hi = float(p.get("hi", 40.0))
            dur = F.col(dur_name)
            rate = F.length(ctx.col) / (dur / F.lit(1000.0))
            violated = (_present(ctx) & dur.isNotNull() & (dur > 0)
                        & ((rate < lo) | (rate > hi)))
            msg = _reason(
                f'must have plausible speaking rate ({lo}-{hi} chars/sec '
                f'against "{dur_name}")', ctx, "x-rate")
            _add(ctx, "x-rate", violated, msg,
                 actual=F.round(rate, 2).cast("string"))

    if "x-encoding" in schema and ctx.col is not None:
        # encoding-damage gate (operators/text.MOJIBAKE_PATTERNS): total
        # mojibake-artifact occurrences in this string column must not
        # exceed max_artifacts. Pure-JVM regexp_count sum — rides the
        # one-projection pass like every row check
        from ..operators.text import MOJIBAKE_PATTERNS
        p = schema["x-encoding"]
        names = p.get("patterns") or list(MOJIBAKE_PATTERNS)
        unknown_pats = [n for n in names if n not in MOJIBAKE_PATTERNS]
        if unknown_pats:
            ctx.out.unknown.append(
                (ctx.instance_path,
                 "x-encoding:" + ",".join(unknown_pats)))
        else:
            max_art = int(p.get("max_artifacts", 0))
            total = balanced_reduce(
                lambda a, b: a + b,
                [F.coalesce(
                    F.regexp_count(ctx.col,
                                   F.lit(MOJIBAKE_PATTERNS[n])),
                    F.lit(0)) for n in names])
            violated = _present(ctx) & (total > max_art)
            msg = _reason(
                f"must contain at most {max_art} encoding-damage "
                f"artifact(s) ({'/'.join(names)})", ctx, "x-encoding")
            _add(ctx, "x-encoding", violated, msg,
                 actual=total.cast("string"))

    if "x-embedding" in schema and ctx.col is not None:
        if isinstance(ctx.dtype, T.ArrayType) and isinstance(
                ctx.dtype.elementType,
                (T.FloatType, T.DoubleType, T.DecimalType)):
            _embedding_checks(ctx, schema["x-embedding"])
        else:
            # declared on a non-float-array column: config bug, surface it
            ctx.out.unknown.append((ctx.instance_path, "x-embedding"))

    if "x-spark-check" in schema and ctx.col is not None:
        name = schema["x-spark-check"]
        fn = ctx.extra_checks.get(name)
        if fn is None:
            ctx.out.unknown.append((ctx.instance_path, f"x-spark-check:{name}"))
        else:
            msg = _reason(f'must pass check "{name}"', ctx, "x-spark-check")
            _add(ctx, "x-spark-check", _present(ctx) & ~fn(ctx.col), msg)


def _embedding_checks(ctx: _Ctx, p: dict) -> None:
    """``x-embedding``: quality invariants of an embedding column — the
    validation surface an embeddings table needs before any ANN/near-dup
    pass will behave (similarity.py assumes finite, consistently-sized,
    optionally L2-normalized vectors). All pure row-level Column
    expressions (probes inside compositions work), presence-guarded:

    * ``dim``        — exact dimensionality
    * ``finite``     — no NaN/Inf elements (default True)
    * ``nonzero``    — not the all-zero vector
    * ``normalized`` — |L2 norm − 1| ≤ ``norm_tol`` (default 1e-3); only
      tested on finite vectors (NaN norms already fail ``finite``, and
      NaN comparison semantics differ across engines)
    """
    c = ctx.col.cast("array<double>")
    present = _present(ctx)
    n_bad = F.size(F.filter(
        c, lambda x: F.isnan(x) | (F.abs(x) == float("inf"))))
    finite_ok = n_bad == 0
    if "dim" in p:
        d = int(p["dim"])
        msg = _reason(f"must have embedding dimension {d}", ctx,
                      "x-embedding")
        _add(ctx, "x-embedding-dim", present & (F.size(c) != d), msg,
             actual=F.size(c).cast("string"))
    if p.get("finite", True):
        msg = _reason("must contain only finite values", ctx, "x-embedding")
        _add(ctx, "x-embedding-finite", present & ~finite_ok, msg,
             actual=F.concat(n_bad.cast("string"), F.lit(" non-finite")))
    norm2 = F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    if p.get("nonzero"):
        msg = _reason("must not be the zero vector", ctx, "x-embedding")
        _add(ctx, "x-embedding-nonzero",
             present & finite_ok & (norm2 == 0.0), msg,
             actual=F.lit("0.0"))
    if p.get("normalized"):
        tol = float(p.get("norm_tol", 1e-3))
        msg = _reason(f"must be L2-normalized (|norm-1| <= {tol:g})", ctx,
                      "x-embedding")
        _add(ctx, "x-embedding-norm",
             present & finite_ok
             & (F.abs(F.sqrt(norm2) - 1.0) > tol), msg,
             actual=F.round(F.sqrt(norm2), 6).cast("string"))


def _items_check(ctx: _Ctx, items_schema: dict) -> None:
    """Array element checks via F.exists — one violation per array, not per
    element (the reference emits per-element errors with /path/0 instance
    paths; at table scale we aggregate to the array's path, actual carries
    the whole array)."""
    elem_ok = _element_validity_fn(ctx, items_schema,
                                   f"{ctx.schema_path}/items")
    msg = _reason("must have valid items", ctx, "items")
    _add(ctx, "items",
         _present(ctx) & F.exists(ctx.col, lambda e: ~elem_ok(e)), msg)


def _tuple_items_check(ctx: _Ctx, items_list: list, additional,
                       kw: str = "items") -> None:
    """Tuple-form (positional) ``items`` + draft-07 ``additionalItems``.
    Also serves 2020-12 ``prefixItems`` (``kw="prefixItems"``, with dict
    ``items`` as the tail schema).

    Each position i gets its own check against ``items[i]`` (Ajv reports
    per-element errors at ``/path/i``; same here via the instance path),
    firing only when the array actually has an element at that position —
    a shorter array is valid positionally (minItems is the length
    constraint). ``additionalItems: false`` caps the length at
    ``len(items)``; a schema validates every element beyond the tuple
    prefix. Previously this form compiled to nothing, silently — a
    positional schema was vacuously valid with no ``unknown`` record.
    """
    elem_t = ctx.dtype.elementType
    n = len(items_list)
    for i, sub in enumerate(items_list):
        # try_element_at: ANSI mode's element_at throws on short arrays;
        # the size guard below makes the NULL unreachable anyway
        elem = F.try_element_at(ctx.col, F.lit(i + 1))
        ok = _probe_validity(sub, ctx, col=elem, dtype=elem_t,
                             schema_path=f"{ctx.schema_path}/{kw}/{i}")
        msg = _reason(f"must have valid item at position {i}", ctx, kw)
        _add(ctx, kw,
             _present(ctx) & (F.size(ctx.col) > i) & ~ok, msg,
             actual=_actual_str(elem, elem_t),
             instance_path=f"{ctx.instance_path}/{i}")
    if additional is False:
        msg = _reason(f"must NOT have more than {n} items", ctx,
                      "additionalItems")
        _add(ctx, "additionalItems",
             _present(ctx) & (F.size(ctx.col) > n), msg)
    elif isinstance(additional, dict):
        elem_ok = _element_validity_fn(ctx, additional,
                                       f"{ctx.schema_path}/additionalItems")
        tail = F.when(F.size(ctx.col) > n,
                      F.slice(ctx.col, n + 1, F.size(ctx.col) - n)) \
                .otherwise(F.array().cast(ctx.dtype))
        msg = _reason("must have valid additional items", ctx,
                      "additionalItems")
        _add(ctx, "additionalItems",
             _present(ctx) & F.exists(tail, lambda e: ~elem_ok(e)), msg)


def _pattern_properties(ctx: _Ctx, pp: dict) -> None:
    """``patternProperties``: every property whose NAME matches a pattern
    (unanchored search, Ajv semantics) must have a value valid under that
    pattern's schema.

    Struct/root nodes have schema-static property names, so matching runs
    at compile time in the JVM regex dialect (the same dialect ``rlike``
    uses at runtime) and each matching property compiles like a normal
    ``properties`` entry — full per-keyword checks and messages. Map nodes
    have data-dependent keys: one aggregated check per pattern via a
    runtime forall over ``map_entries`` (matching keys with invalid values
    are listed in ``actual``).
    """
    if ctx.col is None or isinstance(ctx.dtype, T.StructType):
        names = (ctx.df_schema.fieldNames() if ctx.col is None
                 else ctx.dtype.fieldNames())
        for pattern, sub in pp.items():
            matched = [nm for nm in names
                       if _java_regex_search(pattern, nm)]
            if not matched:
                ctx.out.static_passes.append(
                    (ctx.instance_path, f"patternProperties:{pattern}"))
            for nm in matched:
                child_col, child_t, _exists = _child(ctx, nm)
                sub_ctx = _Ctx(
                    col=child_col, dtype=child_t,
                    instance_path=f"{ctx.instance_path}/{nm}",
                    schema_path=f"{ctx.schema_path}/patternProperties/{pattern}",
                    schema_file=_sub_file(ctx, sub),
                    df_schema=ctx.df_schema, root_schema=ctx.root_schema,
                    out=ctx.out, extra_checks=ctx.extra_checks,
                    silent=ctx.silent, severity=ctx.severity,
                )
                _compile_keywords(sub, sub_ctx)
        return
    if isinstance(ctx.dtype, T.MapType):
        val_t = ctx.dtype.valueType

        def bad_entry_fn(pat, sub_schema):
            # closure, not default args: pyspark HOF lambdas must have
            # exactly one parameter (extra params are parsed as the
            # array-index variable / rejected)
            def f(e):
                ok = _probe_validity(
                    sub_schema, ctx, col=e.getField("value"), dtype=val_t,
                    schema_path=f"{ctx.schema_path}/patternProperties/{pat}")
                return e.getField("key").rlike(pat) & ~ok
            return f

        for pattern, sub in pp.items():
            bad = F.filter(F.map_entries(ctx.col), bad_entry_fn(pattern, sub))
            msg = _reason(
                f'properties matching pattern "{pattern}" must be valid',
                ctx, "patternProperties")
            _add(ctx, "patternProperties",
                 _present(ctx) & (F.size(bad) > 0), msg,
                 actual=F.concat_ws(
                     ",", F.transform(bad, lambda e: e.getField("key"))))
        return
    # other node types: property keywords are vacuous (no properties)
    ctx.out.static_passes.append((ctx.instance_path, "patternProperties"))


def _probe_validity(sub_schema: dict, ctx: _Ctx, *, col, dtype,
                    schema_path: str) -> Column:
    """Validity of the instance at (col, dtype) against ``sub_schema`` —
    the one shared probe: compiles into a discarded ruleset, folds
    ``~violated`` NULL-safely, and surfaces the probe's unknown keywords
    AND column reads into the real ruleset (strict mode must see unknowns
    anywhere in the tree; pruning to ``columns_read`` must stay sound for
    columns referenced only inside if/then/else/dependencies branches)."""
    probe = CompiledRuleset(name=ctx.out.name)
    # inherit engine options: udf_formats-gated formats inside a
    # composition branch must compile (not fall to unknown/vacuous) when
    # the caller enabled them
    probe.options = ctx.out.options
    sub_ctx = _Ctx(col=col, dtype=dtype, instance_path=ctx.instance_path,
                   schema_path=schema_path, schema_file=ctx.schema_file,
                   df_schema=ctx.df_schema, root_schema=ctx.root_schema,
                   out=probe, extra_checks=ctx.extra_checks, silent=False)
    _compile_keywords(sub_schema, sub_ctx)
    for u in probe.unknown:
        if u not in ctx.out.unknown:
            ctx.out.unknown.append(u)
    # x-unique / x-ref declared inside a composition branch (anyOf/oneOf/
    # not/if/then/else/dependencies) have no relational-pass semantics —
    # the probe's verdict is a row expression, but a table check is a whole
    # separate aggregate/join pass that cannot be conditioned per-row.
    # Surface them as unknown so strict mode flags the dropped declaration
    # instead of silently discarding it with the probe ruleset.
    for kind, column, _params in probe.table_checks:
        # kind is the internal dispatch name; the DSL keyword spells it
        # with dashes (x-dup-ngram, x-label-conflict)
        u = (f"{ctx.instance_path}/{column}",
             f"x-{kind.replace('_', '-')}:in-composition")
        if u not in ctx.out.unknown:
            ctx.out.unknown.append(u)
    ctx.out.columns_read.update(probe.columns_read)
    ok = F.lit(True)
    for c in probe.checks:
        ok = ok & ~F.coalesce(c.violated, F.lit(False))
    if probe.static_failures:
        ok = F.lit(False)
    return ok


def _element_validity_fn(ctx: _Ctx, sub_schema: dict, schema_path: str):
    """Return ``elem -> Column[bool]`` validity of one array element against
    ``sub_schema`` (shared by ``contains``/``minContains``/``maxContains``).

    NULL elements follow the engine's documented NULL==absent semantics:
    value keywords are presence-guarded, so a NULL element is vacuously
    valid (mirrors JSON Schema, where e.g. ``minimum`` ignores non-numbers).
    """
    elem_t = ctx.dtype.elementType
    return lambda e: _probe_validity(sub_schema, ctx, col=e, dtype=elem_t,
                                     schema_path=schema_path)


def _property_count(ctx: _Ctx) -> Column | None:
    """Number of present properties at this node (NULL == absent).

    Root/struct: sum of non-NULL fields (root reads every column — noted in
    columns_read so pruning stays honest). Map: entry count. Other types:
    keyword is vacuous (None).
    """
    if ctx.col is None:
        fields = ctx.df_schema.fieldNames()
        ctx.out.columns_read.update(fields)
        cols = [F.col(f).isNotNull().cast("int") for f in fields]
    elif isinstance(ctx.dtype, T.StructType):
        cols = [ctx.col.getField(f).isNotNull().cast("int")
                for f in ctx.dtype.fieldNames()]
    elif isinstance(ctx.dtype, T.MapType):
        return F.size(ctx.col)
    else:
        return None
    if not cols:
        return F.lit(0)
    return balanced_reduce(lambda a, b: a + b, cols)


# the keyword subset propertyNames enforces — identical on BOTH the runtime
# (map-key) and static (struct/root name) paths, so one ruleset cannot give
# different verdicts depending on node type. `type` is handled specially:
# property names are always strings (JSON Schema core), so type:"string" is
# vacuous and any type excluding "string" fails every name.
_PNAME_KEYWORDS = ("pattern", "maxLength", "minLength", "enum", "const",
                   "format")


def _pname_type_ok(sub: dict) -> bool:
    types = sub.get("type")
    if types is None:
        return True
    tl = types if isinstance(types, list) else [types]
    return "string" in tl


def _java_regex_search(pattern: str, s: str) -> bool:
    """Unanchored regex search in the JVM's own dialect — the authoritative
    one, since runtime checks execute via ``rlike`` (java.util.regex).
    Falls back to Python ``re`` only when no JVM is up (same policy as
    :func:`_regex_ok`)."""
    try:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
    except Exception:
        spark = None
    if spark is not None:
        p = spark._jvm.java.util.regex.Pattern.compile(pattern)  # noqa: SLF001
        return bool(p.matcher(s).find())
    return re.search(pattern, s) is not None


def _static_name_ok(name: str, sub: dict) -> bool:
    """Evaluate the supported keyword subset against a literal property
    name (struct/root property names are schema-static). Regexes run in
    the JVM dialect so the static path agrees with the map-key ``rlike``
    path."""
    if not _pname_type_ok(sub):
        return False
    if "pattern" in sub and not _java_regex_search(sub["pattern"], name):
        return False
    if "maxLength" in sub and len(name) > sub["maxLength"]:
        return False
    if "minLength" in sub and len(name) < sub["minLength"]:
        return False
    if "enum" in sub and name not in sub["enum"]:
        return False
    if "const" in sub and name != sub["const"]:
        return False
    if "format" in sub and sub["format"] in FORMAT_REGEX \
            and not _java_regex_search(FORMAT_REGEX[sub["format"]], name):
        return False
    return True


def _property_names(ctx: _Ctx, sub: dict) -> None:
    """`propertyNames`: every property name satisfies ``sub``. Map keys are
    data -> runtime forall over map_keys; struct/root names are static.
    Both paths enforce exactly ``_PNAME_KEYWORDS`` (+ the string-type
    rule)."""
    msg = _reason("property name must be valid", ctx, "propertyNames")
    for kw in sub:
        if kw not in _PNAME_KEYWORDS + ("type",):
            ctx.out.unknown.append(
                (ctx.instance_path, f"propertyNames:{kw}"))
    if ctx.col is not None and isinstance(ctx.dtype, T.MapType):
        sub_eff = {k: v for k, v in sub.items() if k in _PNAME_KEYWORDS}
        if not _pname_type_ok(sub):
            # no string can satisfy: any non-empty map violates
            _add(ctx, "propertyNames",
                 _present(ctx) & (F.size(ctx.col) > 0), msg,
                 actual=F.concat_ws(",", F.map_keys(ctx.col)))
            return

        def key_ok(k: Column) -> Column:
            return _probe_validity(
                sub_eff, ctx, col=k, dtype=T.StringType(),
                schema_path=f"{ctx.schema_path}/propertyNames")

        bad = F.exists(F.map_keys(ctx.col), lambda k: ~key_ok(k))
        _add(ctx, "propertyNames", _present(ctx) & bad, msg,
             actual=F.concat_ws(",", F.filter(F.map_keys(ctx.col),
                                              lambda k: ~key_ok(k))))
        return
    # static name sets: table columns at root, struct fields below
    if ctx.col is None:
        names = list(ctx.df_schema.fieldNames())
    elif isinstance(ctx.dtype, T.StructType):
        names = list(ctx.dtype.fieldNames())
    else:
        return
    bad_names = [n for n in names if not _static_name_ok(n, sub)]
    if bad_names:
        ctx.out.static_failures.append(
            (ctx.instance_path, "propertyNames", f"bad names {bad_names}"))
        # fires only when the struct exists (NULL parent == absent object)
        _add(ctx, "propertyNames",
             F.lit(True) if ctx.col is None else _present(ctx), msg,
             actual=F.lit(",".join(bad_names)))
    else:
        ctx.out.static_passes.append((ctx.instance_path, "propertyNames"))


def _covers_name_static(schema: dict, nm: str) -> bool:
    """`nm` is covered by this node's own properties/patternProperties."""
    if nm in (schema.get("properties") or {}):
        return True
    return any(_java_regex_search(p, nm)
               for p in (schema.get("patternProperties") or {}))


def _in_place_branches(ctx: _Ctx, schema: dict) -> list:
    """(sub_schema, schema_path, extra_cond|None) for every in-place
    applicator whose annotations can mark properties *evaluated*
    (2019-09): $ref, allOf/anyOf/oneOf members, if/then/else (then/else
    gated on the if outcome), dependentSchemas / dict-form dependencies
    (gated on trigger presence). `not` contributes no annotations."""
    out = []
    if isinstance(schema.get("$ref"), str):
        out.append((resolve_internal_ref(ctx.root_schema, schema["$ref"]),
                    f"{ctx.schema_path}/$ref", None))
    for kw in ("allOf", "anyOf", "oneOf"):
        for i, sub in enumerate(schema.get(kw) or []):
            if isinstance(sub, dict):
                out.append((sub, f"{ctx.schema_path}/{kw}/{i}", None))
    if isinstance(schema.get("if"), dict):
        if_ok = _validity(schema["if"], ctx, f"{ctx.schema_path}/if")
        out.append((schema["if"], f"{ctx.schema_path}/if", None))
        if isinstance(schema.get("then"), dict):
            out.append((schema["then"], f"{ctx.schema_path}/then", if_ok))
        if isinstance(schema.get("else"), dict):
            out.append((schema["else"], f"{ctx.schema_path}/else", ~if_ok))
    for kw in ("dependentSchemas", "dependencies"):
        for trigger, sub in (schema.get(kw) or {}).items():
            if not isinstance(sub, dict):
                continue
            t_col, _t, t_exists = _child(ctx, trigger)
            if not t_exists:
                continue  # never applied
            t_present = (F.map_contains_key(ctx.col, trigger)
                         if isinstance(ctx.dtype, T.MapType)
                         else t_col.isNotNull())
            out.append((sub, f"{ctx.schema_path}/{kw}/{trigger}",
                        t_present))
    return out


def _evaluated_cond(ctx: _Ctx, schema: dict, nm: str, *, _top: bool = False):
    """True | Column | None: is property `nm` *evaluated* at this node
    (2019-09 annotation semantics — an applicator branch contributes its
    coverage only when that branch VALIDATES). None = never evaluated."""
    covered = (_covers_name_static(schema, nm)
               or "additionalProperties" in schema
               or (not _top and "unevaluatedProperties" in schema))
    if covered:
        return True
    conds = []
    for sub, path, extra in _in_place_branches(ctx, schema):
        c = _evaluated_cond(ctx, sub, nm)
        if c is None:
            continue
        ok = _validity(sub, ctx, path)
        cond = ok if c is True else (ok & c)
        if extra is not None:
            cond = cond & extra
        conds.append(cond)
    if not conds:
        return None
    return balanced_reduce(lambda a, b: a | b, conds)


def _key_evaluated_fn(ctx: _Ctx, schema: dict, *, _top: bool = False):
    """Runtime-key twin of :func:`_evaluated_cond` for map-typed nodes:
    returns ``f(key_col) -> Column``, True (all keys evaluated) or None
    (never). Branch-validity Columns are row-level outer references —
    legal inside the HOF lambda the caller builds."""
    if ("additionalProperties" in schema
            or (not _top and "unevaluatedProperties" in schema)):
        return True
    names = list((schema.get("properties") or {}).keys())
    pats = list((schema.get("patternProperties") or {}).keys())
    parts = []  # (True | f(k), validity Column | None)
    if names or pats:
        def local(k, names=tuple(names), pats=tuple(pats)):
            c = k.isin(*names) if names else F.lit(False)
            for p in pats:
                c = c | k.rlike(p)
            return c
        parts.append((local, None))
    for sub, path, extra in _in_place_branches(ctx, schema):
        f = _key_evaluated_fn(ctx, sub)
        if f is None:
            continue
        ok = _validity(sub, ctx, path)
        if extra is not None:
            ok = ok & extra
        parts.append((f, ok))
    if not parts:
        return None

    def combined(k):
        c = F.lit(False)
        for f, ok in parts:
            cov = F.lit(True) if f is True else f(k)
            c = c | (cov if ok is None else (ok & cov))
        return c
    return combined


_COV_ALL = 1 << 30  # "covers every index" sentinel (arrays are far smaller)


def _item_coverage(ctx: _Ctx, schema: dict, *, _top: bool = False):
    """Array-item evaluation coverage of one node (2019-09 annotations):
    returns ``(cov_len_exprs, elem_preds)`` where ``cov_len_exprs`` are
    int Columns (indexes below their max are evaluated; branch
    contributions collapse to -1 when the branch fails) and
    ``elem_preds`` are ``fn(elem) -> Column`` for per-element coverage
    from ``contains`` (conditioned on branch validity by construction)."""
    covs, preds = [], []
    local = 0
    its = schema.get("items")
    if isinstance(its, dict) or isinstance(schema.get("additionalItems"),
                                           dict) \
            or (not _top and "unevaluatedItems" in schema):
        local = _COV_ALL
    elif isinstance(its, list):
        local = len(its)
    if isinstance(schema.get("prefixItems"), list):
        local = max(local, len(schema["prefixItems"]))
    if local:
        covs.append(F.lit(local))
    if isinstance(schema.get("contains"), dict):
        fn = _element_validity_fn(ctx, schema["contains"],
                                  f"{ctx.schema_path}/contains")
        preds.append(fn)
    for sub, path, extra in _in_place_branches(ctx, schema):
        sub_covs, sub_preds = _item_coverage(ctx, sub)
        if not sub_covs and not sub_preds:
            continue
        ok = _validity(sub, ctx, path)
        if extra is not None:
            ok = ok & extra
        for c in sub_covs:
            covs.append(F.when(ok, c).otherwise(F.lit(-1)))
        for fn in sub_preds:
            preds.append((lambda f, o: lambda e: o & f(e))(fn, ok))
    return covs, preds


def _unevaluated_items(ctx: _Ctx, schema: dict) -> None:
    """2019-09 ``unevaluatedItems``: indexes below a validating branch's
    prefix/items coverage (or matching a ``contains`` schema) are
    evaluated; the rest must be absent (``false``) or match the given
    schema. Non-array nodes are vacuous."""
    ui = schema["unevaluatedItems"]
    msg = _reason("must NOT have unevaluated items", ctx,
                  "unevaluatedItems")
    if ui is True or ctx.col is None \
            or not isinstance(ctx.dtype, T.ArrayType):
        ctx.out.static_passes.append(
            (ctx.instance_path, "unevaluatedItems"))
        return
    covs, preds = _item_coverage(ctx, schema, _top=True)
    max_cov = (balanced_reduce(F.greatest, covs) if len(covs) > 1
               else (covs[0] if covs else F.lit(0)))

    def uneval(x, i):
        u = i >= max_cov
        for fn in preds:
            u = u & ~F.coalesce(fn(x), F.lit(False))
        return u

    if isinstance(ui, dict):
        sub_ok = _element_validity_fn(ctx, ui,
                                      f"{ctx.schema_path}/unevaluatedItems")

        def bad(x, i):
            return uneval(x, i) & ~F.coalesce(sub_ok(x), F.lit(False))
    else:
        bad = uneval
    n_bad = F.size(F.filter(ctx.col, bad))
    _add(ctx, "unevaluatedItems", _present(ctx) & (n_bad > 0), msg,
         actual=n_bad.cast("string"))


def _unevaluated_properties(ctx: _Ctx, schema: dict) -> None:
    """2019-09 ``unevaluatedProperties``: like additionalProperties but
    seeing THROUGH in-place applicators — a property declared by a
    validating allOf/anyOf/oneOf/then/else/$ref branch counts as
    evaluated. ``false`` forbids unevaluated properties; a schema
    validates their values; ``true`` is vacuous."""
    up = schema["unevaluatedProperties"]
    msg = _reason("must NOT have unevaluated properties", ctx,
                  "unevaluatedProperties")
    if up is True:
        ctx.out.static_passes.append(
            (ctx.instance_path, "unevaluatedProperties"))
        return

    if ctx.col is None or isinstance(ctx.dtype, T.StructType):
        names = (ctx.df_schema.fieldNames() if ctx.col is None
                 else ctx.dtype.fieldNames())
        any_check = False
        for nm in names:
            cond = _evaluated_cond(ctx, schema, nm, _top=True)
            if cond is True:
                continue
            any_check = True
            child_col, child_t, _e = _child(ctx, nm)
            present = child_col.isNotNull()
            if ctx.col is not None:
                present = ctx.col.isNotNull() & present
            uneval = (present if cond is None
                      else present & ~F.coalesce(cond, F.lit(False)))
            if isinstance(up, dict):
                ok = _probe_validity(
                    up, ctx, col=child_col, dtype=child_t,
                    schema_path=f"{ctx.schema_path}/unevaluatedProperties")
                violated = uneval & ~ok
            else:
                violated = uneval
            _add(ctx, "unevaluatedProperties", violated, msg,
                 actual=F.lit(nm))
        if not any_check:
            ctx.out.static_passes.append(
                (ctx.instance_path, "unevaluatedProperties"))
        return

    if isinstance(ctx.dtype, T.MapType):
        fcomb = _key_evaluated_fn(ctx, schema, _top=True)
        if fcomb is True:
            ctx.out.static_passes.append(
                (ctx.instance_path, "unevaluatedProperties"))
            return
        val_t = ctx.dtype.valueType

        def bad(e):
            u = (F.lit(True) if fcomb is None
                 else ~F.coalesce(fcomb(e.getField("key")), F.lit(False)))
            if isinstance(up, dict):
                ok = _probe_validity(
                    up, ctx, col=e.getField("value"), dtype=val_t,
                    schema_path=f"{ctx.schema_path}/unevaluatedProperties")
                return u & ~ok
            return u

        bad_keys = F.transform(F.filter(F.map_entries(ctx.col), bad),
                               lambda e: e.getField("key"))
        _add(ctx, "unevaluatedProperties",
             _present(ctx) & (F.size(bad_keys) > 0), msg,
             actual=F.concat_ws(",", bad_keys))
        return

    # non-object node: vacuous (JSON Schema object keywords)
    ctx.out.static_passes.append(
        (ctx.instance_path, "unevaluatedProperties"))


def _additional_properties(ctx: _Ctx, schema: dict) -> None:
    """``additionalProperties``: a property is *additional* when its name
    is neither in ``properties`` nor matched by any ``patternProperties``
    regex (JSON Schema core). ``false`` forbids additional properties;
    a schema validates their values (previously the dict form compiled to
    nothing, silently)."""
    ap = schema.get("additionalProperties")
    allowed = list(schema.get("properties", {}).keys())
    patterns = list(schema.get("patternProperties", {}).keys())
    msg = _reason("must NOT have additional properties", ctx,
                  "additionalProperties")

    def is_extra_name(nm: str) -> bool:
        return nm not in allowed and not any(
            _java_regex_search(p, nm) for p in patterns)

    # static name sets: table columns at root, struct fields below
    if ctx.col is None or isinstance(ctx.dtype, T.StructType):
        names = (ctx.df_schema.fieldNames() if ctx.col is None
                 else ctx.dtype.fieldNames())
        extra = [f for f in names if is_extra_name(f)]
        if isinstance(ap, dict):
            # schema form: each extra property compiles against `ap`, same
            # shape as a patternProperties static match
            for nm in extra:
                child_col, child_t, _exists = _child(ctx, nm)
                sub_ctx = _Ctx(
                    col=child_col, dtype=child_t,
                    instance_path=f"{ctx.instance_path}/{nm}",
                    schema_path=f"{ctx.schema_path}/additionalProperties",
                    schema_file=_sub_file(ctx, ap),
                    df_schema=ctx.df_schema, root_schema=ctx.root_schema,
                    out=ctx.out, extra_checks=ctx.extra_checks,
                    silent=ctx.silent, severity=ctx.severity,
                )
                _compile_keywords(ap, sub_ctx)
            if not extra:
                ctx.out.static_passes.append((ctx.instance_path,
                                              "additionalProperties"))
            return
        if not extra:
            ctx.out.static_passes.append((ctx.instance_path,
                                          "additionalProperties"))
            return
        if ctx.col is None:
            ctx.out.static_failures.append(
                (ctx.instance_path, "additionalProperties",
                 f"extra columns {extra}"))
            _add(ctx, "additionalProperties", F.lit(True), msg,
                 actual=F.lit(",".join(extra)))
        else:
            _add(ctx, "additionalProperties", _present(ctx), msg,
                 actual=F.lit(",".join(extra)))
        return

    if isinstance(ctx.dtype, T.MapType):
        def key_extra(k):
            e = ~k.isin(*allowed) if allowed else F.lit(True)
            for p in patterns:
                e = e & ~k.rlike(p)
            return e

        if ap is False and not patterns:
            # fast path: array_except is a regular codegen-able expression;
            # the F.filter lambda below is CodegenFallback and would drop
            # the whole validation projection out of whole-stage codegen
            # (measured 2.3x on the events-props suite query)
            extra_keys = F.array_except(
                F.map_keys(ctx.col),
                F.array(*[F.lit(k) for k in allowed])
                if allowed else F.array().cast("array<string>"))
            _add(ctx, "additionalProperties",
                 _present(ctx) & (F.size(extra_keys) > 0), msg,
                 actual=F.concat_ws(",", extra_keys))
            return
        if isinstance(ap, dict):
            val_t = ctx.dtype.valueType

            def entry_bad(e):
                ok = _probe_validity(
                    ap, ctx, col=e.getField("value"), dtype=val_t,
                    schema_path=f"{ctx.schema_path}/additionalProperties")
                return key_extra(e.getField("key")) & ~ok

            bad = F.filter(F.map_entries(ctx.col), entry_bad)
            msg = _reason("additional properties must be valid", ctx,
                          "additionalProperties")
            _add(ctx, "additionalProperties",
                 _present(ctx) & (F.size(bad) > 0), msg,
                 actual=F.concat_ws(
                     ",", F.transform(bad, lambda e: e.getField("key"))))
            return
        extra_keys = F.filter(F.map_keys(ctx.col), key_extra)
        _add(ctx, "additionalProperties",
             _present(ctx) & (F.size(extra_keys) > 0), msg,
             actual=F.concat_ws(",", extra_keys))


def _validity(schema: dict, ctx: _Ctx, schema_path: str) -> Column:
    """Full-node validity expression (for anyOf/oneOf/not/if composition)."""
    return _probe_validity(schema, ctx, col=ctx.col, dtype=ctx.dtype,
                           schema_path=schema_path)


def _child(ctx: _Ctx, prop: str):
    """Resolve a property name to (Column, DataType, exists) under ctx."""
    if ctx.col is None:
        if prop in ctx.df_schema.fieldNames():
            f = ctx.df_schema[prop]
            ctx.out.columns_read.add(prop)
            return F.col(prop), f.dataType, True
        return None, None, False
    if isinstance(ctx.dtype, T.StructType):
        if prop in ctx.dtype.fieldNames():
            f = ctx.dtype[prop]
            return ctx.col.getField(prop), f.dataType, True
        return None, None, False
    if isinstance(ctx.dtype, T.MapType):
        return ctx.col.getItem(prop), ctx.dtype.valueType, True
    return None, None, False


def _sub_file(ctx: _Ctx, sub) -> str:
    """Bundled external refs keep their file-path prefix in schemaPath
    provenance (reference demo/pipeline.ts:74-79)."""
    if isinstance(sub, dict) and "$bundled_from" in sub:
        return sub["$bundled_from"]
    return ctx.schema_file


def ruleset_hash(schema: dict) -> str:
    """Canonical content hash of a ruleset document — THE identity the
    resume manifest keys on and that ``run_with_resume`` uses to verify
    a ``ruleset_doc`` matches its compiled form. One definition: any
    change to the recipe invalidates manifests, so both sites must move
    together."""
    return hashlib.sha256(
        json.dumps(schema, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def _schema_depth(dtype) -> int:
    """Max nesting depth of a Spark type (struct/array/map levels) —
    the unroll bound for dynamic references."""
    if isinstance(dtype, T.StructType):
        return 1 + max((_schema_depth(f.dataType) for f in dtype.fields),
                       default=0)
    if isinstance(dtype, T.ArrayType):
        return 1 + _schema_depth(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return 1 + _schema_depth(dtype.valueType)
    return 0


def compile_ruleset(
    schema: dict,
    df_schema: T.StructType,
    *,
    name: str = "ruleset",
    schema_file: str = "",
    extra_checks: dict | None = None,
    exclude_columns: tuple = (),
    options: dict | None = None,
) -> CompiledRuleset:
    """Compile a bundled JSON-Schema-shaped document against a table schema.

    ``exclude_columns`` reproduces the reference's routing-key removal:
    ``delete yamlJS.$schema`` (index.ts:300-302) runs only on the
    file-association path, so callers pass ``("ruleset_id",)`` when the
    ruleset was routed by column and ``()`` on the embed path (the quirk
    where an embedded ``additionalProperties:false`` schema flags
    ``$schema`` is thereby preserved).

    ``options`` is the ``Settings.ajvOptions`` analog (index.ts:49,
    310-317): ``strict`` (default False, like the reference's Ajv ctor
    ``strict: false`` at index.ts:313) makes unknown keywords a compile
    error instead of a collected warning; ``all_errors`` (default True,
    index.ts:312) is consumed by :func:`operators.validate.validate` —
    False keeps only the first violation per row, Ajv's non-allErrors
    mode.
    """
    options = options or {}
    unknown_opts = set(options) - {"strict", "all_errors", "udf_formats",
                                   "stage_variant"}
    if unknown_opts:
        raise RulesetCompileError(
            f"unknown engine options: {sorted(unknown_opts)}")
    if not isinstance(schema, dict):
        raise RulesetCompileError(f"JSON schema malformed: {schema!r}")
    if exclude_columns:
        df_schema = T.StructType(
            [f for f in df_schema.fields if f.name not in exclude_columns])
    out = CompiledRuleset(name=name)
    out.ruleset_hash = ruleset_hash(schema)
    # draft 2019-09/2020-12 dynamic references: statically unroll to the
    # bound table schema's nesting depth + 1 — Spark struct types are
    # finitely nested, so a recursive schema meets at most that much
    # real data and the residual expansion is vacuous (bundler docstring
    # records the single-resource resolution model). Unresolvable names
    # stay in place and surface in `unknown` as before.
    from .bundler import unroll_dynamic_refs
    schema = unroll_dynamic_refs(schema, _schema_depth(df_schema) + 1)
    stage = None
    if options.get("stage_variant", True):
        # short name-hash suffix: sanitized/truncated names of two routed
        # rulesets must never collide in the fused relation's columns
        prefix = (re.sub(r"\W+", "_", name)[:24] + "_"
                  + hashlib.sha256(name.encode()).hexdigest()[:4])

        def stage(hint: str, expr: Column) -> Column:  # noqa: F811
            col_name = f"_vst_{prefix}_{len(out.staged)}"
            out.staged.append((col_name, expr))
            return F.col(col_name)
    ctx = _Ctx(col=None, dtype=None, instance_path="", schema_path="#",
               schema_file=schema_file, df_schema=df_schema,
               root_schema=schema, out=out,
               extra_checks=extra_checks or {}, stage=stage)
    out.options = dict(options)
    try:
        _shape_walk(schema)
        _compile_keywords(schema, ctx)
    except RulesetCompileError:
        raise
    except Exception as exc:  # malformed schema -> guard, not crash (index.ts:335-340)
        raise RulesetCompileError(f"JSON schema malformed: {exc}") from exc
    if options.get("strict") and out.unknown:
        raise RulesetCompileError(
            f"strict mode: unknown keywords {out.unknown!r}")
    return out


