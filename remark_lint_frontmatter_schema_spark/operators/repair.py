"""Declarative repair pass: the lint -> fix half of the reference's
workflow, compiled from the SAME ruleset document as the validator.

The reference ecosystem's loop is lint, fix the file, re-lint
(/root/reference/README.md workflow; remark's ``--output`` rewrites the
file in place). At corpus scale "fix the file" becomes a column
transformation: values that can be coerced into range are coerced, values
that cannot are dropped to NULL, and NULLs take the schema ``default``
when one is declared — so a repaired table re-validates clean for every
repairable constraint. Ajv exposes the same idea as ``useDefaults`` /
``coerceTypes`` (public Ajv options; the reference constructs Ajv without
them, index.ts:310-317, so this is an engine extension, not reference
parity).

Repair policy, per top-level property, applied in this order:

1. **coerce** — ``minimum``/``maximum`` clamp numerics to the bound;
   ``maxLength`` truncates strings (prefix keep, the only
   content-preserving string coercion).
2. **nullify** — a value still violating ``enum``, ``pattern``,
   ``exclusiveMinimum``/``exclusiveMaximum`` (open bounds have no
   clamp-to value), or ``minLength`` (padding would fabricate content)
   drops to NULL.
3. **fill** — NULL (original or just-nullified) takes the property's
   ``default`` when declared.
4. **array coercions** — ``uniqueItems: true`` dedupes
   (``array_distinct``, first occurrence kept), ``maxItems`` truncates
   (prefix keep); dedupe runs first so distinct content survives when it
   alone satisfies the length bound. ``minItems``/``contains`` are not
   repairable (padding would fabricate elements).
5. **drop_unknown_keys** — a map-typed property with sub-``properties``
   and ``additionalProperties: false`` keeps only declared keys
   (``map_filter``).

Scope (documented, not silent): top-level scalar, array, and map
properties only; ``required``/``type``/``format``/nested-struct
constraints are diagnosable but not value-repairable and are left to
the validator.
A property opts out with ``x-repair: false``.

Scale shape: the whole pass is ONE projection of JVM Column expressions
over one scan — no shuffle, no Python, whole-stage codegen; the repair
log rides the same projection as an array column (the
``violations_array`` pattern, operators/validate.py) and explodes into
log rows only for rows that were actually touched. Consuming both the
repaired table and the log plans two column-pruned reads of the source
unless the caller persists; same trade-off as ``validate``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.compiler import RulesetCompileError, _regex_ok

_NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                  T.FloatType, T.DoubleType, T.DecimalType)

LOG_FIELDS = ("ruleset_id", "column", "instance_path", "action",
              "before", "after")
_LOG_STRUCT = ("struct<ruleset_id:string,column:string,instance_path:string,"
               "action:string,before:string,after:string>")


@dataclass
class CompiledRepair:
    """One property's repair chain: ``expr`` is the fully-repaired value,
    ``log_entries`` one nullable struct Column per step (NULL = step did
    not fire for the row)."""

    column: str
    actions: list  # action names, compile-time (for summary/tests)
    expr: Column
    log_entries: list = field(default_factory=list)


def _stringify(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, (T.MapType, T.ArrayType)):
        return F.to_json(col)
    return col.cast("string")


def _log(column: str, path: str, action: str, cond: Column,
         before: Column, after: Column, dtype: T.DataType,
         ruleset: str) -> Column:
    return F.when(cond, F.struct(
        F.lit(ruleset).alias("ruleset_id"),
        F.lit(column).alias("column"),
        F.lit(path).alias("instance_path"),
        F.lit(action).alias("action"),
        _stringify(before, dtype).alias("before"),
        _stringify(after, dtype).alias("after"),
    )).cast(_LOG_STRUCT)


def _compile_value(cur: Column, prop: dict, dtype: T.DataType, *,
                   path: str, column: str, ruleset: str):
    """Repair chain for the value expression ``cur`` of type ``dtype`` —
    shared by top-level columns and (recursively) struct fields.
    Returns ``(repaired_expr, log_entries, actions)``."""
    entries: list = []
    actions: list = []

    def step(action: str, cond: Column, new: Column):
        nonlocal cur
        cond = F.coalesce(cond, F.lit(False))
        entries.append(
            _log(column, path, action, cond, cur, new, dtype, ruleset))
        cur = F.when(cond, new).otherwise(cur)
        actions.append(action)

    is_num = isinstance(dtype, _NUMERIC_TYPES)
    is_str = isinstance(dtype, T.StringType)
    is_integral = isinstance(dtype, (T.ByteType, T.ShortType,
                                     T.IntegerType, T.LongType))

    def _bound(raw, *, up: bool):
        """Clamp target as a typed literal. A fractional bound on an
        integral column takes the nearest in-range integer (ceil for
        minimum, floor for maximum) — casting would truncate 0.5 -> 0
        and 'repair' to a still-violating value."""
        if is_integral:
            raw = math.ceil(raw) if up else math.floor(raw)
        return F.lit(raw).cast(dtype)

    # 1. coerce: clamp closed numeric bounds, truncate over-long strings.
    #    Comparisons use the RAW (double-promoted) bound, never the cast
    #    one, so integral columns compare against 0.5, not trunc(0.5)
    if is_num and "minimum" in prop:
        step("clamp_min", cur < F.lit(prop["minimum"]),
             _bound(prop["minimum"], up=True))
    if is_num and "maximum" in prop:
        step("clamp_max", cur > F.lit(prop["maximum"]),
             _bound(prop["maximum"], up=False))
    if is_str and "maxLength" in prop:
        n = int(prop["maxLength"])
        step("truncate", F.length(cur) > n, F.substring(cur, 1, n))

    # 2. nullify what no coercion can fix (open bounds, enum, pattern,
    #    too-short strings); NULL then falls through to the default fill
    null = F.lit(None).cast(dtype)
    if is_num and "exclusiveMinimum" in prop:
        step("nullify_exclusive_min",
             cur <= F.lit(prop["exclusiveMinimum"]), null)
    if is_num and "exclusiveMaximum" in prop:
        step("nullify_exclusive_max",
             cur >= F.lit(prop["exclusiveMaximum"]), null)
    if "enum" in prop and (is_str or is_num):
        step("nullify_enum", ~cur.isin(list(prop["enum"])), null)
    if is_str and "pattern" in prop:
        if not _regex_ok(prop["pattern"]):
            raise RulesetCompileError(
                f"repair: invalid pattern at {path}: {prop['pattern']!r}")
        step("nullify_pattern", ~cur.rlike(prop["pattern"]), null)
    if is_str and "minLength" in prop:
        step("nullify_min_length", F.length(cur) < int(prop["minLength"]),
             null)

    # 3. fill the declared default into NULLs (original or just-nullified);
    #    scalar/array literals only — a dict default has no Spark literal
    if "default" in prop and not isinstance(dtype,
                                            (T.MapType, T.StructType)):
        step("fill_default", cur.isNull(),
             F.lit(prop["default"]).cast(dtype))

    # 4. array columns: dedupe uniqueItems violations (first occurrence
    #    kept, order preserved — array_distinct semantics), then truncate
    #    over-long arrays (prefix keep, mirroring maxLength). Dedupe runs
    #    first: it can bring the array under maxItems without dropping
    #    distinct content. minItems/contains are NOT repairable (padding
    #    would fabricate elements).
    if isinstance(dtype, T.ArrayType):
        if prop.get("uniqueItems") is True:
            deduped = F.array_distinct(cur)
            step("dedupe_items", F.size(deduped) < F.size(cur), deduped)
        if "maxItems" in prop:
            n = int(prop["maxItems"])
            step("truncate_items", F.size(cur) > n, F.slice(cur, 1, n))

    # 5. map columns: drop keys the schema doesn't declare
    if (isinstance(dtype, T.MapType)
            and prop.get("additionalProperties") is False
            and isinstance(prop.get("properties"), dict)):
        declared = sorted(prop["properties"])
        kept = F.map_filter(cur, lambda k, v: k.isin(declared))
        has_unknown = F.exists(F.map_keys(cur),
                               lambda k: ~k.isin(declared))
        step("drop_unknown_keys", cur.isNotNull() & has_unknown, kept)

    # 6. struct columns: recurse into declared sub-properties and rebuild
    #    the struct field-by-field (withField — a NULL struct stays NULL,
    #    matching the validator's presence-guard: no parent, no repair).
    #    The reference's frontmatter is nested YAML (its demo schema
    #    constrains `complex.time`), so nested fixes are first-class.
    if (isinstance(dtype, T.StructType)
            and isinstance(prop.get("properties"), dict)):
        by_f = {f.name: f.dataType for f in dtype.fields}
        for fname, fprop in prop["properties"].items():
            if (not isinstance(fprop, dict)
                    or fprop.get("x-repair") is False
                    or fname not in by_f):
                continue
            sub_expr, sub_entries, sub_actions = _compile_value(
                cur.getField(fname), fprop, by_f[fname],
                path=f"{path}/{fname}", column=column, ruleset=ruleset)
            if sub_actions:
                cur = cur.withField(fname, sub_expr)
                entries.extend(sub_entries)
                actions.extend(sub_actions)

    return cur, entries, actions


def _compile_column(name: str, prop: dict, dtype: T.DataType,
                    ruleset: str = "ruleset") -> CompiledRepair | None:
    """Build the repair chain for one top-level property. Returns None
    when nothing in the property schema (or its nested struct fields) is
    repairable."""
    expr, entries, actions = _compile_value(
        F.col(name), prop, dtype, path=f"/{name}", column=name,
        ruleset=ruleset)
    if not actions:
        return None
    return CompiledRepair(column=name, actions=actions, expr=expr,
                          log_entries=entries)


def _flatten_properties(doc, acc: dict) -> None:
    """Merge ``properties`` from the document and every (arbitrarily
    nested) ``allOf`` branch — the repair analog of the validator's
    flattened-allOf compilation, so a bundled composed ruleset (the
    reference's allOf + $ref layout) repairs the same constraints it
    validates. Same-property branches shallow-merge; same-keyword
    conflicts take the later branch (degenerate schema)."""
    if not isinstance(doc, dict):
        return
    p = doc.get("properties")
    if isinstance(p, dict):
        for k, v in p.items():
            if (k in acc and isinstance(acc[k], dict)
                    and isinstance(v, dict)):
                acc[k] = {**acc[k], **v}
            else:
                acc[k] = v
    branches = doc.get("allOf")
    if isinstance(branches, list):
        for b in branches:
            _flatten_properties(b, acc)


def compile_repairs(schema: dict, df_schema: T.StructType, *,
                    ruleset_name: str = "ruleset") -> list[CompiledRepair]:
    """Compile the repairable subset of a bundled ruleset against a table
    schema. Properties absent from the table, non-dict property schemas,
    and ``x-repair: false`` opt-outs are skipped (the validator, not the
    repairer, reports those); ``allOf`` branches are flattened."""
    if not isinstance(schema, dict):
        raise RulesetCompileError(f"JSON schema malformed: {schema!r}")
    by_name = {f.name: f.dataType for f in df_schema.fields}
    out = []
    props: dict = {}
    _flatten_properties(schema, props)
    if not props:
        return out
    for pname, prop in props.items():
        if not isinstance(prop, dict) or prop.get("x-repair") is False:
            continue
        if pname not in by_name:
            continue
        rep = _compile_column(pname, prop, by_name[pname],
                              ruleset=ruleset_name)
        if rep is not None:
            out.append(rep)
    return out


@dataclass
class RepairResult:
    repaired: DataFrame   # input schema, values repaired
    log: DataFrame        # row_id, ruleset_id, column, instance_path,
                          # action, before, after
    repairs: list         # the CompiledRepair chain (for summaries/tests)


def repair(df: DataFrame, schema: dict, *, row_id: str,
           name: str = "ruleset") -> RepairResult:
    """Apply the ruleset's repairable constraints to ``df``.

    ``repaired`` keeps the input schema exactly (so it drops straight back
    into the validator — the lint -> fix -> re-lint loop); ``log`` has one
    row per (row, repair action fired) with stringified before/after, the
    repair analog of the violations relation and union-compatible with
    sinks by the same (row_id, instance_path) addressing."""
    reps = compile_repairs(schema, df.schema, ruleset_name=name)
    if not reps:
        empty = df.sparkSession.createDataFrame(
            [], "row_id string, ruleset_id string, column string, "
                "instance_path string, action string, before string, "
                "after string")
        return RepairResult(repaired=df, log=empty, repairs=[])

    by_col = {r.column: r.expr for r in reps}
    entries = [e for r in reps for e in r.log_entries]
    annotated = df.select(
        *[by_col.get(c, F.col(c)).alias(c) for c in df.columns],
        F.filter(F.array(*entries), lambda x: x.isNotNull())
        .alias("_repairs"),
        F.col(row_id).cast("string").alias("_row_id"),
    )
    repaired = annotated.select(*df.columns)
    log = (annotated
           .where(F.size("_repairs") > 0)
           .select(F.col("_row_id").alias("row_id"),
                   F.explode("_repairs").alias("_r"))
           .select("row_id", *[F.col(f"_r.{f}").alias(f)
                               for f in LOG_FIELDS]))
    return RepairResult(repaired=repaired, log=log, repairs=reps)


@dataclass
class RoutedRepairResult:
    repaired: DataFrame
    log: DataFrame        # row_id, ruleset_id, column, ..., before, after
    routed: list          # ruleset names that contributed repairs
    errors: list          # (name, stage, message) — G2-style artifacts


def route_and_repair(df: DataFrame, *, row_id: str,
                     registry: dict | None = None,
                     embed: dict | None = None,
                     ruleset_col: str | None = None,
                     patterns: dict | None = None,
                     partition_col: str | None = None,
                     schema_dirs: tuple = (),
                     fetch=None) -> RoutedRepairResult:
    """Routed lint -> fix: every row is repaired under the SAME ruleset
    the validator would route it to (remark's ``--output`` fixes each
    file under its own ``$schema``; precedence embed > column > glob,
    plans/routing.py). Still ONE projection: the routes' predicates are
    disjoint by construction, so each output column is a
    ``CASE route_pred -> that route's repair chain`` and unrouted rows
    pass through unchanged. Log entries are predicate-guarded and carry
    the route's name as ``ruleset_id``. Load/compile failures become
    error artifacts (G2) — their routes simply don't repair."""
    from ..plans.routing import _resolve_routes
    from ..plans.bundler import bundle_dict

    errors: list = []
    if embed is not None:
        res = repair(df, bundle_dict(embed, fetch=fetch), row_id=row_id,
                     name="embed")
        return RoutedRepairResult(res.repaired, res.log, ["embed"], errors)

    routes = _resolve_routes(
        df, registry=registry or {}, ruleset_col=ruleset_col,
        patterns=patterns, partition_col=partition_col,
        schema_dirs=schema_dirs, fetch=fetch, errors=errors)

    per_route: list = []  # (name, pred, [CompiledRepair])
    for name, doc, _source, pred, _sf in routes:
        try:
            reps = compile_repairs(doc, df.schema, ruleset_name=name)
        except RulesetCompileError as exc:
            errors.append((name, "compile", str(exc)))
            continue
        # never repair the routing key itself out from under the router
        reps = [r for r in reps if r.column != ruleset_col]
        if reps:
            per_route.append((name, pred, reps))

    if not per_route:
        empty = df.sparkSession.createDataFrame(
            [], "row_id string, ruleset_id string, column string, "
                "instance_path string, action string, before string, "
                "after string")
        return RoutedRepairResult(df, empty, [], errors)

    by_col: dict = {}
    entries: list = []
    for name, pred, reps in per_route:
        for r in reps:
            prev = by_col.get(r.column, F.col(r.column))
            by_col[r.column] = F.when(pred, r.expr).otherwise(prev)
            entries.extend(
                F.when(pred, e).cast(_LOG_STRUCT) for e in r.log_entries)

    annotated = df.select(
        *[by_col.get(c, F.col(c)).alias(c) for c in df.columns],
        F.filter(F.array(*entries), lambda x: x.isNotNull())
        .alias("_repairs"),
        F.col(row_id).cast("string").alias("_row_id"),
    )
    repaired = annotated.select(*df.columns)
    log = (annotated
           .where(F.size("_repairs") > 0)
           .select(F.col("_row_id").alias("row_id"),
                   F.explode("_repairs").alias("_r"))
           .select("row_id", *[F.col(f"_r.{f}").alias(f)
                               for f in LOG_FIELDS]))
    return RoutedRepairResult(repaired, log,
                              [n for n, _p, _r in per_route], errors)
