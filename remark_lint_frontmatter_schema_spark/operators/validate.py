"""The validation operator: one scan, all checks, no short-circuit.

Reference semantics this preserves:

* ``allErrors: true`` (``/root/reference/index.ts:312``) — every failing
  keyword yields a violation; nothing stops at the first error. Here the
  whole compiled ruleset is evaluated in ONE projection producing an
  ``ARRAY<STRUCT<...>>`` per row, then exploded. One scan evaluates all
  constraints: scan-bound at 10^12 rows, shuffle-free until the (tiny)
  verdict aggregate.
* zero messages == file passes (``README.md:449-454``) — per-row
  ``passed`` and per-partition verdict rows.
* violation record shape mirrors the VFileMessage JSON
  (``README.md:564-608``): constraint_id/keyword/instance_path/
  schema_path/message/actual/expected/severity.

Scale notes: the violations array is built in chunks of
``_CHUNK`` whens so a 500-constraint ruleset does not blow past
whole-stage-codegen method limits; the chunks are concatenated — still one
projection, one scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.compiler import Check, CompiledRuleset, balanced_reduce

VIOLATION_FIELDS = (
    "constraint_id", "keyword", "instance_path", "schema_path",
    "message", "actual", "expected", "severity",
)

_CHUNK = 64  # whens per F.array chunk (codegen hugeMethodLimit headroom)


def stage_columns(df, compiled: CompiledRuleset):
    """Project ``compiled.staged`` below the checks projection.

    Variant expressions are CodegenFallback — a checks projection that
    inlines them re-walks the variant binary once per keyword in
    interpreted mode. The compiler stages each variant node's value/tag/
    string/double views once (plans/compiler.py); every consumer of
    ``compiled.checks`` / the ``*_expr`` builders MUST apply this first.
    Entries may reference earlier entries, hence the sequential selects
    (CollapseProject keeps multi-referenced non-cheap aliases in place).
    No-op (same DataFrame) for rulesets with nothing staged.
    """
    for col_name, expr in getattr(compiled, "staged", ()) or ():
        df = df.select("*", expr.alias(col_name))
    return df


def staged_names(compiled: CompiledRuleset) -> list[str]:
    return [n for n, _ in (getattr(compiled, "staged", ()) or ())]


def _violation_struct(c: Check) -> Column:
    expected = (
        F.array(*[F.lit(v) for v in c.expected]).cast("array<string>")
        if c.expected else F.lit(None).cast("array<string>")
    )
    return F.when(
        F.coalesce(c.violated, F.lit(False)),
        F.struct(
            F.lit(c.constraint_id).alias("constraint_id"),
            F.lit(c.keyword).alias("keyword"),
            F.lit(c.instance_path or "").alias("instance_path"),
            F.lit(c.schema_path).alias("schema_path"),
            F.lit(c.message).alias("message"),
            c.actual.alias("actual"),
            expected.alias("expected"),
            F.lit(c.severity).alias("severity"),
        ),
    )  # otherwise NULL -> filtered out below


_EMPTY_ARR_TYPE = (
    "array<struct<constraint_id:string,keyword:string,"
    "instance_path:string,schema_path:string,message:string,"
    "actual:string,expected:array<string>,severity:string>>"
)


def _raw_violations_array(compiled: CompiledRuleset) -> Column:
    """ARRAY<STRUCT> with NULL slots for passing checks (not yet compacted).

    Kept raw on purpose: higher-order functions (``F.filter`` with a
    lambda) are CodegenFallback in Spark, which would drop the whole
    validation Project out of whole-stage codegen. The hot path instead
    explodes the raw array and filters NULL rows — both codegen-friendly —
    and row-level violation counts come from :func:`n_violations_expr`.
    """
    if not compiled.checks:
        return F.array().cast(_EMPTY_ARR_TYPE)
    chunks = []
    for i in range(0, len(compiled.checks), _CHUNK):
        arr = F.array(*[_violation_struct(c)
                        for c in compiled.checks[i:i + _CHUNK]])
        chunks.append(arr)
    return chunks[0] if len(chunks) == 1 else F.concat(*chunks)


def n_violations_expr(compiled: CompiledRuleset) -> Column:
    """Per-row violation count as pure integer arithmetic (codegen-safe).

    Balanced-tree sum, not a left-deep chain: codegen recursion depth is
    log2(n_checks), so a 500-constraint ruleset cannot blow the executor
    thread stack (see ``plans.compiler.balanced_reduce``)."""
    if not compiled.checks:
        return F.lit(0)
    return balanced_reduce(
        lambda a, b: a + b,
        [F.coalesce(c.violated, F.lit(False)).cast("int")
         for c in compiled.checks])


def n_blocking_expr(compiled: CompiledRuleset,
                    fail_severities=("error",)) -> Column:
    """Per-row count of violations whose severity gates ingestion — the
    severity-aware sibling of :func:`n_violations_expr` (check severities
    are compile-time constants, so the non-blocking checks simply drop
    out of the sum; same balanced-tree codegen discipline)."""
    checks = [c for c in compiled.checks if c.severity in fail_severities]
    if not checks:
        return F.lit(0)
    return balanced_reduce(
        lambda a, b: a + b,
        [F.coalesce(c.violated, F.lit(False)).cast("int") for c in checks])


def violations_array(compiled: CompiledRuleset) -> Column:
    """ARRAY<STRUCT> of this row's violations (empty array == row passes).

    Uses an HOF compaction — fine for the user-facing ``annotated``
    surface, but the violations/verdicts hot paths avoid it (see
    :func:`_raw_violations_array`).
    """
    return F.filter(_raw_violations_array(compiled), lambda x: x.isNotNull())


@dataclass
class ValidationResult:
    violations: DataFrame   # exploded violation rows
    verdicts: DataFrame     # per-partition pass/fail aggregate
    annotated: DataFrame    # input + _violations array + passed flag
    compiled: CompiledRuleset


def validate(
    df: DataFrame,
    compiled: CompiledRuleset,
    *,
    row_id: str,
    partition_col: str | None = None,
    ruleset_id_value: str | None = None,
    applicability: Column | None = None,
    run_id: str = "run_0",
) -> ValidationResult:
    """Validate ``df`` against a compiled ruleset.

    ``applicability`` reproduces the reference's skip-guard: rows outside
    the predicate produce no violations at all, like Markdown files without
    frontmatter are skipped (``index.ts:352-356``).
    """
    ruleset_name = ruleset_id_value or compiled.name
    if applicability is not None:
        work = df.where(applicability)
    else:
        work = df
    work = stage_columns(work, compiled)

    all_errors = compiled.options.get("all_errors", True)
    nv = n_violations_expr(compiled)
    ann_arr = violations_array(compiled)
    if not all_errors:
        # the annotated surface honors the option too: one struct per row
        ann_arr = F.slice(ann_arr, 1, 1)
    annotated = work.withColumn("_violations", ann_arr) \
                    .withColumn("passed", nv == 0) \
                    .drop(*staged_names(compiled))

    part = (F.col(partition_col).cast("string") if partition_col
            else F.lit("all")).alias("partition_id")

    # Hot path stays inside whole-stage codegen end-to-end: pre-filter on
    # the arithmetic violation count (no HOF), explode the raw array (NULL
    # slots for passing checks), drop NULL rows after the Generate. Column
    # pruning discipline: only columns the ruleset touches are referenced.
    if all_errors:
        # reference default (allErrors:true, index.ts:312): every failing
        # keyword emits a row
        exploded = F.explode(_raw_violations_array(compiled)).alias("v")
    else:
        # Ajv's non-allErrors mode: first violation per row only. The HOF
        # compaction is acceptable here — it runs on violating rows only.
        exploded = F.explode(
            F.slice(violations_array(compiled), 1, 1)).alias("v")
    # The nv>0 prefilter skips array construction on passing rows — but
    # ONLY for unstaged rulesets: filter pushdown substitutes Project
    # aliases unconditionally (unlike CollapseProject), so with staged
    # variant views the whole interpreted expression would be inlined into
    # the scan's DataFilters — evaluated on the (possibly single-split)
    # scan task BEFORE any repartition, then re-evaluated above for the
    # explode. Without the prefilter the explode emits one NULL slot per
    # passing check and the post-Generate filter drops them — map-only,
    # parallel, each slot a staged-attribute reference.
    viol_src = work.where(nv > 0) if not compiled.staged else work
    violations = (
        viol_src
        .select(
            F.col(row_id).cast("string").alias("row_id"),
            part,
            F.lit(ruleset_name).alias("ruleset_id"),
            exploded,
        )
        .where(F.col("v").isNotNull())
        .select(
            "row_id", "partition_id", "ruleset_id",
            *[F.col(f"v.{f}").alias(f) for f in VIOLATION_FIELDS],
        )
    )

    # non-allErrors verdicts count at most one violation per row, matching
    # the single-element Ajv error array in that mode. The severity split
    # (the reference's vfile-reporter "N warnings, M errors" tally) always
    # counts every fired check: it is a data-quality measure, independent
    # of the all_errors REPORTING truncation. n_warnings counts ONLY
    # severity "warning" — x-severity also allows "info", which belongs
    # in n_violations but in neither bucket (vfile tallies infos apart).
    ne = n_blocking_expr(compiled, ("error",))
    nw = n_blocking_expr(compiled, ("warning",))
    verdicts = (
        work
        .select(part, (nv if all_errors else F.least(nv, F.lit(1)))
                .alias("_nv"),
                ne.alias("_ne"), nw.alias("_nw"))
        .groupBy("partition_id")
        .agg(
            F.lit(ruleset_name).alias("ruleset_id"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_nv").cast("long")).alias("n_violations"),
            F.sum((F.col("_nv") > 0).cast("long")).alias("n_failed_rows"),
            F.sum(F.col("_ne").cast("long")).alias("n_errors"),
            F.sum(F.col("_nw").cast("long")).alias("n_warnings"),
        )
        .withColumn("passed", F.col("n_failed_rows") == 0)
        .withColumn("run_id", F.lit(run_id))
    )

    return ValidationResult(violations=violations, verdicts=verdicts,
                            annotated=annotated, compiled=compiled)
