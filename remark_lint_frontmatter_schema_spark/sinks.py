"""Violation + report sinks (SURVEY.md §2.1 S6/S7).

S6: violations append to a partitioned table — the scale analog of
``vFile.message(...)`` accumulating on the file (index.ts:126,186).
S7: a human report mirroring vfile-reporter's rendering: per-unit messages
ordered by position with a trailing warning summary (README.md:444-454) —
position ordering becomes (row_id, instance_path) ordering, file name
becomes partition/clip provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_violations(violations: DataFrame, path: str, *,
                     run_id: str = "run_0") -> None:
    (violations.withColumn("run_id", F.lit(run_id))
     .write.mode("append").partitionBy("run_id").parquet(path))


def write_verdicts(verdicts: DataFrame, path: str) -> None:
    verdicts.write.mode("append").parquet(path)


def write_split(df: DataFrame, compiled, *, path: str,
                run_id: str | None = None,
                fail_severities=("error",),
                count: bool = True) -> dict | None:
    """Ingestion split: ONE scan, ONE write — every row lands under
    ``{path}/run_id=…/accepted=true|false``, routed by a severity-aware
    gate (a row is accepted when it has no violation at a severity in
    ``fail_severities``; warnings-only rows pass an ``("error",)`` gate).
    Quarantined rows keep their full ``_violations`` array, so the
    quarantine partition is self-describing — no join back to a
    violations table to learn why a row was held.

    Scale shape: the gate is the same one-projection constraint eval as
    ``validate`` (``n_blocking_expr`` — compile-time-constant severities,
    balanced-tree codegen) feeding ``partitionBy``, so clean corpus and
    quarantine are partitions of a single write job: the input is read
    once, nothing is shuffled, and downstream readers partition-prune to
    the side they want. The ``_violations`` compaction is an HOF (drops
    the projection out of whole-stage codegen — ``array_compact``
    desugars to the same lambda filter, verified): the accepted price of
    a self-describing quarantine on an IO-bound writer stage; gate-only
    callers who don't need the arrays should write ``accepted`` from the
    codegen-clean ``n_blocking_expr`` alone. Row-level checks only —
    table-level declarations (x-unique/x-ref/…) are relational passes
    with no per-row residue; run them via ``validate_with_table_checks``
    and gate on verdicts.

    ``run_id`` defaults to a fresh unique id per call — the read-back
    counts and downstream run_id-filtered readers then see exactly this
    invocation's rows even though the write is append-mode (a crashed or
    repeated run's rows sit under a run_id nobody references). Pass an
    explicit run_id only to deliberately merge invocations under one id
    (streaming replays do: same batch_N on re-delivery).

    Returns per-side row counts (a parquet-footer count over the
    just-written output — metadata, not a data rescan), plus the
    ``run_id`` used. ``count=False`` skips the read-back entirely and
    returns ``{"run_id": ...}`` — the right mode for per-micro-batch
    callers, where re-listing an ever-growing output tree every trigger
    is a monotonic latency leak. Note ``accepted`` comes back as a
    partition column whose type ('true'/'false' string vs boolean)
    follows ``spark.sql.sources.partitionColumnTypeInference``; the
    returned counts normalize either way."""
    import uuid

    from .operators.validate import (n_blocking_expr, stage_columns,
                                     staged_names, violations_array)

    if run_id is None:
        run_id = f"run_{uuid.uuid4().hex[:12]}"
    annotated = (stage_columns(df, compiled)
                 .withColumn("_violations", violations_array(compiled))
                 .withColumn("accepted",
                             n_blocking_expr(compiled, fail_severities)
                             == 0)
                 .drop(*staged_names(compiled))
                 .withColumn("run_id", F.lit(run_id)))
    (annotated.write.mode("append")
     .partitionBy("run_id", "accepted").parquet(path))
    if not count:
        return {"run_id": run_id}
    spark = df.sparkSession
    counts = {str(r.accepted).lower(): r.n for r in
              (spark.read.parquet(path)
               .where(F.col("run_id") == run_id)
               .groupBy("accepted")
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    return {"accepted": counts.get("true", 0),
            "quarantined": counts.get("false", 0),
            "run_id": run_id}


def render_report(violations: DataFrame, *, max_rows: int = 50) -> str:
    """vfile-reporter-style console report: sorted, with summary count.

    Only ever renders a LIMITed sample — the full relation stays
    distributed; the summary count is an aggregate, not a collect.
    """
    tallies = violations.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("severity") == "error").cast("long")).alias("ne"),
        F.sum((F.col("severity") == "warning").cast("long")).alias("nw"),
    ).collect()[0]
    n_total = tallies.n or 0
    n_err = int(tallies.ne or 0)
    n_warn = int(tallies.nw or 0)  # info rows count in n_total only
    rows = (violations
            .orderBy("partition_id", "row_id", "instance_path",
                     "constraint_id")
            .limit(max_rows)
            .collect())
    lines = []
    current = None
    for r in rows:
        unit = f"{r.partition_id}/{r.row_id}"
        if unit != current:
            lines.append(unit)
            current = unit
        loc = r.instance_path or "/"
        lines.append(f"  {loc:24s} {r.severity:7s}  {r.message}")
    shown = len(rows)
    lines.append("")
    suffix = "" if shown == n_total else f" (showing first {shown})"

    def _plural(n, word):
        return f"{n} {word}{'s' if n != 1 else ''}"

    # vfile-reporter summary: warnings-only keeps the ⚠ banner; any
    # error escalates to "✖ N problems (X errors, Y warnings)"
    if n_err:
        lines.append(f"✖ {_plural(n_total, 'problem')} "
                     f"({_plural(n_err, 'error')}, "
                     f"{_plural(n_warn, 'warning')}){suffix}")
    else:
        lines.append(f"⚠ {_plural(n_total, 'warning')}{suffix}")
    return "\n".join(lines)


def worst_partitions(verdicts: DataFrame, k: int = 10) -> DataFrame:
    """Top-k worst partitions by violation rate (SURVEY.md W2)."""
    from pyspark.sql import Window
    rate = (F.col("n_violations") / F.greatest(F.col("n_rows"), F.lit(1)))
    return (verdicts
            .withColumn("violation_rate", F.round(rate, 6))
            .withColumn("rnk", F.dense_rank().over(
                Window.orderBy(F.desc("violation_rate"))))
            .where(F.col("rnk") <= k))
