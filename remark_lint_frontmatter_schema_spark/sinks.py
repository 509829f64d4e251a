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


def render_report(violations: DataFrame, *, max_rows: int = 50) -> str:
    """vfile-reporter-style console report: sorted, with summary count.

    Only ever renders a LIMITed sample — the full relation stays
    distributed; the summary count is an aggregate, not a collect.
    """
    n_total = violations.count()
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
        lines.append(f"  {loc:24s} warning  {r.message}")
    shown = len(rows)
    lines.append("")
    suffix = "" if shown == n_total else f" (showing first {shown})"
    lines.append(f"⚠ {n_total} warning{'s' if n_total != 1 else ''}{suffix}")
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
