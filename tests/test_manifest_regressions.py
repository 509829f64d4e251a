"""Run-over-run metric regression detection on the lineage manifest: the
metrics history the resume layer already records becomes an anomaly source
(volume drops, violation-rate jumps, pass regressions), emitted in the
standard violations schema so manifest findings ride the same sinks."""

import time

from remark_lint_frontmatter_schema_spark.manifest import (
    Manifest, STATUS_SKIPPED, STATUS_VALIDATED, metric_regressions,
    regressions_to_violations)
from remark_lint_frontmatter_schema_spark.plans.compiler import compile_ruleset
from remark_lint_frontmatter_schema_spark.operators.validate import validate


def _manifest_with(entries):
    m = Manifest("/tmp/unused.manifest.json", {})
    t = time.time()
    for i, (snap, pid, rh, status, metrics) in enumerate(entries):
        m.record(snap, pid, rh, status, metrics)
        # record() stamps time.time(); force strictly increasing order
        m.entries[f"{snap}|{pid}|{rh}"]["completed_at"] = t + i
    return m


def test_row_count_drop_flagged_below_ratio():
    m = _manifest_with([
        ("s1", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 0, "passed": True}),
        ("s2", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 400, "n_violations": 0, "passed": True}),
        ("s1", "p2", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 0, "passed": True}),
        ("s2", "p2", "rh", STATUS_VALIDATED,
         {"n_rows": 600, "n_violations": 0, "passed": True}),
    ])
    got = metric_regressions(m)
    assert [(r["kind"], r["partition_id"]) for r in got] == \
        [("row_count_drop", "p1")]
    assert "1000 -> 400" in got[0]["message"]


def test_violation_rate_jump_and_pass_regression():
    m = _manifest_with([
        ("s1", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 10, "passed": True}),
        ("s2", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 150, "passed": False}),
    ])
    kinds = {r["kind"] for r in metric_regressions(m)}
    assert kinds == {"violation_rate_jump", "pass_regression"}
    # a small rate wiggle stays quiet
    m2 = _manifest_with([
        ("s1", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 10, "passed": False}),
        ("s2", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 50, "passed": False}),
    ])
    assert metric_regressions(m2) == []


def test_single_run_skipped_status_and_hash_scope():
    m = _manifest_with([
        ("s1", "p1", "rh_a", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 0, "passed": True}),
        # only one run for rh_a/p1 -> no baseline, never flagged
        ("s1", "p2", "rh_a", STATUS_SKIPPED, {"n_rows": 0}),
        ("s2", "p2", "rh_a", STATUS_SKIPPED, {"n_rows": 0}),
        # regression exists under rh_b only
        ("s1", "p3", "rh_b", STATUS_VALIDATED,
         {"n_rows": 100, "n_violations": 0, "passed": True}),
        ("s2", "p3", "rh_b", STATUS_VALIDATED,
         {"n_rows": 10, "n_violations": 0, "passed": True}),
    ])
    assert metric_regressions(m, ruleset_hash="rh_a") == []
    got = metric_regressions(m, ruleset_hash="rh_b")
    assert [r["kind"] for r in got] == ["row_count_drop"]
    # unscoped sees it too; skipped entries never form a history
    assert [r["partition_id"] for r in metric_regressions(m)] == ["p3"]


def test_latest_two_entries_compared_not_first_two():
    m = _manifest_with([
        ("s1", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 10, "n_violations": 0, "passed": True}),
        ("s2", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 0, "passed": True}),
        ("s3", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 900, "n_violations": 0, "passed": True}),
    ])
    # latest (900) vs previous (1000): no drop — the old 10-row run is
    # history, not the baseline
    assert metric_regressions(m) == []


def test_regressions_union_with_row_level_violations(spark):
    m = _manifest_with([
        ("s1", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 1000, "n_violations": 0, "passed": True}),
        ("s2", "p1", "rh", STATUS_VALIDATED,
         {"n_rows": 100, "n_violations": 90, "passed": False}),
    ])
    regs = metric_regressions(m)
    assert len(regs) == 3
    vdf = regressions_to_violations(spark, regs, "orders")
    df = spark.createDataFrame([("1", "X")], "id string, status string")
    compiled = compile_ruleset(
        {"properties": {"status": {"enum": ["A", "B"]}}}, df.schema,
        name="orders")
    row_level = validate(df, compiled, row_id="id").violations
    combined = row_level.unionByName(vdf)
    rows = combined.collect()
    assert len(rows) == 4
    manifest_rows = [r for r in rows if r.keyword == "x-manifest"]
    assert {r.constraint_id for r in manifest_rows} == {
        "orders:manifest:row_count_drop",
        "orders:manifest:violation_rate_jump",
        "orders:manifest:pass_regression"}
    assert all(r.row_id is None and r.severity == "warning"
               for r in manifest_rows)


# ---------------------------------------------------------------------------
# schema-evolution drift
# ---------------------------------------------------------------------------

def test_schema_drift_kinds(spark):
    from pyspark.sql import types as T
    from remark_lint_frontmatter_schema_spark.manifest import (
        schema_drift, schema_drift_violations)
    prev = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("gone", T.StringType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("inner", T.IntegerType(), True)]), True),
    ])
    cur = T.StructType([
        T.StructField("id", T.LongType(), True),          # loosened
        T.StructField("price", T.StringType(), True),     # retyped
        T.StructField("fresh", T.BooleanType(), True),    # added
        T.StructField("meta", T.StructType([
            T.StructField("inner", T.LongType(), True)]), True),  # nested
    ])
    diffs = schema_drift(prev, cur)
    kinds = {(d["kind"], d["column"]) for d in diffs}
    assert kinds == {
        ("nullability_loosened", "id"),
        ("type_changed", "price"),
        ("column_removed", "gone"),
        ("column_added", "fresh"),
        ("type_changed", "meta.inner"),
    }
    # json round-trip form (what the manifest stores) gives the same diff
    assert schema_drift(prev.json(), cur.json()) == diffs
    # identical schemas -> clean
    assert schema_drift(cur, cur) == []
    v = {r.constraint_id: r for r in
         schema_drift_violations(spark, diffs, "orders").collect()}
    assert v["orders:schema:column_added"].severity == "info"
    assert v["orders:schema:type_changed"].severity == "warning"
    assert v["orders:schema:type_changed"].keyword == "x-schema"
    assert v["orders:schema:column_removed"].row_id is None


def test_run_with_resume_records_schema_lineage(spark, tmp_path):
    """run_with_resume stores the table schema in the manifest and
    reports drift against the previous run's recording."""
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.manifest import (
        Manifest, metric_regressions, run_with_resume)
    table = str(tmp_path / "t")
    mf = str(tmp_path / "m.json")
    df = spark.createDataFrame([(1, "a", 5), (2, "b", 6)],
                               "id long, part string, v long")
    df.write.partitionBy("part").parquet(table)
    rs = {"type": "object", "properties": {"v": {"minimum": 0}}}
    compiled = compile_ruleset(rs, spark.read.parquet(table).schema)
    out1 = run_with_resume(spark, table, partition_col="part",
                           compiled=compiled, row_id="id",
                           manifest_path=mf, per_partition_snapshots=True)
    assert out1["schema_drift"] == []          # first run: nothing prior
    m = Manifest.load(mf)
    assert "__schema__" in m.entries
    # rewrite the table with a retyped column + per-partition layout
    df2 = df.withColumn("v", F.col("v").cast("string"))
    df2.write.mode("overwrite").partitionBy("part").parquet(table)
    compiled2 = compile_ruleset(rs, spark.read.parquet(table).schema)
    out2 = run_with_resume(spark, table, partition_col="part",
                           compiled=compiled2, row_id="id",
                           manifest_path=mf, per_partition_snapshots=True)
    kinds = {(d["kind"], d["column"]) for d in out2["schema_drift"]}
    assert ("type_changed", "v") in kinds
    # the reserved schema entry never breaks the metric-regression walk
    assert isinstance(metric_regressions(Manifest.load(mf)), list)
