"""Robust outlier detection (operators/outliers.py): median/MAD modified
z-score, its x-outlier DSL binding, and the degenerate-MAD fallback."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.operators import outliers
from remark_lint_frontmatter_schema_spark.operators.table_checks import (
    validate_with_table_checks)
from remark_lint_frontmatter_schema_spark.plans.compiler import (
    RulesetCompileError)


def _df(spark, values):
    return spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(values)], "id string, x double")


def test_scores_match_numpy_reference(spark):
    vals = [9.0, 10.0, 10.5, 11.0, 10.2, 9.8, 10.1, 9.9, 500.0, 10.3]
    got = {r.row_id: r.z for r in outliers.outlier_scores(
        _df(spark, vals), "x", row_id="id").collect()}
    arr = np.array(vals)
    med = np.median(arr)
    mad = np.median(np.abs(arr - med))
    z = 0.6745 * np.abs(arr - med) / mad
    want = {str(i): z[i] for i in np.nonzero(z > 3.5)[0]}
    assert set(got) == set(want) == {"8"}
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-6)


def test_mad_zero_flags_exactly_non_median_values(spark):
    # constant column with one deviant: MAD = 0, z degenerates — the
    # documented fallback flags exactly the values != median, NULL z
    vals = [5.0] * 9 + [6.0]
    rows = outliers.outlier_scores(_df(spark, vals), "x", row_id="id") \
        .collect()
    assert {r.row_id for r in rows} == {"9"}
    assert rows[0].z is None


def test_nulls_are_skipped_not_flagged(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("b", None), ("c", 10.1), ("d", 9.9), ("e", 99.0)],
        "id string, x double")
    ids = {r.row_id for r in
           outliers.outlier_scores(df, "x", row_id="id").collect()}
    assert "b" not in ids and ids == {"e"}


def test_approx_mode_agrees_on_clear_outlier(spark):
    vals = [10.0 + 0.01 * i for i in range(50)] + [1e6]
    exact = {r.row_id for r in outliers.outlier_scores(
        _df(spark, vals), "x", row_id="id").collect()}
    approx = {r.row_id for r in outliers.outlier_scores(
        _df(spark, vals), "x", row_id="id", approx=True).collect()}
    assert "50" in exact and "50" in approx


def test_x_outlier_dsl_end_to_end(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("b", 10.2), ("c", 9.8), ("d", 10.1),
         ("e", 9.9), ("f", 10.3), ("g", 777.0)],
        "id string, x double")
    ruleset = {"type": "object", "properties": {
        "x": {"type": "number", "x-outlier": {"id": "id", "k": 3.5}}}}
    compiled = compile_ruleset(ruleset, df.schema)
    assert ("outlier", "x", {"id": "id", "k": 3.5, "by": None,
                             "approx": False, "severity": "warning"}) \
        in [(k, c, p) for k, c, p in compiled.table_checks]
    res = validate_with_table_checks(df, compiled, row_id="id")
    v = res.table_violations.collect()
    assert len(v) == 1 and v[0].row_id == "g"
    assert v[0].keyword == "outlier"
    assert v[0].constraint_id == "outlier:x"
    assert v[0].schema_path == "#/x-outlier/x"
    assert "Robust outlier on `x`" in v[0].message
    assert v[0].actual == "777.0"
    # unions with row-level violations
    assert res.violations.count() == 1


def test_grouped_scores_use_per_group_stats(spark):
    # 20.0 is a global inlier (group B's range) but a gross outlier
    # within group A; grouped stats must flag it, global must not
    rows = ([("a%d" % i, "A", 1.0 + 0.01 * i) for i in range(8)]
            + [("ax", "A", 20.0)]
            + [("b%d" % i, "B", 20.0 + 0.01 * i) for i in range(8)])
    df = spark.createDataFrame(rows, "id string, grp string, x double")
    grouped = {r.row_id for r in outliers.outlier_scores(
        df, "x", row_id="id", group_col="grp").collect()}
    global_ = {r.row_id for r in outliers.outlier_scores(
        df, "x", row_id="id").collect()}
    assert "ax" in grouped
    assert "ax" not in global_
    # NULL group rows are skipped, not crashed on
    with_null = df.union(spark.createDataFrame(
        [("n1", None, 999.0)], df.schema))
    got = {r.row_id for r in outliers.outlier_scores(
        with_null, "x", row_id="id", group_col="grp").collect()}
    assert "n1" not in got


def test_grouped_dsl_carries_group_as_partition_id(spark):
    rows = ([("a%d" % i, "A", 1.0 + 0.01 * i) for i in range(8)]
            + [("ax", "A", 20.0)]
            + [("b%d" % i, "B", 20.0 + 0.01 * i) for i in range(8)])
    df = spark.createDataFrame(rows, "id string, grp string, x double")
    compiled = compile_ruleset({"properties": {
        "x": {"x-outlier": {"id": "id", "by": "grp"}}}}, df.schema)
    v = validate_with_table_checks(df, compiled, row_id="id") \
        .table_violations.collect()
    assert [(r.row_id, r.partition_id) for r in v] == [("ax", "A")]


def test_id_defaults_to_caller_row_id_and_null_k_to_default(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("b", 10.2), ("c", 9.8), ("d", 10.1),
         ("e", 9.9), ("f", 10.3), ("g", 777.0)],
        "id string, x double")
    # id omitted and k explicitly null (YAML `k:`) -> caller row_id, k=3.5
    compiled = compile_ruleset({"properties": {
        "x": {"x-outlier": {"k": None}}}}, df.schema)
    assert compiled.table_checks[0][2]["k"] == 3.5
    v = validate_with_table_checks(df, compiled, row_id="id") \
        .table_violations.collect()
    assert [r.row_id for r in v] == ["g"]


def test_non_numeric_x_outlier_falls_to_unknown(spark):
    df = spark.createDataFrame([("a", "en")], "id string, lang string")
    compiled = compile_ruleset({"properties": {
        "lang": {"x-outlier": {"id": "id"}}}}, df.schema)
    assert not compiled.table_checks
    assert ("/lang", "x-outlier") in compiled.unknown


def test_nested_x_outlier_surfaces_as_unknown(spark):
    df = spark.createDataFrame([("a", (1.0,))],
                               "id string, s struct<y double>")
    ruleset = {"type": "object", "properties": {
        "s": {"properties": {
            "y": {"x-outlier": {"id": "id"}}}}}}
    compiled = compile_ruleset(ruleset, df.schema)
    assert not compiled.table_checks
    assert ("/s/y", "x-outlier") in compiled.unknown


def test_malformed_x_outlier_fails_compile(spark):
    df = _df(spark, [1.0])
    for bad in ({"id": 7},                     # non-string id
                {"id": "id", "k": -1},         # non-positive k
                {"id": "id", "k": True},       # bool masquerading as num
                {"id": "id", "approx": "yes"}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"properties": {"x": {"x-outlier": bad}}},
                            df.schema)


def test_stats_plan_prunes_to_value_column(spark, tmp_path):
    # pruning is only observable on a file source (LocalTableScan keeps
    # every attribute) — assert the parquet ReadSchema omits the payload
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("a", 1.0, "payload")], "id string, x double, big string") \
        .write.parquet(p)
    df = spark.read.parquet(p)
    plan = outliers.robust_stats(df, "x")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "big" not in plan


def test_nan_cannot_poison_threshold(spark):
    from remark_lint_frontmatter_schema_spark.operators.outliers import (
        outlier_violations,
    )
    # majority-NaN column: med/MAD estimated from the finite mass, so
    # the finite inliers stay quiet and NaN/Inf rows flag themselves
    rows = ([(i, 10.0 + (i % 3)) for i in range(10)]
            + [(100 + i, float("nan")) for i in range(12)]
            + [(200, float("inf")), (300, 9999.0)])
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["row_id"] for r in
           outlier_violations(df, "v", row_id="id", k=3.5).collect()}
    assert "300" in got                      # the genuine outlier
    assert {"200"} | {str(100 + i) for i in range(12)} <= got  # nonfinite
    assert not any(r in got for r in map(str, range(10)))      # inliers


def test_volume_anomalies_spike_and_flood(spark):
    """volume_anomalies: a flooded hour and a thin hour both flag; steady
    hours don't; MAD==0 falls back to any-differs; NULL ts absent."""
    from datetime import datetime
    from remark_lint_frontmatter_schema_spark.operators.outliers import (
        volume_anomalies)
    import pytest as _p
    rows = []
    for h in range(12):
        n = 100
        if h == 4:
            n = 500                            # flood
        elif h == 9:
            n = 5                              # thin
        elif h % 2:
            n = 102                            # mild jitter
        rows += [(datetime(2024, 3, 1, h), )] * n
    rows.append((None,))
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r.bucket: r for r in
           volume_anomalies(df, "ts", unit="hour", k=3.5).collect()}
    assert {b[11:13] for b in got} == {"04", "09"}
    assert got["2024-03-01 04:00:00"].value == 500.0
    assert got["2024-03-01 04:00:00"].z > 3.5
    # MAD == 0: all-identical buckets flag only the differing one
    flat = [(datetime(2024, 3, 2, h),) for h in range(6) for _ in range(10)]
    flat += [(datetime(2024, 3, 2, 6),)] * 11
    df2 = spark.createDataFrame(flat, "ts timestamp")
    got2 = volume_anomalies(df2, "ts", unit="hour").collect()
    assert [r.bucket[11:13] for r in got2] == ["06"]
    with _p.raises(ValueError, match="unit"):
        volume_anomalies(df, "ts", unit="fortnight")


def test_x_volume_declarative(spark):
    """x-volume compiles to a table check and flags the flooded hour;
    nested placement lands in unknown; bad unit fails compile."""
    from datetime import datetime
    import pytest as _p
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    rows = []
    for h in range(10):
        n = 400 if h == 3 else (100 + (h % 2) * 2)
        rows += [(f"r{h}_{i}", datetime(2024, 4, 1, h))
                 for i in range(n)]
    df = spark.createDataFrame(rows, "rid string, ts timestamp")
    rs = {"properties": {"ts": {"x-volume": {"unit": "hour", "k": 3.5}}}}
    compiled = compile_ruleset(rs, df.schema, name="vol")
    got = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert len(got) == 1 and got[0].keyword == "x-volume"
    assert got[0].row_id == "2024-04-01 03:00:00"
    assert "bucket has 400 rows" in got[0].message
    with _p.raises(RulesetCompileError):
        compile_ruleset({"properties": {"ts": {
            "x-volume": {"unit": "era"}}}}, df.schema, name="volbad")


def test_x_volume_null_k_falls_back(spark):
    """Explicit `k: null` passes shape validation and must fall back to
    the default, not crash float(None) at compile."""
    from datetime import datetime
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    df = spark.createDataFrame([("r", datetime(2024, 1, 1))],
                               "rid string, ts timestamp")
    compiled = compile_ruleset(
        {"properties": {"ts": {"x-volume": {"unit": "hour", "k": None}}}},
        df.schema, name="volnull")
    ((kind, col, params),) = compiled.table_checks
    assert kind == "volume" and params["k"] == 3.5


def test_x_volume_grouped(spark):
    """`by:` form — a type that floods while the rest stay steady fires
    against ITS OWN median/MAD; the global form over the same rows sees
    the sum and can miss it. Group value rides as partition_id."""
    from datetime import datetime
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.outliers import (
        volume_violations)
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    rows = []
    for d in range(1, 15):
        for t, n in (("a", 50), ("b", 50)):
            # day 7: type a floods to 150 while type b thins to 10 —
            # the SUM stays 160 vs the usual 100 (mild), but per group
            # both are gross outliers
            if d == 7:
                n = 150 if t == "a" else 10
            rows += [(f"{t}{d}_{i}", t, datetime(2024, 5, d))
                     for i in range(n)]
    df = spark.createDataFrame(rows, "rid string, typ string, ts timestamp")
    got = volume_violations(df, "ts", unit="day", k=3.5,
                            by="typ").collect()
    assert {(r.partition_id, r.actual) for r in got} \
        == {("a", "150"), ("b", "10")}
    assert all(r.row_id == "2024-05-07 00:00:00" for r in got)
    assert all(r.constraint_id == "volume:ts:by=typ" for r in got)
    # DSL wiring
    compiled = compile_ruleset(
        {"properties": {"ts": {"x-volume": {"unit": "day", "by": "typ"}}}},
        df.schema, name="volby")
    ((kind, col, params),) = compiled.table_checks
    assert kind == "volume" and params["by"] == "typ"
    out = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert {(r.partition_id, r.actual) for r in out} \
        == {("a", "150"), ("b", "10")}
