"""Grouped (`by:`) forms of x-benford and x-skew (round 5): per-group
gates whose per-group numbers must equal the global operator run on
each group's slice, plus DSL plumbing and fail-closed semantics."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.operators.dedup import release_all
from remark_lint_frontmatter_schema_spark.operators.drift import (
    benford_violations)
from remark_lint_frontmatter_schema_spark.operators.skew import (
    skew_profile, skew_profile_by, skew_violations)
from remark_lint_frontmatter_schema_spark.operators.table_checks import (
    table_check_violations)


@pytest.fixture(scope="module")
def seg(spark):
    # region A: Benford-ish magnitudes (1/x-distributed); region B:
    # uniform 5xx values (MAD blows past any threshold); region C: all
    # zero (no first digit -> fail closed); NULL region: a few rows.
    rows = []
    for i in range(1, 300):
        rows.append(("A", float(10 ** (i / 100.0)), f"k{i % 50}"))
    for i in range(200):
        rows.append(("B", 500.0 + i % 10, "hot" if i % 4 else f"k{i}"))
    for i in range(20):
        rows.append(("C", 0.0, f"k{i}"))
    for i in range(10):
        rows.append((None, 100.0 + i, "nkey"))
    return spark.createDataFrame(rows, "region string, v double, k string")


def _one_group_mad(spark, seg, region):
    sl = seg.where(F.col("region").eqNullSafe(F.lit(region))) \
        if region is not None else seg.where(F.col("region").isNull())
    rows = benford_violations(sl, "v", max_mad=1e-9).collect()
    return rows[0].actual if rows else None


def test_grouped_benford_matches_per_slice_global(spark, seg):
    got = {r.row_id: r.actual
           for r in benford_violations(seg, "v", max_mad=1e-9,
                                       by="region").collect()}
    # threshold ~0 -> every measurable group violates; C and <null>
    # appear too (C fails closed with NULL mad -> actual None)
    assert set(got) == {"A", "B", "C", "<null>"}
    for region in ("A", "B", None):
        want = _one_group_mad(spark, seg, region)
        assert got[region if region else "<null>"] == want, region
    assert got["C"] is None  # no measurable digits -> fail closed


def test_grouped_benford_fires_selectively(spark, seg):
    rows = benford_violations(seg, "v", max_mad=0.02,
                              by="region").collect()
    ids = sorted(r.row_id for r in rows)
    # A conforms (log-uniform ~ Benford); B is uniform-5xx (all 5s);
    # C fails closed; the NULL group's 10 values 100..109 are all 1s
    assert ids == ["<null>", "B", "C"]
    assert all(r.constraint_id == "benford:v:by=region" for r in rows)
    assert all(r.keyword == "x-benford" for r in rows)


def test_grouped_skew_profile_matches_per_slice(spark, seg):
    prof = {r.grp: r for r in skew_profile_by(seg, "k", "region",
                                              top_k=3).collect()}
    assert set(prof) == {"A", "B", "C", None}
    for region in ("A", "B", "C"):
        want = skew_profile(
            seg.where(F.col("region") == region), "k", top_k=3
        ).collect()[0]
        got = prof[region]
        for f in ("n_rows", "n_keys", "max_count", "avg_count",
                  "max_share", "top_k_share", "entropy_norm",
                  "skew_ratio", "recommended_salts"):
            assert got[f] == want[f], (region, f)


def test_grouped_skew_gate_fires_per_group(spark, seg):
    rows = skew_violations(seg, "k", max_share=0.5, by="region").collect()
    # B: 'hot' holds 150/200 = 0.75; the NULL group: 'nkey' holds 1.0;
    # A (max 6/299) and C (uniform) pass
    ids = sorted(r.row_id for r in rows)
    assert ids == ["<null>", "B"]
    assert all(r.constraint_id == "skew:k:by=region" for r in rows)
    b = [r for r in rows if r.row_id == "B"][0]
    assert b.actual == "0.75"


def test_grouped_skew_empty_group_emits_nothing(spark):
    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("B", None)], "g string, k string")
    rows = skew_violations(df, "k", max_share=0.9, by="g").collect()
    # B has no non-NULL keys -> nothing to lint (global-form policy)
    assert sorted(r.row_id for r in rows) == ["A"]


def test_dsl_by_forms_route_and_stay_unfused(spark, seg):
    rs = {"properties": {
        "v": {"x-benford": {"max_mad": 0.02, "by": "region"}},
        "k": {"x-skew": {"max_share": 0.5, "by": "region"},
              "x-unique": True}}}
    compiled = compile_ruleset(rs, seg.schema, name="grp")
    kinds = sorted((k, p.get("by")) for k, _, p in compiled.table_checks)
    assert kinds == [("benford", "region"), ("skew", "region"),
                     ("unique", None)]
    got = table_check_violations(seg, compiled, row_id="k")
    try:
        by_kw = {}
        for r in got.collect():
            by_kw.setdefault(r.keyword, set()).add(r.row_id)
        assert by_kw["x-benford"] == {"<null>", "B", "C"}
        assert by_kw["x-skew"] == {"<null>", "B"}
        assert "unique" in by_kw
    finally:
        release_all()


def test_dsl_rejects_bad_by(spark, seg):
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    for rs in ({"properties": {
                    "v": {"x-benford": {"max_mad": 0.02, "by": 7}}}},
               {"properties": {
                    "k": {"x-skew": {"max_share": 0.5, "by": []}}}}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset(rs, seg.schema, name="bad")


def test_grouped_drift_localizes_to_moved_segment(spark):
    """x-drift `by:`: only the segment whose distribution moved fires;
    a group missing a declared side fails closed with its own
    drift-config row; per-group ks/psi equal the global operator run
    on that group's slice."""
    from remark_lint_frontmatter_schema_spark.operators.drift import (
        drift_violations)
    rows = []
    for g, shift in (("stable", 0.0), ("moved", 4.0)):
        for i in range(300):
            rows.append((f"{g}{i}", g, "ref", float(i % 10)))
            rows.append((f"{g}x{i}", g, "cur", float(i % 10) + shift))
    rows += [(f"one{i}", "oneside", "ref", float(i % 10))
             for i in range(50)]
    df = spark.createDataFrame(
        rows, "rid string, seg string, side string, v double")
    kw = dict(partition_col="side", side_a="ref", side_b="cur",
              lo=0.0, hi=14.0, n_buckets=14, ks_threshold=0.1,
              psi_threshold=0.2)
    got = {r.row_id: r for r in drift_violations(
        df, "v", by="seg", ruleset_name="g", **kw).collect()}
    assert set(got) == {"moved", "oneside"}
    assert got["moved"].keyword == "drift"
    assert got["oneside"].keyword == "drift-config"
    assert got["moved"].constraint_id == "drift:v:by=seg"
    # per-slice parity: the group's ks/psi string equals the global
    # operator on that group's slice
    sl = drift_violations(df.where(F.col("seg") == "moved"), "v",
                          ruleset_name="g", **kw).collect()
    assert got["moved"].actual == sl[0].actual


def test_grouped_drift_rejects_global_only_stats(spark):
    from remark_lint_frontmatter_schema_spark.operators.drift import (
        drift_violations)
    df = spark.createDataFrame([("a", "g", "ref", 1.0)],
                               "rid string, seg string, side string, "
                               "v double")
    with pytest.raises(ValueError, match="ks/psi only"):
        drift_violations(df, "v", partition_col="side", side_a="ref",
                         side_b="cur", lo=0.0, hi=10.0, by="seg",
                         emd_threshold=0.5)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"v": {"x-drift": {
            "partition_col": "side", "side_a": "ref", "side_b": "cur",
            "lo": 0.0, "hi": 10.0, "by": "seg",
            "jsd_threshold": 0.1}}}}, df.schema, name="bad")


def test_grouped_drift_via_dsl_shares_scan(spark):
    """A grouped x-drift declaration routes through the DSL and reads
    the shared narrow cache alongside another gate."""
    from remark_lint_frontmatter_schema_spark.operators.drift import (
        drift_violations)
    rows = [(f"r{i}", "s%d" % (i % 2), "ref" if i % 2 else "cur",
             float(i % 10), f"k{i % 20}") for i in range(200)]
    df = spark.createDataFrame(
        rows, "rid string, seg string, side string, v double, k string")
    rs = {"properties": {
        "k": {"x-unique": True},
        "v": {"x-drift": {"partition_col": "side", "side_a": "ref",
                          "side_b": "cur", "lo": 0.0, "hi": 10.0,
                          "by": "seg"}}}}
    compiled = compile_ruleset(rs, df.schema, name="gd")
    kinds = {(k, p.get("by")) for k, _, p in compiled.table_checks}
    assert ("drift", "seg") in kinds
    got = table_check_violations(df, compiled, row_id="rid")
    try:
        want = drift_violations(
            df, "v", partition_col="side", side_a="ref", side_b="cur",
            lo=0.0, hi=10.0, by="seg", ruleset_name="gd")
        got_d = sorted(tuple(r) for r in got.collect()
                       if r.keyword.startswith("drift"))
        want_d = sorted(tuple(r) for r in want.collect())
        assert got_d == want_d
        # each seg holds ONLY ref or ONLY cur -> both fail closed
        assert {r[0] for r in got_d} == {"s0", "s1"}
    finally:
        release_all()
