"""Monotonicity validation (operators/sequence.py): adjacent-pair ordering
over an order key, grouped windows vs the bucketed global path, NULL
semantics, and the x-monotonic DSL binding."""

import random

import pytest

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.operators.sequence import (
    monotonic_violations)
from remark_lint_frontmatter_schema_spark.operators.table_checks import (
    validate_with_table_checks)
from remark_lint_frontmatter_schema_spark.plans.compiler import (
    RulesetCompileError)

_OK_PY = {
    "non-decreasing": lambda cur, prev: cur >= prev,
    "increasing": lambda cur, prev: cur > prev,
    "non-increasing": lambda cur, prev: cur <= prev,
    "decreasing": lambda cur, prev: cur < prev,
}


def _oracle(rows, direction="non-decreasing"):
    """Pure-python single-order reference: rows = [(id, val, ord)],
    NULL val/ord rows absent from the sequence; returns later-row ids of
    failing adjacent pairs."""
    seq = sorted((r for r in rows if r[1] is not None and r[2] is not None),
                 key=lambda r: r[2])
    ok = _OK_PY[direction]
    return {cur[0] for prev, cur in zip(seq, seq[1:])
            if not ok(cur[1], prev[1])}


def test_grouped_violations_attributed_to_later_row(spark):
    rows = [  # (id, val, ord, grp)
        ("a1", 1.0, 1, "A"), ("a2", 2.0, 2, "A"), ("a3", 1.5, 3, "A"),
        ("b1", 5.0, 1, "B"), ("b2", 5.0, 2, "B"), ("b3", 7.0, 3, "B"),
    ]
    df = spark.createDataFrame(
        rows, "id string, x double, seq int, grp string")
    v = monotonic_violations(df, "x", order_by="seq", row_id="id",
                             by="grp").collect()
    assert {r.row_id for r in v} == {"a3"}
    assert v[0].actual == "2.0 -> 1.5"
    assert v[0].constraint_id == "monotonic:x"
    assert v[0].keyword == "x-monotonic"
    assert v[0].schema_path == "#/x-monotonic/x"
    assert "within 'grp'" in v[0].message


@pytest.mark.parametrize("n_buckets", [1, 3, 8])
def test_global_bucketed_path_matches_single_order_oracle(spark, n_buckets):
    rng = random.Random(7)
    rows = [(f"r{i}", float(rng.randrange(100)), i) for i in range(80)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id string, x double, seq int") \
        .repartition(5)
    got = {r.row_id for r in monotonic_violations(
        df, "x", order_by="seq", row_id="id",
        n_buckets=n_buckets).collect()}
    assert got == _oracle(rows)


@pytest.mark.parametrize("direction", list(_OK_PY))
def test_directions(spark, direction):
    rows = [("r1", 1.0, 1), ("r2", 1.0, 2), ("r3", 3.0, 3), ("r4", 2.0, 4)]
    df = spark.createDataFrame(rows, "id string, x double, seq int")
    got = {r.row_id for r in monotonic_violations(
        df, "x", order_by="seq", row_id="id", direction=direction,
        n_buckets=2).collect()}
    assert got == _oracle(rows, direction)


def test_null_rows_absent_pairs_bridge_across(spark):
    # NULL x at seq=2: (1,3) become adjacent — 3's value 0.5 < 1.0 fires,
    # and the NULL row itself is never a violation
    rows = [("r1", 1.0, 1), ("rn", None, 2), ("r3", 0.5, 3),
            ("ro", 9.9, None)]  # NULL order key also absent
    df = spark.createDataFrame(rows, "id string, x double, seq int")
    got = {r.row_id for r in monotonic_violations(
        df, "x", order_by="seq", row_id="id", n_buckets=2).collect()}
    assert got == {"r3"} == _oracle(rows)


def test_invalid_direction_refused(spark):
    df = spark.createDataFrame([("a", 1.0, 1)],
                               "id string, x double, seq int")
    with pytest.raises(ValueError, match="direction"):
        monotonic_violations(df, "x", order_by="seq", row_id="id",
                             direction="sideways")


def test_x_monotonic_dsl_end_to_end(spark):
    rows = [("a1", 1.0, 1, "A"), ("a2", 0.5, 2, "A"),
            ("b1", 2.0, 1, "B"), ("b2", 3.0, 2, "B")]
    df = spark.createDataFrame(
        rows, "id string, x double, seq int, grp string")
    ruleset = {"type": "object", "properties": {
        "x": {"type": "number",
              "x-monotonic": {"order_by": "seq", "by": "grp"}}}}
    compiled = compile_ruleset(ruleset, df.schema)
    assert [(k, c) for k, c, _ in compiled.table_checks] \
        == [("monotonic", "x")]
    assert compiled.table_checks[0][2]["direction"] == "non-decreasing"
    res = validate_with_table_checks(df, compiled, row_id="id")
    v = res.table_violations.collect()
    assert [(r.row_id, r.keyword) for r in v] == [("a2", "x-monotonic")]
    # unions cleanly with the row-level relation
    assert res.violations.count() == 1


def test_dsl_defaults_and_explicit_nulls(spark):
    df = spark.createDataFrame([("a", 1.0, 1)],
                               "id string, x double, seq int")
    compiled = compile_ruleset({"properties": {
        "x": {"x-monotonic": {"order_by": "seq", "direction": None,
                              "n_buckets": None}}}}, df.schema)
    p = compiled.table_checks[0][2]
    assert p["direction"] == "non-decreasing" and p["n_buckets"] == 64
    assert p["by"] is None and p["id"] is None


def test_nested_x_monotonic_surfaces_as_unknown(spark):
    df = spark.createDataFrame([("a", (1.0,))],
                               "id string, s struct<y double>")
    compiled = compile_ruleset({"properties": {
        "s": {"properties": {
            "y": {"x-monotonic": {"order_by": "seq"}}}}}}, df.schema)
    assert not compiled.table_checks
    assert ("/s/y", "x-monotonic") in compiled.unknown


def test_malformed_x_monotonic_fails_compile(spark):
    df = spark.createDataFrame([("a", 1.0)], "id string, x double")
    for bad in ({},                                   # missing order_by
                {"order_by": 7},                      # non-string
                {"order_by": "seq", "direction": "up"},
                {"order_by": "seq", "n_buckets": 0},
                {"order_by": "seq", "n_buckets": True}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"properties": {"x": {"x-monotonic": bad}}},
                            df.schema)


# ---------------------------------------------------------------------------
# x-gap continuity (gap_violations)
# ---------------------------------------------------------------------------

def _gap_oracle(rows, max_s):
    """rows = [(id, ts_epoch, grp)]; later-row ids of pairs gapping
    > max_s within each group (grp=None -> one global sequence)."""
    out = set()
    groups = {}
    for r in rows:
        if r[1] is None:
            continue
        groups.setdefault(r[2], []).append(r)
    for g in groups.values():
        g.sort(key=lambda r: r[1])
        out |= {cur[0] for prev, cur in zip(g, g[1:])
                if cur[1] - prev[1] > max_s}
    return out


def test_gap_grouped(spark):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        gap_violations)
    rows = [("a1", 0.0, "A"), ("a2", 10.0, "A"), ("a3", 4000.0, "A"),
            ("b1", 0.0, "B"), ("b2", 3599.0, "B"), ("b3", 7200.0, "B"),
            ("n1", None, "A")]
    df = spark.createDataFrame(rows, "id string, ts double, grp string")
    got = {r.row_id for r in gap_violations(
        df, "ts", row_id="id", by="grp", max_seconds=3600).collect()}
    assert got == _gap_oracle(rows, 3600) == {"a3", "b3"}


@pytest.mark.parametrize("n_buckets", [1, 3, 8])
def test_gap_global_bucketed_matches_oracle(spark, n_buckets):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        gap_violations)
    rnd = random.Random(7)
    ts, rows = 0.0, []
    for i in range(200):
        ts += rnd.choice([1, 5, 30, 120])
        rows.append((f"r{i:03d}", ts, None))
    df = spark.createDataFrame([(i, t) for i, t, _ in rows],
                               "id string, ts double").repartition(5)
    got = {r.row_id for r in gap_violations(
        df, "ts", row_id="id", max_seconds=60,
        n_buckets=n_buckets).collect()}
    assert got == _gap_oracle(rows, 60)
    assert got  # the 120 s steps must actually fire


def test_gap_timestamps_and_message(spark):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        gap_violations)
    df = spark.createDataFrame(
        [("e1", "2026-01-01 00:00:00"), ("e2", "2026-01-01 00:30:00"),
         ("e3", "2026-01-01 02:00:00")],
        "id string, ts string").selectExpr("id", "cast(ts as timestamp) ts")
    v = gap_violations(df, "ts", row_id="id", max_seconds=3600).collect()
    assert [r.row_id for r in v] == ["e3"]
    assert v[0].actual == "5400.0" and v[0].expected == ["<= 3600"]
    assert v[0].message == "Must not gap more than 3600 s"


def test_gap_rejects_nonpositive(spark):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        gap_violations)
    df = spark.createDataFrame([("a", 1.0)], "id string, ts double")
    with pytest.raises(ValueError):
        gap_violations(df, "ts", row_id="id", max_seconds=0)


def test_x_gap_dsl_end_to_end(spark):
    rows = [("a1", 0.0, "A"), ("a2", 4000.0, "A"), ("b1", 0.0, "B")]
    df = spark.createDataFrame(rows, "id string, ts double, grp string")
    rs = {"type": "object", "properties": {
        "ts": {"x-gap": {"max_seconds": 3600, "by": "grp", "id": "id"}}}}
    compiled = compile_ruleset(rs, df.schema, name="beats")
    res = validate_with_table_checks(df, compiled, row_id="id")
    v = res.violations.collect()
    assert [r.row_id for r in v] == ["a2"]
    assert v[0].keyword == "x-gap" and v[0].ruleset_id == "beats"
    assert "within 'grp'" in v[0].message


def test_x_gap_nested_unknown_and_malformed(spark):
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    rs = {"properties": {"m": {"properties": {
        "k": {"x-gap": {"max_seconds": 10}}}}}}
    compiled = compile_ruleset(rs, schema, name="nested")
    assert ("/m/k", "x-gap") in compiled.unknown and not compiled.table_checks
    for bad in ({}, {"max_seconds": 0}, {"max_seconds": True},
                {"max_seconds": "x"}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"type": "object", "properties": {
                "id": {"x-gap": bad}}}, schema, name="bad")


# ---------------------------------------------------------------------------
# sessionize (the constructive twin of x-gap)
# ---------------------------------------------------------------------------

def test_sessionize_splits_on_gap(spark):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        sessionize)
    rows = [("a1", 0.0, "A"), ("a2", 100.0, "A"), ("a3", 4000.0, "A"),
            ("a4", 4100.0, "A"), ("b1", 0.0, "B")]
    df = spark.createDataFrame(rows, "id string, ts double, grp string")
    got = {r.id: (r.session_index, r.session_id) for r in
           sessionize(df, "ts", by="grp", gap_seconds=3600).collect()}
    assert got["a1"] == (1, "A-1") and got["a2"] == (1, "A-1")
    assert got["a3"] == (2, "A-2") and got["a4"] == (2, "A-2")
    assert got["b1"] == (1, "B-1")


def test_sessionize_null_ts_and_group(spark):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        sessionize)
    rows = [("x1", None, "A"), ("x2", 10.0, "A"), ("x3", 20.0, "A"),
            ("x4", 10.0, None)]
    df = spark.createDataFrame(rows, "id string, ts double, grp string")
    got = {r.id: (r.session_index, r.session_id) for r in
           sessionize(df, "ts", by="grp", gap_seconds=60).collect()}
    # NULL ts / NULL group rows get NULL and never shift real ordinals
    assert got["x1"] == (None, None) and got["x4"] == (None, None)
    assert got["x2"] == (1, "A-1") and got["x3"] == (1, "A-1")


def test_sessionize_boundary_is_strict_gt(spark):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        sessionize)
    df = spark.createDataFrame(
        [("a", 0.0, "g"), ("b", 60.0, "g"), ("c", 120.5, "g")],
        "id string, ts double, grp string")
    got = {r.id: r.session_index for r in
           sessionize(df, "ts", by="grp", gap_seconds=60).collect()}
    # gap == 60 stays in-session; 60.5 splits
    assert got == {"a": 1, "b": 1, "c": 2}


def test_sessionize_rejects_nonpositive(spark):
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        sessionize)
    df = spark.createDataFrame([("a", 1.0, "g")],
                               "id string, ts double, grp string")
    with pytest.raises(ValueError):
        sessionize(df, "ts", by="grp", gap_seconds=0)
