"""x-ref-asof — temporal referential integrity: every fact row must have
a dim row with the same key IN FORCE at the fact's timestamp."""

import pytest

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.operators.asof import (
    asof_ref_violations,
)
from remark_lint_frontmatter_schema_spark.operators.table_checks import (
    table_check_violations,
    validate_with_table_checks,
)


@pytest.fixture()
def fact(spark):
    # (rid, uid, ts): u1 consent at t=5 — rows before 5 dangle;
    # u2 has no consent at all; NULL key/ts rows never violate here
    return spark.createDataFrame(
        [("r1", "u1", 3.0), ("r2", "u1", 5.0), ("r3", "u1", 9.0),
         ("r4", "u2", 9.0), ("r5", None, 9.0), ("r6", "u1", None)],
        "rid string, uid string, ts double")


@pytest.fixture()
def consents(spark):
    return spark.createDataFrame([("u1", 5.0), ("u3", 1.0)],
                                 "user string, granted double")


def test_operator_backward_and_bucketed(fact, consents):
    kw = dict(ts_col="ts", dim_ts="granted", row_id="rid")
    v = asof_ref_violations(fact, "uid", consents, "user", **kw)
    rows = {r["row_id"]: r for r in v.collect()}
    assert set(rows) == {"r1", "r4"}
    assert rows["r1"]["keyword"] == "ref-asof"
    assert rows["r1"]["actual"] == "u1@3.0"
    assert rows["r1"]["message"] == \
        "Must reference a 'user' effective at `ts`"
    bucketed = asof_ref_violations(fact, "uid", consents, "user",
                                   bucket=2.0, **kw)
    assert {r["row_id"] for r in bucketed.collect()} == {"r1", "r4"}


def test_operator_tolerance_and_forward(fact, consents):
    tol = asof_ref_violations(fact, "uid", consents, "user", ts_col="ts",
                              dim_ts="granted", row_id="rid", tolerance=3.0)
    # r3 at t=9: consent at 5 is 4s old > 3s tolerance -> violates too
    assert {r["row_id"] for r in tol.collect()} == {"r1", "r3", "r4"}
    fwd = asof_ref_violations(fact, "uid", consents, "user", ts_col="ts",
                              dim_ts="granted", row_id="rid",
                              direction="forward")
    # forward: a consent at-or-AFTER the row; only r3 (t=9 > 5) dangles
    v = {r["row_id"]: r for r in fwd.collect()}
    assert set(v) == {"r3", "r4"}
    assert "effective by `ts`" in v["r3"]["message"]


def test_dsl_e2e_and_unknown_nesting(spark, fact, consents):
    rs = {"properties": {"uid": {"x-ref-asof": {
        "dim": "consents", "key": "user", "ts": "ts",
        "dim_ts": "granted"}}}}
    compiled = compile_ruleset(rs, fact.schema, name="tca")
    assert [k for k, _, _ in compiled.table_checks] == ["ref_asof"]
    res = validate_with_table_checks(fact, compiled, row_id="rid",
                                     dims={"consents": consents})
    got = {(r.constraint_id, r.row_id)
           for r in res.table_violations.collect()}
    assert got == {("ref-asof:uid->user@granted", "r1"),
                   ("ref-asof:uid->user@granted", "r4")}
    # nested declaration cannot run relationally -> unknown
    rs_nested = {"properties": {"uid": {"anyOf": [
        {"x-ref-asof": {"dim": "d", "key": "k", "ts": "t",
                        "dim_ts": "g"}}]}}}
    c2 = compile_ruleset(rs_nested, fact.schema, name="n")
    assert not c2.table_checks
    assert any("x-ref-asof" in str(u) for u in c2.unknown)


def test_dsl_malformed_rejected(spark, fact):
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError,
    )
    for bad in [{"dim": "d", "key": "k"},                      # no ts
                {"dim": "d", "key": "k", "ts": "t", "dim_ts": "g",
                 "direction": "sideways"},
                {"dim": "d", "key": "k", "ts": "t", "dim_ts": "g",
                 "tolerance": -1}]:
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"properties": {"uid": {"x-ref-asof": bad}}},
                            fact.schema, name="bad")


def test_missing_dim_guard(spark, fact, consents):
    rs = {"properties": {"uid": {"x-ref-asof": {
        "dim": "nope", "key": "user", "ts": "ts", "dim_ts": "granted"}}}}
    compiled = compile_ruleset(rs, fact.schema, name="g")
    missing = []
    out = table_check_violations(fact, compiled, row_id="rid", dims={},
                                 on_missing_dim=missing.append)
    assert missing == ["nope"]
    assert out is None


def test_row_id_may_be_the_key_or_ts(fact, consents):
    # validating the key column with itself as the row id (the fd.py
    # duplicate-projection lesson) must not raise AMBIGUOUS_REFERENCE
    v = asof_ref_violations(fact, "uid", consents, "user",
                            ts_col="ts", dim_ts="granted", row_id="uid")
    assert {r["row_id"] for r in v.collect()} == {"u1", "u2"}
    v2 = asof_ref_violations(fact, "uid", consents, "user",
                             ts_col="ts", dim_ts="granted", row_id="ts")
    assert {r["row_id"] for r in v2.collect()} == {"3.0", "9.0"}


# --------------------------------------------------------------------------
# x-ref-interval: the interval twin — the row's ts must fall inside at
# least one dim window of its key (asof sees only the latest boundary,
# not windows that have since closed)
# --------------------------------------------------------------------------

@pytest.fixture()
def windows(spark):
    # u1 licensed [2,4] and [8,10]; u3 licensed [0,100]
    return spark.createDataFrame(
        [("u1", 2.0, 4.0), ("u1", 8.0, 10.0), ("u3", 0.0, 100.0),
         ("u1", None, 5.0), ("u1", 9.0, 7.0)],   # NULL/inverted: no cover
        "user string, s double, e double")


def test_interval_ref_operator(fact, windows):
    from remark_lint_frontmatter_schema_spark.operators.intervals import (
        interval_ref_violations,
    )
    v = interval_ref_violations(fact, "uid", windows, "user",
                                ts_col="ts", start_col="s", end_col="e",
                                bucket=2.0, row_id="rid")
    rows = {r["row_id"]: r for r in v.collect()}
    # fact: r1@3 covered by [2,4]; r2@5 in the gap; r3@9 covered by
    # [8,10]; r4 is u2 (no windows); r5/r6 NULL key/ts never violate
    assert set(rows) == {"r2", "r4"}
    assert rows["r2"]["keyword"] == "ref-interval"
    assert rows["r2"]["actual"] == "u1@5.0"


def test_interval_ref_dsl_e2e(spark, fact, windows):
    rs = {"properties": {"uid": {"x-ref-interval": {
        "dim": "lic", "key": "user", "ts": "ts", "start": "s",
        "end": "e", "bucket": 2.0}}}}
    compiled = compile_ruleset(rs, fact.schema, name="lic")
    assert [k for k, _, _ in compiled.table_checks] == ["ref_interval"]
    res = validate_with_table_checks(fact, compiled, row_id="rid",
                                     dims={"lic": windows})
    got = {r.row_id for r in res.table_violations.collect()}
    assert got == {"r2", "r4"}
    # malformed (no bucket) -> compile error; nested -> unknown
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError,
    )
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"uid": {"x-ref-interval": {
            "dim": "d", "key": "k", "ts": "t", "start": "s",
            "end": "e"}}}}, fact.schema, name="bad")
    c2 = compile_ruleset({"properties": {"uid": {"anyOf": [
        {"x-ref-interval": {"dim": "d", "key": "k", "ts": "t",
                            "start": "s", "end": "e",
                            "bucket": 1.0}}]}}}, fact.schema, name="n")
    assert not c2.table_checks
    assert any("x-ref-interval" in str(u) for u in c2.unknown)
