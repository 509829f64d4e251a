"""missing_buckets / calendar_violations / freshness_violations + DSL."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.sequence import (
    calendar_violations, freshness_violations, missing_buckets)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def days(spark):
    rows = [(_ts("2026-01-01 05:00:00"),), (_ts("2026-01-02 09:00:00"),),
            (_ts("2026-01-02 10:00:00"),), (_ts("2026-01-05 23:00:00"),),
            (None,)]
    return spark.createDataFrame(rows, "ts timestamp")


def test_missing_buckets_global(spark, days):
    got = [r.bucket for r in missing_buckets(days, "ts").collect()]
    assert got == [_ts("2026-01-03 00:00:00"), _ts("2026-01-04 00:00:00")]
    with pytest.raises(ValueError):
        missing_buckets(days, "ts", unit="fortnight")


def test_missing_buckets_grouped_and_empty(spark, days):
    rows = [("a", _ts("2026-01-01 00:30:00")),
            ("a", _ts("2026-01-03 00:00:00")),
            ("b", _ts("2026-02-01 00:00:00"))]  # b spans one day: no holes
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = [(r.g, r.bucket)
           for r in missing_buckets(df, "ts", by="g").collect()]
    assert got == [("a", _ts("2026-01-02 00:00:00"))]
    empty = spark.createDataFrame([], "ts timestamp")
    assert missing_buckets(empty, "ts").count() == 0


def test_calendar_violations_shape(spark, days):
    v = calendar_violations(days, "ts").collect()
    assert [r.actual for r in v] == ["2026-01-03 00:00:00",
                                     "2026-01-04 00:00:00"]
    assert v[0].keyword == "x-calendar"
    assert v[0].message == "Must cover every day: no rows in " \
        "2026-01-03 00:00:00"


def test_freshness(spark, days):
    # newest = 2026-01-05 23:00; as_of 2026-01-06 00:00 -> 3600 s old
    ok = freshness_violations(days, "ts", max_age_seconds=7200,
                              as_of="2026-01-06 00:00:00").collect()
    assert ok == []
    stale = freshness_violations(days, "ts", max_age_seconds=1800,
                                 as_of="2026-01-06 00:00:00").collect()
    assert len(stale) == 1
    assert stale[0].message == \
        "Must be fresh: newest row is 3600.0 s old (limit 1800)"
    assert stale[0].actual == "2026-01-05 23:00:00"
    with pytest.raises(ValueError):
        freshness_violations(days, "ts", max_age_seconds=0)


def test_freshness_grouped_and_null_group(spark):
    rows = [("a", _ts("2026-01-01 00:00:00")), ("b", None)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    v = {r.row_id: r for r in freshness_violations(
        df, "ts", max_age_seconds=60,
        as_of="2026-01-01 00:10:00", by="g").collect()}
    assert set(v) == {"a", "b"}
    assert "600.0 s old" in v["a"].message
    assert v["b"].message == "Must be fresh: no non-NULL 'ts' rows"
    assert v["b"].actual is None


def test_dsl_calendar_freshness(spark, days):
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError, compile_ruleset)
    doc = {"type": "object", "properties": {"ts": {
        "x-calendar": {"unit": "day"},
        "x-freshness": {"max_age_seconds": 1800,
                        "as_of": "2026-01-06 00:00:00"}}}}
    df = days.withColumn("rid", F.monotonically_increasing_id())
    compiled = compile_ruleset(doc, df.schema, name="cal")
    kinds = sorted(k for k, _, _ in compiled.table_checks)
    assert kinds == ["calendar", "freshness"]
    out = table_check_violations(df, compiled, row_id="rid").collect()
    assert sorted(r.keyword for r in out) == \
        ["x-calendar", "x-calendar", "x-freshness"]
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"ts": {
            "x-freshness": {"max_age_seconds": -5}}}}, df.schema, name="b")
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"ts": {
            "x-calendar": {"unit": "fortnight"}}}}, df.schema, name="b")


def test_missing_buckets_span_guard(spark):
    rows = [(_ts("1970-01-01 00:00:00"),), (_ts("2026-01-01 00:00:00"),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    with pytest.raises(ValueError, match="outlier timestamp"):
        missing_buckets(df, "ts", unit="minute")
    # deliberate raise works
    assert missing_buckets(df, "ts", unit="day",
                           max_buckets=30_000).count() > 20_000
    # grouped guard fires on the worst group
    g = spark.createDataFrame(
        [("a", _ts("1970-01-01 00:00:00")), ("a", _ts("2026-01-01 00:00:00")),
         ("b", _ts("2026-01-01 00:00:00"))], "g string, ts timestamp")
    with pytest.raises(ValueError, match="group 'a'"):
        missing_buckets(g, "ts", by="g", unit="hour", max_buckets=1000)
