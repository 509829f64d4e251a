"""Streaming reconciliation: stream==batch parity across micro-batches,
state resume, idempotent replays."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.reconcile import (
    reconcile)
from remark_lint_frontmatter_schema_spark.streaming.reconcile import (
    reconcile_stream, running_fact_aggregate)


def _dim(spark):
    # key 1 correct after both batches, key 2 off by +5, key 3 no facts
    return spark.createDataFrame(
        [(1, 30.0), (2, 15.0), (3, 50.0)], "k long, total double")


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k long, v double")


def _collect(spark, out):
    return sorted((r.k, r.expected, r.actual, r.diff, r.status)
                  for r in spark.read.parquet(out).collect())


def test_stream_matches_batch_and_merges_state(spark, tmp_path):
    inp, out, ck = (str(tmp_path / p) for p in ("in", "out", "ck"))
    b1 = [(1, 10.0), (2, 7.0), (None, 99.0)]
    b2 = [(1, 20.0), (2, 3.0), (4, 1.0)]
    dim = _dim(spark)
    _facts(spark, b1).coalesce(1).write.mode("append").parquet(inp)
    _facts(spark, b2).coalesce(1).write.mode("append").parquet(inp)
    q = reconcile_stream(spark, inp, "k long, v double",
                         fact_key="k", fact_value="v", dim=dim,
                         key="k", dim_value="total",
                         out_path=out, checkpoint=ck)
    q.awaitTermination()
    got = _collect(spark, out)
    want = sorted(
        (r.k, r.expected, r.actual, r.diff, r.status)
        for r in reconcile(_facts(spark, b1 + b2), dim, key="k",
                           fact_value="v", dim_value="total").collect())
    assert got == want
    by_key = {t[0]: t[4] for t in got}
    assert by_key == {1: "ok", 2: "mismatch", 3: "missing_fact"}

    # idempotent replay: nothing new -> same report
    reconcile_stream(spark, inp, "k long, v double",
                     fact_key="k", fact_value="v", dim=dim,
                     key="k", dim_value="total",
                     out_path=out, checkpoint=ck).awaitTermination()
    assert _collect(spark, out) == got

    # late batch heals key 2 through the SAME running state
    _facts(spark, [(2, 5.0)]).coalesce(1).write.mode("append").parquet(inp)
    reconcile_stream(spark, inp, "k long, v double",
                     fact_key="k", fact_value="v", dim=dim,
                     key="k", dim_value="total",
                     out_path=out, checkpoint=ck).awaitTermination()
    assert {t[0]: t[4] for t in _collect(spark, out)} == \
        {1: "ok", 2: "ok", 3: "missing_fact"}


def test_agg_guard(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError):
        running_fact_aggregate(df, fact_key="k", fact_value="v",
                               agg="median")
