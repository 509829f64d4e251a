"""Streaming funnel (streaming/funnel.py): cross-batch chain growth,
stream==batch parity on in-order streams, the within-window bound, and
the no-rewind contract for cross-batch late events."""

import datetime as dt
import time

import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
])

STEPS = ["signup", "click", "purchase"]


def _ts(day, h=0):
    return dt.datetime(2024, 1, day, h)


def _last_per_user(spark, table):
    rows = spark.table(table).collect()
    out = {}
    for r in rows:  # memory sink preserves batch order; last write wins
        out[r["user_id"]] = r
    return out


def test_funnel_stream_cross_batch_parity(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.operators.funnel import (
        funnel_users)
    from remark_lint_frontmatter_schema_spark.streaming.funnel import (
        run_funnel_stream)
    p = str(tmp_path / "fin")
    b1 = [("u1", _ts(1), "signup"), ("u1", _ts(2), "click"),
          ("u2", _ts(1), "signup"),
          ("u3", _ts(1), "click")]          # click before any signup
    b2 = [("u1", _ts(3), "purchase"),
          ("u2", _ts(4), "click"),
          ("u3", _ts(5), "signup"), ("u3", _ts(6), "click")]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(p)
    time.sleep(1.1)
    spark.createDataFrame(b2, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(p)

    q = run_funnel_stream(spark, p, SCHEMA, STEPS, query_name="ftest",
                          checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(180)
    got = _last_per_user(spark, "ftest")

    batch = {r["user_id"]: r for r in funnel_users(
        spark.createDataFrame(b1 + b2, SCHEMA), STEPS).collect()}
    # u3 never emits progress? it signed up then clicked -> 2 steps
    assert set(got) == {u for u, r in batch.items()
                        if r["steps_completed"] > 0}
    for u, r in got.items():
        b = batch[u]
        assert r["steps_completed"] == b["steps_completed"], u
        for i in range(1, 4):
            assert r[f"t{i}"] == b[f"t{i}"], (u, i)
    assert got["u1"]["steps_completed"] == 3
    assert got["u2"]["steps_completed"] == 2


def test_funnel_stream_within_bound(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.funnel import (
        run_funnel_stream)
    p = str(tmp_path / "win_in")
    spark.createDataFrame(
        [("u1", _ts(1), "signup"), ("u1", _ts(1, 2), "click"),
         ("u2", _ts(1), "signup")], SCHEMA).coalesce(1).write.parquet(p)
    time.sleep(1.1)
    spark.createDataFrame(
        [("u2", _ts(9), "click")], SCHEMA).coalesce(1) \
        .write.mode("append").parquet(p)
    q = run_funnel_stream(spark, p, SCHEMA, ["signup", "click"],
                          query_name="wtest", within_ms=86400 * 1000,
                          checkpoint=str(tmp_path / "wck"))
    q.awaitTermination(180)
    got = _last_per_user(spark, "wtest")
    assert got["u1"]["steps_completed"] == 2
    # u2's click came 8 days later: outside the 1-day bound, chain stays 1
    assert got["u2"]["steps_completed"] == 1


def test_funnel_stream_late_event_no_rewind(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.funnel import (
        run_funnel_stream)
    p = str(tmp_path / "late_in")
    spark.createDataFrame(
        [("u1", _ts(5), "signup")], SCHEMA).coalesce(1).write.parquet(p)
    time.sleep(1.1)
    # a click with ts BEFORE the chain tip arrives late: never extends
    spark.createDataFrame(
        [("u1", _ts(2), "click")], SCHEMA).coalesce(1) \
        .write.mode("append").parquet(p)
    q = run_funnel_stream(spark, p, SCHEMA, ["signup", "click"],
                          query_name="ltest",
                          checkpoint=str(tmp_path / "lck"))
    q.awaitTermination(180)
    got = _last_per_user(spark, "ltest")
    assert got["u1"]["steps_completed"] == 1


def test_funnel_stream_validates_steps(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.funnel import (
        funnel_stream)
    p = str(tmp_path / "v_in")
    spark.createDataFrame([("u", _ts(1), "signup")], SCHEMA) \
        .coalesce(1).write.parquet(p)
    df = spark.readStream.schema(SCHEMA).parquet(p)
    with pytest.raises(ValueError, match="at least 2"):
        funnel_stream(df, ["signup"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_stream(df, ["signup", "signup"])
