"""As-of join: semantics (inclusive ties, no-match NULL, tolerance,
forward), and the bucketed scale path's exact equivalence to the simple
path and to DuckDB's native ASOF JOIN on seeded random data."""

import datetime as dt
import random

import duckdb
import pyspark.sql.functions as F
import pytest

from remark_lint_frontmatter_schema_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
)


@pytest.fixture()
def quotes_trades(spark):
    # numeric-ts handcrafted case: quote stream (right), trade stream (left)
    quotes = spark.createDataFrame(
        [("a", 2.0, 10.0), ("a", 5.0, 11.0), ("a", 9.0, 12.0),
         ("b", 4.0, 20.0)],
        "sym string, ts double, px double")
    trades = spark.createDataFrame(
        [("a", 1.0, "t1"), ("a", 5.0, "t2"), ("a", 7.0, "t3"),
         ("b", 3.0, "t4"), ("c", 6.0, "t5"), ("a", None, "t6")],
        "sym string, ts double, tid string")
    return trades, quotes


def _px(df):
    return {r["tid"]: r["px"] for r in df.collect()}


def test_backward_inclusive_and_nulls(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="sym", left_ts="ts", payload=["px"])
    assert out.columns == ["sym", "ts", "tid", "px"]
    px = _px(out)
    assert px == {"t1": None,   # before first quote
                  "t2": 11.0,   # tie is inclusive
                  "t3": 11.0,
                  "t4": None,   # b's quote is later
                  "t5": None,   # no quotes for c
                  "t6": None}   # NULL ts never matches


def test_forward_and_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    fwd = _px(asof_join(trades, quotes, on="sym", left_ts="ts",
                        payload=["px"], direction="forward"))
    assert fwd == {"t1": 10.0, "t2": 11.0, "t3": 12.0, "t4": 20.0,
                   "t5": None, "t6": None}
    tol = _px(asof_join(trades, quotes, on="sym", left_ts="ts",
                        payload=["px"], tolerance=1.5))
    assert tol == {"t1": None, "t2": 11.0, "t3": None,  # 7-5=2 > 1.5
                   "t4": None, "t5": None, "t6": None}


def test_null_payload_right_row_still_wins(spark):
    # a newer right row with NULL payload must shadow an older non-NULL one
    right = spark.createDataFrame([("k", 1.0, "old"), ("k", 2.0, None)],
                                  "k string, ts double, v string")
    left = spark.createDataFrame([("k", 3.0)], "k string, ts double")
    out = asof_join(left, right, on="k", left_ts="ts", payload=["v"])
    assert out.collect()[0]["v"] is None


def test_payload_name_collision_suffixed(spark):
    right = spark.createDataFrame([("k", 1.0, 9.0)],
                                  "k string, ts double, v double")
    left = spark.createDataFrame([("k", 2.0, 1.0)],
                                 "k string, ts double, v double")
    out = asof_join(left, right, on="k", left_ts="ts", payload=["v"])
    assert out.columns == ["k", "ts", "v", "v_asof"]
    r = out.collect()[0]
    assert (r["v"], r["v_asof"]) == (1.0, 9.0)


def _random_streams(spark, seed=7, n_keys=6, n_left=300, n_right=120):
    rnd = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    left = [(f"k{rnd.randrange(n_keys)}",
             t0 + dt.timedelta(seconds=rnd.randrange(0, 500_000)), i)
            for i in range(n_left)]
    right = [(f"k{rnd.randrange(n_keys)}",
              t0 + dt.timedelta(seconds=rnd.randrange(0, 500_000)),
              float(i)) for i in range(n_right)]
    ldf = spark.createDataFrame(left, "k string, ts timestamp, lid long")
    rdf = spark.createDataFrame(right, "k string, ts timestamp, rv double")
    return ldf, rdf


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_bucketed_equals_simple_and_duckdb(spark, direction):
    ldf, rdf = _random_streams(spark)
    kw = dict(on="k", left_ts="ts", payload=["rv"], direction=direction)
    simple = asof_join(ldf, rdf, **kw)
    # bucket far smaller than the span so cross-bucket carry is exercised
    for bucket in (3600.0, 250_000.0):
        bucketed = asof_join_bucketed(ldf, rdf, bucket=bucket, **kw)
        a = {r["lid"]: r["rv"] for r in simple.collect()}
        b = {r["lid"]: r["rv"] for r in bucketed.collect()}
        assert a == b
    op = ">=" if direction == "backward" else "<="
    con = duckdb.connect()
    con.register("l", ldf.toPandas())
    con.register("r", rdf.toPandas())
    oracle = con.execute(
        f"SELECT l.lid, r.rv FROM l ASOF LEFT JOIN r "
        f"ON l.k = r.k AND l.ts {op} r.ts").fetchall()
    want = {lid: rv for lid, rv in oracle}
    got = {r["lid"]: r["rv"] for r in simple.collect()}
    assert got == want


def test_bucketed_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    tol = _px(asof_join_bucketed(trades, quotes, on="sym", left_ts="ts",
                                 payload=["px"], bucket=2.0, tolerance=1.5))
    assert tol == {"t1": None, "t2": 11.0, "t3": None,
                   "t4": None, "t5": None, "t6": None}


def test_guards(quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", left_ts="ts",
                  direction="sideways")
    with pytest.raises(ValueError):
        asof_join_bucketed(trades, quotes, on="sym", left_ts="ts",
                           bucket=0.0)
    with pytest.raises(TypeError):
        asof_join(trades.withColumn("ts", F.col("tid")), quotes,
                  on="sym", left_ts="ts")


def test_mixed_time_units_rejected(spark):
    left = spark.createDataFrame([("k", "2024-01-01 00:00:00", 1)],
                                 "k string, ts string, lid int") \
        .selectExpr("k", "cast(ts as timestamp) ts", "lid")
    right = spark.createDataFrame([("k", 5.0, 1.0)],
                                  "k string, ts double, v double")
    with pytest.raises(TypeError, match="different units"):
        asof_join(left, right, on="k", left_ts="ts", payload=["v"])
    with pytest.raises(TypeError, match="different units"):
        asof_join_bucketed(left, right, on="k", left_ts="ts",
                           payload=["v"], bucket=60.0)


def test_null_keys_never_match(spark):
    # SQL join semantics: NULL keys match nothing — a window partitionBy
    # would otherwise glue NULL-key left rows to NULL-key right rows
    left = spark.createDataFrame([(None, 5.0, "L1"), ("k", 5.0, "L2")],
                                 "k string, ts double, lid string")
    right = spark.createDataFrame([(None, 1.0, 1.0), ("k", 1.0, 2.0),
                                   (None, 4.9, 9.0)],
                                  "k string, ts double, v double")
    for out in (asof_join(left, right, on="k", left_ts="ts",
                          payload=["v"]),
                asof_join_bucketed(left, right, on="k", left_ts="ts",
                                   payload=["v"], bucket=2.0),
                # same bucket as L1 — the within-bucket window must not
                # match the NULL-key right row either
                asof_join_bucketed(left, right, on="k", left_ts="ts",
                                   payload=["v"], bucket=100.0)):
        got = {r["lid"]: r["v"] for r in out.collect()}
        assert got == {"L1": None, "L2": 2.0}


def test_tz_ntz_mix_refused(spark):
    """A zoned left vs zoneless right would derive the NTZ ordinal via a
    session-timezone cast — silently shifted matches. Refused instead."""
    from remark_lint_frontmatter_schema_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [("a",)], "k string").selectExpr(
        "k", "timestamp'2026-01-01 00:00:00' as ts")
    right = spark.createDataFrame(
        [("a",)], "k string").selectExpr(
        "k", "cast(timestamp_ntz'2026-01-01 00:00:00' as timestamp_ntz) as ts",
        "1.0 as v")
    with pytest.raises(TypeError):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  payload=["v"])
    # NTZ on BOTH sides stays allowed
    left_ntz = left.selectExpr("k", "cast(ts as timestamp_ntz) as ts")
    out = asof_join(left_ntz, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["v"]).collect()
    assert len(out) == 1 and out[0].v == 1.0
