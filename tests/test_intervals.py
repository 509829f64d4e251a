"""Bucketed range joins: containment/overlap semantics, exactly-once pair
emission across bucket boundaries, NULL/inverted guards, the span guard,
and random equivalence against a plain SQL range join in DuckDB."""

import random

import duckdb
import pytest

from remark_lint_frontmatter_schema_spark.operators.intervals import (
    interval_overlap_join,
    point_in_interval_join,
)


@pytest.fixture()
def sessions(spark):
    return spark.createDataFrame(
        [("u1", 0.0, 10.0, "s1"), ("u1", 20.0, 30.0, "s2"),
         ("u2", 5.0, 50.0, "s3"), ("u1", 8.0, 25.0, "s4"),  # overlaps s1+s2
         ("u1", None, 5.0, "sbad"), ("u1", 9.0, 7.0, "sinv")],
        "user string, s double, e double, sid string")


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [("u1", 0.0, "p0"),    # interval start inclusive
         ("u1", 10.0, "p1"),   # interval end inclusive
         ("u1", 15.0, "p2"),   # in a gap (only s4 covers it)
         ("u1", 99.0, "p3"),   # matches nothing
         ("u2", 25.0, "p4"),
         ("u1", None, "p5")],
        "user string, ts double, pid string")


def test_point_in_interval_inner_and_left(points, sessions):
    inner = point_in_interval_join(
        points, sessions, on="user", point_ts="ts",
        start_col="s", end_col="e", bucket=4.0, payload=["sid"])
    got = sorted((r["pid"], r["sid"]) for r in inner.collect())
    assert got == [("p0", "s1"), ("p1", "s1"), ("p1", "s4"),
                   ("p2", "s4"), ("p4", "s3")]
    left = point_in_interval_join(
        points, sessions, on="user", point_ts="ts",
        start_col="s", end_col="e", bucket=4.0, payload=["sid"],
        how="left")
    got = sorted(((r["pid"], r["sid"]) for r in left.collect()),
                 key=lambda t: (t[0], t[1] or ""))
    assert ("p3", None) in got and ("p5", None) in got
    assert len(got) == 7  # 5 matches + 2 unmatched survivors


def test_overlap_exactly_once_across_buckets(sessions):
    # tiny bucket (1.0) so every overlap spans MANY shared buckets — each
    # pair must still be emitted exactly once
    out = interval_overlap_join(
        sessions, sessions, on="user", a_start="s", a_end="e",
        b_start="s", b_end="e", bucket=1.0,
        a_keep=["sid"], b_keep=["sid"])
    pairs = sorted((r["sid"], r["sid_b"]) for r in out.collect()
                   if r["sid"] < r["sid_b"])
    assert pairs == [("s1", "s4"), ("s2", "s4")]
    # self-pairs appear exactly once each (3 valid u1 intervals + s3)
    selfs = [(r["sid"], r["sid_b"]) for r in out.collect()
             if r["sid"] == r["sid_b"]]
    assert sorted(selfs) == [("s1", "s1"), ("s2", "s2"), ("s3", "s3"),
                             ("s4", "s4")]


def test_span_guard_fires(spark, sessions, points):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        point_in_interval_join(
            points, sessions, on="user", point_ts="ts",
            start_col="s", end_col="e", bucket=0.001, payload=["sid"],
            max_span_buckets=100).collect()
    assert "spans" in str(ei.value)


def test_guards(points, sessions):
    with pytest.raises(ValueError):
        point_in_interval_join(points, sessions, on="user", point_ts="ts",
                               start_col="s", end_col="e", bucket=0.0)
    with pytest.raises(ValueError):
        point_in_interval_join(points, sessions, on="user", point_ts="ts",
                               start_col="s", end_col="e", bucket=1.0,
                               how="full")


@pytest.mark.parametrize("bucket", [3.0, 40.0, 1000.0])
def test_random_equivalence_with_duckdb(spark, bucket):
    rnd = random.Random(11)
    ivs = [(f"k{rnd.randrange(4)}", float(s := rnd.randrange(0, 900)),
            float(s + rnd.randrange(0, 60)), i) for i in range(150)]
    pts = [(f"k{rnd.randrange(4)}", float(rnd.randrange(0, 1000)), i)
           for i in range(300)]
    ivdf = spark.createDataFrame(ivs, "k string, s double, e double, iid long")
    ptdf = spark.createDataFrame(pts, "k string, ts double, pid long")
    got = sorted((r["pid"], r["iid"]) for r in point_in_interval_join(
        ptdf, ivdf, on="k", point_ts="ts", start_col="s", end_col="e",
        bucket=bucket, payload=["iid"]).collect())
    con = duckdb.connect()
    con.register("iv", ivdf.toPandas())
    con.register("pt", ptdf.toPandas())
    want = sorted(map(tuple, con.execute(
        "SELECT pt.pid, iv.iid FROM pt JOIN iv ON pt.k = iv.k "
        "AND pt.ts BETWEEN iv.s AND iv.e").fetchall()))
    assert got == want

    got_ov = sorted((r["iid"], r["iid_b"]) for r in interval_overlap_join(
        ivdf, ivdf, on="k", a_start="s", a_end="e", b_start="s",
        b_end="e", bucket=bucket, a_keep=["iid"],
        b_keep=["iid"]).collect())
    want_ov = sorted(map(tuple, con.execute(
        "SELECT a.iid, b.iid FROM iv a JOIN iv b ON a.k = b.k "
        "AND a.s <= b.e AND b.s <= a.e").fetchall()))
    assert got_ov == want_ov


def test_timestamp_columns_and_unit_mismatch(spark):
    iv = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", "2024-01-01 01:00:00", "A")],
        "k string, s string, e string, sid string") \
        .selectExpr("k", "cast(s as timestamp) s",
                    "cast(e as timestamp) e", "sid")
    pt = spark.createDataFrame(
        [("k", "2024-01-01 00:30:00", 1), ("k", "2024-01-02 00:00:00", 2)],
        "k string, ts string, pid int") \
        .selectExpr("k", "cast(ts as timestamp) ts", "pid")
    out = point_in_interval_join(pt, iv, on="k", point_ts="ts",
                                 start_col="s", end_col="e",
                                 bucket=600.0, payload=["sid"])
    assert [(r["pid"], r["sid"]) for r in out.collect()] == [(1, "A")]
    num = spark.createDataFrame([("k", 1.0, 2.0, "B")],
                                "k string, s double, e double, sid string")
    with pytest.raises(TypeError):
        interval_overlap_join(iv, num, on="k", a_start="s", a_end="e",
                              b_start="s", b_end="e", bucket=1.0,
                              a_keep=["sid"], b_keep=["sid"])


def test_point_join_unit_mismatch_rejected(spark):
    iv = spark.createDataFrame([("k", 1.0, 2.0, "A")],
                               "k string, s double, e double, sid string")
    pt = spark.createDataFrame([("k", "2024-01-01 00:00:00", 1)],
                               "k string, ts string, pid int") \
        .selectExpr("k", "cast(ts as timestamp) ts", "pid")
    with pytest.raises(TypeError, match="different units"):
        point_in_interval_join(pt, iv, on="k", point_ts="ts",
                               start_col="s", end_col="e", bucket=60.0)


def test_composes_with_audio_vad_and_chunks(spark):
    """The audio composition the range join exists for: which fixed
    training windows (chunk_clips) contain voice (overlap a VAD
    segment)? Both stages emit (clip_id, start_ms, end_ms) — keyed
    overlap join, no payload bytes ever shuffle."""
    import numpy as np

    from remark_lint_frontmatter_schema_spark.functions import audio

    sr = 16000
    t = lambda ms: np.arange(int(sr * ms / 1000)) / sr
    tone = lambda ms, f: 0.5 * np.sin(2 * np.pi * f * t(ms))
    # 100 ms tone, 100 ms silence, 150 ms tone -> voice in [0,100)+[200,350)
    x = np.concatenate([tone(100, 440), np.zeros(int(sr * 0.1)),
                        tone(150, 440)])
    clips = spark.createDataFrame(
        [("g1", audio.wav_bytes((x * 32767).astype("<i2"), sr))],
        "clip_id string, bytes binary")
    segs = audio.voiced_segments(clips)
    chunks = audio.chunk_clips(clips, window_ms=100) \
                  .select("clip_id", "chunk_idx", "start_ms", "end_ms")
    voiced_windows = interval_overlap_join(
        chunks, segs.select("clip_id", "start_ms", "end_ms"),
        on="clip_id", a_start="start_ms", a_end="end_ms",
        b_start="start_ms", b_end="end_ms", bucket=100.0,
        a_keep=["chunk_idx"], b_keep=[])
    got = sorted({r["chunk_idx"] for r in voiced_windows.collect()})
    # windows: 0=[0,100] 1=[100,200] 2=[200,300] 3=[250,350] (tail rule);
    # window 1 touches voice only at its closed endpoints (VAD boundary
    # tolerance) — every window overlapping voice must be found, and the
    # all-silent middle can appear only via boundary-touch
    assert {0, 2, 3} <= set(got)


def test_reserved_temp_columns_refused(spark, points, sessions):
    from pyspark.sql import functions as F
    with pytest.raises(ValueError, match="reserved"):
        point_in_interval_join(points.withColumn("_iv_bkt", F.lit(1)),
                               sessions, on="user", point_ts="ts",
                               start_col="s", end_col="e", bucket=10.0)
    with pytest.raises(ValueError, match="reserved"):
        point_in_interval_join(points,
                               sessions.withColumn("_iv_pay", F.lit(1)),
                               on="user", point_ts="ts",
                               start_col="s", end_col="e", bucket=10.0)
    with pytest.raises(ValueError, match="reserved"):
        interval_overlap_join(sessions.withColumn("_ov_bkt", F.lit(1)),
                              sessions, on="user",
                              a_start="s", a_end="e",
                              b_start="s", b_end="e", bucket=10.0,
                              a_keep=["sid"], b_keep=["sid"])
