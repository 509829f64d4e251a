"""Streaming heavy hitters: stream==batch parity, cross-batch state,
checkpointed idempotence."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.skew import heavy_hitters
from remark_lint_frontmatter_schema_spark.streaming.heavy_hitters import (
    heavy_hitters_stream)


def _batch(spark, spec):
    rows = [(k,) for k, n in spec for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    inp, out, ck = (str(tmp_path / p) for p in ("in", "out", "ck"))
    b1 = [("hot", 40), ("warm", 10), ("a", 3), ("b", 1)]
    b2 = [("hot", 25), ("c", 12), ("a", 2)]
    _batch(spark, b1).coalesce(1).write.mode("append").parquet(inp)
    _batch(spark, b2).coalesce(1).write.mode("append").parquet(inp)

    q = heavy_hitters_stream(spark, inp, "k string", "k", top_k=3,
                             out_path=out, checkpoint=ck)
    q.awaitTermination()
    got = [(r.key, r.count_min)
           for r in spark.read.parquet(out)
           .orderBy(F.desc("count_min"), F.asc("key")).collect()]
    # batch twin over the union of both micro-batches (exact mode)
    want = [(r.key, r.count_min)
            for r in heavy_hitters(spark.read.parquet(inp), "k",
                                   capacity=1024, top_k=3).collect()]
    assert got == want == [("hot", 65), ("c", 12), ("warm", 10)]


def test_rerun_same_checkpoint_is_idempotent_then_incremental(spark,
                                                              tmp_path):
    inp, out, ck = (str(tmp_path / p) for p in ("in", "out", "ck"))
    _batch(spark, [("x", 5), ("y", 2)]).coalesce(1) \
        .write.mode("append").parquet(inp)
    heavy_hitters_stream(spark, inp, "k string", "k", top_k=2,
                         out_path=out, checkpoint=ck).awaitTermination()
    first = sorted((r.key, r.count_min)
                   for r in spark.read.parquet(out).collect())
    # rerun with nothing new: same answer, no double counting
    heavy_hitters_stream(spark, inp, "k string", "k", top_k=2,
                         out_path=out, checkpoint=ck).awaitTermination()
    assert sorted((r.key, r.count_min)
                  for r in spark.read.parquet(out).collect()) == first
    # new arrivals merge into the SAME running state
    _batch(spark, [("y", 9)]).coalesce(1).write.mode("append").parquet(inp)
    heavy_hitters_stream(spark, inp, "k string", "k", top_k=2,
                         out_path=out, checkpoint=ck).awaitTermination()
    assert sorted((r.key, r.count_min)
                  for r in spark.read.parquet(out).collect()) == \
        [("x", 5), ("y", 11)]


def test_null_keys_dropped_and_guard(spark, tmp_path):
    inp, out, ck = (str(tmp_path / p) for p in ("in", "out", "ck"))
    spark.createDataFrame([("a",), (None,), ("a",)], "k string") \
        .coalesce(1).write.mode("append").parquet(inp)
    heavy_hitters_stream(spark, inp, "k string", "k", top_k=5,
                         out_path=out, checkpoint=ck).awaitTermination()
    assert [(r.key, r.count_min)
            for r in spark.read.parquet(out).collect()] == [("a", 2)]
    with pytest.raises(ValueError):
        heavy_hitters_stream(spark, inp, "k string", "k", top_k=0,
                             out_path=out, checkpoint=ck)
