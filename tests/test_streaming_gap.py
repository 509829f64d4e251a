"""Cross-batch gap monitoring (streaming/gap.py): the boundary silence
only the stateful stream can see, within-batch gaps, NULL timestamps,
and the late-data no-rewind contract."""

import time

from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("dev", T.StringType()),
    T.StructField("ts", T.DoubleType()),
])


def test_gap_stream_cross_batch_and_within(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.gap import (
        run_gap_stream)
    p = str(tmp_path / "beats_in")
    # batch 1: dev A beats at 0,50,100 (quiet); dev B 0 then 900 (gap)
    spark.createDataFrame(
        [("A", 0.0), ("A", 50.0), ("A", 100.0),
         ("B", 0.0), ("B", 900.0), ("B", None)], SCHEMA) \
        .coalesce(1).write.parquet(p)
    time.sleep(1.1)
    # batch 2: dev A resumes at 5000 (boundary gap 4900); dev B at 901
    spark.createDataFrame(
        [("A", 5000.0), ("A", 5010.0), ("B", 901.0)], SCHEMA) \
        .coalesce(1).write.mode("append").parquet(p)

    q = run_gap_stream(spark, p, SCHEMA, "ts", by="dev", max_seconds=600,
                       query_name="gaptest",
                       checkpoint=str(tmp_path / "gap_ckpt"))
    q.awaitTermination(180)
    rows = {(r.dev, r.ts): r.gap_s for r in spark.table("gaptest").collect()}
    # within-batch gap (B: 0 -> 900) and the cross-batch one (A: 100 -> 5000)
    assert rows == {("B", 900.0): 900.0, ("A", 5000.0): 4900.0}


def test_gap_stream_late_data_never_fires(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.gap import (
        run_gap_stream)
    p = str(tmp_path / "late_in")
    spark.createDataFrame([("A", 10000.0)], SCHEMA) \
        .coalesce(1).write.parquet(p)
    time.sleep(1.1)
    # a LATE row far older than the mark: negative gap, no violation,
    # and the mark must not rewind (the next on-time row is quiet too)
    spark.createDataFrame([("A", 100.0), ("A", 10100.0)], SCHEMA) \
        .coalesce(1).write.mode("append").parquet(p)
    q = run_gap_stream(spark, p, SCHEMA, "ts", by="dev", max_seconds=600,
                       query_name="latetest",
                       checkpoint=str(tmp_path / "late_ckpt"))
    q.awaitTermination(180)
    assert spark.table("latetest").count() == 0


def test_gap_monitor_rejects_nonpositive(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.gap import gap_monitor
    import pytest
    p = str(tmp_path / "guard_in")
    spark.createDataFrame([("A", 1.0)], SCHEMA).write.parquet(p)
    df = spark.readStream.schema(SCHEMA).parquet(p)
    with pytest.raises(ValueError):
        gap_monitor(df, "ts", by="dev", max_seconds=0)
