"""Streaming volume monitor (streaming/volume.py): stream == batch
parity over accumulated partials, late-bucket correction at read time,
and replay idempotence."""

import time
from datetime import datetime

from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("rid", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _rows(day, hours):
    out = []
    for h, n in hours.items():
        out += [(f"r{day}_{h}_{i}", datetime(2024, 6, day, h))
                for i in range(n)]
    return out


def test_volume_stream_matches_batch(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.operators.outliers import (
        volume_anomalies)
    from remark_lint_frontmatter_schema_spark.streaming.volume import (
        run_volume_stream, volume_anomalies_from_sink)
    p = str(tmp_path / "vol_in")
    # batch 1: steady hours + half of the flood; batch 2: the rest of the
    # flood lands LATE into the same bucket — only the summed partials
    # see the full 400
    b1 = _rows(1, {0: 100, 1: 102, 2: 100, 3: 200, 4: 102, 5: 100,
                   6: 102, 7: 100, 8: 5})
    b2 = _rows(1, {3: 200})
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(p)
    time.sleep(1.1)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append") \
        .parquet(p)
    out = str(tmp_path / "vol_out")
    ckpt = str(tmp_path / "vol_ckpt")
    q = run_volume_stream(spark, p, SCHEMA, "ts", unit="hour",
                          out_path=out, checkpoint=ckpt)
    q.awaitTermination(180)
    got = sorted((r.bucket, r.value, r.z) for r in
                 volume_anomalies_from_sink(spark, out).collect())
    want = sorted((r.bucket, r.value, r.z) for r in volume_anomalies(
        spark.read.parquet(p), "ts", unit="hour").collect())
    assert got == want and len(got) == 2          # flood hour + thin hour
    assert any(v == 400.0 for _, v, _ in got)
    # replay with the same checkpoint: no new files -> identical output
    q2 = run_volume_stream(spark, p, SCHEMA, "ts", unit="hour",
                           out_path=out, checkpoint=ckpt)
    q2.awaitTermination(180)
    again = sorted((r.bucket, r.value, r.z) for r in
                   volume_anomalies_from_sink(spark, out).collect())
    assert again == got


def test_volume_stream_unit_guard(spark, tmp_path):
    import pytest
    from remark_lint_frontmatter_schema_spark.streaming.volume import (
        run_volume_stream)
    with pytest.raises(ValueError, match="unit"):
        run_volume_stream(spark, str(tmp_path), SCHEMA, "ts", unit="era",
                          out_path=str(tmp_path / "o"),
                          checkpoint=str(tmp_path / "c"))


def test_compaction_preserves_numerics_and_replay(spark, tmp_path):
    """compact_volume_sink folds committed partials into _batch=-1:
    read numerics unchanged, partition count drops to keep_last + 1,
    re-compaction is a no-op, and a stream continuation (including the
    replayable tail) still matches the batch twin."""
    from remark_lint_frontmatter_schema_spark.operators.outliers import (
        volume_anomalies)
    from remark_lint_frontmatter_schema_spark.streaming.volume import (
        compact_volume_sink, run_volume_stream, volume_anomalies_from_sink)
    import pytest
    p = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # 5 micro-batches (maxFilesPerTrigger=1): steady hours, one flood
    parts = [_rows(1, {0: 100, 1: 102, 2: 100}),
             _rows(1, {3: 200, 4: 102}),
             _rows(1, {3: 200, 5: 100}),          # flood completes late
             _rows(1, {6: 102, 7: 100}),
             _rows(1, {8: 5})]
    mode = "overwrite"
    for rows in parts:
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode(mode).parquet(p)
        mode = "append"
        time.sleep(1.1)
    run_volume_stream(spark, p, SCHEMA, "ts", unit="hour",
                      out_path=out, checkpoint=ckpt).awaitTermination(180)
    before = sorted((r.bucket, r.value, r.z) for r in
                    volume_anomalies_from_sink(spark, out).collect())
    n_folded = compact_volume_sink(spark, out, keep_last=2)
    assert n_folded >= 2
    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("_batch="))
    assert "_batch=-1" in dirs and len(dirs) == 3   # -1 + keep_last
    after = sorted((r.bucket, r.value, r.z) for r in
                   volume_anomalies_from_sink(spark, out).collect())
    assert after == before
    # idempotent: nothing left below the cutoff
    assert compact_volume_sink(spark, out, keep_last=2) == 0
    # stream continuation over the compacted sink still == batch twin
    late = _rows(1, {8: 6})
    spark.createDataFrame(late, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(p)
    run_volume_stream(spark, p, SCHEMA, "ts", unit="hour",
                      out_path=out, checkpoint=ckpt).awaitTermination(180)
    got = sorted((r.bucket, r.value, r.z) for r in
                 volume_anomalies_from_sink(spark, out).collect())
    want = sorted((r.bucket, r.value, r.z) for r in volume_anomalies(
        spark.read.parquet(p), "ts", unit="hour").collect())
    assert got == want
    with pytest.raises(ValueError, match="keep_last"):
        compact_volume_sink(spark, out, keep_last=0)
