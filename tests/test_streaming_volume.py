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


def _drain(spark, p, out, ckpt):
    from remark_lint_frontmatter_schema_spark.streaming.volume import (
        run_volume_stream)
    run_volume_stream(spark, p, SCHEMA, "ts", unit="hour",
                      out_path=out, checkpoint=ckpt).awaitTermination(180)


def _sink_fixture(spark, tmp_path, name):
    p, out, ckpt = (str(tmp_path / f"{name}_in"),
                    str(tmp_path / f"{name}_out"),
                    str(tmp_path / f"{name}_ckpt"))
    parts = [_rows(1, {0: 100, 1: 102}), _rows(1, {2: 100, 3: 200}),
             _rows(1, {4: 102, 5: 100}), _rows(1, {6: 102}),
             _rows(1, {7: 5})]
    mode = "overwrite"
    for rows in parts:
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode(mode).parquet(p)
        mode = "append"
        time.sleep(1.1)
    _drain(spark, p, out, ckpt)
    return out


def test_compaction_crash_windows_are_detected(spark, tmp_path):
    """Round 5 (advisor): every interruption point of the fold either
    repairs on the next compact() or is skipped by the reader — no
    window double-counts or undercounts.

    Simulated by driving the real sequence and force-restoring on-disk
    states: (a) stale sources left after a committed fold, (b) a
    complete staging dir orphaned mid-swap, (c) an incomplete staging
    dir with no manifest."""
    import os
    import shutil

    from remark_lint_frontmatter_schema_spark.streaming.volume import (
        compact_volume_sink, volume_anomalies_from_sink)

    out = _sink_fixture(spark, tmp_path, "cw")
    before = sorted((r.bucket, r.value, r.z) for r in
                    volume_anomalies_from_sink(spark, out).collect())

    # snapshot the pre-compaction sink so we can rebuild crash states
    snap = str(tmp_path / "snap")
    shutil.copytree(out, snap)

    # (a) committed fold, deletes interrupted: re-create the folded
    # source partitions from the snapshot next to the committed -1
    n = compact_volume_sink(spark, out, keep_last=2)
    assert n >= 2
    folded_ids = [d for d in os.listdir(snap) if d.startswith("_batch=")
                  and not os.path.exists(os.path.join(out, d))]
    assert folded_ids
    for d in folded_ids:
        shutil.copytree(os.path.join(snap, d), os.path.join(out, d))
    # reader: manifest says those ids are already inside -1 -> skipped
    got = sorted((r.bucket, r.value, r.z) for r in
                 volume_anomalies_from_sink(spark, out).collect())
    assert got == before
    # compact repair: drops the stale sources without re-folding
    assert compact_volume_sink(spark, out, keep_last=2) == 0
    assert not any(os.path.exists(os.path.join(out, d))
                   for d in folded_ids)
    assert sorted((r.bucket, r.value, r.z) for r in
                  volume_anomalies_from_sink(spark, out).collect()) \
        == before

    # (b) complete staging orphaned mid-swap: -1 deleted, .fold_tmp
    # holds data + manifest. Reader uses the staging dir; compact
    # finishes the rename.
    shutil.move(os.path.join(out, "_batch=-1"),
                os.path.join(out, ".fold_tmp"))
    got = sorted((r.bucket, r.value, r.z) for r in
                 volume_anomalies_from_sink(spark, out).collect())
    assert got == before
    assert compact_volume_sink(spark, out, keep_last=2) == 0
    assert os.path.exists(os.path.join(out, "_batch=-1"))
    assert not os.path.exists(os.path.join(out, ".fold_tmp"))
    assert sorted((r.bucket, r.value, r.z) for r in
                  volume_anomalies_from_sink(spark, out).collect()) \
        == before

    # (c) incomplete staging (no manifest yet): sources are intact, the
    # attempt is discarded and the fold redone from scratch
    out2 = _sink_fixture(spark, tmp_path, "cw2")
    before2 = sorted((r.bucket, r.value, r.z) for r in
                     volume_anomalies_from_sink(spark, out2).collect())
    os.makedirs(os.path.join(out2, ".fold_tmp"))
    with open(os.path.join(out2, ".fold_tmp", "part-junk.parquet"),
              "wb") as f:
        f.write(b"not parquet")
    got2 = sorted((r.bucket, r.value, r.z) for r in
                  volume_anomalies_from_sink(spark, out2).collect())
    assert got2 == before2          # reader ignores manifest-less tmp
    assert compact_volume_sink(spark, out2, keep_last=2) >= 2
    assert not os.path.exists(os.path.join(out2, ".fold_tmp"))
    assert sorted((r.bucket, r.value, r.z) for r in
                  volume_anomalies_from_sink(spark, out2).collect()) \
        == before2
