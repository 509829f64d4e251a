"""Streaming drift vs a persisted baseline histogram: alerts fire only on
shifted batches, tiny batches never page, and the checkpoint makes alerts
exactly-once across reruns."""

import os

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.streaming.drift import (
    drift_stream, load_baseline, save_baseline)


def _values(spark, n, offset):
    # deterministic saw-tooth over [offset, offset+100): same shape at any
    # n, so identical offsets have ~zero drift and shifted offsets drift
    return spark.range(n).select(
        (F.pmod(F.col("id") * 37, F.lit(100)) + offset)
        .cast("double").alias("v"))


@pytest.fixture()
def baseline(spark, tmp_path):
    path = str(tmp_path / "base")
    save_baseline(_values(spark, 4000, 0), "v", path,
                  lo=0, hi=300, n_buckets=30)
    return path


def test_save_and_load_baseline_meta(spark, baseline):
    rows, meta = load_baseline(spark, baseline)
    assert meta == {"value_col": "v", "lo": 0.0, "hi": 300.0,
                    "n_buckets": 30}
    assert sum(r.n for r in rows) == 4000
    assert all(r.side == "baseline" for r in rows)


def test_wrong_column_refused(spark, baseline, tmp_path):
    with pytest.raises(ValueError, match="built for column"):
        drift_stream(spark, str(tmp_path / "in"), "v double",
                     value_col="other", baseline_path=baseline,
                     out_path=str(tmp_path / "out"),
                     checkpoint=str(tmp_path / "ck"))


def test_drift_stream_alerts_only_on_shifted_batch(spark, baseline,
                                                   tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch 1: same distribution as the baseline -> history, no alert
    _values(spark, 2000, 0).coalesce(1).write.mode("append").parquet(inp)
    q = drift_stream(spark, inp, "v double", value_col="v",
                     baseline_path=baseline, out_path=out, checkpoint=ck)
    q.awaitTermination()
    hist1 = spark.read.parquet(f"{out}/history").collect()
    assert len(hist1) == 1 and not hist1[0].alerted
    assert hist1[0].n_rows == 2000 and hist1[0].psi < 0.05
    assert not os.path.exists(f"{out}/alerts")

    # batch 2 (rerun, same checkpoint): shifted by +150 -> alert; the
    # already-committed batch is NOT reprocessed (exactly-once)
    _values(spark, 2000, 150).coalesce(1).write.mode("append").parquet(inp)
    q2 = drift_stream(spark, inp, "v double", value_col="v",
                      baseline_path=baseline, out_path=out, checkpoint=ck)
    q2.awaitTermination()
    hist2 = spark.read.parquet(f"{out}/history").collect()
    assert len(hist2) == 2
    alerts = spark.read.parquet(f"{out}/alerts").collect()
    assert len(alerts) == 1
    a = alerts[0]
    assert a.n_rows == 2000 and a.psi > 0.2 and a.ks_stat > 0.1
    assert "Distribution drift on 'v'" in a.message
    assert a.severity == "warning" and a.ruleset_id == "engine"

    # rerun with nothing new: no further history/alert rows
    q3 = drift_stream(spark, inp, "v double", value_col="v",
                      baseline_path=baseline, out_path=out, checkpoint=ck)
    q3.awaitTermination()
    assert spark.read.parquet(f"{out}/history").count() == 2
    assert spark.read.parquet(f"{out}/alerts").count() == 1


def test_min_rows_guard_suppresses_alert(spark, baseline, tmp_path):
    inp = str(tmp_path / "in2")
    out = str(tmp_path / "out2")
    # 40 shifted rows: would alert on stats, but the batch is too small
    _values(spark, 40, 150).coalesce(1).write.mode("append").parquet(inp)
    q = drift_stream(spark, inp, "v double", value_col="v",
                     baseline_path=baseline, out_path=out,
                     checkpoint=str(tmp_path / "ck2"), min_rows=100)
    q.awaitTermination()
    h = spark.read.parquet(f"{out}/history").collect()
    assert len(h) == 1 and not h[0].alerted and h[0].psi is not None
    assert not os.path.exists(f"{out}/alerts")
