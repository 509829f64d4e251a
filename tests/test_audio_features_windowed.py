"""Audio feature extraction (mapInPandas), declared-vs-payload duration
consistency, and the watermarked windowed streaming aggregate."""

import datetime as dt

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.streaming.windowed import (
    run_windowed_stream, windowed_verdict_counts)

CLIP_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("dur_ms", T.IntegerType()),
])


def _wav_row(i, sr=16000, ms=128, declared=None):
    return (f"c{i}", audio.synth_wav(i, sr, ms), sr,
            declared if declared is not None else ms)


@pytest.fixture(scope="module")
def clips(spark):
    rows = [_wav_row(i) for i in range(8)]
    rows.append(("bad", b"RIFX not a wav", 16000, 128))
    rows.append(("drift", audio.synth_wav(99, 16000, 100), 16000, 400))
    return spark.createDataFrame(rows, CLIP_SCHEMA)


def test_audio_features_decode_and_dominant_hz(clips):
    feats = {r.clip_id: r for r in audio.audio_features(clips).collect()}
    assert len(feats) == 10
    assert not feats["bad"].decode_ok
    assert feats["bad"].rms is None
    for i in range(8):
        r = feats[f"c{i}"]
        assert r.decode_ok
        assert abs(r.dur_ms_payload - 128) <= 1
        # synth freq = 200 + (i % 800); rfft resolution = sr/n ~ 7.8 Hz
        assert abs(r.dominant_hz - (200 + i % 800)) <= 8.0, r
        assert 0.0 <= r.silence_ratio <= 0.05  # constant sine: not silent
        assert 0.4 <= r.rms <= 0.7  # 0.8 amplitude sine -> rms ~ 0.566
        assert r.peak <= 1.0


def test_audio_features_silence_ratio(spark):
    import numpy as np
    sr = 16000
    half = np.concatenate([
        audio.synth_pcm16(0, sr, sr // 10),  # 100 ms tone
        np.zeros(sr // 10, dtype="<i2"),     # 100 ms silence
    ])
    df = spark.createDataFrame(
        [("h", audio.wav_bytes(half, sr), sr, 200)], CLIP_SCHEMA)
    (r,) = audio.audio_features(df).collect()
    assert 0.4 <= r.silence_ratio <= 0.6


def test_duration_consistency_violations(clips):
    v = audio.duration_consistency_violations(clips, tolerance_ms=5)
    got = {r.row_id: (r.constraint_id, r.keyword) for r in v.collect()}
    assert got == {
        "bad": ("decode:bytes", "decode"),
        "drift": ("x-duration:dur_ms", "x-duration"),
    }
    msgs = {r.row_id: r.message for r in v.collect()}
    assert msgs["bad"] == "Must be a decodable audio payload"
    assert "within 5 ms" in msgs["drift"]


# ---------------------------------------------------------------------------
# windowed streaming
# ---------------------------------------------------------------------------

EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])

EV_RULESET = {"properties": {"value": {"minimum": 0, "maximum": 100}}}


def _events(spark):
    base = dt.datetime(2026, 3, 1, 12, 0, 0)
    rows = [(i, base + dt.timedelta(seconds=13 * i),
             float((i * 37) % 140) - (10.0 if i % 11 == 0 else 0.0))
            for i in range(120)]
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    ev = _events(spark)
    # out-of-order arrival: write interleaved halves as separate files
    p = str(tmp_path / "ev_in")
    ev.where("event_id % 2 = 0").coalesce(1).write.parquet(p)
    ev.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(p)

    compiled = compile_ruleset(EV_RULESET, ev.schema, name="ev")
    batch = {(r.window_start, r.window_end):
             (r.n_rows, r.n_failed_rows, r.n_violations)
             for r in windowed_verdict_counts(
                 ev, compiled, event_time_col="ts").collect()}
    assert sum(v[0] for v in batch.values()) == 120
    assert any(v[1] > 0 for v in batch.values())

    q = run_windowed_stream(
        spark, p, EV_SCHEMA, compiled, event_time_col="ts",
        checkpoint=str(tmp_path / "ckpt"), query_name="wtest",
        output_mode="complete")  # bounded drain: one final row per window
    q.awaitTermination(120)
    got = {(r.window_start, r.window_end):
           (r.n_rows, r.n_failed_rows, r.n_violations)
           for r in spark.table("wtest").collect()}
    assert got == batch


def test_windowed_plan_has_watermark_and_stateful_agg(spark, tmp_path):
    ev = _events(spark)
    p = str(tmp_path / "ev_plan")
    ev.coalesce(1).write.parquet(p)
    compiled = compile_ruleset(EV_RULESET, ev.schema, name="ev")
    stream = (spark.readStream.schema(EV_SCHEMA).parquet(p))
    agg = windowed_verdict_counts(stream, compiled, event_time_col="ts",
                                  watermark_delay="7 minutes")
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan and "7 minutes" in plan


# ---------------------------------------------------------------------------
# stateful streaming: cross-batch first-seen dedup (applyInPandasWithState)
# ---------------------------------------------------------------------------

def test_first_seen_dedup_across_batches(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.stateful import (
        run_first_seen_stream)
    schema = T.StructType([
        T.StructField("clip_id", T.StringType()),
        T.StructField("batch_tag", T.StringType()),
    ])
    p = str(tmp_path / "fs_in")
    spark.createDataFrame(
        [("a", "b1"), ("b", "b1"), ("b", "b1")], schema) \
        .coalesce(1).write.parquet(p)
    import time
    time.sleep(1.1)  # distinct file mtimes -> deterministic batch order
    spark.createDataFrame(
        [("b", "b2"), ("c", "b2"), ("a", "b2")], schema) \
        .coalesce(1).write.mode("append").parquet(p)

    q = run_first_seen_stream(spark, p, schema, "clip_id",
                              checkpoint=str(tmp_path / "fs_ckpt"),
                              query_name="fstest")
    q.awaitTermination(120)
    rows = spark.table("fstest").collect()
    got = {r.clip_id: r.batch_tag for r in rows}
    assert len(rows) == 3, rows            # each key exactly once
    assert set(got) == {"a", "b", "c"}
    assert got["a"] == "b1" and got["b"] == "b1"  # first-batch wins
    assert got["c"] == "b2"


def test_duration_consistency_is_single_map_stage(clips):
    plan = audio.duration_consistency_violations(clips)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_streaming_drift_matches_batch(spark, tmp_path):
    """Streaming drift (foreachBatch partial histograms -> sink -> PSI)
    must agree exactly with batch windowed_psi on the same rows, with the
    injected day-3 shift visible through the streaming path."""
    import datetime
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark.operators import drift
    from remark_lint_frontmatter_schema_spark.streaming.windowed import (
        drift_psi_from_sink, run_drift_stream)
    base = datetime.datetime(2026, 3, 1)
    rows = []
    for day in range(4):
        for i in range(300):
            v = float((i % 80) + (150 if day == 3 else 0))
            rows.append((base + datetime.timedelta(days=day, seconds=i), v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    src = str(tmp_path / "src")
    # several files so the stream takes multiple micro-batches
    df.repartition(8).write.parquet(src)

    q = run_drift_stream(
        spark, src, df.schema, value_col="value", time_col="ts",
        lo=0.0, hi=300.0, n_buckets=30,
        hist_sink=str(tmp_path / "hist"),
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {str(r.window_start.date()): r.psi
           for r in drift_psi_from_sink(
               spark, str(tmp_path / "hist")).collect()}
    want = {str(r.window_start.date()): r.psi
            for r in drift.windowed_psi(df, "value", "ts", lo=0.0, hi=300.0,
                                        n_buckets=30).collect()}
    assert got == want                      # exact numeric agreement
    assert got["2026-03-04"] > 1.0          # the shift is visible
    assert got["2026-03-02"] < 0.01


def test_audio_clipping_ratio(spark):
    """Clipping detector: a saturated square wave reads ~1.0, a clean
    half-scale sine ~0.0."""
    import numpy as np
    from remark_lint_frontmatter_schema_spark.functions import audio as au
    sr = 16000
    n = sr // 10
    # wav_bytes takes int16 samples; full-scale square vs half-scale sine
    square = (np.sign(np.sin(2 * np.pi * 440 * np.arange(n) / sr))
              * 32767).astype("<i2")
    sine = (0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / sr)
            * 32767).astype("<i2")
    df = spark.createDataFrame(
        [("sq", bytearray(au.wav_bytes(square, sr))),
         ("si", bytearray(au.wav_bytes(sine, sr)))],
        "clip_id string, bytes binary")
    got = {r.clip_id: r.clipping_ratio
           for r in au.audio_features(df).collect()}
    assert got["sq"] > 0.95
    assert got["si"] == 0.0
