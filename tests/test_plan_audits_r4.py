"""Round-4 plan audits: physical-plan properties of the new operators,
pinned so regressions show up as test failures (the r1-r3 discipline)."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_opus_packet_stats_is_map_only(spark):
    """Packet stats must be a single Arrow stage over (clip_id, bytes):
    no shuffle — the payload column never leaves its input partition."""
    from remark_lint_frontmatter_schema_spark.functions import audio
    df = spark.createDataFrame(
        [("c1", audio.ogg_opus_silence_bytes(1, audio_ms=40))],
        "clip_id string, bytes binary")
    plan = _plan(audio.opus_packet_stats(df))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan


def test_dtx_gate_single_python_stage(spark):
    """The gate filters the stats relation — still one Python crossing,
    no shuffle."""
    from remark_lint_frontmatter_schema_spark.functions import audio
    df = spark.createDataFrame(
        [("c1", audio.ogg_opus_silence_bytes(2, audio_ms=40))],
        "clip_id string, bytes binary")
    plan = _plan(audio.dtx_violations(df))
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_grouped_volume_single_aggregate_shuffle(spark):
    """volume_violations(by=) reduces the fact with ONE keys-only
    grouped aggregate; the median/MAD passes run on the bucket relation
    (broadcast back), never a second scan of the fact."""
    from datetime import datetime
    from remark_lint_frontmatter_schema_spark.operators.outliers import (
        volume_violations)
    df = spark.createDataFrame(
        [(str(i), "t", datetime(2024, 1, 1 + i % 9)) for i in range(50)],
        "rid string, typ string, ts timestamp")
    plan = _plan(volume_violations(df, "ts", unit="day", by="typ"))
    # no cartesian, group stats joined back by broadcast
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def test_grouped_mask_no_cartesian_and_partitioned_window(spark):
    from remark_lint_frontmatter_schema_spark.operators.stats import (
        mask_violations)
    df = spark.createDataFrame(
        [("us", "A#1"), ("de", "B#2"), ("us", "!!")],
        "c string, name string")
    plan = _plan(mask_violations(df, "name", expect="A#9", by="c"))
    assert "CartesianProduct" not in plan, plan
    # the top-offender window is PARTITIONED by the group key — a
    # global (unpartitioned) window would single-task the counts
    assert "Window" in plan, plan
    win = [ln for ln in plan.splitlines() if "Window" in ln][0]
    assert "_grp" in win, win
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_lsh_decontamination_no_cartesian(spark):
    """The LSH route must candidate-join on (table, bucket) — a plan
    with a cartesian/nested-loop over corpus x bench defeats it."""
    from remark_lint_frontmatter_schema_spark.operators.decontaminate import (
        semantic_overlap)
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "id long, emb array<float>")
    bench = spark.createDataFrame(
        [(0, [0.5, 1.0])], "bid long, emb array<float>")
    out = semantic_overlap(corpus, bench, vec_col="emb", id_col="id",
                           bench_id_col="bid", method="lsh", dim=2)
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_unrolled_dynamic_ref_stays_single_projection(spark):
    """Recursive-schema validation compiles into the same one-projection
    plan as any other ruleset: no joins, no shuffle before the verdict
    aggregate."""
    from remark_lint_frontmatter_schema_spark import (compile_ruleset,
                                                     validate)
    df = spark.createDataFrame(
        [(1, ("a", ("bb", None)))],
        "id int, tree struct<label:string, child:struct<"
        "label:string, child:string>>")
    rs = {"type": "object",
          "properties": {"tree": {
              "$dynamicAnchor": "n", "type": "object",
              "properties": {"label": {"minLength": 2},
                             "child": {"$dynamicRef": "#n"}}}}}
    compiled = compile_ruleset(rs, df.schema, name="dyn")
    plan = _plan(validate(df, compiled, row_id="id").violations)
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
