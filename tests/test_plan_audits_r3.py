"""Physical-plan audits for the round-3 continuation operators: the
scale properties their docstrings promise must be visible in the
executed plan."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import dedup
from remark_lint_frontmatter_schema_spark.operators.drift import benford
from remark_lint_frontmatter_schema_spark.operators.mmd import mmd_drift
from remark_lint_frontmatter_schema_spark.operators.reconcile import (
    reconcile)
from remark_lint_frontmatter_schema_spark.operators.sampling import (
    weighted_sample)
from remark_lint_frontmatter_schema_spark.operators.skew import (
    heavy_hitters, skew_profile)
from remark_lint_frontmatter_schema_spark.operators.text import zipf_fit


@pytest.fixture(autouse=True)
def _release():
    yield
    dedup.release_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_profile_topk_is_take_ordered(spark):
    df = spark.createDataFrame([(f"k{i % 9}",) for i in range(200)],
                               "k string").repartition(4)
    plan = _plan(skew_profile(df, "k"))
    assert "TakeOrderedAndProject" in plan  # never a global Sort+Limit
    # the scalar top-k relation broadcasts onto the one-row moments
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan  # pure JVM throughout


def test_heavy_hitters_sketch_runs_before_any_exchange(spark):
    """The whole point of the MG sketch: per-INPUT-partition summaries,
    so the MapInPandas stage must sit below the first Exchange — the
    shuffle carries capacity-bounded summaries, not rows."""
    df = spark.createDataFrame([(f"k{i % 50}",) for i in range(500)],
                               "k string")
    plan = _plan(heavy_hitters(df, "k", capacity=64, top_k=5))
    assert "MapInPandas" in plan
    # toString prints children below their consumers: the segment from
    # the first MapInPandas down to its source scan must hold no
    # Exchange — the sketch consumes raw input partitions
    below = plan.partition("MapInPandas")[2]
    sketch_input = below[:below.index("Scan")]
    assert "Exchange" not in sketch_input, plan
    # ...while the merge above it IS the narrow keyed shuffle
    assert "Exchange hashpartitioning(key" in plan
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_is_map_plus_take_ordered(spark):
    df = spark.createDataFrame([(i, 1.0 + i % 5) for i in range(300)],
                               "id long, w double")
    plan = _plan(weighted_sample(df, "id", "w", 10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # zero shuffle: score is a pure map
    assert "EvalPython" not in plan


def test_zipf_topk_before_rank_window(spark):
    docs = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta",)] * 50, "text string")
    plan = _plan(zipf_fit(docs, "text", top_k=5))
    # top-k must be TakeOrderedAndProject (per-partition top-k) so the
    # unpartitioned rank window only ever sees <= top_k rows; children
    # print BELOW consumers in toString, so the bounded top-k must
    # appear after the Window that consumes it
    assert "TakeOrderedAndProject" in plan
    assert plan.index("TakeOrderedAndProject") > plan.index("Window"), \
        "rank window must consume the bounded top-k relation"


def test_reconcile_aggregates_map_side_and_joins_equi(spark):
    fact = spark.createDataFrame([(i % 20, float(i)) for i in range(400)],
                                 "k long, v double").repartition(4)
    dim = spark.createDataFrame([(i, float(i)) for i in range(20)],
                                "k long, total double")
    plan = _plan(reconcile(fact, dim, key="k", fact_value="v",
                           dim_value="total"))
    assert "partial_sum" in plan  # map-side combine on the fact agg
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_benford_single_aggregate_pure_jvm(spark):
    df = spark.createDataFrame([(float(i + 1),) for i in range(100)],
                               "v double").repartition(4)
    plan = _plan(benford(df, "v"))
    assert "EvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side
    assert "CartesianProduct" not in plan


def test_mmd_partials_before_exchange(spark):
    rows = [("a" if i % 2 == 0 else "b", [float(i), 1.0])
            for i in range(100)]
    df = spark.createDataFrame(rows, "side string, emb array<float>")
    plan = _plan(mmd_drift(df, "emb", "side", "a", "b", dim=2,
                           n_features=8))
    assert "MapInPandas" in plan
    below = plan.partition("MapInPandas")[2]
    # nothing between the feature-sum stage and its scan: per-batch
    # partials shuffle, never per-row features
    assert "Exchange" not in below[:below.index("Scan")], plan


def test_winnow_normalized_text_staged_once_below_generate(spark):
    """winnow_fingerprints: the normalized text must be a materialized
    projection attribute below the Generate — re-inlining the
    regexp_replace into the per-gram lambda would be O(len^2) per doc.
    One occurrence is the projection; the second is the pushed-down
    length filter (per-row, acceptable); never a third inside the
    HOF."""
    df = spark.createDataFrame([(1, "The quick  Brown fox")],
                               "doc_id int, text string")
    plan = dedup.winnow_fingerprints(df, "text", "doc_id") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_replace") <= 2, plan


def test_containment_pairs_no_cartesian(spark):
    """containment_pairs joins on the block key — never a cartesian or
    nested-loop product of the corpus with itself."""
    df = spark.createDataFrame(
        [(i, f"some words here number {i} extended with more tokens "
             f"to clear the shingle floor", "en") for i in range(20)],
        "doc_id int, text string, lang string")
    plan = _plan(dedup.containment_pairs(df, "text", "doc_id",
                                         block_col="lang", n=3,
                                         threshold=0.1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cm_sketch_is_pure_jvm_and_estimate_broadcasts(spark):
    """count_min_sketch: one explode + hash aggregate, pure JVM;
    cm_estimate joins the depth*width sketch by broadcast (map-side
    probe, no shuffle of the probe side on (seed, bucket))."""
    from remark_lint_frontmatter_schema_spark.operators.skew import (
        cm_estimate, count_min_sketch)
    df = spark.createDataFrame([(f"k{i % 5}",) for i in range(100)],
                               ["key"]).repartition(4)
    sk = count_min_sketch(df, "key", width=32, depth=3)
    assert "EvalPython" not in _plan(sk)
    est = cm_estimate(sk, df.select("key").distinct(), "key",
                      width=32, depth=3)
    plan = _plan(est)
    assert "BroadcastExchange" in plan and "EvalPython" not in plan


def test_stickiness_day_grid_broadcasts(spark):
    """stickiness: the day-grid range join must broadcast the tiny grid
    side — a sort-merge range join of (day,user) against days would
    shuffle the full distinct relation per window."""
    from datetime import datetime
    from remark_lint_frontmatter_schema_spark.operators.cohort import (
        stickiness)
    df = spark.createDataFrame(
        [(f"u{i % 7}", datetime(2024, 1, 1 + i % 9)) for i in range(100)],
        "user_id string, ts timestamp")
    plan = _plan(stickiness(df, "user_id", "ts"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
