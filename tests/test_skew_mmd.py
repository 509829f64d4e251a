"""skew_profile / heavy_hitters / skew_violations / mmd_drift."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import dedup
from remark_lint_frontmatter_schema_spark.operators.mmd import (
    mmd_drift, mmd_reference)
from remark_lint_frontmatter_schema_spark.operators.skew import (
    heavy_hitters, key_counts, skew_profile, skew_violations)


@pytest.fixture(autouse=True)
def _release():
    yield
    dedup.release_all()


def _skewed_df(spark, n_hot=900, n_cold=100):
    # one hot key + unique cold keys
    rows = [("hot",)] * n_hot + [(f"k{i}",) for i in range(n_cold)]
    return spark.createDataFrame(rows, "k string")


def test_skew_profile_values(spark):
    df = _skewed_df(spark)  # 1000 rows, 101 keys, max 900
    row = skew_profile(df, "k", top_k=2).collect()[0]
    assert row.key_col == "k"
    assert row.n_rows == 1000 and row.n_keys == 101
    assert row.max_count == 900
    assert row.max_share == pytest.approx(0.9)
    assert row.top_k_share == pytest.approx(0.901)  # hot + one cold
    assert row.avg_count == pytest.approx(1000 / 101, abs=1e-6)
    assert row.skew_ratio == pytest.approx(900 * 101 / 1000, abs=1e-6)
    # exact entropy: p_hot=0.9, 100 keys at 0.001
    h = -(0.9 * math.log2(0.9) + 100 * 0.001 * math.log2(0.001))
    assert row.entropy_norm == pytest.approx(h / math.log2(101), abs=1e-6)
    assert row.recommended_salts == math.ceil(900 * 101 / 1000)


def test_skew_profile_uniform_and_degenerate(spark):
    even = spark.createDataFrame([(f"k{i % 4}",) for i in range(400)],
                                 "k string")
    r = skew_profile(even, "k").collect()[0]
    assert r.max_share == pytest.approx(0.25)
    assert r.entropy_norm == pytest.approx(1.0)
    assert r.skew_ratio == pytest.approx(1.0)
    assert r.recommended_salts == 1
    one = spark.createDataFrame([("only",)] * 10, "k string")
    r1 = skew_profile(one, "k").collect()[0]
    assert r1.n_keys == 1 and r1.entropy_norm is None
    assert r1.max_share == pytest.approx(1.0)


def test_skew_profile_ignores_nulls(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)],
                               "k string")
    r = skew_profile(df, "k").collect()[0]
    assert r.n_rows == 3 and r.n_keys == 2 and r.max_count == 2


def test_heavy_hitters_exact_mode_matches_groupby(spark):
    df = _skewed_df(spark, n_hot=500, n_cold=60).repartition(8)
    # capacity far above distinct-per-partition -> zero error, exact
    hh = heavy_hitters(df, "k", capacity=1024, top_k=10).collect()
    exact = (key_counts(df, "k").orderBy(F.desc("cnt"), F.asc("k"))
             .limit(10).collect())
    assert [(r.key, r.count_min, r.count_max) for r in hh] == \
        [(r.k, r.cnt, r.cnt) for r in exact]


def test_heavy_hitters_bounds_under_pruning(spark):
    # 1 hot key (400 rows) + 300 unique cold keys, tiny capacity: the
    # hot key must survive (freq > n/capacity) with a valid interval
    rows = [("hot",)] * 400 + [(f"c{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = heavy_hitters(df, "k", capacity=16, top_k=5).collect()
    top = got[0]
    assert top.key == "hot"
    assert top.count_min <= 400 <= top.count_max
    for r in got:
        assert r.count_min <= r.count_max


def test_heavy_hitters_single_partition_guarantee(spark):
    # classic MG guarantee on one partition: est within n/capacity
    rows = [(f"k{i % 10}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string").coalesce(1)
    got = heavy_hitters(df, "k", capacity=5, top_k=10).collect()
    for r in got:
        assert r.count_min <= 100 <= r.count_min + 1000 / 5 + 1


def test_skew_violations_fire_and_pass(spark):
    df = _skewed_df(spark)
    v = skew_violations(df, "k", max_share=0.5).collect()
    assert len(v) == 1
    assert v[0].keyword == "x-skew" and v[0].constraint_id == "skew:k"
    assert "salts" in v[0].message and float(v[0].actual) == 0.9
    ok = skew_violations(df, "k", max_share=0.95).collect()
    assert ok == []


def test_x_skew_declarative(spark):
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        compile_ruleset)
    df = _skewed_df(spark).withColumn("row", F.monotonically_increasing_id())
    doc = {"type": "object",
           "properties": {"k": {"type": "string",
                                "x-skew": {"max_share": 0.5}}}}
    compiled = compile_ruleset(doc, df.schema, name="t")
    assert ("skew", "k", {"max_share": 0.5, "top_k": 10, "by": None,
                          "severity": "warning"}) in [
        (k, c, p) for k, c, p in compiled.table_checks]
    out = table_check_violations(df, compiled, row_id="row")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].keyword == "x-skew"


def test_x_skew_rejects_bad_params(spark):
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError, compile_ruleset)
    df = _skewed_df(spark)
    bad = {"type": "object",
           "properties": {"k": {"type": "string", "x-skew": {}}}}
    with pytest.raises(RulesetCompileError):
        compile_ruleset(bad, df.schema, name="t")


def _emb_df(spark, xa, xb):
    rows = ([("a", [float(v) for v in x]) for x in xa]
            + [("b", [float(v) for v in x]) for x in xb])
    return spark.createDataFrame(rows, "side string, emb array<float>")


def test_mmd_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    xa = rng.normal(0, 1, size=(300, 8)).astype(np.float32)
    xb = rng.normal(1.0, 1, size=(250, 8)).astype(np.float32)
    df = _emb_df(spark, xa, xb).repartition(5)
    row = mmd_drift(df, "emb", "side", "a", "b",
                    n_features=64, seed=3).collect()[0]
    ref = mmd_reference(xa.astype(np.float64), xb.astype(np.float64),
                        n_features=64, seed=3)
    assert row.n_a == 300 and row.n_b == 250
    assert row.mmd2 == pytest.approx(ref, abs=1e-6)
    assert row.mmd == pytest.approx(math.sqrt(max(ref, 0.0)), abs=1e-6)


def test_mmd_same_vs_shifted(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, size=(600, 6))
    same = _emb_df(spark, base[:300], base[300:])
    r_same = mmd_drift(same, "emb", "side", "a", "b",
                       n_features=128, seed=5).collect()[0]
    shifted = _emb_df(spark, base[:300], base[300:] + 2.0)
    r_shift = mmd_drift(shifted, "emb", "side", "a", "b",
                        n_features=128, seed=5).collect()[0]
    assert r_same.mmd2 < 0.02
    assert r_shift.mmd2 > 0.2
    assert r_shift.mmd2 > 10 * r_same.mmd2


def test_mmd_ignores_bad_vectors_and_other_sides(spark):
    rows = [("a", [0.0, 0.0]), ("a", None), ("c", [1.0, 1.0]),
            ("b", [0.5, 0.5]), ("b", [9.0])]  # wrong length dropped
    df = spark.createDataFrame(rows, "side string, emb array<float>")
    r = mmd_drift(df, "emb", "side", "a", "b", dim=2,
                  n_features=16).collect()[0]
    assert r.n_a == 1 and r.n_b == 1


def test_mmd_empty_raises(spark):
    df = spark.createDataFrame([], "side string, emb array<float>")
    with pytest.raises(ValueError):
        mmd_drift(df, "emb", "side", "a", "b")


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(data=st.lists(st.integers(0, 30), min_size=1, max_size=400),
       capacity=st.integers(1, 40),
       parts=st.integers(1, 6))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_heavy_hitters_mg_guarantees(spark, data, capacity, parts):
    """Mergeable-summaries invariants on random streams: every returned
    interval contains the true count, and every key with frequency
    > n/capacity is present in the merged summary."""
    from collections import Counter
    df = spark.createDataFrame([(str(k),) for k in data], "k string") \
        .repartition(parts)
    got = {r.key: (r.count_min, r.count_max)
           for r in heavy_hitters(df, "k", capacity=capacity,
                                  top_k=10_000).collect()}
    true = Counter(str(k) for k in data)
    n = len(data)
    for k, (lo, hi) in got.items():
        assert lo <= true[k] <= hi, (k, lo, true[k], hi)
    for k, c in true.items():
        if c > n / capacity:
            assert k in got, (k, c, n, capacity)


def test_mmd_empty_side_yields_null_stats(spark):
    rows = [("a", [1.0, 0.0]), ("a", [0.5, 0.5])]
    df = spark.createDataFrame(rows, "side string, emb array<float>")
    r = mmd_drift(df, "emb", "side", "a", "b", dim=2,
                  n_features=8).collect()[0]
    assert r.n_a == 2 and r.n_b == 0
    assert r.mmd2 is None and r.mmd is None


def test_count_min_never_undercounts_and_merges(spark):
    """CM sketch: est >= exact for every key (one-sided by
    construction); sketches are additive — cells of sketch(A) summed
    with sketch(B) equal the cells of sketch(A union B); an unseen key's
    estimate is bounded by collision mass, never negative."""
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark.operators.skew import (
        cm_estimate, count_min_sketch)
    import pytest as _p
    a = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(70)] + [("hot",)] * 50, ["key"])
    b = spark.createDataFrame([(f"k{i % 3}",) for i in range(30)], ["key"])
    width, depth = 64, 4
    sk_a = count_min_sketch(a, "key", width=width, depth=depth)
    sk_b = count_min_sketch(b, "key", width=width, depth=depth)
    union = count_min_sketch(a.unionAll(b), "key",
                             width=width, depth=depth)
    merged = (sk_a.unionByName(sk_b)
              .groupBy("seed", "bucket", "width", "depth")
              .agg(F.sum("n").alias("n"))
              .select("seed", "bucket", "n", "width", "depth"))
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, union.collect()))
    # never undercount vs exact
    exact = {r.key: r.cnt for r in
             a.unionAll(b).groupBy("key")
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    keys = a.unionAll(b).select("key").distinct()
    est = {r.key: r.est for r in cm_estimate(
        union, keys, "key", width=width, depth=depth).collect()}
    assert est.keys() == exact.keys()
    assert all(est[k] >= exact[k] for k in exact)
    assert est["hot"] >= 50
    # unseen key: estimate is collision mass only (>= 0, << total)
    ghost = spark.createDataFrame([("never-seen",)], ["key"])
    (g,) = cm_estimate(union, ghost, "key",
                       width=width, depth=depth).collect()
    assert 0 <= g.est <= 30
    with _p.raises(ValueError, match="width"):
        count_min_sketch(a, "key", width=1)
    # probing with mismatched parameters must RAISE, not undercount:
    # a width-upsized probe derives cells the sketch never filled and
    # min() would read 0 for real keys
    from pyspark.errors import SparkRuntimeException
    with _p.raises(SparkRuntimeException, match="different parameters"):
        cm_estimate(union, keys, "key", width=width * 2,
                    depth=depth).collect()
    with _p.raises(SparkRuntimeException, match="different parameters"):
        cm_estimate(union, keys, "key", width=width,
                    depth=depth + 1).collect()
