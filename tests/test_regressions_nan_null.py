"""Regression tests for degenerate-input guards in the similarity / FD
operators: zero-norm vectors (cosine = 0/0 = NaN, which Spark orders ABOVE
every double), NULL vectors, and duplicate column names in projections."""

import pyspark.sql.functions as F
import pytest

from remark_lint_frontmatter_schema_spark.operators import dedup
from remark_lint_frontmatter_schema_spark.operators.fd import fd_violations
from remark_lint_frontmatter_schema_spark.operators.similarity import (
    embedding_lsh_pairs,
    embedding_near_dup_pairs,
    kmeans_centroids,
    semdedup,
)


@pytest.fixture()
def vec_df(spark):
    # two genuine near-dups (a,b), one far point (c), one ZERO vector (z)
    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("b", [0.999, 0.01, 0.0]),
        ("c", [0.0, 1.0, 0.0]),
        ("z", [0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "id string, v array<float>") \
                .withColumn("blk", F.lit(1))


def _ids_in_pairs(pairs):
    out = set()
    for r in pairs.collect():
        out.add(r["id_a"])
        out.add(r["id_b"])
    return out


def test_zero_vector_never_pairs_exact(vec_df):
    pairs = embedding_near_dup_pairs(vec_df, "v", "id", block_col="blk",
                                     threshold=0.9)
    ids = _ids_in_pairs(pairs)
    assert ids == {"a", "b"}  # zero vector glued to nothing
    dedup.release_all()


def test_zero_vector_never_pairs_lsh(vec_df):
    pairs = embedding_lsh_pairs(vec_df, "v", "id", n_bits=4, dim=3,
                                threshold=0.9)
    ids = _ids_in_pairs(pairs)
    # zero vector pairs with nothing; any pair that IS emitted can only
    # involve the genuine near-dups (a, b share a bucket or don't —
    # bucketing is probabilistic, but c/z must never appear)
    assert ids <= {"a", "b"}
    dedup.release_all()


def test_semdedup_zero_and_null_vectors(spark):
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.999, 0.02]),
        ("c", [0.0, 1.0]),
        ("z", [0.0, 0.0]),   # zero-norm: similar to nothing, always kept
        ("n", None),         # NULL: unscoreable, must not crash
    ]
    df = spark.createDataFrame(rows, "id string, v array<float>")
    out = semdedup(df, "v", "id", dim=2, n_cells=2, threshold=0.95)
    by_id = {r["id"]: r for r in out.collect()}
    assert by_id["z"]["kept"] is True
    assert by_id["z"]["dup_of"] is None
    # exactly one of the (a, b) twins survives
    assert [by_id["a"]["kept"], by_id["b"]["kept"]].count(True) == 1
    assert by_id["c"]["kept"] is True
    dedup.release_all()


def test_kmeans_centroids_tolerates_null_vectors(spark):
    rows = [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0]),
            ("n", None), ("m", None)]
    df = spark.createDataFrame(rows, "id string, v array<float>")
    cents = kmeans_centroids(df, "v", "id", 2, dim=2, n_iter=2)
    assert len(cents) == 2
    assert all(len(c) == 2 and all(x is not None for x in c)
               for c in cents)


def test_fd_violations_row_id_is_a_determinant(spark):
    # row_id doubles as the (single) determinant column: the projection
    # must not duplicate the name and make later references ambiguous
    rows = [("k1", "x"), ("k1", "x"), ("k1", "y"), ("k2", "x")]
    df = spark.createDataFrame(rows, "k string, dep string")
    out = fd_violations(df, "dep", ["k"], row_id="k")
    got = [(r["row_id"], r["actual"]) for r in out.collect()]
    assert got == [("k1", "y")]


def test_fd_violations_row_id_is_the_dependent(spark):
    rows = [("k1", "x"), ("k1", "x"), ("k1", "y")]
    df = spark.createDataFrame(rows, "k string, dep string")
    out = fd_violations(df, "dep", ["k"], row_id="dep")
    assert [r["actual"] for r in out.collect()] == ["y"]


def test_gibberish_violations_releasable(spark):
    from remark_lint_frontmatter_schema_spark.operators.text import (
        gibberish_violations,
    )
    df = spark.createDataFrame(
        [("1", "the quick brown fox jumps over the lazy dog"),
         ("2", "xq zv qx jq vq zx qz vx jx qj")],
        "id string, body string")
    before = len(dedup._PERSISTED)
    out = gibberish_violations(df, "body", "id", min_logp=-4.0)
    out.count()
    assert len(dedup._PERSISTED) > before  # handle registered
    dedup.release_all()
    assert len(dedup._PERSISTED) == 0


def test_kmeans_sampled_matches_distributed_on_small_data(spark):
    from remark_lint_frontmatter_schema_spark.operators.similarity import (
        kmeans_centroids,
    )
    rows = [(f"i{i}", [float(i % 7), float((i * 3) % 5)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "id string, v array<float>")
    # when the sample covers the whole table the driver-side Lloyd and
    # the distributed Lloyd see identical points -> identical centroids
    # (up to float-summation order)
    a = kmeans_centroids(df, "v", "id", 4, dim=2, n_iter=3)
    b = kmeans_centroids(df, "v", "id", 4, dim=2, n_iter=3,
                         train_sample_n=None)
    assert len(a) == len(b) == 4
    for ca, cb in zip(a, b):
        assert all(abs(x - y) < 1e-9 for x, y in zip(ca, cb))


def test_column_stats_nonfinite_robust(spark):
    from remark_lint_frontmatter_schema_spark.operators.stats import (
        column_stats,
    )
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, float("nan")), (4, float("inf")),
         (5, float("-inf")), (6, None), (7, 3.0)],
        "id long, v double")
    row = {r["column"]: r for r in column_stats(df, ["v", "id"]).collect()}
    v = row["v"]
    # min/max/quantiles describe the finite mass; non-finites counted
    assert v["n_nonfinite"] == 3
    assert v["min_value"] == "1.0" and v["max_value"] == "3.0"
    assert v["q_99"] == 3.0
    assert v["n_nulls"] == 1
    assert row["id"]["n_nonfinite"] == 0  # longs cannot hold NaN


def test_induce_bounds_ignore_nonfinite(spark):
    from remark_lint_frontmatter_schema_spark.operators.induce import induce
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, float("inf")), (4, 9.0)],
        "id long, v double")
    facts = induce(df, ["v"])
    assert facts["v"]["min"] == 1.0 and facts["v"]["max"] == 9.0


def test_histogram_nonfinite_semantics(spark):
    from remark_lint_frontmatter_schema_spark.operators.drift import (
        histogram, ks_statistic,
    )
    rows = ([(float(i % 10), "a") for i in range(100)]
            + [(float(i % 10), "b") for i in range(100)]
            + [(float("nan"), "b")] * 100
            + [(float("inf"), "a")] * 30
            + [(float("-inf"), "a")] * 20)
    df = spark.createDataFrame(rows, "v double, side string")
    h = histogram(df, "v", "side", lo=0.0, hi=10.0, n_buckets=10)
    by = {(r["side"], r["bucket"]): r["n"] for r in h.collect()}
    assert by[("b", -1)] == 100         # NaN -> real below-range bucket
    assert by[("a", 11)] == 30          # +Inf -> overflow bucket
    assert by[("a", 0)] == 20           # -Inf -> underflow bucket
    # a side acquiring NaNs MOVES the statistic (mass counts, no crash)
    ks = ks_statistic(h, "a", "b").collect()[0]["ks_stat"]
    assert ks is not None and ks > 0.1


def test_identical_nan_bearing_sides_show_zero_drift(spark):
    from remark_lint_frontmatter_schema_spark.operators.drift import (
        emd, histogram, ks_statistic, psi,
    )
    # 30% NaN on BOTH sides, identical distributions: every statistic
    # must read (near) zero — NaN rows must PAIR in the equi-joins, not
    # each face a zero-filled phantom
    rows = []
    for side in ("a", "b"):
        rows += [(float(i % 10), side) for i in range(70)]
        rows += [(float("nan"), side)] * 30
    df = spark.createDataFrame(rows, "v double, side string")
    h = histogram(df, "v", "side", lo=0.0, hi=10.0, n_buckets=10)
    assert ks_statistic(h, "a", "b").collect()[0]["ks_stat"] == 0.0
    assert emd(h, "a", "b").collect()[0]["emd"] == 0.0
    assert abs(psi(h, "a", "b").collect()[0]["psi"]) < 1e-9


def test_column_stats_all_null_float_reports_zero_nonfinite(spark):
    from remark_lint_frontmatter_schema_spark.operators.stats import (
        column_stats,
    )
    df = spark.createDataFrame([(1, None), (2, None)],
                               "id long, v double")
    v = {r["column"]: r for r in column_stats(df, ["v"]).collect()}["v"]
    assert v["n_nonfinite"] == 0 and v["n_nulls"] == 2
