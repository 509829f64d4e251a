"""SemDeDup (operators/similarity.semdedup): k-means-blocked semantic
dedup with the paper's most-atypical-survivor rule.

Constructed corpus: three well-separated directions in 4-dim.
* Cluster A: four near-parallel vectors, one (a4) visibly off-axis — the
  whole set closes into one component at threshold 0.99 and a4 (lowest
  cosine to the cell centroid) must be the survivor.
* Cluster B: two byte-identical vectors — centroid sims tie, so the
  smaller id survives.
* Cluster C: a singleton — kept, no dup_of.
"""

import pytest

from remark_lint_frontmatter_schema_spark.operators import dedup, similarity

ROWS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [1.0, 0.01, 0.0, 0.0]),
    (3, [1.0, 0.0, 0.01, 0.0]),
    (4, [1.0, 0.1, 0.0, 0.0]),   # off-axis: most atypical in cluster A
    (10, [0.0, 1.0, 0.0, 0.0]),
    (11, [0.0, 1.0, 0.0, 0.0]),  # identical twin of 10
    (20, [0.0, 0.0, 1.0, 0.0]),  # singleton
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<float>")
    out = similarity.semdedup(df, "embedding", "vec_id", dim=4, n_cells=3,
                              threshold=0.99).collect()
    dedup.release_all()
    return {r.vec_id: r for r in out}


def test_every_row_labeled(result):
    assert set(result) == {1, 2, 3, 4, 10, 11, 20}


def test_atypical_survivor_in_cluster_a(result):
    assert result[4].kept is True and result[4].dup_of is None
    for vid in (1, 2, 3):
        assert result[vid].kept is False
        assert result[vid].dup_of == 4


def test_tie_breaks_to_smaller_id(result):
    assert result[10].kept is True
    assert result[11].kept is False and result[11].dup_of == 10


def test_singleton_kept(result):
    assert result[20].kept is True and result[20].dup_of is None


def test_centroid_sim_orders_cluster_a(result):
    # a4 sits farthest off the cell centroid; the parallel trio scores
    # higher — the survivor rule depends on exactly this ordering
    assert result[4].centroid_sim < min(
        result[v].centroid_sim for v in (1, 2, 3))


def test_where_kept_is_the_dedup(result):
    kept = {v for v, r in result.items() if r.kept}
    assert kept == {4, 10, 20}


def test_numpy_assignment_matches_jvm(spark):
    """assign_cells_np (the large-n_cells Arrow path) must agree with the
    unrolled JVM expression on cells AND centroid cosine."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]
    base = df.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
    jvm = {r.vec_id: r._cell for r in
           similarity.assign_cells(base, "v", cents).collect()}
    np_rows = {r.vec_id: r for r in
               similarity.assign_cells_np(base, "v", cents,
                                          with_sim=True).collect()}
    assert {k: v._cell for k, v in np_rows.items()} == jvm
    # cosine to own centroid, rounded to 5 — spot-check a known value
    assert abs(np_rows[4]._csim - 1.0 / (1.01 ** 0.5)) < 1e-4


def test_numpy_assignment_null_vector(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, [1.0, 0.0]), (2, None)],
                               "vec_id long, v array<double>")
    rows = {r.vec_id: r for r in
            similarity.assign_cells_np(df, "v", [[1.0, 0.0], [0.0, 1.0]],
                                       with_sim=True).collect()}
    assert rows[1]._cell == 0 and rows[2]._cell is None
    assert rows[2]._csim is None


def test_semdedup_numpy_path_matches_jvm_path(spark):
    """Force both paths over the same data + centroids: identical verdicts
    (the 3 given centroids run JVM; duplicating them past the unroll cap
    runs numpy — extra duplicate centroids never win an argmin tie, so
    assignments are unchanged)."""
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]
    a = similarity.semdedup(df, "embedding", "vec_id", dim=4,
                            threshold=0.99, centroids=cents)
    kept_a = {r.vec_id for r in a.collect() if r.kept}
    big = cents + [[9.0, 9.0, 9.0, 9.0]] * 15   # 18 cells -> numpy path
    b = similarity.semdedup(df, "embedding", "vec_id", dim=4,
                            threshold=0.99, centroids=big)
    kept_b = {r.vec_id for r in b.collect() if r.kept}
    dedup.release_all()
    assert kept_a == kept_b == {4, 10, 20}


def test_explicit_centroids_skip_training(spark):
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]
    out = similarity.semdedup(df, "embedding", "vec_id", dim=4,
                              threshold=0.99, centroids=cents)
    rows = {r.vec_id: r for r in out.collect()}
    dedup.release_all()
    assert {v for v, r in rows.items() if r.kept} == {4, 10, 20}
