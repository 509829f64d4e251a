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


def test_explicit_centroids_skip_training(spark):
    df = spark.createDataFrame(ROWS, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]
    out = similarity.semdedup(df, "embedding", "vec_id", dim=4,
                              threshold=0.99, centroids=cents)
    rows = {r.vec_id: r for r in out.collect()}
    dedup.release_all()
    assert {v for v, r in rows.items() if r.kept} == {4, 10, 20}
