"""Semantic (embedding-cosine) decontamination."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.operators.decontaminate import (
    semantic_overlap)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_exact_copy_and_paraphrase_hit_random_miss(spark):
    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, size=(6, 8))
    corpus = _df(spark,
                 [(i, [float(x) for x in base[i]]) for i in range(6)],
                 "id long, emb array<float>")
    # bench 100 = exact copy of corpus 0; bench 101 = tiny perturbation
    # of corpus 1; bench 102 = independent vector
    near = base[1] + 0.01 * rng.normal(0, 1, 8)
    bench = _df(spark,
                [(100, [float(x) for x in base[0]]),
                 (101, [float(x) for x in near]),
                 (102, [float(x) for x in rng.normal(0, 1, 8)])],
                "bid long, emb array<float>")
    got = {r.id: r for r in semantic_overlap(
        corpus, bench, vec_col="emb", id_col="id",
        bench_id_col="bid", threshold=0.98).collect()}
    assert set(got) == {0, 1}
    assert got[0].nearest_bench == 100 and got[0].max_sim == 1.0
    assert got[1].nearest_bench == 101 and got[1].max_sim > 0.99


def test_tiebreak_smallest_bench_id(spark):
    v = [1.0, 0.0]
    corpus = _df(spark, [(7, v)], "id long, emb array<float>")
    bench = _df(spark, [(20, v), (10, v)], "bid long, emb array<float>")
    got = semantic_overlap(corpus, bench, vec_col="emb", id_col="id",
                           bench_id_col="bid",
                           threshold=0.9).collect()
    assert len(got) == 1 and got[0].nearest_bench == 10


def test_threshold_guard_and_empty(spark):
    corpus = _df(spark, [(1, [1.0, 0.0])], "id long, emb array<float>")
    bench = _df(spark, [(2, [0.0, 1.0])], "bid long, emb array<float>")
    assert semantic_overlap(corpus, bench, vec_col="emb", id_col="id",
                            bench_id_col="bid",
                            threshold=0.5).collect() == []
    with pytest.raises(ValueError):
        semantic_overlap(corpus, bench, vec_col="emb", id_col="id",
                         bench_id_col="bid", threshold=0.0)
    with pytest.raises(ValueError):
        semantic_overlap(corpus, bench, vec_col="emb", id_col="id",
                         bench_id_col="bid", method="quadtree")


def test_lsh_route_matches_broadcast(spark):
    """The un-broadcastable-bench route: LSH buckets + in-bucket exact
    cosine must reproduce the broadcast result. Fixture mixes exact
    duplicates (theta=0 -> collide in every table, recall 1.0 by
    construction), tiny perturbations (collide with prob ~1 across 4
    tables), and independent vectors (must not appear)."""
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, size=(40, 16))
    corpus = _df(spark,
                 [(i, [float(x) for x in base[i]]) for i in range(40)],
                 "id long, emb array<float>")
    bench_rows = []
    for j in range(10):  # exact copies of corpus 0..9
        bench_rows.append((100 + j, [float(x) for x in base[j]]))
    bench_rows.append((300, [float(x) for x in rng.normal(0, 1, 16)]))
    bench = _df(spark, bench_rows, "bid long, emb array<float>")
    kw = dict(vec_col="emb", id_col="id", bench_id_col="bid",
              threshold=0.999)
    want = sorted(tuple(r) for r in semantic_overlap(
        corpus, bench, **kw).collect())
    got = sorted(tuple(r) for r in semantic_overlap(
        corpus, bench, method="lsh", n_bits=12, n_tables=4,
        **kw).collect())
    assert want  # fixture sanity: the broadcast route finds the copies
    assert got == want


def test_lsh_empty_bench_returns_empty(spark):
    corpus = _df(spark, [(1, [1.0, 0.0])], "id long, emb array<float>")
    bench = _df(spark, [], "bid long, emb array<float>")
    out = semantic_overlap(corpus, bench, vec_col="emb", id_col="id",
                           bench_id_col="bid", method="lsh")
    assert out.collect() == []
    assert out.columns == ["id", "nearest_bench", "max_sim"]


def test_lsh_single_corpus_scan_plan(spark):
    """All n_tables signatures ride one explode per side — the corpus
    subtree must appear ONCE in the candidate-join plan (n_tables scans
    of a 100 TB corpus is the bug this pins against)."""
    corpus = _df(spark, [(i, [float(i), 1.0]) for i in range(8)],
                 "id long, emb array<float>")
    bench = _df(spark, [(0, [0.0, 1.0])], "bid long, emb array<float>")
    out = semantic_overlap(corpus, bench, vec_col="emb", id_col="id",
                           bench_id_col="bid", method="lsh", dim=2,
                           n_tables=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate explode") == 2, plan
