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
