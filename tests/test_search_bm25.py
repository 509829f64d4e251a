"""BM25 operator semantics pinned against a hand-computed reference
implementation on a tiny corpus (the full-table oracle lives in the
driver query)."""

import math
import re

import pytest

from remark_lint_frontmatter_schema_spark.operators.search import (
    bm25_scores, bm25_topk)

DOCS = [
    ("d1", "the quick brown fox jumps"),
    ("d2", "quick quick fox"),
    ("d3", "lazy dog sleeps all day"),
    ("d4", "fox and dog, friends; QUICK!"),
]


def _ref_scores(docs, queries, k1=1.2, b=0.75):
    toks = {d: [t for t in re.split(r"\W+", txt.lower()) if t]
            for d, txt in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / len(dl)
    n = len(docs)
    out = {}
    for qid, qtext in queries:
        terms = sorted({t for t in re.split(r"\W+", qtext.lower()) if t})
        for d, ts in toks.items():
            s = 0.0
            for t in terms:
                tf = ts.count(t)
                if not tf:
                    continue
                df = sum(1 for ts2 in toks.values() if t in ts2)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl[d] / avgdl))
            if s:
                out[(qid, d)] = s
    return out


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    queries = [("q1", "quick fox"), ("q2", "lazy dog")]
    got = {(r["query_id"], r["doc_id"]): r["score"]
           for r in bm25_scores(docs, queries).collect()}
    ref = _ref_scores(DOCS, queries)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-12), k


def test_bm25_topk_ranks_and_ties(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    rows = bm25_topk(docs, [("q", "quick fox")], k=2).collect()
    assert [r["rank"] for r in rows] == [1, 2]
    ref = _ref_scores(DOCS, [("q", "quick fox")])
    best = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0][1]))[:2]
    assert [r["doc_id"] for r in rows] == [d for (_, d), _ in best]


def test_bm25_duplicate_query_terms_count_once(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    a = {(r["query_id"], r["doc_id"]): r["score"]
         for r in bm25_scores(docs, [("q", "fox")]).collect()}
    b = {(r["query_id"], r["doc_id"]): r["score"]
         for r in bm25_scores(docs, [("q", "fox fox FOX")]).collect()}
    assert a == b


def test_bm25_requires_queries(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    with pytest.raises(ValueError, match="at least one"):
        bm25_scores(docs, [])


def test_bm25_plan_python_free(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    plan = bm25_topk(docs, [("q", "fox")])._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
