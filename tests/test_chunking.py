"""Token-window chunking (operators/chunking.py): boundary math vs the
pure-python plan, coverage/budget invariants, NULL semantics."""

import random

import pytest

from remark_lint_frontmatter_schema_spark.operators.chunking import (
    chunk_documents, chunk_plan)


def _doc(n):
    return " ".join(f"t{i}" for i in range(n))


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")


def test_known_boundaries(spark):
    # 10 tokens, max 4, overlap 1 -> starts 0,3,6 ; tail lands on token 9
    rows = chunk_documents(_df(spark, [_doc(10)]), "text", "doc_id",
                           max_tokens=4, overlap=1) \
        .orderBy("chunk_idx").collect()
    assert [(r.chunk_idx, r.n_tokens, r.chunk) for r in rows] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]
    assert chunk_plan(10, 4, 1) == [(0, 4), (3, 4), (6, 4)]


def test_short_doc_single_chunk_and_whitespace_canonicalized(spark):
    df = spark.createDataFrame([(1, "  a \t b\n c  ")],
                               "doc_id long, text string")
    rows = chunk_documents(df, "text", "doc_id", max_tokens=8).collect()
    assert [(r.chunk_idx, r.n_tokens, r.chunk) for r in rows] \
        == [(0, 3, "a b c")]


@pytest.mark.parametrize("n,max_tokens,overlap", [
    (1, 5, 0), (5, 5, 0), (6, 5, 0), (100, 7, 3), (64, 64, 63),
    (1000, 128, 16),
])
def test_spark_matches_python_plan(spark, n, max_tokens, overlap):
    rows = chunk_documents(_df(spark, [_doc(n)]), "text", "doc_id",
                           max_tokens=max_tokens, overlap=overlap) \
        .orderBy("chunk_idx").collect()
    plan = chunk_plan(n, max_tokens, overlap)
    assert [(r.chunk_idx, r.n_tokens) for r in rows] \
        == [(i, ln) for i, (_, ln) in enumerate(plan)]
    assert [r.chunk.split(" ")[0] for r in rows] \
        == [f"t{start}" for start, _ in plan]


def test_coverage_budget_overlap_invariants(spark):
    rng = random.Random(3)
    docs = [_doc(rng.randrange(1, 400)) for _ in range(30)]
    out = chunk_documents(_df(spark, docs), "text", "doc_id",
                          max_tokens=50, overlap=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(docs)))
    for doc_id, chunks in by_doc.items():
        n = len(docs[doc_id].split(" "))
        chunks.sort(key=lambda r: r.chunk_idx)
        plan = chunk_plan(n, 50, 10)
        assert [(r.chunk_idx, r.n_tokens) for r in chunks] \
            == [(i, ln) for i, (_, ln) in enumerate(plan)]
        seen = []
        for r, (start, _) in zip(chunks, plan):
            toks = r.chunk.split(" ")
            assert len(toks) == r.n_tokens <= 50
            assert toks[0] == f"t{start}"  # starts step tokens apart
            seen.append(toks)
        # every token covered, in order, no gaps
        covered = set()
        for toks in seen:
            covered.update(int(t[1:]) for t in toks)
        assert covered == set(range(n))


def test_null_and_empty_text_yield_no_chunks(spark):
    df = spark.createDataFrame([(1, None), (2, "   "), (3, "one")],
                               "doc_id long, text string")
    rows = chunk_documents(df, "text", "doc_id", max_tokens=4).collect()
    assert [(r.doc_id, r.chunk) for r in rows] == [(3, "one")]


def test_invalid_args_refused(spark):
    df = _df(spark, ["a"])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_plan(10, 5, -1)


def test_single_split_per_document_plan(spark):
    # the regex split must sit BELOW the Generate (once per doc, not per
    # chunk): no `split(` may appear above the Generate node
    df = _df(spark, [_doc(20)])
    plan = chunk_documents(df, "text", "doc_id", max_tokens=4,
                           overlap=1)._jdf.queryExecution() \
        .optimizedPlan().toString()
    above_generate = plan.split("Generate")[0]
    assert "split(" not in above_generate
    assert plan.count("split(") == 1
