"""n-gram LM perplexity: Spark vs pure-python twin, path equivalences."""

import math

import pytest

from remark_lint_frontmatter_schema_spark.operators import lm

from conftest import get_spark


TEXTS = {
    1: "the cat sat on the mat",
    2: "the cat sat on the cat",
    3: "completely different words entirely here",
    4: "",                      # empty -> NULL score
    5: "the the the the",       # degenerate repetition
    6: "Punct!!! and CAPS, and 123 numbers...",
    7: "a",                     # single token -> one bigram from BOS
}


def _docs_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in TEXTS.items()], "doc_id long, text string")


def _collect(df):
    return {r["doc_id"]: (r["n_ngrams"], r["avg_logp"], r["ppl"])
            for r in df.collect()}


@pytest.mark.parametrize("n", [2, 3])
@pytest.mark.parametrize("hash_keys", [True, False])
def test_matches_python_twin(n, hash_keys):
    spark = get_spark()
    docs = _docs_df(spark)
    model = lm.train_ngram_lm(docs, n=n, k=0.5, persist=False)
    got = _collect(lm.perplexity(docs, model, hash_keys=hash_keys))
    want = lm.perplexity_py(TEXTS, n=n, k=0.5)
    assert set(got) == set(want)
    for did, exp in want.items():
        g = got[did]
        if exp is None:
            assert g == (None, None, None), did
            continue
        assert g[0] == exp[0], did
        assert g[1] == pytest.approx(exp[1], abs=1e-9), did
        assert g[2] == pytest.approx(exp[2], rel=1e-9), did


def test_broadcast_and_persist_paths_identical():
    spark = get_spark()
    docs = _docs_df(spark)
    model = lm.train_ngram_lm(docs, n=2, k=0.25, persist=True)
    try:
        base = _collect(lm.perplexity(docs, model))
        bcast = _collect(lm.perplexity(docs, model, broadcast_model=True))
        assert base == bcast
    finally:
        lm.release_model(model)
    assert not model.ngram_counts.is_cached
    assert not model.ctx_counts.is_cached
    lm.release_model(model)  # idempotent


def test_cross_corpus_scoring_unseen_tokens():
    """Score a corpus under a model trained on different text: fully
    unseen context+token must get exactly ln(1/V)."""
    spark = get_spark()
    train = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(9, "zeta")], "doc_id long, text string")
    model = lm.train_ngram_lm(train, n=2, k=0.5, persist=False)
    # vocab = {alpha, beta, gamma} + 1 = 4
    assert model.vocab_size == 4
    row = lm.perplexity(score, model).collect()[0]
    # one bigram (<s>, zeta): C(<s>,zeta)=0 but C(<s>)=1 (alpha follows)
    want = math.log(0.5 / (1 + 0.5 * 4))
    assert row["avg_logp"] == pytest.approx(want, abs=1e-12)


def test_train_and_score_equals_two_phase():
    """The single-scan self-scoring path is row-identical to explicit
    train+score, releases its caches via the dedup registry, and stays
    pure-JVM (no EvalPython in the executed plan)."""
    from remark_lint_frontmatter_schema_spark.operators import dedup
    spark = get_spark()
    docs = _docs_df(spark)
    fused = lm.train_and_score(docs, n=2, k=0.5)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    got = _collect(fused)
    model = lm.train_ngram_lm(docs, n=2, k=0.5, persist=False)
    want = _collect(lm.perplexity(docs, model))
    dedup.release_all()
    assert got == want
    with pytest.raises(ValueError, match="n must be"):
        lm.train_and_score(docs, n=1)
    with pytest.raises(ValueError, match="k > 0"):
        lm.train_and_score(docs, k=-1.0)


def test_invalid_params():
    spark = get_spark()
    docs = _docs_df(spark)
    with pytest.raises(ValueError, match="n must be"):
        lm.train_ngram_lm(docs, n=1)
    with pytest.raises(ValueError, match="k > 0"):
        lm.train_ngram_lm(docs, k=0.0)


def test_x_lm_ppl_dsl_end_to_end():
    """x-lm-ppl flags exactly the outlier document; NULL/empty docs
    stay silent (shortness is minLength's finding); violation rows
    carry the standard shape."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators import dedup
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    rows = [(i, "the band plays a slow waltz under the amber lights")
            for i in range(8)]
    rows += [(98, "zxqv wvut qpon mlkj ihgf dcba"), (99, None)]
    df = get_spark().createDataFrame(
        rows, "doc_id long, text string")
    rs = {"type": "object", "properties": {
        "text": {"x-lm-ppl": {"id": "doc_id", "max_ppl": 4.0}}}}
    compiled = compile_ruleset(rs, df.schema, name="crawl")
    assert [k for k, _, _ in compiled.table_checks] == ["lm_ppl"]
    v = validate_with_table_checks(df, compiled, row_id="doc_id").violations
    got = {r.row_id: r for r in v.collect()}
    dedup.release_all()
    assert set(got) == {"98"}
    r = got["98"]
    assert r.keyword == "lm-ppl"
    assert r.schema_path == "#/x-lm-ppl/text"
    assert "at most 4" in r.message
    assert float(r.actual) > 4.0
    assert r.expected == ["<= 4"]


def test_x_lm_ppl_nested_and_malformed():
    import pyspark.sql.types as T
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    rs = {"properties": {"m": {"properties": {
        "k": {"x-lm-ppl": {"id": "id", "max_ppl": 50}}}}}}
    compiled = compile_ruleset(rs, schema, name="nested")
    assert ("/m/k", "x-lm-ppl") in compiled.unknown
    for bad in ({}, {"id": "id"}, {"max_ppl": 50}, {"id": "id", "max_ppl": 0},
                {"id": "id", "max_ppl": True},
                {"id": "id", "max_ppl": 50, "n": 1},
                {"id": "id", "max_ppl": 50, "k": 0}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"type": "object", "properties": {
                "id": {"x-lm-ppl": bad}}}, schema, name="bad")


def test_perplexity_orders_quality():
    """Within-corpus sanity: a document made of the corpus's dominant
    pattern scores lower perplexity than an outlier document."""
    spark = get_spark()
    rows = [(i, "the quick brown fox jumps over the lazy dog")
            for i in range(20)]
    rows.append((99, "zxqv wvut qpon mlkj ihgf"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = lm.train_ngram_lm(docs, n=2, persist=False)
    got = _collect(lm.perplexity(docs, model))
    assert got[0][2] < got[99][2]
