"""Per-document readability / lexical diversity and corpus Heaps'-law
fit (operators/text.py readability, lexical_diversity, heaps_fit).

Hand-computed values on tiny fixtures plus the semantic contrasts each
metric exists for (templated vs gibberish, saturating vs growing
vocabulary)."""

import math

import pytest

from remark_lint_frontmatter_schema_spark.operators import text


def test_readability_hand_value(spark):
    # "the cat sat. it sat!" -> words 6? no: tokens = the,cat,sat.,it,sat!
    # = 5; sentences = 2 ([.] and [!]); syllables: e,a,a,i,a = 5 groups
    df = spark.createDataFrame([(1, "the cat sat. it sat!")],
                               ["doc_id", "t"])
    r = text.readability(df, "t", "doc_id").first()
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 5)
    want = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert abs(r.flesch - want) < 1e-9


def test_readability_guards(spark):
    df = spark.createDataFrame(
        [(1, "no terminal punctuation here"),   # clamp sentences to 1
         (2, ""),                                # zero words -> NULL score
         (3, None)],                             # NULL text -> NULL score
        "doc_id int, t string")
    rows = {r.doc_id: r for r in
            text.readability(df, "t", "doc_id").collect()}
    assert rows[1].n_sentences == 1 and rows[1].flesch is not None
    assert rows[2].n_words == 0 and rows[2].flesch is None
    # NULL text: NULL counts throughout — never F.size's legacy -1
    assert rows[3].flesch is None and rows[3].n_words is None
    assert rows[3].n_sentences is None and rows[3].n_syllables is None
    # telegraphic fragments score far above run-on prose
    frag = spark.createDataFrame([(1, "go. go. go. go.")], ["doc_id", "t"])
    runon = spark.createDataFrame(
        [(1, "notwithstanding extraordinary considerations regarding "
             "institutional responsibilities and obligations")],
        ["doc_id", "t"])
    assert (text.readability(frag, "t", "doc_id").first().flesch
            > text.readability(runon, "t", "doc_id").first().flesch + 50)


def test_lexical_diversity_contrast(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam eggs"),        # templated: tiny TTR
         (2, "qzx wvu plk mno abc"),             # gibberish: all hapax
         (3, "The the THE only")],               # case-folded types
        ["doc_id", "t"])
    rows = {r.doc_id: r for r in
            text.lexical_diversity(df, "t", "doc_id").collect()}
    assert rows[1].n_tokens == 5 and rows[1].n_types == 2
    assert rows[1].n_hapax == 1 and abs(rows[1].ttr - 0.4) < 1e-9
    assert rows[2].ttr == 1.0 and rows[2].hapax_ratio == 1.0
    assert rows[3].n_types == 2 and rows[3].n_hapax == 1
    # no-token documents produce no row
    empty = spark.createDataFrame([(9, "   ")], ["doc_id", "t"])
    assert text.lexical_diversity(empty, "t", "doc_id").count() == 0


def test_heaps_fit_beta_extremes(spark):
    # every token globally unique -> V(N) = N -> beta ~ 1, K ~ 1
    uniq = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(20)))
         for i in range(40)], ["doc_id", "t"])
    r = text.heaps_fit(uniq, "t", "doc_id", n_points=10).first()
    assert abs(r.beta - 1.0) < 1e-6 and abs(r.k - 1.0) < 1e-6
    assert r.r2 > 0.999999
    # constant tiny vocabulary -> growth saturates -> beta near 0
    flat = spark.createDataFrame(
        [(i, "alpha beta gamma " * 5) for i in range(40)],
        ["doc_id", "t"])
    r2 = text.heaps_fit(flat, "t", "doc_id", n_points=10).first()
    assert r2.beta < 0.05
    # natural-ish mixture sits strictly between
    mix = spark.createDataFrame(
        [(i, "the a of and " + " ".join(f"w{i}_{j}" for j in range(4)))
         for i in range(40)], ["doc_id", "t"])
    rm = text.heaps_fit(mix, "t", "doc_id", n_points=10).first()
    assert 0.05 < rm.beta < 1.0
    with pytest.raises(ValueError, match="n_points"):
        text.heaps_fit(uniq, "t", "doc_id", n_points=1)


def test_heaps_fit_negative_ids_clamped(spark):
    """A negative castable id must clamp into bucket 0, not mint a
    negative bucket that prepends a spurious sample point and skews the
    cumulative fit."""
    base = [(i, " ".join(f"tok{i}_{j}" for j in range(20)))
            for i in range(40)]
    r_pos = text.heaps_fit(
        spark.createDataFrame(base, ["doc_id", "t"]),
        "t", "doc_id", n_points=10).first()
    r_neg = text.heaps_fit(
        spark.createDataFrame(base + [(-5, "tokneg_a tokneg_b")],
                              ["doc_id", "t"]),
        "t", "doc_id", n_points=10).first()
    assert r_neg.n_points_fit <= 10
    # all-unique fixture: beta stays ~1 with the stray doc pooled into
    # bucket 0 instead of a phantom leading point
    assert abs(r_neg.beta - 1.0) < 0.02 and abs(r_pos.beta - 1.0) < 1e-6


def test_heaps_fit_bucket_window_is_bounded(spark):
    """The cumulative window must run over the <= n_points bucket
    relation, never a per-document global window: n_points_fit caps at
    n_points no matter how many documents exist."""
    df = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(200)], ["doc_id", "t"])
    r = text.heaps_fit(df, "t", "doc_id", n_points=7).first()
    assert r.n_points_fit <= 7


def test_x_readability_declarative(spark):
    """x-readability compiles to a table check and flags out-of-band
    docs; on a non-string column it lands in `unknown`, never a silent
    vacuous pass; a bad knob fails compile validation."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    df = spark.createDataFrame(
        [(1, "go. go. go. go. go. go."),       # fragments: flesch > 100
         (2, "the cat sat on the mat. it was a nice day for the cat.")],
        ["rid", "t"])
    rs = {"properties": {"t": {
        "x-readability": {"id": "rid", "lo": 10, "hi": 120}}}}
    compiled = compile_ruleset(rs, df.schema, name="read")
    got = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert len(got) == 1 and got[0].row_id == "1"
    assert got[0].keyword == "readability"
    assert "Flesch reading ease in [10, 120]" in got[0].message
    # non-string column -> unknown, not a check
    rs_bad = {"properties": {"rid": {
        "x-readability": {"id": "rid", "lo": 0}}}}
    c2 = compile_ruleset(rs_bad, df.schema, name="read2")
    assert ("/rid", "x-readability") in c2.unknown
    assert not c2.table_checks
    # lo > hi is rejected at compile time
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"t": {
            "x-readability": {"id": "rid", "lo": 90, "hi": 10}}}},
            df.schema, name="read3")


def test_tfidf_keywords_band_and_ranks(spark):
    """tfidf_keywords: the distinctive mid-frequency term wins; df-1
    terms (typos/ids) and ubiquitous terms fall outside the band; ranks
    tie-break by term; guard."""
    docs = [
        (1, "common shared alpha topic topic topic"),
        (2, "common shared alpha other"),
        (3, "common shared topic unique1"),
        (4, "common shared beta beta unique2"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, t string")
    got = {}
    for r in text.tfidf_keywords(df, "t", "doc_id", top_k=2,
                                 min_df=2, max_df_frac=0.6).collect():
        got.setdefault(r.id, []).append((r.rank, r.term))
    # 'common'/'shared' appear in 4/4 docs (> 0.6 band) -> never keywords;
    # 'unique1'/'unique2' have df 1 -> never keywords
    all_terms = {t for v in got.values() for _, t in v}
    assert "common" not in all_terms and "shared" not in all_terms
    assert "unique1" not in all_terms and "unique2" not in all_terms
    # doc1: 'topic' (tf 3, df 2) dominates 'alpha' (tf 1, df 2)
    assert got[1][0] == (1, "topic") and got[1][1] == (2, "alpha")
    # doc4's only distinctive term 'beta' has df 1 -> excluded, so doc4
    # has no eligible terms and produces no rows at all
    assert 4 not in got
    import pytest as _p
    with _p.raises(ValueError, match="top_k"):
        text.tfidf_keywords(df, "t", "doc_id", top_k=0)


def test_heaps_fit_ignores_null_and_uncastable_ids(spark):
    """NULL / uncastable ids are absent — they must not pile into the
    last bucket (F.least's null-skipping arm) and corrupt the fit."""
    rows = [(str(i), " ".join(f"tok{i}_{j}" for j in range(10)))
            for i in range(20)]
    rows += [(None, "null id tokens here"), ("docX", "uncastable id")]
    df = spark.createDataFrame(rows, "doc_id string, t string")
    r = text.heaps_fit(df, "t", "doc_id", n_points=5).first()
    # numeric-string ids cast fine; the two bad rows are simply absent
    assert r.n_points_fit >= 2 and abs(r.beta - 1.0) < 1e-6
