"""Corpus-level duplication operators: cross-document duplicated-ngram
fraction (Lee et al. 2022 partial-overlap metric) and C4/RefinedWeb-style
line dedup. Each is checked against a from-first-principles python twin
on crafted corpora (the driver oracle at sf0.01 covers the real tables)."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import dedup


# ---------------------------------------------------------------------------
# cross_doc_dup_fraction
# ---------------------------------------------------------------------------

CD_DOCS = [
    (1, "a b c d e f g h"),            # shares the 5-gram "d e f g h" with 2
    (2, "x y z d e f g h"),
    (3, "p q r s t u v w"),            # fully unique
    (4, "a b c d e f g h"),            # exact dup of 1 -> every shingle dup
    (5, "one two three"),              # < n tokens -> no shingles
    (6, None),                         # NULL text -> no shingles
    (7, "m m m m m m"),                # self-repeating but unique corpus-wide
]


def _py_shingles(text, n=5):
    toks = text.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_dup_fracs(rows, n=5):
    sh = {i: _py_shingles(t, n) if t else set() for i, t in rows}
    out = {}
    for i, s in sh.items():
        dup = sum(1 for g in s
                  if any(g in sh[j] for j in sh if j != i))
        out[i] = (len(s), dup,
                  round(dup / len(s), 6) if s else None)
    return out


@pytest.fixture(scope="module")
def cd_docs(spark):
    return spark.createDataFrame(CD_DOCS, "doc_id int, text string").cache()


def test_cross_doc_dup_fraction_matches_python_twin(cd_docs):
    got = {r.doc_id: (r.n_shingles, r.n_dup_shingles, r.dup_frac)
           for r in dedup.cross_doc_dup_fraction(
               cd_docs, "text", "doc_id", n=5).collect()}
    assert got == _py_dup_fracs(CD_DOCS, n=5)


def test_cross_doc_exact_dup_scores_one(cd_docs):
    got = {r.doc_id: r.dup_frac for r in dedup.cross_doc_dup_fraction(
        cd_docs, "text", "doc_id", n=5).collect()}
    assert got[1] == 1.0 and got[4] == 1.0          # exact dup pair
    assert got[3] == 0.0                             # fully unique
    assert got[7] == 0.0                             # self-repeat not penalized
    assert got[5] is None and got[6] is None         # nothing measurable
    assert 0.0 < got[2] < 1.0                        # partial overlap with 1


def test_word_shingles_distinct_and_short_guard(spark):
    df = spark.createDataFrame([("a b a b a b",), ("a b",)], "t string")
    staged = df.select(F.col("t"),
                       F.col("t").alias("raw"),
                       dedup.word_shingles(
                           F.split(F.col("t"), " "), 2).alias("s"))
    rows = {r.t: r.s for r in staged.collect()}
    # "a b a b a b" has 5 bigram positions but only 2 distinct bigrams
    assert sorted(rows["a b a b a b"]) == ["a b", "b a"]
    assert rows["a b"] == ["a b"]


# ---------------------------------------------------------------------------
# dedup_lines
# ---------------------------------------------------------------------------

BOILER = "subscribe to our newsletter today"
LD_DOCS = [
    (1, f"unique opening paragraph one\n{BOILER}\nreal body content one"),
    (2, f"{BOILER}\nreal body content two"),
    (3, "standalone document with no shared lines at all"),
    (4, f"real body content three\n{BOILER.upper()}  "),   # case+margin variant
    (5, "hi\nhi"),            # short line repeats: protected by min_line_chars
    (6, None),
    (7, f"{BOILER}"),         # document that is ONLY boilerplate
]


def test_dedup_lines_drops_corpus_boilerplate(spark):
    df = spark.createDataFrame(LD_DOCS, "doc_id int, text string")
    got = {r.doc_id: (r.text_clean, r.n_lines, r.n_dropped)
           for r in dedup.dedup_lines(df, "text", "doc_id",
                                      min_count=2).collect()}
    assert got[1] == ("unique opening paragraph one\nreal body content one",
                      3, 1)
    assert got[2] == ("real body content two", 2, 1)
    assert got[3] == ("standalone document with no shared lines at all", 1, 0)
    # case/trim variant counts toward the threshold AND is itself dropped
    assert got[4] == ("real body content three", 2, 1)
    # short repeated lines are never dropped
    assert got[5] == ("hi\nhi", 2, 0)
    # NULL text passes through as NULL with zero counts
    assert got[6] == (None, 0, 0)
    # all-boilerplate doc collapses to the empty string, not NULL
    assert got[7] == ("", 1, 1)


def test_dedup_lines_threshold_and_line_order(spark):
    line = "a line that appears exactly twice in corpus"
    df = spark.createDataFrame(
        [(1, f"z last alpha first\n{line}\nm middle line kept"),
         (2, f"{line}\nother content line here")],
        "doc_id int, text string")
    # min_count=3: two occurrences stay
    kept = {r.doc_id: r.text_clean for r in dedup.dedup_lines(
        df, "text", "doc_id", min_count=3).collect()}
    assert kept[1].splitlines() == ["z last alpha first", line,
                                    "m middle line kept"]
    # min_count=2 drops it; surviving lines keep DOCUMENT order (the
    # reassembly sorts by position, not by content)
    got = {r.doc_id: r.text_clean for r in dedup.dedup_lines(
        df, "text", "doc_id", min_count=2).collect()}
    assert got[1].splitlines() == ["z last alpha first", "m middle line kept"]
    assert got[2] == "other content line here"


def test_dedup_lines_shuffle_fallback_matches_broadcast(spark):
    df = spark.createDataFrame(LD_DOCS, "doc_id int, text string")
    a = sorted(map(tuple, dedup.dedup_lines(
        df, "text", "doc_id", min_count=2).collect()))
    b = sorted(map(tuple, dedup.dedup_lines(
        df, "text", "doc_id", min_count=2,
        broadcast_hot=False).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# x-dup-ngram DSL
# ---------------------------------------------------------------------------

def test_x_dup_ngram_end_to_end(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    df = spark.createDataFrame(CD_DOCS, "doc_id int, text string")
    compiled = compile_ruleset(
        {"type": "object", "properties": {"text": {
            "type": "string",
            "x-dup-ngram": {"id": "doc_id", "n": 5, "max_frac": 0.5}}}},
        df.schema, name="docs")
    assert compiled.table_checks == [
        ("dup_ngram", "text", {"id": "doc_id", "n": 5, "max_frac": 0.5,
                               "severity": "warning"})]
    res = validate_with_table_checks(df, compiled, row_id="doc_id")
    rows = {r.row_id: r for r in res.violations.collect()}
    # docs 1 and 4 are exact dups (frac 1.0 > 0.5); doc 2 shares one
    # 5-gram of four (0.25); 3/7 unique; 5/6 unmeasurable -> never flag
    assert set(rows) == {"1", "4"}
    assert rows["1"].keyword == "dup-ngram"
    assert rows["1"].actual == "1.0"
    assert "duplicated 5-gram" in rows["1"].message


def test_x_dup_ngram_nested_unknown_and_malformed(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    df = spark.createDataFrame(CD_DOCS, "doc_id int, text string")
    nested = {"type": "object", "properties": {"text": {
        "anyOf": [{"x-dup-ngram": {"id": "doc_id"}}, {"minLength": 1}]}}}
    compiled = compile_ruleset(nested, df.schema, name="docs")
    assert any(kw.startswith("x-dup-ngram") for _p, kw in compiled.unknown)
    for bad in ({"x-dup-ngram": {"n": 5}},                      # id missing
                {"x-dup-ngram": {"id": "doc_id", "max_frac": 1.5}},
                {"x-dup-ngram": {"id": "doc_id", "n": 0}}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset(
                {"type": "object", "properties": {"text": bad}},
                df.schema, name="docs")
