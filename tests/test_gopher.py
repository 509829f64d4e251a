"""Gopher quality gates (operators/text.py:gopher_gates): each rule
triggered in isolation on crafted documents, NULL totality, and the
staged-plan discipline (one tokenization per document)."""

from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.text import gopher_gates


GOOD = ("the quick brown fox jumps over the lazy dog and then decides "
        "that it would be wise to have another run with friends today "
        "because exercise is good for every animal that wants to stay "
        "healthy and strong through all of the seasons of the year here") \
        * 1  # 48 words *... ensure >=50 below


def _gates(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_gates(df, "text", "doc_id").first()


def test_good_document_passes(spark):
    text = GOOD + " indeed truly also now"
    r = _gates(spark, text)
    assert r.word_count >= 50
    assert r.gopher_pass, r


def test_word_count_gate(spark):
    r = _gates(spark, "too short to pass the word count gate")
    assert not r.g_word_count and not r.gopher_pass


def test_mean_word_length_gate(spark):
    r = _gates(spark, " ".join(["a"] * 60))  # mwl = 1 < 3
    assert not r.g_mean_word_len


def test_symbol_ratio_gate(spark):
    base = GOOD + " indeed truly"
    r = _gates(spark, base + " " + "#" * 0 + "# # # # # # # # # # # # #")
    assert r.symbol_ratio > 0.1 and not r.g_symbol_ratio
    # ellipsis variants both count as symbols
    r2 = _gates(spark, "a ... b … c")
    assert r2.symbol_ratio == round(2 / 5, 6)


def test_bullet_and_ellipsis_line_gates(spark):
    lines = ["- bullet item number %d" % i for i in range(10)]
    r = _gates(spark, "\n".join(lines))
    assert r.bullet_line_frac == 1.0 and not r.g_bullet_lines
    lines = ["line %d goes on..." % i for i in range(10)]
    r2 = _gates(spark, "\n".join(lines))
    assert r2.ellipsis_line_frac == 1.0 and not r2.g_ellipsis_lines


def test_alpha_word_gate(spark):
    words = ["word%d" % i for i in range(10)] + ["123"] * 40
    r = _gates(spark, " ".join(words))
    assert r.alpha_word_frac == round(10 / 50, 6)
    assert not r.g_alpha_words


def test_stopword_gate(spark):
    r = _gates(spark, " ".join(["sphinx quartz vow"] * 20))
    assert r.stopword_hits == 0 and not r.g_stopwords
    r2 = _gates(spark, "the cat sat with a hat")
    assert r2.stopword_hits == 2 and r2.g_stopwords


def test_null_and_empty_total(spark):
    df = spark.createDataFrame([(0, None), (1, "")],
                               "doc_id long, text string")
    rows = gopher_gates(df, "text", "doc_id").orderBy("doc_id").collect()
    assert len(rows) == 2
    for r in rows:
        assert r.word_count == 0 and not r.gopher_pass
        # line gates vacuously true on empty docs
        assert r.g_bullet_lines and r.g_ellipsis_lines


def test_single_tokenization_in_plan(spark):
    """The split over \\s+ must appear exactly once (staged projection) —
    the HOF-CSE trap would multiply it per rule otherwise."""
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    plan = gopher_gates(df, "text", "doc_id") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count(r"\s+") == 1, plan      # token split staged once
    assert plan.count(r"\n") == 1, plan       # line split staged once


# ---------------------------------------------------------------------------
# x-gopher DSL
# ---------------------------------------------------------------------------

def test_x_gopher_end_to_end(spark):
    import pytest
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    good = GOOD + " indeed truly also now"
    df = spark.createDataFrame(
        [(0, good), (1, " ".join(["a"] * 60))], "doc_id long, text string")
    compiled = compile_ruleset(
        {"type": "object", "properties": {"text": {
            "type": "string", "x-gopher": {"id": "doc_id"}}}},
        df.schema, name="docs")
    assert compiled.table_checks == [
        ("gopher", "text", {"id": "doc_id", "rules": None,
                            "severity": "warning"})]
    res = validate_with_table_checks(df, compiled, row_id="doc_id")
    rows = res.violations.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.row_id, []).append(r)
    assert "0" not in by_doc                       # good doc clean
    bad = {r.constraint_id for r in by_doc["1"]}
    # 60 'a' tokens: mwl=1 fails, alpha passes, stopwords fail
    assert "gopher:text:mean_word_len" in bad
    assert "gopher:text:stopwords" in bad
    assert "gopher:text:word_count" not in bad     # 60 in [50, 100k]
    r = by_doc["1"][0]
    assert r.keyword == "gopher" and r.ruleset_id == "docs"
    assert r.instance_path == "/text"


def test_x_gopher_rules_subset(spark):
    from remark_lint_frontmatter_schema_spark.operators.text import (
        gopher_violations)
    df = spark.createDataFrame(
        [(1, " ".join(["a"] * 60))], "doc_id long, text string")
    rows = gopher_violations(df, "text", "doc_id",
                             rules=["word_count"]).collect()
    assert rows == []          # only the passing rule enabled
    rows = gopher_violations(df, "text", "doc_id",
                             rules=["mean_word_len"]).collect()
    assert len(rows) == 1 and rows[0].actual == "1.0"


def test_x_gopher_nested_unknown_and_malformed(spark):
    import pytest
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    from remark_lint_frontmatter_schema_spark.operators.text import (
        gopher_violations)
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    nested = {"type": "object", "properties": {"text": {
        "anyOf": [{"x-gopher": {"id": "doc_id"}}, {"minLength": 1}]}}}
    compiled = compile_ruleset(nested, df.schema, name="docs")
    assert any(kw.startswith("x-gopher") for _p, kw in compiled.unknown)
    for bad in ({"x-gopher": {}},                          # id missing
                {"x-gopher": {"id": "doc_id", "rules": []}},
                {"x-gopher": {"id": "doc_id", "rules": ["nope"]}}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset(
                {"type": "object", "properties": {"text": bad}},
                df.schema, name="docs")
    with pytest.raises(ValueError):
        gopher_violations(df, "text", "doc_id", rules=["nope"])
