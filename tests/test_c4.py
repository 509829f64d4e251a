"""C4 cleaning recipe (operators/text.py:c4_clean): line rules, page
gates, NULL totality, python-twin parity on randomized pages."""

import random

import pytest

from remark_lint_frontmatter_schema_spark.operators.text import c4_clean


def _clean_py(text, min_words=5, min_sent=3):
    if text is None:
        return (None, 0, 0, False)
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    kept = [l for l in lines
            if l[-1] in '.!?"' and len(l.split()) >= min_words
            and "javascript" not in l.lower()]
    clean = "\n".join(kept)
    n_sent = sum(clean.count(ch) for ch in ".!?")
    keep = (n_sent >= min_sent and "{" not in text
            and "lorem ipsum" not in text.lower())
    return (clean, len(kept), len(lines) - len(kept), keep)


def _run(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    return {r.doc_id: (r.text_clean, r.n_lines_kept, r.n_lines_dropped,
                       r.page_keep)
            for r in c4_clean(df, "text", "doc_id").collect()}


def test_line_rules(spark):
    page = ("This line ends with a period and has many words.\n"
            "short line.\n"                          # < 5 words
            "No terminal punctuation on this line here\n"
            "Please enable JavaScript to view this page.\n"
            "Is this a question with enough words?\n"
            "A quoted sentence can end with a quote mark too.\"\n")
    got = _run(spark, [page])[0]
    assert got[0].split("\n") == [
        "This line ends with a period and has many words.",
        "Is this a question with enough words?",
        'A quoted sentence can end with a quote mark too."',
    ]
    assert got[1] == 3 and got[2] == 3 and got[3] is True


def test_page_gates(spark):
    ok = "One good sentence here today. Another one follows now. And a third closes it."
    got = _run(spark, [
        ok,                                      # keeps
        ok + "\nvar x = { a: 1 };",              # code brace
        ok.replace("Another", "Lorem Ipsum"),    # placeholder
        "Only one real sentence lives here.",    # < 3 sentences
        None,
    ])
    assert got[0][3] is True
    assert got[1][3] is False
    assert got[2][3] is False
    assert got[3][3] is False
    assert got[4] == (None, 0, 0, False)


def test_randomized_python_twin_parity(spark):
    rnd = random.Random(11)
    frags = ["good solid words fill this sentence.",
             "tiny.", "no punct words in line",
             "click here to enable javascript now.",
             "ask a longer question with words?",
             "brace { inside", "lorem ipsum dolor sit amet."]
    docs = ["\n".join(rnd.choices(frags, k=rnd.randint(1, 12)))
            for _ in range(60)] + [None, "", "   \n  "]
    got = _run(spark, docs)
    for i, d in enumerate(docs):
        assert got[i] == _clean_py(d), (i, d)


def test_guards(spark):
    df = spark.createDataFrame([(0, "x.")], "doc_id long, text string")
    with pytest.raises(ValueError):
        c4_clean(df, "text", "doc_id", min_words_per_line=0)
    with pytest.raises(ValueError):
        c4_clean(df, "text", "doc_id", min_sentences=0)


def test_x_c4_dsl_end_to_end(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    ok = ("One good sentence here today. Another one follows now. "
          "And a third closes it.")
    df = spark.createDataFrame(
        [(0, ok), (1, ok + "\n{ code }"), (2, "Too short."), (3, None)],
        "doc_id long, text string")
    compiled = compile_ruleset(
        {"type": "object", "properties": {"text": {
            "type": "string", "x-c4": {"id": "doc_id"}}}},
        df.schema, name="docs")
    assert compiled.table_checks == [
        ("c4", "text", {"id": "doc_id", "min_words_per_line": 5,
                        "min_sentences": 3, "severity": "warning"})]
    res = validate_with_table_checks(df, compiled, row_id="doc_id")
    got = {}
    for r in res.violations.collect():
        got.setdefault(r.row_id, set()).add(r.constraint_id)
    assert "0" not in got
    assert got["1"] == {"c4:text:brace"}
    assert got["2"] == {"c4:text:sentences"}
    assert got["3"] == {"c4:text:sentences"}    # NULL: content gates vacuous
    # nested -> unknown; malformed -> compile error
    nested = {"type": "object", "properties": {"text": {
        "anyOf": [{"x-c4": {"id": "doc_id"}}, {"minLength": 1}]}}}
    assert any(kw.startswith("x-c4")
               for _p, kw in compile_ruleset(nested, df.schema).unknown)
    for bad in ({"x-c4": {}}, {"x-c4": {"id": "doc_id", "min_sentences": 0}}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset(
                {"type": "object", "properties": {"text": bad}},
                df.schema, name="docs")
