"""encoding_scan (mojibake detection): pattern semantics against Python
re counts, NULL handling, and clean-text negatives."""

import re

from remark_lint_frontmatter_schema_spark.operators import text


CASES = {
    1: "perfectly clean ascii text, nothing wrong here.",
    2: "cafÃ© is a latin-1 read of UTF-8 café",  # cafÃ©
    3: "donâ€™t â€œquoteâ€",
    4: "decoder gave up: �� twice",
    5: "bare C1 control:" + chr(0x85) + "next line" + chr(0x9C) + "end",
    6: None,
    7: "",
    8: "legit français café naïve élève",  # real accents, no damage
}


def _twin(s):
    if s is None:
        return {f"n_{k}": 0 for k in text.MOJIBAKE_PATTERNS} | {
            "has_mojibake": False}
    counts = {f"n_{k}": len(re.findall(rx, s))
              for k, rx in text.MOJIBAKE_PATTERNS.items()}
    return counts | {"has_mojibake": any(v > 0 for v in counts.values())}


def test_encoding_scan_matches_python_re(spark):
    df = spark.createDataFrame(list(CASES.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: {k: r[k] for k in r.asDict() if k != "doc_id"}
           for r in text.encoding_scan(df, "text", "doc_id").collect()}
    for d, s in CASES.items():
        assert got[d] == _twin(s), f"doc {d}"


def test_real_accents_are_not_flagged(spark):
    df = spark.createDataFrame([(8, CASES[8]), (1, CASES[1])],
                               "doc_id long, text string")
    rows = text.encoding_scan(df, "text", "doc_id").collect()
    assert all(not r["has_mojibake"] for r in rows)


def test_double_encoded_forms_are_flagged(spark):
    # encode genuine text as UTF-8, decode as cp1252/latin-1 — the actual
    # damage pipeline, not hand-written sequences. errors="replace" because
    # 0x9D (trail byte of a curly close-quote) is undefined in cp1252; the
    # resulting U+FFFD is itself mojibake and counts in n_replacement.
    damaged_cp1252 = ("naïve café — “fancy”".encode("utf-8")
                      .decode("cp1252", errors="replace"))
    damaged_latin1 = "élève".encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [(1, damaged_cp1252), (2, damaged_latin1)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            text.encoding_scan(df, "text", "doc_id").collect()}
    assert rows[1]["has_mojibake"] and rows[2]["has_mojibake"]
    assert rows[1]["n_double_3byte"] >= 2  # the em-dash and curly quotes
    assert rows[2]["n_double_2byte"] >= 2  # é and è leads


# ---------------------------------------------------------------------------
# gibberish scoring (character-bigram perplexity proxy)
# ---------------------------------------------------------------------------

def test_gibberish_scores_separate_mash_from_language(spark):
    from remark_lint_frontmatter_schema_spark.operators import dedup
    from remark_lint_frontmatter_schema_spark.operators.text import (
        gibberish_scores)
    english = [
        "the band plays a slow waltz under the amber lights tonight",
        "she walks along the river while the evening settles in",
        "a reader turns the pages and the story carries on",
        "the morning train arrives and the platform fills with people",
        "he pours the coffee and watches the street below",
        "the garden grows quiet as the summer light fades",
    ]
    rows = [(i, t) for i, t in enumerate(english)]
    rows.append((90, "xq zjvkwq pzt qxkvj wzqx jkqv"))  # keyboard mash
    rows.append((91, "a"))                               # too short -> NULL
    rows.append((92, None))                              # NULL -> NULL
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           gibberish_scores(df, "text", "doc_id").collect()}
    dedup.release_all()
    assert got[91].avg_logp is None and got[92].avg_logp is None
    assert got[91].n_bigrams is None
    mash = got[90].avg_logp
    english_scores = [got[i].avg_logp for i in range(len(english))]
    # every real sentence scores strictly above the mash doc
    assert all(s > mash for s in english_scores), (mash, english_scores)
    # and the gap is a usable threshold margin, not noise
    assert min(english_scores) - mash > 0.5


def test_gibberish_python_twin(spark):
    """Exact parity with a pure-python reimplementation (normalization,
    self-model, natural-log average)."""
    import math
    import re
    from remark_lint_frontmatter_schema_spark.operators import dedup
    from remark_lint_frontmatter_schema_spark.operators.text import (
        gibberish_scores)
    docs = {1: "Hello, WORLD!!", 2: "aa bb aa", 3: "zz", 4: ""}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in
           gibberish_scores(df, "text", "doc_id").collect()}
    dedup.release_all()

    def norm(t):
        return re.sub("[^a-z]+", " ", t.lower()).strip()

    grams = {i: [norm(t)[j:j + 2] for j in range(len(norm(t)) - 1)]
             for i, t in docs.items() if len(norm(t)) >= 2}
    from collections import Counter
    model = Counter(g for gs in grams.values() for g in gs)
    total = sum(model.values())
    for i, gs in grams.items():
        want = round(sum(math.log(model[g] / total) for g in gs) / len(gs), 6)
        assert got[i].n_bigrams == len(gs)
        assert abs(got[i].avg_logp - want) < 1e-6, (i, got[i], want)
    assert got[4].avg_logp is None


def test_x_gibberish_and_url_dedup_dsl(spark):
    """Both new declarative checks end-to-end: x-gibberish flags the mash
    doc only; x-dedup method=url flags the non-canonical duplicate."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators import dedup
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    from pyspark.sql import functions as F
    rows = [
        (1, "the band plays a slow waltz under the amber lights tonight",
         "https://example.com/a"),
        (2, "she walks along the river while the evening settles in",
         "HTTPS://EXAMPLE.COM:443/a#frag"),
        (3, "a reader turns the pages and the story carries on",
         "https://example.com/b"),
        (4, "xq zjvkwq pzt qxkvj wzqx jkqv", "https://example.com/c"),
        (5, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    rs = {"type": "object", "properties": {
        "text": {"x-gibberish": {"id": "doc_id", "min_logp": -5.0}},
        "url": {"x-dedup": {"id": "doc_id", "method": "url"}},
    }}
    compiled = compile_ruleset(rs, df.schema, name="crawl")
    kinds = {k for k, _, _ in compiled.table_checks}
    assert kinds == {"gibberish", "dedup"}
    v = validate_with_table_checks(df, compiled, row_id="doc_id").violations
    got = {(r.keyword, r.row_id): r for r in v.collect()}
    dedup.release_all()
    assert ("gibberish", "4") in got
    assert got[("gibberish", "4")].actual.startswith("-")
    assert ("dedup", "2") in got   # canonical dup of 1 (min id survives)
    assert "canonical URL" in got[("dedup", "2")].message
    assert got[("dedup", "2")].actual == "1"
    # exactly those two violations — the clean rows and NULLs are silent
    assert set(got) == {("gibberish", "4"), ("dedup", "2")}


def test_x_gibberish_nested_and_malformed(spark):
    import pyspark.sql.types as T
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    import pytest
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    rs = {"properties": {"m": {"properties": {
        "k": {"x-gibberish": {"id": "id", "min_logp": -5}}}}}}
    compiled = compile_ruleset(rs, schema, name="nested")
    assert ("/m/k", "x-gibberish") in compiled.unknown
    for bad in ({}, {"id": "id"}, {"min_logp": -5},
                {"id": "id", "min_logp": True}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"type": "object", "properties": {
                "id": {"x-gibberish": bad}}}, schema, name="bad")


# --- round-3 repair half: fix_double_utf8 + normalize_text -------------------

def test_fix_double_utf8_repairs_and_preserves():
    from remark_lint_frontmatter_schema_spark.operators.text import (
        fix_double_utf8)
    s = "naïve café — don’t"
    bad = s.encode("utf-8").decode("latin-1")
    assert fix_double_utf8(bad) == s
    # clean text that merely LOOKS suspicious survives (reverse trip
    # fails to decode as UTF-8 -> unchanged)
    legit = "Ãrbol plain ascii"
    assert fix_double_utf8(legit) == legit
    assert fix_double_utf8("hello") == "hello"


def test_normalize_text_nfc_and_changed_flag(spark):
    from remark_lint_frontmatter_schema_spark.operators.text import (
        normalize_text)
    import unicodedata
    rows = [("a", "cafe\u0301 time"),     # decomposed -> changes
            ("b", "caf\u00e9 time"),       # already NFC -> unchanged
            ("c", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["id"]: r for r in normalize_text(df, "text", "doc_id").collect()}
    assert out["a"]["text_norm"] == "caf\u00e9 time" and out["a"]["changed"]
    assert out["b"]["text_norm"] == "caf\u00e9 time" and not out["b"]["changed"]
    assert out["c"]["text_norm"] is None and not out["c"]["changed"]
    assert unicodedata.is_normalized("NFC", out["a"]["text_norm"])


def test_normalize_text_with_repair_first(spark):
    from remark_lint_frontmatter_schema_spark.operators.text import (
        normalize_text)
    s = "naïve café"
    bad = s.encode("utf-8").decode("latin-1")
    df = spark.createDataFrame([("a", bad)], "doc_id string, text string")
    out = normalize_text(df, "text", "doc_id", fix_mojibake=True).collect()[0]
    assert out["text_norm"] == s and out["changed"]


def test_normalize_text_single_udf_crossing(spark):
    """The staged projection means ONE ArrowEvalPython in the plan."""
    from remark_lint_frontmatter_schema_spark.operators.text import (
        normalize_text)
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    plan = normalize_text(df, "text", "doc_id")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_normalize_text_rejects_bad_form(spark):
    from remark_lint_frontmatter_schema_spark.operators.text import (
        normalize_text)
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    import pytest
    with pytest.raises(ValueError, match="form"):
        normalize_text(df, "text", "doc_id", form="NFX")


# --- x-encoding: the declarative row-level gate ------------------------------

def test_x_encoding_dsl_gate(spark):
    from remark_lint_frontmatter_schema_spark import (
        compile_ruleset, validate)
    rows = [("a", "clean prose"),
            ("b", "cafÃ© menu"),                 # double-2byte artifact
            ("c", "donâ€™t"),     # 'â€™' cp1252 triple
            ("d", "bad � byte"),            # replacement char
            ("e", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    compiled = compile_ruleset(
        {"$id": "enc", "type": "object",
         "properties": {"text": {"x-encoding": {"max_artifacts": 0}}}},
        df.schema)
    res = validate(df, compiled, row_id="doc_id")
    got = {r["row_id"]: r["actual"] for r in res.violations.collect()}
    assert set(got) == {"b", "c", "d"}
    assert got["d"] == "1"
    # plan stays fully JVM
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_x_encoding_pattern_subset_and_threshold(spark):
    from remark_lint_frontmatter_schema_spark import (
        compile_ruleset, validate)
    rows = [("a", "cafÃ© cafÃ© menu"), ("b", "bad � byte")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    compiled = compile_ruleset(
        {"$id": "enc2", "type": "object", "properties": {"text": {
            "x-encoding": {"max_artifacts": 1,
                           "patterns": ["double_2byte"]}}}},
        df.schema)
    res = validate(df, compiled, row_id="doc_id")
    got = {r["row_id"] for r in res.violations.collect()}
    assert got == {"a"}  # 2 artifacts > 1; replacement char not selected


def test_x_encoding_unknown_pattern_collected(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    compiled = compile_ruleset(
        {"$id": "enc3", "type": "object", "properties": {"text": {
            "x-encoding": {"patterns": ["nope"]}}}},
        df.schema)
    assert any("x-encoding:nope" in u[1] for u in compiled.unknown)


def test_x_encoding_bad_shape_rejected(spark):
    import pytest
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(RulesetCompileError):
        compile_ruleset(
            {"$id": "enc4", "type": "object", "properties": {"text": {
                "x-encoding": {"max_artifacts": -1}}}},
            df.schema)
