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
