"""remove_dup_spans (ExactSubstr-style positional span dedup): semantics
against a pure-python twin, targeted boundary cases, and plan hygiene."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import dedup


# ---------------------------------------------------------------------------
# pure-python twin (independent re-derivation of the contract)
# ---------------------------------------------------------------------------

def span_twin(docs: dict, n: int = 8, min_count: int = 2,
              keep_first: bool = True) -> dict:
    """docs: {id: text|None} -> {id: (text_clean, n_tokens, n_dup_tokens,
    n_spans)} with the exact remove_dup_spans contract."""
    toks = {d: (t.split() if t is not None else None)
            for d, t in docs.items()}
    by_gram = defaultdict(list)
    for d in sorted(k for k in docs if toks[k] is not None):
        tt = toks[d]
        for p in range(len(tt) - n + 1):
            by_gram[tuple(tt[p:p + n])].append((d, p))
    covered = defaultdict(set)
    for occs in by_gram.values():
        if len(occs) < min_count:
            continue
        occs = sorted(occs)
        for d, p in occs[1:] if keep_first else occs:
            covered[d].update(range(p, p + n))
    out = {}
    for d, t in docs.items():
        if t is None:
            out[d] = (None, 0, 0, 0)
            continue
        tt = toks[d]
        cov = covered.get(d, set())
        spans = sum(1 for i in cov if i - 1 not in cov)
        clean = " ".join(tok for i, tok in enumerate(tt) if i not in cov)
        out[d] = (clean, len(tt), len(cov), spans)
    return out


def run_op(spark, docs: dict, **kw):
    rows = [(k, v) for k, v in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_clean"], r["n_tokens"],
                         r["n_dup_tokens"], r["n_spans"])
           for r in dedup.remove_dup_spans(df, "text", "doc_id",
                                           **kw).collect()}
    dedup.release_all()
    return got


WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def _sent(rnd, k):
    return " ".join(rnd.choice(WORDS) for _ in range(k))


def test_exact_duplicate_doc_fully_removed_keep_first(spark):
    text = " ".join(WORDS) + " " + " ".join(reversed(WORDS))
    docs = {1: text, 2: text, 3: "totally unrelated words here only once"}
    got = run_op(spark, docs, n=8)
    assert got == span_twin(docs, n=8)
    # first copy intact (canonical whitespace), second fully covered
    assert got[1][0] == text and got[1][2] == 0
    assert got[2] == ("", len(text.split()), len(text.split()), 1)
    assert got[3][2] == 0


def test_planted_shared_span_removed_exactly(spark):
    import random
    rnd = random.Random(7)
    shared = "one two three four five six seven eight nine ten"
    a = _sent(rnd, 30) + " " + shared + " " + _sent(rnd, 30)
    b = _sent(rnd, 25) + " " + shared + " " + _sent(rnd, 25)
    docs = {10: a, 20: b}
    got = run_op(spark, docs, n=8)
    assert got == span_twin(docs, n=8)
    # doc 10 (smaller id) keeps the span; doc 20 loses exactly its 10
    # tokens as one merged run — unique surroundings never reach min_count
    assert got[10][2] == 0
    assert got[20][2] == 10 and got[20][3] == 1
    assert shared not in got[20][0] and got[20][1] - 10 == \
        len(got[20][0].split())


def test_within_doc_repeat_counts_and_keeps_first(spark):
    span = "p q r s t u v w"  # exactly n=8 tokens
    docs = {5: f"{span} filler words in the middle {span} tail bit"}
    got = run_op(spark, docs, n=8)
    assert got == span_twin(docs, n=8)
    clean, n_tok, n_dup, n_spans = got[5]
    assert (n_dup, n_spans) == (8, 1)
    assert clean.split().count("p") == 1  # first occurrence survived


def test_keep_first_false_drops_every_occurrence(spark):
    text = " ".join(WORDS)
    docs = {1: text, 2: text}
    got = run_op(spark, docs, n=8, keep_first=False)
    assert got == span_twin(docs, n=8, keep_first=False)
    assert got[1][0] == "" and got[2][0] == ""


def test_short_null_and_empty_docs(spark):
    docs = {1: "under eight tokens only", 2: None, 3: "",
            4: "  spaced   out\ttokens under n  "}
    got = run_op(spark, docs, n=8)
    assert got == span_twin(docs, n=8)
    assert got[1] == ("under eight tokens only", 4, 0, 0)
    assert got[2] == (None, 0, 0, 0)
    assert got[3] == ("", 0, 0, 0)
    assert got[4][0] == "spaced out tokens under n"  # canonical whitespace


def test_two_disjoint_spans_merge_count(spark):
    import random
    rnd = random.Random(11)
    s1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    s2 = "b1 b2 b3 b4 b5 b6 b7 b8 b9"
    base = _sent(rnd, 20)
    docs = {1: f"{s1} {base} {s2}",
            2: f"{_sent(rnd, 15)} {s1} {_sent(rnd, 12)} {s2} end marker x"}
    got = run_op(spark, docs, n=8)
    assert got == span_twin(docs, n=8)
    assert got[2][3] == 2 and got[2][2] == 17  # 8 + 9 tokens, two islands


@pytest.mark.parametrize("seed", [3, 41])
def test_random_corpus_matches_twin(spark, seed):
    import random
    rnd = random.Random(seed)
    shared_pool = [_sent(rnd, rnd.randint(8, 14)) for _ in range(6)]
    docs = {}
    for d in range(40):
        parts = [_sent(rnd, rnd.randint(0, 20)) for _ in range(3)]
        for _ in range(rnd.randint(0, 2)):
            parts.insert(rnd.randint(0, len(parts)),
                         rnd.choice(shared_pool))
        docs[d] = " ".join(p for p in parts if p)
    docs[98] = None
    docs[99] = "tiny"
    for kw in ({"n": 8}, {"n": 5, "min_count": 3},
               {"n": 8, "keep_first": False}):
        assert run_op(spark, docs, **kw) == span_twin(docs, **kw)


def test_no_cartesian_product_and_broadcast_plan(spark):
    df = spark.createDataFrame([(i, "w " * 20) for i in range(50)],
                               "doc_id long, text string")
    out = dedup.remove_dup_spans(df, "text", "doc_id", n=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" \
        not in plan
    assert "BroadcastHashJoin" in plan  # the hot-hash join-back
    dedup.release_all()


def test_rejects_degenerate_n(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.remove_dup_spans(df, "text", "doc_id", n=1)
