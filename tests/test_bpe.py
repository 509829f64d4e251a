"""Distributed BPE tokenizer: the incremental trainer is pinned against
an independent NAIVE reference implementation (full pair recount every
round, straight from Sennrich et al. 2016), Spark training equals
local-histogram training on the same corpus, encode invariants
(reconstruction, unknown-character degradation, determinism), and the
map-only plan shape of the encode stage."""

import re
from collections import Counter

import pytest

from remark_lint_frontmatter_schema_spark.operators import bpe

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker the better, said the quiet fox!",
    "low lower lowest new newer newest",
    "hugs hug hugging hugged, bugs bug bugging",
    "a b c aa bb cc aaa bbb ccc",
    "punctuation... matters!!! doesn't it???",
] * 3


def _naive_train(hist, num_merges, min_pair_count=2):
    """Independent reference: recount ALL pairs each round."""
    vocab = {tuple(list(w) + [bpe.END]): c for w, c in hist.items() if w}
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for word, c in vocab.items():
            for i in range(len(word) - 1):
                counts[(word[i], word[i + 1])] += c
        eligible = {p: c for p, c in counts.items()
                    if c >= min_pair_count}
        if not eligible:
            break
        best = min(eligible, key=lambda p: (-eligible[p], p))
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == best[0]
                        and word[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return tuple(merges)


def _hist(corpus):
    c = Counter()
    for line in corpus:
        c.update(re.findall(bpe.DEFAULT_PATTERN, line))
    return dict(c)


def test_incremental_trainer_matches_naive_reference():
    hist = _hist(CORPUS)
    for n in (1, 5, 25, 80, 200):
        fast = bpe.train_bpe_from_histogram(hist, n)
        ref = _naive_train(hist, n)
        assert fast == ref, f"diverged at num_merges={n}"


def test_min_pair_count_stops_early():
    hist = _hist(CORPUS)
    m = bpe.train_bpe_from_histogram(hist, 10_000, min_pair_count=2)
    assert 0 < len(m) < 10_000
    assert m == _naive_train(hist, 10_000)


def test_spark_training_equals_local_histogram(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    model = bpe.train_bpe(df, num_merges=60)
    assert model.merges == bpe.train_bpe_from_histogram(_hist(CORPUS), 60)
    assert not model.truncated
    assert model.n_word_types == len(_hist(CORPUS))


def test_truncation_reported(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    model = bpe.train_bpe(df, num_merges=5, max_word_types=10)
    assert model.truncated
    assert model.n_word_types == 10


def test_encode_reconstructs_pretokens():
    hist = _hist(CORPUS)
    model = bpe.BpeModel(bpe.train_bpe_from_histogram(hist, 80),
                         bpe.DEFAULT_PATTERN, len(hist), False)
    for line in CORPUS:
        toks = bpe.encode_text(line, model.ranks, model.pattern, {})
        rebuilt = "".join(toks).replace(bpe.END, " ").split()
        assert rebuilt == re.findall(bpe.DEFAULT_PATTERN, line)
        # frequent words compress below character granularity
    the = bpe.encode_word("the", model.ranks)
    assert len(the) < 4          # "the</w>" learned as few symbols


def test_unknown_characters_degrade_to_chars():
    model = bpe.BpeModel(bpe.train_bpe_from_histogram(_hist(CORPUS), 40),
                         bpe.DEFAULT_PATTERN, 1, False)
    toks = bpe.encode_word("zzzqqq", model.ranks)
    assert "".join(toks) == "zzzqqq" + bpe.END
    assert bpe.encode_text("", model.ranks, model.pattern, {}) == []


def test_bpe_encode_spark_and_token_count(spark):
    df = spark.createDataFrame(
        [("d1", CORPUS[0]), ("d2", CORPUS[1]), ("d3", None)],
        "id string, text string")
    model = bpe.train_bpe(df, num_merges=40)
    out = {r.id: r for r in bpe.bpe_encode(df, model).collect()}
    local = bpe.encode_text(CORPUS[0], model.ranks, model.pattern, {})
    assert list(out["d1"].tokens) == local
    assert out["d3"].tokens is None
    cnt = {r.id: r.n_bpe_tokens
           for r in bpe.bpe_token_count(df, model).collect()}
    assert cnt["d1"] == len(local)
    assert cnt["d3"] is None   # NULL text -> NULL count, engine NULL rule


def test_encode_plan_is_map_only(spark):
    """The encode stage must add no Exchange: one ArrowEvalPython over
    the scan, nothing else."""
    df = spark.createDataFrame([(f"d{i}", CORPUS[i % len(CORPUS)])
                                for i in range(20)],
                               "id string, text string")
    model = bpe.train_bpe(df, num_merges=20)
    plan = bpe.bpe_encode(df, model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_pretokenizer_parity_java_vs_python(spark):
    """The DEFAULT_PATTERN must split identically through Java
    regexp_extract_all (training pass) and Python re (encode pass) —
    the divergence the ASCII classes exist to prevent."""
    texts = CORPUS + ["mixed 123abc!?  tabs\tand\nnewlines",
                      "café déjà-vu naïve 北京 42°"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from pyspark.sql import functions as F
    jv = [r.toks for r in df.select(F.regexp_extract_all(
        "text", F.lit(bpe.DEFAULT_PATTERN), 0).alias("toks")).collect()]
    py = [re.findall(bpe.DEFAULT_PATTERN, t) for t in texts]
    assert [list(x) for x in jv] == py
