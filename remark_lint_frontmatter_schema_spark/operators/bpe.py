"""Distributed BPE tokenizer — corpus-scale vocabulary training and
map-only encoding (byte-pair encoding per Sennrich et al. 2016, the
public algorithm every modern LLM tokenizer descends from).

The reference has no analog (it validates frontmatter documents,
``/root/reference/index.ts:201-320``); this is a north-star
training-data-pipeline operator: token budgets, packing and dedup all
need a REAL learned subword vocabulary, not just whitespace counts.

Training is learned from the WORD HISTOGRAM, not the raw corpus — so
the distributed part is exactly one explode + one ``groupBy(word)``
shuffle of (word, count) pairs (bytes-small keys, map-side partial
aggregation), after which the merge loop runs driver-side on the
bounded histogram. This is the standard architecture (HF tokenizers
train from word counts too) and the same bounded-driver pattern as the
engine's IVF/SemDeDup centroid training: at 100 TB the top
``max_word_types`` word types cap driver state regardless of corpus
size, and truncation is reported in the returned model — never silent.

Encoding is map-only: merge ranks ship to executors inside the Arrow
UDF closure (a vocab-sized dict), applied per PRE-TOKEN with a
memoization cache — under a Zipfian corpus the hot words hit the cache,
so per-batch work scales with unique words, not tokens. No shuffle, no
``bytes``-wide rows, plan pinned in tests.

Pre-tokenization uses an ASCII word/punctuation-run regex by default
because its semantics are IDENTICAL in Java (``regexp_extract_all`` on
the training pass) and Python ``re`` (the encode pass) — ``\\w`` is
ASCII in Java but Unicode in Python, a silent train/encode divergence
this engine refuses to have. Callers may pass any pattern that they
guarantee agrees across both engines.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# identical semantics in Java regex and Python re (ASCII classes only)
DEFAULT_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]+"
END = "</w>"   # word-final marker symbol (Sennrich et al. 2016 §3.2)


class BpeModel(NamedTuple):
    """A trained BPE vocabulary: ordered merge list + provenance."""
    merges: tuple            # ((left, right), ...) in learned order
    pattern: str             # pre-tokenization regex (Java==Python)
    n_word_types: int        # histogram rows the merge loop saw
    truncated: bool          # True if max_word_types capped the histogram

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}


def _pair_counts(vocab: dict) -> dict:
    counts: dict = {}
    for word, c in vocab.items():
        for i in range(len(word) - 1):
            pair = (word[i], word[i + 1])
            counts[pair] = counts.get(pair, 0) + c
    return counts


def _merge_word(word: tuple, pair: tuple, joined: str) -> tuple:
    out, i, n = [], 0, len(word)
    while i < n:
        if i < n - 1 and word[i] == pair[0] and word[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe_from_histogram(hist: dict, num_merges: int,
                             *, min_pair_count: int = 2) -> tuple:
    """Classic BPE merge learning over a {word: count} histogram.

    Deterministic: the best pair each round is max by (count, then
    LEXICOGRAPHICALLY SMALLEST pair) — ties cannot reorder merges
    between runs or engines. Stops early when no pair reaches
    ``min_pair_count``. Incremental pair-count maintenance: each merge
    re-counts only the words that contain the merged pair (tracked via
    a pair -> words index), not the whole histogram.
    """
    vocab = {tuple(list(w) + [END]): c for w, c in hist.items() if w}
    counts = _pair_counts(vocab)
    where: dict = {}
    for word in vocab:
        for i in range(len(word) - 1):
            where.setdefault((word[i], word[i + 1]), set()).add(word)
    merges = []
    for _ in range(num_merges):
        best = None
        for pair, c in counts.items():
            if c >= min_pair_count and (
                    best is None or c > counts[best]
                    or (c == counts[best] and pair < best)):
                best = pair
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for word in list(where.get(best, ())):
            c = vocab.pop(word)
            # retract this word's pair contributions
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                counts[p] -= c
                if counts[p] <= 0:
                    del counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(word)
                    if not s:
                        del where[p]
            new = _merge_word(word, best, joined)
            vocab[new] = vocab.get(new, 0) + c
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] = counts.get(p, 0) + c
                where.setdefault(p, set()).add(new)
    return tuple(merges)


def train_bpe(docs: DataFrame, text_col: str = "text", *,
              num_merges: int = 256, min_pair_count: int = 2,
              max_word_types: int = 1_000_000,
              pattern: str = DEFAULT_PATTERN) -> BpeModel:
    """Learn a BPE vocabulary from a corpus DataFrame.

    One distributed pass builds the (word, count) histogram (explode +
    groupBy — map-side combined, keys are short strings); the top
    ``max_word_types`` types by (count desc, word asc) come back to the
    driver for the merge loop. The +1 over-fetch detects truncation
    without a second count pass.
    """
    words = (docs
             .select(F.explode(F.regexp_extract_all(
                 F.col(text_col), F.lit(pattern), 0)).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    rows = (words.orderBy(F.desc("c"), F.asc("w"))
            .limit(max_word_types + 1).collect())
    truncated = len(rows) > max_word_types
    rows = rows[:max_word_types]
    hist = {r.w: r.c for r in rows}
    merges = train_bpe_from_histogram(hist, num_merges,
                                      min_pair_count=min_pair_count)
    return BpeModel(merges=merges, pattern=pattern,
                    n_word_types=len(hist), truncated=truncated)


def encode_word(word: str, ranks: dict) -> list:
    """Greedy lowest-rank-first BPE merge of one pre-token. Symbols
    never seen in training simply stay single characters — unknown
    input degrades to characters, it cannot fail."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_i, best_r = -1, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        symbols[best_i:best_i + 2] = [symbols[best_i]
                                      + symbols[best_i + 1]]
    return symbols


def encode_text(text: str, ranks: dict, pattern: str,
                cache: dict | None = None) -> list:
    import re
    out: list = []
    for w in re.findall(pattern, text):
        toks = cache.get(w) if cache is not None else None
        if toks is None:
            toks = encode_word(w, ranks)
            if cache is not None and len(cache) < 1_000_000:
                cache[w] = toks
        out.extend(toks)
    return out


def bpe_encode(docs: DataFrame, model: BpeModel,
               text_col: str = "text",
               out_col: str = "tokens") -> DataFrame:
    """Append ``out_col`` (array<string> of BPE tokens, word-final
    symbols carrying the {END} marker). Map-only: ranks ride in the UDF
    closure, a per-executor word cache memoizes repeat words. NULL text
    -> NULL tokens (absent stays absent, the engine-wide NULL rule)."""
    ranks, pattern = model.ranks, model.pattern

    @pandas_udf(ArrayType(StringType()))
    def enc(texts):
        import pandas as pd
        cache: dict = {}
        return pd.Series([
            None if t is None else encode_text(t, ranks, pattern, cache)
            for t in texts])

    return docs.withColumn(out_col, enc(F.col(text_col)))


def bpe_token_count(docs: DataFrame, model: BpeModel,
                    text_col: str = "text",
                    out_col: str = "n_bpe_tokens") -> DataFrame:
    """Append the learned-subword token count (the REAL budget number
    packing/chunking consumers want once a vocabulary exists)."""
    enc = bpe_encode(docs, model, text_col, "_bpe_toks")
    # size(NULL) is -1 under default (legacy) config and NULL under
    # ANSI — pin NULL-in -> NULL-out explicitly (engine-wide NULL rule)
    return enc.withColumn(
        out_col,
        F.when(F.col("_bpe_toks").isNotNull(),
               F.size(F.col("_bpe_toks")))) \
              .drop("_bpe_toks")
