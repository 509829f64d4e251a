"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All JVM-side Column expressions (whole-stage codegen; no Python in the hot
path) — these run per-document over trillions of rows, so every one of
them must survive a 100x scale-up as a pure map over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram-ish heuristic language ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "das"],
    "fr": ["le", "et", "la", "les", "des"],
    "es": ["el", "que", "los", "una", "por"],
    "zh": ["de", "shi", "le", "zai", "you"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                "that", "for", "on", "with", "as"]

# BPE-ish tokenization: word pieces, number runs, single punctuation marks
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col) -> Column:
    """Whitespace tokens (empty-string artifacts removed)."""
    return F.filter(F.split(F.col(col) if isinstance(col, str) else col,
                            r"\s+"), lambda t: t != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0)))


def lang_scores(col) -> dict[str, Column]:
    """Marker-token counts per language over ONE tokenization of the text.

    Token-membership counting (split once, then per-language `isin` filters)
    beats the padded-substring-replace formulation at scale: that one
    re-copied the full document once per marker word (25 string scans/row);
    this touches each token 25 times with tiny set probes.
    """
    toks = F.split(F.lower(F.col(col) if isinstance(col, str) else col),
                   r"\s+")

    def member_fn(markers):
        # closure, not a default arg: pyspark HOF lambdas must have exactly
        # one parameter (a second one is parsed as the array-index variable)
        mk = tuple(markers)
        return lambda t: t.isin(*mk)

    return {
        lang: F.size(F.filter(toks, member_fn(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_guess(col) -> Column:
    """argmax over marker-word scores, deterministic tie-break by the
    declaration order of LANG_MARKERS; 'und' when nothing scored.

    The argmax is one `array_max` over (score, preference, lang) structs —
    lexicographic struct ordering gives the tie-break for free and each
    score expression is evaluated exactly once (a greatest+CASE chain would
    replicate every score subtree several times)."""
    scores = lang_scores(col)
    entries = [
        F.struct(scores[lg].alias("s"), F.lit(-i).alias("p"),
                 F.lit(lg).alias("lang"))
        for i, lg in enumerate(scores)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best.getField("s") > 0,
                  best.getField("lang")).otherwise(F.lit("und"))


def stopword_ratio(col) -> Column:
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation density (the usual pretraining-filter features)."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = (F.length(c) >= 20) & (F.length(c) <= 10000)
    tok = token_count(c)
    mean_word_len = F.when(tok > 0, F.length(c) / tok).otherwise(F.lit(0.0))
    word_len_ok = (mean_word_len >= 2.5) & (mean_word_len <= 12.0)
    return (
        len_ok.cast("double") * 0.3
        + word_len_ok.cast("double") * 0.2
        + F.least(stopword_ratio(c) * 4, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio(c) * 5, F.lit(1.0))) * 0.2
    )


def fingerprint(col) -> Column:
    """Normalization fingerprint: sha256 of lowercased text with
    punctuation stripped and whitespace collapsed — near-dup key for
    formatting-only variants."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", ""), r" +", " "))
    return F.sha2(norm, 256)


def rolling_hash(col, *, window: int = 8, mod: int = (1 << 31) - 1) -> Column:
    """Content-defined rolling fingerprint set: polynomial hash of each
    ``window``-gram, keep the minimum (a 1-element winnowing sketch) —
    JVM-side via transform over character shingles."""
    c = F.col(col) if isinstance(col, str) else col
    n_sh = F.greatest(F.length(c) - window + 1, F.lit(0))
    shingles = F.transform(F.sequence(F.lit(1), n_sh),
                           lambda i: c.substr(i, F.lit(window)))
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(mod)))
    return F.when(n_sh > 0, F.array_min(hashes)).otherwise(F.lit(None))


def profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass text profile per document."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_tokens_bpe"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(quality_score(c), 6).alias("quality_score"),
        lang_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )
