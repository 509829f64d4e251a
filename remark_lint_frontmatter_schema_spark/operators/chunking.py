"""Token-window document chunking — split long documents into bounded,
optionally-overlapping training chunks.

The reference has no analog (it validates one frontmatter document per
file, ``/root/reference/index.ts:201-320``); this is a north-star
training-data-pipeline operator: LLM corpora are consumed as fixed-budget
chunks, so the engine must produce them at 100 TB without a shuffle.

Semantics: a document's whitespace tokens (``operators/text.tokens`` — the
same tokenization as ``text_stats``/``token_count``, so budgets agree
across operators) are windowed into chunks of at most ``max_tokens``
tokens, consecutive chunks sharing ``overlap`` tokens. Chunk starts are
``0, step, 2*step, ...`` with ``step = max_tokens - overlap``; the number
of chunks is ``1`` when ``n <= max_tokens`` else
``1 + ceil((n - max_tokens) / step)``, which makes the LAST window land on
the tail — every token appears in at least one chunk, no chunk exceeds the
budget, and no fully-redundant trailing runt is emitted (the tail chunk
carries at least ``overlap + 1`` fresh tokens). NULL-text and zero-token
documents produce no chunks. Chunk text is the tokens re-joined with
single spaces — canonical whitespace, byte-identical to what token-level
consumers see; callers needing raw-byte fidelity should carry offsets
instead of text.

Scale design: map-only — ZERO shuffles at any scale. The token array is
staged in a projection BELOW the generator (Catalyst does not collapse a
projection across a Generate, so the regex split runs once per document,
not once per chunk — the HOF-CSE discipline from ``text.profile_columns``),
then each chunk is an ``F.slice`` of the materialized array. Output row
count is ~``n_tokens/step`` per document; memory per task is bounded by
the largest single document (same bound as any text operator here).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_plan(n_tokens: int, max_tokens: int, overlap: int = 0
               ) -> list[tuple[int, int]]:
    """Pure-python twin of the chunk math: (start, length) per chunk for a
    document of ``n_tokens`` tokens. The Spark path must agree with this
    exactly (tests pin it); exposed for callers sizing downstream stages."""
    _check_args(max_tokens, overlap)
    if n_tokens <= 0:
        return []
    step = max_tokens - overlap
    n_chunks = 1 if n_tokens <= max_tokens else \
        1 + math.ceil((n_tokens - max_tokens) / step)
    return [(i * step, min(max_tokens, n_tokens - i * step))
            for i in range(n_chunks)]


def _check_args(max_tokens: int, overlap: int) -> None:
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got overlap={overlap} "
            f"max_tokens={max_tokens}")


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk) — one row per token-window
    chunk; ``doc_id`` keeps the source id column's type so joins back to
    the corpus stay cheap."""
    _check_args(max_tokens, overlap)
    step = max_tokens - overlap
    n = F.size("_toks")
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(max_tokens)) / F.lit(step)).cast("int"))
    # zero-token guard as a raw-text rlike, NOT size(_toks) > 0: predicate
    # pushdown would re-inline the split below the projection, doubling
    # the regex work per document (the plan test pins one split total)
    staged = (df.where(F.col(text_col).isNotNull()
                       & F.col(text_col).rlike(r"\S"))
                .select(F.col(id_col).alias("doc_id"),
                        tokens(text_col).alias("_toks")))
    exploded = staged.select(
        "doc_id", "_toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
    chunk_toks = F.slice(
        F.col("_toks"), F.col("chunk_idx") * step + 1, max_tokens)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx"),
        F.size(chunk_toks).alias("n_tokens"),
        F.array_join(chunk_toks, " ").alias("chunk"),
    )
