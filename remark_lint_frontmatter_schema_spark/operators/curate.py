"""Training-data curation: dedup + quality gate + language gate, composed.

The composition the north_star's table exists for — decide, per document,
whether it enters the training set and why not if not. Built strictly from
the engine's own primitives (``text.profile_columns`` metrics, fingerprint
dedup) so the whole decision is ONE scan plus ONE shuffle:

* scan → staged profile projection (quality, language, normalization
  fingerprint — single tokenization, see text.py);
* one hash-partition shuffle on the fingerprint for the min-id window
  (duplicate survivors are deterministic: lowest id per fingerprint wins);
* everything after is a stateless projection.

At 10^12 rows the fingerprint shuffle carries only
(id, fingerprint, 2 small metrics) — never the document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import profile_columns


def curation_decisions(df: DataFrame, text_col: str, id_col: str, *,
                       min_quality: float = 0.5,
                       lang: str | None = "en") -> DataFrame:
    """Per-document decision row: metrics + first-failing-gate reason.

    Gate order (first failure wins the ``reason``): duplicate →
    low_quality → wrong_lang → kept. ``kept`` is the conjunction, so the
    ordering only affects attribution, not the kept set.
    """
    # NULL text must fail the quality gate, not slide through it (NULL
    # metrics make every `<` comparison NULL and the when-branches skip —
    # fail-open). Scoring NULL as the empty string gives quality 0.2,
    # lang 'und', the empty-string fingerprint — deterministic and
    # identical to the SQL oracle's CASE...ELSE 0.0 arms.
    scored = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    prof = profile_columns(scored, text_col, id_col, fields={
        "quality_score": "quality_score",
        "lang_guess": "lang_guess",
        "fingerprint": "fingerprint",
    })
    w = Window.partitionBy("fingerprint")
    dec = prof.withColumn("keep_id", F.min(id_col).over(w))
    reason = (
        F.when(F.col(id_col) != F.col("keep_id"), F.lit("duplicate"))
         .when(F.col("quality_score") < min_quality, F.lit("low_quality")))
    if lang is not None:
        reason = reason.when(F.col("lang_guess") != lang, F.lit("wrong_lang"))
    reason = reason.otherwise(F.lit("kept"))
    return (dec.withColumn("reason", reason)
               .withColumn("kept", F.col("reason") == "kept")
               .drop("keep_id"))


def curate(df: DataFrame, text_col: str, id_col: str, *,
           min_quality: float = 0.5, lang: str | None = "en") -> DataFrame:
    """Surviving documents only (all original columns), via left-semi join
    against the kept decision ids."""
    kept = (curation_decisions(df, text_col, id_col,
                               min_quality=min_quality, lang=lang)
            .where("kept").select(id_col))
    return df.join(kept, id_col, "left_semi")
