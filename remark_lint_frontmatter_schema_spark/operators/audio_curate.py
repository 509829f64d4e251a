"""Audio training-data curation: decode + consistency + quality gates +
acoustic dedup, composed — the audio twin of ``operators/curate.py``.

Decide, per clip, whether it enters the training set and why not if not,
built strictly from the engine's own primitives with ONE read of the
binary payload:

* scan -> ``audio_features(with_fingerprint=True)``: a single Arrow map
  stage decodes each payload once and emits BOTH the quality features
  (duration, silence, clipping) and the acoustic dedup signature —
  ``bytes`` never leaves the stage and is never read again;
* the feature relation (id + a dozen scalars, no payloads) is persisted:
  the Hamming chunk self-join and the decision projection both consume it
  without re-decoding;
* near-dup clusters close transitively (connected components over the
  chunk-blocked pairs); the lowest id per cluster survives — same
  survivor rule as text curation.

At 10^12 clips the only shuffles carry (clip_id, fp) chunks and the
(id, id) component edges — a few hundred bytes per clip, never audio.
The persisted feature relation is MEMORY_AND_DISK here (local-mode
substitute); at the top design point it would be written once to a table
between the decode stage and the dedup/decision consumers — same
structure, durable instead of executor-cached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.audio import audio_features
from .clusters import connected_components
from .dedup import _persist, _track, hamming_pairs


def audio_curation_decisions(clips: DataFrame, *, dur_col: str = "dur_ms",
                             tolerance_ms: int = 5,
                             max_silence: float = 0.8,
                             max_clipping: float = 0.05,
                             max_distance: int = 3,
                             fp_frame_ms: int = 64,
                             fp_hop_ms: int = 32) -> DataFrame:
    """Per-clip decision row: features + first-failing-gate ``reason``.

    Gate order (first failure wins attribution; ``kept`` is the
    conjunction, so ordering never changes the kept set): ``undecodable``
    -> ``duration_mismatch`` (declared ``dur_col`` vs payload) ->
    ``too_silent`` -> ``clipped`` -> ``duplicate`` (non-survivor of an
    acoustic near-dup cluster, ``dup_of`` names the survivor) -> ``kept``.

    Clips whose payload is too short to fingerprint (fp NULL but decodable)
    pass the duplicate gate — absent evidence is not duplication, matching
    NULL-text policy in the text dedup family.
    """
    feats = _persist(audio_features(
        clips, passthrough=(dur_col,), with_fingerprint=True,
        fp_frame_ms=fp_frame_ms, fp_hop_ms=fp_hop_ms))
    pairs = hamming_pairs(feats.where(F.col("fp").isNotNull()),
                          sig_col="fp", id_col="clip_id",
                          max_distance=max_distance, reuse=False)
    comp = connected_components(pairs)
    losers = (comp.where(F.col("node") != F.col("component"))
                  .select(F.col("node").alias("clip_id"),
                          F.col("component").alias("dup_of")))
    dec = feats.join(losers, "clip_id", "left")
    reason = (
        F.when(~F.col("decode_ok"), F.lit("undecodable"))
         .when(F.abs(F.col("dur_ms_payload") - F.col(dur_col))
               > tolerance_ms, F.lit("duration_mismatch"))
         .when(F.col("silence_ratio") > max_silence, F.lit("too_silent"))
         .when(F.col("clipping_ratio") > max_clipping, F.lit("clipped"))
         .when(F.col("dup_of").isNotNull(), F.lit("duplicate"))
         .otherwise(F.lit("kept")))
    out = (dec.withColumn("reason", reason)
              .withColumn("kept", F.col("reason") == "kept"))
    return _track(out, feats)


def audio_curate(clips: DataFrame, *, id_col: str = "clip_id",
                 **gate_kwargs) -> DataFrame:
    """Surviving clips only (all original columns), via left-semi join
    against the kept decision ids."""
    kept = (audio_curation_decisions(clips, **gate_kwargs)
            .where("kept").select(id_col))
    return clips.join(kept, id_col, "left_semi")
