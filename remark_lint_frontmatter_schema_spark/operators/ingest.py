"""Resumable corpus ingest: gate -> split -> canonicalize -> manifest.

The production composition of the engine's pieces, batch form: pending
partitions (per-partition lineage manifest, north_rule T1) are read once,
routed by the severity-aware gate into accepted/quarantine partitions of
one write (``sinks.write_split``), and the accepted side is re-encoded to
the canonical training form (mono / ``target_sr`` / PCM16,
``functions.audio.canonicalize_clips``) with its labels carried through
the Arrow stage — no join back. A rerun skips partitions the manifest
already records as INGESTED (merely-validated partitions still need
their artifacts, so the ingest flow scopes "done" to
``STATUS_INGESTED``); a crash mid-run re-ingests only the partitions
whose entries were never written. Idempotency lives at the read layer:
every invocation writes under a fresh unique run_id (unless the caller
pins one), the manifest entry records which run_id produced each
partition, and corpus/split readers filter to the manifest-named
run_ids — rows a crashed attempt left behind sit under a run_id the
manifest never references, so they are invisible, not double-counted.

Scan accounting at the design point: the gate pass reads the columns the
ruleset touches (payload column only if a binary check is active —
plan-audited in tests/test_plan_audits.py), the split write carries full
rows once, and the canonicalization pass re-reads the accepted
partition's (clip_id, bytes, passthrough) — two payload reads total,
each map-only; nothing payload-sized ever shuffles.

The reference analog is the lint -> fix -> commit loop run per changed
file (/root/reference/README.md workflow); here the unit is an Iceberg
partition and the artifacts are tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import sinks
from ..functions.audio import canonicalize_clips
from ..manifest import STATUS_INGESTED, Manifest, list_partitions


def ingest_corpus(
    spark,
    table_path: str,
    compiled,
    *,
    partition_col: str,
    row_id: str = "clip_id",
    out_path: str,
    manifest_path: str,
    snapshot_id: str = "snap_0",
    run_id: str | None = None,
    fail_severities=("error",),
    target_sr: int = 16000,
    normalize_db: float | None = None,
    passthrough: tuple = ("transcript",),
    repair_ruleset: dict | None = None,
    dedupe_against_corpus: bool = False,
) -> dict:
    """Ingest every pending partition of ``table_path``; returns
    ``{"ingested": [...], "skipped": [...], "accepted": n,
    "quarantined": n}``.

    Artifacts under ``out_path``: ``split/`` (full rows,
    run_id/accepted-partitioned — the quarantine lives here,
    self-describing) and ``corpus/`` (canonical payloads + passthrough
    labels, partitioned by ``partition_col`` and run_id).

    ``repair_ruleset`` — fix what you can, quarantine the rest: the
    ruleset document's repairable constraints (operators/repair.py) are
    applied BEFORE the gate, so a row whose only defects are repairable
    (out-of-range metadata, over-long transcript, invalid enum with a
    default) is corrected and accepted instead of quarantined; the
    repair log lands under ``{out_path}/repair_log`` partitioned by
    run_id, same append/read-layer idempotency as the other artifacts.
    Unrepairable violations still quarantine. Typically the same
    document the gate was compiled from.

    ``corpus`` row count <= ``accepted``: gate-accepted clips whose
    payload the engine cannot decode (opus/mp3 entropy decode — the
    documented sandbox seam; round 3's canonicalizer handles every other
    engine codec in place via ``decode_payload_any``) emit no canonical
    row — route those through an external transcoder first, or add a
    decode check (``x-spark-check: voiced_content`` or a
    duration-consistency gate) so they quarantine instead.
    """
    import uuid

    if run_id is None:
        run_id = f"ingest_{uuid.uuid4().hex[:12]}"
    manifest = Manifest.load(manifest_path)
    all_parts = list_partitions(table_path, partition_col)
    todo = manifest.pending(snapshot_id, all_parts, compiled.ruleset_hash,
                            done_statuses=(STATUS_INGESTED,))
    skipped = [p for p in all_parts if p not in todo]
    if not todo:
        return {"ingested": [], "skipped": skipped,
                "accepted": 0, "quarantined": 0, "run_id": run_id}

    part_str = F.col(partition_col).cast("string")
    df = spark.read.parquet(table_path).where(part_str.isin(todo))
    missing = [c for c in (row_id, *passthrough) if c not in df.columns]
    if missing:  # fail before any artifact is written, not mid-pipeline
        raise ValueError(
            f"ingest_corpus: column(s) {missing} not in {table_path} "
            f"(has {df.columns}); check row_id/passthrough")

    # id uniqueness under dedupe_against_corpus: (a) CROSS-RUN — a
    # clip_id already in the corpus (ingested by ANY earlier run) must
    # not be re-ingested; re-sent batches and upstream replays are
    # routine at ingest scale; (b) WITHIN-BATCH — duplicated ids inside
    # one batch keep exactly one deterministic winner (see below). The anti-join reads
    # ONE pruned column of the existing corpus; the session's runtime
    # bloom-filter join conf prefilters the big side. Duplicates are
    # recorded (an artifact + a manifest metric), never silently dropped.
    n_dup_by_part: dict = {}
    if dedupe_against_corpus:
        from pyspark.errors import AnalysisException
        try:
            existing = (spark.read.parquet(f"{out_path}/corpus")
                        .select(F.col(row_id)).distinct())
        except AnalysisException:
            existing = None  # first run: no corpus yet
        if existing is not None:
            dups = (df.join(existing, row_id, "left_semi")
                      .select(F.col(row_id), part_str.alias("_p")))
            (dups.withColumn("run_id", F.lit(run_id))
             .write.mode("append").partitionBy("run_id")
             .parquet(f"{out_path}/dup_ids"))
            df = df.join(existing, row_id, "left_anti")

        # WITHIN-batch id uniqueness (round 3 — previously masked: the
        # pcm16-only canonicalizer happened to drop one copy of most
        # fixture duplicates; the codec-transparent decoder surfaced the
        # gap). Split pattern: a keys-only groupBy finds the (rare)
        # duplicated ids, ONLY their rows shuffle into a deterministic
        # keep-one window (ordered by partition then payload hash), the
        # non-dup bulk stays map-only — payloads never shuffle for the
        # common case. Losers are recorded in dup_ids like replays.
        dup_ids = (df.groupBy(row_id)
                   .agg(F.count(F.lit(1)).alias("_n"))
                   .where(F.col("_n") > 1).select(row_id))
        flagged = df.join(F.broadcast(dup_ids), row_id, "left_semi")
        clean = df.join(F.broadcast(dup_ids), row_id, "left_anti")
        from pyspark.sql import Window
        w = Window.partitionBy(row_id).orderBy(
            part_str.asc(), F.sha2(F.col("bytes"), 256).asc())
        ranked = flagged.withColumn("_rn", F.row_number().over(w))
        losers = ranked.where(F.col("_rn") > 1)
        (losers.select(F.col(row_id), part_str.alias("_p"))
         .withColumn("run_id", F.lit(run_id))
         .write.mode("append").partitionBy("run_id")
         .parquet(f"{out_path}/dup_ids"))
        df = clean.unionByName(ranked.where(F.col("_rn") == 1)
                               .drop("_rn"))

        n_dup_by_part = {r._p: r.n for r in
                         (spark.read.parquet(f"{out_path}/dup_ids")
                          .where(F.col("run_id") == run_id)
                          .groupBy("_p")
                          .agg(F.count(F.lit(1)).alias("n")).collect())}

    if repair_ruleset is not None:
        from .repair import repair as _repair
        rep = _repair(df, repair_ruleset, row_id=row_id, name="ingest-fix")
        (rep.log.withColumn("run_id", F.lit(run_id))
         .write.mode("append").partitionBy("run_id")
         .parquet(f"{out_path}/repair_log"))
        df = rep.repaired

    split_path = f"{out_path}/split"
    counts = sinks.write_split(df, compiled, path=split_path,
                               run_id=run_id,
                               fail_severities=fail_severities)

    accepted = (spark.read.parquet(split_path)
                .where(F.col("run_id") == run_id)
                .where(F.col("accepted").cast("boolean"))
                .where(part_str.isin(todo)))
    corpus = canonicalize_clips(
        accepted, target_sr=target_sr, normalize_db=normalize_db,
        id_col=row_id,
        passthrough=tuple(c for c in passthrough if c != partition_col)
        + (partition_col,))
    (corpus.withColumn("run_id", F.lit(run_id))
     .write.mode("append").partitionBy(partition_col, "run_id")
     .parquet(f"{out_path}/corpus"))

    # per-partition lineage: accepted/quarantined from the split footers
    # (metadata counts, not a rescan of payloads)
    per_part = {r.p: r for r in
                (spark.read.parquet(split_path)
                 .where(F.col("run_id") == run_id)
                 .groupBy(part_str.alias("p"))
                 .agg(F.count(F.lit(1)).alias("n_rows"),
                      F.sum(F.col("accepted").cast("boolean").cast("long"))
                      .alias("n_accepted")).collect())}
    for p in todo:
        r = per_part.get(p)
        n_rows = r.n_rows if r else 0
        n_acc = int(r.n_accepted) if r else 0
        manifest.record(
            snapshot_id, p, compiled.ruleset_hash, STATUS_INGESTED,
            metrics={"n_rows": n_rows, "n_accepted": n_acc,
                     "n_quarantined": n_rows - n_acc,
                     "n_dup_skipped": int(n_dup_by_part.get(p, 0)),
                     "run_id": run_id})
    manifest.save()
    return {"ingested": todo, "skipped": skipped, **counts}
