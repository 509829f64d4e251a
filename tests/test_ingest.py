"""Resumable corpus ingest: gate -> split -> canonicalize -> manifest,
with partition-level resume and a self-describing quarantine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark import bundle, compile_ruleset
from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.manifest import Manifest
from remark_lint_frontmatter_schema_spark.operators.ingest import ingest_corpus
from remark_lint_frontmatter_schema_spark.sources import fixtures


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ingest") / "clips")
    fixtures.write_clips(
        fixtures.generate_clips(spark, 600, audio_ms=40, num_partitions=3), p)
    return p


@pytest.fixture(scope="module")
def compiled(spark, table):
    df = spark.read.parquet(table)
    return compile_ruleset(bundle("rulesets/clip.schema.yaml"),
                           df.schema, name="clip",
                           exclude_columns=("ruleset_id",))


def test_ingest_end_to_end_and_resume(spark, table, compiled, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest.json")
    res = ingest_corpus(spark, table, compiled,
                        partition_col="part_date", row_id="clip_id",
                        out_path=out, manifest_path=man, run_id="r1",
                        fail_severities=("error", "warning"))
    assert res["skipped"] == [] and len(res["ingested"]) > 0
    assert res["accepted"] + res["quarantined"] == 600

    # corpus: canonical payloads, labels carried through, partitioned
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() <= res["accepted"]  # undecodables emit no rows
    assert {"transcript", "part_date", "bytes", "sr_hz"} <= set(corpus.columns)
    ok = corpus.select(F.min(audio.canonical_wav_expr())).collect()[0][0]
    assert ok  # every corpus payload is exactly canonical

    # quarantine self-describes
    quar = (spark.read.parquet(f"{out}/split")
            .where(~F.col("accepted").cast("boolean")))
    assert quar.count() == res["quarantined"]
    assert quar.where(F.size("_violations") == 0).count() == 0

    # manifest has per-partition lineage with counts
    m = Manifest.load(man)
    assert len(m.entries) == len(res["ingested"])
    entry = next(iter(m.entries.values()))
    assert entry["status"] == "ingested"
    assert entry["metrics"]["n_rows"] == (entry["metrics"]["n_accepted"]
                                          + entry["metrics"]["n_quarantined"])

    # rerun: everything skipped, nothing rewritten
    n_corpus = corpus.count()
    res2 = ingest_corpus(spark, table, compiled,
                         partition_col="part_date", row_id="clip_id",
                         out_path=out, manifest_path=man, run_id="r2",
                         fail_severities=("error", "warning"))
    assert res2["ingested"] == [] and set(res2["skipped"]) == set(res["ingested"])
    assert spark.read.parquet(f"{out}/corpus").count() == n_corpus


def test_ingest_resumes_only_pending_partitions(spark, table, compiled,
                                                tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest.json")
    # pre-mark one partition as done: ingest must skip exactly it
    from remark_lint_frontmatter_schema_spark.manifest import (
        STATUS_INGESTED, list_partitions)
    parts = list_partitions(table, "part_date")
    m = Manifest.load(man)
    m.record("snap_0", parts[0], compiled.ruleset_hash, STATUS_INGESTED)
    m.save()
    res = ingest_corpus(spark, table, compiled,
                        partition_col="part_date", row_id="clip_id",
                        out_path=out, manifest_path=man, run_id="r1")
    assert res["skipped"] == [parts[0]]
    assert set(res["ingested"]) == set(parts[1:])
    got_parts = {r.part_date for r in
                 spark.read.parquet(f"{out}/corpus")
                 .select("part_date").distinct().collect()}
    assert str(parts[0]) not in {str(p) for p in got_parts}

def test_ingest_custom_row_id_and_missing_passthrough(spark, table, compiled,
                                                      tmp_path):
    """row_id is honored (not a hardcoded clip_id), and an unknown
    passthrough column fails fast BEFORE any artifact is written."""
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest.json")
    with pytest.raises(ValueError, match="no_such_label"):
        ingest_corpus(spark, table, compiled,
                      partition_col="part_date", row_id="clip_id",
                      out_path=out, manifest_path=man,
                      passthrough=("no_such_label",))
    import os
    assert not os.path.exists(out)  # fail-fast: nothing half-written

    # rename the id column: ingest must follow row_id, output is clip_id
    renamed = str(tmp_path / "renamed")
    (spark.read.parquet(table).withColumnRenamed("clip_id", "utt_id")
     .write.partitionBy("part_date").parquet(renamed))
    rdf = spark.read.parquet(renamed)
    rcompiled = compile_ruleset(bundle("rulesets/clip.schema.yaml"),
                                rdf.schema, name="clip",
                                exclude_columns=("ruleset_id",))
    res = ingest_corpus(spark, renamed, rcompiled,
                        partition_col="part_date", row_id="utt_id",
                        out_path=out, manifest_path=man)
    assert res["accepted"] > 0
    corpus = spark.read.parquet(f"{out}/corpus")
    assert "clip_id" in corpus.columns and corpus.count() > 0


def test_ingest_not_skipped_by_validation_only_manifest(spark, table,
                                                        compiled, tmp_path):
    """A partition the VALIDATION flow marked done still needs ingest:
    the ingest flow scopes 'done' to STATUS_INGESTED."""
    from remark_lint_frontmatter_schema_spark.manifest import (
        STATUS_VALIDATED, list_partitions)
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest.json")
    parts = list_partitions(table, "part_date")
    m = Manifest.load(man)
    for p in parts:
        m.record("snap_0", p, compiled.ruleset_hash, STATUS_VALIDATED)
    m.save()
    res = ingest_corpus(spark, table, compiled,
                        partition_col="part_date", row_id="clip_id",
                        out_path=out, manifest_path=man)
    assert set(res["ingested"]) == set(parts)  # validated != ingested
    assert spark.read.parquet(f"{out}/corpus").count() > 0


def test_ingest_crash_rerun_is_invisible_at_read_layer(spark, table,
                                                       compiled, tmp_path):
    """A crashed attempt leaves rows under a run_id the manifest never
    names; the re-run (fresh auto run_id) completes, and readers that
    filter to manifest-named run_ids see exactly one copy per clip."""
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest.json")
    # simulate a crash: split written, then the run dies pre-manifest
    df = spark.read.parquet(table)
    from remark_lint_frontmatter_schema_spark import sinks
    sinks.write_split(df, compiled, path=f"{out}/split")  # orphan run

    res = ingest_corpus(spark, table, compiled,
                        partition_col="part_date", row_id="clip_id",
                        out_path=out, manifest_path=man)
    m = Manifest.load(man)
    named = {e["metrics"]["run_id"] for e in m.entries.values()}
    assert named == {res["run_id"]}
    # per-partition metrics counted only this run's rows (not run+orphan)
    total = sum(e["metrics"]["n_rows"] for e in m.entries.values())
    assert total == 600
    back = spark.read.parquet(f"{out}/split")
    good = back.where(F.col("run_id").isin(list(named)))
    assert good.count() == 600          # exactly one copy per source row
    assert back.count() == 1200         # the orphan's rows exist on disk…
    # …but carry a run_id no manifest entry names, so filtered readers
    # never see them; per-id multiplicity matches the source exactly
    # (the fixture dups ~0.1% of ids on purpose)
    src_counts = {r.clip_id: r["count"] for r in
                  df.groupBy("clip_id").count().collect()}
    good_counts = {r.clip_id: r["count"] for r in
                   good.groupBy("clip_id").count().collect()}
    assert good_counts == src_counts


def test_ingest_repair_first_accepts_fixable_rows(spark, table, compiled,
                                                  tmp_path):
    """repair_ruleset: rows whose only defects are repairable (sr/dur
    out of declared bounds) are fixed and accepted instead of
    quarantined; the repair log is an artifact like the others."""
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "fixed")
    doc = bundle("rulesets/clip.schema.yaml")
    kwargs = dict(partition_col="part_date", row_id="clip_id",
                  fail_severities=("error", "warning"))
    plain = ingest_corpus(spark, table, compiled, out_path=out_a,
                          manifest_path=str(tmp_path / "m1.json"),
                          run_id="p1", **kwargs)
    fixed = ingest_corpus(spark, table, compiled, out_path=out_b,
                          manifest_path=str(tmp_path / "m2.json"),
                          run_id="f1", repair_ruleset=doc, **kwargs)
    # repair can only move rows from quarantine to accepted
    assert fixed["accepted"] > plain["accepted"]
    assert fixed["accepted"] + fixed["quarantined"] == 600
    log = spark.read.parquet(f"{out_b}/repair_log")
    assert log.count() > 0
    assert {"row_id", "action", "before", "after", "run_id"} \
        <= set(log.columns)
    # the accepted split rows re-validate clean on the repaired bounds
    acc = (spark.read.parquet(f"{out_b}/split")
           .where(F.col("accepted").cast("boolean")))
    assert acc.where("sr_hz < 8000 or sr_hz > 48000").count() == 0


def test_ingest_dedupe_against_corpus(spark, table, compiled, tmp_path):
    """Cross-run id uniqueness: a second batch re-sending clips already in
    the corpus ingests only the genuinely new ids; the replayed ids land
    in the dup_ids artifact and the manifest metrics, never the corpus."""
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest.json")
    ingest_corpus(spark, table, compiled,
                  partition_col="part_date", row_id="clip_id",
                  out_path=out, manifest_path=man, run_id="r1",
                  fail_severities=("error", "warning"),
                  dedupe_against_corpus=True)
    corpus_ids = {r.clip_id for r in
                  spark.read.parquet(f"{out}/corpus")
                  .select("clip_id").collect()}
    assert corpus_ids

    # second batch: same rows shifted to new partitions; half keep their
    # ids (replay), half are renamed (genuinely new)
    t2 = str(tmp_path / "clips2")
    df = spark.read.parquet(table).withColumn(
        "part_date", F.date_add("part_date", 30))
    df = df.withColumn(
        "clip_id",
        F.when(F.xxhash64("clip_id") % 2 == 0,
               F.concat(F.lit("new_"), "clip_id")).otherwise(F.col("clip_id")))
    df.write.partitionBy("part_date").parquet(t2)

    res2 = ingest_corpus(spark, t2, compiled,
                         partition_col="part_date", row_id="clip_id",
                         out_path=out, manifest_path=str(tmp_path / "m2.json"),
                         run_id="r2", fail_severities=("error", "warning"),
                         dedupe_against_corpus=True)
    assert res2["ingested"]

    dup_rows = (spark.read.parquet(f"{out}/dup_ids")
                .where(F.col("run_id") == "r2").collect())
    replayed = {r.clip_id for r in
                spark.read.parquet(t2).select("clip_id").collect()
                if not r.clip_id.startswith("new_")}
    # every replayed id ALREADY IN THE CORPUS is skipped (run-1-
    # quarantined ids are not in the corpus and may retry); ids recorded
    # beyond those are within-batch duplicates among the renamed-new rows
    # (round 3: ingest dedupes INSIDE a batch too, deterministically)
    got = {r[0] for r in dup_rows}
    assert replayed & corpus_ids <= got
    assert all(e.startswith("new_") for e in got - (replayed & corpus_ids))
    # the corpus never gains a duplicate id
    c = spark.read.parquet(f"{out}/corpus")
    assert c.count() == c.select("clip_id").distinct().count()
    # and the new ids did ingest
    assert c.where(F.col("clip_id").startswith("new_")).count() > 0
    # manifest metrics account for the skips
    m2 = Manifest.load(str(tmp_path / "m2.json"))
    assert sum(e["metrics"]["n_dup_skipped"]
               for e in m2.entries.values()) == len(dup_rows)
