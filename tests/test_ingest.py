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
