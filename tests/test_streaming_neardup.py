"""Cross-batch incremental near-dup (streaming MinHash-LSH bucket state).

Checks the three contracts of streaming/neardup.py:
* a near-dup arriving in a LATER micro-batch is flagged against the
  earlier representative (the cross-batch case batch LSH can't do without
  re-joining history);
* unrelated docs are never flagged;
* the streaming candidates are a subset of the batch ``lsh_candidates``
  on the union of the batches (same bands, same signatures — the stream
  is the first-vs-later restriction of the batch banded join).
"""

import time

from pyspark.sql import types as T

BASE = ("the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under amber lights and the crowd hums along softly "
        "until the final chord fades into the warm evening air")
NEAR = BASE.replace("amber", "umber")  # one-word edit: Jaccard ~0.95
OTHER1 = ("completely different content about spark physical plans and "
          "adaptive query execution with skew join handling at scale "
          "nothing in common with foxes or waltzes whatsoever here")
OTHER2 = ("yet another unrelated document discussing parquet column "
          "pruning predicate pushdown and vectorized readers in detail "
          "for the benefit of storage layer enthusiasts everywhere")

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def test_neardup_flags_cross_batch_duplicate(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.neardup import (
        run_neardup_stream)

    p = str(tmp_path / "docs_in")
    spark.createDataFrame([(1, BASE), (2, OTHER1)], SCHEMA) \
        .coalesce(1).write.parquet(p)
    time.sleep(1.1)  # distinct file mtimes -> deterministic batch order
    spark.createDataFrame([(3, NEAR), (4, OTHER2), (5, None)], SCHEMA) \
        .coalesce(1).write.mode("append").parquet(p)

    q = run_neardup_stream(spark, p, SCHEMA, text_col="text",
                           id_col="doc_id", query_name="ndtest",
                           checkpoint=str(tmp_path / "nd_ckpt"))
    q.awaitTermination(180)
    rows = spark.table("ndtest").collect()

    pairs = {(r.id, r.dup_of) for r in rows}
    assert ("3", "1") in pairs, rows          # later batch vs earlier rep
    flagged = {r.id for r in rows} | {r.dup_of for r in rows}
    assert "2" not in flagged and "4" not in flagged, rows
    assert "5" not in flagged, rows           # NULL text never a near-dup
    # multiplicity = per-band hits; every row names the same single pair
    assert pairs == {("3", "1")}, rows


def test_neardup_stream_subset_of_batch_candidates(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.operators.dedup import (
        lsh_candidates, release_all)
    from remark_lint_frontmatter_schema_spark.streaming.neardup import (
        run_neardup_stream)

    docs = [(1, BASE), (2, OTHER1), (3, NEAR), (4, OTHER2),
            (6, BASE + " encore"), (7, OTHER1)]
    p = str(tmp_path / "docs_sub")
    spark.createDataFrame(docs[:2], SCHEMA).coalesce(1).write.parquet(p)
    time.sleep(1.1)
    spark.createDataFrame(docs[2:], SCHEMA) \
        .coalesce(1).write.mode("append").parquet(p)

    q = run_neardup_stream(spark, p, SCHEMA, text_col="text",
                           id_col="doc_id", query_name="ndsub",
                           checkpoint=str(tmp_path / "nds_ckpt"))
    q.awaitTermination(180)
    stream_pairs = {tuple(sorted((int(r.id), int(r.dup_of))))
                    for r in spark.table("ndsub").collect()}

    batch = lsh_candidates(spark.createDataFrame(docs, SCHEMA),
                           "text", "doc_id")
    batch_pairs = {tuple(sorted((r.id_a, r.id_b))) for r in batch.collect()}
    release_all()

    assert stream_pairs, "stream found nothing"
    assert stream_pairs <= batch_pairs, (stream_pairs, batch_pairs)
    # 7 duplicates 2's text exactly and arrives later -> must be caught
    assert (2, 7) in stream_pairs, stream_pairs


def test_neardup_state_survives_restart(spark, tmp_path):
    """The bucket store must persist across query restarts via the
    checkpoint: batch 1 is drained by query #1 (availableNow terminates
    it), then a NEW query on the same checkpoint sees batch 2 — the
    cross-batch pair must still be found against state recovered from the
    state store, and batch 1 must not be reprocessed. Uses the parquet
    file sink: memory sinks refuse checkpoint recovery by design."""
    from remark_lint_frontmatter_schema_spark.streaming.neardup import (
        run_neardup_stream)

    p = str(tmp_path / "docs_rs")
    ckpt = str(tmp_path / "rs_ckpt")
    sink = str(tmp_path / "rs_out")
    spark.createDataFrame([(1, BASE), (2, OTHER1)], SCHEMA) \
        .coalesce(1).write.parquet(p)
    q1 = run_neardup_stream(spark, p, SCHEMA, text_col="text",
                            id_col="doc_id", query_name="rs1",
                            checkpoint=ckpt, sink_path=sink)
    q1.awaitTermination(180)
    assert spark.read.parquet(sink).count() == 0  # nothing duplicated yet

    spark.createDataFrame([(3, NEAR)], SCHEMA) \
        .coalesce(1).write.mode("append").parquet(p)
    q2 = run_neardup_stream(spark, p, SCHEMA, text_col="text",
                            id_col="doc_id", query_name="rs2",
                            checkpoint=ckpt, sink_path=sink)
    q2.awaitTermination(180)
    out = spark.read.parquet(sink)
    pairs = {(r.id, r.dup_of) for r in out.collect()}
    assert pairs == {("3", "1")}, pairs
