"""Cross-batch streaming transition counting (streaming/markov.py):
boundary transitions only the stateful stream can see, stream == batch
matrix parity, late-data drop, and replay idempotence."""

import time

from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("u", T.StringType()),
    T.StructField("s", T.StringType()),
    T.StructField("o", T.DoubleType()),
])

ROWS_B1 = [("u1", "a", 1.0), ("u1", "b", 2.0), ("u2", "x", 1.0),
           ("u2", None, 1.5), ("u1", "z", None)]
ROWS_B2 = [("u1", "c", 3.0), ("u2", "x", 2.0), ("u2", "y", 3.0)]


def _run(spark, tmp_path, tag, extra_rows=()):
    from remark_lint_frontmatter_schema_spark.streaming.markov import (
        run_transition_stream)
    p = str(tmp_path / f"{tag}_in")
    spark.createDataFrame(ROWS_B1, SCHEMA).coalesce(1).write.parquet(p)
    time.sleep(1.1)
    spark.createDataFrame(ROWS_B2 + list(extra_rows), SCHEMA) \
        .coalesce(1).write.mode("append").parquet(p)
    out = str(tmp_path / f"{tag}_out")
    ckpt = str(tmp_path / f"{tag}_ckpt")
    q = run_transition_stream(spark, p, SCHEMA, "u", "s", "o",
                              out_path=out, checkpoint=ckpt)
    q.awaitTermination(180)
    return p, out, ckpt


def test_stream_counts_boundary_transitions_and_matches_batch(
        spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.operators import cohort
    from remark_lint_frontmatter_schema_spark.streaming.markov import (
        matrix_from_sink)
    p, out, _ = _run(spark, tmp_path, "m1")
    got = {(r.src, r.dst): (r.n, r.p)
           for r in matrix_from_sink(spark, out).collect()}
    # boundary transitions b->c (u1) and x->x (u2) must be present
    assert got[("b", "c")][0] == 1
    assert got[("x", "x")][0] == 1
    # stream == batch on the union of all arrived rows
    batch = {(r.src, r.dst): (r.n, r.p)
             for r in cohort.transition_matrix(
                 spark.read.parquet(p), "u", "s", "o").collect()}
    assert got == batch


def test_stream_drops_late_rows_no_rewind(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.markov import (
        matrix_from_sink)
    # a late u1 row at o=0.5 (older than batch-1 mark 2.0) must not
    # fabricate transitions b->late or late->c
    _, out, _ = _run(spark, tmp_path, "m2",
                     extra_rows=[("u1", "late", 0.5)])
    got = {(r.src, r.dst) for r in matrix_from_sink(spark, out).collect()}
    assert ("b", "late") not in got and ("late", "c") not in got
    assert ("b", "c") in got


def test_stream_replay_is_idempotent(spark, tmp_path):
    from remark_lint_frontmatter_schema_spark.streaming.markov import (
        matrix_from_sink, run_transition_stream)
    p, out, ckpt = _run(spark, tmp_path, "m3")
    before = sorted(
        (r.src, r.dst, r.n) for r in matrix_from_sink(spark, out).collect())
    # rerun with the same checkpoint: no new files -> same matrix
    q = run_transition_stream(spark, p, SCHEMA, "u", "s", "o",
                              out_path=out, checkpoint=ckpt)
    q.awaitTermination(180)
    after = sorted(
        (r.src, r.dst, r.n) for r in matrix_from_sink(spark, out).collect())
    assert before == after


def test_stream_null_keys_absent_and_empty_sink_reads(spark, tmp_path):
    """NULL-key rows are absent (the batch contract — no NULL-key group
    may fabricate transitions), and a sink to which no batch ever wrote
    a transition reads as an empty matrix, not a schema-infer failure."""
    from remark_lint_frontmatter_schema_spark.streaming.markov import (
        matrix_from_sink, run_transition_stream)
    p = str(tmp_path / "nk_in")
    # only NULL-key rows + one single-event key: zero transitions total
    rows = [(None, "a", 1.0), (None, "b", 2.0), ("u9", "z", 1.0)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(p)
    out = str(tmp_path / "nk_out")
    q = run_transition_stream(spark, p, SCHEMA, "u", "s", "o",
                              out_path=out,
                              checkpoint=str(tmp_path / "nk_ckpt"))
    q.awaitTermination(180)
    assert matrix_from_sink(spark, out).count() == 0
