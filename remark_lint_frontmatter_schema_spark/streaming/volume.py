"""Streaming ingest-volume monitoring: the streaming twin of
``operators/outliers.volume_anomalies``.

Bucket row-counts are additive, so each micro-batch appends its own
(bucket, n) partials — the exact mechanism of ``streaming/windowed.py``
histogram partials (``_batch``-partitioned dynamic overwrite, so a
replayed batch rewrites rather than double-counts) — and the
median/MAD anomaly scan runs at READ time over the summed partials,
identical numerics to the batch operator on the same rows (pinned by
test). Late rows are not special here: a late event increments its own
(old) bucket in a later batch, and the read-time sum sees the corrected
count — no watermark needed because the scan is not incremental state,
it is a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_volume_stream(spark, input_path: str, input_schema, ts_col: str, *,
                      unit: str = "hour", out_path: str, checkpoint: str,
                      max_files_per_trigger: int = 1):
    """File-source stream -> per-batch (bucket, n) count partials at
    ``out_path``. availableNow-triggered: drains visible files then
    stops; a rerun with the same checkpoint processes only new files."""
    if unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported unit {unit!r}")
    stream = (spark.readStream.schema(input_schema)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(input_path))
    t = F.col(ts_col)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.where(t.isNotNull())
         .groupBy(F.date_trunc(unit, t).alias("bucket"))
         .agg(F.count(F.lit(1)).alias("n"))
         .withColumn("_batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch")
         .parquet(out_path))

    return (stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def volume_anomalies_from_sink(spark, out_path: str, *,
                               k: float = 3.5) -> DataFrame:
    """Median/MAD anomaly scan over the accumulated count partials —
    identical numerics to the batch ``volume_anomalies`` on the same
    rows (partials sum to exactly the batch bucket counts). Reads the
    compacted ``_batch=-1`` partition and live batch partials alike —
    both are (bucket, n) addends."""
    from ..operators.outliers import outlier_scores
    # explicit schema: an all-empty sink (every observed batch had only
    # NULL timestamps) reads as zero buckets, not a schema-infer failure
    buckets = (spark.read
               .schema("bucket timestamp, n long, _batch long")
               .parquet(out_path)
               .groupBy("bucket").agg(F.sum("n").alias("n_rows")))
    return (outlier_scores(buckets, "n_rows", row_id="bucket", k=k)
            .select(F.col("row_id").alias("bucket"), "value", "z"))


def compact_volume_sink(spark, out_path: str, *,
                        keep_last: int = 2) -> int:
    """Fold committed batch partials into one summed ``_batch=-1``
    partition so the sink stays O(buckets) over a long stream lifetime
    instead of O(buckets x batches).

    Partials with ``_batch > max_batch - keep_last`` are left in place:
    Structured Streaming replays at most the batches after the last
    checkpoint commit, and a replayed batch rewrites ITS OWN partition
    (dynamic overwrite) — folding a batch that could still replay would
    double-count it, so ``keep_last`` must cover the replayable tail
    (>= 1; the default 2 is belt-and-braces). Older partitions are
    committed and can never be rewritten, so summing them (together
    with any previous ``_batch=-1``) is exact: read-time numerics are
    unchanged, and re-running compaction is idempotent.

    NOT crash-atomic: the fold writes the new ``-1`` partition before
    deleting its sources, so a crash in between leaves double-counted
    partials until the stale source partitions are removed (the window
    is one tiny driver-scale write; the transactional fix at production
    scale is pointing the sink at an Iceberg table — sources/table.py).
    Returns the number of batch partitions folded away."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the replayable tail "
                         "must survive compaction)")
    sink = (spark.read
            .schema("bucket timestamp, n long, _batch long")
            .parquet(out_path))
    batches = sorted(r._batch for r in
                     sink.select("_batch").distinct().collect())
    live = [b for b in batches if b >= 0]
    if not live:
        return 0
    cutoff = max(live) - int(keep_last)
    fold = [b for b in live if b <= cutoff]
    if not fold:
        return 0
    old = sink.where(F.col("_batch").isin(*(fold + [-1])))
    # materialize the fold on the driver before writing: Spark refuses
    # to overwrite a path it is reading, and the summed relation is
    # bucket-scale (time buckets, not rows) by construction
    folded = old.groupBy("bucket").agg(F.sum("n").alias("n")).collect()
    (spark.createDataFrame([(r.bucket, r.n) for r in folded],
                           "bucket timestamp, n long")
        .withColumn("_batch", F.lit(-1))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(out_path))
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for b in fold:
        p = jvm.org.apache.hadoop.fs.Path(f"{out_path}/_batch={b}")
        p.getFileSystem(conf).delete(p, True)
    return len(fold)
