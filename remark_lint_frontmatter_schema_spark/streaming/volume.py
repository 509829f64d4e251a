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
    rows (partials sum to exactly the batch bucket counts)."""
    from ..operators.outliers import outlier_scores
    # explicit schema: an all-empty sink (every observed batch had only
    # NULL timestamps) reads as zero buckets, not a schema-infer failure
    buckets = (spark.read
               .schema("bucket timestamp, n long, _batch long")
               .parquet(out_path)
               .groupBy("bucket").agg(F.sum("n").alias("n_rows")))
    return (outlier_scores(buckets, "n_rows", row_id="bucket", k=k)
            .select(F.col("row_id").alias("bucket"), "value", "z"))
