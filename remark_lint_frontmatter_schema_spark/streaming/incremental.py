"""Optional incremental mode (SURVEY.md §2.9 T2).

The reference is a batch linter; this is the Structured-Streaming wrapper
that runs the SAME compiled ruleset over newly-arrived files via
``foreachBatch`` — the streaming analog of re-linting only changed files.
Watermarks/session windows are deliberately out of scope (no reference
semantics require them); exactly-once violation appends come from the
checkpointed sink. In production the source is Iceberg incremental reads;
here it is a file-source directory of parquet.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.validate import validate
from ..plans.compiler import CompiledRuleset


def validate_stream(
    spark: SparkSession,
    input_path: str,
    input_schema,
    compiled: CompiledRuleset,
    *,
    row_id: str,
    partition_col: str | None,
    violations_sink: str,
    verdicts_sink: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Start (and with availableNow, drain) a validation stream.

    Each micro-batch runs the identical one-projection plan; per-batch
    verdicts are appended with the batch id as run_id so late batches are
    attributable — corrupt rows become violation rows, never stream
    failures (the reference's parse-failure guard, index.ts:240-245).
    """
    stream = (spark.readStream.schema(input_schema)
              .option("maxFilesPerTrigger", "16")
              .parquet(input_path))

    def process_batch(batch_df, batch_id: int):
        res = validate(batch_df, compiled, row_id=row_id,
                       partition_col=partition_col,
                       run_id=f"batch_{batch_id}")
        res.violations.write.mode("append").parquet(violations_sink)
        res.verdicts.write.mode("append").parquet(verdicts_sink)

    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
