"""Per-column stats profiler (SURVEY.md §2.4 A3-A5, north_star).

One pass over the table: count, null-count/null-rate, min/max, approximate
distinct (HLL++), approximate quantiles (Spark's built-in sketch) — all in
a single multi-aggregate so the job stays scan-bound. Partial aggregation
(map-side combine) is automatic for every one of these, so the shuffle
carries only per-partition sketch state, never rows.

The t-digest option of SURVEY.md A4 is implemented as mergeable
per-partition digests via ``applyInPandas`` in ``tdigest_quantiles`` — used
only when exact-sketch parity matters; ``percentile_approx`` is the default
scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)

DEFAULT_QUANTILES = (0.25, 0.5, 0.75, 0.95, 0.99)


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    quantiles: tuple = DEFAULT_QUANTILES,
    approx_accuracy: int = 10000,
    group_by: str | None = None,
) -> DataFrame:
    """Long-form stats: one output row per profiled column.

    Output: column, n_rows, n_nulls, n_nonfinite, null_rate,
    min_value/max_value (as string — mixed types in one relation),
    approx_distinct, and q_* columns for numeric inputs. ``group_by``
    yields per-partition profiles. For float/double columns min/max and
    quantiles describe the FINITE mass (one NaN would otherwise poison
    max, one Inf every upper quantile) and ``n_nonfinite`` counts
    NaN/±Inf values — 0 for types that cannot hold them.
    """
    if columns is None:
        columns = [f.name for f in df.schema.fields
                   if not isinstance(f.dataType, (T.BinaryType, T.MapType,
                                                  T.ArrayType, T.StructType))]
    if not columns:
        raise ValueError(
            "column_stats: no profilable columns (binary/map/array/struct "
            "columns are excluded; pass `columns` explicitly)")
    key = ["partition_id"] if group_by else []
    by = [F.col(group_by).cast("string").alias("partition_id")] if group_by else []

    # ONE aggregate over ONE scan for every profiled column (a per-column
    # groupBy + union would rescan the table N times — fatal at 100 TB);
    # the wide agg row is then exploded into the long per-column form.
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    for i, c in enumerate(columns):
        dt = df.schema[c].dataType
        numeric = isinstance(dt, _NUMERIC)
        is_float = isinstance(dt, (T.FloatType, T.DoubleType))
        ordered = F.col(c)
        if is_float:
            # NaN sorts ABOVE every double in Spark, so one NaN poisons
            # max() (and Inf poisons every quantile above its rank):
            # min/max/quantiles describe the FINITE mass; the non-finite
            # count is its own statistic — a quality engine must surface
            # "2 NaNs", not report max=NaN
            nonfinite = F.isnan(ordered) | (F.abs(ordered)
                                            == F.lit(float("inf")))
            ordered = F.when(~nonfinite, ordered)
            # coalesce: NULL values make the flag NULL, and sum over
            # all-NULLs is NULL — the contract says COUNT, so 0
            nf_agg = F.coalesce(
                F.sum(F.coalesce(nonfinite, F.lit(False)).cast("long")),
                F.lit(0))
        else:
            nf_agg = F.lit(0).cast("long")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_{i}_nulls"),
            nf_agg.alias(f"_{i}_nonfinite"),
            F.min(ordered).cast("string").alias(f"_{i}_min"),
            F.max(ordered).cast("string").alias(f"_{i}_max"),
            F.approx_count_distinct(F.col(c)).alias(f"_{i}_dist"),
            (F.percentile_approx(ordered, list(quantiles), approx_accuracy)
             .cast("array<double>") if numeric
             else F.array(*[F.lit(None).cast("double") for _ in quantiles])
             ).alias(f"_{i}_qs"),
        ]
    agg = df.groupBy(*by).agg(*aggs)

    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n_rows").alias("n_rows"),
            F.col(f"_{i}_nulls").alias("n_nulls"),
            F.col(f"_{i}_nonfinite").alias("n_nonfinite"),
            (F.col(f"_{i}_nulls") / F.col("_n_rows")).alias("null_rate"),
            F.col(f"_{i}_min").alias("min_value"),
            F.col(f"_{i}_max").alias("max_value"),
            F.col(f"_{i}_dist").alias("approx_distinct"),
            *[F.col(f"_{i}_qs")[j].alias(f"q_{int(q * 100)}")
              for j, q in enumerate(quantiles)],
        )
        for i, c in enumerate(columns)
    ]
    return (agg.select(*key, F.explode(F.array(*entries)).alias("_st"))
               .select(*key, "_st.*"))


# ---------------------------------------------------------------------------
# optional t-digest parity path (SURVEY.md A4): mergeable per-partition
# digests; digests are associative so the driver merge is exact
# ---------------------------------------------------------------------------

def tdigest_quantiles(df: DataFrame, column: str,
                      quantiles: tuple = DEFAULT_QUANTILES,
                      delta: int = 200) -> dict:
    """Approximate quantiles via a simple mergeable centroid digest.

    Per-partition digests are built with ``applyInPandas``-style batch code
    inside ``mapInPandas`` (Arrow batches; no per-row Python), then merged
    on the driver — the classic t-digest dataflow without the scipy dep.
    """
    import numpy as np
    import pandas as pd

    def partition_digest(batches):
        means, weights = [], []
        for pdf in batches:
            v = pd.to_numeric(pdf[column], errors="coerce").dropna().to_numpy()
            if len(v) == 0:
                continue
            v.sort()
            # compress this batch into <= delta centroids
            chunks = np.array_split(v, min(delta, len(v)))
            means.extend(float(c.mean()) for c in chunks)
            weights.extend(len(c) for c in chunks)
        yield pd.DataFrame({"mean": means, "weight": weights})

    digests = df.select(column).mapInPandas(
        partition_digest, schema="mean double, weight long").toPandas()
    if digests.empty:
        return {q: None for q in quantiles}
    d = digests.sort_values("mean")
    cum = d["weight"].cumsum()
    total = float(d["weight"].sum())
    out = {}
    for q in quantiles:
        target = q * total
        idx = int((cum >= target).idxmax())
        out[q] = float(d.loc[idx, "mean"])
    return out
