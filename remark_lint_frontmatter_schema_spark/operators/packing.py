"""Training-sequence packing — assign documents to fixed-token-capacity
bins by a global deterministic order (concat-then-split packing).

The reference has no analog (one frontmatter document per file,
``/root/reference/index.ts:201-320``); this is a north-star
training-data-pipeline operator: LLM trainers consume corpora as packed
fixed-budget sequences (documents concatenated in a deterministic order,
split at every ``capacity`` tokens). The packing relation this produces —
``(doc_id, n_tokens, pre_sum, bin_id, offset_in_bin, straddles)`` — is the
exact plan a downstream packer needs, and ``pre_sum`` is a distributed
exclusive prefix sum, which Spark's Window cannot express at scale (an
un-partitioned ``Window.orderBy`` drags the whole table into ONE task).

Semantics: documents are totally ordered by ``(order key, id)``;
``pre_sum`` is the exclusive running sum of token counts in that order;
``bin_id = pre_sum // capacity`` and ``offset_in_bin = pre_sum %
capacity``. A document *straddles* when ``offset_in_bin + n_tokens >
capacity`` — concat-and-split packing cuts it at the boundary (GPT-style
pretraining semantics, where EOD-joined streams are split every context
length). Zero-token and NULL-count documents are excluded.

Scale design (the distributed prefix-sum pattern):

1. ``bucket`` — a fixed-width range bucket of the numeric order key,
   monotone non-decreasing in the key, so bucket boundaries respect the
   global order. Key min/max come from one column-pruned pre-scan (on
   real tables this is parquet-footer metadata, effectively free).
2. per-bucket token totals: one column-pruned aggregate scan
   (map-side combine; ``n_buckets`` rows reach the driver), prefix-summed
   on the driver into per-bucket exclusive offsets.
3. main pass: ONE shuffle (hash by bucket) + per-bucket sort;
   ``pre_sum = bucket_offset + (local window cumsum - n)``. The window is
   partitioned by bucket, so no single task ever holds more than one
   bucket's shard — ``n_buckets`` is the scale knob (set it ~= cluster
   cores; each task sorts ``rows / n_buckets`` narrow tuples).

The shuffled payload is ``(id, n, key)`` — never text. At 10^12 rows the
three narrow scans are scan-bound and the one shuffle moves ~24 B/row;
that is the floor for any *global-order* packing, and this plan hits it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_documents(
    df: DataFrame,
    id_col: str,
    *,
    capacity: int,
    n_col: str | None = None,
    text_col: str | None = None,
    order_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """(doc_id, n_tokens, pre_sum, bin_id, offset_in_bin, straddles) —
    one row per packed document.

    ``n_col`` — an existing token-count column (the profile stage already
    produced one in any real pipeline); else ``text_col`` — whitespace
    tokens are counted here with the same tokenizer as ``text_stats`` /
    ``chunk_documents`` so budgets agree across operators. Exactly one of
    the two must be given.

    ``order_col`` — numeric column giving the packing order (ties broken
    by ``id_col``); defaults to ``id_col`` itself, which must then be
    numeric. Pass e.g. a hash column for shuffled-order packing.

    ``n_buckets`` — prefix-sum parallelism (one sorted shard per bucket).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if (n_col is None) == (text_col is None):
        raise ValueError("pass exactly one of n_col / text_col")
    key = order_col or id_col
    # the order key must cast to double without NULLing out (a string
    # key would silently drop every row at the NULL-key filter); numeric,
    # timestamp/date (epoch), and boolean keys all cast cleanly
    from pyspark.sql import types as T
    _castable = (T.NumericType, T.TimestampType, T.TimestampNTZType,
                 T.DateType, T.BooleanType)
    key_field = ({f.name: f for f in df.schema.fields}).get(key)
    if key_field is not None and not isinstance(key_field.dataType,
                                                _castable):
        raise ValueError(
            f"order key {key!r} must be numeric/timestamp/date, got "
            f"{key_field.dataType.simpleString()}; pass a numeric "
            "order_col (e.g. a hash column) for string ids")

    n_expr = F.col(n_col) if n_col else token_count(text_col)
    staged = (df.select(F.col(id_col).alias("doc_id"),
                        F.col(key).cast("double").alias("_key"),
                        n_expr.cast("long").alias("n_tokens"))
                .where(F.col("n_tokens").isNotNull()
                       & (F.col("n_tokens") > 0)
                       & F.col("_key").isNotNull()))

    # 1. key range — one column-pruned scan (footer-only on real tables)
    lo, hi = staged.agg(F.min("_key"), F.max("_key")).first()
    if lo is None:
        return staged.select(
            "doc_id", "n_tokens",
            F.lit(0).cast("long").alias("pre_sum"),
            F.lit(0).cast("long").alias("bin_id"),
            F.lit(0).cast("long").alias("offset_in_bin"),
            F.lit(False).alias("straddles"))
    width = (hi - lo) / n_buckets or 1.0  # all-equal keys -> one bucket
    # int64->double then floor((k-lo)/width) is monotone in k, which is
    # all bucketing needs (equal keys can never split across buckets
    # because the map is a function of the key alone)
    bucket = F.least(F.lit(n_buckets - 1),
                     F.floor((F.col("_key") - F.lit(float(lo))) / width))
    bucketed = staged.withColumn("_bucket", bucket)

    # 2. per-bucket totals -> driver prefix sum (n_buckets rows)
    totals = {r["_bucket"]: r["t"]
              for r in bucketed.groupBy("_bucket")
                               .agg(F.sum("n_tokens").alias("t")).collect()}
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += totals.get(b, 0)
    # broadcast-join the n_buckets-row offsets relation instead of a
    # literal-map lookup: CreateMap is rebuilt per ROW (no constant
    # folding for map literals), a real cost at 10^12 rows; the hash
    # join probe against a broadcast table is not
    offsets_df = F.broadcast(df.sparkSession.createDataFrame(
        [(b, offsets[b]) for b in range(n_buckets)],
        "_bucket long, _offset long"))
    bucketed = bucketed.join(offsets_df, "_bucket")
    off_expr = F.col("_offset")

    # 3. one shuffle: hash by bucket, sort within, local exclusive cumsum
    w = (Window.partitionBy("_bucket").orderBy("_key", "doc_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = (off_expr + F.sum("n_tokens").over(w) - F.col("n_tokens"))
    # bin assignment in exact LONG arithmetic: floor(pre / capacity) would
    # route the prefix sum through a double, which loses integer exactness
    # past 2^53 total tokens — precisely the 10^12-row regime this plan
    # exists for (and it could disagree with the exactly-computed modulo
    # at bin boundaries). (pre - pre % capacity) stays a capacity-multiple
    # long, so the one division below is exact at any scale.
    staged_pre = bucketed.select(
        "doc_id", "n_tokens", pre.alias("pre_sum"),
        (pre % capacity).alias("offset_in_bin"))
    return staged_pre.select(
        "doc_id", "n_tokens", "pre_sum",
        F.expr(f"pre_sum div {int(capacity)}").alias("bin_id"),
        "offset_in_bin",
        (F.col("offset_in_bin") + F.col("n_tokens") > capacity)
        .alias("straddles"),
    )


def pack_stats(packed: DataFrame, *, capacity: int) -> DataFrame:
    """One-row packing summary: bins used, docs packed, token total,
    straddle fraction, and mean docs per bin. Pure aggregate over the
    packing relation (no extra scan of the corpus).

    ``n_bins`` counts bins the token stream FILLS — ``ceil(total /
    capacity)`` — not merely bins some document starts in: a final
    document straddling several boundaries occupies bins beyond its own
    ``bin_id`` (max(bin_id)+1 would undercount exactly those)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    total = F.sum("n_tokens")
    n_bins = F.expr(f"ceil_bins div {int(capacity)}")
    return packed.agg(
        total.alias("n_tokens_total"),
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("straddles").cast("double")), 6)
        .alias("straddle_fraction"),
        (total + capacity - 1).alias("ceil_bins"),
    ).select(
        n_bins.alias("n_bins"),
        "n_docs", "n_tokens_total", "straddle_fraction",
        F.round(F.col("n_docs") / n_bins, 6).alias("docs_per_bin"),
    )
