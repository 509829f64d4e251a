"""Entity resolution + survivorship (master-data / golden-record pass).

The record-linkage loop every large catalog, CRM or speaker-registry
pipeline runs: (1) BLOCK records on cheap deterministic keys, (2) VERIFY
candidate pairs inside blocks with an edit-similarity predicate, (3)
CLUSTER matches transitively, (4) pick one SURVIVOR per cluster by
explicit precedence rules. The reference's analog is uniqueness plus
const/enum canonicalization (one true value per key); at corpus scale the
"key" is fuzzy and survivorship is a rule, not a constraint.

Scale contract (same discipline as dedup.ngram_jaccard_pairs):
``er_pairs`` is a verifier — candidate generation is the block map, the
within-block self-join is O(block²) BY DESIGN and the block expression is
REQUIRED. For name-like short strings, deterministic keys (last token,
length band, first char) keep blocks small; for long-text corpora feed
candidates from ``dedup.prefix_filter_jaccard_pairs`` or MinHash-LSH
buckets instead and use this module only for survivorship. Clustering is
``clusters.connected_components`` (large-star/small-star, no cartesian);
survivorship is one window over cluster members. Nothing here ever
shuffles payloads wider than (id, key, name).

All pieces have exact SQL twins (levenshtein exists in DuckDB/ANSI
engines; clustering matches a recursive CTE), so every driver query in
__spark_entry__ is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .clusters import connected_components


def er_pairs(df: DataFrame, *, text_col: str, id_col: str,
             block: Column | str, max_edit: int = 4,
             min_len: int = 1) -> DataFrame:
    """Blocked edit-distance match pairs: records sharing ``block`` whose
    ``text_col`` values differ AND are within ``max_edit`` Levenshtein.

    Returns (id_a, id_b, text_a, text_b, edit) with id_a < id_b. The
    block expression is REQUIRED (a global self-join is a refused
    scale-killer, same contract as ngram_jaccard_pairs). Shuffle payload
    is (id, block_key, text) — names, never documents: callers with long
    text must block upstream and pass a prefix."""
    if block is None:
        raise ValueError(
            "er_pairs requires a block expression — a global self-join "
            "is O(n^2); block on deterministic keys (last token, length "
            "band) or feed candidates from LSH/prefix-filter buckets")
    blk = F.expr(block) if isinstance(block, str) else block
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("text"),
                      blk.alias("blk"))
              .where(F.col("text").isNotNull()
                     & (F.length("text") >= min_len)
                     & F.col("blk").isNotNull()))
    right = (base.select(F.col("id").alias("id_b"),
                         F.col("text").alias("text_b"), "blk"))
    return (base.join(right, "blk")
                .where(F.col("id") < F.col("id_b"))
                .where(F.col("text") != F.col("text_b"))
                .where(F.levenshtein("text", "text_b") <= max_edit)
                .select(F.col("id").alias("id_a"), "id_b",
                        F.col("text").alias("text_a"), "text_b",
                        F.levenshtein("text", "text_b").alias("edit")))


def er_clusters(pairs: DataFrame) -> DataFrame:
    """(id, entity_id) for every matched record; entity_id is the
    minimum member id (connected_components contract)."""
    return (connected_components(pairs, id_a="id_a", id_b="id_b")
            .select(F.col("node").alias("id"),
                    F.col("component").alias("entity_id")))


def golden_records(df: DataFrame, pairs: DataFrame, *, id_col: str,
                   prefer: list | None = None) -> DataFrame:
    """Survivorship: one canonical row per resolved entity.

    Every input row gets an ``entity_id`` (its cluster id, or its own id
    when unmatched) and ``is_survivor``. The survivor is the cluster
    member ranked first under the ``prefer`` column list (descending,
    NULLs last), tie-broken by ascending id so the pick is total and
    deterministic. Plan: broadcast-scale cluster map joined back to the
    fact (clusters are pair-derived, tiny next to the table), then ONE
    window over cluster members only — unmatched rows never enter a
    window."""
    prefer = prefer or []
    from pyspark.sql import Window

    # reserved temp names so a fact column named "id" survives the join
    cl = er_clusters(pairs).select(F.col("id").alias("_rlfs_cl_id"),
                                   "entity_id")
    fact = df.withColumn("_rlfs_id", F.col(id_col))
    joined = fact.join(F.broadcast(cl),
                       fact["_rlfs_id"] == cl["_rlfs_cl_id"],
                       "left").drop("_rlfs_cl_id")
    # split: only MATCHED rows (a tiny fraction of the fact) shuffle into
    # the survivorship window; the unmatched bulk is a map-only pass
    unmatched = (joined.where(F.col("entity_id").isNull())
                 .withColumn("entity_id", F.col("_rlfs_id"))
                 .withColumn("is_survivor", F.lit(True)))
    order = ([F.col(c).desc_nulls_last() for c in prefer]
             + [F.col("_rlfs_id").asc()])
    w = Window.partitionBy("entity_id").orderBy(*order)
    matched = (joined.where(F.col("entity_id").isNotNull())
               .withColumn("is_survivor", F.row_number().over(w) == 1))
    return matched.unionByName(unmatched).drop("_rlfs_id")
