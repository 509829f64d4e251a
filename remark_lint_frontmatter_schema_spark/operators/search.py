"""BM25 relevance scoring + top-k retrieval over a document corpus.

The corpus-curation use of search: given a handful of probe queries
(benchmark topics, domain descriptors, contamination probes), score every
document by BM25 (Robertson/Sparck-Jones idf, the k1/b saturation form
every Lucene-lineage engine ships) and keep each query's top-k — the
standard way to mine a 100 TB crawl for topical training data or audit
what a benchmark's queries would retrieve.

Scale shape — the inverted-index discipline, not a scan-per-query:
(1) ONE tokenize+explode pass builds the postings relation
(doc_id, term, tf) — shuffled once on (doc, term), payload is ids+terms;
(2) document frequencies aggregate over the term key (keys-only);
(3) the query term table is tiny and BROADCAST, so only postings whose
term appears in some query survive the join — scoring work is
proportional to matching postings, not corpus x queries;
(4) per-(query, doc) scores sum in one groupBy; top-k is a window
partitioned BY QUERY (k small, never a global sort).
Everything is pure-JVM Column work (split/explode/agg/window).

SQL twin: identical algebra in DuckDB (regexp_split_to_array + unnest),
so the driver query is fully oracle-checked — including the idf/saturation
arithmetic, which both engines evaluate in IEEE doubles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SPLIT = r"\W+"


def _postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != "")
    return (docs.where(F.col(text_col).isNotNull())
                .select(F.col(id_col).alias("doc_id"),
                        F.explode(toks).alias("term"))
                .groupBy("doc_id", "term")
                .agg(F.count(F.lit(1)).alias("tf")))


def bm25_scores(docs: DataFrame, queries: list, *,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(query_id, doc_id, score) for every document sharing at least one
    term with the query. ``queries`` is a list of (query_id, text) pairs
    (driver-scale by definition — probes, not a workload). Duplicate
    query terms count once (the standard bag-of-words-query BM25 choice,
    stated so the SQL twin can mirror it)."""
    if not queries:
        raise ValueError("bm25_scores needs at least one (id, text) query")
    spark = docs.sparkSession
    post = _postings(docs, text_col, id_col)
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # corpus constants: one tiny relation, broadcast everywhere
    const = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dl").alias("avgdl"))

    qterms = spark.createDataFrame(
        [(qid, t) for qid, qtext in queries
         for t in sorted({w for w in re.split(TOKEN_SPLIT,
                                              qtext.lower()) if w})],
        "query_id string, term string")
    # prune the postings to the query vocabulary FIRST (broadcast
    # semi-scale join): document frequencies are then aggregated over
    # query terms only — never a full-vocabulary relation to broadcast
    matched = post.join(F.broadcast(qterms.select("term").distinct()),
                        "term")
    df_t = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    sat = (F.col("tf") * (1.0 + k1)
           / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                  / F.col("avgdl"))))
    return (matched
            .join(F.broadcast(qterms), "term")
            .join(F.broadcast(df_t), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(const))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(idf * sat).alias("score")))


def bm25_topk(docs: DataFrame, queries: list, *, k: int = 10,
              **kw) -> DataFrame:
    """Each query's k best documents: (query_id, rank, doc_id, score).
    Ties break by ascending doc_id so ranks are total and deterministic
    (and the SQL twin can state the same ORDER BY)."""
    scores = bm25_scores(docs, queries, **kw)
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("doc_id").asc()))
    return (scores.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "rank", "doc_id", "score"))
