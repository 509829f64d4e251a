"""Scaling pair for the corpus-level duplication operators (round-2k):
cross_doc_dup_fraction and dedup_lines at local[8] vs local[32] on a
deterministically replicated documents table.

Replication keeps the sf0.1 corpus's duplication STRUCTURE instead of
manufacturing an all-pairs blowup: replica r rotates each document's
vowels r%5 positions (the bench_scale_stress recipe), so cross-replica
texts never collide exactly while each replica carries the same internal
near-dup relationships. doc_ids remap ``id*REPS + r``.

Usage:
  python bench_corpus_scaling.py prepare [--reps 100] [--dir D]
  python bench_corpus_scaling.py run --master local[8] [--dir D]
Prints one JSON line per run: {"master", "n_docs", "dup_ngram_sec",
"dedup_lines_sec", "docs_per_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from remark_lint_frontmatter_schema_spark.operators import dedup  # noqa: E402
from remark_lint_frontmatter_schema_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
VOWELS = "aeiou"


def prepare(out_dir: str, reps: int) -> None:
    spark = get_spark(app_name="corpus-scale-prepare")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(SRC)
    rep = spark.range(reps).withColumnRenamed("id", "_rep")
    rot = F.pmod(F.col("_rep"), F.lit(len(VOWELS))).cast("int")
    # translate() needs a constant mapping per rotation — build per-rotation
    # frames and join the replica index onto them (5 rotations only)
    frames = []
    for r in range(len(VOWELS)):
        mapped = VOWELS[r:] + VOWELS[:r]
        frames.append(
            docs.select(
                (F.col("doc_id") * reps).alias("_base"),
                F.translate("text", VOWELS, mapped).alias("text"),
                "lang", "source", "n_chars")
            .withColumn("_rot", F.lit(r)))
    by_rot = frames[0]
    for f in frames[1:]:
        by_rot = by_rot.unionByName(f)
    full = (rep.join(by_rot, rot == F.col("_rot"))
            .select((F.col("_base") + F.col("_rep")).alias("doc_id"),
                    "text", "lang", "source", "n_chars"))
    (full.repartition(64).write.mode("overwrite")
     .parquet(os.path.join(out_dir, "documents")))
    n = spark.read.parquet(os.path.join(out_dir, "documents")).count()
    print(json.dumps({"prepared_docs": n, "dir": out_dir}))
    spark.stop()


def run(master: str, out_dir: str, reps_timed: int = 2) -> None:
    cores = int(master.split("[")[1].rstrip("]")) if "[" in master else 8
    spark = get_spark(master=master, app_name=f"corpus-scale-{master}",
                      shuffle_partitions=cores,
                      extra_conf={"spark.driver.memory": f"{cores}g"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(out_dir, "documents"))
    n_docs = docs.count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    def time_op(build):
        best = float("inf")
        mat(build())  # warm (plan compile, page cache)
        dedup.release_all()
        for _ in range(reps_timed):
            t0 = time.perf_counter()
            mat(build())
            best = min(best, time.perf_counter() - t0)
            dedup.release_all()
        return best

    t_ngram = time_op(lambda: dedup.cross_doc_dup_fraction(
        docs, "text", "doc_id", n=5))
    multi = docs.withColumn(
        "text", F.regexp_replace("text", r"((?:\S+ ){3}\S+) ", "$1\n"))
    t_lines = time_op(lambda: dedup.dedup_lines(
        multi, "text", "doc_id", min_count=2, min_line_chars=12))
    print(json.dumps({
        "master": master, "n_docs": n_docs,
        "dup_ngram_sec": round(t_ngram, 2),
        "dup_ngram_docs_per_sec": round(n_docs / t_ngram, 1),
        "dedup_lines_sec": round(t_lines, 2),
        "dedup_lines_docs_per_sec": round(n_docs / t_lines, 1),
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["prepare", "run"])
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--dir", default=os.path.join(REPO, ".bench/corpus"))
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()
    if args.mode == "prepare":
        prepare(args.dir, args.reps)
    else:
        run(args.master, args.dir)


if __name__ == "__main__":
    main()
