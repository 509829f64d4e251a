"""Scale-stress benchmark: run the headline suite where shuffles actually
hurt (VERDICT r1 item 10).

The sandbox testdata tops out at sf0.1 (600k-row lineitem), where every
aggregate fits in one partial-agg wave and shuffle cost is noise. This
script deterministically synthesizes a larger input from sf0.1 — no
external data, stable across runs:

* relational tables (lineitem/orders/customer/part/events) x``REPS_REL``
  with keys remapped ``key*REPS+rep`` so FK relationships, dangling
  fractions and duplicate-key structure are preserved exactly;
* text/embedding tables x``REPS_DOC`` with rep-specific vowel rotation
  (text) / first-component offset (embeddings) so each replica carries the
  SAME near-dup structure as sf0.1 instead of colliding across replicas —
  a naive copy would make every doc a 40-way near-dup and blow the
  LSH-verify join quadratically, which is a different (and unrealistic)
  workload.

Usage:  python bench_scale_stress.py [--dir .bench/sf4] [--skip-gen]
Prints the same one-line JSON contract as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from remark_lint_frontmatter_schema_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPS_REL = 40
REPS_DOC = 4

VOWELS = "aeiou"


def generate(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    def src(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def explode_reps(df, reps):
        return df.crossJoin(
            spark.range(reps).select(F.col("id").cast("int").alias("_rep")))

    def remap(col, reps):
        return (F.col(col) * reps + F.col("_rep")).alias(col)

    def write(df, name, files=32):
        df.repartition(files).write.mode("overwrite") \
          .parquet(f"{out_dir}/{name}.parquet")

    # relational: keys remapped so FK/dup/dangling structure is preserved
    rel = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
        # supplier must remap with lineitem.l_suppkey or the FK structure
        # the docstring promises is broken (~all lineitem rows dangling)
        "supplier": ["s_suppkey"],
    }
    for name, keys in rel.items():
        df = explode_reps(src(name), REPS_REL)
        others = [c for c in src(name).columns if c not in keys]
        write(df.select(*[remap(k, REPS_REL) for k in keys], *others), name)

    # documents: rep-rotated vowels -> replicas are NOT near-dups of each
    # other; per-replica near-dup/lang/quality structure matches sf0.1
    docs = explode_reps(src("documents"), REPS_DOC)
    rot = F.col("_rep") % len(VOWELS)
    rotated = F.col("text")
    for r in range(1, REPS_DOC):
        tgt = VOWELS[r:] + VOWELS[:r]
        rotated = F.when(rot == r, F.translate("text", VOWELS, tgt)) \
                   .otherwise(rotated)
    write(docs.select(
        (F.col("doc_id") * REPS_DOC + F.col("_rep")).alias("doc_id"),
        rotated.alias("text"),
        *[c for c in src("documents").columns
          if c not in ("doc_id", "text")]), "documents", files=16)

    emb = explode_reps(src("embeddings"), REPS_DOC)
    write(emb.select(
        (F.col("vec_id") * REPS_DOC + F.col("_rep")).alias("vec_id"),
        F.concat(
            F.array((F.element_at("embedding", 1)
                     + F.col("_rep") * F.lit(0.001)).cast("float")),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
        *[c for c in src("embeddings").columns
          if c not in ("vec_id", "embedding")]), "embeddings", files=16)

    # small dims with no remapped FK pointing at them copied as-is
    for name in ("region", "nation"):
        write(src(name), name, files=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".bench", "sf4"))
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = get_spark(master=f"local[{args.cpus}]",
                      app_name="rlfs-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_gen:
        generate(spark, args.dir)

    # reuse bench.py's suite/timing machinery on the stressed input
    import time

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from remark_lint_frontmatter_schema_spark.operators.dedup import release_all

    qmap = entry_mod.queries()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings, cold = {}, {}
    for name in bench_mod.HEADLINE:
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            bench_mod.materialize(qmap[name](spark, args.dir))
            dt = time.perf_counter() - t0
            # outside the timed region, matching bench.py's JSON contract
            release_all()
            if r == 0:
                cold[name] = round(dt, 3)
            best = min(best, dt)
        timings[name] = round(best, 3)
    print(json.dumps({
        "metric": "headline suite wall time, scale-stress input",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold_queries": cold,
        "cold_total": round(sum(cold.values()), 3),
        "sf": "sf0.1 x40 relational / x4 text-embedding",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
