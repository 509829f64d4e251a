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
        python bench_scale_stress.py --tier x400 [--queries a,b,...]
Prints the same one-line JSON contract as bench.py.

Tiers (round 5, VERDICT #5): ``x40`` is the standard stress input
(REPS_REL=40 / REPS_DOC=4). ``x400`` is the next decade — 240M-row
lineitem (REPS_REL=400) / x8 documents-embeddings — where
driver-scale assumptions (collected histogram relations, bucket
boundary lists, Misra-Gries widths) would surface; by default it runs
the 15 slowest queries of the x40 artifact (override with
``--queries``), since the point is the tail, not the sum.
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

TIERS = {"x40": (40, 4, "sf4"), "x400": (400, 8, "sf40")}

# 15 slowest queries of the r4 x40 artifact (BENCH_scale_stress.json)
X400_DEFAULT_QUERIES = [
    "validate_lineitem_fused", "edit_sim_documents",
    "repair_log_orders", "cm_counts_lineitem",
    "winnow_pairs_documents", "hubness_embeddings", "fd_lineitem",
    "heavy_hitters_lineitem", "approx_stats_lineitem",
    "decontaminate_semantic_embeddings", "minhash_cluster_documents",
    "semdedup_embeddings", "profile_lineitem",
    "containment_documents", "reconcile_orders",
]

VOWELS = "aeiou"


def generate(spark, out_dir: str, reps_rel: int = REPS_REL,
             reps_doc: int = REPS_DOC) -> None:
    from pyspark.sql import functions as F

    def src(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def explode_reps(df, reps):
        # spread the source before the crossJoin: sf0.1 parquet is
        # near-single-split, so without this the whole xREPS expansion
        # runs in a couple of map tasks (the x400 lesson)
        return df.repartition(32).crossJoin(
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
        df = explode_reps(src(name), reps_rel)
        others = [c for c in src(name).columns if c not in keys]
        write(df.select(*[remap(k, reps_rel) for k in keys], *others),
              name, files=min(128, max(32, reps_rel)))

    # documents: rep-rotated vowels -> replicas are NOT near-dups of each
    # other; per-replica near-dup/lang/quality structure matches sf0.1
    docs = explode_reps(src("documents"), reps_doc)
    rot = F.col("_rep") % len(VOWELS)
    rotated = F.col("text")
    for r in range(1, reps_doc):
        tgt = VOWELS[r % len(VOWELS):] + VOWELS[:r % len(VOWELS)]
        rotated = F.when(rot == r % len(VOWELS),
                         F.translate("text", VOWELS, tgt)) \
                   .otherwise(rotated)
    write(docs.select(
        (F.col("doc_id") * reps_doc + F.col("_rep")).alias("doc_id"),
        rotated.alias("text"),
        *[c for c in src("documents").columns
          if c not in ("doc_id", "text")]), "documents", files=16)

    emb = explode_reps(src("embeddings"), reps_doc)
    write(emb.select(
        (F.col("vec_id") * reps_doc + F.col("_rep")).alias("vec_id"),
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
    ap.add_argument("--tier", choices=sorted(TIERS), default="x40")
    ap.add_argument("--dir", default=None)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: full HEADLINE "
                         "at x40, the 15 slowest at x400)")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()
    reps_rel, reps_doc, dirname = TIERS[args.tier]
    if args.dir is None:
        args.dir = os.path.join(REPO, ".bench", dirname)

    spark = get_spark(master=f"local[{args.cpus}]",
                      app_name="rlfs-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_gen:
        generate(spark, args.dir, reps_rel, reps_doc)

    # reuse bench.py's suite/timing machinery on the stressed input
    import time

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from remark_lint_frontmatter_schema_spark.operators.dedup import release_all

    qmap = entry_mod.queries()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    if args.queries:
        suite = args.queries.split(",")
    elif args.tier == "x400":
        suite = X400_DEFAULT_QUERIES
    else:
        suite = bench_mod.HEADLINE
    timings, cold = {}, {}
    for name in suite:
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
        "sf": f"sf0.1 x{reps_rel} relational / x{reps_doc} "
              "text-embedding",
        "tier": args.tier,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
