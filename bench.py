"""Headline-query benchmark (driver contract).

Runs the engine's headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ...}.

Each query is materialized with a noop-format write so the full projection
executes (a bare count() would let Catalyst prune the violation structs).
Reported value is the best of $SPARK_GRAFT_BENCH_REPS (default 3) runs —
steady-state throughput, what a long job sees after codegen/JIT warmup
(and the only stable statistic on a noisy shared host); first-run times
are reported alongside as "cold_queries".
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from remark_lint_frontmatter_schema_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

HEADLINE = [
    "benford_gate_by_events",
    "drift_gate_by_events",
    "skew_gate_by_lineitem",
    "skew_profile_by_lineitem",
    "normalize_documents",
    "bm25_documents",
    "er_pairs_part",
    "er_golden_part",
    "funnel_events",
    "resample_events",
    "lm_ppl_documents",
    "validate_orders",
    "verdict_orders",
    "validate_lineitem_pruned",
    "validate_lineitem_fused",
    "footer_profile_lineitem",
    "repair_orders",
    "repair_log_orders",
    "validate_events_props",
    "validate_events_variant",
    "validate_events_unevaluated",
    "validate_embeddings_quality",
    "validate_part_composition",
    "stats_lineitem",
    "profile_lineitem",
    "unique_lineitem_orderkey",
    "ref_orders_customer",
    "ref_orders_customer_bloom",
    "hist_events",
    "outliers_events",
    "content_json_events",
    "validate_events_content_schema",
    "outliers_events_by_type",
    "monotonic_events_by_user",
    "monotonic_events_global",
    "drift_events_ks",
    "drift_events_psi",
    "chunk_documents",
    "mix_documents",
    "text_stats_documents",
    "langid_documents",
    "fingerprint_documents",
    "dedup_exact_documents",
    "gopher_documents",
    "pack_documents",
    "redact_documents",
    "group_split_documents",
    "split_leakage_documents",
    "c4_clean_documents",
    "dup_ngram_documents",
    "dedup_lines_documents",
    "dup_spans_documents",
    "mojibake_documents",
    "gibberish_documents",
    "decontaminate_documents",
    "decontaminate_bloom_documents",
    "validate_documents_content",
    "edit_sim_documents",
    "minhash_dedup_documents",
    "minhash_cluster_documents",
    "simhash_pairs_documents",
    "ann_cosine_topk",
    "ann_pq_topk",
    "approx_stats_lineitem",
    "fd_lineitem",
    "diff_orders",
    "induce_orders",
    "url_dedup_documents",
    "semdedup_embeddings",
    "gap_events_by_user",
    "drift_events_emd",
    "drift_events_type_psi",
    "drift_events_ks_by_type",
    "sessionize_events",
    "asof_events_purchase",
    "asof_bucketed_events_purchase",
    "ref_asof_purchase_signup",
    "profile_events_nonfinite",
    "purchase_session_attribution",
    "ref_interval_purchase_sessions",
    "error_session_overlap",
    "profile_diff_orders",
    "benford_events",
    "benford_gate_events",
    "decontaminate_semantic_embeddings",
    "mask_profile_customer",
    "corr_profile_lineitem",
    "corr_gate_lineitem",
    "mask_gate_customer",
    "mask_gate_by_customer",
    "corr_gate_by_lineitem",
    "unique_multi_lineitem",
    "missing_dates_events",
    "freshness_events",
    "reconcile_orders",
    "skew_profile_lineitem",
    "heavy_hitters_lineitem",
    "mmd_embeddings",
    "weighted_sample_documents",
    "temperature_sample_documents",
    "zipf_documents",
    "drift_events_jsd",
    "drift_events_cvm",
    "rate_ci_orders",
    "readability_documents",
    "lexdiv_documents",
    "heaps_documents",
    "cohort_retention_events",
    "markov_events",
    "hubness_embeddings",
    "winnow_pairs_documents",
    "quantile_gate_lineitem",
    "volume_anomaly_events",
    "volume_by_events",
    "missing_dates_by_events",
    "freshness_by_events",
    "mean_shift_events",
    "containment_documents",
    "funnel_ci_events",
    "drift_type_psi_by_dow",
    "cm_counts_lineitem",
    "lang_confusion_documents",
    "dim_profile_embeddings",
    "stickiness_events",
    "top_paths_events",
    "keywords_documents",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="rlfs-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()

    # Warm fixed machinery outside timing: JVM + file listing via a tiny
    # scan, and the Python-worker pool via one trivial pandas-UDF job (the
    # Bloom/pandas queries otherwise pay ~30 worker spawns on first use).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s
    spark.range(0, 64, 1, 32).select(_warm("id")).write \
        .format("noop").mode("overwrite").save()

    # Per-query: best of REPS runs (steady-state throughput — what a long
    # 100 TB job sees); the first, codegen-compile-heavy run is reported
    # separately as cold_queries.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    from remark_lint_frontmatter_schema_spark.operators.dedup import release_all
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            materialize(qmap[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            # reuse=True operators persist intermediates for the duration
            # of one query; free them so reps (and later queries) never
            # accumulate cached blocks
            release_all()
            if r == 0:
                cold[name] = round(dt, 3)
            best = min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    cold_total = round(sum(cold.values()), 3)
    # Full per-query maps go to a file: the driver captures only the tail
    # of stdout, and 70 warm+cold entries outgrew it in round 2 (the warm
    # headline was lost from BENCH_r02.json). The LAST stdout line is a
    # compact summary that always fits.
    full = {
        "metric": "headline operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_queries": cold,
        "cold_total": cold_total,
        "sf": sf_val,
    }
    with open(os.path.join(REPO, "BENCH_full.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(json.dumps({
        "metric": "headline operator suite wall time",
        "value": total,               # best-of-reps warm total
        "unit": "sec",
        "cold_total": cold_total,     # first-rep total (codegen-inclusive)
        "sf": sf_val,
        "n_queries": len(timings),
        "queries": top5,              # 5 slowest only; full maps in BENCH_full.json
        "detail": "BENCH_full.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
