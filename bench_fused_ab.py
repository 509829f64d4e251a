"""A/B: fused table-check pass vs standalone per-check passes
(round 5, VERDICT #4) on the x40 scale-stress input.

One declarative ruleset carries 8 table checks — six aggregation-shaped
kinds (x-unique, global x-quantile, x-mask, x-skew, x-volume,
x-freshness), x-drift (rides the fused explode via the second key
slot), and x-ref (shares the narrow projection cache) — and runs twice:
``fused=True`` (the default single-scan plan) and ``fused=False`` (the
escape hatch: one pruned pass per check). Rows are byte-identical
either way (pinned in tests/test_fused_table_checks.py); this measures
the scan-fusion win so BASELINE.md carries a number, not a claim.

Usage: python bench_fused_ab.py [--dir .bench/sf4] [--reps 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from remark_lint_frontmatter_schema_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".bench/sf4"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.dedup import (
        release_all)
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)

    spark = get_spark()
    li = spark.read.parquet(f"{args.dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{args.dir}/supplier.parquet")
    rs = {"properties": {
        "l_partkey": {"x-unique": True},
        "l_quantity": {"x-quantile": {"q": 0.99, "hi": 45.0},
                       "x-drift": {"partition_col": "l_linestatus",
                                   "side_a": "O", "side_b": "F",
                                   "lo": 0.0, "hi": 50.0,
                                   "n_buckets": 25}},
        "l_suppkey": {"x-ref": {"dim": "suppliers",
                                "key": "s_suppkey"}},
        "l_returnflag": {"x-mask": {"expect": "9", "min_share": 0.99},
                         "x-skew": {"max_share": 0.2}},
        "l_shipdate": {"x-volume": {"unit": "month", "k": 2.0},
                       "x-freshness": {
                           "max_age_seconds": 3600,
                           "as_of": "2001-12-01 00:00:00"}}}}
    compiled = compile_ruleset(rs, li.schema, name="ab")
    assert len(compiled.table_checks) == 8
    dims = {"suppliers": supp}

    n_rows = li.count()                       # warm the input cache/page

    def run(fused) -> tuple[float, int]:
        t0 = time.time()
        n = table_check_violations(
            li, compiled, row_id="l_orderkey", dims=dims,
            fused=fused).count()
        dt = time.time() - t0
        release_all()
        return dt, n

    modes = {"cache_shared": True, "explode": "explode",
             "independent": False}
    for m in modes.values():                  # JIT/codegen warmup
        run(m)
    times = {k: [] for k in modes}
    counts = {}
    for _ in range(args.reps):
        for name, m in modes.items():
            dt, n = run(m)
            times[name].append(round(dt, 3))
            counts[name] = n
    assert len(set(counts.values())) == 1, counts
    out = {
        "metric": "table_check_scan_strategy_abc",
        "input_rows": n_rows,
        "n_checks": 8,
        "violations": counts["cache_shared"],
        **{f"{k}_sec": round(min(v), 3) for k, v in times.items()},
        **{f"{k}_all": v for k, v in times.items()},
        "default": "cache_shared",
        "dir": args.dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
