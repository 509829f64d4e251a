"""Spot-check named ``queries()`` entries against their DuckDB oracles.

Same canonicalization as preflight_correctness.py, but only for the
query names given on the command line — the fast inner loop while adding
a new operator (the full pre-flight takes minutes; this takes seconds).

Usage: python check_queries.py name [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from preflight_correctness import SF, TABLES, _canon, _hash  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: python check_queries.py name [name ...]")
        return 2
    from remark_lint_frontmatter_schema_spark.operators.dedup import (
        release_all)
    from remark_lint_frontmatter_schema_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(master="local[8]", app_name="check-queries",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{SF}/{t}.parquet')")
    qmap, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    for name in names:
        if name not in qmap:
            print(f"FAIL {name}: not in queries()")
            failed.append(name)
            continue
        try:
            got = qmap[name](spark, SF).toPandas()
            if name not in oracles:
                print(f"OK   {name} rows-only spark={len(got)}")
                continue
            want = duck.execute(oracles[name]).fetchdf()
            gc, gr = _canon(got)
            wc, wr = _canon(want)
            ok = (len(gr) == len(wr) and gc == wc
                  and _hash(gr) == _hash(wr))
            print(("OK  " if ok else "FAIL")
                  + f" {name} spark={len(gr)} oracle={len(wr)} "
                  f"schema={'=' if gc == wc else f'{gc} vs {wc}'}")
            if not ok:
                failed.append(name)
                for i, (g, w) in enumerate(zip(gr, wr)):
                    if g != w:
                        print(f"  first diff row {i}:\n   spark  {g}"
                              f"\n   oracle {w}")
                        break
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            failed.append(name)
        release_all()
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
