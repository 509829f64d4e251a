"""Full-oracle pre-flight in the driver's CORRECTNESS row format.

Runs EVERY oracle-backed ``queries()`` entry against its DuckDB oracle
at sf0.01 (the driver samples ~50 per round; this records all of them)
and writes ``CORRECTNESS_full_r{N}.json`` with per-query
rows/schema/hash verdicts. Rows-only queries (seeded LSH / sketches —
no SQL twin by design) are recorded with ``"oracle_rows": null`` and a
rows-only executed check, mirroring the driver's weaker check.

Usage: python preflight_correctness.py [round_tag]  (default r03)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _canon(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return cols, rows


def _hash(rows) -> str:
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r03"
    from remark_lint_frontmatter_schema_spark.operators.dedup import (
        release_all)
    from remark_lint_frontmatter_schema_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(master="local[8]", app_name="preflight",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{SF}/{t}.parquet')")
    qmap, oracles = entry.queries(), entry.oracle_sql()
    out: dict = {}
    for name in sorted(qmap):
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            df = qmap[name](spark, SF)
            if name in oracles:
                # The driver's canonicalizer sort_values()-es raw cells:
                # a top-level array/map column raises `unhashable type:
                # 'list'` there even when values match (the
                # mask_gate_customer/reconcile_orders r3 lesson). Fail
                # fast here so builder-green always implies driver-green.
                bad_cols = [f.name for f in df.schema.fields
                            if f.dataType.typeName() in ("array", "map")]
                if bad_cols:
                    raise TypeError(
                        f"oracle-backed query emits array/map column(s) "
                        f"{bad_cols} — the driver canonicalizer cannot "
                        f"sort them; stringify or drop")
            got = df.toPandas()
            rec["spark_rows"] = int(len(got))
            if name in oracles:
                want = duck.execute(oracles[name]).fetchdf()
                rec["oracle_rows"] = int(len(want))
                gc, gr = _canon(got)
                wc, wr = _canon(want)
                rec["rows_match"] = len(gr) == len(wr)
                rec["schema_match"] = gc == wc
                rec["hash_match"] = _hash(gr) == _hash(wr)
            else:
                rec["rows_match"] = rec["spark_rows"] >= 0  # rows-only
        except Exception as exc:  # noqa: BLE001 — artifact, not crash
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        release_all()
        ok = (rec["err"] is None
              and rec["rows_match"] is not False
              and rec["schema_match"] is not False
              and rec["hash_match"] is not False)
        print(("OK  " if ok else "FAIL") + f" {name} "
              f"spark={rec['spark_rows']} oracle={rec['oracle_rows']}",
              flush=True)
    # VERDICT r3 #6: record which queries have NEVER appeared in any
    # driver CORRECTNESS round (they are green here but the judge should
    # know the driver's sample never exercised them). "_meta" sorts
    # first and per-query readers skip non-dict-shaped keys by name.
    sampled: set = set()
    import glob
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json")):
        try:
            sampled |= set(json.load(open(f)))
        except Exception:
            pass
    out["_meta"] = {
        "round": tag,
        "n_queries": len(qmap),
        "n_oracle_backed": sum(1 for n in qmap if n in oracles),
        "never_driver_sampled": sorted(set(qmap) - sampled),
    }
    path = os.path.join(REPO, f"CORRECTNESS_full_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    bad = [n for n, r in out.items() if not n.startswith("_")
           and (r["err"] or r["rows_match"] is False
                or r["schema_match"] is False
                or r["hash_match"] is False)]
    n_oracle = sum(1 for n in out if n in oracles)
    print(f"\n{len(out)} queries ({n_oracle} oracle-backed) -> {path}; "
          f"problems: {bad or 'none'}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
