"""Pre-driver gate: every queries() entry with an oracle must match DuckDB
on row-count, column names, and order-insensitive values at sf0.01 —
exactly what the driver's CORRECTNESS check does."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _rows(pdf):
    rows = [
        tuple(_norm(v) for v in row)
        for row in pdf[sorted(pdf.columns)].itertuples(index=False, name=None)
    ]
    # None is not orderable against str/int — sort on a None-safe key,
    # compare the original tuples.
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF)
    # Driver-canonicalizer guard: the driver sort_values()-es raw cells,
    # so a top-level array/map column raises `unhashable type: 'list'`
    # there even when values match (mask_gate_customer/reconcile_orders,
    # round 3). Oracle-backed queries must emit scalar columns only.
    bad = [f.name for f in df.schema.fields
           if f.dataType.typeName() in ("array", "map")]
    assert not bad, (
        f"{name}: oracle-backed query emits array/map column(s) {bad}; "
        "stringify or drop them (driver canonicalizer cannot sort lists)")
    got = df.toPandas()
    want = duck.execute(ORACLES[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    g, w = _rows(got), _rows(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b][:5]
    assert g == w, f"{name}: first diffs {mismatches}"


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries()) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert "constraint_id" in df.columns


@pytest.mark.parametrize("name", ["mask_gate_customer", "reconcile_orders"])
def test_driver_canonicalizer_can_sort(spark, name):
    """Emulate the driver's _canon: pandas sort_values over every raw
    column. Round 3 this raised `unhashable type: 'list'` for these two
    queries (non-NULL ARRAY<STRING> `expected`); the fix flattens the
    array to its single element."""
    pdf = entry_mod.queries()[name](spark, SF).toPandas()
    pdf.sort_values(by=sorted(pdf.columns))  # must not raise
