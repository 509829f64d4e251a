"""Benford first-digit conformance check."""

import math

import pytest

from remark_lint_frontmatter_schema_spark.operators.drift import benford


def test_benford_counts_and_stats(spark):
    # 2 values with digit 1, 1 with digit 3, 1 with digit 9; zeros,
    # NULLs, negatives (digit from |v|), non-finite excluded
    rows = [(1.23,), (0.0017,), (-35.0,), (900.0,), (0.0,), (None,),
            (float("nan"),), (float("inf"),)]
    df = spark.createDataFrame(rows, "v double")
    got = {r.digit: r for r in benford(df, "v").collect()}
    assert sorted(got) == list(range(1, 10))
    assert got[1].n == 2 and got[3].n == 1 and got[9].n == 1
    assert got[2].n == 0 and got[2].observed == 0.0
    assert got[1].observed == 0.5
    for d in range(1, 10):
        assert got[d].expected == round(math.log10(1 + 1 / d), 6)
    # chi2 equals the python recomputation, same on every row
    n = {1: 2, 3: 1, 9: 1}
    chi2 = sum((n.get(d, 0) - 4 * math.log10(1 + 1 / d)) ** 2
               / (4 * math.log10(1 + 1 / d)) for d in range(1, 10))
    assert got[5].chi2 == pytest.approx(chi2, abs=1e-5)
    assert len({r.chi2 for r in got.values()}) == 1


def test_benford_discriminates(spark):
    # log-uniform data IS Benford; constant-leading-digit data is not
    import numpy as np
    rng = np.random.default_rng(3)
    nat = spark.createDataFrame(
        [(float(10 ** u),) for u in rng.uniform(0, 4, 4000)], "v double")
    chi_nat = benford(nat, "v").collect()[0].chi2
    fab = spark.createDataFrame(
        [(5000.0 + i,) for i in range(3000)], "v double")
    chi_fab = benford(fab, "v").collect()[0].chi2
    assert chi_nat < 30 < 1000 < chi_fab


def test_benford_power_of_ten_clamp(spark):
    df = spark.createDataFrame(
        [(1.0,), (10.0,), (100.0,), (1000.0,), (0.1,), (0.001,)],
        "v double")
    got = {r.digit: r.n for r in benford(df, "v").collect()}
    assert got[1] == 6  # every power of ten has first digit 1


def test_benford_empty_input_degrades_to_null(spark):
    df = spark.createDataFrame([(0.0,), (None,)], "v double")
    got = benford(df, "v").collect()
    assert len(got) == 9
    assert all(r.n == 0 and r.observed is None and r.chi2 is None
               for r in got)
