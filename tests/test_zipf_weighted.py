"""weighted_sample (A-ES) and zipf_fit."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.sampling import (
    weighted_sample)
from remark_lint_frontmatter_schema_spark.operators.text import zipf_fit


def _aes_key(doc_id, w):
    h = hashlib.sha256(str(doc_id).encode()).hexdigest()
    u = int(h[:13], 16) / float(16 ** 13)
    return u ** (1.0 / w)


def test_weighted_sample_matches_python_twin(spark):
    rows = [(i, float(1 + (i % 7))) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double").repartition(7)
    got = sorted(r.id for r in weighted_sample(df, "id", "w", 50).collect())
    want = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-_aes_key(*t), t[0]))[:50])
    assert got == want


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    rows = [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 5.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r.id for r in weighted_sample(df, "id", "w", 10).collect())
    assert got == [1, 5]


def test_weighted_sample_bias_toward_heavy(spark):
    # 200 heavy (w=50) + 200 light (w=1): a 100-row sample should be
    # dominated by heavy rows (deterministic given the hash, no flake)
    rows = [(i, 50.0) for i in range(200)] + \
           [(i, 1.0) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", 100).collect()
    heavy = sum(1 for r in got if r.id < 200)
    assert heavy > 85


def test_weighted_sample_k_overshoot_and_guard(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, w double")
    assert weighted_sample(df, "id", "w", 99).count() == 2
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", 0)


def test_zipf_fit_matches_numpy_lstsq(spark):
    # exact Zipf corpus: token t{i} appears round(1000/i) times
    words = []
    for i in range(1, 40):
        words += [f"t{i}"] * round(1000 / i)
    docs = [(" ".join(words[j:j + 50]),) for j in range(0, len(words), 50)]
    df = spark.createDataFrame(docs, "text string").repartition(5)
    row = zipf_fit(df, "text", top_k=30).collect()[0]
    # numpy twin over the same counts/ranks
    from collections import Counter
    cnt = Counter(w.lower() for d in docs for w in d[0].split())
    top = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:30]
    x = np.log(np.arange(1, 31, dtype=float))
    y = np.log(np.array([c for _, c in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert row.n_fit == 30
    assert row.top_mass == sum(c for _, c in top)
    assert row.slope == pytest.approx(slope, abs=1e-5)
    assert row.intercept == pytest.approx(intercept, abs=1e-5)
    assert -1.1 < row.slope < -0.9  # it IS a Zipf corpus
    assert row.r2 > 0.98


def test_zipf_fit_edges(spark):
    df = spark.createDataFrame([("a a b",), (None,), ("",)], "text string")
    row = zipf_fit(df, "text", top_k=10).collect()[0]
    assert row.n_fit == 2 and row.top_mass == 3
    with pytest.raises(ValueError):
        zipf_fit(df, "text", top_k=1)
