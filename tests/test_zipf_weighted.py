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


def test_temperature_sample_rebalances(spark):
    from remark_lint_frontmatter_schema_spark.operators.sampling import (
        temperature_sample)
    # 9000 'en' + 900 'de' + 100 'sw' (+NULL dropped)
    rows = ([(i, "en") for i in range(9000)]
            + [(i + 10_000, "de") for i in range(900)]
            + [(i + 20_000, "sw") for i in range(100)]
            + [(30_000, None)])
    df = spark.createDataFrame(rows, "id long, lang string")
    kept = temperature_sample(df, "lang", "id", alpha=0.3)
    counts = {r.lang: r.n for r in
              kept.groupBy("lang").agg(__import__(
                  "pyspark.sql.functions", fromlist=["F"]
              ).count("*").alias("n")).collect()}
    # expected rates: q_g ~ p^0.3; r_g = (q/p)/max -> sw keeps ~all,
    # en is thinned hardest; realized counts = binomial-free hash
    # membership, so just pin the ORDERING and rough magnitudes
    assert None not in counts
    assert counts["sw"] >= 95            # near rate 1.0
    assert counts["de"] < 900 and counts["de"] > 200
    assert counts["en"] < 0.25 * 9000    # heavily thinned
    # deterministic: second run keeps the identical rows
    ids1 = sorted(r.id for r in kept.collect())
    ids2 = sorted(r.id for r in temperature_sample(
        df, "lang", "id", alpha=0.3).collect())
    assert ids1 == ids2
    # alpha=1 keeps everything (rates all 1.0)
    assert temperature_sample(df, "lang", "id", alpha=1.0).count() == 10000
    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_sample(df, "lang", "id", alpha=0)


def test_temperature_python_twin_exact(spark):
    """Exact membership parity with a from-scratch python recompute."""
    import hashlib
    from remark_lint_frontmatter_schema_spark.operators.sampling import (
        temperature_sample)
    rows = [(i, ["a", "b", "c"][i % 3 if i < 60 else 0]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string")
    alpha = 0.5
    from collections import Counter
    cnt = Counter(g for _, g in rows)
    total = sum(cnt.values())
    p = {g: n / total for g, n in cnt.items()}
    w = {g: p[g] ** alpha for g in p}
    ws = sum(w.values())
    ratio = {g: (w[g] / ws) / p[g] for g in p}
    rmax = max(ratio.values())
    rate = {g: ratio[g] / rmax for g in p}

    def u(i):
        return int(hashlib.sha256(str(i).encode()).hexdigest()[:13], 16) \
            / float(16 ** 13)

    want = sorted(i for i, g in rows if u(i) < rate[g])
    got = sorted(r.id for r in temperature_sample(
        df, "g", "id", alpha=alpha).collect())
    assert got == want


def test_weighted_sample_excludes_nan(spark):
    rows = [(1, float("nan")), (2, float("nan")), (3, 1.0), (4, 2.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r.id for r in weighted_sample(df, "id", "w", 2).collect())
    assert got == [3, 4]  # NaN weights carry no mass
