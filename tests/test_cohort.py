"""Cohort retention + transition matrix (operators/cohort.py) on hand
fixtures: triangle values, the offset-0 == 1.0 invariant, NULL-absence,
and tiebreak determinism."""

from datetime import datetime

import pytest

from remark_lint_frontmatter_schema_spark.operators import cohort


def _ts(day):
    return datetime(2024, 1, day)


def test_cohort_retention_triangle(spark):
    # weeks: Jan 1 (Mon) and Jan 8 cohorts
    rows = [
        ("A", _ts(2)), ("A", _ts(9)),       # w1 cohort, active w1+w2
        ("B", _ts(3)),                       # w1 cohort, active w1 only
        ("C", _ts(8)), ("C", _ts(16)),       # w2 cohort, active w2+w3
        (None, _ts(2)), ("D", None),         # absent (NULL user / ts)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {(r.cohort.day, r.period_offset): r
           for r in cohort.cohort_retention(df, "user_id", "ts").collect()}
    assert got[(1, 0)].n_active == 2 and got[(1, 0)].cohort_size == 2
    assert got[(1, 0)].retention == 1.0
    assert got[(1, 1)].n_active == 1 and got[(1, 1)].retention == 0.5
    assert got[(8, 0)].retention == 1.0
    assert got[(8, 1)].n_active == 1 and got[(8, 1)].cohort_size == 1
    assert len(got) == 4
    # offset 0 is 1.0 for every cohort by construction
    assert all(r.retention == 1.0 for k, r in got.items() if k[1] == 0)
    with pytest.raises(ValueError, match="unit"):
        cohort.cohort_retention(df, "user_id", "ts", unit="fortnight")


def test_transition_matrix_hand_values(spark):
    rows = [("u1", "a", 1, 1), ("u1", "b", 2, 2), ("u1", "a", 3, 3),
            ("u2", "a", 4, 1), ("u2", "a", 5, 2),
            ("u3", "z", 6, 1)]                      # single event: no pair
    df = spark.createDataFrame(
        rows, "user_id string, state string, eid int, t int")
    got = {(r.src, r.dst): r for r in cohort.transition_matrix(
        df, "user_id", "state", "t", tiebreak="eid").collect()}
    assert got[("a", "b")].n == 1 and got[("a", "b")].p == 0.5
    assert got[("a", "a")].n == 1 and got[("a", "a")].p == 0.5
    assert got[("b", "a")].n == 1 and got[("b", "a")].p == 1.0
    assert ("z", "z") not in got and len(got) == 3
    # per-source probabilities sum to 1
    from collections import defaultdict
    sums = defaultdict(float)
    for (src, _), r in got.items():
        sums[src] += r.p
    assert all(abs(v - 1.0) < 1e-9 for v in sums.values())


def test_transition_matrix_tiebreak_determinism(spark):
    # two events share the timestamp: the tiebreak id decides the order
    rows = [("u", "x", 1, 5), ("u", "y", 2, 5), ("u", "z", 3, 6)]
    df = spark.createDataFrame(
        rows, "user_id string, state string, eid int, t int")
    got = {(r.src, r.dst) for r in cohort.transition_matrix(
        df, "user_id", "state", "t", tiebreak="eid").collect()}
    assert got == {("x", "y"), ("y", "z")}


def test_stickiness_dau_wau(spark):
    """stickiness: a daily user keeps ratio at dau/wau with correct
    rolling distinct counts; truncated early windows are honest; NULL
    rows absent; guard."""
    rows = []
    # u1 active every day 1..8; u2 only day 3; u3 only day 8
    for d in range(1, 9):
        rows.append(("u1", _ts(d)))
    rows += [("u2", _ts(3)), ("u3", _ts(8)), (None, _ts(1)), ("u4", None)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r.day.day: r for r in
           cohort.stickiness(df, "user_id", "ts", window_days=7).collect()}
    assert got[1].dau == 1 and got[1].wau == 1 and got[1].stickiness == 1.0
    assert got[3].dau == 2 and got[3].wau == 2          # u1 + u2
    assert got[4].dau == 1 and got[4].wau == 2          # u2 still in window
    # day 8: window [2..8] still contains u2's day-3 activity; u3 joins
    # on day 8 itself -> wau counts u1, u2, u3
    assert got[8].dau == 2 and got[8].wau == 3
    assert abs(got[8].stickiness - 2 / 3) < 1e-5   # rounded to 6
    assert len(got) == 8
    with pytest.raises(ValueError, match="window_days"):
        cohort.stickiness(df, "user_id", "ts", window_days=0)
