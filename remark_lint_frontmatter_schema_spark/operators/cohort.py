"""Cohort retention and state-transition analytics over event streams.

The reference validates one record at a time (a unified VFile per file,
``/root/reference/index.ts:201-320``); these are the table-level
analytics a validation engine grows once sequences exist as rows —
"did the population that arrived in week W keep producing events?" and
"which state transitions does this corpus actually contain?" — the
longitudinal companions to sessionize/gap/monotonic in
``operators/sequence.py``.

Scale shape (both): every row-scale shuffle carries key columns only
(user/period or state pairs, never payloads), and the final relations
are bounded — cohorts x offsets for retention, |states|^2 for the
transition matrix — so the closing windows/aggregates are driver-scale
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_DAYS = {"day": 1, "week": 7}


def cohort_retention(df: DataFrame, user_col: str, ts_col: str, *,
                     unit: str = "week") -> DataFrame:
    """Classic retention triangle: users are assigned to the cohort of
    their FIRST event (``date_trunc(unit)``), and each (cohort,
    period-offset) cell counts how many of them were active that period.

    Returns (cohort, period_offset, n_active, cohort_size, retention),
    one row per observed cell; offset 0 is the cohort's own period so
    its retention is 1.0 by construction (pinned in tests — a cheap
    self-check that the join wiring is right).

    Dataflow: one hash aggregate for first-event per user, one distinct
    over (user, period) — both map-side combined, shuffling key pairs
    only — then a user-keyed join and a keys-only rollup to the
    cells x offsets relation. NULL user/ts rows are absent from the
    analysis (the engine's NULL == absent rule)."""
    if unit not in _UNIT_DAYS:
        raise ValueError(f"unit must be one of {sorted(_UNIT_DAYS)}")
    days = _UNIT_DAYS[unit]
    u, t = F.col(user_col), F.col(ts_col)
    base = df.where(u.isNotNull() & t.isNotNull())
    first = base.groupBy(u.alias("_u")).agg(
        F.date_trunc(unit, F.min(t)).alias("cohort"))
    act = base.select(u.alias("_u"),
                      F.date_trunc(unit, t).alias("period")).distinct()
    size = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    offset = (F.datediff(F.to_date("period"), F.to_date("cohort"))
              / days).cast("int")
    cells = (act.join(first, "_u")
                .groupBy("cohort", offset.alias("period_offset"))
                .agg(F.count(F.lit(1)).alias("n_active")))
    return (cells.join(size, "cohort")
                 .select("cohort", "period_offset", "n_active",
                         "cohort_size",
                         F.round(F.col("n_active")
                                 / F.col("cohort_size"), 6)
                          .alias("retention")))


def transition_matrix(df: DataFrame, key_col: str, state_col: str,
                      order_col: str, *, tiebreak: str | None = None
                      ) -> DataFrame:
    """Empirical first-order Markov transition matrix over per-key state
    sequences: (src, dst, n, p) with ``p`` row-normalized per source
    state.

    The corpus-level "what follows what" profile: a transition that
    should be impossible (refund before purchase, error -> error storms)
    shows up as unexpected mass, and two snapshots' matrices feed the
    categorical drift statistics (psi/chi_square with ``bucket`` =
    ``src->dst``) directly. Deterministic sequences need a unique
    ``order_col`` per key — pass ``tiebreak`` (e.g. the event id) when
    timestamps can collide, exactly as sequence.monotonic_violations
    requires.

    Dataflow: one shuffle on the key, per-key window sort for lead()
    (hot keys serialize their own sort — same bound as sessionize), then
    a (src, dst) hash aggregate; the normalizing window runs over the
    <= |states|^2 matrix relation. NULL key/state/order rows are absent
    from the sequence."""
    k, s, o = F.col(key_col), F.col(state_col), F.col(order_col)
    base = df.where(k.isNotNull() & s.isNotNull() & o.isNotNull())
    order = [o.asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(k).orderBy(*order)
    pairs = (base.select(s.alias("src"),
                         F.lead(s).over(w).alias("dst"))
                 .where(F.col("dst").isNotNull()))
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"))


def stickiness(df: DataFrame, user_col: str, ts_col: str, *,
               window_days: int = 7) -> DataFrame:
    """Daily active / rolling-window active ratio (the DAU/WAU
    "stickiness" metric): one row per observed day with
    (day, dau, wau, stickiness = dau/wau) — how much of the
    ``window_days``-day population shows up on a given day; a falling
    ratio with flat WAU is the classic silent-churn signature.

    Dataflow: the table reduces to the distinct (day, user) relation
    (one keys-only aggregate — the only row-scale shuffle), then a
    broadcast day-grid range join re-buckets each (day, user) row into
    the <= window_days windows it belongs to and one aggregate counts
    distinct users per window. Shuffled payloads are (day, user) pairs;
    the day grid is driver-scale. Days early in the observed range have
    truncated windows (defined, and honest — the first days genuinely
    saw fewer than window_days days)."""
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    u, t = F.col(user_col), F.col(ts_col)
    du = (df.where(u.isNotNull() & t.isNotNull())
            .select(F.date_trunc("day", t).alias("day"),
                    u.alias("_u")).distinct())
    days = du.select(F.col("day").alias("_d")).distinct()
    span = F.col("day").between(
        F.col("_d") - F.expr(f"INTERVAL {int(window_days) - 1} DAYS"),
        F.col("_d"))
    j = du.join(F.broadcast(days), span)
    return (j.groupBy(F.col("_d").alias("day"))
             .agg(F.countDistinct(
                      F.when(F.col("day") == F.col("_d"), F.col("_u")))
                  .alias("dau"),
                  F.countDistinct("_u").alias("wau"))
             .select("day", "dau", "wau",
                     F.round(F.col("dau") / F.col("wau"), 6)
                      .alias("stickiness")))
