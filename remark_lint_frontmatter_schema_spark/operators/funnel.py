"""Ordered-funnel analysis over an event stream.

The product-analytics staple: of the users who did step 1, how many went
on to do step 2 AFTER it, then step 3 after that — each within an
optional per-step time window. The greedy earliest-completion semantics
below are the standard ones (and the ones a SQL oracle can mirror
exactly): t1 = user's first step-1 event; t_k = first step-k event
strictly after t_{k-1} (and within ``within_ms`` of it when set).
Greedy-earliest is optimal here: taking the earliest feasible t_{k-1}
never shrinks the feasible set for t_k, so if any assignment completes
the funnel, this one does.

Scale shape: ONE shuffle — groupBy(user) collecting (ts, step#) structs
for funnel-relevant events only (the fact is pre-filtered to the step
vocabulary, so the aggregate state is bounded by a user's funnel events,
not their event count) — then the per-user fold runs as a pure-JVM
``aggregate`` over the sorted array inside whole-stage codegen. No
window over the global stream, no per-row Python.

SQL twin: nested correlated ``min(ts)`` subqueries (exact same greedy
recurrence), so the driver query is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_users(events: DataFrame, steps: list, *,
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 within_ms: int | None = None) -> DataFrame:
    """Per-user funnel completion: (user, t_1 .. t_n, steps_completed).

    ``steps`` is the ordered event-type list; ``t_k`` columns (named
    ``t1..tn``) carry the greedy earliest completion chain, NULL from
    the first uncompleted step on. ``within_ms`` bounds each step's
    delay after the previous step (step 1 is unbounded)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    step_no = F.create_map(*[
        x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i + 1))])
    ev = (events
          .where(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col).alias("user_id"),
                  F.col(ts_col).cast("timestamp").alias("ts"),
                  step_no[F.col(type_col)].alias("step")))
    per_user = (ev.groupBy("user_id")
                  .agg(F.array_sort(F.collect_list(F.struct("ts", "step")))
                       .alias("evs")))

    # greedy fold: state = array<timestamp> of chain completions so far;
    # event e extends the chain iff e.step == len(state)+1, e.ts > last,
    # and (within bound) e.ts - last <= within_ms
    n = len(steps)
    bound_ok = (
        (lambda e, last: (e["ts"].cast("double") - last.cast("double"))
         * 1000.0 <= float(within_ms))
        if within_ms is not None else (lambda e, last: F.lit(True)))

    def step_fn(state, e):
        k = F.size(state)
        last = F.try_element_at(state, F.lit(-1))
        extend = ((k < n) & (e["step"] == k + 1)
                  & ((k == 0)
                     | ((e["ts"] > last) & bound_ok(e, last))))
        return F.when(extend, F.concat(state, F.array(e["ts"]))) \
                .otherwise(state)

    chain = F.aggregate(
        "evs", F.expr("cast(array() as array<timestamp>)"), step_fn)
    out = per_user.select("user_id", chain.alias("_chain"))
    cols = [F.try_element_at("_chain", F.lit(i + 1)).alias(f"t{i + 1}")
            for i in range(n)]
    return (out.select("user_id", *cols,
                       F.size("_chain").alias("steps_completed")))


def funnel_counts(events: DataFrame, steps: list, **kw) -> DataFrame:
    """Funnel summary: one row per step with the user count that reached
    it and the conversion rate vs step 1 — the headline numbers. Derived
    from :func:`funnel_users` by a step-count histogram (n-row
    aggregate), so the whole funnel costs the one groupBy(user)."""
    per_user = funnel_users(events, steps, **kw)
    hist = (per_user.groupBy("steps_completed")
            .agg(F.countDistinct("user_id").alias("n")))
    # users at step k = sum of histogram buckets >= k; the histogram is
    # <= len(steps)+1 rows, so the suffix-sum is a broadcast theta-join
    # over a driver-scale relation by construction
    steps_df = hist.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, name string")
    return (steps_df
            .join(F.broadcast(hist),
                  hist["steps_completed"] >= steps_df["step"], "left")
            .groupBy("step", "name")
            .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("users_reached"))
            .orderBy("step"))
