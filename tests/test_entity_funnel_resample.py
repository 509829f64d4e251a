"""Semantic pins for the round-3 analytics families: entity resolution +
survivorship, ordered funnels (greedy-earliest chain), and time-grid
resample with forward fill. Driver queries carry the full-table DuckDB
oracles; these tests pin the EDGE semantics small oracles state exactly."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import entity, funnel
from remark_lint_frontmatter_schema_spark.operators.sequence import (
    resample_fill)


def _ts(day, h=0, m=0):
    return dt.datetime(2024, 1, day, h, m)


# --- entity resolution -------------------------------------------------------

@pytest.fixture(scope="module")
def names(spark):
    rows = [("n1", "red widget", 5), ("n2", "rad widget", 3),
            ("n3", "blue widget", 5), ("n4", "small ring", 2),
            ("n5", "smell ring", 2), ("n6", "golden harp", 9)]
    return spark.createDataFrame(rows, "id string, name string, n int")


def test_er_pairs_blocked_verify(spark, names):
    blk = F.element_at(F.split("name", " "), -1)
    got = {(r["id_a"], r["id_b"], r["edit"])
           for r in entity.er_pairs(names, text_col="name", id_col="id",
                                    block=blk, max_edit=2).collect()}
    # widget block: red~rad edit 1 (match), red~blue edit 3 (cut),
    # rad~blue edit 4 (cut); ring block: small~smell edit 1; harp: alone
    assert got == {("n1", "n2", 1), ("n4", "n5", 1)}


def test_er_pairs_refuses_global_join(spark, names):
    with pytest.raises(ValueError, match="block"):
        entity.er_pairs(names, text_col="name", id_col="id", block=None)


def test_golden_records_survivorship(spark, names):
    blk = F.element_at(F.split("name", " "), -1)
    pairs = entity.er_pairs(names, text_col="name", id_col="id",
                            block=blk, max_edit=2)
    out = {r["id"]: r for r in entity.golden_records(
        names, pairs, id_col="id", prefer=["n"]).collect()}
    # n1/n2 cluster under min id n1; n1 survives (n=5 > 3)
    assert out["n1"]["entity_id"] == "n1" and out["n1"]["is_survivor"]
    assert out["n2"]["entity_id"] == "n1" and not out["n2"]["is_survivor"]
    # n4/n5 tie on n=2 -> ascending id wins
    assert out["n4"]["is_survivor"] and not out["n5"]["is_survivor"]
    assert out["n5"]["entity_id"] == "n4"
    # unmatched rows are their own surviving entity
    assert out["n3"]["entity_id"] == "n3" and out["n3"]["is_survivor"]
    assert out["n6"]["is_survivor"]
    assert sum(r["is_survivor"] for r in out.values()) == 4


# --- funnel ------------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string")


def test_funnel_greedy_chain(spark):
    ev = _events(spark, [
        ("u1", _ts(1), "signup"), ("u1", _ts(2), "click"),
        ("u1", _ts(3), "purchase"),
        # u2: purchase BEFORE click -> stops at click
        ("u2", _ts(1), "signup"), ("u2", _ts(3), "click"),
        ("u2", _ts(2), "purchase"),
        # u3: click before signup doesn't count; later click does
        ("u3", _ts(2), "click"), ("u3", _ts(3), "signup"),
        ("u3", _ts(4), "click"),
        # u4: no signup at all
        ("u4", _ts(1), "click"), ("u4", _ts(2), "purchase")])
    out = {r["user_id"]: r for r in funnel.funnel_users(
        ev, ["signup", "click", "purchase"]).collect()}
    assert out["u1"]["steps_completed"] == 3
    assert out["u1"]["t3"] == _ts(3)
    assert out["u2"]["steps_completed"] == 2
    assert out["u3"]["steps_completed"] == 2 and out["u3"]["t2"] == _ts(4)
    assert out["u4"]["steps_completed"] == 0


def test_funnel_within_window(spark):
    ev = _events(spark, [
        ("u1", _ts(1), "signup"), ("u1", _ts(1, 2), "click"),
        # u2's click is 3 days after signup: outside a 1-day window
        ("u2", _ts(1), "signup"), ("u2", _ts(4), "click")])
    out = {r["user_id"]: r["steps_completed"]
           for r in funnel.funnel_users(
               ev, ["signup", "click"],
               within_ms=86400 * 1000).collect()}
    assert out == {"u1": 2, "u2": 1}


def test_funnel_greedy_earliest_not_trapped(spark):
    """Greedy takes the EARLIEST feasible step-2; a later step-2 would
    also complete step 3 — both semantics agree here, pinning that the
    chain uses min-after, exactly the oracle's nested min(ts)."""
    ev = _events(spark, [
        ("u1", _ts(1), "signup"), ("u1", _ts(2), "click"),
        ("u1", _ts(5), "click"), ("u1", _ts(6), "purchase")])
    r = funnel.funnel_users(
        ev, ["signup", "click", "purchase"]).collect()[0]
    assert r["t2"] == _ts(2) and r["t3"] == _ts(6)


def test_funnel_counts_histogram(spark):
    ev = _events(spark, [
        ("u1", _ts(1), "signup"), ("u1", _ts(2), "click"),
        ("u2", _ts(1), "signup"),
        ("u3", _ts(1), "click")])
    got = {(r["step"], r["name"]): r["users_reached"]
           for r in funnel.funnel_counts(ev, ["signup", "click"]).collect()}
    assert got == {(1, "signup"): 2, (2, "click"): 1}


def test_funnel_validates_steps(spark):
    ev = _events(spark, [("u1", _ts(1), "signup")])
    with pytest.raises(ValueError, match="at least 2"):
        funnel.funnel_users(ev, ["signup"])
    with pytest.raises(ValueError, match="distinct"):
        funnel.funnel_users(ev, ["signup", "signup"])


# --- resample + forward fill -------------------------------------------------

def test_resample_forward_fill(spark):
    rows = [("u1", _ts(1, 5), 1.0, 1), ("u1", _ts(1, 9), 2.0, 2),
            ("u1", _ts(4), 7.0, 3),
            ("u2", _ts(3), 5.0, 4)]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double, event_id long")
    out = {(r["user_id"], r["bucket"].day): (r["value"], r["is_observed"])
           for r in resample_fill(df, ts_col="ts", value_col="value",
                                  by="user_id", unit="day",
                                  tie_break="event_id").collect()}
    # u1: day1 last value 2.0; days 2-3 filled; day4 observed 7.0
    assert out[("u1", 1)] == (2.0, True)
    assert out[("u1", 2)] == (2.0, False)
    assert out[("u1", 3)] == (2.0, False)
    assert out[("u1", 4)] == (7.0, True)
    # u2 starts day3 (no bucket before its first event), filled to the
    # corpus's last day (4)
    assert ("u2", 1) not in out and ("u2", 2) not in out
    assert out[("u2", 3)] == (5.0, True)
    assert out[("u2", 4)] == (5.0, False)
    assert len(out) == 6


def test_resample_tie_break_deterministic(spark):
    rows = [("u1", _ts(1, 5), 1.0, 2), ("u1", _ts(1, 5), 9.0, 1)]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double, event_id long")
    out = resample_fill(df, ts_col="ts", value_col="value", by="user_id",
                        unit="day", tie_break="event_id").collect()
    assert len(out) == 1 and out[0]["value"] == 1.0  # max event_id wins


def test_resample_rejects_unknown_unit(spark):
    df = spark.createDataFrame(
        [("u", _ts(1), 0.0)], "user_id string, ts timestamp, value double")
    with pytest.raises(ValueError, match="unit"):
        resample_fill(df, ts_col="ts", value_col="value", by="user_id",
                      unit="fortnight")


def test_resample_plan_has_no_global_window(spark):
    df = spark.createDataFrame(
        [("u", _ts(1), 0.0)], "user_id string, ts timestamp, value double")
    out = resample_fill(df, ts_col="ts", value_col="value", by="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan is partitioned (no single-task sort)
    import re
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1), "unpartitioned window in resample plan"


def test_funnel_property_matches_python_reference(spark):
    """Hypothesis sweep: the Spark greedy fold == a direct Python greedy
    over random event soups (orderings, duplicate timestamps, irrelevant
    types, window bounds)."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    steps = ["s1", "s2", "s3"]
    types = steps + ["noise"]

    def ref_chain(events, within_ms):
        evs = sorted(events, key=lambda e: (e[0], steps.index(e[1])
                                            if e[1] in steps else 99))
        chain = []
        for ts, et in evs:
            if et not in steps or len(chain) >= 3:
                continue
            if steps.index(et) != len(chain):
                continue
            if chain:
                if ts <= chain[-1]:
                    continue
                if within_ms is not None and \
                        (ts - chain[-1]) > within_ms / 1000.0:
                    continue
            chain.append(ts)
        return chain

    @settings(max_examples=12, deadline=None)
    @given(data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=50),
                  st.sampled_from(types)), min_size=0, max_size=14),
        bounded=st.booleans())
    def prop(data, bounded):
        within = 20_000 if bounded else None
        events = [(float(t), et) for t, et in data]
        rows = [("u", _ts(1) + dt.timedelta(seconds=t), et)
                for t, et in events]
        if not rows:
            return
        df = _events(spark, rows)
        got_rows = funnel.funnel_users(df, steps, within_ms=within).collect()
        ref = ref_chain(events, within)
        if not got_rows:
            # no funnel-type events at all -> no per-user row (by design)
            assert not any(et in steps for _, et in events)
            return
        out = got_rows[0]
        assert out["steps_completed"] == len(ref)
        for i, t in enumerate(ref):
            got = out[f"t{i + 1}"]
            assert got == _ts(1) + dt.timedelta(seconds=t)

    prop()


def test_er_pairs_plan_no_cartesian(spark, names):
    blk = F.element_at(F.split("name", " "), -1)
    plan = entity.er_pairs(names, text_col="name", id_col="id",
                           block=blk, max_edit=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
