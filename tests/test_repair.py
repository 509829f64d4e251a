"""Declarative repair pass (lint -> fix -> re-lint): coerce, nullify,
default-fill, drop unknown map keys, dedupe/truncate arrays, recurse
into struct fields, route per-row — and the repaired table re-validates
clean for every repairable constraint."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.operators.repair import (
    compile_repairs, repair)
from remark_lint_frontmatter_schema_spark.operators.validate import validate

SCHEMA = {
    "type": "object",
    "properties": {
        "sr_hz": {"minimum": 8000, "maximum": 48000},
        "gain": {"exclusiveMinimum": 0.0},
        "codec": {"enum": ["pcm_s16le", "flac", "opus"],
                  "default": "pcm_s16le"},
        "transcript": {"minLength": 2, "maxLength": 10},
        "lang": {"pattern": "^[a-z]{2}$"},
        "props": {"additionalProperties": False,
                  "properties": {"lang": {}, "take": {}}},
        "note": {"maxLength": 4, "x-repair": False},
    },
}

ROWS = [
    # (id, sr, gain, codec, transcript, lang, props, note)
    ("r1", 4000, 1.0, "mp3", "hello world toolong", "EN",
     {"lang": "en", "bogus": "x"}, "toolong"),
    ("r2", 96000, 0.0, None, "x", "de",
     {"take": "1"}, "ok"),
    ("r3", 16000, 2.0, "flac", "fine", "fr", None, None),
]
DDL = ("id string, sr_hz int, gain double, codec string, "
       "transcript string, lang string, props map<string,string>, "
       "note string")


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(ROWS, DDL)
    return repair(df, SCHEMA, row_id="id")


def test_coerce_nullify_fill_semantics(result):
    got = {r.id: r for r in result.repaired.collect()}
    # clamp both bounds; open bound nullifies; enum miss takes the default
    assert got["r1"].sr_hz == 8000 and got["r2"].sr_hz == 48000
    assert got["r2"].gain is None and got["r1"].gain == 1.0
    assert got["r1"].codec == "pcm_s16le"      # invalid -> default
    assert got["r2"].codec == "pcm_s16le"      # NULL -> default
    assert got["r3"].codec == "flac"           # valid untouched
    # truncate to maxLength; too-short nullifies (no padding fabrication)
    assert got["r1"].transcript == "hello worl"
    assert got["r2"].transcript is None
    # pattern miss nullifies (uppercase fails ^[a-z]{2}$)
    assert got["r1"].lang is None and got["r2"].lang == "de"
    # undeclared map keys dropped, declared kept; NULL map untouched
    assert got["r1"].props == {"lang": "en"}
    assert got["r2"].props == {"take": "1"}
    assert got["r3"].props is None
    # x-repair: false leaves the column alone
    assert got["r1"].note == "toolong"


def test_repaired_schema_identical(spark, result):
    df = spark.createDataFrame(ROWS, DDL)
    assert result.repaired.schema == df.schema


def test_log_records_staged_before_after(result):
    log = {(r.row_id, r.action): r for r in result.log.collect()}
    clamp = log[("r1", "clamp_min")]
    assert (clamp.column, clamp.before, clamp.after) == ("sr_hz", "4000",
                                                         "8000")
    # fill_default's `before` is the post-nullify staged value (NULL),
    # proving the chain logs each step against the running value
    fd = log[("r1", "fill_default")]
    assert fd.before is None and fd.after == "pcm_s16le"
    assert ("r1", "nullify_enum") in log           # mp3 -> NULL first
    tr = log[("r1", "truncate")]
    assert tr.before == "hello world toolong" and tr.after == "hello worl"
    dk = log[("r1", "drop_unknown_keys")]
    assert "bogus" in dk.before and "bogus" not in dk.after
    # untouched rows emit no log rows
    assert all(r[0] in {"r1", "r2"} for r in log)


def test_revalidation_clean_for_repairable_constraints(spark, result):
    compiled = compile_ruleset(SCHEMA, result.repaired.schema, name="rep")
    res = validate(result.repaired, compiled, row_id="id")
    # every repairable keyword re-validates clean; `required` (absent
    # here) and type checks are the validator's domain, not repair's
    repairable = {"minimum", "maximum", "exclusiveMinimum",
                  "exclusiveMaximum", "enum", "pattern", "minLength",
                  "maxLength", "additionalProperties"}
    bad = res.violations.where(
        F.col("keyword").isin(list(repairable))
        & (F.col("instance_path") != "/note"))  # note opted out: x-repair
    assert bad.count() == 0
    # the opted-out column still flags — repair never silently widens scope
    assert res.violations.where("instance_path = '/note'").count() == 1


def test_noop_when_nothing_repairable(spark):
    df = spark.createDataFrame([("a", 1)], "id string, n int")
    res = repair(df, {"type": "object", "required": ["id"]}, row_id="id")
    assert res.repairs == [] and res.log.count() == 0
    assert res.repaired is df


def test_compile_summary_and_optout(spark):
    df = spark.createDataFrame(ROWS, DDL)
    reps = compile_repairs(SCHEMA, df.schema)
    by_col = {r.column: r.actions for r in reps}
    assert "note" not in by_col                      # x-repair: false
    assert by_col["sr_hz"] == ["clamp_min", "clamp_max"]
    assert by_col["codec"] == ["nullify_enum", "fill_default"]
    assert by_col["transcript"] == ["truncate", "nullify_min_length"]
    assert by_col["props"] == ["drop_unknown_keys"]


def test_plan_is_jvm_only_single_projection(spark):
    df = spark.createDataFrame(ROWS, DDL)
    res = repair(df, SCHEMA, row_id="id")
    plan = (res.repaired._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_fractional_bounds_on_integral_column(spark):
    # minimum 0.5 on an int column must clamp to ceil(0.5)=1 (casting the
    # bound would truncate to 0 and 'repair' to a still-violating value);
    # exclusiveMaximum 2.5 must keep the legal value 2
    df = spark.createDataFrame(
        [("a", -3), ("b", 0), ("c", 1), ("d", 2), ("e", 3)],
        "id string, n int")
    schema = {"properties": {"n": {"minimum": 0.5, "exclusiveMaximum": 2.5}}}
    res = repair(df, schema, row_id="id")
    got = {r.id: r.n for r in res.repaired.collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 2, "e": None}
    assert res.repaired.schema == df.schema
    # re-lint is clean for the repairable keywords
    compiled = compile_ruleset(schema, df.schema)
    assert validate(res.repaired, compiled, row_id="id") \
        .violations.count() == 0


def test_array_repairs_dedupe_then_truncate(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 2, 3, 1]),        # dupes; distinct fits maxItems
         ("b", [1, 2, 3, 4, 5]),        # too long, no dupes -> truncated
         ("c", [7, 8]),                 # already clean
         ("d", None)],
        "id string, tags array<int>")
    schema = {"properties": {"tags": {"uniqueItems": True, "maxItems": 4}}}
    res = repair(df, schema, row_id="id")
    got = {r.id: r.tags for r in res.repaired.collect()}
    assert got == {"a": [1, 2, 3], "b": [1, 2, 3, 4], "c": [7, 8],
                   "d": None}
    actions = {(r.row_id, r.action) for r in res.log.collect()}
    assert actions == {("a", "dedupe_items"), ("b", "truncate_items")}
    # re-lint is clean
    compiled = compile_ruleset(schema, df.schema)
    assert validate(res.repaired, compiled, row_id="id") \
        .violations.count() == 0


def test_route_and_repair_fixes_each_row_under_its_own_ruleset(spark):
    from remark_lint_frontmatter_schema_spark.operators.repair import (
        route_and_repair)
    df = spark.createDataFrame(
        [("1", "strict", 500.0, "x"),    # strict: price <= 100 -> clamp
         ("2", "lax", 500.0, "x"),       # lax: price <= 1000 -> untouched
         ("3", None, 500.0, "zzzz"),     # unrouted -> untouched
         ("4", "strict", 50.0, "toolong")],  # strict: maxLength 4
        "id string, ruleset_id string, price double, tag string")
    registry = {
        "strict": {"properties": {"price": {"maximum": 100},
                                  "tag": {"maxLength": 4}}},
        "lax": {"properties": {"price": {"maximum": 1000}}},
    }
    res = route_and_repair(df, row_id="id", registry=registry,
                           ruleset_col="ruleset_id")
    assert sorted(res.routed) == ["lax", "strict"]
    assert not res.errors
    got = {r.id: (r.price, r.tag) for r in res.repaired.collect()}
    assert got == {"1": (100.0, "x"), "2": (500.0, "x"),
                   "3": (500.0, "zzzz"), "4": (50.0, "tool")}
    log = {(r.row_id, r.ruleset_id, r.action) for r in res.log.collect()}
    assert log == {("1", "strict", "clamp_max"),
                   ("4", "strict", "truncate")}
    # routing key never repaired even if a ruleset constrains it
    registry["strict"]["properties"]["ruleset_id"] = {"maxLength": 1}
    res2 = route_and_repair(df, row_id="id", registry=registry,
                            ruleset_col="ruleset_id")
    assert {r.ruleset_id for r in res2.repaired.collect()} \
        == {"strict", "lax", None}


def test_route_and_repair_bad_route_becomes_error_artifact(spark):
    from remark_lint_frontmatter_schema_spark.operators.repair import (
        route_and_repair)
    df = spark.createDataFrame(
        [("1", "good", 500.0, "x"), ("2", "broken", 500.0, "x")],
        "id string, ruleset_id string, price double, tag string")
    registry = {
        "good": {"properties": {"price": {"maximum": 100}}},
        "broken": {"properties": {"tag": {"pattern": "(("}}},
    }
    res = route_and_repair(df, row_id="id", registry=registry,
                           ruleset_col="ruleset_id")
    # the broken route repairs nothing but surfaces as an artifact;
    # the good route still fixed its row
    got = {r.id: r.price for r in res.repaired.collect()}
    assert got == {"1": 100.0, "2": 500.0}
    assert res.routed == ["good"]
    assert any(n == "broken" for n, _s, _m in res.errors)


def test_nested_struct_fields_repair_via_withfield(spark):
    df = spark.createDataFrame(
        [("a", (500.0, "Xy", "k")),   # price clamps, code truncates
         ("b", (50.0, "z", "k")),     # clean
         ("c", None)],                # NULL struct: no parent, no repair
        "id string, meta struct<price:double,code:string,keep:string>")
    schema = {"properties": {"meta": {"properties": {
        "price": {"maximum": 100},
        "code": {"maxLength": 1},
    }}}}
    res = repair(df, schema, row_id="id")
    assert res.repaired.schema == df.schema
    got = {r.id: r.meta for r in res.repaired.collect()}
    assert got["a"].price == 100.0 and got["a"].code == "X"
    assert got["a"].keep == "k"           # undeclared field untouched
    assert got["b"] == (50.0, "z", "k")
    assert got["c"] is None
    log = {(r.row_id, r.instance_path, r.action)
           for r in res.log.collect()}
    assert log == {("a", "/meta/price", "clamp_max"),
                   ("a", "/meta/code", "truncate")}
    # re-lint clean on the nested constraints
    compiled = compile_ruleset(schema, df.schema)
    assert validate(res.repaired, compiled, row_id="id") \
        .violations.count() == 0


def test_doubly_nested_struct_repair(spark):
    df = spark.createDataFrame(
        [("a", ((150.0,),))],
        "id string, s struct<inner:struct<v:double>>")
    schema = {"properties": {"s": {"properties": {
        "inner": {"properties": {"v": {"maximum": 10}}}}}}}
    res = repair(df, schema, row_id="id")
    row = res.repaired.collect()[0]
    assert row.s.inner.v == 10.0
    entries = res.log.collect()
    assert [(r.instance_path, r.action) for r in entries] \
        == [("/s/inner/v", "clamp_max")]


def test_wide_ruleset_repair_executes(spark):
    # 100 columns x (clamp_min + clamp_max) = 200 chained steps + 200
    # log-entry structs in one projection — must survive codegen limits
    # (whole-stage fallback is acceptable; failure to execute is not)
    n_cols = 100
    cols = ", ".join(f"c{i} double" for i in range(n_cols))
    row = tuple([float(i) for i in range(n_cols)])
    df = spark.createDataFrame([("a", *row)], f"id string, {cols}")
    schema = {"properties": {
        f"c{i}": {"minimum": 10, "maximum": 50} for i in range(n_cols)}}
    res = repair(df, schema, row_id="id")
    got = res.repaired.collect()[0]
    assert got["c0"] == 10.0 and got["c99"] == 50.0 and got["c30"] == 30.0
    # 10..50 untouched; below clamps up, above clamps down
    assert res.log.count() == 10 + 49  # c0-c9 clamp_min, c51-c99 clamp_max
