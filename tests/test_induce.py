"""Schema induction (operators/induce.py): profile -> ruleset dict ->
compile -> validate round-trip."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
from remark_lint_frontmatter_schema_spark.operators.induce import (
    induce, induce_ruleset, induced_facts_df)

ROWS = [
    (1, "alpha", 10.5, "A", None),
    (2, "bravo", -3.25, "B", "x"),
    (3, "charlie7", 99.0, "A", "y"),
    (4, "dl", 0.0, "C", "z"),
]
SCHEMA = ("id long, name string, score double, grade string, "
          "maybe string")


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_induced_facts(df):
    fx = induce(df)
    assert fx["id"]["required"] and fx["maybe"]["n_nulls"] == 1
    assert not fx["maybe"]["required"]
    assert fx["score"]["min"] == -3.25 and fx["score"]["max"] == 99.0
    assert fx["name"]["min"] == 2 and fx["name"]["max"] == 8  # lengths
    assert fx["grade"]["enum"] == ["A", "B", "C"]
    # id is all-distinct: an identifier, not a categorical — no enum
    assert "enum" not in fx["id"]
    assert "enum" not in fx["name"]


def test_induced_ruleset_shape(df):
    rs = induce_ruleset(df, ["name", "score", "grade", "maybe"])
    assert rs["required"] == ["name", "score", "grade"]
    assert rs["properties"]["score"] == {
        "type": "number", "minimum": -3.25, "maximum": 99.0}
    assert rs["properties"]["name"] == {
        "type": "string", "minLength": 2, "maxLength": 8}
    assert rs["properties"]["grade"] == {
        "type": "string", "enum": ["A", "B", "C"]}


def test_round_trip_zero_violations(df):
    rs = induce_ruleset(df, ["name", "score", "grade", "maybe"])
    compiled = compile_ruleset(rs, df.schema, name="induced")
    assert not compiled.unknown
    res = validate(df, compiled, row_id="id")
    assert res.violations.count() == 0


def test_mutated_row_violates_induced_bounds(df, spark):
    rs = induce_ruleset(df, ["name", "score", "grade"])
    compiled = compile_ruleset(rs, df.schema, name="induced")
    bad = spark.createDataFrame(
        [(9, "x", 1000.0, "Z", None)], SCHEMA)  # 3 induced rules broken
    v = validate(bad, compiled, row_id="id").violations
    kws = {r.keyword for r in v.collect()}
    assert {"maximum", "minLength", "enum"} <= kws


def test_high_cardinality_demoted_from_enum(spark):
    rows = [(i, f"v{i:03d}") for i in range(200)]
    d = spark.createDataFrame(rows, "id long, v string")
    fx = induce(d, ["v"], enum_max=8)
    assert "enum" not in fx["v"]
    rs = induce_ruleset(d, ["v"], enum_max=8)
    assert "enum" not in rs["properties"]["v"]
    assert rs["properties"]["v"]["minLength"] == 4


def test_all_null_column(spark):
    d = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    fx = induce(d, ["v"])
    assert not fx["v"]["required"] and "enum" not in fx["v"]
    rs = induce_ruleset(d, ["v"])
    assert rs["properties"]["v"] == {"type": "string"}
    assert "v" not in rs.get("required", [])


def test_facts_df_shape(df):
    rows = {(r.col_name, r.keyword): r for r in
            induced_facts_df(df, ["score", "grade", "maybe"]).collect()}
    assert rows[("score", "minimum")].num_value == -3.25
    assert rows[("grade", "enum")].str_value == "A,B,C"
    assert rows[("maybe", "required")].str_value == "false"
    # x,y,z each appear once: no repetition evidence, so length bounds
    assert ("maybe", "enum") not in rows
    assert rows[("maybe", "minLength")].num_value == 1.0


def test_profile_diff(spark):
    from remark_lint_frontmatter_schema_spark.operators.induce import (
        profile_diff)
    old = spark.createDataFrame(ROWS, SCHEMA)
    # new: score max moves, maybe-null filled (null-rate fact changes)
    new = spark.createDataFrame(
        [(1, "alpha", 10.5, "A", "w"),
         (2, "bravo", -3.25, "B", "x"),
         (3, "charlie7", 500.0, "A", "y"),
         (4, "dl", 0.0, "C", "z")], SCHEMA)
    d = {(r.col_name, r.keyword): r for r in
         profile_diff(old, new, ["score", "grade", "maybe"]).collect()}
    assert d[("score", "maximum")].change == "changed"
    assert d[("score", "maximum")].changed_columns == ["num_value"]
    assert d[("maybe", "required")].change == "changed"   # false -> true
    assert ("grade", "enum") not in d                     # unchanged
    assert ("score", "minimum") not in d


def test_format_inference(spark):
    rows = [
        (1, "4c0e3cea-1b00-4a1e-9e1f-09d4b52a1a10", "a@example.com",
         "2024-01-02", "mixed"),
        (2, "deadbeef-dead-beef-dead-beefdeadbeef", "b@example.org",
         "2024-12-31", "b@example.org"),
        (3, None, "c@x.io", "2023-06-15", "plain"),
    ]
    d = spark.createDataFrame(
        rows, "id long, u string, e string, dt string, noisy string")
    fx = induce(d, ["u", "e", "dt", "noisy"])
    assert fx["u"]["format"] == "uuid"       # nulls don't block inference
    assert fx["e"]["format"] == "email"
    assert fx["dt"]["format"] == "date"
    assert "format" not in fx["noisy"]       # one non-match disqualifies
    rs = induce_ruleset(d, ["u", "e", "noisy"])
    assert rs["properties"]["u"]["format"] == "uuid"
    assert "format" not in rs["properties"]["noisy"]
    # round-trip: induced format compiles and the inducing data is clean
    compiled = compile_ruleset(rs, d.schema, name="fmt")
    assert not compiled.unknown
    assert validate(d, compiled, row_id="id").violations.count() == 0
    # and a mutated row violates the induced format
    bad = spark.createDataFrame(
        [(9, "not-a-uuid-atallxx-xxxx-xxxxxxxxxxxx", "a@example.com",
          "x", "y")], "id long, u string, e string, dt string, noisy string")
    kws = {r.keyword for r in
           validate(bad, compiled, row_id="id").violations.collect()}
    assert "format" in kws
    facts = {(r.col_name, r.keyword): r for r in
             induced_facts_df(d, ["u", "noisy"]).collect()}
    assert facts[("u", "format")].str_value == "uuid"
    assert ("noisy", "format") not in facts
