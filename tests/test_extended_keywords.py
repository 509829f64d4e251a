"""Extended draft-07 / 2019-09 keywords: uniqueItems, contains
(+min/maxContains), min/maxProperties, dependentRequired / dependencies,
if/then/else, propertyNames — unit behavior plus a seeded jsonschema
cross-oracle (SURVEY.md §5.2 item 2)."""

import random

import jsonschema
import pyspark.sql.types as T
import pytest

from remark_lint_frontmatter_schema_spark import compile_ruleset, validate

SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("arr", T.ArrayType(T.IntegerType())),
    T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    T.StructField("a", T.StringType()),
    T.StructField("b", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("clerk", T.StringType()),
])


def _df(spark, rows):
    return spark.createDataFrame(
        [tuple(r.get(f.name) for f in SCHEMA.fields) for r in rows], SCHEMA)


def _failed_ids(spark, rows, ruleset):
    df = _df(spark, rows)
    compiled = compile_ruleset(ruleset, df.schema, name="ext")
    res = validate(df, compiled, row_id="id")
    return {r.id for r in res.annotated.where("NOT passed")
            .select("id").collect()}


def test_unique_items(spark):
    rows = [
        {"id": "dup", "arr": [1, 2, 2]},
        {"id": "ok", "arr": [1, 2, 3]},
        {"id": "absent"},
    ]
    failed = _failed_ids(spark, rows,
                         {"properties": {"arr": {"uniqueItems": True}}})
    assert failed == {"dup"}


def test_contains_min_max(spark):
    rs = {"properties": {"arr": {
        "contains": {"minimum": 10}, "minContains": 2, "maxContains": 3}}}
    rows = [
        {"id": "zero", "arr": [1, 2]},          # 0 matches < 2
        {"id": "one", "arr": [10, 1]},          # 1 match < 2
        {"id": "ok2", "arr": [10, 11]},
        {"id": "ok3", "arr": [10, 11, 12, 1]},
        {"id": "four", "arr": [10, 11, 12, 13]},  # > maxContains
        {"id": "absent"},
    ]
    assert _failed_ids(spark, rows, rs) == {"zero", "one", "four"}


def test_min_max_properties_map(spark):
    rs = {"properties": {"m": {"minProperties": 1, "maxProperties": 2}}}
    rows = [
        {"id": "empty", "m": {}},
        {"id": "one", "m": {"k": "v"}},
        {"id": "three", "m": {"a": "1", "b": "2", "c": "3"}},
        {"id": "absent"},
    ]
    assert _failed_ids(spark, rows, rs) == {"empty", "three"}


def test_min_properties_root(spark):
    # root property count = non-NULL columns (NULL == absent)
    rows = [
        {"id": "justid"},
        {"id": "two", "a": "x", "b": "y", "status": "F", "clerk": "c",
         "arr": [1], "m": {"k": "v"}},
    ]
    assert _failed_ids(spark, rows, {"minProperties": 3}) == {"justid"}


def test_dependent_required(spark):
    rs = {"dependentRequired": {"a": ["b"]}}
    rows = [
        {"id": "viol", "a": "x"},
        {"id": "ok", "a": "x", "b": "y"},
        {"id": "vacuous", "b": "y"},
        {"id": "none"},
    ]
    assert _failed_ids(spark, rows, rs) == {"viol"}


def test_dependencies_array_and_schema_form(spark):
    rows = [
        {"id": "viol", "a": "x"},
        {"id": "ok", "a": "x", "b": "y"},
    ]
    assert _failed_ids(spark, rows, {"dependencies": {"a": ["b"]}}) == {"viol"}
    # schema form: when `a` present the object must satisfy the sub-schema
    rs = {"dependencies": {"a": {"required": ["b"]}}}
    assert _failed_ids(spark, rows, rs) == {"viol"}


def test_if_then_else(spark):
    rs = {"if": {"properties": {"status": {"const": "F"}}, "required": ["status"]},
          "then": {"required": ["clerk"]},
          "else": {"properties": {"a": {"maxLength": 2}}}}
    rows = [
        {"id": "then_viol", "status": "F"},
        {"id": "then_ok", "status": "F", "clerk": "c1"},
        {"id": "else_viol", "status": "O", "a": "toolong"},
        {"id": "else_ok", "status": "O", "a": "ab"},
    ]
    assert _failed_ids(spark, rows, rs) == {"then_viol", "else_viol"}


def test_property_names_map_and_static(spark):
    rs = {"properties": {"m": {"propertyNames": {"pattern": "^[a-z]+$"}}}}
    rows = [
        {"id": "bad", "m": {"Bad_Key": "v"}},
        {"id": "ok", "m": {"good": "v"}},
    ]
    assert _failed_ids(spark, rows, rs) == {"bad"}
    # static (root) names: every column name matches -> compile-time pass
    df = _df(spark, rows)
    ok = compile_ruleset({"propertyNames": {"pattern": "^[a-z_]+$"}},
                         df.schema, name="s")
    assert ("", "propertyNames") in ok.static_passes and not ok.checks
    bad = compile_ruleset({"propertyNames": {"maxLength": 2}},
                          df.schema, name="s2")
    assert bad.static_failures and bad.checks


def test_keyword_messages_reference_format(spark):
    df = _df(spark, [{"id": "r", "arr": [1, 1]}])
    compiled = compile_ruleset(
        {"properties": {"arr": {"uniqueItems": True}}}, df.schema, name="n")
    (chk,) = compiled.checks
    assert chk.message == ("Must NOT have duplicate items • "
                           "#/properties/arr/uniqueItems")
    assert chk.keyword == "uniqueItems"
    assert chk.instance_path == "/arr"


# ---------------------------------------------------------------------------
# seeded cross-oracle vs the jsonschema package (2019-09 covers
# dependentRequired + minContains/maxContains; if/then/else is draft-07+)
# ---------------------------------------------------------------------------

ORACLE_RULESET = {
    "type": "object",
    "required": ["id"],
    "properties": {
        "arr": {"uniqueItems": True, "contains": {"minimum": 5},
                "minContains": 1, "maxContains": 2},
        "m": {"minProperties": 1, "maxProperties": 2,
              "propertyNames": {"pattern": "^[a-z]+$", "maxLength": 4}},
        "a": {"minLength": 2},
    },
    "dependentRequired": {"a": ["b"]},
    "if": {"properties": {"status": {"const": "F"}}, "required": ["status"]},
    "then": {"required": ["clerk"]},
    "else": {"properties": {"clerk": {"pattern": "^c"}}},
}


def _gen_row(rnd: random.Random, i: int) -> dict:
    def maybe(v):
        return None if rnd.random() < 0.3 else v

    return {
        "id": f"r{i}",
        "arr": maybe(rnd.choice([[1, 2], [5, 6], [5, 5], [5, 6, 7],
                                 [1, 1], [], [9]])),
        "m": maybe(rnd.choice([{}, {"ab": "1"}, {"ab": "1", "cd": "2"},
                               {"ab": "1", "cd": "2", "ef": "3"},
                               {"BAD": "1"}, {"toolongkey": "1"}])),
        "a": maybe(rnd.choice(["x", "xy", "xyz"])),
        "b": maybe("set"),
        "status": maybe(rnd.choice(["F", "O", "P"])),
        "clerk": maybe(rnd.choice(["c9", "x9"])),
    }


def test_extended_keywords_match_jsonschema(spark):
    rnd = random.Random(20260818)
    rows = [_gen_row(rnd, i) for i in range(300)]
    df = _df(spark, rows)
    compiled = compile_ruleset(ORACLE_RULESET, df.schema, name="ext_oracle")
    res = validate(df, compiled, row_id="id")
    engine_passed = {r.id: r.passed
                     for r in res.annotated.select("id", "passed").collect()}

    validator = jsonschema.Draft201909Validator(ORACLE_RULESET)
    n_fail = 0
    for row in rows:
        inst = {k: v for k, v in row.items() if v is not None}
        oracle_ok = not list(validator.iter_errors(inst))
        n_fail += not oracle_ok
        assert engine_passed[row["id"]] == oracle_ok, (
            f"verdict mismatch for {inst!r}: "
            f"engine={engine_passed[row['id']]} jsonschema={oracle_ok}")
    assert 0 < n_fail < len(rows)


def test_malformed_extended_keywords_rejected(spark):
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    df_schema = SCHEMA
    for bad in [
        {"properties": {"arr": {"uniqueItems": "yes"}}},
        {"properties": {"arr": {"contains": [1]}}},
        {"properties": {"arr": {"minContains": -1}}},
        {"properties": {"m": {"maxProperties": True}}},
        {"dependentRequired": {"a": "b"}},
        {"if": ["x"]},
        {"propertyNames": "x"},
    ]:
        with pytest.raises(RulesetCompileError):
            compile_ruleset(bad, df_schema, name="bad")


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------

def test_property_names_java_regex_dialect(spark):
    # \p{Lu} is Java-regex-valid (Python re rejects the escape): the static
    # path must evaluate in the JVM dialect, same as the map-key rlike path
    rs = {"propertyNames": {"pattern": "^[a-z]+\\p{Lu}?[a-z_]*$"}}
    compiled = compile_ruleset(rs, SCHEMA, name="jre")
    assert ("", "propertyNames") in compiled.static_passes, (
        compiled.static_failures)


def test_property_names_type_rule_symmetric(spark):
    # property names are always strings: type:'integer' fails every name,
    # identically on the static (struct/root) and runtime (map) paths
    bad_static = compile_ruleset({"propertyNames": {"type": "integer"}},
                                 SCHEMA, name="pn1")
    assert bad_static.static_failures
    rows = [{"id": "m1", "m": {"12": "v"}}, {"id": "empty", "m": {}}]
    failed = _failed_ids(
        spark, rows,
        {"properties": {"m": {"propertyNames": {"type": "integer"}}}})
    assert failed == {"m1"}  # numeric-looking key is still a string name


def test_conditional_branches_tracked_in_columns_read(spark):
    rs = {"if": {"properties": {"status": {"const": "F"}},
                 "required": ["status"]},
          "then": {"properties": {"clerk": {"pattern": "^c"}}},
          "dependencies": {"a": {"required": ["b"]}}}
    compiled = compile_ruleset(rs, SCHEMA, name="cr")
    assert {"status", "clerk", "a", "b"} <= compiled.columns_read
    # pruning to columns_read must be sufficient to evaluate the plan
    from remark_lint_frontmatter_schema_spark import validate
    df = _df(spark, [{"id": "r1", "status": "F", "clerk": "x9"}])
    pruned = df.select("id", *sorted(compiled.columns_read))
    res = validate(pruned, compile_ruleset(rs, pruned.schema, name="cr2"),
                   row_id="id")
    assert res.violations.count() == 1  # then-branch fires on clerk 'x9'


def test_x_severity_annotation(spark):
    """x-severity sets the severity of checks at a node and inherits into
    nested properties; sibling nodes keep the default."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame(
        [("1", 5, "x", {"k": "bad"})],
        "id string, n int, s string, m map<string,string>")
    rs = {
        "properties": {
            "n": {"x-severity": "error", "minimum": 10},
            "s": {"maxLength": 0},
            "m": {"x-severity": "info",
                  "properties": {"k": {"enum": ["good"]}}},
        },
    }
    compiled = compile_ruleset(rs, df.schema, name="sev",
                               options={"strict": True})  # known keyword
    sev = {c.instance_path: c.severity for c in compiled.checks}
    assert sev == {"/n": "error", "/s": "warning", "/m/k": "info"}
    got = {r.instance_path: r.severity
           for r in validate(df, compiled, row_id="id").violations.collect()}
    assert got == {"/n": "error", "/s": "warning", "/m/k": "info"}
    # malformed severity fails compile
    import pytest as _p
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    with _p.raises(RulesetCompileError):
        compile_ruleset({"properties": {"n": {"x-severity": "loud"}}},
                        df.schema, name="bad")


def test_x_severity_does_not_leak_from_ref(spark):
    """x-severity inside a $ref'd subtree must not bleed into the
    referring node's sibling keywords via the shared compile context."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    df_schema = spark.createDataFrame([("1", 5)], "id string, n int").schema
    rs = {
        "$defs": {"a": {"x-severity": "error", "minimum": 0}},
        "properties": {"n": {"$ref": "#/$defs/a", "maximum": 99}},
    }
    compiled = compile_ruleset(rs, df_schema, name="refsev")
    sev = {c.keyword: c.severity for c in compiled.checks}
    assert sev == {"minimum": "error", "maximum": "warning"}


# ---------------------------------------------------------------------------
# x-embedding (row-level embedding-quality invariants)
# ---------------------------------------------------------------------------

def test_x_embedding_checks(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    rows = [
        ("ok",    [0.6, 0.8]),
        ("short", [1.0]),
        ("nan",   [float("nan"), 1.0]),
        ("zero",  [0.0, 0.0]),
        ("unnorm", [3.0, 4.0]),
        ("absent", None),
    ]
    df = spark.createDataFrame(rows, "id string, v array<double>")
    rs = {"properties": {"v": {"x-embedding": {
        "dim": 2, "finite": True, "nonzero": True, "normalized": True}}}}
    compiled = compile_ruleset(rs, df.schema, name="emb")
    got = {}
    for r in validate(df, compiled, row_id="id").violations.collect():
        got.setdefault(r.row_id, []).append((r.keyword, r.actual))
    assert "ok" not in got and "absent" not in got
    # [1.0] is the wrong dimension but has norm exactly 1 — only dim fires
    assert got["short"] == [("x-embedding-dim", "1")]
    assert got["nan"] == [("x-embedding-finite", "1 non-finite")]
    assert sorted(got["zero"]) == [("x-embedding-nonzero", "0.0"),
                                   ("x-embedding-norm", "0.0")]
    assert got["unnorm"] == [("x-embedding-norm", "5.0")]


def test_x_embedding_composition_and_guards(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    df = spark.createDataFrame(
        [("a", [0.6, 0.8], "s")], "id string, v array<double>, s string")
    # inside anyOf: probes as a row expression (unlike table checks)
    rs = {"properties": {"v": {"anyOf": [
        {"x-embedding": {"dim": 2}}, {"x-embedding": {"dim": 3}}]}}}
    compiled = compile_ruleset(rs, df.schema, name="emb2")
    assert not compiled.unknown
    assert validate(df, compiled, row_id="id").violations.count() == 0
    # declared on a non-float-array column: surfaced as unknown
    c2 = compile_ruleset({"properties": {"s": {"x-embedding": {"dim": 2}}}},
                         df.schema, name="emb3")
    assert ("/s", "x-embedding") in c2.unknown
    # malformed params refuse at compile time
    for bad in ({"dim": 0}, {"dim": True}, {"norm_tol": -1},
                {"normalized": "yes"}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset({"properties": {"v": {"x-embedding": bad}}},
                            df.schema, name="emb4")


def test_x_finite_gate(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, float("inf")), (4, None)],
        "id long, v double")
    c = compile_ruleset({"properties": {"v": {"x-finite": True,
                                              "minimum": 0}}}, df.schema)
    res = validate(df, c, row_id="id")
    rows = {(r["row_id"], r["keyword"]) for r in res.violations.collect()}
    # NaN/Inf violate x-finite; NaN ALSO fails maximum-style checks but
    # passes a bare minimum (NaN sorts above every double) — the gate
    # exists precisely for that hole. NULL never violates here.
    assert ("2", "x-finite") in rows and ("3", "x-finite") in rows
    assert ("4", "x-finite") not in rows
    # declared on a non-float column -> unknown, not a silent pass
    c2 = compile_ruleset({"properties": {"id": {"x-finite": True}}},
                         df.schema)
    assert ("/id", "x-finite") in c2.unknown
