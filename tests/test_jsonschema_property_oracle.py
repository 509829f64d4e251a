"""Property-style oracle: for seeded random rows, the engine's per-row
verdict must equal an independent JSON-Schema implementation's verdict
(the `jsonschema` package) on the same instance (SURVEY.md §5.2 item 2).

Instance mapping: a NULL column is an absent property (the engine's
documented semantics — Ajv never runs value keywords on missing
properties), so None entries are dropped from the dict handed to
jsonschema.

Scope note: keywords with deliberate engine-specific semantics on string
columns (dynamic `type` / numeric bounds via try_cast, mirroring YAML
scalar inference rather than JSON typing) are exercised by unit tests,
not here — this oracle covers the shared JSON-Schema core.
"""

import random

import jsonschema
import pyspark.sql.types as T

from remark_lint_frontmatter_schema_spark import compile_ruleset, validate

SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("s", T.StringType()),
    T.StructField("n", T.IntegerType()),
    T.StructField("d", T.DoubleType()),
    T.StructField("arr", T.ArrayType(T.StringType())),
    T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    T.StructField("c", T.StringType()),
    T.StructField("e", T.StringType()),
    T.StructField("comp", T.StringType()),
    T.StructField("one", T.StringType()),
    T.StructField("nn", T.StringType()),
])

RULESET = {
    "type": "object",
    "required": ["id", "s"],
    "properties": {
        "s": {"type": "string", "minLength": 2, "maxLength": 8,
              "pattern": "^[a-z]+$"},
        "n": {"minimum": 0, "exclusiveMaximum": 50, "multipleOf": 5},
        "d": {"exclusiveMinimum": 0.5, "maximum": 2.5},
        "arr": {"minItems": 1, "maxItems": 4, "items": {"maxLength": 3}},
        "m": {"required": ["lang"],
              "properties": {"lang": {"enum": ["en", "de"]}},
              "additionalProperties": False},
        "c": {"const": "x"},
        "e": {"enum": ["a", "b", "c"]},
        "comp": {"anyOf": [{"maxLength": 2}, {"minLength": 6}]},
        "one": {"oneOf": [{"pattern": "^a"}, {"pattern": "b$"}]},
        "nn": {"not": {"enum": ["bad"]}},
    },
}

_STRINGS = ["ab", "abcdef", "xyz", "ABC", "a b", "toolongvalue", "x", "",
            "bad", "abb", "ba", "aab", "zzzzzzzzz"]


def _gen_row(rnd: random.Random, i: int) -> dict:
    def maybe(v):
        return None if rnd.random() < 0.25 else v

    return {
        "id": f"r{i}",
        "s": maybe(rnd.choice(_STRINGS)),
        "n": maybe(rnd.choice([-10, -5, 0, 5, 7, 45, 50, 55, 100])),
        "d": maybe(rnd.choice([0.4, 0.5, 0.6, 1.0, 2.5, 2.6, -1.0])),
        "arr": maybe(rnd.sample(["ab", "abcd", "x", "yyyy", "z"],
                                rnd.randint(0, 5))),
        "m": maybe(rnd.choice([
            {"lang": "en"}, {"lang": "fr"}, {}, {"lang": "de", "x": "1"},
            {"other": "k"},
        ])),
        "c": maybe(rnd.choice(["x", "y"])),
        "e": maybe(rnd.choice(["a", "b", "c", "d"])),
        "comp": maybe(rnd.choice(_STRINGS)),
        "one": maybe(rnd.choice(["ax", "xb", "ab", "xx", "a", "b"])),
        "nn": maybe(rnd.choice(["ok", "bad", "fine"])),
    }


def test_engine_verdicts_match_jsonschema(spark):
    rnd = random.Random(20260817)
    rows = [_gen_row(rnd, i) for i in range(400)]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA.fields) for r in rows], SCHEMA)
    compiled = compile_ruleset(RULESET, df.schema, name="prop")
    res = validate(df, compiled, row_id="id")
    engine_passed = {r.id: r.passed
                     for r in res.annotated.select("id", "passed").collect()}
    assert len(engine_passed) == len(rows)

    validator = jsonschema.Draft7Validator(RULESET)
    n_fail = 0
    for row in rows:
        inst = {k: v for k, v in row.items() if v is not None}
        oracle_ok = not list(validator.iter_errors(inst))
        n_fail += not oracle_ok
        assert engine_passed[row["id"]] == oracle_ok, (
            f"verdict mismatch for {inst!r}: engine={engine_passed[row['id']]} "
            f"jsonschema={oracle_ok}")
    # the corpus must exercise both outcomes to be meaningful
    assert 0 < n_fail < len(rows)


# ---------------------------------------------------------------------------
# round 2 keywords: patternProperties, tuple-form items, additionalItems,
# dict-form additionalProperties
# ---------------------------------------------------------------------------

SCHEMA2 = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    T.StructField("arr", T.ArrayType(T.StringType())),
    T.StructField("arr2", T.ArrayType(T.IntegerType())),
])

RULESET2 = {
    "type": "object",
    "properties": {
        "m": {
            "properties": {"lang": {"enum": ["en", "de"]}},
            "patternProperties": {"^x_": {"pattern": "^[0-9]+$"},
                                  "_id$": {"minLength": 3}},
            "additionalProperties": {"maxLength": 2},
        },
        "arr": {"items": [{"enum": ["a", "b"]}, {"maxLength": 2}],
                "additionalItems": {"maxLength": 1}},
        "arr2": {"items": [{"minimum": 0}, {"maximum": 10}],
                 "additionalItems": False},
    },
}

_MAPS = [
    {"lang": "en"}, {"lang": "fr"},
    {"x_a": "123"}, {"x_a": "12b"},
    {"a_id": "abcd"}, {"a_id": "ab"},
    {"x_b_id": "12"},          # matches both patterns: needs digits AND len>=3
    {"x_b_id": "123"},
    {"free": "ok"}, {"free": "toolong"},
    {"lang": "en", "x_a": "9", "free": "y"},
    {},
]

_ARRS = [["a"], ["b", "xy"], ["c"], ["a", "toolong"], ["a", "xy", "z"],
         ["a", "xy", "zz"], [], ["b", "xy", "q", "r"]]
_ARR2S = [[0], [0, 5], [-1, 5], [0, 11], [0, 5, 9], [], [3]]


def _gen_row2(rnd: random.Random, i: int) -> dict:
    def maybe(v):
        return None if rnd.random() < 0.2 else v
    return {
        "id": f"r{i}",
        "m": maybe(rnd.choice(_MAPS)),
        "arr": maybe(rnd.choice(_ARRS)),
        "arr2": maybe(rnd.choice(_ARR2S)),
    }


def test_pattern_props_tuple_items_match_jsonschema(spark):
    rnd = random.Random(20260818)
    rows = [_gen_row2(rnd, i) for i in range(300)]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA2.fields) for r in rows], SCHEMA2)
    compiled = compile_ruleset(RULESET2, df.schema, name="prop2")
    res = validate(df, compiled, row_id="id")
    engine_passed = {r.id: r.passed
                     for r in res.annotated.select("id", "passed").collect()}
    validator = jsonschema.Draft7Validator(RULESET2)
    n_fail = 0
    for row in rows:
        inst = {k: v for k, v in row.items() if v is not None}
        oracle_ok = not list(validator.iter_errors(inst))
        n_fail += not oracle_ok
        assert engine_passed[row["id"]] == oracle_ok, (
            f"verdict mismatch for {inst!r}: engine={engine_passed[row['id']]}"
            f" jsonschema={oracle_ok}")
    assert 0 < n_fail < len(rows)


def test_pattern_properties_static_names(spark):
    """Struct/root property names are schema-static: patternProperties
    compiles per matching name like a properties entry."""
    df = spark.createDataFrame(
        [("1", "ok", "yes"), ("2", "toolooong", "yes"), ("3", "ok", "nope!")],
        ["id", "x_alpha", "x_beta"])
    rs = {"patternProperties": {"^x_": {"maxLength": 4}}}
    compiled = compile_ruleset(rs, df.schema, name="pp")
    got = {(r.row_id, r.instance_path) for r in
           validate(df, compiled, row_id="id").violations.collect()}
    assert got == {("2", "/x_alpha"), ("3", "/x_beta")}
    # schema provenance carries the pattern
    assert any("/patternProperties/^x_/" in c.schema_path
               for c in compiled.checks)


def test_tuple_items_no_silent_vacuous_pass(spark):
    """Regression: tuple-form items used to compile to nothing, silently."""
    df = spark.createDataFrame(
        [("1", ["a", "bb"]), ("2", ["z", "bb"]), ("3", ["a"]),
         ("4", ["a", "bb", "c", "d"])],
        ["id", "arr"])
    rs = {"properties": {"arr": {"items": [{"enum": ["a", "b"]},
                                           {"maxLength": 2}],
                                 "additionalItems": False}}}
    compiled = compile_ruleset(rs, df.schema, name="ti")
    assert len(compiled.checks) == 3  # two positions + additionalItems cap
    got = {(r.row_id, r.keyword, r.instance_path) for r in
           validate(df, compiled, row_id="id").violations.collect()}
    assert got == {("2", "items", "/arr/0"),
                   ("4", "additionalItems", "/arr")}


def test_prefix_items_2020_12(spark):
    """2020-12 positional form: prefixItems + dict `items` as tail schema,
    sharing the tuple compile path; verdicts pinned to jsonschema's
    Draft202012Validator."""
    rs = {"properties": {"arr": {"prefixItems": [{"enum": ["a", "b"]},
                                                 {"maxLength": 2}],
                                 "items": {"maxLength": 1}}}}
    rows = [("0", ["a"]), ("1", ["z"]), ("2", ["a", "xyz"]),
            ("3", ["b", "xy", "q"]), ("4", ["b", "xy", "qq"]), ("5", None)]
    df = spark.createDataFrame(rows, "id string, arr array<string>")
    compiled = compile_ruleset(rs, df.schema, name="pfx")
    res = validate(df, compiled, row_id="id")
    engine_ok = {r.id: r.passed
                 for r in res.annotated.select("id", "passed").collect()}
    validator = jsonschema.Draft202012Validator(rs)
    for rid, arr in rows:
        inst = {} if arr is None else {"arr": arr}
        assert engine_ok[rid] == (not list(validator.iter_errors(inst))), rid
    # annotation keywords stay out of `unknown` (strict-safe)
    c2 = compile_ruleset(
        {"$comment": "x", "readOnly": True, "contentEncoding": "base64",
         "properties": {"arr": {"deprecated": True}}},
        df.schema, name="ann", options={"strict": True})
    assert not c2.unknown


# ---------------------------------------------------------------------------
# 2019-09 unevaluatedProperties + dependentSchemas (annotation semantics:
# an applicator branch marks its properties evaluated ONLY when it
# validates) — oracle is jsonschema's Draft201909Validator
# ---------------------------------------------------------------------------

SCHEMA3 = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("a", T.StringType()),
    T.StructField("b", T.StringType()),
    T.StructField("c", T.StringType()),
    T.StructField("m", T.MapType(T.StringType(), T.StringType())),
])

RULESET3 = {
    "type": "object",
    "allOf": [{"properties": {"a": {"maxLength": 4}}}],
    "anyOf": [
        {"properties": {"b": {"pattern": "^x"}}, "required": ["b"]},
        {"properties": {"c": {"minLength": 2}}, "required": ["c"]},
    ],
    "properties": {
        "id": {},
        "m": {
            "properties": {"lang": {"enum": ["en", "de"]}},
            "dependentSchemas": {
                "region": {"properties": {"lang": {"const": "de"}},
                           "required": ["lang"]},
            },
            "anyOf": [
                {"properties": {"x": {"maxLength": 2}}, "required": ["x"]},
                {"properties": {"region": {"minLength": 2}},
                 "required": ["region"]},
            ],
            "unevaluatedProperties": False,
        },
    },
    "unevaluatedProperties": False,
}

_MAPS3 = [
    {"lang": "en", "x": "ab"},          # anyOf[0] valid -> x evaluated
    {"lang": "en", "x": "toolong"},     # anyOf[0] invalid -> x unevaluated
    {"lang": "de", "region": "eu"},     # dependentSchemas + anyOf[1]
    {"lang": "en", "region": "eu"},     # dependentSchemas fails (lang!=de)
    {"lang": "fr", "x": "a"},           # enum fails, x still evaluated
    {"x": "ab", "zz": "1"},             # zz never evaluated
    {"region": "e"},                    # anyOf[1] invalid (too short)
    {},
]


def _gen_row3(rnd: random.Random, i: int) -> dict:
    def maybe(v, p=0.6):
        return None if rnd.random() > p else v
    return {
        "id": f"r{i}",
        "a": maybe(rnd.choice(["ok", "toolongg", "abcd"])),
        "b": maybe(rnd.choice(["xb", "zz", "x"])),
        "c": maybe(rnd.choice(["cc", "c", "see"])),
        "m": maybe(rnd.choice(_MAPS3)),
    }


def test_unevaluated_properties_match_jsonschema_201909(spark):
    rnd = random.Random(20260818)
    rows = [_gen_row3(rnd, i) for i in range(400)]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA3.fields) for r in rows], SCHEMA3)
    compiled = compile_ruleset(RULESET3, df.schema, name="uneval")
    assert not compiled.unknown
    res = validate(df, compiled, row_id="id")
    engine_passed = {r.id: r.passed
                     for r in res.annotated.select("id", "passed").collect()}
    validator = jsonschema.Draft201909Validator(RULESET3)
    n_fail = 0
    for row in rows:
        inst = {k: v for k, v in row.items() if v is not None}
        oracle_ok = not list(validator.iter_errors(inst))
        n_fail += not oracle_ok
        assert engine_passed[row["id"]] == oracle_ok, (
            f"verdict mismatch for {inst!r}: "
            f"engine={engine_passed[row['id']]} jsonschema={oracle_ok}")
    assert 0 < n_fail < len(rows)


def test_unevaluated_properties_schema_form_and_static_pass(spark):
    df = spark.createDataFrame([("1", "aa", "long-enough-value")],
                               "id string, a string, b string")
    # schema form: unevaluated values must satisfy the schema
    rs = {"properties": {"id": {}, "a": {"maxLength": 4}},
          "unevaluatedProperties": {"minLength": 5}}
    compiled = compile_ruleset(rs, df.schema, name="uev")
    assert validate(df, compiled, row_id="id").violations.count() == 0
    rs2 = {"properties": {"id": {}, "a": {"maxLength": 4}},
           "unevaluatedProperties": {"minLength": 50}}
    got = validate(df, compile_ruleset(rs2, df.schema, name="uev2"),
                   row_id="id").violations.collect()
    assert [(r.keyword, r.actual) for r in got] == \
        [("unevaluatedProperties", "b")]
    # everything declared -> compiles to a static pass, zero runtime checks
    rs3 = {"properties": {"id": {}, "a": {}, "b": {}},
           "unevaluatedProperties": False}
    c3 = compile_ruleset(rs3, df.schema, name="uev3")
    assert ("", "unevaluatedProperties") in c3.static_passes
    assert all(ch.keyword != "unevaluatedProperties" for ch in c3.checks)


# ---------------------------------------------------------------------------
# 2019-09 unevaluatedItems: tuple-prefix coverage through validating
# branches + contains-matched elements
# ---------------------------------------------------------------------------

SCHEMA4 = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("arr", T.ArrayType(T.StringType())),
])

RULESET4 = {
    "properties": {
        "id": {},
        "arr": {
            "anyOf": [
                {"items": [{"enum": ["a"]}, {"enum": ["b"]}]},
                {"items": [{"enum": ["x"]}]},
                {"contains": {"const": "z"}},
            ],
            "unevaluatedItems": False,
        },
    },
}

_POOL4 = ["a", "b", "x", "z", "q"]


def test_unevaluated_items_match_jsonschema_201909(spark):
    rnd = random.Random(20260819)
    rows = [(f"r{i}",
             None if rnd.random() < 0.1
             else [rnd.choice(_POOL4) for _ in range(rnd.randint(0, 4))])
            for i in range(400)]
    df = spark.createDataFrame(rows, SCHEMA4)
    compiled = compile_ruleset(RULESET4, df.schema, name="ui")
    assert not compiled.unknown
    res = validate(df, compiled, row_id="id")
    engine_passed = {r.id: r.passed
                     for r in res.annotated.select("id", "passed").collect()}
    validator = jsonschema.Draft201909Validator(RULESET4)
    n_fail = 0
    for rid, arr in rows:
        inst = {"id": rid} if arr is None else {"id": rid, "arr": arr}
        oracle_ok = not list(validator.iter_errors(inst))
        n_fail += not oracle_ok
        assert engine_passed[rid] == oracle_ok, (
            f"verdict mismatch for {inst!r}: engine={engine_passed[rid]} "
            f"jsonschema={oracle_ok}")
    assert 0 < n_fail < len(rows)


def test_unevaluated_items_schema_form_and_vacuous(spark):
    df = spark.createDataFrame(
        [("1", ["a", "b", "cc"]), ("2", ["a", "b", "c", "dd"])],
        "id string, arr array<string>")
    rs = {"properties": {"id": {}, "arr": {
        "items": [{"enum": ["a"]}, {"enum": ["b"]}],
        "unevaluatedItems": {"maxLength": 1},
    }}}
    got = validate(df, compile_ruleset(rs, df.schema, name="uis"),
                   row_id="id").violations.collect()
    # row 1: tail ["cc"] has one over-long element; row 2: ["c","dd"] has
    # one over-long element -> one violation row each, counting the bad
    assert sorted((r.row_id, r.keyword, r.actual) for r in got) == [
        ("1", "unevaluatedItems", "1"), ("2", "unevaluatedItems", "1")]
    # non-array node: vacuous static pass
    rs2 = {"properties": {"id": {"unevaluatedItems": False}}}
    c2 = compile_ruleset(rs2, df.schema, name="uis2")
    assert ("/id", "unevaluatedItems") in c2.static_passes
