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
