"""Property-style repair oracle: for seeded random rows and a ruleset
mixing every repairable keyword, (1) the repaired table re-validates
clean for exactly those keywords, (2) rows absent from the repair log
round-trip byte-identical, and (3) every logged step changed the value
(no vacuous log rows). The repair analog of the jsonschema property
oracle (SURVEY.md §5.2)."""

import random

import pyspark.sql.types as T

from remark_lint_frontmatter_schema_spark import (
    compile_ruleset, repair, validate)

SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("s", T.StringType()),
    T.StructField("n", T.IntegerType()),
    T.StructField("d", T.DoubleType()),
    T.StructField("e", T.StringType()),
    T.StructField("arr", T.ArrayType(T.IntegerType())),
])

RULESET = {
    "type": "object",
    "properties": {
        # truncate + pattern-nullify chain
        "s": {"maxLength": 6, "pattern": "^[a-z]"},
        # fractional bounds on an integral column (the cast-truncation trap)
        "n": {"minimum": 0.5, "exclusiveMaximum": 40.5},
        "d": {"minimum": -1.0, "maximum": 1.0},
        "e": {"enum": ["a", "b"], "default": "a"},
        "arr": {"uniqueItems": True, "maxItems": 3},
    },
}

# keywords the repair pass guarantees clean afterwards
REPAIRED_KW = {"maxLength", "pattern", "minimum", "maximum",
               "exclusiveMaximum", "enum", "uniqueItems", "maxItems"}

_STRINGS = ["ab", "Abcdef", "toolongvalue", "", "UPPER", "ok", None,
            "zzzzzzzzzz", "a", "9start"]
_ENUMS = ["a", "b", "c", "zz", None, ""]


def _rows(n=400, seed=20260818):
    rnd = random.Random(seed)
    out = []
    for i in range(n):
        arr = (None if rnd.random() < 0.15 else
               [rnd.randint(0, 4) for _ in range(rnd.randint(0, 6))])
        out.append((
            f"r{i}",
            rnd.choice(_STRINGS),
            None if rnd.random() < 0.1 else rnd.randint(-10, 60),
            None if rnd.random() < 0.1 else rnd.uniform(-3, 3),
            rnd.choice(_ENUMS),
            arr,
        ))
    return out


def test_repair_invariants_on_seeded_random_rows(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    res = repair(df, RULESET, row_id="id")
    assert res.repaired.schema == df.schema

    # (1) re-lint: no violation on any repaired keyword survives
    compiled = compile_ruleset(RULESET, df.schema)
    left = validate(res.repaired, compiled, row_id="id").violations
    leftover = [r for r in left.collect() if r.keyword in REPAIRED_KW]
    assert leftover == [], leftover[:5]

    # (2) untouched rows are byte-identical to the input
    logged = {r.row_id for r in res.log.collect()}
    before = {r.id: r for r in df.collect()}
    after = {r.id: r for r in res.repaired.collect()}
    for rid in before:
        if rid not in logged:
            assert before[rid] == after[rid], rid

    # (3) no vacuous log rows: every step changed the (stringified) value
    for r in res.log.collect():
        assert r.before != r.after, r


def test_repair_is_idempotent(spark):
    # a second pass over already-repaired data must change nothing and
    # log nothing — the fixed point of the lint -> fix loop
    df = spark.createDataFrame(_rows(), SCHEMA)
    once = repair(df, RULESET, row_id="id")
    twice = repair(once.repaired, RULESET, row_id="id")
    assert twice.log.count() == 0
    a = {r.id: r for r in once.repaired.collect()}
    b = {r.id: r for r in twice.repaired.collect()}
    assert a == b
