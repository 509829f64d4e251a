"""Compiler totality fuzz (hypothesis): for ANY JSON-ish schema document,
``compile_ruleset`` either succeeds or raises ``RulesetCompileError`` —
never a raw TypeError/AttributeError/analysis crash (the reference's
compile guard, index.ts:335-340, reinterpreted as a total function).

Driver-side only (expression construction, no job), so examples are cheap.
"""

import hypothesis.strategies as st
import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.plans.bundler import (
    RulesetCompileError)

DF_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("s", T.StringType()),
    T.StructField("n", T.IntegerType()),
    T.StructField("arr", T.ArrayType(T.StringType())),
    T.StructField("m", T.MapType(T.StringType(), T.StringType())),
])

_KEYWORDS = ["type", "enum", "const", "required", "maxLength", "minLength",
             "pattern", "minimum", "maximum", "exclusiveMinimum",
             "multipleOf", "maxItems", "minItems", "properties", "items",
             "allOf", "anyOf", "oneOf", "not", "additionalProperties",
             "format", "$ref", "frobnicate",
             "uniqueItems", "contains", "minContains", "maxContains",
             "minProperties", "maxProperties", "dependentRequired",
             "dependencies", "if", "then", "else", "propertyNames",
             "patternProperties", "additionalItems", "prefixItems",
             "$comment", "readOnly", "contentEncoding",
             "contentMediaType", "contentSchema", "default",
             "unevaluatedProperties", "unevaluatedItems",
             "dependentSchemas",
             "x-unique", "x-ref", "x-drift", "x-spark-check",
             "x-outlier", "x-repair", "x-severity",
             "x-dup-ngram", "x-embedding", "x-monotonic", "x-gopher", "x-c4",
             "x-leakage", "x-fd", "x-gap", "x-gibberish", "x-lm-ppl", "x-ref-asof",
             "x-finite", "x-ref-interval",
             "x-skew", "x-reconcile", "x-calendar", "x-freshness",
             "x-benford", "x-corr", "x-mask",
             # 2019-09/2020-12 dynamic refs: NOT resolved (the reference's
             # default draft-07 Ajv lacks them too) — must surface in
             # `unknown`, never crash or silently validate
             "$dynamicRef", "$dynamicAnchor",
             "$recursiveRef", "$recursiveAnchor"]

_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-5, 100),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.sampled_from(["x", "^[a-z", "(?P<g>a)", "a*+", "#/properties/s",
                     "#/nope", "string", "integer", "date", "bogus"]),
)
_values = st.recursive(
    _scalars | st.lists(_scalars, max_size=3),
    lambda kids: st.dictionaries(st.sampled_from(_KEYWORDS), kids, max_size=4)
    | st.dictionaries(st.sampled_from(["s", "n", "arr", "m", "ghost"]),
                      kids, max_size=3),
    max_leaves=12,
)
_schemas = st.dictionaries(st.sampled_from(_KEYWORDS), _values, max_size=5)


@given(schema=_schemas)
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compile_is_total(spark, schema):
    try:
        compiled = compile_ruleset(schema, DF_SCHEMA, name="fuzz")
        assert compiled.ruleset_hash
    except RulesetCompileError:
        pass


def test_bad_regex_fails_compile(spark):
    with __import__("pytest").raises(RulesetCompileError):
        compile_ruleset({"properties": {"s": {"pattern": "^[a-z"}}},
                        DF_SCHEMA)


def test_java_regex_dialect(spark):
    """Regex validation uses the JVM dialect that rlike executes: Java-only
    syntax compiles; Java-invalid patterns fail compile even when Python
    `re` would accept them (code-review findings, 2026-08-17)."""
    import pytest
    # \p{Lu} is Java-valid (Python re rejects it) -> must compile
    compile_ruleset({"properties": {"s": {"pattern": r"\p{Lu}+"}}}, DF_SCHEMA)
    # (?P<g>...) is Python-only named-group syntax, invalid in Java
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"s": {"pattern": "(?P<g>a)"}}},
                        DF_SCHEMA)


def test_strict_sees_subtree_unknowns(spark):
    import pytest
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"s": {"anyOf": [{"frobnicate": 1}]}}},
                        DF_SCHEMA, options={"strict": True})
    c = compile_ruleset({"properties": {"s": {"not": {"frobnicate": 1}}}},
                        DF_SCHEMA)
    assert any("frobnicate" in str(u) for u in c.unknown)


def test_shape_walk_covers_additional_properties_and_tuple_items(spark):
    import pytest
    for bad in (
        {"properties": {"m": {"additionalProperties": {"enum": []}}}},
        {"properties": {"arr": {"items": [{"pattern": 123}]}}},
    ):
        with pytest.raises(RulesetCompileError):
            compile_ruleset(bad, DF_SCHEMA)
