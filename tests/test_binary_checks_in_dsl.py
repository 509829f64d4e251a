"""Binary header checks as first-class DSL constraints (x-spark-check),
and equivalence of the three header-check implementations."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.sources import fixtures


@pytest.fixture(scope="module")
def clips(spark):
    df = fixtures.generate_clips(spark, 600, audio_ms=8, num_partitions=4)
    df.cache().count()
    return df


def test_three_header_impls_agree(clips):
    df = clips.where("bytes is not null").select(
        "clip_id",
        audio.codec_header_ok("bytes", "codec", "sr_hz").alias("full"),
        audio.codec_header_ok_col().alias("prefix"),
        audio.codec_header_ok_expr().alias("jvm"),
    )
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.full == r.prefix == r.jvm, r


def test_header_check_via_dsl(clips):
    ruleset = {
        "properties": {
            "bytes": {"x-spark-check": "codec_header"},
        },
    }
    compiled = compile_ruleset(ruleset, clips.schema, name="bin",
                               extra_checks=audio.register_audio_checks())
    res = validate(clips, compiled, row_id="clip_id",
                   partition_col="part_date")
    rows = res.violations.collect()
    assert rows
    assert all(r.keyword == "x-spark-check" for r in rows)
    assert all('must pass check "codec_header"' in r.message.lower()
               or "codec_header" in r.message for r in rows)
    # actual is a hex prefix, never raw payload bytes
    assert all(len(r.actual) <= 32 for r in rows if r.actual)
    # the injected corrupt/mismatch/divx rows are exactly the hits
    ids = {int(r.row_id.split("_")[1]) for r in rows
           if r.row_id.startswith("clip_") and "hot" not in r.row_id}
    classes = {fixtures.defect_class(i) for i in ids}
    # range_sr rows carry sr_hz=3 in the column but an 8 kHz container ->
    # a true header/column mismatch, caught by design
    assert classes <= {"corrupt_bytes", "codec_header_mismatch", "enum_codec",
                       "range_sr",
                       None}  # None: dup-id rows aliased onto neighbors


def test_expression_only_plan_has_no_python_stage(clips):
    ruleset = {"properties": {"codec": {"enum": ["pcm_s16le", "flac", "opus"]}}}
    compiled = compile_ruleset(ruleset, clips.schema, name="expr")
    res = validate(clips, compiled, row_id="clip_id")
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    # ...and the binary ruleset does add exactly one Arrow stage
    compiled_b = compile_ruleset(
        {"properties": {"bytes": {"x-spark-check": "codec_header"}}},
        clips.schema, name="bin", extra_checks=audio.register_audio_checks())
    res_b = validate(clips, compiled_b, row_id="clip_id")
    plan_b = res_b.violations._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan_b
    _ = F
