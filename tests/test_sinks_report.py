import pytest

from remark_lint_frontmatter_schema_spark import bundle, compile_ruleset, validate
from remark_lint_frontmatter_schema_spark import sinks
from remark_lint_frontmatter_schema_spark.sources import fixtures


@pytest.fixture(scope="module")
def result(spark):
    clips = fixtures.generate_clips(spark, 200, audio_ms=8, num_partitions=2)
    compiled = compile_ruleset(bundle("rulesets/clip.schema.yaml"),
                               clips.schema, name="clip",
                               exclude_columns=("ruleset_id",))
    return validate(clips, compiled, row_id="clip_id",
                    partition_col="part_date",
                    applicability=clips.ruleset_id.isNotNull())


def test_report_renders_with_summary(result):
    rep = sinks.render_report(result.violations)
    assert "warning" in rep
    # reporter-style trailing summary (README.md:449-454)
    assert rep.splitlines()[-1].startswith("⚠ ")
    assert "Must " in rep


def test_report_escalates_to_problems_banner(spark):
    """Any error-severity violation flips the summary to the vfile
    '✖ N problems (X errors, Y warnings)' form."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame(
        [(1, -5, "toolongvalue"), (2, 3, "ok")], "id int, v int, s string")
    compiled = compile_ruleset(
        {"properties": {"v": {"minimum": 0, "x-severity": "error"},
                        "s": {"maxLength": 5}}}, df.schema, name="sev")
    rep = sinks.render_report(validate(df, compiled, row_id="id").violations)
    last = rep.splitlines()[-1]
    assert last == "✖ 2 problems (1 error, 1 warning)"
    assert "  error " in rep and "  warning" in rep.replace(last, "")


def test_violation_sink_roundtrip(result, tmp_path):
    p = str(tmp_path / "viol")
    sinks.write_violations(result.violations, p, run_id="r1")
    sinks.write_violations(result.violations, p, run_id="r2")
    import pyspark.sql.functions as F
    back = result.violations.sparkSession.read.parquet(p)
    assert back.select("run_id").distinct().count() == 2
    assert back.count() == 2 * result.violations.count()


def test_worst_partitions(result):
    w = sinks.worst_partitions(result.verdicts, k=3).collect()
    assert w and all(r.rnk <= 3 for r in w)
    assert w[0].violation_rate >= w[-1].violation_rate


def test_write_split_routes_by_severity_gate(spark, tmp_path):
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark.operators.validate import (
        n_blocking_expr)
    rows = [("ok", "pcm_s16le", 16000),     # clean
            ("warnrow", "pcm_s16le", 99),   # warning-severity violation
            ("errrow", "mp3", 16000)]       # error-severity violation
    df = spark.createDataFrame(rows, "clip_id string, codec string, sr_hz int")
    compiled = compile_ruleset({
        "type": "object",
        "properties": {
            "codec": {"x-severity": "error",
                      "enum": ["pcm_s16le", "flac", "opus"]},
            "sr_hz": {"x-severity": "warning", "minimum": 8000},
        }}, df.schema, name="gatecheck")
    p = str(tmp_path / "split")
    counts = sinks.write_split(df, compiled, path=p, run_id="r1",
                               fail_severities=("error",))
    assert counts == {"accepted": 2, "quarantined": 1, "run_id": "r1"}
    back = spark.read.parquet(p)
    acc = {r.clip_id for r in back.where(F.col("accepted").cast("boolean")).collect()}
    quar = [r for r in back.where(~F.col("accepted").cast("boolean")).collect()]
    assert acc == {"ok", "warnrow"}   # warnings pass an ("error",) gate
    # quarantine is self-describing: the violation rides with the row
    assert quar[0].clip_id == "errrow"
    assert quar[0]._violations[0].keyword == "enum"
    assert quar[0]._violations[0].severity == "error"
    # the accepted-but-warned row still carries its warning annotation
    warned = back.where("clip_id = 'warnrow'").collect()[0]
    assert warned._violations[0].severity == "warning"
    # a stricter gate quarantines warnings too, appended as a new run
    counts2 = sinks.write_split(df, compiled, path=p, run_id="r2",
                                fail_severities=("error", "warning"))
    assert counts2 == {"accepted": 1, "quarantined": 2, "run_id": "r2"}
    # r1 untouched (run_id partition isolation)
    r1 = spark.read.parquet(p).where("run_id = 'r1'")
    assert r1.where(F.col("accepted").cast("boolean")).count() == 2
    # the gate expression itself is severity-selective and codegen-clean
    gate_plan = df.select(
        (n_blocking_expr(compiled, ("error",)) == 0).alias("a")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in gate_plan and "filter(" not in gate_plan
