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
