"""The shipped operational-health ruleset (rulesets/ops.schema.yaml)
compiles and drives the full table-check loop on the events table."""

from remark_lint_frontmatter_schema_spark import (bundle, compile_ruleset)
from remark_lint_frontmatter_schema_spark.operators.table_checks import (
    validate_with_table_checks)


def test_ops_ruleset_end_to_end(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    compiled = compile_ruleset(bundle("rulesets/ops.schema.yaml"),
                               ev.schema, name="ops")
    kinds = sorted(k for k, _, _ in compiled.table_checks)
    assert kinds == ["benford", "calendar", "corr", "freshness",
                     "monotonic", "outlier", "quantile", "skew",
                     "unique", "unique_multi", "volume"]
    assert compiled.unknown == []
    res = validate_with_table_checks(ev, compiled, row_id="event_id")
    got = {r.keyword for r in res.violations.select("keyword")
           .distinct().collect()}
    # deterministic on the fixed testdata: freshness always stale (data
    # ends 2024, as_of defaults to now); the hot user trips x-skew; value
    # is independent of user_id so x-corr fires; outliers exist. The
    # passes are as meaningful: benford MAD ~0.008 is inside 0.015, both
    # key checks are genuinely unique, the daily calendar is dense, and
    # per-user ts is monotone.
    assert got == {"outlier", "x-corr", "x-freshness", "x-skew"}
