"""Snapshot diff (operators/diff.py): keyed added/removed/changed
classification with per-row changed-column lists."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.diff import (
    diff_summary, snapshot_diff)

OLD = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)]
NEW = [(1, "a", 10.0),          # unchanged
       (2, "B", 20.0),          # changed: name
       (3, "c", 30.0),          # changed: value NULL -> 30 (null-safe)
       (5, "e", 50.0)]          # added; key 4 removed
SCHEMA = "id long, name string, value double"


@pytest.fixture(scope="module")
def diff(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    return {r.id: r for r in
            snapshot_diff(old, new, ["id"]).collect()}


def test_classification(diff):
    assert diff[5].change == "added"
    assert diff[4].change == "removed"
    assert diff[2].change == "changed"
    assert diff[3].change == "changed"
    assert 1 not in diff  # unchanged excluded by default


def test_changed_columns(diff):
    assert diff[2].changed_columns == ["name"]
    assert diff[3].changed_columns == ["value"]
    assert diff[5].changed_columns == []
    assert diff[4].changed_columns == []


def test_include_unchanged(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    rows = {r.id: r for r in snapshot_diff(
        old, new, ["id"], include_unchanged=True).collect()}
    assert rows[1].change == "unchanged"
    assert len(rows) == 5


def test_explicit_compare_subset(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    rows = {r.id: r for r in snapshot_diff(
        old, new, ["id"], compare=["value"]).collect()}
    # name-only change (id=2) is invisible when comparing value only
    assert 2 not in rows
    assert rows[3].change == "changed"


def test_compare_column_missing_raises(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA).drop("value")
    with pytest.raises(ValueError, match="value"):
        snapshot_diff(old, new, ["id"], compare=["value"])


def test_evolved_column_not_compared_by_default(spark):
    """A column only one side has must not mark every row changed —
    schema evolution is manifest.schema_drift's concern."""
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA).withColumn(
        "extra", F.lit("x"))
    rows = {r.id: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert 1 not in rows and rows[2].changed_columns == ["name"]


def test_summary(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    s = {r.change: r.n_rows for r in
         diff_summary(snapshot_diff(old, new, ["id"])).collect()}
    assert s == {"added": 1, "removed": 1, "changed": 2}
