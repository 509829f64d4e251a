"""Parquet-footer statistics pruning: files proven clean by row-group
min/max/null_count are skipped, suspect files are scanned, and the
pruned path's violations are byte-identical to a full scan."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from remark_lint_frontmatter_schema_spark.operators.stats_prune import (
    analyze_ruleset,
    prune_files,
    validate_with_stats_pruning,
)
from remark_lint_frontmatter_schema_spark.operators.validate import validate
from remark_lint_frontmatter_schema_spark.plans.compiler import compile_ruleset

BOUNDS_RULESET = {
    "type": "object",
    "required": ["clip_id"],
    "properties": {
        "clip_id": {"type": "string"},
        "sr_hz": {"type": "integer", "minimum": 8000, "maximum": 48000},
        "dur_ms": {"type": "integer", "exclusiveMinimum": 0,
                   "maximum": 30000},
    },
}


def _write(path, rows):
    tbl = pa.table({
        "clip_id": pa.array([r[0] for r in rows], pa.string()),
        "sr_hz": pa.array([r[1] for r in rows], pa.int32()),
        "dur_ms": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    """Three files: one provably clean, one with an out-of-range value,
    one with a NULL in the required column."""
    d = tmp_path_factory.mktemp("prunetab")
    _write(d / "clean.parquet",
           [(f"c{i}", 16000, 100 + i) for i in range(50)])
    _write(d / "range.parquet",
           [("r0", 96000, 100), ("r1", 16000, 40000),
            ("r2", 22050, 250)])
    _write(d / "nulls.parquet",
           [("n0", 8000, 10), (None, 44100, 20)])
    return str(d)


def test_analyze_splits_decidable_and_scan_only(table):
    arrow_schema = pq.ParquetFile(
        os.path.join(table, "clean.parquet")).schema_arrow
    decidable, scan_only = analyze_ruleset(BOUNDS_RULESET, arrow_schema)
    assert sorted(decidable) == [
        ("clip_id", "required", None),
        ("dur_ms", "exclusiveMinimum", 0),
        ("dur_ms", "maximum", 30000),
        ("sr_hz", "maximum", 48000),
        ("sr_hz", "minimum", 8000),
    ]
    # every type keyword matches the physical types -> static pass
    assert scan_only == []


def test_pattern_keyword_blocks_skipping(table):
    arrow_schema = pq.ParquetFile(
        os.path.join(table, "clean.parquet")).schema_arrow
    ruleset = {"properties": {
        "clip_id": {"pattern": "^c"},
        "sr_hz": {"minimum": 8000},
    }}
    decidable, scan_only = analyze_ruleset(ruleset, arrow_schema)
    assert ("sr_hz", "minimum", 8000) in decidable
    assert any(kw == "pattern" for _p, kw, _w in scan_only)
    report = prune_files(table, ruleset)
    assert not report.skippable


def test_float_bounds_are_never_decidable(tmp_path):
    # parquet drops NaN from float min/max while Spark sorts NaN above
    # every double — a float bound must stay scan-only
    p = tmp_path / "f.parquet"
    pq.write_table(pa.table({"x": pa.array([1.0, 2.0], pa.float64())}), p)
    arrow_schema = pq.ParquetFile(p).schema_arrow
    decidable, scan_only = analyze_ruleset(
        {"properties": {"x": {"maximum": 10}}}, arrow_schema)
    assert decidable == []
    assert any(kw == "maximum" for _p, kw, _w in scan_only)


def test_prune_decisions(table):
    report = prune_files(table, BOUNDS_RULESET)
    assert report.skippable
    by_name = {os.path.basename(d.path): d for d in report.decisions}
    assert by_name["clean.parquet"].clean
    assert by_name["clean.parquet"].n_rows == 50
    assert not by_name["range.parquet"].clean
    assert {(c, k) for c, k in by_name["range.parquet"].unproven} == {
        ("sr_hz", "maximum"), ("dur_ms", "maximum")}
    assert not by_name["nulls.parquet"].clean
    assert by_name["nulls.parquet"].unproven == [("clip_id", "required")]


def test_pruned_violations_match_full_scan(spark, table):
    out = validate_with_stats_pruning(
        spark, table, BOUNDS_RULESET, row_id="clip_id", name="bounds")
    assert len(out["skipped_files"]) == 1
    assert os.path.basename(out["skipped_files"][0]) == "clean.parquet"
    assert out["rows_skipped"] == 50
    assert len(out["scanned_files"]) == 2

    compiled = compile_ruleset(
        BOUNDS_RULESET, spark.read.parquet(table).schema, name="bounds")
    full = validate(spark.read.parquet(table), compiled, row_id="clip_id")

    key = ["row_id", "instance_path", "schema_path", "message"]
    none_safe = lambda t: tuple((x is None, x or "") for x in t)  # noqa: E731
    pruned_rows = sorted(
        (tuple(r) for r in out["result"].violations.select(*key).collect()),
        key=none_safe)
    full_rows = sorted(
        (tuple(r) for r in full.violations.select(*key).collect()),
        key=none_safe)
    assert pruned_rows == full_rows
    # r0 sr_hz>48000, r1 dur_ms>30000, and the required-clip_id row
    # (whose row_id is NULL, exercising the None-safe compare)
    assert len(pruned_rows) == 3
    msgs = {m for *_k, m in pruned_rows}
    assert any("required property 'clip_id'" in m for m in msgs)

    # the scan plan must only read the suspect files
    scanned = set(out["result"].annotated.inputFiles())
    assert not any(f.endswith("clean.parquet") for f in scanned)

    # verdicts account for EVERY row, including the footer-proven file
    # the scan never touched (50 proven + 3 + 2 scanned)
    v = out["result"].verdicts.collect()
    assert len(v) == 1
    assert (v[0].n_rows, v[0].n_violations, v[0].passed) == (55, 3, False)


def test_fully_proven_table_still_yields_verdicts(spark, tmp_path):
    t = tmp_path / "allclean"
    t.mkdir()
    pq.write_table(pa.table({
        "clip_id": pa.array(["a", "b"], pa.string()),
        "sr_hz": pa.array([16000, 22050], pa.int32()),
        "dur_ms": pa.array([10, 20], pa.int32()),
    }), t / "f.parquet")
    out = validate_with_stats_pruning(
        spark, str(t), BOUNDS_RULESET, row_id="clip_id", name="bounds")
    assert out["scanned_files"] == [] and out["rows_skipped"] == 2
    v = out["result"].verdicts.collect()
    assert len(v) == 1
    assert (v[0].n_rows, v[0].n_violations, bool(v[0].passed)) == (2, 0, True)
    assert out["result"].violations.count() == 0


def test_nulls_in_bounded_column_still_provably_clean(tmp_path):
    # NULL passes presence-guarded bounds; min/max stats exclude nulls,
    # so a null-bearing in-bounds file is still clean for bounds-only
    p = tmp_path / "t"
    p.mkdir()
    pq.write_table(pa.table({
        "id": pa.array(["a", "b"], pa.string()),
        "v": pa.array([5, None], pa.int64()),
    }), p / "part.parquet")
    report = prune_files(
        str(p), {"properties": {"v": {"minimum": 0, "maximum": 10}}})
    assert report.skippable
    assert report.decisions[0].clean


def test_unskippable_ruleset_scans_everything(spark, table):
    ruleset = {
        "required": ["clip_id"],
        "properties": {
            "clip_id": {"pattern": "^[cnr]"},
            "sr_hz": {"minimum": 8000, "maximum": 48000},
        },
    }
    out = validate_with_stats_pruning(
        spark, table, ruleset, row_id="clip_id", name="mixed")
    assert out["skipped_files"] == []
    assert len(out["scanned_files"]) == 3
    # still correct end-to-end
    assert out["result"].violations.count() == 2  # 96000 + NULL clip_id


def test_required_on_missing_column_is_scan_only(table):
    report = prune_files(
        table, {"required": ["missing_col"],
                "properties": {"sr_hz": {"minimum": 0}}})
    assert not report.skippable
    assert any(kw == "required" and "not in file footer" in why
               for _p, kw, why in report.scan_only)


def test_footer_profile_matches_scan(spark, table, tmp_path):
    from remark_lint_frontmatter_schema_spark.operators.stats_prune import (
        footer_profile,
    )
    prof = {r.column: r for r in footer_profile(spark, table).collect()}
    # integer columns only — clip_id (string) omitted, not guessed
    assert set(prof) == {"sr_hz", "dur_ms"}
    import pyspark.sql.functions as f
    full = spark.read.parquet(table).agg(
        f.count(f.lit(1)).alias("n"),
        f.sum(f.col("sr_hz").isNull().cast("long")).alias("nn"),
        f.min("sr_hz").alias("mn"), f.max("sr_hz").alias("mx")).collect()[0]
    r = prof["sr_hz"]
    assert (r.n_rows, r.null_count, r.min_value, r.max_value) == \
        (full.n, full.nn, full.mn, full.mx)

    # null-bearing column: counts reconcile exactly
    p2 = tmp_path / "np"
    p2.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq2
    pq2.write_table(pa.table({
        "v": pa.array([1, None, 3, None], pa.int64())}), p2 / "a.parquet")
    pq2.write_table(pa.table({
        "v": pa.array([7, 8], pa.int64())}), p2 / "b.parquet")
    r2 = footer_profile(spark, str(p2)).collect()[0]
    assert (r2.n_rows, r2.null_count, r2.min_value, r2.max_value) \
        == (6, 2, 1, 8)


def test_distributed_prune_matches_serial(spark, tmp_path):
    """The RDD-distributed footer walk must produce byte-identical
    decisions to the serial driver loop (pure function of path+proofs)."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(80):
        bad = i % 7 == 0
        _write(d / f"f{i:03d}.parquet",
               [(f"c{i}", 96000 if bad else 16000, 100)])
    ruleset = {"required": ["clip_id"],
               "properties": {"sr_hz": {"minimum": 8000, "maximum": 48000}}}
    serial = prune_files(str(d), ruleset)
    dist = prune_files(str(d), ruleset, spark=spark, distribute_above=10)
    assert [(x.path, x.n_rows, x.clean, x.unproven)
            for x in serial.decisions] == \
           [(x.path, x.n_rows, x.clean, x.unproven)
            for x in dist.decisions]
    assert sum(not x.clean for x in dist.decisions) == 12  # ceil(80/7)
