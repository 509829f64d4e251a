"""TableSource seam: the IcebergSource maps catalog metadata (snapshot
ids, partition file lists, per-file column bounds) onto the SAME resume
and stats-pruning machinery the parquet path uses — proven by running
run_with_resume and the prune decisions against a fake catalog built
from the same data and asserting identical behavior.

The fake catalog is the TEST HARNESS for the duck-typed catalog
protocol: it derives its "manifest" from parquet metadata the way a
real Iceberg catalog derives it from manifest avro files; IcebergSource
itself only ever consumes the protocol."""

import os

import pyarrow.parquet as pq
import pytest

from remark_lint_frontmatter_schema_spark import compile_ruleset
from remark_lint_frontmatter_schema_spark.manifest import (
    Manifest, run_with_resume)
from remark_lint_frontmatter_schema_spark.operators.stats_prune import (
    prune_files)
from remark_lint_frontmatter_schema_spark.sources.table import (
    IcebergSource, ParquetSource)


class FakeCatalog:
    """Catalog protocol implementation over a partitioned-parquet dir.
    Column bounds come from parquet metadata at snapshot time —
    structurally what an Iceberg manifest stores per data file."""

    def __init__(self, root: str):
        self.root = root
        self._snap = 1
        self._seq = {}      # path -> sequence number (bumped on refresh)
        self.refresh()

    def refresh(self):
        """New table snapshot: files whose (size, mtime) changed get a
        higher sequence number, as a real commit would assign."""
        self._snap += 1
        for dirpath, _dirs, files in os.walk(self.root):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, f)
                st = os.stat(full)
                key = (full, st.st_size, st.st_mtime_ns)
                if key not in self._seq:
                    self._seq[key] = self._snap

    def current_snapshot_id(self, identifier):
        return self._snap

    def partitions(self, identifier, partition_col):
        prefix = f"{partition_col}="
        return [d[len(prefix):] for d in os.listdir(self.root)
                if d.startswith(prefix)]

    def partition_files(self, identifier, partition_col, value):
        pdir = os.path.join(self.root, f"{partition_col}={value}")
        out = []
        for dirpath, _dirs, files in os.walk(pdir):
            for f in sorted(files):
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, f)
                st = os.stat(full)
                md = pq.ParquetFile(full).metadata
                stats = {}
                if md.num_row_groups:
                    rg0 = md.row_group(0)
                    for j in range(rg0.num_columns):
                        dotted = rg0.column(j).path_in_schema
                        mins, maxs, nulls = [], [], 0
                        ok = True
                        for g in range(md.num_row_groups):
                            s = md.row_group(g).column(j).statistics
                            if s is None or not s.has_min_max \
                                    or not s.has_null_count:
                                ok = False
                                break
                            mins.append(s.min)
                            maxs.append(s.max)
                            nulls += s.null_count
                        if ok and mins:
                            stats[dotted] = {"min": min(mins),
                                             "max": max(maxs),
                                             "null_count": nulls}
                out.append({"path": full, "size": st.st_size,
                            "sequence": self._seq.get(
                                (full, st.st_size, st.st_mtime_ns), 0),
                            "n_rows": md.num_rows, "stats": stats})
        return out

    def arrow_schema(self, identifier):
        for dirpath, _dirs, files in os.walk(self.root):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return pq.ParquetFile(
                        os.path.join(dirpath, f)).schema_arrow
        raise FileNotFoundError(self.root)

    def read(self, spark, identifier):
        return spark.read.parquet(self.root)


RS = {"type": "object", "required": ["id"],
      "properties": {"v": {"type": "integer", "minimum": 0,
                           "maximum": 100}}}


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 60), (3, "b", 7), (4, "b", 250)],
        "id long, part string, v long")
    path = str(tmp_path / "t")
    df.write.partitionBy("part").parquet(path)
    return path


def _resume(spark, table, mf, source, **kw):
    compiled = compile_ruleset(RS, spark.read.parquet(table).schema)
    return run_with_resume(
        spark, None, partition_col="part", compiled=compiled,
        row_id="id", manifest_path=mf, source=source, **kw)


def test_resume_parity_with_parquet_source(spark, table, tmp_path):
    cat = FakeCatalog(table)
    ice = IcebergSource("db.t", catalog=cat)
    parq = ParquetSource(table)
    out_p = _resume(spark, table, str(tmp_path / "mp.json"), parq,
                    snapshot_id="s1")
    out_i = _resume(spark, table, str(tmp_path / "mi.json"), ice,
                    snapshot_id=ice.snapshot_id())
    assert sorted(out_p["validated"]) == sorted(out_i["validated"]) == \
        ["a", "b"]
    # same snapshot again: everything skips, identically
    again = _resume(spark, table, str(tmp_path / "mi.json"), ice,
                    snapshot_id=ice.snapshot_id())
    assert again["validated"] == [] and sorted(again["skipped"]) == ["a", "b"]
    # a new catalog snapshot invalidates table-level resume
    cat._snap += 1
    fresh = _resume(spark, table, str(tmp_path / "mi.json"), ice,
                    snapshot_id=ice.snapshot_id())
    assert sorted(fresh["validated"]) == ["a", "b"]


def test_fingerprint_resume_revalidates_only_changed_partition(
        spark, table, tmp_path):
    cat = FakeCatalog(table)
    ice = IcebergSource("db.t", catalog=cat)
    mf = str(tmp_path / "m.json")
    out1 = _resume(spark, table, mf, ice, per_partition_snapshots=True)
    assert sorted(out1["validated"]) == ["a", "b"]
    # rewrite ONE partition; a new commit assigns its files a higher
    # sequence number -> new manifest-entry fingerprint for 'b' only
    spark.createDataFrame([(5, 9)], "id long, v long") \
        .write.mode("overwrite").parquet(os.path.join(table, "part=b"))
    cat.refresh()
    out2 = _resume(spark, table, mf, ice, per_partition_snapshots=True)
    assert out2["validated"] == ["b"] and out2["skipped"] == ["a"]


def test_prune_decisions_match_parquet_footers(spark, table, tmp_path):
    """decide_from_stats over catalog bounds == _decide_file over parquet
    footers: same clean flags, same row counts, per partition."""
    cat = FakeCatalog(table)
    ice = IcebergSource("db.t", catalog=cat)
    parq = ParquetSource(table)
    for part in ("a", "b"):
        ri = ice.prune_report("part", part, RS)
        rp = parq.prune_report("part", part, RS)
        assert sorted(ri.decidable) == sorted(rp.decidable)
        assert sorted(ri.scan_only) == sorted(rp.scan_only)
        assert [(os.path.basename(d.path), d.n_rows, d.clean)
                for d in ri.decisions] == \
               [(os.path.basename(d.path), d.n_rows, d.clean)
                for d in rp.decisions]
    # partition a is provably clean (v in [5, 60]), b is not (250 > 100)
    assert all(d.clean for d in ice.prune_report("part", "a", RS).decisions)
    assert not all(d.clean
                   for d in ice.prune_report("part", "b", RS).decisions)


def test_catalog_stats_prove_partitions_without_scan(spark, table,
                                                     tmp_path):
    """The footer-proven resume layer runs off catalog bounds: the clean
    partition is recorded as validated with proven_by metrics and never
    scanned."""
    cat = FakeCatalog(table)
    ice = IcebergSource("db.t", catalog=cat)
    mf = str(tmp_path / "m.json")
    out = _resume(spark, table, mf, ice, ruleset_doc=RS,
                  snapshot_id=ice.snapshot_id())
    assert out["proven"] == ["a"]
    assert sorted(out["validated"]) == ["a", "b"]
    rec = [e for e in Manifest.load(mf).entries.values()
           if e.get("metrics", {}).get("proven_by") == "footer-stats"]
    assert len(rec) == 1 and rec[0]["metrics"]["n_violations"] == 0


def test_iceberg_source_requires_catalog():
    with pytest.raises(ValueError, match="catalog"):
        IcebergSource("db.t")
