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


def test_catalog_contract_enumerates_missing_methods():
    """Round 5 (VERDICT #7): IcebergSource enforces the exact catalog
    attribute set at construction — a wrapper that drifts (renamed or
    mis-signatured method) fails loudly with the problem named."""
    from remark_lint_frontmatter_schema_spark.sources.table import (
        CATALOG_PROTOCOL, check_catalog_contract)

    assert set(CATALOG_PROTOCOL) == {
        "current_snapshot_id", "partitions", "partition_files",
        "arrow_schema"}

    class Empty:
        pass

    problems = check_catalog_contract(Empty())
    assert len(problems) == 4
    with pytest.raises(ValueError, match="partition_files"):
        IcebergSource("db.t", catalog=Empty())

    class WrongArity:
        def current_snapshot_id(self):          # drops identifier
            return 1

        def partitions(self, identifier, partition_col):
            return []

        def partition_files(self, identifier, partition_col, value):
            return []

        def arrow_schema(self, identifier):
            return None

    problems = check_catalog_contract(WrongArity())
    assert problems and "current_snapshot_id" in problems[0]

    class Conforming(WrongArity):
        def current_snapshot_id(self, identifier):
            return 1

    assert check_catalog_contract(Conforming()) == []
    IcebergSource("db.t", catalog=Conforming())    # constructs


def _pyiceberg_object_graph(log):
    """A recorded object graph shaped 1:1 after pyiceberg's PUBLIC
    interface (Catalog.load_table -> Table; Table.current_snapshot()
    .snapshot_id; Table.scan().plan_files() -> FileScanTask.file with
    DataFile.file_path/file_size_in_bytes/record_count/partition/
    lower_bounds/upper_bounds/null_value_counts; Table.schema().fields
    with field_id/name/field_type + .as_arrow()). Every access appends
    to ``log`` — the protocol transcript."""
    import pyarrow as pa

    class Rec:
        def __init__(self, rec_name, **attrs):
            object.__setattr__(self, "_name", rec_name)
            object.__setattr__(self, "_attrs", attrs)

        def __getattr__(self, item):
            attrs = object.__getattribute__(self, "_attrs")
            if item not in attrs:
                raise AttributeError(
                    f"{object.__getattribute__(self, '_name')}.{item}")
            log.append(f"{object.__getattribute__(self, '_name')}.{item}")
            return attrs[item]

    def datafile(path, part, vmin, vmax, nulls, n):
        partition = Rec("Record", part_date=part)
        return Rec("DataFile", file_path=path, file_size_in_bytes=1024,
                   record_count=n, partition=partition,
                   lower_bounds={2: vmin}, upper_bounds={2: vmax},
                   null_value_counts={1: nulls, 2: 0})

    tasks = [Rec("FileScanTask", file=datafile(
                 "s3://bucket/t/data/a-uuid1.parquet", "2026-01-01",
                 b"\x05\x00\x00\x00", b"\x40\x00\x00\x00", 0, 100)),
             Rec("FileScanTask", file=datafile(
                 "s3://bucket/t/data/b-uuid2.parquet", "2026-01-02",
                 b"\x00\x00\x00\x00", b"\x90\x00\x00\x00", 3, 50))]
    scan = Rec("DataScan", plan_files=lambda: list(tasks))
    fields = [Rec("NestedField", field_id=1, name="id",
                  field_type="string"),
              Rec("NestedField", field_id=2, name="v",
                  field_type="int")]
    schema = Rec("Schema", fields=fields,
                 as_arrow=lambda: pa.schema([("id", pa.string()),
                                             ("v", pa.int32())]))
    snapshot = Rec("Snapshot", snapshot_id=4242)
    table = Rec("Table",
                current_snapshot=lambda: snapshot,
                scan=lambda: scan,
                schema=lambda: schema)
    catalog = Rec("Catalog", load_table=lambda ident: table)
    return catalog


def test_pyiceberg_adapter_protocol_transcript(monkeypatch):
    """Drive PyIcebergCatalog against the recorded pyiceberg-shaped
    graph and pin the EXACT attribute-access transcript: any drift in
    the adapter's use of the pyiceberg API (renamed attribute, new
    call) changes the transcript and fails here."""
    import sys
    import types

    from remark_lint_frontmatter_schema_spark.sources.table import (
        PyIcebergCatalog, check_catalog_contract)

    # stand-in decoder with pyiceberg.conversions' public signature
    conv = types.ModuleType("pyiceberg.conversions")
    conv.from_bytes = lambda ftype, raw: int.from_bytes(raw, "little")
    pkg = types.ModuleType("pyiceberg")
    pkg.conversions = conv
    monkeypatch.setitem(sys.modules, "pyiceberg", pkg)
    monkeypatch.setitem(sys.modules, "pyiceberg.conversions", conv)

    log = []
    adapter = PyIcebergCatalog(_pyiceberg_object_graph(log))
    assert check_catalog_contract(adapter) == []
    src = IcebergSource("db.clips", catalog=adapter)

    assert src.snapshot_id() == "snap_4242"
    assert src.partitions("part_date") == ["2026-01-01", "2026-01-02"]
    files = adapter.partition_files("db.clips", "part_date",
                                    "2026-01-01")
    assert files == [{
        "path": "s3://bucket/t/data/a-uuid1.parquet", "size": 1024,
        "n_rows": 100,
        "stats": {"id": {"null_count": 0},
                  "v": {"null_count": 0, "min": 5, "max": 64}}}]
    fp1 = src.partition_fingerprint("part_date", "2026-01-01")
    fp2 = src.partition_fingerprint("part_date", "2026-01-02")
    assert fp1.startswith("fp_") and fp1 != fp2
    assert [f.name for f in adapter.arrow_schema("db.clips")] \
        == ["id", "v"]

    # the pinned transcript: exactly these pyiceberg API touchpoints,
    # with the table loaded once and cached — any new/renamed access
    # in the adapter changes the set and fails here
    assert log[0] == "Catalog.load_table"
    assert log.count("Catalog.load_table") == 1
    assert set(log[1:]) == {
        "Table.current_snapshot", "Snapshot.snapshot_id",
        "Table.scan", "DataScan.plan_files",
        "FileScanTask.file", "DataFile.partition", "Record.part_date",
        "Table.schema", "Schema.fields",
        "NestedField.field_id", "NestedField.name",
        "NestedField.field_type",
        "DataFile.file_path", "DataFile.file_size_in_bytes",
        "DataFile.record_count", "DataFile.lower_bounds",
        "DataFile.upper_bounds", "DataFile.null_value_counts",
        "Schema.as_arrow",
    }


def test_pyiceberg_adapter_prune_report_end_to_end(monkeypatch, spark):
    """The adapter's decoded manifest bounds feed the SAME prune logic
    as parquet footers: a file whose bounds prove the ruleset lands
    clean; one with nulls in a required column stays unproven."""
    import sys
    import types

    from remark_lint_frontmatter_schema_spark.sources.table import (
        PyIcebergCatalog)

    conv = types.ModuleType("pyiceberg.conversions")
    conv.from_bytes = lambda ftype, raw: int.from_bytes(raw, "little")
    pkg = types.ModuleType("pyiceberg")
    pkg.conversions = conv
    monkeypatch.setitem(sys.modules, "pyiceberg", pkg)
    monkeypatch.setitem(sys.modules, "pyiceberg.conversions", conv)

    log = []
    src = IcebergSource(
        "db.clips", catalog=PyIcebergCatalog(_pyiceberg_object_graph(log)))
    rep1 = src.prune_report("part_date", "2026-01-01", RS)
    assert [d.clean for d in rep1.decisions] == [True]
    rep2 = src.prune_report("part_date", "2026-01-02", RS)
    # file b: id has 3 nulls (required unproven) and v max 144 > 100
    assert [d.clean for d in rep2.decisions] == [False]
    kws = {kw for _, kw in rep2.decisions[0].unproven}
    assert kws == {"required", "maximum"}
