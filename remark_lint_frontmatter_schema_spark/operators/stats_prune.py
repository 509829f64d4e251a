"""Parquet-footer statistics pruning: prove constraints clean per FILE
from row-group min/max/null_count, and scan only the files the footers
cannot clear.

This is the move a 10^12-row validator makes before touching data: an
Iceberg manifest keeps per-file column bounds and null counts, so a
bounds-only ruleset (``sr_hz in [8000, 48000]``, ``dur_ms <= 30000``,
``required: [clip_id]``) is decided for most files by reading a few KB
of metadata instead of the file. The reference has the same shape at
its own scale: remark-lint skips files whose mtime/config pair is
unchanged rather than re-parsing every Markdown file. Here the skip
is *semantic* — the footer proves the constraint — not just temporal.

Soundness contract (each proof mirrors the validator's semantics in
``plans/compiler.py`` exactly):

* ``minimum``/``maximum``/``exclusiveMinimum``/``exclusiveMaximum`` are
  presence-guarded (NULL passes, ``compiler._present``), and parquet
  min/max stats exclude nulls — so ``stats.min >= m`` proves "no
  violation" regardless of nulls. **Integer physical types only**: the
  parquet spec drops NaN from float min/max while Spark orders NaN
  *greater than any double*, so a float column whose footer max is in
  bounds can still hold a NaN that violates ``maximum`` — float bounds
  are therefore never footer-decidable here. String columns are also
  out: the validator ``try_cast``s them to double (numeric order) while
  footer min/max are lexicographic.
* ``required`` on an existing top-level or struct-nested column fires
  on NULL (``compiler.py`` required branch), so ``null_count == 0``
  across all row groups proves it clean; a nested field's null_count
  counts parent-null rows too, which only over-approximates violations
  — still sound. ``required`` naming a column absent from the table is
  an every-row violation (static failure) and is never prunable.
* ``type`` that already matches the column's physical type compiles to
  a static pass (no runtime check) and is ignored; any other ``type``
  (e.g. string column declared integer => runtime try_cast probe) makes
  the ruleset scan-only for that column.
* **Every other keyword anywhere in the ruleset makes the whole table
  scan-only** (``PruneReport.skippable == False``): pattern/enum/format
  /items/...  cannot be decided from order statistics, and a file can
  only be skipped when *zero* undecided checks could fire in it. The
  report still carries the per-file proofs so a caller can see what a
  manifest-backed run would have saved.

A file the footers cannot clear is *suspect*, not guilty: it is scanned
by the ordinary one-projection validator and contributes exactly the
violations a full scan would have found. ``validate_with_stats_pruning``
therefore returns byte-identical violation rows to a full-table
``validate`` while reading only the suspect subset (asserted in
tests/test_stats_prune.py by comparing both paths).

Scale shape: the metadata pass is O(files) footer reads — on a real
lakehouse these bounds live in the Iceberg manifest and the "read the
footer" step is a catalog query; the per-file decision logic is
identical. The scan pass preserves hive partition columns via
``basePath`` so partition-valued constraints keep working (they are
scan-only by construction: partition columns never appear in file
footers).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..plans.compiler import compile_ruleset
from .validate import ValidationResult, validate

# keywords Ajv collects but never validates (compiler annotation set) —
# they generate no runtime check, so they never block pruning
_ANNOTATIONS = {
    "title", "description", "examples", "$comment", "default",
    "readOnly", "writeOnly", "deprecated", "definitions", "$defs",
    "$schema", "$id", "$bundled_from",
    "x-severity", "x-repair",
}

_BOUND_KEYWORDS = {
    # keyword -> (which stat, proof) — proof(stat_value, param) == True
    # means NO row in the chunk can violate the keyword
    "minimum": ("min", lambda s, m: s >= m),
    "exclusiveMinimum": ("min", lambda s, m: s > m),
    "maximum": ("max", lambda s, m: s <= m),
    "exclusiveMaximum": ("max", lambda s, m: s < m),
}


@dataclass
class FileDecision:
    path: str
    n_rows: int
    clean: bool                 # every decidable check proven violation-free
    unproven: list = field(default_factory=list)  # (column, keyword)


@dataclass
class PruneReport:
    decidable: list             # (dotted_column, keyword, param)
    scan_only: list             # (instance_path, keyword, why)
    decisions: list             # [FileDecision]

    @property
    def skippable(self) -> bool:
        """Clean files may be skipped only when NO check anywhere in the
        ruleset needs a scan — otherwise a "clean" file could still hold
        violations of the undecided checks."""
        return not self.scan_only

    def summary(self) -> dict:
        clean = [d for d in self.decisions if d.clean]
        return {
            "n_decidable": len(self.decidable),
            "n_scan_only": len(self.scan_only),
            "skippable": self.skippable,
            "n_files": len(self.decisions),
            "n_proven_clean": len(clean),
            "rows_proven_clean": sum(d.n_rows for d in clean),
        }


def _is_integer(t: pa.DataType) -> bool:
    return pa.types.is_integer(t)


def _type_statically_ok(json_type, t: pa.DataType) -> bool:
    """Mirror of compiler._type_check's static-pass arm: the declared
    JSON type is already guaranteed by the column's physical type, so
    the validator emits no runtime check."""
    types = json_type if isinstance(json_type, list) else [json_type]
    for jt in types:
        ok = {
            "integer": pa.types.is_integer,
            "number": lambda x: pa.types.is_integer(x)
            or pa.types.is_floating(x) or pa.types.is_decimal(x),
            "string": lambda x: pa.types.is_string(x)
            or pa.types.is_large_string(x),
            "boolean": pa.types.is_boolean,
            "array": lambda x: pa.types.is_list(x)
            or pa.types.is_large_list(x),
            "object": lambda x: pa.types.is_struct(x) or pa.types.is_map(x),
            "null": pa.types.is_null,
        }.get(jt)
        if ok is not None and ok(t):
            return True
    return False


def _resolve(arrow_schema: pa.Schema, dotted: str) -> pa.DataType | None:
    """Arrow type of a (possibly struct-nested) dotted column path."""
    parts = dotted.split(".")
    try:
        t = arrow_schema.field(parts[0]).type
    except KeyError:
        return None
    for p in parts[1:]:
        if not pa.types.is_struct(t):
            return None
        idx = t.get_field_index(p)
        if idx < 0:
            return None
        t = t.field(idx).type
    return t


def analyze_ruleset(schema: dict, arrow_schema: pa.Schema):
    """Split a bundled ruleset into footer-decidable proofs and
    scan-only checks. Returns ``(decidable, scan_only)`` where decidable
    entries are ``(dotted_column, keyword, param)`` and scan_only
    entries are ``(instance_path, keyword, why)``."""
    decidable: list = []
    scan_only: list = []

    def walk(node: dict, dotted: str, path: str) -> None:
        col_t = _resolve(arrow_schema, dotted) if dotted else None
        for kw, val in node.items():
            if kw in _ANNOTATIONS:
                continue
            if kw == "properties" and isinstance(val, dict):
                for pname, sub in val.items():
                    if not isinstance(sub, dict):
                        continue
                    child = f"{dotted}.{pname}" if dotted else pname
                    if _resolve(arrow_schema, child) is None:
                        # partition column (footers never see it) or a
                        # genuinely absent column — either way nothing
                        # in the footer speaks for it
                        if any(k not in _ANNOTATIONS for k in sub):
                            scan_only.append(
                                (f"{path}/{pname}", "properties",
                                 "column not in file footer"))
                        continue
                    walk(sub, child, f"{path}/{pname}")
                continue
            if kw == "allOf" and isinstance(val, list):
                for branch in val:
                    if isinstance(branch, dict):
                        walk(branch, dotted, path)
                continue
            if kw == "required" and isinstance(val, list):
                for pname in val:
                    child = f"{dotted}.{pname}" if dotted else str(pname)
                    if _resolve(arrow_schema, child) is None:
                        scan_only.append(
                            (f"{path}/{pname}", "required",
                             "column not in file footer"))
                    else:
                        decidable.append((child, "required", None))
                continue
            if kw in _BOUND_KEYWORDS:
                if (col_t is not None and _is_integer(col_t)
                        and isinstance(val, (int, float))
                        and not isinstance(val, bool)):
                    decidable.append((dotted, kw, val))
                else:
                    scan_only.append(
                        (path, kw,
                         "float/NaN or non-integer column: footer "
                         "min/max cannot order it the way Spark does"))
                continue
            if kw == "type":
                types = val if isinstance(val, list) else [val]
                if not dotted and "object" in types:
                    continue  # root: a row is always an object (compiler)
                if col_t is not None and _type_statically_ok(val, col_t):
                    continue  # compiles to a static pass, no runtime check
                scan_only.append((path, "type", "needs runtime probe"))
                continue
            # everything else — pattern/enum/format/items/anyOf/x-*…
            scan_only.append((path, kw, "not order-statistic decidable"))

    walk(schema, "", "")
    return decidable, scan_only


def _table_files(table_path: str) -> list:
    if os.path.isfile(table_path):
        return [table_path]
    out = []
    for root, _dirs, files in os.walk(table_path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _decide_file(path: str, decidable: list,
                 arrow_schema: pa.Schema,
                 pf: pq.ParquetFile | None = None) -> FileDecision:
    # one footer open serves both the stats and the schema — the
    # metadata pass IS the thing this module optimizes, don't read it
    # twice per file
    pf = pf or pq.ParquetFile(path)
    md = pf.metadata
    file_schema = pf.schema_arrow
    unproven: list = []
    # column-chunk index by dotted path (stable across row groups)
    idx: dict = {}
    if md.num_row_groups:
        rg0 = md.row_group(0)
        idx = {rg0.column(j).path_in_schema: j
               for j in range(rg0.num_columns)}
    for dotted, kw, param in decidable:
        # schema drift between files: the analysis ran against another
        # file's types — re-verify before trusting this footer
        if _resolve(file_schema, dotted) != _resolve(arrow_schema, dotted):
            unproven.append((dotted, kw))
            continue
        j = idx.get(dotted)
        if j is None:
            unproven.append((dotted, kw))
            continue
        ok = True
        for g in range(md.num_row_groups):
            s = md.row_group(g).column(j).statistics
            if s is None:
                ok = False
                break
            if kw == "required":
                if not (s.has_null_count and s.null_count == 0):
                    ok = False
                    break
            else:
                stat_name, proof = _BOUND_KEYWORDS[kw]
                if not s.has_min_max:
                    ok = False
                    break
                if not proof(getattr(s, stat_name), param):
                    ok = False
                    break
        if not ok:
            unproven.append((dotted, kw))
    return FileDecision(path=path, n_rows=md.num_rows,
                        clean=not unproven, unproven=unproven)


def decide_from_stats(path: str, n_rows: int, stats: dict,
                      decidable: list) -> FileDecision:
    """Catalog-stats twin of :func:`_decide_file`: the SAME proof logic
    over column statistics supplied by a table format's metadata layer
    instead of a parquet footer open. ``stats`` maps dotted column path
    -> {"min": v, "max": v, "null_count": n} (Iceberg manifests carry
    these as lower_bounds / upper_bounds / null_value_counts per data
    file). A column absent from ``stats``, or a stats dict missing the
    field a proof needs, leaves that check unproven — never assumed
    clean. Decisions are format-independent by construction: the
    Iceberg source path and the parquet footer path are asserted
    byte-identical in tests."""
    unproven: list = []
    for dotted, kw, param in decidable:
        s = stats.get(dotted)
        if s is None:
            unproven.append((dotted, kw))
            continue
        if kw == "required":
            if s.get("null_count") != 0:
                unproven.append((dotted, kw))
            continue
        stat_name, proof = _BOUND_KEYWORDS[kw]
        v = s.get(stat_name)
        if v is None or not proof(v, param):
            unproven.append((dotted, kw))
    return FileDecision(path=path, n_rows=n_rows,
                        clean=not unproven, unproven=unproven)


def prune_files(table_path: str, schema: dict, *,
                spark: SparkSession | None = None,
                distribute_above: int = 64) -> PruneReport:
    """Footer-only pass over every parquet file under ``table_path``:
    which files are provably clean for the ruleset's decidable checks,
    and which checks need a scan no footer can replace.

    Pass ``spark`` to DISTRIBUTE the footer walk: the per-file decision
    is a pure function of (path, proofs, schema), so above
    ``distribute_above`` files it fans out as an RDD map — a serial
    driver loop over a million footers would make the metadata pass the
    new bottleneck of the thing it optimizes. (On Iceberg the stats live
    in the manifest and this whole walk is a catalog query; the decision
    logic is identical.) Decisions are byte-identical either way,
    asserted in tests."""
    files = _table_files(table_path)
    if not files:
        return PruneReport([], [], [])
    pf0 = pq.ParquetFile(files[0])
    arrow_schema = pf0.schema_arrow
    decidable, scan_only = analyze_ruleset(schema, arrow_schema)
    if spark is not None and len(files) > distribute_above:
        schema_bytes = arrow_schema.serialize().to_pybytes()

        def _decide_part(paths):
            import pyarrow as _pa
            ref = _pa.ipc.read_schema(_pa.py_buffer(schema_bytes))
            for p in paths:
                yield _decide_file(p, decidable, ref)

        sc = spark.sparkContext
        n_slices = max(1, min(len(files) // 16,
                              sc.defaultParallelism * 2))
        decisions = sorted(
            sc.parallelize(files, n_slices).mapPartitions(
                _decide_part).collect(),
            key=lambda d: d.path)
    else:
        decisions = [_decide_file(files[0], decidable, arrow_schema,
                                  pf=pf0)]
        decisions += [_decide_file(p, decidable, arrow_schema)
                      for p in files[1:]]
    return PruneReport(decidable, scan_only, decisions)


def validate_with_stats_pruning(
    spark: SparkSession,
    table_path: str,
    schema: dict,
    *,
    row_id: str,
    name: str = "ruleset",
    partition_col: str | None = None,
    run_id: str = "run_0",
    extra_checks: dict | None = None,
    options: dict | None = None,
) -> dict:
    """Validate ``table_path``, skipping every file the footers prove
    clean (only legal when the whole ruleset is footer-decidable —
    ``PruneReport.skippable``). Returns the same violation rows a full
    scan produces, plus the prune accounting::

        {"result": ValidationResult, "report": PruneReport,
         "scanned_files": [...], "skipped_files": [...],
         "rows_skipped": int}

    Skipped files still count in the caller's books: ``rows_skipped``
    rows were proven violation-free by metadata alone (their per-file
    row counts also come from the footers — zero data read).
    """
    report = prune_files(table_path, schema, spark=spark)
    all_files = [d.path for d in report.decisions]
    if report.skippable:
        scanned = [d.path for d in report.decisions if not d.clean]
        skipped = [d.path for d in report.decisions if d.clean]
    else:
        scanned, skipped = all_files, []

    # basePath preserves hive partition columns when reading a file
    # subset out of a partitioned directory; a single-file "table" has
    # no partition dirs (and Spark rejects a file-valued basePath)
    base = (spark.read.option("basePath", table_path)
            if os.path.isdir(table_path) else spark.read)
    full_schema = base.parquet(table_path).schema
    compiled = compile_ruleset(schema, full_schema, name=name,
                               extra_checks=extra_checks, options=options)
    if scanned:
        df = base.parquet(*scanned)
    else:
        # nothing survives pruning: an empty frame with the table schema
        # keeps the violation/verdict schemas identical to the scan path
        df = base.parquet(table_path).limit(0)
    result: ValidationResult = validate(
        df, compiled, row_id=row_id, partition_col=partition_col,
        run_id=run_id)

    # verdicts must account for EVERY row, including footer-proven files
    # the scan never read — otherwise a fully-proven partition vanishes
    # from the verdict relation and row counts stop reconciling against
    # the source. Proven files contribute footer-derived rows (zero
    # violations by proof); union + re-aggregate merges them with the
    # scanned residue's verdicts.
    skipped_set = set(skipped)
    proven = [d for d in report.decisions if d.path in skipped_set]
    if proven:
        marker = f"{partition_col}=" if partition_col else None

        def _part_of(path: str) -> str:
            if marker:
                for seg in path.split(os.sep):
                    if seg.startswith(marker):
                        return seg[len(marker):]
            return "all"

        spark_s = df.sparkSession
        extra = spark_s.createDataFrame(
            [(_part_of(d.path), compiled.name, d.n_rows, 0, 0, 0, 0,
              True, run_id) for d in proven],
            "partition_id string, ruleset_id string, n_rows long, "
            "n_violations long, n_failed_rows long, n_errors long, "
            "n_warnings long, passed boolean, run_id string")
        verdicts = (result.verdicts.unionByName(extra)
                    .groupBy("partition_id", "ruleset_id", "run_id")
                    .agg(F.sum("n_rows").alias("n_rows"),
                         F.sum("n_violations").alias("n_violations"),
                         F.sum("n_failed_rows").alias("n_failed_rows"),
                         F.sum("n_errors").alias("n_errors"),
                         F.sum("n_warnings").alias("n_warnings"))
                    .withColumn("passed", F.col("n_failed_rows") == 0)
                    .select(*result.verdicts.columns))
        result = ValidationResult(
            violations=result.violations, verdicts=verdicts,
            annotated=result.annotated, compiled=result.compiled)
    return {
        "result": result,
        "report": report,
        "scanned_files": scanned,
        "skipped_files": skipped,
        "rows_skipped": sum(d.n_rows for d in proven),
    }


def footer_profile(spark: SparkSession, table_path: str,
                   columns: list | None = None) -> "object":
    """Metadata-only column profile: ``(column, n_rows, null_count,
    min, max)`` per column, aggregated across every file's row-group
    statistics — ZERO data read. The 100 TB move: global min = min of
    chunk minima, null_count = sum of chunk null_counts, so a profile
    that would scan terabytes is a footer walk (on Iceberg, a manifest
    query).

    Integer columns only, same soundness rule as the prune proofs
    (float stats drop NaN; string min/max are writer-truncatable) —
    which also makes the result EXACTLY equal to a full-scan
    min/max/count aggregate, asserted by the driver oracle
    ``footer_profile_lineitem``. Columns whose stats are absent in any
    chunk (or non-integer) are omitted rather than guessed. Returns a
    Spark DataFrame so it composes with the relational surface."""
    files = _table_files(table_path)
    acc: dict = {}
    for path in files:
        pf = pq.ParquetFile(path)
        md, schema = pf.metadata, pf.schema_arrow
        idx = {}
        if md.num_row_groups:
            rg0 = md.row_group(0)
            idx = {rg0.column(j).path_in_schema: j
                   for j in range(rg0.num_columns)}
        for name, j in idx.items():
            if columns is not None and name not in columns:
                continue
            t = _resolve(schema, name)
            if t is None or not _is_integer(t):
                continue
            for g in range(md.num_row_groups):
                c = md.row_group(g).column(j)
                s = c.statistics
                if (s is None or not s.has_min_max
                        or not s.has_null_count):
                    acc[name] = None  # incomplete stats: omit, not guess
                    break
                cur = acc.get(name)
                if cur is None and name in acc:
                    break  # already marked incomplete
                n = c.num_values  # parquet num_values INCLUDES nulls
                if cur is None:
                    acc[name] = [n, s.null_count, s.min, s.max]
                else:
                    cur[0] += n
                    cur[1] += s.null_count
                    cur[2] = min(cur[2], s.min)
                    cur[3] = max(cur[3], s.max)
    rows = [(k, v[0], v[1], int(v[2]), int(v[3]))
            for k, v in sorted(acc.items()) if v is not None]
    return spark.createDataFrame(
        rows, "column string, n_rows long, null_count long, "
              "min_value long, max_value long")
