"""TableSource: where the engine reads tables, snapshot ids, partition
lists and file statistics from.

The north-star target is an Iceberg table (the engine-side analog of the
reference reading the frontmatter where it lives, index.ts:278-282); the
sandbox has no Iceberg runtime jar, so the engine's resume / snapshot /
footer-pruning machinery was built against partitioned parquet with
content fingerprints standing in for snapshot ids. This module makes
that substitution an explicit, swappable seam:

* :class:`ParquetSource` — the default; wraps exactly the path-based
  behavior ``manifest.run_with_resume`` always had (directory partition
  listing, (path, size, mtime) fingerprints, parquet-footer pruning).
* :class:`IcebergSource` — maps the same protocol onto an Iceberg
  catalog: ``current_snapshot_id`` keys the resume manifest, the
  partition's manifest-entry file list (path, size, sequence number)
  is its fingerprint, and the manifest's per-file column bounds feed
  the SAME prune-decision logic as parquet footers
  (operators/stats_prune.decide_from_stats) — on Iceberg the "footer
  walk" is a pure metadata query, zero data-file opens.

``IcebergSource`` takes a ``catalog`` object (duck-typed — in production
a thin wrapper over a SparkCatalog / REST catalog client; in tests a
fake built from parquet metadata) so the mapping logic is testable
without the runtime jar. ``read()`` falls back to
``spark.read.format("iceberg").load(identifier)`` when the catalog does
not override it — the real-cluster path.

Catalog protocol (duck-typed):
    current_snapshot_id(identifier) -> int | str
    partitions(identifier, partition_col) -> list[str]
    partition_files(identifier, partition_col, value) -> list[dict]
        each: {"path": str, "size": int, "sequence": int, "n_rows": int,
               "stats": {dotted_col: {"min", "max", "null_count"}}}
    arrow_schema(identifier) -> pyarrow.Schema
    read(spark, identifier) -> DataFrame            (optional override)
"""

from __future__ import annotations

import hashlib
import os


class ParquetSource:
    """Partitioned-parquet table rooted at ``path`` — the default source
    and the sandbox stand-in for a lakehouse table."""

    format = "parquet"

    def __init__(self, path: str):
        self.path = path

    def read(self, spark):
        return spark.read.parquet(self.path)

    def snapshot_id(self) -> str:
        from ..manifest import snapshot_id_for
        return snapshot_id_for(self.path)

    def partitions(self, partition_col: str) -> list[str]:
        from ..manifest import list_partitions
        return list_partitions(self.path, partition_col)

    def partition_fingerprint(self, partition_col: str, value: str) -> str:
        from ..manifest import partition_fingerprint
        return partition_fingerprint(self.path, partition_col, value)

    def prune_report(self, partition_col: str, value: str,
                     ruleset_doc: dict):
        from ..operators.stats_prune import prune_files
        pdir = os.path.join(self.path, f"{partition_col}={value}")
        return prune_files(pdir, ruleset_doc)


class IcebergSource:
    """Iceberg table addressed by catalog ``identifier``. Snapshot ids,
    partition lists, fingerprints and prune statistics all come from
    table METADATA (the catalog) — no filesystem walks, no footer opens;
    that is the entire point of the format at 10^12 rows."""

    format = "iceberg"

    def __init__(self, identifier: str, *, catalog=None):
        if catalog is None:
            raise ValueError(
                "IcebergSource needs a catalog object (snapshot ids, "
                "partition file lists and column bounds come from table "
                "metadata); pass a SparkCatalog wrapper or a fake for "
                "tests")
        self.identifier = identifier
        self.catalog = catalog

    def read(self, spark):
        reader = getattr(self.catalog, "read", None)
        if reader is not None:
            return reader(spark, self.identifier)
        return spark.read.format("iceberg").load(self.identifier)

    def snapshot_id(self) -> str:
        return f"snap_{self.catalog.current_snapshot_id(self.identifier)}"

    def partitions(self, partition_col: str) -> list[str]:
        return sorted(self.catalog.partitions(self.identifier,
                                              partition_col))

    def partition_fingerprint(self, partition_col: str, value: str) -> str:
        """Manifest-entry digest: hash of the partition's (path, size,
        sequence) file entries — the catalog-side analog of
        manifest.partition_fingerprint's (path, size, mtime) walk. A
        partition keeps its fingerprint until its own data files change,
        regardless of writes elsewhere in the table."""
        files = self.catalog.partition_files(self.identifier,
                                             partition_col, value)
        items = sorted((f["path"], int(f["size"]), int(f.get("sequence", 0)))
                       for f in files)
        h = hashlib.sha256(repr(items).encode()).hexdigest()[:16]
        return f"fp_{h}"

    def prune_report(self, partition_col: str, value: str,
                     ruleset_doc: dict):
        from ..operators.stats_prune import (PruneReport, analyze_ruleset,
                                             decide_from_stats)
        arrow_schema = self.catalog.arrow_schema(self.identifier)
        decidable, scan_only = analyze_ruleset(ruleset_doc, arrow_schema)
        files = self.catalog.partition_files(self.identifier,
                                             partition_col, value)
        decisions = [
            decide_from_stats(f["path"], int(f["n_rows"]),
                              f.get("stats", {}), decidable)
            for f in sorted(files, key=lambda f: f["path"])
        ]
        return PruneReport(decidable, scan_only, decisions)
