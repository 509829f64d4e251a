"""PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of
``JulianCataldo/remark-lint-frontmatter-schema`` (reference read-only at
/root/reference, v3.15.4): a declarative JSON-Schema-style constraint DSL
compiled on the driver into Spark SQL Column expressions (plus vectorized
pandas/Arrow UDF checks for binary payloads), evaluated in ONE projection
per scan, producing structured violation rows + per-partition verdicts.

The reference validates one Markdown frontmatter object per file with Ajv
(``index.ts:322-323``); this engine validates one table row per record at
10^12-row scale. See SURVEY.md for the full operator mapping.
"""

from .plans.compiler import CompiledRuleset, compile_ruleset
from .plans.bundler import bundle
from .operators.validate import validate, ValidationResult
from .operators.table_checks import validate_with_table_checks
from .operators.ingest import ingest_corpus
from .operators.repair import (repair, RepairResult, route_and_repair, RoutedRepairResult)
from .operators.stats_prune import prune_files, validate_with_stats_pruning
from .operators.sequence import monotonic_violations
from .sinks import write_split
from .session import get_spark

__all__ = [
    "prune_files",
    "validate_with_stats_pruning",
    "CompiledRuleset",
    "compile_ruleset",
    "bundle",
    "validate",
    "ValidationResult",
    "validate_with_table_checks",
    "ingest_corpus",
    "repair",
    "RepairResult",
    "route_and_repair",
    "RoutedRepairResult",
    "monotonic_violations",
    "write_split",
    "get_spark",
]

__version__ = "0.1.0"
