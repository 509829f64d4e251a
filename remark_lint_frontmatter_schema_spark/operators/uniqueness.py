"""Key-uniqueness check with explicit skew handling (SURVEY.md A6).

north_rule mandate: "clip_id uniqueness via salted hash-partitioned
aggregation with explicit skew handling". The two-phase plan:

  phase 1: groupBy(key, salt = pmod(spark_partition_id(), n_salts))
           .count() — a hot key's rows split across up to n_salts
           reducers because the salt varies WITHIN a key (it derives
           from the row's input partition, never from the key itself —
           a key-derived salt like hash(key) % n would be constant per
           key and split nothing)
  phase 2: groupBy(key).sum(partial_count) — tiny relation (at most one
           row per (key, salt)), then filter cnt > 1

Spark's hash aggregate already does map-side partial counts, which handles
*moderate* skew; the explicit salt makes the protection visible,
bounded (n_salts) and portable to aggregates without partial-agg
support. Duplicate keys become violation rows
(``constraint_id='unique:<key>'``) shaped exactly like the DSL checks so
sinks union cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str, *, n_salts: int = 32,
                   salted: bool = True) -> DataFrame:
    """Keys appearing more than once, with their multiplicity."""
    if salted:
        partial = (
            df.select(key)
            .where(F.col(key).isNotNull())
            .groupBy(F.col(key),
                     F.pmod(F.spark_partition_id(),
                            F.lit(n_salts)).alias("_salt"))
            .agg(F.count(F.lit(1)).alias("_partial"))
        )
        counts = partial.groupBy(key).agg(F.sum("_partial").alias("n_occurrences"))
    else:
        counts = (df.select(key).where(F.col(key).isNotNull())
                  .groupBy(key).agg(F.count(F.lit(1)).alias("n_occurrences")))
    return counts.where(F.col("n_occurrences") > 1)


def uniqueness_violations_from_counts(counts: DataFrame, key: str, *,
                                      ruleset_name: str = "engine",
                                      severity: str = "warning"
                                      ) -> DataFrame:
    """Violation rows from a precomputed per-key count relation with
    columns ``(_k STRING, n_occurrences)`` — the shared projection behind
    :func:`uniqueness_violations` and the fused single-scan table-check
    pass (operators/table_checks.py), so both emit byte-identical rows."""
    return counts.where(F.col("n_occurrences") > 1).select(
        F.col("_k").alias("row_id"),
        F.lit("all").alias("partition_id"),
        F.lit(ruleset_name).alias("ruleset_id"),
        F.lit(f"unique:{key}").alias("constraint_id"),
        F.lit("unique").alias("keyword"),
        F.lit(f"/{key}").alias("instance_path"),
        F.lit(f"#/x-unique/{key}").alias("schema_path"),
        F.concat(F.lit(f"Must be unique: '{key}' occurs "),
                 F.col("n_occurrences").cast("string"),
                 F.lit(" times")).alias("message"),
        F.col("_k").alias("actual"),
        F.lit(None).cast("array<string>").alias("expected"),
        F.lit(severity).alias("severity"),
    )


def uniqueness_violations(df: DataFrame, key: str, *,
                          ruleset_name: str = "engine",
                          n_salts: int = 32,
                          severity: str = "warning") -> DataFrame:
    """Violation rows for duplicated keys, one per duplicate key value
    (violation shape mirrors operators/validate.py VIOLATION_FIELDS)."""
    dups = duplicate_keys(df, key, n_salts=n_salts)
    return uniqueness_violations_from_counts(
        dups.select(F.col(key).cast("string").alias("_k"),
                    "n_occurrences"),
        key, ruleset_name=ruleset_name, severity=severity)


def duplicate_keys_multi(df: DataFrame, keys: list[str], *,
                         n_salts: int = 32) -> DataFrame:
    """Composite-key duplicates: (key tuple, n_occurrences) for every
    combination appearing more than once — the multi-column form of
    :func:`duplicate_keys`, same salted two-phase plan (the salt is the
    input partition id, so a hot composite value still splits across
    reducers — a key-derived salt would be constant per tuple and split
    nothing). Rows with a NULL in ANY component are excluded, mirroring
    SQL UNIQUE semantics (NULLs compare unequal; required/type own
    missingness)."""
    if not keys or len(keys) < 2:
        raise ValueError("duplicate_keys_multi needs >= 2 key columns "
                         "(use duplicate_keys for one)")
    cols = [F.col(k) for k in keys]
    nn = cols[0].isNotNull()
    for c in cols[1:]:
        nn = nn & c.isNotNull()
    partial = (
        df.select(*keys)
        .where(nn)
        .groupBy(*cols,
                 F.pmod(F.spark_partition_id(),
                        F.lit(n_salts)).alias("_salt"))
        .agg(F.count(F.lit(1)).alias("_partial")))
    counts = partial.groupBy(*keys).agg(
        F.sum("_partial").alias("n_occurrences"))
    return counts.where(F.col("n_occurrences") > 1)


def uniqueness_violations_multi(df: DataFrame, keys: list[str], *,
                                ruleset_name: str = "engine",
                                n_salts: int = 32,
                                severity: str = "warning") -> DataFrame:
    """Violation rows for duplicated composite keys (root-level
    ``x-unique: [col, ...]``); row_id is the '|'-joined component
    values."""
    dups = duplicate_keys_multi(df, keys, n_salts=n_salts)
    key_list = ", ".join(keys)
    return dups.select(
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
         .alias("row_id"),
        F.lit("all").alias("partition_id"),
        F.lit(ruleset_name).alias("ruleset_id"),
        F.lit(f"unique:({key_list})").alias("constraint_id"),
        F.lit("unique").alias("keyword"),
        F.lit("/" + "/".join(keys)).alias("instance_path"),
        F.lit(f"#/x-unique/({key_list})").alias("schema_path"),
        F.concat(F.lit(f"Must be unique: ({key_list}) occurs "),
                 F.col("n_occurrences").cast("string"),
                 F.lit(" times")).alias("message"),
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
         .alias("actual"),
        F.lit(None).cast("array<string>").alias("expected"),
        F.lit(severity).alias("severity"),
    )
