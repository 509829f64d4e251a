"""Schema induction: profile a table and propose the JSON-Schema-style
ruleset its data already satisfies — the engine's DSL, generated from
evidence instead of written by hand.

The reference ships rulesets as hand-authored YAML next to the content
(``/root/reference/README.md`` workflow); at warehouse scale the first
draft of a ruleset for a 10^12-row table is itself a data-engineering
task. ``induce_ruleset`` bootstraps it: observed null-rates become
``required``, observed numeric ranges become ``minimum``/``maximum``,
observed string lengths become ``minLength``/``maxLength``, and
low-cardinality columns become ``enum``. The induced dict feeds straight
into ``compile_ruleset`` — the round-trip invariant (induce → compile →
validate → zero violations on the inducing data) is pinned in tests.

Scale: ONE full scan computes every per-column aggregate (min/max/null
count/length bounds/approx-distinct in a single hash-free global
aggregate — partial-aggregated, no shuffle beyond the 1-row combine).
Enum candidacy is decided from the HLL approx-distinct (deterministic:
register merges are order-independent), then ONE second scan collects the
actual small value sets for every candidate column at once
(``collect_set`` bounded by the candidacy threshold; an overflowing set —
HLL undercount — demotes the column back to non-enum rather than
emitting a giant enum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


# formats probed during induction, most-specific first — the first whose
# regex matches EVERY non-null value wins ("uri" is broadest, so last)
_INFER_FORMATS = ("uuid", "email", "ipv4", "date-time", "date", "time",
                  "url", "uri")


def _profile_row(df: DataFrame, columns: list[str]):
    from ..functions.formats import FORMAT_REGEX
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in columns:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.col(c)).alias(f"nn__{c}"))
        aggs.append(F.approx_count_distinct(F.col(c)).alias(f"ad__{c}"))
        if isinstance(dt, _NUMERIC):
            v = F.col(c)
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                # a single NaN/Inf would otherwise become the draft's
                # minimum/maximum — induce bounds from the finite mass
                # (the stats.column_stats rule)
                v = F.when(~F.isnan(v) & (F.abs(v)
                                          != F.lit(float("inf"))), v)
            aggs.append(F.min(v).alias(f"mn__{c}"))
            aggs.append(F.max(v).alias(f"mx__{c}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(F.length(F.col(c))).alias(f"mn__{c}"))
            aggs.append(F.max(F.length(F.col(c))).alias(f"mx__{c}"))
            for fmt in _INFER_FORMATS:
                aggs.append(
                    F.sum(F.col(c).rlike(FORMAT_REGEX[fmt]).cast("long"))
                     .alias(f"fm__{c}__{fmt}"))
    return df.agg(*aggs).collect()[0]


def _enum_sets(df: DataFrame, candidates: list[str],
               enum_max: int) -> dict[str, list]:
    """One scan for every candidate column's distinct set. ``slice`` caps
    the collected size defensively; a set larger than ``enum_max``
    (HLL undercounted) disqualifies the column."""
    if not candidates:
        return {}
    row = df.agg(*[
        F.slice(F.array_sort(F.collect_set(F.col(c))), 1, enum_max + 1)
         .alias(c)
        for c in candidates]).collect()[0]
    out = {}
    for c in candidates:
        vals = row[c]
        if vals and len(vals) <= enum_max:
            out[c] = list(vals)
    return out


def induce(df: DataFrame, columns: list[str] | None = None, *,
           enum_max: int = 8) -> dict[str, dict]:
    """Per-column induced facts:
    ``{col: {required, n_nulls, approx_distinct, min, max, enum}}``
    (``min``/``max`` are values for numeric columns, LENGTHS for string
    columns; ``enum`` present only for confirmed low-cardinality
    columns). Two scans total regardless of column count."""
    columns = list(columns) if columns is not None else list(df.columns)
    prof = _profile_row(df, columns)
    total = prof["_total"]
    # HLL standard error ~2%; 2x headroom keeps true small sets candidate
    candidates = [c for c in columns
                  if 0 < prof[f"ad__{c}"] <= max(enum_max * 2, enum_max + 4)
                  and isinstance(df.schema[c].dataType,
                                 (T.StringType, *_INTEGRAL))]
    enums = _enum_sets(df, candidates, enum_max)
    # categorical needs EVIDENCE of repetition: a column whose observed
    # distinct count equals its row count is an identifier sampled small,
    # not an enum — bounds describe it better than a frozen value list
    enums = {c: v for c, v in enums.items() if len(v) < prof[f"nn__{c}"]}
    facts: dict[str, dict] = {}
    for c in columns:
        f: dict = {
            "required": total > 0 and prof[f"nn__{c}"] == total,
            "n_nulls": total - prof[f"nn__{c}"],
            "approx_distinct": prof[f"ad__{c}"],
        }
        if f"mn__{c}" in prof.__fields__:
            f["min"], f["max"] = prof[f"mn__{c}"], prof[f"mx__{c}"]
        if c in enums:
            f["enum"] = enums[c]
        elif isinstance(df.schema[c].dataType, T.StringType) \
                and prof[f"nn__{c}"] > 0:
            # format inference: EVERY non-null value matches (an enum
            # column is already pinned tighter than any format)
            for fmt in _INFER_FORMATS:
                if prof[f"fm__{c}__{fmt}"] == prof[f"nn__{c}"]:
                    f["format"] = fmt
                    break
        facts[c] = f
    return facts


def induce_ruleset(df: DataFrame, columns: list[str] | None = None, *,
                   enum_max: int = 8, name: str | None = None) -> dict:
    """The induced JSON-Schema-style ruleset dict (feed to
    ``compile_ruleset``). Bounds are the OBSERVED extremes — the tightest
    ruleset the inducing data passes; widen by hand where the sample
    should not be treated as the universe."""
    columns = list(columns) if columns is not None else list(df.columns)
    facts = induce(df, columns, enum_max=enum_max)
    props: dict = {}
    required: list[str] = []
    for c in columns:
        fx = facts[c]
        dt = df.schema[c].dataType
        node: dict = {}
        if isinstance(dt, _INTEGRAL):
            node["type"] = "integer"
        elif isinstance(dt, _NUMERIC):
            node["type"] = "number"
        elif isinstance(dt, T.StringType):
            node["type"] = "string"
        elif isinstance(dt, T.BooleanType):
            node["type"] = "boolean"
        if "enum" in fx:
            node["enum"] = fx["enum"]
        elif isinstance(dt, _NUMERIC) and fx.get("min") is not None:
            node["minimum"] = (int(fx["min"]) if isinstance(dt, _INTEGRAL)
                               else float(fx["min"]))
            node["maximum"] = (int(fx["max"]) if isinstance(dt, _INTEGRAL)
                               else float(fx["max"]))
        elif isinstance(dt, T.StringType) and fx.get("min") is not None:
            node["minLength"] = int(fx["min"])
            node["maxLength"] = int(fx["max"])
            if "format" in fx:
                node["format"] = fx["format"]
        if fx["required"]:
            required.append(c)
        props[c] = node
    rs: dict = {"type": "object", "properties": props}
    if required:
        rs["required"] = required
    if name:
        rs["title"] = name
    return rs


def profile_diff(old: DataFrame, new: DataFrame, columns: list[str], *,
                 enum_max: int = 8) -> DataFrame:
    """Induced-PROFILE drift between two table versions: which constraint
    facts (bounds, null-rates, enum sets, length limits) moved — the
    schema-level companion to row-level ``snapshot_diff`` and the
    check-free complement to ``x-drift`` (no thresholds, no histogram —
    just "the evidence a ruleset rests on changed").

    Implemented as :func:`operators.diff.snapshot_diff` over the two
    facts relations keyed on ``(col_name, keyword)``: ``changed`` rows
    carry which value slot moved, ``added``/``removed`` appear when a
    column gains/loses enum candidacy (its fact keywords differ). Costs
    the two profile scans; the diff itself runs on fact-sized data."""
    from .diff import snapshot_diff
    return snapshot_diff(
        induced_facts_df(old, columns, enum_max=enum_max),
        induced_facts_df(new, columns, enum_max=enum_max),
        ["col_name", "keyword"])


def induced_facts_df(df: DataFrame, columns: list[str], *,
                     enum_max: int = 8) -> DataFrame:
    """The induced facts as rows ``(col_name, keyword, num_value,
    str_value)`` — the SQL-comparable face of :func:`induce` (numeric
    bounds in ``num_value``; ``required`` and sorted comma-joined enum
    sets in ``str_value``)."""
    facts = induce(df, columns, enum_max=enum_max)
    rows = []
    for c in columns:
        fx = facts[c]
        dt = df.schema[c].dataType
        rows.append((c, "required", None, str(fx["required"]).lower()))
        if "enum" in fx:
            rows.append((c, "enum", None,
                         ",".join(str(v) for v in fx["enum"])))
        elif isinstance(dt, _NUMERIC) and fx.get("min") is not None:
            rows.append((c, "minimum", float(fx["min"]), None))
            rows.append((c, "maximum", float(fx["max"]), None))
        elif isinstance(dt, T.StringType) and fx.get("min") is not None:
            rows.append((c, "minLength", float(fx["min"]), None))
            rows.append((c, "maxLength", float(fx["max"]), None))
            if "format" in fx:
                rows.append((c, "format", None, fx["format"]))
    return df.sparkSession.createDataFrame(
        rows, "col_name string, keyword string, num_value double, "
              "str_value string")
