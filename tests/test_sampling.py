"""Deterministic sampling / budget-cap operators (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import dedup, sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", 10 + (i * 7) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, "id int, lang string, w int")
    df.cache().count()
    return df


def test_hash_sample_deterministic_and_proportional(docs):
    a = {r.id for r in sampling.hash_sample(docs, "id", 0.3).collect()}
    b = {r.id for r in sampling.hash_sample(docs, "id", 0.3).collect()}
    assert a == b                       # rerun-identical
    assert 0.2 < len(a) / 500 < 0.4     # ~fraction
    # nested property: a smaller fraction is a SUBSET of a larger one
    small = {r.id for r in sampling.hash_sample(docs, "id", 0.1).collect()}
    assert small <= a
    assert sampling.hash_sample(docs, "id", 1.0).count() == 500
    assert sampling.hash_sample(docs, "id", 0.0).count() == 0
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, "id", 1.5)


def test_stratified_topn_quota_and_determinism(docs):
    out = sampling.stratified_topn(docs, "lang", "id", 25)
    per = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"lang0": 25, "lang1": 25, "lang2": 25}
    again = sampling.stratified_topn(docs, "lang", "id", 25)
    assert {r.id for r in out.collect()} == {r.id for r in again.collect()}
    # quota above stratum size: whole stratum survives
    assert sampling.stratified_topn(docs, "lang", "id", 1000).count() == 500


def test_take_until_budget_invariants(docs):
    budget = 3000.0
    out = sampling.take_until_budget(docs, "w", "id", budget, n_partitions=8)
    rows = out.collect()
    total = sum(r.w for r in rows)
    assert 0 < total <= budget
    # maximal prefix: adding the next doc in hash order would exceed budget
    kept = {r.id for r in rows}
    import hashlib

    def ok(i):
        return hashlib.sha256(str(i).encode()).hexdigest()[:8]
    ordered = sorted(docs.select("id", "w").collect(),
                     key=lambda r: (ok(r.id), r.id))
    cum = 0.0
    expect = set()
    for r in ordered:
        cum += r.w
        if cum > budget:
            break
        expect.add(r.id)
    assert kept == expect               # exact agreement with serial prefix
    # partition-count independence: same result with different layout
    out2 = sampling.take_until_budget(docs, "w", "id", budget,
                                      n_partitions=3)
    assert {r.id for r in out2.collect()} == kept
    dedup.release_all()


def test_take_until_budget_empty_input(spark):
    df = spark.createDataFrame([], "id int, w int")
    out = sampling.take_until_budget(df, "w", "id", 100.0, n_partitions=4)
    assert out.count() == 0
    assert out.columns == ["id", "w"]


def test_mix_to_weights_exact_composition(docs):
    # lang0/1/2 have ~167 rows each; targets 1/2, 1/3, 1/6 -> feasible
    # T = min(n_s/w_s) binds on lang0: T = n0/0.5
    out = sampling.mix_to_weights(docs, "lang", "id",
                                  {"lang0": 3, "lang1": 2, "lang2": 1})
    n = {r.lang: r.cnt for r in out.groupBy("lang")
         .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    counts = {r.lang: r.cnt for r in docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    feasible = min(counts[s] / w for s, w in
                   {"lang0": 0.5, "lang1": 1 / 3, "lang2": 1 / 6}.items())
    assert n == {"lang0": int(0.5 * feasible),
                 "lang1": int(feasible / 3),
                 "lang2": int(feasible / 6)}
    # deterministic: rerun-identical membership
    again = sampling.mix_to_weights(docs, "lang", "id",
                                    {"lang0": 3, "lang1": 2, "lang2": 1})
    assert {r.id for r in out.collect()} == {r.id for r in again.collect()}


def test_mix_to_weights_drops_unweighted_and_saturates_scarce(docs):
    # only lang0 weighted -> whole lang0 survives, everything else dropped
    out = sampling.mix_to_weights(docs, "lang", "id", {"lang0": 1.0})
    got = out.select("lang").distinct().collect()
    assert [r.lang for r in got] == ["lang0"]
    assert out.count() == docs.where(F.col("lang") == "lang0").count()


def test_mix_to_weights_missing_source_is_infeasible(docs):
    # a weighted source absent from the data -> T = 0, empty mixture
    # (never a silently-shifted composition)
    out = sampling.mix_to_weights(docs, "lang", "id",
                                  {"lang0": 1, "nope": 1})
    assert out.count() == 0


def test_mix_to_weights_subset_of_itself_under_growth(docs):
    # unsaturated sources contribute hash-FIRST rows: shrinking the corpus
    # shrinks each source's contribution to a prefix of the larger run
    small = docs.where(F.col("id") < 250)
    w = {"lang0": 1, "lang1": 1, "lang2": 1}
    big_ids = {r.id for r in
               sampling.mix_to_weights(docs, "lang", "id", w).collect()}
    small_out = sampling.mix_to_weights(small, "lang", "id", w)
    # same per-source hash order: every kept small-corpus row that also
    # ranks within the big corpus's caps appears there too; spot-check via
    # count monotonicity
    assert small_out.count() <= len(big_ids)


def test_mix_to_weights_bad_args(docs):
    for bad in ({}, {"lang0": -1}, {"lang0": 0}, {"lang0": True}):
        with pytest.raises(ValueError):
            sampling.mix_to_weights(docs, "lang", "id", bad)


# ---------------------------------------------------------------------------
# group-exclusive splits + leakage audit
# ---------------------------------------------------------------------------

def test_group_split_is_group_exclusive_and_weighted(spark):
    from remark_lint_frontmatter_schema_spark.operators.sampling import (
        group_split)
    rows = [(i, f"g{i % 200}") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = group_split(df, "grp").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())   # no leakage
    from collections import Counter
    c = Counter(next(iter(s)) for s in by_group.values())
    assert 200 * 0.65 < c["train"] < 200 * 0.95           # ~0.8 of groups
    assert c["train"] + c["val"] + c["test"] == 200
    # determinism + salt sensitivity
    again = {r.id: r.split for r in group_split(df, "grp").collect()}
    assert all(again[r.id] == r.split for r in out)
    other = {r.id: r.split
             for r in group_split(df, "grp", salt="v2").collect()}
    assert any(other[r.id] != r.split for r in out)


def test_group_split_null_and_guards(spark):
    import pytest
    from remark_lint_frontmatter_schema_spark.operators.sampling import (
        group_split)
    df = spark.createDataFrame([(1, None), (2, "g")], "id long, grp string")
    rows = {r.id: r.split for r in group_split(df, "grp").collect()}
    assert rows[1] is None and rows[2] in ("train", "val", "test")
    # NB {} falls back to the default weights (falsy), so it is not a
    # guard case
    for bad in ({"a": 0.5}, {"a": -0.1, "b": 1.1},
                {"a": 0.5, "b": 0.6}):
        with pytest.raises(ValueError):
            group_split(df, "grp", splits=bad)
    # single-split degenerate form: everything lands there
    one = group_split(df, "grp", splits={"all": 1.0}).collect()
    assert {r.split for r in one if r.grp is not None} == {"all"}
    # zero-weight trailing split: cumulative weight hits 1.0 mid-chain —
    # the boundary must saturate, never widen to 9 hex chars (which
    # would lexicographically misroute high-hash groups into the
    # zero-weight split)
    many = spark.createDataFrame([(i, f"g{i}") for i in range(300)],
                                 "id long, grp string")
    z = group_split(many, "grp",
                    splits={"train": 0.8, "val": 0.2, "test": 0.0}).collect()
    from collections import Counter
    c = Counter(r.split for r in z)
    assert c["test"] == 0
    assert 300 * 0.6 < c["train"] < 300 * 0.95 and c["val"] > 0


def test_split_leakage_detects_and_clears(spark):
    from remark_lint_frontmatter_schema_spark.operators.sampling import (
        group_split, split_leakage)
    rows = [(i, f"g{i % 50}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, grp string")
    clean = group_split(df, "grp")
    assert split_leakage(clean, "grp", "split").count() == 0
    leaky = group_split(df, "id", salt="row") \
        .withColumnRenamed("split", "split")
    leaks = split_leakage(leaky, "grp", "split").collect()
    assert len(leaks) > 0
    for r in leaks:
        assert r.n_splits > 1 and r.n_splits == len(r.splits)
        assert r.splits == sorted(r.splits)


def test_x_leakage_dsl_end_to_end(spark):
    import pytest
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.sampling import (
        group_split)
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    rows = [(i, f"g{i % 20}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string")
    leaky = group_split(df, "id", salt="row")        # row-level: leaks
    rs = {"type": "object", "properties": {
        "split": {"x-leakage": {"group": "grp"}}}}
    compiled = compile_ruleset(rs, leaky.schema, name="docs")
    assert compiled.table_checks == [
        ("leakage", "split", {"group": "grp", "severity": "warning"})]
    res = validate_with_table_checks(leaky, compiled, row_id="id")
    got = res.violations.collect()
    assert got and all(r.keyword == "leakage" for r in got)
    assert all(r.constraint_id == "leakage:split:grp" for r in got)
    assert any("found in" in r.message for r in got)
    # clean assignment -> zero violations
    clean = group_split(df, "grp")
    res2 = validate_with_table_checks(clean, compiled, row_id="id")
    assert res2.violations.where("keyword = 'leakage'").count() == 0
    # nested -> unknown; malformed -> compile error
    nested = {"type": "object", "properties": {"split": {
        "anyOf": [{"x-leakage": {"group": "grp"}}, {"minLength": 1}]}}}
    assert any(kw.startswith("x-leakage")
               for _p, kw in compile_ruleset(nested, leaky.schema).unknown)
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"type": "object", "properties": {
            "split": {"x-leakage": {}}}}, leaky.schema)
