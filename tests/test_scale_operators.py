"""Stats / uniqueness / referential / drift operators over the clips
fixture table and the driver testdata."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import (
    drift, referential, stats, uniqueness)
from remark_lint_frontmatter_schema_spark.sources import fixtures

N = 2000


@pytest.fixture(scope="module")
def clips(spark):
    df = fixtures.generate_clips(spark, N, audio_ms=8, num_partitions=8)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def speakers(spark):
    return fixtures.generate_speakers(spark)


def test_column_stats_single_pass(clips):
    s = stats.column_stats(clips, ["sr_hz", "dur_ms", "transcript"])
    rows = {r.column: r for r in s.collect()}
    assert rows["sr_hz"].n_rows == N
    assert rows["sr_hz"].n_nulls == 0
    assert int(rows["sr_hz"].min_value) == 3          # injected range_sr
    assert int(rows["sr_hz"].max_value) == 48000
    # 10 injected nulls (required_transcript class, 1 per 200)
    assert rows["transcript"].n_nulls == N // 200
    assert 0 < rows["transcript"].null_rate < 0.01
    assert rows["dur_ms"].q_50 is not None


def test_stats_per_partition(clips):
    s = stats.column_stats(clips, ["dur_ms"], group_by="part_date")
    rows = s.collect()
    assert len(rows) == 8
    # drift partition (last date) has visibly larger median
    med = {r.partition_id: r.q_50 for r in rows}
    assert med["2026-01-08"] > 1.3 * med["2026-01-01"]


def test_tdigest_close_to_builtin(clips):
    td = stats.tdigest_quantiles(clips, "dur_ms", quantiles=(0.5,))
    [[exact]] = clips.selectExpr("percentile(dur_ms, 0.5)").collect()
    assert abs(td[0.5] - exact) / exact < 0.15


def test_uniqueness_salted_finds_dups_and_hot_key(clips):
    dups = {r[0]: r[1] for r in
            uniqueness.duplicate_keys(clips, "clip_id").collect()}
    # hot key: n_hot = N//200 = 10 occurrences
    assert dups[fixtures.HOT_CLIP_ID] == N // 200
    # ~0.1% duplicated ids: rows i%1000==500 take clip_{i-1}
    assert dups[f"clip_{499:010d}"] == 2
    # salted and naive agree exactly
    naive = {r[0]: r[1] for r in
             uniqueness.duplicate_keys(clips, "clip_id", salted=False).collect()}
    assert dups == naive


def test_uniqueness_violation_rows(clips):
    v = uniqueness.uniqueness_violations(clips, "clip_id").collect()
    assert all(r.keyword == "unique" for r in v)
    hot = [r for r in v if r.row_id == fixtures.HOT_CLIP_ID]
    assert hot and "occurs 10 times" in hot[0].message


def test_referential_exact_vs_bloom(clips, speakers):
    exact = referential.dangling_keys(clips, "speaker_id", speakers,
                                      "speaker_id")
    bloomed = referential.dangling_keys(clips, "speaker_id", speakers,
                                        "speaker_id", use_bloom=True)
    e = {r.clip_id for r in exact.select("clip_id").collect()}
    b = {r.clip_id for r in bloomed.select("clip_id").collect()}
    assert e == b
    assert len(e) == N // 200  # one dangling_speaker row per 200
    # every dangling row is a ghost speaker
    ghosts = clips.where("speaker_id like 'spk_ghost%'").count()
    assert ghosts == len(e)


def test_referential_violation_rows(clips, speakers):
    v = referential.referential_violations(
        clips, "speaker_id", speakers, "speaker_id", row_id="clip_id")
    rows = v.collect()
    assert len(rows) == N // 200
    assert all(r.actual.startswith("spk_ghost") for r in rows)


def test_drift_detects_shifted_partition(clips):
    last = "2026-01-08"
    side = F.when(F.col("part_date") == last, "b").otherwise("a")
    res = drift.drift_check(clips.where("dur_ms > 0"), "dur_ms", side,
                            "a", "b", lo=0, hi=50000, n_buckets=50)
    assert res["ks_stat"] > 0.15
    assert res["ks_drifted"]
    assert res["psi"] > 0.2


def test_drift_null_on_same_distribution(clips):
    # two halves of the SAME distribution: no drift
    side = F.when(F.pmod(F.xxhash64("clip_id"), F.lit(2)) == 0, "a").otherwise("b")
    res = drift.drift_check(
        clips.where("part_date < '2026-01-08' and dur_ms > 0"),
        "dur_ms", side, "a", "b", lo=0, hi=50000)
    assert res["ks_stat"] < 0.08
    assert not res["psi_drifted"]


# ---------------------------------------------------------------------------
# declarative table-level checks (x-unique / x-ref in the DSL)
# ---------------------------------------------------------------------------

def test_declarative_table_checks_union(spark):
    import pytest
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    fact = spark.createDataFrame(
        [("a", 1, 5), ("b", 1, 60), ("c", 2, 5), ("c", 3, 5)],
        ["rid", "fk", "qty"])
    dim = spark.createDataFrame([(1,), (9,)], ["dk"])
    rs = {"properties": {
        "rid": {"x-unique": True},
        "fk": {"x-ref": {"dim": "d", "key": "dk"}},
        "qty": {"maximum": 50},
    }}
    compiled = compile_ruleset(rs, fact.schema, name="tc")
    assert sorted(k for k, _, _ in compiled.table_checks) == ["ref", "unique"]
    res = validate_with_table_checks(fact, compiled, row_id="rid",
                                     dims={"d": dim})
    got = {(r.constraint_id, r.row_id) for r in res.violations.collect()}
    assert got == {
        ("tc:/qty:maximum", "b"),          # row expression
        ("unique:rid", "c"),               # duplicate key
        ("ref:fk->dk", "c"),               # fk 2 and 3 dangle
        ("ref:fk->dk", "c"),               # (set collapses; both rows 'c')
    } or got == {("tc:/qty:maximum", "b"), ("unique:rid", "c"),
                 ("ref:fk->dk", "c")}
    # dangling rows counted exactly: two 'c' rows with fk 2 and 3
    assert res.table_violations.where("keyword = 'ref'").count() == 2
    # missing dim is a config error at plan time
    with pytest.raises(KeyError):
        validate_with_table_checks(fact, compiled, row_id="rid", dims={})


def test_nested_x_unique_is_unknown(spark):
    import pyspark.sql.types as T
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    ])
    rs = {"properties": {"m": {"properties": {"k": {"x-unique": True}}}}}
    compiled = compile_ruleset(rs, schema, name="nested")
    assert not compiled.table_checks
    assert ("/m/k", "x-unique") in compiled.unknown


def test_x_unique_in_composition_branch_surfaces_as_unknown(spark):
    """x-unique/x-ref inside anyOf/if branches cannot run as a relational
    pass (a table check is not a per-row condition) — they must surface as
    unknown, not silently vanish with the probe ruleset, so strict mode
    flags the dropped declaration."""
    import pytest as _pytest
    import pyspark.sql.types as T
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    schema = T.StructType([T.StructField("rid", T.StringType()),
                           T.StructField("fk", T.LongType())])
    rs = {"anyOf": [
        {"properties": {"rid": {"x-unique": True}}},
        {"properties": {"fk": {"x-ref": {"dim": "d", "key": "dk"}}}},
    ]}
    compiled = compile_ruleset(rs, schema, name="comp")
    assert not compiled.table_checks
    unknown_kinds = {kw for _p, kw in compiled.unknown}
    assert "x-unique:in-composition" in unknown_kinds
    assert "x-ref:in-composition" in unknown_kinds
    with _pytest.raises(RulesetCompileError, match="strict"):
        compile_ruleset(rs, schema, name="comp", options={"strict": True})


def test_x_ref_n_items_hint_plumbed(spark):
    """x-ref n_items sizes the Bloom without an extra dim scan."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    fact = spark.createDataFrame([("a", 1), ("b", 7)], ["rid", "fk"])
    dim = spark.createDataFrame([(1,)], ["dk"])
    rs = {"properties": {"fk": {"x-ref": {"dim": "d", "key": "dk",
                                          "bloom": True, "n_items": 100}}}}
    compiled = compile_ruleset(rs, fact.schema, name="tcb")
    (_kind, _col, params), = compiled.table_checks
    assert params["n_items"] == 100 and params["bloom"] is True
    res = validate_with_table_checks(fact, compiled, row_id="rid",
                                     dims={"d": dim})
    assert {r.row_id for r in
            res.violations.where("keyword = 'ref'").collect()} == {"b"}


def test_windowed_psi_detects_day_shift(spark):
    """Per-window PSI vs previous window: a deliberate day-3 distribution
    shift must spike while stable day-pairs stay near zero; the first
    window emits no row (no predecessor)."""
    import datetime
    from remark_lint_frontmatter_schema_spark.operators import drift
    rows = []
    base = datetime.datetime(2026, 1, 1)
    for day in range(4):
        for i in range(400):
            # days 0-2: uniform over [0,100); day 3: shifted to [200,300)
            v = (i % 100) + (200 if day == 3 else 0)
            rows.append((base + datetime.timedelta(days=day, seconds=i),
                         float(v)))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {str(r.window_start.date()): r.psi
           for r in drift.windowed_psi(df, "value", "ts", lo=0.0, hi=400.0,
                                       n_buckets=20).collect()}
    assert set(out) == {"2026-01-02", "2026-01-03", "2026-01-04"}
    assert out["2026-01-02"] < 0.01 and out["2026-01-03"] < 0.01
    assert out["2026-01-04"] > 5.0  # disjoint supports -> huge PSI


def test_x_drift_declarative(spark):
    """x-drift in the DSL: emits one run-level violation row when the
    declared distribution split crosses a threshold, nothing when the
    sides agree; nested x-drift surfaces as unknown."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    rows = ([("a", float(i % 50)) for i in range(400)]
            + [("b", float(i % 50) + 40.0) for i in range(400)]
            + [("c", float(i % 50)) for i in range(400)])
    df = spark.createDataFrame(rows, "side string, v double") \
              .withColumn("rid", F.monotonically_increasing_id())
    rs_hit = {"properties": {"v": {"x-drift": {
        "partition_col": "side", "side_a": "a", "side_b": "b",
        "lo": 0, "hi": 100, "n_buckets": 20}}}}
    compiled = compile_ruleset(rs_hit, df.schema, name="dr")
    assert compiled.table_checks == [("drift", "v", {
        "partition_col": "side", "side_a": "a", "side_b": "b",
        "lo": 0.0, "hi": 100.0, "n_buckets": 20,
        "ks_threshold": 0.1, "psi_threshold": 0.2,
        "emd_threshold": None, "jsd_threshold": None,
        "cvm_threshold": None, "by": None,
        "severity": "warning"})]
    got = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert len(got) == 1 and got[0].keyword == "drift"
    assert got[0].actual.startswith("ks=")
    # identical distributions -> no violation
    rs_ok = {"properties": {"v": {"x-drift": {
        "partition_col": "side", "side_a": "a", "side_b": "c",
        "lo": 0, "hi": 100, "n_buckets": 20}}}}
    c2 = compile_ruleset(rs_ok, df.schema, name="dr2")
    assert validate_with_table_checks(df, c2, row_id="rid") \
        .violations.count() == 0
    # nested -> unknown, not silently dropped
    c3 = compile_ruleset(
        {"properties": {"m": {"properties": {"v": {"x-drift": {
            "partition_col": "side", "side_a": "a", "side_b": "b",
            "lo": 0, "hi": 1}}}}}},
        df.schema, name="dr3")
    assert not c3.table_checks


def test_chi_square_counts_zero_cells(spark):
    """Disjoint supports: chi2 must include the (0 - E)^2/E mass of
    buckets absent on one side — for a 2xN table with fully disjoint
    supports chi2 equals the grand total N_a + N_b."""
    from remark_lint_frontmatter_schema_spark.operators import drift
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3] * 10]
        + [("b", float(v)) for v in [7, 8, 9] * 10],
        "side string, v double")
    h = drift.histogram(df, "v", "side", lo=0.0, hi=10.0, n_buckets=10)
    chi2 = drift.chi_square(h, "a", "b").first().chi2
    assert abs(chi2 - 60.0) < 1e-9  # 30 + 30 rows, fully disjoint


def test_x_drift_bad_knob_fails_compile(spark):
    import pytest as _p
    import pyspark.sql.types as T
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    schema = T.StructType([T.StructField("v", T.DoubleType()),
                           T.StructField("side", T.StringType())])
    with _p.raises(RulesetCompileError):
        compile_ruleset({"properties": {"v": {"x-drift": {
            "partition_col": "side", "side_a": "a", "side_b": "b",
            "lo": 0, "hi": 1, "n_buckets": "wide"}}}}, schema, name="bad")


def test_bloom_disabled_on_key_type_mismatch(spark):
    """Mixed-type fact/dim keys: pandas string-hash renderings differ
    ('5.0' vs '5') while Spark's join coerces — the bloom path must fall
    back to the exact join instead of declaring false danglings."""
    from remark_lint_frontmatter_schema_spark.operators import referential
    fact = spark.createDataFrame([("a", 5.0), ("b", 7.0)],
                                 "rid string, fk double")
    dim = spark.createDataFrame([(5,)], "dk long")
    got = {r.rid for r in referential.dangling_keys(
        fact, "fk", dim, "dk", use_bloom=True).collect()}
    exact = {r.rid for r in referential.dangling_keys(
        fact, "fk", dim, "dk", use_bloom=False).collect()}
    assert got == exact == {"b"}


def test_exact_dedup_null_text_all_survive(spark):
    """NULL texts are absent content, not identical content: exact dedup
    must keep every NULL-text doc (sha2(NULL) used to collapse them all
    into one group and drop all but min id)."""
    from remark_lint_frontmatter_schema_spark.operators import dedup
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id int, text string")
    survivors = {r.doc_id for r in
                 dedup.exact_dedup(df, "text", "doc_id").collect()}
    assert survivors == {1, 3, 4, 5}
    groups = dedup.exact_groups(df, "text", "doc_id").collect()
    assert len(groups) == 1 and groups[0].n_docs == 2


def test_drift_stats_null_on_missing_side(spark):
    """A typo'd side label must surface, not produce a confident verdict:
    ks/psi/chi2 return NULL, drift_check raises, x-drift emits a
    drift-config violation."""
    import pytest as _p
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators import drift
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    df = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(50)]
        + [("b", float(i % 10) + 3) for i in range(50)],
        "side string, v double") \
        .withColumn("rid", F.monotonically_increasing_id())
    h = drift.histogram(df, "v", "side", lo=0.0, hi=20.0, n_buckets=10)
    assert drift.ks_statistic(h, "a", "TYPO").first().ks_stat is None
    assert drift.psi(h, "a", "TYPO").first().psi is None
    assert drift.chi_square(h, "a", "TYPO").first().chi2 is None
    # correct sides still compute
    assert drift.ks_statistic(h, "a", "b").first().ks_stat > 0
    with _p.raises(ValueError, match="not both present"):
        drift.drift_check(df, "v", "side", "a", "TYPO", lo=0.0, hi=20.0)
    rs = {"properties": {"v": {"x-drift": {
        "partition_col": "side", "side_a": "a", "side_b": "TYPO",
        "lo": 0, "hi": 20}}}}
    compiled = compile_ruleset(rs, df.schema, name="typo")
    got = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert len(got) == 1 and got[0].keyword == "drift-config"


def test_wilson_ci_honest_at_small_n(spark):
    """Wilson interval (stats.rate_ci / failure_rate_ci): 0 failures out
    of 3 rows is NOT certainty (ci_hi far from 0) while 0 out of 10k is
    near-certainty; bounds stay inside [0,1] at the k=0 and k=n edges
    where the Wald interval collapses to width 0; n=0 reports NULL."""
    from remark_lint_frontmatter_schema_spark.operators import stats
    agg = spark.createDataFrame(
        [("tiny_clean", 0, 3), ("big_clean", 0, 10000),
         ("all_bad", 5, 5), ("empty", 0, 0)],
        "grp string, k int, n int")
    rows = {r.grp: r for r in stats.rate_ci(agg, "k", "n").collect()}
    assert rows["tiny_clean"].rate == 0.0
    assert rows["tiny_clean"].ci_hi > 0.4          # honest uncertainty
    assert rows["big_clean"].ci_hi < 0.001         # near-certainty
    assert rows["all_bad"].rate == 1.0
    assert 0.0 < rows["all_bad"].ci_lo < 1.0       # not collapsed
    assert rows["all_bad"].ci_hi == 1.0
    assert rows["empty"].rate is None
    assert rows["empty"].ci_lo is None and rows["empty"].ci_hi is None
    for r in rows.values():
        if r.rate is not None:
            assert 0.0 <= r.ci_lo <= r.rate <= r.ci_hi <= 1.0
    # row-level convenience: one keys-only aggregate, same arithmetic
    df = spark.createDataFrame(
        [("a", True)] * 2 + [("a", False)] * 8 + [("b", False)] * 3,
        "grp string, bad boolean")
    got = {r.grp: r for r in
           stats.failure_rate_ci(df, "bad", "grp").collect()}
    assert got["a"].n == 10 and got["a"].k == 2
    assert abs(got["a"].rate - 0.2) < 1e-12
    assert got["b"].k == 0 and got["b"].ci_hi > 0.4


def test_x_severity_reaches_table_checks(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    df = spark.createDataFrame([("a", 1), ("a", 2)], ["rid", "n"])
    rs = {"properties": {"rid": {"x-severity": "error", "x-unique": True}}}
    compiled = compile_ruleset(rs, df.schema, name="sev")
    (r,) = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert r.keyword == "unique" and r.severity == "error"


def test_emd_matches_manual_and_guards(spark):
    """1-D Wasserstein over the shared histogram (drift.emd): equals the
    hand-computed |CDF diff| sum x bucket width on a known shift; the
    identical distribution scores 0; a missing side returns NULL."""
    from remark_lint_frontmatter_schema_spark.operators import drift
    # side a: uniform on buckets 1..10; side b: the same shifted +2 buckets
    rows = ([("a", float(v)) for v in range(10) for _ in range(5)]
            + [("b", float(v) + 2.0) for v in range(10) for _ in range(5)])
    df = spark.createDataFrame(rows, "side string, v double")
    h = drift.histogram(df, "v", "side", lo=0.0, hi=12.0, n_buckets=12)
    # exact shift of a discrete uniform: EMD = shift = 2 buckets
    got = drift.emd(h, "a", "b").first().emd
    assert abs(got - 2.0) < 1e-9
    # in value units: bucket width 1.0 here, so identical
    assert abs(drift.emd(h, "a", "b", bucket_width=1.0).first().emd
               - got) < 1e-12
    assert drift.emd(h, "a", "a").first().emd == 0.0
    assert drift.emd(h, "a", "TYPO").first().emd is None
    # magnitude-awareness vs KS: the same 10%-mass outlier moved farther
    # raises EMD but leaves KS unchanged
    near = ([("a", 1.0)] * 9 + [("a", 3.0)]
            + [("b", 1.0)] * 9 + [("b", 5.0)])
    far = ([("a", 1.0)] * 9 + [("a", 3.0)]
           + [("b", 1.0)] * 9 + [("b", 11.0)])
    hn = drift.histogram(spark.createDataFrame(near, "side string, v double"),
                         "v", "side", lo=0.0, hi=12.0, n_buckets=12)
    hf = drift.histogram(spark.createDataFrame(far, "side string, v double"),
                         "v", "side", lo=0.0, hi=12.0, n_buckets=12)
    ks_n = drift.ks_statistic(hn, "a", "b").first().ks_stat
    ks_f = drift.ks_statistic(hf, "a", "b").first().ks_stat
    assert abs(ks_n - ks_f) < 1e-9
    assert drift.emd(hf, "a", "b").first().emd \
        > drift.emd(hn, "a", "b").first().emd


def test_jsd_bounds_symmetry_and_guards(spark):
    """Jensen-Shannon over the shared histogram (drift.jensen_shannon):
    0 on identical sides, exactly ln 2 on disjoint supports (finite where
    PSI's epsilon floor produces an arbitrary magnitude), symmetric in
    side order, NULL on a missing side."""
    import math
    from remark_lint_frontmatter_schema_spark.operators import drift
    rows = ([("a", float(v)) for v in range(5) for _ in range(4)]
            + [("b", float(v) + 6.0) for v in range(5) for _ in range(4)])
    df = spark.createDataFrame(rows, "side string, v double")
    h = drift.histogram(df, "v", "side", lo=0.0, hi=12.0, n_buckets=12)
    assert drift.jensen_shannon(h, "a", "a").first().jsd == 0.0
    got = drift.jensen_shannon(h, "a", "b").first().jsd
    assert abs(got - math.log(2.0)) < 1e-9  # disjoint supports
    assert abs(drift.jensen_shannon(h, "b", "a").first().jsd - got) < 1e-12
    assert drift.jensen_shannon(h, "a", "TYPO").first().jsd is None
    # partial overlap sits strictly inside (0, ln 2)
    mid = ([("a", float(v)) for v in range(6) for _ in range(4)]
           + [("b", float(v) + 3.0) for v in range(6) for _ in range(4)])
    hm = drift.histogram(spark.createDataFrame(mid, "side string, v double"),
                         "v", "side", lo=0.0, hi=12.0, n_buckets=12)
    j = drift.jensen_shannon(hm, "a", "b").first().jsd
    assert 0.0 < j < math.log(2.0)


def test_cvm_hand_value_and_guards(spark):
    """Cramér–von Mises over the shared histogram (drift.cramer_von_mises):
    equals the hand-computed pooled-mass-weighted squared CDF gap; 0 on
    identical sides; NULL on a missing side; accumulates a broad moderate
    shift that KS (max of the gap) saturates on."""
    from remark_lint_frontmatter_schema_spark.operators import drift
    # a: all mass at bucket 1; b: all mass at bucket 3.
    # CDF gap is 1 on bucket 1 (pooled mass 1/2) and 0 on bucket 3 after
    # forward-fill, so cvm = 0.5 exactly.
    rows = [("a", 0.5)] * 5 + [("b", 2.5)] * 5
    df = spark.createDataFrame(rows, "side string, v double")
    h = drift.histogram(df, "v", "side", lo=0.0, hi=12.0, n_buckets=12)
    assert abs(drift.cramer_von_mises(h, "a", "b").first().cvm - 0.5) < 1e-9
    assert drift.cramer_von_mises(h, "a", "a").first().cvm == 0.0
    assert drift.cramer_von_mises(h, "a", "TYPO").first().cvm is None
    # quadratic accumulation: two half-gap buckets score half of one
    # full-gap bucket under L2 (0.5^2 * 2 vs 1^2), while the L1 view (EMD)
    # scores them equal — pin the contrast that motivates the statistic
    half = [("a", 0.5)] * 4 + [("a", 4.5)] * 4 \
        + [("b", 2.5)] * 4 + [("b", 6.5)] * 4
    hh = drift.histogram(spark.createDataFrame(half, "side string, v double"),
                         "v", "side", lo=0.0, hi=12.0, n_buckets=12)
    full = drift.cramer_von_mises(h, "a", "b").first().cvm
    assert drift.cramer_von_mises(hh, "a", "b").first().cvm < full


def test_categorical_drift_and_emd_threshold_dsl(spark):
    """categorical_hist feeds psi/chi_square unchanged (bucket = the
    category value); x-drift's optional emd_threshold fires the violation
    when KS/PSI would not."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators import drift
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    rows = ([("a", "click")] * 40 + [("a", "view")] * 60
            + [("b", "click")] * 70 + [("b", "view")] * 30)
    df = spark.createDataFrame(rows, "side string, ev string")
    h = drift.categorical_hist(df, "ev", "side")
    assert drift.psi(h, "a", "b").first().psi > 0.3
    assert drift.chi_square(h, "a", "b").first().chi2 > 10
    assert drift.psi(h, "a", "TYPO").first().psi is None
    # emd_threshold in the DSL: tiny uniform shift — below the default
    # ks/psi bars but past a tight value-unit EMD bar
    import pyspark.sql.types as T
    vals = ([("a", float(v)) for v in range(10) for _ in range(10)]
            + [("b", float(v) + 0.5) for v in range(10) for _ in range(10)])
    vdf = spark.createDataFrame(vals, "grp string, v double") \
        .withColumn("rid", F.monotonically_increasing_id())
    base = {"partition_col": "grp", "side_a": "a", "side_b": "b",
            "lo": 0, "hi": 12, "n_buckets": 24,
            "ks_threshold": 0.9, "psi_threshold": 99}
    quiet = compile_ruleset(
        {"properties": {"v": {"x-drift": dict(base)}}}, vdf.schema,
        name="quiet")
    assert validate_with_table_checks(vdf, quiet, row_id="rid") \
        .violations.count() == 0
    armed = compile_ruleset(
        {"properties": {"v": {"x-drift": {**base, "emd_threshold": 0.2}}}},
        vdf.schema, name="armed")
    got = validate_with_table_checks(vdf, armed, row_id="rid") \
        .violations.collect()
    assert len(got) == 1 and "emd=" in got[0].actual, got
    assert "emd>0.2" in got[0].message


def test_ks_by_localizes_drift_to_the_moved_group(spark):
    from remark_lint_frontmatter_schema_spark.operators import drift
    rows = []
    for g, shift in (("stable", 0.0), ("moved", 4.0)):
        rows += [(g, "a", float(v)) for v in range(10) for _ in range(20)]
        rows += [(g, "b", float(v) + shift) for v in range(10)
                 for _ in range(20)]
    rows += [("oneside", "a", 1.0)] * 5   # side b absent for this group
    df = spark.createDataFrame(rows, "grp string, side string, v double")
    h = drift.histogram_by(df, "v", "side", "grp", lo=0.0, hi=16.0,
                           n_buckets=16)
    ks = {r.grp: r.ks_stat for r in drift.ks_by(h, "a", "b").collect()}
    assert ks["stable"] == 0.0
    assert ks["moved"] == 0.4        # 4-bucket shift of a uniform = 4/10
    assert ks["oneside"] is None     # per-group missing-side guard


def test_x_quantile_gate(spark):
    """x-quantile order-statistics band: in-band passes silently,
    out-of-band emits one fail-closed-shaped row, empty input FAILS
    closed, approx mode agrees at this scale, DSL wiring + refusals."""
    import pytest as _p
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators import stats
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)],
                               "rid int, v double")
    # p99 of 1..100 = 99.01 (linear interpolation)
    assert stats.quantile_violations(df, "v", q=0.99, hi=99.5).count() == 0
    (row,) = stats.quantile_violations(df, "v", q=0.99, hi=90).collect()
    assert row.keyword == "x-quantile" and "p99 <= 90: got" in row.message
    assert abs(float(row.actual) - 99.01) < 1e-6
    # empty/all-NULL fails closed with actual NULL
    empty = spark.createDataFrame([], "rid int, v double")
    (r0,) = stats.quantile_violations(empty, "v", q=0.5, lo=1).collect()
    assert r0.actual is None and "no non-NULL values" in r0.message
    # approx path agrees here (tiny data, max accuracy)
    (ra,) = stats.quantile_violations(df, "v", q=0.99, hi=90,
                                      approx=True).collect()
    assert abs(float(ra.actual) - 99.0) <= 1.0
    # DSL: compiles on numeric, violates; unknown on string; bad knobs
    rs = {"properties": {"v": {"x-quantile": {"q": 0.99, "hi": 90}}}}
    compiled = compile_ruleset(rs, df.schema, name="q")
    got = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert len(got) == 1 and got[0].keyword == "x-quantile"
    with _p.raises(RulesetCompileError):
        compile_ruleset({"properties": {"v": {
            "x-quantile": {"q": 2, "hi": 1}}}}, df.schema, name="qbad")
    with _p.raises(RulesetCompileError):
        compile_ruleset({"properties": {"v": {
            "x-quantile": {"q": 0.5}}}}, df.schema, name="qbad2")
    s = spark.createDataFrame([(1, "x")], "rid int, t string")
    c3 = compile_ruleset({"properties": {"t": {
        "x-quantile": {"q": 0.5, "hi": 1}}}}, s.schema, name="qstr")
    assert ("/t", "x-quantile") in c3.unknown and not c3.table_checks
    with _p.raises(ValueError, match="q must be"):
        stats.quantile_violations(df, "v", q=1.5, hi=1)
    with _p.raises(ValueError, match="lo/hi"):
        stats.quantile_violations(df, "v", q=0.5)


def test_x_drift_jsd_cvm_thresholds(spark):
    """x-drift's optional jsd/cvm statistics: a disjoint-support shift
    fires jsd (exactly ln 2) even with ks/psi thresholds set above their
    values; actual string carries all requested statistics; thresholds
    not requested are absent from the message."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    df = spark.createDataFrame(
        [("a", float(v % 5)) for v in range(40)]
        + [("b", float(v % 5) + 7.0) for v in range(40)],
        "side string, v double") \
        .withColumn("rid", F.monotonically_increasing_id())
    rs = {"properties": {"v": {"x-drift": {
        "partition_col": "side", "side_a": "a", "side_b": "b",
        "lo": 0, "hi": 12, "n_buckets": 12,
        "ks_threshold": 99, "psi_threshold": 99,
        "jsd_threshold": 0.5, "cvm_threshold": 99}}}}
    compiled = compile_ruleset(rs, df.schema, name="j")
    (r,) = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert "jsd=0.693147" in r.actual and "cvm=" in r.actual
    assert "jsd>0.5" in r.message and "emd" not in r.message
    # below-threshold: same data, jsd bar above ln 2 -> no violation
    rs2 = {"properties": {"v": {"x-drift": {
        "partition_col": "side", "side_a": "a", "side_b": "b",
        "lo": 0, "hi": 12, "n_buckets": 12,
        "ks_threshold": 99, "psi_threshold": 99,
        "jsd_threshold": 0.7}}}}
    c2 = compile_ruleset(rs2, df.schema, name="j2")
    assert validate_with_table_checks(df, c2, row_id="rid") \
        .violations.count() == 0


def test_mean_shift_scan_localizes_changepoint(spark):
    """CUSUM scan (drift.mean_shift_scan): a planted level shift puts
    the norm_cusum argmax at the shift boundary with a large value; a
    stationary series stays below the Brownian-bridge bar; <2 buckets
    or zero spread yield NULL."""
    from datetime import datetime
    rows = []
    for d in range(1, 21):
        level = 10.0 if d <= 12 else 30.0          # shift after day 12
        jitter = (d * 7 % 5) * 0.1
        rows += [(datetime(2024, 5, d), level + jitter)] * 20
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    scan = drift.mean_shift_scan(df, "ts", "value").collect()
    peak = max(scan, key=lambda r: r.norm_cusum)
    assert peak.bucket.day == 12 and peak.norm_cusum > 1.3
    # stationary: same jitter, no level change
    flat = [(datetime(2024, 5, d), 10.0 + (d * 7 % 5) * 0.1)
            for d in range(1, 21) for _ in range(20)]
    fscan = drift.mean_shift_scan(
        spark.createDataFrame(flat, "ts timestamp, value double"),
        "ts", "value").collect()
    assert max(r.norm_cusum for r in fscan) < 1.3
    one = spark.createDataFrame([(datetime(2024, 5, 1), 1.0)],
                                "ts timestamp, value double")
    assert drift.mean_shift_scan(one, "ts", "value") \
        .first().norm_cusum is None
    import pytest as _p
    with _p.raises(ValueError, match="unit"):
        drift.mean_shift_scan(df, "ts", "value", unit="era")


def test_psi_by_localizes_category_mix_drift(spark):
    """psi_by: only the group whose category MIX shifted scores high;
    a group missing one side reports NULL, not a confident figure."""
    rows = []
    # group g1: mix flips between sides; g2: identical mix; g3: side b absent
    rows += [("g1", "a", "x")] * 30 + [("g1", "a", "y")] * 10
    rows += [("g1", "b", "x")] * 10 + [("g1", "b", "y")] * 30
    rows += [("g2", "a", "x")] * 20 + [("g2", "a", "y")] * 20
    rows += [("g2", "b", "x")] * 20 + [("g2", "b", "y")] * 20
    rows += [("g3", "a", "x")] * 10
    df = spark.createDataFrame(rows, "grp string, side string, cat string")
    h = drift.categorical_hist_by(df, "cat", "side", "grp")
    got = {r.grp: r.psi for r in drift.psi_by(h, "a", "b").collect()}
    assert got["g1"] > 0.5
    assert abs(got["g2"]) < 1e-9
    assert got["g3"] is None


def test_x_quantile_grouped(spark):
    """x-quantile with `by`: the band is checked per group, out-of-band
    groups become violation rows keyed by the group value; an unknown
    `by` column lands in unknown."""
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators import stats
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    rows = [("slow", i, float(i * 10)) for i in range(1, 11)]   # p99 ~ 99
    rows += [("fast", 100 + i, float(i)) for i in range(1, 11)]  # p99 ~ 9.9
    df = spark.createDataFrame(rows, "codec string, rid int, v double")
    got = stats.quantile_violations(df, "v", q=0.99, hi=50,
                                    by="codec").collect()
    assert [r.row_id for r in got] == ["slow"]
    assert "by=codec" in got[0].constraint_id
    rs = {"properties": {"v": {"x-quantile":
                               {"q": 0.99, "hi": 50, "by": "codec"}}}}
    compiled = compile_ruleset(rs, df.schema, name="qg")
    vio = validate_with_table_checks(df, compiled, row_id="rid") \
        .violations.collect()
    assert [r.row_id for r in vio] == ["slow"]
    c2 = compile_ruleset({"properties": {"v": {"x-quantile":
        {"q": 0.99, "hi": 50, "by": "nope"}}}}, df.schema, name="qg2")
    assert ("/v", "x-quantile") in c2.unknown and not c2.table_checks
