"""Physical-plan audits: the optimizations SURVEY.md §4 promises must be
visible in `.explain` output — these tests fail if a code change silently
regresses pruning/broadcast/pushdown."""

import pytest

from remark_lint_frontmatter_schema_spark import bundle, compile_ruleset, validate
from remark_lint_frontmatter_schema_spark.operators import referential
from remark_lint_frontmatter_schema_spark.sources import fixtures


@pytest.fixture(scope="module")
def clips_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plan") / "clips")
    fixtures.write_clips(
        fixtures.generate_clips(spark, 400, audio_ms=8, num_partitions=2), p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_expression_checks_never_read_bytes(spark, clips_path):
    """R8: `bytes` must be pruned from the scan when no binary check is
    active — at 10^12 rows reading the payload column is the whole cost."""
    clips = spark.read.parquet(clips_path)
    compiled = compile_ruleset(bundle("rulesets/clip.schema.yaml"),
                               clips.schema, name="clip",
                               exclude_columns=("ruleset_id",))
    res = validate(clips, compiled, row_id="clip_id",
                   partition_col="part_date")
    plan = _plan(res.violations)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln
                  or "ReadSchema" in ln]
    assert scan_lines, plan
    assert "bytes" not in " ".join(scan_lines), \
        f"bytes column not pruned:\n{' '.join(scan_lines)}"
    # speaker_id / props unused by this projection? props IS used (nested
    # checks); speaker_id must be pruned
    assert "speaker_id" not in " ".join(scan_lines)


def test_resume_filter_prunes_partitions(spark, clips_path):
    """T1/R9: the resume anti-filter must reach the scan as partition
    pruning (PartitionFilters), not a post-scan Filter."""
    from pyspark.sql import functions as F
    clips = spark.read.parquet(clips_path)
    pruned = clips.where(F.col("part_date").cast("string") == "2026-01-01") \
                  .select("clip_id")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    import re
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "part_date" in m.group(1), plan


def test_referential_join_is_broadcast(spark, clips_path):
    """J3: the dim side must broadcast — a shuffled anti-join of the fact
    side is the scale failure mode."""
    clips = spark.read.parquet(clips_path)
    speakers = fixtures.generate_speakers(spark, 100)
    d = referential.dangling_keys(clips, "speaker_id", speakers, "speaker_id")
    plan = _plan(d)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan


def test_validation_is_single_projection_over_scan(spark, clips_path):
    """R7: all checks in one projection — no joins/shuffles before the
    violations explode."""
    clips = spark.read.parquet(clips_path)
    compiled = compile_ruleset(bundle("rulesets/clip.schema.yaml"),
                               clips.schema, name="clip",
                               exclude_columns=("ruleset_id",))
    res = validate(clips, compiled, row_id="clip_id")
    plan = _plan(res.violations)
    assert "Exchange" not in plan, f"violations path must be shuffle-free:\n{plan}"
    assert "Generate explode" in plan or "Generate" in plan


def test_predicate_pushdown_reaches_parquet(spark, clips_path):
    """R9: applicability predicates push to the reader (PushedFilters)."""
    clips = spark.read.parquet(clips_path).where("sr_hz > 0") \
        .select("clip_id", "sr_hz")
    plan = _plan(clips)
    assert "PushedFilters" in plan
    import re
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "sr_hz" in m.group(1), plan


def test_simhash_signatures_hash_array_staged_once(spark):
    """Regression guard for the staged SimHash plan: the token-hash array
    must appear ONCE in the optimized plan (lower projection), not be
    re-inlined into each of the 64 bit-vote aggregates by CollapseProject
    (the 64x tokenize+hash trap, fixed round 2)."""
    from remark_lint_frontmatter_schema_spark.operators import dedup
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = dedup.simhash_signatures_df(df, "text", "doc_id") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("xxhash64") == 1, plan


def test_map_additional_properties_keeps_codegen_fast_path(spark):
    """additionalProperties:false on a map with no patternProperties must
    compile to array_except (codegen-able), not an F.filter lambda
    (CodegenFallback — measured 2.3x slower on the suite query); with
    patternProperties in play the filter form is required."""
    import pyspark.sql.types as T
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    sch = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    ])
    c1 = compile_ruleset(
        {"properties": {"m": {"properties": {"k": {}},
                              "additionalProperties": False}}},
        sch, name="fast")
    (chk,) = c1.checks
    assert "array_except" in str(chk.violated._jc)
    c2 = compile_ruleset(
        {"properties": {"m": {"patternProperties": {"^x_": {}},
                              "additionalProperties": False}}},
        sch, name="slow")
    ap = [c for c in c2.checks if c.keyword == "additionalProperties"][0]
    assert "array_except" not in str(ap.violated._jc)


def test_budget_sampling_prunes_columns(spark, tmp_path):
    """take_until_budget must not widen the scan: only the id, weight and
    order-key source columns reach the parquet reader, even through the
    repartitionByRange + offset-join plan."""
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark.operators import dedup, sampling
    p = str(tmp_path / "docs")
    spark.range(0, 1000).select(
        F.col("id"), F.concat(F.lit("text"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"), F.lit("junkjunk").alias("wide_col"),
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = sampling.take_until_budget(
        df.select("id", F.length("text").alias("w")), "w", "id", 500.0,
        n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "wide_col" not in plan and "lang" not in plan, plan
    out.count()
    dedup.release_all()


def test_exact_dedup_violations_shuffle_carries_hash_not_text(spark, tmp_path):
    """x-dedup exact: the aggregate/join must exchange (sha, id) pairs
    only — the text column is consumed map-side by sha2 and must not
    appear in any Exchange input."""
    from remark_lint_frontmatter_schema_spark.operators import clusters
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(str(i), f"body {i % 3} with some longer content here", "en")
         for i in range(50)],
        "doc_id string, text string, lang string").write.parquet(p)
    docs = spark.read.parquet(p)
    v = clusters.dedup_violations(docs, "text", "doc_id")
    plan = _plan(v)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # every exchange's child output should be hash+id, never the raw text
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln
    # scan reads only the two columns the check needs
    scan = " ".join(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "lang" not in scan


def test_star_rounds_have_no_cartesian_or_full_rows(spark):
    """Connected components: each star round is groupBy-min + equi-join on
    node ids — no cartesian product, no nested-loop join, ever."""
    from remark_lint_frontmatter_schema_spark.operators.clusters import (
        _large_star, _small_star)
    e = spark.createDataFrame([(f"a{i}", f"a{i+1}") for i in range(20)],
                              "src string, dst string")
    for stage in (_large_star(e), _small_star(e)):
        plan = _plan(stage)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        # min-neighbor must partial-aggregate map-side (skew safety for
        # huge-degree nodes)
        assert "partial_min" in plan or "partial_merge" in plan, plan


def test_audio_neardup_blocks_instead_of_cross_join(spark):
    """The acoustic near-dup self-join must be chunk-bucketed (equi-join on
    (chunk, ckey)), never a cross product, and its fingerprint input must
    be the persisted relation so decode+FFT runs once, not per side."""
    from remark_lint_frontmatter_schema_spark.functions import audio
    from remark_lint_frontmatter_schema_spark.operators import dedup

    clips = spark.createDataFrame(
        [("x", audio.synth_wav(1, 16000, 400))],
        "clip_id string, bytes binary")
    pairs = audio.audio_neardup_pairs(clips)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    dedup.release_all()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # both join sides read the persisted fingerprint relation — decode+FFT
    # executes once regardless of how the plan PRINTS (InMemoryTableScan's
    # repr includes the cached child's MapInPandas, so counting that string
    # would double-count a single execution)
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_label_conflict_joins_hashes_never_payloads(spark):
    """The label-conflict plan must stay bucket-blocked (no cross join)
    and its transcript comparison must join 32-byte sha2 hashes — neither
    `bytes` nor `transcript` may appear in any Exchange."""
    from remark_lint_frontmatter_schema_spark.functions import audio
    from remark_lint_frontmatter_schema_spark.operators import dedup

    clips = spark.createDataFrame(
        [("x", audio.synth_wav(1, 16000, 400), "hello")],
        "clip_id string, bytes binary, transcript string")
    v = audio.transcript_conflict_violations(clips)
    plan = _plan(v)
    dedup.release_all()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange" in ln or "Broadcast" in ln]
    joined = " ".join(exchanges)
    assert "bytes" not in joined and "transcript#" not in joined, joined


def test_canonicalize_and_augment_prune_to_id_and_bytes(spark, clips_path):
    """The canonicalization/augmentation writer stages must read exactly
    (clip_id, bytes) — metadata columns pruned from the scan — and stay
    map-only (no Exchange anywhere in the plan)."""
    from remark_lint_frontmatter_schema_spark.functions import audio

    clips = spark.read.parquet(clips_path)
    for stage in (audio.canonicalize_clips(clips),
                  audio.augment_speed(clips, factors=(1.1,))):
        plan = _plan(stage)
        scan = " ".join(ln for ln in plan.splitlines()
                        if "ReadSchema" in ln or "FileScan" in ln)
        assert "bytes" in scan and "clip_id" in scan, scan
        for col in ("transcript", "sr_hz", "dur_ms", "codec", "speaker_id"):
            assert col not in scan, (col, scan)
        assert "Exchange" not in plan, plan


def test_split_gate_is_codegen_projection(spark, clips_path):
    """write_split's routing gate (n_blocking_expr) must compile into the
    whole-stage-codegen projection — no Python, no HOF in the gate."""
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark.operators.validate import (
        n_blocking_expr)

    clips = spark.read.parquet(clips_path)
    compiled = compile_ruleset(bundle("rulesets/clip.schema.yaml"),
                               clips.schema, name="clip",
                               exclude_columns=("ruleset_id",))
    gated = clips.select(
        "clip_id", (n_blocking_expr(compiled, ("error", "warning")) == 0)
        .alias("accepted"))
    plan = _plan(gated)
    assert "EvalPython" not in plan
    assert "lambdafunction" not in plan
    # `*(n)` prefixes mark whole-stage-codegen nodes in this plan repr
    assert plan.lstrip().startswith("*("), plan


def test_repair_is_single_jvm_projection(spark, tmp_path):
    """Repair must be one Project over the scan — no Exchange, no Python
    stage — and the repaired projection must not read columns the
    ruleset never touches (beyond the projected output itself)."""
    from remark_lint_frontmatter_schema_spark.operators.repair import repair
    p = str(tmp_path / "rt")
    spark.createDataFrame(
        [("a", "O", 10.0, "payload")],
        "id string, status string, price double, blob string") \
        .write.parquet(p)
    df = spark.read.parquet(p)
    res = repair(df, {"properties": {
        "status": {"enum": ["O", "F"], "default": "O"},
        "price": {"minimum": 0, "maximum": 100}}}, row_id="id")
    plan = _plan(res.log)
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_outlier_stats_scans_prune_to_value_and_group(spark, tmp_path):
    """x-outlier's stats passes must read only (group, value) — never the
    payload — and the stats relation must broadcast back onto the fact."""
    from remark_lint_frontmatter_schema_spark.operators.outliers import (
        outlier_scores)
    p = str(tmp_path / "ot")
    spark.createDataFrame(
        [("a", "g1", 1.0, "payload")],
        "id string, grp string, x double, blob string").write.parquet(p)
    df = spark.read.parquet(p)
    plan = _plan(outlier_scores(df, "x", row_id="id", group_col="grp"))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("blob" not in ln for ln in scan_lines), plan
    assert "Broadcast" in plan, plan
    assert "EvalPython" not in plan, plan


def test_content_keywords_stay_jvm_side(spark, tmp_path):
    """contentEncoding/contentMediaType compile to pure JVM expressions —
    no ArrowEvalPython stage may appear in the violations plan."""
    from remark_lint_frontmatter_schema_spark import (
        compile_ruleset as _cr, validate as _v)
    p = str(tmp_path / "ct")
    spark.createDataFrame(
        [("a", "QUJD", b"RIFF0000WAVExxxx")],
        "id string, payload string, raw binary").write.parquet(p)
    df = spark.read.parquet(p)
    compiled = _cr({"properties": {
        "payload": {"contentEncoding": "base64",
                    "contentMediaType": "application/json"},
        "raw": {"contentMediaType": "audio/wav"}}}, df.schema)
    plan = _plan(_v(df, compiled, row_id="id").violations)
    assert "EvalPython" not in plan, plan


def test_edit_distance_truncates_before_the_join(spark):
    """edit_distance_pairs must shuffle BOUNDED prefixes: the substring
    sits below the join exchange (in the text-side projection), so a
    10 MB document never crosses the wire — and the join itself carries
    no raw text column."""
    from remark_lint_frontmatter_schema_spark.operators import dedup
    docs = spark.createDataFrame(
        [(1, "alpha " * 200), (2, "alpha " * 199 + "beta ")],
        "doc_id int, text string")
    cand = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    out = dedup.edit_distance_pairs(cand, docs, "text", "doc_id",
                                    prefix_len=64)
    opt = _optimized(out)
    # the optimized plan's text-side projections substring at the source
    proj_lines = [ln for ln in opt.splitlines() if "substring" in ln]
    assert proj_lines, opt
    assert all("levenshtein" not in ln for ln in proj_lines)
    # raw `text` never appears as a join output (only the _t prefixes)
    join_lines = [ln for ln in opt.splitlines() if "Join" in ln]
    assert join_lines and all("text#" not in ln for ln in join_lines), opt


def test_pq_adc_scan_is_pure_jvm(spark):
    """pq_topk's ADC scan must be a JVM projection over the code column:
    no Python/Arrow stage (the pandas UDF belongs to ENCODE only) and a
    TakeOrderedAndProject instead of a full sort."""
    from remark_lint_frontmatter_schema_spark.operators import similarity
    codes = spark.createDataFrame(
        [(i, [i % 4, (i + 1) % 4]) for i in range(50)],
        "vec_id int, codes array<int>")
    books = [[[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]] * 2
    out = similarity.pq_topk(codes, books, [0.5, 0.5, 1.5, 1.5], k=5,
                             id_col="vec_id")
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, \
        plan
    # encode, by contrast, IS the Arrow stage
    enc_plan = _plan(similarity.pq_encode(
        spark.createDataFrame([(1, [0.1, 0.2, 0.3, 0.4])],
                              "vec_id int, embedding array<float>"),
        "embedding", "vec_id", books))
    assert "ArrowEvalPython" in enc_plan, enc_plan


def test_new_text_operators_prune_to_id_and_text(spark, tmp_path):
    """gopher_gates / c4_clean / redact_pii / pack_documents read only
    (doc_id, text) from a wide documents table — the scan must prune the
    unused columns (at 10^12 rows the pruned columns are the savings)."""
    from remark_lint_frontmatter_schema_spark.operators import packing, text
    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"some text {i} here", "en", "web", 12, "extra" * 10)
         for i in range(50)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, payload string").write.parquet(p)
    docs = spark.read.parquet(p)
    for df in (text.gopher_gates(docs, "text", "doc_id"),
               text.c4_clean(docs, "text", "doc_id"),
               text.redact_pii(docs, "text", "doc_id"),
               packing.pack_documents(docs, "doc_id", capacity=64,
                                      text_col="text")):
        plan = _plan(df)
        reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert reads, plan
        for ln in reads:
            assert "payload" not in ln and "lang" not in ln, ln
            assert "text" in ln, ln


def test_group_split_is_pure_map(spark, tmp_path):
    """group_split adds the split column with ZERO shuffles — leakage-free
    assignment must not cost a repartition."""
    from remark_lint_frontmatter_schema_spark.operators.sampling import (
        group_split)
    p = str(tmp_path / "docs2")
    spark.createDataFrame([(i, f"g{i%5}") for i in range(50)],
                          "id long, grp string").write.parquet(p)
    df = spark.read.parquet(p)
    plan = _plan(group_split(df, "grp"))
    assert "Exchange" not in plan, plan


def test_fd_violations_prune_and_no_cartesian(spark, tmp_path):
    """x-fd: both fact scans prune to (row_id, determinant, dependent);
    the conflicted-group join is a key equi-join, never a cartesian."""
    from remark_lint_frontmatter_schema_spark.operators.fd import fd_violations
    p = str(tmp_path / "fdtab")
    spark.createDataFrame(
        [(i, f"d{i % 3}", 16000 if i % 7 else 22050, "x" * 50, i * 1.0)
         for i in range(200)],
        "rid long, device string, sr int, payload string, other double") \
        .write.parquet(p)
    df = spark.read.parquet(p)
    v = fd_violations(df, "sr", ["device"], row_id="rid")
    plan = _plan(v)
    reads = " ".join(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "payload" not in reads and "other" not in reads, reads
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_url_groups_single_shuffle_no_python(spark, tmp_path):
    """Canonical-URL dedup: pure JVM expressions (no Arrow/Python eval
    stage) and exactly the one groupBy Exchange; scan pruned to url+id."""
    from remark_lint_frontmatter_schema_spark.operators.urls import url_groups
    p = str(tmp_path / "urltab")
    spark.createDataFrame(
        [(i, f"https://Example.com/p{i % 9}?utm_source=x", "pad" * 40)
         for i in range(100)], "doc_id long, url string, pad string") \
        .write.parquet(p)
    df = spark.read.parquet(p)
    plan = _plan(url_groups(df, "url", "doc_id"))
    assert "EvalPython" not in plan and "ArrowEval" not in plan
    reads = " ".join(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "pad" not in reads, reads
    assert plan.count("Exchange") <= 2, plan  # partial+final agg exchange


def test_gap_and_sessionize_prune_and_stay_jvm(spark, tmp_path):
    """x-gap grouped: slim (id, ts, group) projection reaches the scan,
    no Python stage; sessionize likewise adds no Python stage."""
    from remark_lint_frontmatter_schema_spark.operators.sequence import (
        gap_violations, sessionize)
    p = str(tmp_path / "gaptab")
    spark.createDataFrame(
        [(i, float(i * 30), f"u{i % 5}", "blob" * 64) for i in range(200)],
        "eid long, ts double, user string, payload string") \
        .write.parquet(p)
    df = spark.read.parquet(p)
    gplan = _plan(gap_violations(df, "ts", row_id="eid", by="user",
                                 max_seconds=60))
    reads = " ".join(ln for ln in gplan.splitlines() if "ReadSchema" in ln)
    assert "payload" not in reads, reads
    assert "EvalPython" not in gplan and "ArrowEval" not in gplan
    splan = _plan(sessionize(df, "ts", by="user", gap_seconds=60))
    assert "EvalPython" not in splan and "ArrowEval" not in splan


def test_snapshot_diff_prunes_to_keys_and_compared(spark, tmp_path):
    """Keyed diff: comparing a SUBSET of columns must prune the rest from
    both scans (the 100 TB case: diff two snapshots on 2 columns without
    reading the payload)."""
    from remark_lint_frontmatter_schema_spark.operators.diff import (
        snapshot_diff)
    p1, p2 = str(tmp_path / "old"), str(tmp_path / "new")
    rows = [(i, i * 1.0, "p" * 80) for i in range(100)]
    schema = "k long, v double, payload string"
    spark.createDataFrame(rows, schema).write.parquet(p1)
    spark.createDataFrame(rows, schema).write.parquet(p2)
    d = snapshot_diff(spark.read.parquet(p1), spark.read.parquet(p2),
                      ["k"], compare=["v"])
    reads = " ".join(ln for ln in _plan(d).splitlines()
                     if "ReadSchema" in ln)
    assert "payload" not in reads, reads


def test_asof_join_shuffle_shape_and_pruning(spark, tmp_path):
    """As-of join: payload columns NOT in the payload list are pruned
    from the right scan, no Python stage, and the simple path's big
    exchange partitions on the join key alone while the bucketed path's
    partitions on (key, bucket) — the skew contract."""
    from remark_lint_frontmatter_schema_spark.operators.asof import (
        asof_join, asof_join_bucketed)
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [(i, f"k{i % 3}", float(i), "wide" * 64) for i in range(100)],
        "lid long, k string, ts double, lpayload string").write.parquet(lp)
    spark.createDataFrame(
        [(f"k{i % 3}", float(i), float(i) * 2, "wide" * 64)
         for i in range(50)],
        "k string, ts double, v double, junk string").write.parquet(rp)
    left = spark.read.parquet(lp)
    right = spark.read.parquet(rp)

    out = asof_join(left, right, on="k", left_ts="ts", payload=["v"])
    plan = _plan(out)
    reads = " ".join(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "junk" not in reads, reads          # unused right col pruned
    assert "EvalPython" not in plan and "ArrowEval" not in plan
    exch = [ln for ln in plan.splitlines() if "Exchange hashpartitioning"
            in ln]
    assert exch and all("_asof_bkt" not in ln for ln in exch), plan

    bout = asof_join_bucketed(left, right, on="k", left_ts="ts",
                              payload=["v"], bucket=10.0)
    bplan = _plan(bout)
    assert any("_asof_bkt" in ln for ln in bplan.splitlines()
               if "Exchange hashpartitioning" in ln), bplan
    assert "EvalPython" not in bplan and "ArrowEval" not in bplan


def test_interval_joins_plan_as_equi_joins(spark, tmp_path):
    """Range joins must never plan as BroadcastNestedLoopJoin or
    CartesianProduct — the bucket column turns them into equi-joins."""
    from remark_lint_frontmatter_schema_spark.operators.intervals import (
        interval_overlap_join, point_in_interval_join)
    ivp, ptp = str(tmp_path / "iv"), str(tmp_path / "pt")
    spark.createDataFrame(
        [(f"k{i % 5}", float(i), float(i + 3), i) for i in range(400)],
        "k string, s double, e double, iid long").write.parquet(ivp)
    spark.createDataFrame(
        [(f"k{i % 5}", float(i), i) for i in range(400)],
        "k string, ts double, pid long").write.parquet(ptp)
    iv, pt = spark.read.parquet(ivp), spark.read.parquet(ptp)
    p1 = _plan(point_in_interval_join(pt, iv, on="k", point_ts="ts",
                                      start_col="s", end_col="e",
                                      bucket=5.0, payload=["iid"]))
    p2 = _plan(interval_overlap_join(iv, iv, on="k", a_start="s",
                                     a_end="e", b_start="s", b_end="e",
                                     bucket=5.0, a_keep=["iid"],
                                     b_keep=["iid"]))
    for p in (p1, p2):
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "EvalPython" not in p and "ArrowEval" not in p
