"""Fixture-suite parity: the FIXTURES.md 200-row suite validated with the
bundled clip ruleset — each injected defect class must produce exactly its
violation, valid rows zero (the guten-nachte zero-message analog)."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark import bundle, compile_ruleset, validate
from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.plans.bundler import RulesetCompileError
from remark_lint_frontmatter_schema_spark.sources import fixtures

N = 200


@pytest.fixture(scope="module")
def clips(spark):
    df = fixtures.generate_clips(spark, N, audio_ms=200, num_partitions=4)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def result(spark, clips):
    ruleset = bundle("rulesets/clip.schema.yaml")
    compiled = compile_ruleset(ruleset, clips.schema, name="clip",
                               schema_file="clip.schema.yaml",
                               exclude_columns=("ruleset_id",))
    return validate(
        clips, compiled, row_id="clip_id", partition_col="part_date",
        # the reference skips files without frontmatter (index.ts:352-356)
        applicability=clips.ruleset_id.isNotNull(),
    )


def _viol(result):
    return result.violations.collect()


def test_violation_classes_covered(result):
    got = {(r.keyword, r.instance_path) for r in _viol(result)}
    assert ("enum", "/codec") in got                 # enum_codec
    assert ("required", "") in got                   # required_transcript
    assert ("type", "/props/take") in got            # type_props_take
    assert ("maxLength", "/transcript") in got       # maxlength_transcript
    assert ("required", "/props") in got             # nested_required
    assert ("pattern", "/transcript") in got         # pattern_transcript
    assert ("minimum", "/sr_hz") in got              # range_sr
    assert ("minimum", "/dur_ms") in got             # range_dur


def test_exact_counts_per_class(result):
    by_kw = {}
    for r in _viol(result):
        by_kw[(r.keyword, r.instance_path)] = by_kw.get(
            (r.keyword, r.instance_path), 0) + 1
    # one injected row per class in 200 rows
    assert by_kw[("enum", "/codec")] == 1
    assert by_kw[("type", "/props/take")] == 1
    assert by_kw[("minimum", "/sr_hz")] == 1
    # maxlength row also violates pattern? 'x'*2000 matches pattern
    # (all x chars are allowed), so exactly 1 maxLength violation
    assert by_kw[("maxLength", "/transcript")] == 1


def test_no_frontmatter_rows_skipped(result, clips):
    # ruleset_id IS NULL rows are outside the domain: no violations at all
    null_ids = {r.clip_id for r in
                clips.where("ruleset_id is null").select("clip_id").collect()}
    assert null_ids
    viol_ids = {r.row_id for r in _viol(result)}
    assert not (null_ids & viol_ids)


def test_schema_path_two_part_provenance(result):
    # bundled external refs keep the file prefix (demo/pipeline.ts:74-79):
    # transcript checks come from base.schema.yaml via $ref
    v = [r for r in _viol(result) if r.instance_path == "/transcript"
         and r.keyword == "maxLength"]
    assert v and v[0].schema_path.startswith("base.schema.yaml#/")
    # codec enum comes from the allOf branch of clip.schema.yaml itself
    v2 = [r for r in _viol(result) if r.keyword == "enum"
          and r.instance_path == "/codec"]
    assert v2 and v2[0].schema_path == \
        "clip.schema.yaml#/allOf/1/properties/codec/enum"


def test_verdicts_fail_only_where_violations(result):
    verdicts = result.verdicts.collect()
    assert len(verdicts) == 8  # 8 part_date partitions
    for v in verdicts:
        assert v.passed == (v.n_failed_rows == 0)


def test_broken_ruleset_guarded():
    with pytest.raises(RulesetCompileError):
        ruleset = bundle("rulesets/broken.schema.yaml")
        from pyspark.sql import types as T
        compile_ruleset(ruleset, T.StructType([
            T.StructField("codec", T.StringType())]), name="broken")


def test_strict_const_and_embed_quirk(spark, clips):
    ruleset = bundle("rulesets/strict.schema.yaml")
    # embed path: ruleset_id NOT excluded (the index.ts:297-303 quirk)
    compiled = compile_ruleset(ruleset, clips.schema, name="strict",
                               schema_file="strict.schema.yaml")
    res = validate(clips, compiled, row_id="clip_id")
    kws = {r.keyword for r in res.violations.collect()}
    assert "const" in kws  # flac/opus rows violate codec const pcm_s16le


# ---------------------------------------------------------------------------
# per-row payload fidelity (BASELINE.json input_hint): decoded PCM vs the
# generator's clean reference signal, SNR >= 30 dB; transcript equality
# ---------------------------------------------------------------------------

def test_pcm_fidelity_snr(clips):
    rows = clips.where("codec = 'pcm_s16le' and bytes is not null") \
                .select("clip_id", "bytes", "sr_hz").limit(20).collect()
    checked = 0
    for r in rows:
        i = int(r.clip_id.split("_")[1])
        if fixtures.defect_class(i) in ("corrupt_bytes", "codec_header_mismatch",
                                        "range_sr"):
            continue
        sr, ref = fixtures.expected_signal(i, audio_ms=200)
        sr_dec, dec = audio.decode_wav_pcm16(bytes(r.bytes))
        assert sr_dec == sr == r.sr_hz
        assert audio.snr_db(ref, dec) >= 30.0
        assert np.allclose(ref, dec, atol=10 ** (-30 / 20) * 3)
        checked += 1
    assert checked >= 10


def test_transcript_equality(clips):
    rows = clips.where("transcript is not null").select("clip_id", "transcript") \
                .limit(50).collect()
    checked = 0
    for r in rows:
        i = int(r.clip_id.split("_")[1]) if "hot" not in r.clip_id else None
        if i is None or fixtures.defect_class(i) is not None or i % 1000 == 500:
            continue
        assert r.transcript == fixtures.transcript_for(i)
        checked += 1
    assert checked >= 20


def test_header_check_vectorized(spark, clips):
    from pyspark.sql import functions as F
    checked = clips.where("bytes is not null").withColumn(
        "hdr_ok", audio.codec_header_ok("bytes", "codec", "sr_hz"))
    rows = checked.select("clip_id", "hdr_ok").collect()
    bad = {r.clip_id for r in rows if not r.hdr_ok}
    for r in rows:
        if "hot" in r.clip_id:
            continue
        i = int(r.clip_id.split("_")[1])
        d = fixtures.defect_class(i)
        if d in ("corrupt_bytes", "codec_header_mismatch", "enum_codec"):
            assert r.clip_id in bad or i % 1000 == 500
    # and at least the two injected header defects are caught
    assert len(bad) >= 2
    _ = F


def test_speaking_rate_violations(spark):
    import pyspark.sql.functions as F
    rows = [
        ("ok", "hello there this is fine", 2000),      # 12 chars/sec
        ("fast", "x" * 900, 1000),                     # 900 chars/sec
        ("slow", "hi", 60000),                         # 0.03 chars/sec
        ("null_t", None, 2000),
        ("null_d", "some words here", None),
        ("zero_d", "some words here", 0),
    ]
    df = spark.createDataFrame(rows,
                               "clip_id string, transcript string, dur_ms int")
    got = {r.row_id: r for r in
           audio.speaking_rate_violations(df).collect()}
    # only implausible rates violate; NULL/zero durations are other
    # keywords' business
    assert set(got) == {"fast", "slow"}
    assert got["fast"].keyword == "x-rate"
    assert float(got["fast"].actual) == 900.0
    assert "1.0-40.0 chars/sec" in got["fast"].message


def test_speaking_rate_clean_on_fixture_valid_rows(spark, clips):
    # fixture transcripts are synthesized at plausible lengths for their
    # durations; the defect classes do not target rate, so wide bounds
    # must pass everything with a non-null transcript and duration
    v = audio.speaking_rate_violations(
        clips, lo=0.01, hi=10000.0)
    assert v.count() == 0


def test_x_rate_dsl_keyword(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame(
        [("ok", "hello there this is fine", 2000),
         ("fast", "x" * 900, 1000),
         ("null_d", "some words here", None)],
        "clip_id string, transcript string, dur_ms int")
    rs = {"type": "object", "properties": {"transcript": {
        "type": "string", "x-rate": {"duration": "dur_ms", "lo": 1,
                                     "hi": 40}}}}
    compiled = compile_ruleset(rs, df.schema, name="clips")
    assert "dur_ms" in compiled.columns_read
    rows = {r.row_id: r for r in
            validate(df, compiled, row_id="clip_id").violations.collect()}
    assert set(rows) == {"fast"}
    assert rows["fast"].keyword == "x-rate"
    assert float(rows["fast"].actual) == 900.0
    assert 'against "dur_ms"' in rows["fast"].message


def test_x_rate_missing_duration_column_surfaces(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError as RCE)
    df = spark.createDataFrame([("a", "t")],
                               "clip_id string, transcript string")
    rs = {"type": "object", "properties": {"transcript": {
        "type": "string", "x-rate": {"duration": "nope"}}}}
    compiled = compile_ruleset(rs, df.schema, name="clips")
    assert any(kw == "x-rate:nope" for _p, kw in compiled.unknown)
    assert not any(c.keyword == "x-rate" for c in compiled.checks)
    # malformed shapes fail compile
    import pytest as _pt
    for bad in ({"x-rate": {}}, {"x-rate": {"duration": "dur_ms",
                                            "lo": 40, "hi": 1}}):
        with _pt.raises(RCE):
            compile_ruleset({"type": "object", "properties": {
                "transcript": {"type": "string", **bad}}},
                df.schema, name="clips")
