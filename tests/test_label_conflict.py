"""Label-conflict detection: acoustic near-duplicate clips carrying
transcripts that normalize differently are contradictory labels — both
members get a violation row naming the other. Formatting-only transcript
variants and NULL/empty transcripts never conflict."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.functions.audio import (
    transcript_conflict_violations)


def _tone_wav(freq, sr, ms, seed, snr_db=40.0):
    n = int(sr * ms / 1000)
    t = np.arange(n) / sr
    sig = 0.8 * np.sin(2 * np.pi * freq * t)
    rng = np.random.default_rng(seed)
    noise_rms = np.sqrt(np.mean(sig**2)) / (10 ** (snr_db / 20))
    x = np.clip((sig + rng.normal(0, noise_rms, n)) * 32767, -32768, 32767)
    return audio.wav_bytes(x.astype("<i2"), sr)


@pytest.fixture(scope="module")
def clips(spark):
    # a1/a2/a3: re-noisings of the SAME recording (near-dup audio).
    # a1 vs a2: same transcript up to case/punctuation -> no conflict.
    # a3: genuinely different transcript -> conflicts with both.
    # b1: different recording, different transcript -> no pair at all.
    # c1/c2: near-dup audio, transcripts NULL / empty -> skipped.
    rows = [
        ("a1", _tone_wav(440, 16000, 400, seed=1), "Hello, world!"),
        ("a2", _tone_wav(440, 16000, 400, seed=2), "hello world"),
        ("a3", _tone_wav(440, 16000, 400, seed=3), "goodbye world"),
        ("b1", _tone_wav(1800, 16000, 400, seed=4), "something else"),
        ("c1", _tone_wav(700, 16000, 400, seed=5), None),
        ("c2", _tone_wav(700, 16000, 400, seed=6), "..."),
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, transcript string")


def test_conflicts_found_and_normalization_respected(clips):
    v = transcript_conflict_violations(clips, max_distance=3)
    got = {(r.row_id, r.actual) for r in v.collect()}
    rows = {r.row_id: r for r in v.collect()}
    # a3 conflicts with a1 AND a2; each conflict emits both directions
    assert set(rows) == {"a1", "a2", "a3"}
    msgs = sorted(r.message for r in v.where("row_id = 'a3'").collect())
    assert msgs == [
        "Must not contradict the transcript of acoustic near-duplicate "
        "`a1`",
        "Must not contradict the transcript of acoustic near-duplicate "
        "`a2`",
    ]
    # a1 vs a2 differ only in case/punctuation: NOT among the conflicts
    a1 = [r for r in v.collect() if r.row_id == "a1"]
    assert all("a2" not in r.message for r in a1)
    # actual carries the acoustic Hamming distance (small, near-dup)
    assert all(int(a) <= 3 for _, a in got)
    # violation shape matches the row-validator relation
    assert rows["a3"].keyword == "x-label-conflict"
    assert rows["a3"].instance_path == "/transcript"
    assert rows["a3"].severity == "warning"


def test_edit_sim_grading_escalates_contradictions(clips):
    """Graded mode: 'hello world' vs 'goodbye world' is 7 edits over 13
    chars (edit_sim 0.4615) — below the default 0.5 knee, so the
    conflict escalates to error; lowering the knee under the measured
    similarity keeps it a warning. The message carries the measured
    similarity either way."""
    v = transcript_conflict_violations(clips, max_distance=3,
                                       grade_with_edit_sim=True)
    rows = v.collect()
    assert rows and all("(edit_sim " in r.message for r in rows)
    sims = {float(r.message.split("(edit_sim ")[1].rstrip(")"))
            for r in rows}
    assert all(0 < s_ < 1 for s_ in sims)
    # levenshtein('hello world', 'goodbye world') = 7 -> 1 - 7/13
    assert any(abs(s_ - 0.461538) < 1e-4 for s_ in sims)
    assert {r.severity for r in rows} == {"error"}
    # knee below the measured similarity: ASR-noise band, stays warning
    v2 = transcript_conflict_violations(clips, max_distance=3,
                                        grade_with_edit_sim=True,
                                        contradiction_below=0.3)
    assert {r.severity for r in v2.collect()} == {"warning"}
    # ungraded call unchanged (no edit_sim in messages)
    v3 = transcript_conflict_violations(clips, max_distance=3)
    assert all("edit_sim" not in r.message for r in v3.collect())


def test_matching_labels_and_null_transcripts_never_conflict(clips):
    v = transcript_conflict_violations(clips, max_distance=3)
    ids = {r.row_id for r in v.collect()}
    assert "b1" not in ids          # different audio: no pair
    assert "c1" not in ids and "c2" not in ids   # NULL/empty: skipped


def test_x_label_conflict_dsl_end_to_end(spark, clips):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    compiled = compile_ruleset(
        {"type": "object", "properties": {"bytes": {
            "x-label-conflict": {"id": "clip_id",
                                 "transcript": "transcript",
                                 "max_distance": 3}}}},
        clips.schema, name="clips")
    assert compiled.table_checks[0][0] == "label_conflict"
    res = validate_with_table_checks(clips, compiled, row_id="clip_id")
    got = {r.row_id for r in res.violations.collect()}
    assert got == {"a1", "a2", "a3"}
    assert all(r.ruleset_id == "clips"
               for r in res.violations.collect())


def test_x_label_conflict_dsl_grading(spark, clips):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    compiled = compile_ruleset(
        {"properties": {"bytes": {
            "x-label-conflict": {"id": "clip_id",
                                 "transcript": "transcript",
                                 "max_distance": 3, "grade": True}}}},
        clips.schema, name="clips")
    res = validate_with_table_checks(clips, compiled, row_id="clip_id")
    rows = res.violations.collect()
    # hello/goodbye world: edit_sim 0.4615 < 0.5 knee -> escalated
    assert rows and {r.severity for r in rows} == {"error"}
    assert all("(edit_sim " in r.message for r in rows)
    # an out-of-range knee is a compile-time refusal
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    import pytest as _pytest
    with _pytest.raises(RulesetCompileError, match="x-label-conflict"):
        compile_ruleset(
            {"properties": {"bytes": {
                "x-label-conflict": {"id": "clip_id",
                                     "transcript": "transcript",
                                     "contradiction_below": 1.5}}}},
            clips.schema, name="clips")


def test_x_label_conflict_rejects_bad_shape(spark, clips):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    with pytest.raises(RulesetCompileError, match="x-label-conflict"):
        compile_ruleset(
            {"properties": {"bytes": {
                "x-label-conflict": {"id": "clip_id",
                                     "transcript": "transcript",
                                     "max_distance": 9}}}},
            clips.schema, name="clips")


def test_x_label_conflict_nested_goes_unknown(spark):
    # table-level declaration below a top-level column (on a field of an
    # EXISTING struct column): collected as unknown (strict mode's
    # business, same convention as nested x-dedup), never silently run
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    df = spark.createDataFrame(
        [("a", (b"x",))],
        "clip_id string, meta struct<bytes: binary>")
    compiled = compile_ruleset(
        {"properties": {"meta": {"properties": {"bytes": {
            "x-label-conflict": {"id": "clip_id",
                                 "transcript": "transcript"}}}}}},
        df.schema, name="clips")
    assert not compiled.table_checks
    assert any(kw == "x-label-conflict" for _, kw in compiled.unknown)


def test_x_label_conflict_accepts_explicit_nulls(spark, clips):
    # YAML `max_distance: null` / `contradiction_below: null` means "use
    # the default" — dict.get does not apply defaults for present-but-
    # null keys, so the compiler must coerce, not crash
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    compiled = compile_ruleset(
        {"properties": {"bytes": {
            "x-label-conflict": {"id": "clip_id",
                                 "transcript": "transcript",
                                 "max_distance": None,
                                 "contradiction_below": None}}}},
        clips.schema, name="clips")
    params = compiled.table_checks[0][2]
    assert params["max_distance"] == 2
    assert params["contradiction_below"] == 0.5
