"""Composed audio curation: one decode pass -> gates + acoustic dedup,
first-failing-gate attribution, survivors by left-semi."""

import numpy as np

from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.operators import audio_curate
from remark_lint_frontmatter_schema_spark.operators.dedup import release_all

SR = 16000


def _wav(x):
    return audio.wav_bytes((np.clip(x, -1, 1) * 32767).astype("<i2"), SR)


def _tone(ms, freq, amp=0.6, seed=None):
    t = np.arange(int(SR * ms / 1000)) / SR
    x = amp * np.sin(2 * np.pi * freq * t)
    if seed is not None:
        x = x + np.random.default_rng(seed).normal(0, amp / 100, len(x))
    return x


def _clips(spark):
    rows = [
        ("k1", _wav(_tone(400, 440, seed=1)), 400),     # kept
        ("k2", _wav(_tone(400, 440, seed=2)), 400),     # duplicate of k1
        ("d1", _wav(_tone(400, 900)), 900),             # declared 900 != 400
        ("s1", _wav(np.concatenate([_tone(40, 700),
                                    np.zeros(int(SR * 0.36))])), 400),
        ("c1", _wav(1.8 * _tone(400, 1500, amp=1.0)), 400),  # hard-clipped
        ("u1", b"definitely not audio", 400),           # undecodable
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, dur_ms int")


def test_audio_curation_decisions_gates_and_attribution(spark):
    dec = {r.clip_id: r for r in
           audio_curate.audio_curation_decisions(_clips(spark)).collect()}
    release_all()
    assert dec["k1"].reason == "kept" and dec["k1"].kept
    assert dec["k2"].reason == "duplicate" and dec["k2"].dup_of == "k1"
    assert dec["d1"].reason == "duration_mismatch"
    assert dec["s1"].reason == "too_silent"
    assert dec["c1"].reason == "clipped"
    assert dec["u1"].reason == "undecodable"
    assert {k for k, r in dec.items() if r.kept} == {"k1"}


def test_audio_curate_survivors_keep_original_columns(spark):
    clips = _clips(spark)
    got = audio_curate.audio_curate(clips).collect()
    release_all()
    assert [r.clip_id for r in got] == ["k1"]
    assert got[0].dur_ms == 400 and got[0].bytes is not None


def test_one_decode_pass_plan(spark):
    """The decision plan must contain exactly ONE scan of the clips input
    (bytes read once): features+fingerprint come from a single map stage,
    and every downstream consumer reads the persisted feature relation."""
    clips = _clips(spark)
    dec = audio_curate.audio_curation_decisions(clips)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    release_all()
    # the only non-cached leaves are InMemoryTableScans of the feature
    # relation and the component edges' LogicalRDD checkpoints
    assert plan.count("Scan ExistingRDD[clip_id") <= 1, plan
