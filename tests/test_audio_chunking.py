"""Fixed-window audio chunking (functions/audio.chunk_clips): coverage,
tail rule, overlap, padding/dropping, and decode round-trip."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions import audio


def _clips(spark, ms_list, sr=16000):
    rows = []
    for i, ms in enumerate(ms_list):
        x = audio.sine_signal(i, sr, int(sr * ms / 1000))
        rows.append((f"c{i}", audio.wav_bytes(audio._to_pcm16(x), sr)))
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def test_nonoverlapping_cover_with_tail_rule(spark):
    # 2.5 s clip, 1 s windows: starts 0, 1000, and the tail lands at 1500
    df = _clips(spark, [2500])
    out = sorted(audio.chunk_clips(df, window_ms=1000).collect(),
                 key=lambda r: r.chunk_idx)
    assert [(r.start_ms, r.end_ms) for r in out] == [
        (0, 1000), (1000, 2000), (1500, 2500)]
    for r in out:
        sr, x = audio.decode_wav_pcm16(bytes(r.bytes))
        assert sr == 16000 and len(x) == 16000


def test_exact_multiple_no_redundant_tail(spark):
    df = _clips(spark, [2000])
    out = audio.chunk_clips(df, window_ms=1000).collect()
    assert sorted((r.start_ms, r.end_ms) for r in out) == [
        (0, 1000), (1000, 2000)]


def test_overlap_hop(spark):
    df = _clips(spark, [1500])
    out = sorted(audio.chunk_clips(df, window_ms=1000, hop_ms=500)
                 .collect(), key=lambda r: r.chunk_idx)
    assert [(r.start_ms, r.end_ms) for r in out] == [(0, 1000), (500, 1500)]


def test_short_clip_policies(spark):
    df = _clips(spark, [400])
    plain = audio.chunk_clips(df, window_ms=1000).collect()
    assert len(plain) == 1 and plain[0].end_ms == 400
    padded = audio.chunk_clips(df, window_ms=1000, pad_last=True).collect()
    sr, x = audio.decode_wav_pcm16(bytes(padded[0].bytes))
    assert len(x) == 16000 and padded[0].end_ms == 1000
    # padding is silence
    assert float(np.abs(x[8000:]).max()) == 0.0
    dropped = audio.chunk_clips(df, window_ms=1000,
                                min_last_ms=500).collect()
    assert dropped == []
    kept = audio.chunk_clips(df, window_ms=1000, min_last_ms=300).collect()
    assert len(kept) == 1


def test_payload_roundtrip_matches_source_samples(spark):
    sr = 16000
    x = audio.sine_signal(3, sr, sr * 2)
    df = spark.createDataFrame(
        [("c", audio.wav_bytes(audio._to_pcm16(x), sr))],
        "clip_id string, bytes binary")
    out = {r.chunk_idx: r for r in
           audio.chunk_clips(df, window_ms=1000).collect()}
    _, full = audio.decode_wav_pcm16(audio.wav_bytes(audio._to_pcm16(x), sr))
    for k, r in out.items():
        _, seg = audio.decode_wav_pcm16(bytes(r.bytes))
        np.testing.assert_allclose(seg, full[k * sr:(k + 1) * sr],
                                   atol=1e-4)


def test_undecodable_emits_nothing_and_guards(spark):
    df = spark.createDataFrame([("bad", b"not a wav"), ("null", None)],
                               "clip_id string, bytes binary")
    assert audio.chunk_clips(df, window_ms=500).collect() == []
    with pytest.raises(ValueError):
        audio.chunk_clips(df, window_ms=500, hop_ms=600)
    with pytest.raises(ValueError):
        audio.chunk_clips(df, window_ms=500, pad_last=True, min_last_ms=10)
