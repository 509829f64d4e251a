"""Spectral-shape descriptors (functions/audio.spectral_shape) and their
opt-in ride-along on the audio_features map-only stage."""

import numpy as np

from remark_lint_frontmatter_schema_spark.functions import audio


def _tone(freq, sr=16000, secs=1.0):
    t = np.arange(int(sr * secs)) / sr
    return 0.8 * np.sin(2 * np.pi * freq * t)


def test_pure_tone_centroid_tracks_frequency():
    for freq in (440.0, 1000.0, 3000.0):
        c, bw, roll, flat = audio.spectral_shape(_tone(freq), 16000)
        # Hann-windowed 512-pt spectrum: ~31 Hz bins, leakage spreads a
        # couple of bins around the tone
        assert abs(c - freq) < 60, (freq, c)
        assert bw < 150
        assert abs(roll - freq) < 100
        assert flat < 0.01


def test_white_noise_is_flat_and_broadband():
    rng = np.random.default_rng(7)
    x = rng.normal(0, 0.2, 16000)
    c, bw, roll, flat = audio.spectral_shape(x, 16000)
    # flat power over [0, 8000]: centroid ~ 4000, rolloff ~ 7600
    assert 3000 < c < 5000
    assert roll > 6500
    assert flat > 0.2
    # and far from the tone's values on every descriptor
    assert bw > 1000


def test_silence_and_empty_return_none():
    assert audio.spectral_shape(np.zeros(8000), 16000) is None
    assert audio.spectral_shape(np.empty(0), 16000) is None
    # sub-frame-length input still yields a (coarse) shape, not a crash
    assert audio.spectral_shape(_tone(1000)[:40], 16000) is not None


def test_features_ride_along_with_spectral(spark):
    rows = [("c1", audio.wav_bytes(audio._to_pcm16(_tone(1000)), 16000)),
            ("c2", audio.wav_bytes(audio._to_pcm16(_tone(3000)), 16000)),
            ("bad", b"RIFFnot-a-wav")]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    feats = {r.clip_id: r for r in audio.audio_features(
        clips, with_fingerprint=True, with_spectral=True).collect()}
    assert abs(feats["c1"].centroid_hz - 1000) < 60
    assert abs(feats["c2"].centroid_hz - 3000) < 60
    assert feats["c1"].flatness < 0.01
    # one decode powers rms + fp + spectral in the same row
    assert feats["c1"].fp is not None and feats["c1"].rms > 0
    bad = feats["bad"]
    assert bad.decode_ok is False
    assert bad.centroid_hz is None and bad.flatness is None


def test_features_without_spectral_keep_old_schema(spark):
    clips = spark.createDataFrame(
        [("c1", audio.synth_wav(1, 16000, 100))],
        "clip_id string, bytes binary")
    cols = audio.audio_features(clips).columns
    assert "centroid_hz" not in cols and "fp" not in cols


def test_tonal_content_named_check(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    rng = np.random.default_rng(3)
    rows = [("tone", audio.wav_bytes(audio._to_pcm16(_tone(800)), 16000)),
            ("noise", audio.wav_bytes(
                audio._to_pcm16(rng.normal(0, 0.2, 16000).clip(-1, 1)),
                16000)),
            ("silent", audio.wav_bytes(np.zeros(8000, dtype="<i2"), 16000)),
            ("corrupt", b"RIFFxxxx")]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    compiled = compile_ruleset(
        {"properties": {"bytes": {"x-spark-check": "tonal_content"}}},
        clips.schema, extra_checks=audio.register_audio_checks())
    res = validate(clips, compiled, row_id="clip_id")
    assert ({r.row_id for r in res.violations.collect()}
            == {"noise", "silent", "corrupt"})
