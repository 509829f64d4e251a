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


def test_integrity_ride_along_dropout_and_dc(spark):
    """with_integrity adds dropout_ratio (stuck-sample runs) + dc_offset
    from the SAME decode; the default schema stays unchanged."""
    x = _tone(440, 16000, 1000) * 0.5
    damaged = x.copy()
    damaged[4000:6000] = damaged[4000]          # 2000-sample dropout
    offset = np.clip(x + 0.11, -1.0, 1.0)       # DC-shifted clip
    rows = {r.clip_id: r for r in audio.audio_features(
        spark.createDataFrame(
            [("clean", audio.wav_bytes(audio._to_pcm16(x), 16000)),
             ("drop", audio.wav_bytes(audio._to_pcm16(damaged), 16000)),
             ("dc", audio.wav_bytes(audio._to_pcm16(offset), 16000)),
             ("bad", b"RIFFxxxx")],
            "clip_id string, bytes binary"),
        with_integrity=True).collect()}
    n = len(x)
    assert abs(rows["drop"].dropout_ratio - 2000 / n) < 0.01
    assert rows["clean"].dropout_ratio < 0.005
    assert abs(rows["dc"].dc_offset - 0.11) < 0.01
    assert abs(rows["clean"].dc_offset) < 0.005
    assert rows["bad"].dropout_ratio is None and rows["bad"].dc_offset is None
    assert "dropout_ratio" not in audio.audio_features(
        spark.createDataFrame(
            [("c", audio.wav_bytes(audio._to_pcm16(x), 16000))],
            "clip_id string, bytes binary")).columns


def test_not_clipped_named_check(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    clean = _tone(800) * 0.5
    hot = np.clip(_tone(800) * 3.0, -1.0, 1.0)     # ~60% of samples saturate
    rows = [("clean", audio.wav_bytes(audio._to_pcm16(clean), 16000)),
            ("hot", audio.wav_bytes(audio._to_pcm16(hot), 16000)),
            ("corrupt", b"RIFFxxxx")]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    compiled = compile_ruleset(
        {"properties": {"bytes": {"x-spark-check": "not_clipped"}}},
        clips.schema, extra_checks=audio.register_audio_checks())
    res = validate(clips, compiled, row_id="clip_id")
    assert ({r.row_id for r in res.violations.collect()}
            == {"hot", "corrupt"})
    # the gate agrees with audio_features' clipping_ratio definition
    feats = {r.clip_id: r.clipping_ratio
             for r in audio.audio_features(clips).collect()}
    assert feats["clean"] < 0.01 < feats["hot"]


# ---------------------------------------------------------------------------
# clip-level MFCC (mel filterbank + orthonormal DCT-II, numpy-only)
# ---------------------------------------------------------------------------

def test_mfcc_gain_moves_only_c0_on_broadband(spark):
    """log-mel linearity: scaling a broadband signal by g adds log(g^2) to
    every mel energy, which the orthonormal DCT routes entirely into c0 —
    higher coefficients are gain-invariant (the classic MFCC property)."""
    rng = np.random.default_rng(7)
    x = rng.normal(0.0, 0.1, 16000)
    a = audio.mel_mfcc(x, 16000)
    b = audio.mel_mfcc(4.0 * x, 16000)
    assert len(a) == 13 and all(np.isfinite(a))
    assert b[0] > a[0] + 1.0
    assert np.allclose(a[1:], b[1:], atol=1e-6)


def test_mfcc_separates_timbres_and_is_deterministic(spark):
    sr = 16000
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    bright = 0.5 * np.sin(2 * np.pi * 3500 * t)
    noise = np.random.default_rng(3).normal(0.0, 0.2, sr)
    m_tone = np.array(audio.mel_mfcc(tone, sr))
    m_bright = np.array(audio.mel_mfcc(bright, sr))
    m_noise = np.array(audio.mel_mfcc(noise, sr))
    assert np.array_equal(m_tone, np.array(audio.mel_mfcc(tone, sr)))
    # distinct timbres land far apart; a repeated render lands exactly
    assert np.linalg.norm(m_tone - m_bright) > 1.0
    assert np.linalg.norm(m_tone - m_noise) > 1.0
    # silence / empty: nothing to summarize
    assert audio.mel_mfcc(np.zeros(1000), sr) is None
    assert audio.mel_mfcc(np.array([]), sr) is None


def test_mfcc_rides_audio_features_and_feeds_x_embedding(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    rows = [("c0", audio.synth_wav(0, 16000, 200)),
            ("c1", audio.synth_wav(1, 16000, 200)),
            ("bad", b"\x00\x01nota wav")]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    feats = audio.audio_features(df, with_mfcc=True).collect()
    by_id = {r.clip_id: r for r in feats}
    assert len(by_id["c0"].mfcc) == 13
    assert all(np.isfinite(v) for v in by_id["c0"].mfcc)
    assert by_id["c0"].mfcc != by_id["c1"].mfcc
    assert by_id["bad"].mfcc is None and not by_id["bad"].decode_ok
    # legacy columns unchanged by the ride-along
    assert by_id["c0"].dur_ms_payload == 200
    # the MFCC column is a first-class vector for the embedding checks
    fdf = audio.audio_features(df, with_mfcc=True)
    compiled = compile_ruleset(
        {"properties": {"mfcc": {"x-embedding": {"dim": 13,
                                                 "finite": True}}}},
        fdf.schema, name="mfq")
    assert validate(fdf, compiled, row_id="clip_id") \
        .violations.count() == 0
