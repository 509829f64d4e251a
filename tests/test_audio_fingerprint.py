"""Acoustic fingerprint + audio near-dup: re-noised / resampled copies of
a recording must pair within Hamming distance 3; different recordings must
not pair; undecodable payloads never pair."""

import numpy as np

from remark_lint_frontmatter_schema_spark.functions import audio


def _tone_wav(freq: float, sr: int, ms: int, seed: int, snr_db: float = 40.0):
    n = int(sr * ms / 1000)
    t = np.arange(n) / sr
    sig = 0.8 * np.sin(2 * np.pi * freq * t)
    rng = np.random.default_rng(seed)
    noise_rms = np.sqrt(np.mean(sig**2)) / (10 ** (snr_db / 20))
    x = np.clip((sig + rng.normal(0, noise_rms, n)) * 32767, -32768, 32767)
    return audio.wav_bytes(x.astype("<i2"), sr)


def test_fingerprint_deterministic_and_band_sensitive():
    a = _tone_wav(250, 16000, 400, seed=1)
    sr, x = audio.decode_wav_pcm16(a)
    w1 = audio.spectral_descriptors(x, sr)
    w2 = audio.spectral_descriptors(x, sr)
    assert len(w1) > 5 and (w1 == w2).all()
    fp1 = audio.fingerprint_from_descriptors(w1)
    _, y = audio.decode_wav_pcm16(_tone_wav(1400, 16000, 400, seed=1))
    fp2 = audio.fingerprint_from_descriptors(audio.spectral_descriptors(y, sr))
    assert fp1 != fp2
    assert bin((fp1 ^ fp2) & (2**64 - 1)).count("1") > 3  # far apart


def test_fingerprint_invariant_to_renoise_and_resample():
    sr_a, xa = audio.decode_wav_pcm16(_tone_wav(440, 16000, 400, seed=1))
    sr_b, xb = audio.decode_wav_pcm16(_tone_wav(440, 16000, 400, seed=2))
    sr_c, xc = audio.decode_wav_pcm16(_tone_wav(440, 8000, 400, seed=3))
    fa = audio.fingerprint_from_descriptors(audio.spectral_descriptors(xa, sr_a))
    fb = audio.fingerprint_from_descriptors(audio.spectral_descriptors(xb, sr_b))
    fc = audio.fingerprint_from_descriptors(audio.spectral_descriptors(xc, sr_c))
    def ham(p, q):
        return bin((p ^ q) & (2**64 - 1)).count("1")
    assert ham(fa, fb) <= 3   # re-noised copy
    assert ham(fa, fc) <= 3   # 8 kHz resample (absolute-Hz bands)


def test_audio_neardup_pairs_end_to_end(spark):
    rows = [
        ("a1", _tone_wav(440, 16000, 400, seed=1)),
        ("a2", _tone_wav(440, 16000, 400, seed=2)),   # re-noise of a1
        ("a3", _tone_wav(440, 8000, 400, seed=3)),    # resample of a1
        ("b1", _tone_wav(1400, 16000, 400, seed=4)),  # different recording
        ("c1", b"not audio at all"),                  # undecodable
        ("d1", None),                                 # NULL payload
    ]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = audio.audio_neardup_pairs(clips).collect()
    from remark_lint_frontmatter_schema_spark.operators.dedup import release_all
    release_all()
    pairs = {tuple(sorted((r.id_a, r.id_b))) for r in got}
    assert ("a1", "a2") in pairs and ("a1", "a3") in pairs, pairs
    flagged = {x for p in pairs for x in p}
    assert "b1" not in flagged and "c1" not in flagged and "d1" not in flagged


def test_fingerprint_nulls_for_short_or_bad_payloads():
    assert audio.fingerprint_from_descriptors(np.empty(0, np.uint16)) is None
    sr, x = audio.decode_wav_pcm16(_tone_wav(440, 16000, 400, seed=1))
    assert len(audio.spectral_descriptors(x[:100], sr)) == 0


def _gapped_wav(sr=16000):
    """100 ms tone, 100 ms silence (wider than the 60 ms bridge), 150 ms
    tone: expected segments [0,100) and [200,350) ms."""
    t = lambda ms: np.arange(int(sr * ms / 1000)) / sr
    tone = lambda ms, f: 0.5 * np.sin(2 * np.pi * f * t(ms))
    x = np.concatenate([tone(100, 440), np.zeros(int(sr * 0.1)),
                        tone(150, 440)])
    return audio.wav_bytes((x * 32767).astype("<i2"), sr)


def test_voiced_segments_split_on_silence(spark):
    clips = spark.createDataFrame(
        [("g1", _gapped_wav()), ("bad", b"junk"), ("nul", None)],
        "clip_id string, bytes binary")
    rows = sorted(audio.voiced_segments(clips).collect(),
                  key=lambda r: r.seg_idx)
    assert [r.clip_id for r in rows] == ["g1", "g1"]
    (s0, s1) = rows
    assert abs(s0.start_ms - 0) <= 20 and abs(s0.end_ms - 100) <= 20
    assert abs(s1.start_ms - 200) <= 20 and abs(s1.end_ms - 350) <= 20
    assert s0.rms > 0.2 and s1.rms > 0.2


def test_voiced_segments_bridge_short_gaps():
    # 5 voiced frames, 2-frame gap (< 3-frame bridge), 5 voiced frames
    fr = np.array([1, 1, 1, 1, 1, 0, 0, 1, 1, 1, 1, 1], dtype=float)
    runs = audio.detect_voiced_runs(fr, 0.5, min_gap_frames=3,
                                    min_seg_frames=2)
    assert runs == [(0, 12)]
    # same gap with bridge=2 splits; 1-frame run is dropped
    fr2 = np.array([1, 0, 0, 1, 1, 1], dtype=float)
    assert audio.detect_voiced_runs(fr2, 0.5, 2, 2) == [(3, 6)]


def test_normalization_gain(spark):
    df = spark.createDataFrame([(0.1,), (0.0,), (None,)], "rms double")
    got = [r[0] for r in df.select(
        audio.normalization_gain_col(-20.0)).collect()]
    assert got[0] == 0.0          # -20 dBFS == rms 0.1 exactly
    assert got[1] is None and got[2] is None


def _acoustic_clips(spark):
    return spark.createDataFrame(
        [("a1", _tone_wav(440, 16000, 400, seed=1)),
         ("a2", _tone_wav(440, 16000, 400, seed=2)),   # re-noise of a1
         ("a3", _tone_wav(440, 8000, 400, seed=3)),    # resample of a1
         ("b1", _tone_wav(1400, 16000, 400, seed=4)),
         ("c1", b"junk"), ("d1", None)],
        "clip_id string, bytes binary")


def test_dedup_violations_acoustic_transitive(spark):
    from remark_lint_frontmatter_schema_spark.operators import clusters
    got = clusters.dedup_violations(_acoustic_clips(spark), "bytes",
                                    "clip_id", method="acoustic")
    rows = {r.row_id: r for r in got.collect()}
    # {a1,a2,a3} is one cluster, survivor = min id a1; b1/c1/d1 clean
    assert set(rows) == {"a2", "a3"}
    assert rows["a2"].actual == "a1"
    assert "acoustic fingerprint Hamming <= 3" in rows["a2"].message


def test_x_dedup_acoustic_dsl_end_to_end(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    df = _acoustic_clips(spark)
    compiled = compile_ruleset(
        {"type": "object", "properties": {"bytes": {
            "x-dedup": {"id": "clip_id", "method": "acoustic",
                        "max_distance": 2}}}},
        df.schema, name="clips")
    assert compiled.table_checks[0][2]["method"] == "acoustic"
    assert compiled.table_checks[0][2]["max_distance"] == 2
    res = validate_with_table_checks(df, compiled, row_id="clip_id")
    assert {r.row_id for r in res.violations.collect()} == {"a2", "a3"}


def test_x_dedup_rejects_bad_max_distance(spark):
    import pytest
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    df = _acoustic_clips(spark)
    # distance 9 exceeds what chunk blocking over a 64-bit signature can
    # guarantee (8 chunks -> d <= 7) — malformed declaration fails at
    # compile (Ajv up-front semantics), matching hamming_pairs' refusal
    with pytest.raises(RulesetCompileError, match="x-dedup"):
        compile_ruleset(
            {"type": "object", "properties": {"bytes": {
                "x-dedup": {"id": "clip_id", "method": "acoustic",
                            "max_distance": 9}}}},
            df.schema, name="clips")


def test_voiced_content_dsl_check(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    silent = audio.wav_bytes(np.zeros(8000, dtype="<i2"), 16000)
    clips = spark.createDataFrame(
        [("ok", _tone_wav(440, 16000, 400, seed=1)),
         ("mute", silent), ("junk", b"xx"), ("nul", None)],
        "clip_id string, bytes binary")
    compiled = compile_ruleset(
        {"properties": {"bytes": {"x-spark-check": "voiced_content"}}},
        clips.schema, extra_checks=audio.register_audio_checks(),
        name="vad")
    res = validate(clips, compiled, row_id="clip_id")
    bad = {r.row_id for r in res.violations.collect()
           if "voiced_content" in r.message}
    # NULL bytes are presence-guarded like every keyword (JSON Schema
    # semantics: absent values are `required`'s business, not the check's)
    assert bad == {"mute", "junk"}, bad


def test_slice_segments_roundtrip_and_normalize(spark):
    clips = spark.createDataFrame(
        [("g1", _gapped_wav()), ("bad", b"junk")],
        "clip_id string, bytes binary")
    segs = {(r.clip_id, r.seg_idx): r for r in
            audio.slice_segments(clips, normalize_db=-20.0).collect()}
    assert set(segs) == {("g1", 0), ("g1", 1)}
    for (cid, k), r in segs.items():
        sr, x = audio.decode_wav_pcm16(bytes(r.bytes))  # valid container
        assert sr == 16000 and r.sr_hz == 16000
        # payload length matches the segment window
        assert abs(len(x) / sr * 1000 - (r.end_ms - r.start_ms)) < 1
        # normalized to -20 dBFS RMS (0.1), within clip headroom
        rms = float(np.sqrt(np.mean(x ** 2)))
        assert abs(rms - 0.1) < 0.01, rms
    # sliced content is the original window: segment 1 starts at the
    # second tone (200 ms in), so its samples correlate with a 440 Hz tone
    _, x1 = audio.decode_wav_pcm16(bytes(segs[("g1", 1)].bytes))
    spec = np.abs(np.fft.rfft(x1))
    peak_hz = np.argmax(spec) * 16000 / len(x1)
    assert abs(peak_hz - 440) < 15, peak_hz
