"""Speech-vs-noise SNR estimation (functions/audio.py snr_estimate /
snr_violations): numpy-reference parity on synthetic clips, the
digital-silence clamp, degenerate-side NULLs, and the violation gate."""

import numpy as np

from remark_lint_frontmatter_schema_spark.functions import audio


def _clip(sr, speech_amp, noise_amp, speech_ms=400, noise_ms=400, seed=0):
    """speech_ms of sine at speech_amp followed by noise_ms of uniform
    noise at noise_amp (rms = noise_amp/sqrt(3))."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(sr * speech_ms / 1000)) / sr
    speech = speech_amp * np.sin(2 * np.pi * 440 * t)
    noise = noise_amp * (2 * rng.rand(int(sr * noise_ms / 1000)) - 1)
    return audio.wav_bytes(audio._to_pcm16(np.concatenate([speech, noise])), sr)


def _reference_snr(b, frame_ms=20, silence_db=-40.0):
    sr, x = audio.decode_payload_any(b)
    flen = int(sr * frame_ms / 1000)
    n = len(x) // flen
    power = np.mean(x[: n * flen].reshape(n, flen) ** 2, axis=1)
    runs = audio.detect_voiced_runs(np.sqrt(power), 10 ** (-40 / 20), 3, 2)
    voiced = np.zeros(n, dtype=bool)
    for s, e in runs:
        voiced[s:e] = True
    p_n = max(float(power[~voiced].mean()), (1 / 32768) ** 2)
    return 10 * np.log10(float(power[voiced].mean()) / p_n)


def test_snr_matches_numpy_reference(spark):
    sr = 16000
    clips = spark.createDataFrame(
        [("clean", bytearray(_clip(sr, 0.5, 0.003))),
         ("noisy", bytearray(_clip(sr, 0.02, 0.009, seed=1)))],
        "clip_id string, bytes binary")
    got = {r.clip_id: r for r in
           audio.snr_estimate(clips, frame_ms=20).collect()}
    for cid in ("clean", "noisy"):
        raw = bytes(_clip(sr, 0.5, 0.003)) if cid == "clean" \
            else bytes(_clip(sr, 0.02, 0.009, seed=1))
        assert abs(got[cid].snr_vad_db - _reference_snr(raw)) < 1e-9
    assert got["clean"].snr_vad_db > 35 > got["noisy"].snr_vad_db
    assert got["clean"].voiced_ms >= 380
    # floor estimator agrees on ordering and is defined for both
    assert got["clean"].snr_floor_db > got["noisy"].snr_floor_db


def test_snr_digital_silence_clamps_not_overflows(spark):
    sr = 16000
    t = np.arange(sr // 2) / sr
    samples = np.concatenate([0.5 * np.sin(2 * np.pi * 440 * t),
                              np.zeros(sr // 2)])
    clips = spark.createDataFrame(
        [("c", bytearray(audio.wav_bytes(audio._to_pcm16(samples), sr)))],
        "clip_id string, bytes binary")
    r = audio.snr_estimate(clips).first()
    assert r.snr_vad_db is not None and np.isfinite(r.snr_vad_db)
    assert 60 < r.snr_vad_db < 100          # saturates near the LSB bound


def test_snr_degenerate_sides_and_decode_failure(spark):
    sr = 16000
    t = np.arange(sr) / sr
    all_speech = audio.wav_bytes(audio._to_pcm16(0.5 * np.sin(2 * np.pi * 300 * t)), sr)
    all_silent = audio.wav_bytes(np.zeros(sr, dtype="<i2"), sr)
    clips = spark.createDataFrame(
        [("speech", bytearray(all_speech)),
         ("silent", bytearray(all_silent)),
         ("garbage", bytearray(b"not audio at all"))],
        "clip_id string, bytes binary")
    got = {r.clip_id: r for r in audio.snr_estimate(clips).collect()}
    assert got["speech"].decode_ok and got["speech"].snr_vad_db is None
    assert got["speech"].snr_floor_db is not None   # percentile form holds
    assert got["silent"].snr_vad_db is None
    assert not got["garbage"].decode_ok
    assert got["garbage"].snr_vad_db is None \
        and got["garbage"].snr_floor_db is None


def test_snr_violations_gate(spark):
    sr = 16000
    clips = spark.createDataFrame(
        [("clean", bytearray(_clip(sr, 0.5, 0.003))),
         ("noisy", bytearray(_clip(sr, 0.02, 0.009, seed=1))),
         ("silent", bytearray(audio.wav_bytes(np.zeros(sr, dtype="<i2"), sr)))],
        "clip_id string, bytes binary")
    got = audio.snr_violations(clips, min_snr_db=20.0).collect()
    assert [r.row_id for r in got] == ["noisy"]
    assert got[0].keyword == "x-snr" and "SNR >= 20 dB" in got[0].message
