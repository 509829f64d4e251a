"""normalize_loudness_clips: LUFS-targeted gain with peak ceiling."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions.audio import (
    decode_wav_pcm16, integrated_lufs, normalize_loudness_clips,
    wav_bytes, _to_pcm16)


def _clip(spark, rows):
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def _tone(amp, sr=16000, ms=600, f=440.0):
    t = np.arange(int(sr * ms / 1000)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float64)


def test_normalizes_quiet_and_loud_to_target(spark):
    sr = 16000
    quiet = wav_bytes(_to_pcm16(_tone(0.01)), sr)
    loud = wav_bytes(_to_pcm16(_tone(0.5)), sr)
    df = _clip(spark, [("q", bytearray(quiet)), ("l", bytearray(loud))])
    out = {r.clip_id: r for r in normalize_loudness_clips(
        df, target_lufs=-23.0).collect()}
    for cid in ("q", "l"):
        r = out[cid]
        assert r.limited is False
        got_sr, x = decode_wav_pcm16(bytes(r.bytes))
        assert got_sr == sr
        relufs = integrated_lufs(x, sr)
        # re-measured loudness lands on target (PCM16 quantization slack)
        assert relufs == pytest.approx(-23.0, abs=0.6)
    assert out["q"].gain_db > 0 > out["l"].gain_db


def test_peak_ceiling_limits_gain(spark):
    sr = 16000
    # very quiet tone: reaching -10 LUFS would need amp > ceiling
    b = wav_bytes(_to_pcm16(_tone(0.003)), sr)
    df = _clip(spark, [("p", bytearray(b))])
    r = normalize_loudness_clips(df, target_lufs=-3.0,
                                 peak_dbfs=-6.0).collect()[0]
    assert r.limited is True
    _, x = decode_wav_pcm16(bytes(r.bytes))
    peak = float(np.max(np.abs(x)))
    assert peak <= 10 ** (-6.0 / 20.0) + 2 / 32768


def test_silence_passthrough_and_undecodable_dropped(spark):
    sr = 16000
    silent = wav_bytes(np.zeros(8000, dtype=np.int16), sr)
    rows = [("s", bytearray(silent)), ("bad", bytearray(b"not audio")),
            ("n", None)]
    out = normalize_loudness_clips(_clip(spark, rows)).collect()
    assert [r.clip_id for r in out] == ["s"]
    r = out[0]
    assert r.measured_lufs is None and r.gain_db == 0.0
    assert not r.limited
    _, x = decode_wav_pcm16(bytes(r.bytes))
    assert float(np.max(np.abs(x))) == 0.0


def test_passthrough_and_guard(spark):
    sr = 16000
    b = wav_bytes(_to_pcm16(_tone(0.1)), sr)
    df = spark.createDataFrame([("c1", bytearray(b), "hello")],
                               "clip_id string, bytes binary, "
                               "transcript string")
    out = normalize_loudness_clips(df, passthrough=("transcript",)) \
        .collect()
    assert out[0].transcript == "hello"
    with pytest.raises(ValueError):
        normalize_loudness_clips(df, passthrough=("nope",))
