"""decode_payload_any: the round-3 codec-transparent payload-op path.

Round 2 required a `transcode_clips` materialization before any payload
analysis of compressed/telephony clips; round 3's payload operators
(features, VAD, fingerprints, loudness, augmentation, chunking) decode
every engine codec in place. The flagship consequence, pinned here: the
SAME recording shipped as PCM16 WAV, FLAC, G.711 and 24-bit EXTENSIBLE
WAV fingerprints to the same acoustic signature and is recovered as one
near-dup cluster across containers — content dedup that container-level
hashing can never see."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.functions import pcm_codecs as pc


def _sig(ms=600, sr=16000):
    t = np.arange(int(sr * ms / 1000)) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.25 * np.sin(2 * np.pi * 1310 * t)
         + 0.1 * np.sin(2 * np.pi * 2217 * t))
    env = np.minimum(1.0, np.arange(len(t)) / (0.05 * sr))
    return x * env


def _containers(x, sr=16000):
    x16 = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    xf = x16.astype(np.float64) / 32767.0
    return {
        "wav": audio.wav_bytes(x16, sr),
        "flac": audio.flac_encode(x16, sr),
        "mulaw": pc.wav_bytes_g711(x16, sr, law="mulaw"),
        "s24x": pc.wav_bytes_pcm(xf, sr, bits=24, extensible=True),
        "f32": pc.wav_bytes_pcm(xf, sr, bits=32, fmt="float"),
    }


def test_decode_payload_any_consistency():
    """Every container of the same signal decodes to the same samples
    within its codec's quantization floor."""
    x = _sig()
    ref = None
    for name, b in _containers(x).items():
        sr, y = audio.decode_payload_any(b)
        assert sr == 16000
        if ref is None:
            ref = y
        floor = 30.0 if name == "mulaw" else 60.0
        assert audio.snr_db(ref, y) > floor, name
    with pytest.raises(ValueError):
        audio.decode_payload_any(b"OggS not decodable here")
    with pytest.raises(ValueError):
        audio.decode_payload_any(b"\x00\x01junk")


def test_cross_codec_fingerprint_match(spark):
    """One recording in four containers -> one near-dup cluster; a
    different recording never joins it."""
    x = _sig()
    rng = np.random.default_rng(11)
    t = np.arange(len(x)) / 16000
    other = (0.4 * np.sin(2 * np.pi * 233 * t)      # different spectrum
             + 0.3 * rng.standard_normal(len(x)))
    rows = [(f"same_{k}", v) for k, v in _containers(x).items()]
    rows += [("other_wav", audio.wav_bytes(
        np.clip(other * 32767, -32768, 32767).astype("<i2"), 16000))]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    pairs = {(r["id_a"], r["id_b"])
             for r in audio.audio_neardup_pairs(
                 clips, max_distance=3).collect()}
    same = sorted(f"same_{k}" for k in _containers(x))
    expected = {(a, b) for i, a in enumerate(same) for b in same[i + 1:]}
    assert pairs == expected


def test_cross_codec_features_and_loudness(spark):
    """Feature rows (duration, rms) and BS.1770 loudness agree across
    containers of the same audio within codec floors — no transcode
    stage in the plan."""
    x = _sig()
    rows = [(k, v) for k, v in _containers(x).items()]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    feats = {r["clip_id"]: r for r in audio.audio_features(
        clips, with_loudness=True).collect()}
    assert set(feats) == set(_containers(x))
    ref = feats["wav"]
    for k, r in feats.items():
        assert r["decode_ok"], k
        assert abs(r["dur_ms_payload"] - ref["dur_ms_payload"]) <= 1, k
        assert abs(r["rms"] - ref["rms"]) < 0.02, k
        assert abs(r["integrated_lufs"] - ref["integrated_lufs"]) < 0.5, k


def test_vad_checks_cover_all_codecs(spark):
    """voiced/tonal/clipped DSL checks run on every codec in place."""
    x = _sig()
    vals = list(_containers(x).values())
    clips = spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(vals)],
        "clip_id string, bytes binary")
    from pyspark.sql import functions as F
    out = clips.select(
        audio.has_tonal_content(F.col("bytes")).alias("tonal"),
        audio.has_voiced_content(F.col("bytes")).alias("voiced"),
        audio.is_not_clipped(F.col("bytes")).alias("ok")).collect()
    assert all(r["tonal"] and r["voiced"] and r["ok"] for r in out)


def test_canonicalize_mixed_codec_corpus(spark):
    """canonicalize_clips normalizes a mixed-codec corpus in one stage:
    every engine container lands at mono PCM16 target_sr with the source
    rate/channels reported from container metadata."""
    x = _sig(sr=22050)
    x16 = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    xf = x16.astype(np.float64) / 32767.0
    stereo = np.stack([xf, xf * 0.5], axis=1)
    rows = [
        ("wav", audio.wav_bytes(x16, 22050)),
        ("flac", audio.flac_encode(x16, 22050)),
        ("mulaw", pc.wav_bytes_g711(x16, 22050, law="mulaw")),
        ("s24st", pc.wav_bytes_pcm(stereo, 22050, bits=24,
                                   extensible=True)),
        ("bad", b"\x00 undecodable"),
    ]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in audio.canonicalize_clips(
        clips, target_sr=16000).collect()}
    assert set(out) == {"wav", "flac", "mulaw", "s24st"}  # bad dropped
    for k, r in out.items():
        assert (r["src_sr_hz"], r["sr_hz"]) == (22050, 16000)
        sr, y = audio.decode_wav_pcm16(bytes(r["bytes"]))
        assert sr == 16000 and len(y) == r["n_samples"]
    assert out["s24st"]["src_channels"] == 2
    assert out["wav"]["src_channels"] == 1
    # content survives the codec + resample trip (trim the sinc edges)
    ref = audio.resample_sinc(xf, 22050, 16000)
    for k in ("wav", "flac", "s24st"):
        _, y = audio.decode_wav_pcm16(bytes(out[k]["bytes"]))
        exp = ref if k != "s24st" else audio.resample_sinc(
            stereo.mean(axis=1), 22050, 16000)
        m = min(len(y), len(exp))
        assert audio.snr_db(exp[64:m - 64], y[64:m - 64]) > 35.0, k
