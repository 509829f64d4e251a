"""ITU-R BS.1770-4 integrated loudness: K-weighting coefficient pin
against the spec's published 48 kHz table, vectorized-biquad equivalence
vs a direct-form reference loop, the -3.01 LUFS full-scale 997 Hz sine
anchor, exact amplitude linearity, gating behavior, sample-rate
invariance, and the Spark surfaces (audio_features with_loudness,
x-spark-check speech_loudness)."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
from remark_lint_frontmatter_schema_spark.functions import audio


def _sine(f, fs, sec=2.0, amp=1.0):
    return amp * np.sin(2 * np.pi * f * np.arange(int(fs * sec)) / fs)


def test_kweight_48k_matches_published_table():
    """BS.1770-4 Table 1/2 coefficients, reproduced by the any-rate
    bilinear re-derivation at fs=48000."""
    (sb, sa), (hb, ha) = audio._kweight_sections(48000.0)
    assert np.allclose(sb, [1.53512485958697, -2.69169618940638,
                            1.19839281085285], atol=1e-10)
    assert np.allclose(sa, [1.0, -1.69065929318241, 0.73248077421585],
                       atol=1e-10)
    assert np.allclose(hb, [1.0, -2.0, 1.0], atol=0)
    assert np.allclose(ha, [1.0, -1.99004745483398, 0.99007225036621],
                       atol=1e-10)


@pytest.mark.parametrize("fs", [8000, 16000, 48000])
def test_biquad_matches_direct_form_loop(fs):
    rng = np.random.default_rng(fs)
    x = rng.normal(0, 0.3, 4000)

    def loop(x, b, a):
        y = np.zeros(len(x))
        for n in range(len(x)):
            y[n] = b[0] * x[n]
            if n >= 1:
                y[n] += b[1] * x[n - 1] - a[1] * y[n - 1]
            if n >= 2:
                y[n] += b[2] * x[n - 2] - a[2] * y[n - 2]
        return y

    for b, a in audio._kweight_sections(float(fs)):
        assert np.allclose(audio._biquad(x, b, a), loop(x, b, a),
                           atol=1e-9)


def test_full_scale_997hz_sine_is_minus_3_lufs():
    """The spec's anchor: a 0 dBFS 997 Hz sine measures -3.01 LUFS
    (K-weighting is ~unity at 1 kHz; sine power is -3.01 dB)."""
    assert audio.integrated_lufs(_sine(997, 48000), 48000) \
        == pytest.approx(-3.01, abs=0.05)


@pytest.mark.parametrize("fs", [8000, 16000, 44100])
def test_sample_rate_invariance(fs):
    assert audio.integrated_lufs(_sine(997, fs), fs) \
        == pytest.approx(-3.01, abs=0.1)


def test_amplitude_linearity_exact():
    fs = 16000
    hi = audio.integrated_lufs(_sine(997, fs), fs)
    lo = audio.integrated_lufs(_sine(997, fs, amp=0.5), fs)
    assert hi - lo == pytest.approx(20 * np.log10(2), abs=0.01)


def test_kweighting_shape():
    """The published K-weighting curve: ~-4.5 dB at 50 Hz (gentle RLB
    high-pass, f0~38 Hz Q=0.5), ~+4 dB shelf boost at 8 kHz."""
    fs = 48000
    mid = audio.integrated_lufs(_sine(997, fs, amp=0.3), fs)
    low = audio.integrated_lufs(_sine(50, fs, amp=0.3), fs)
    high = audio.integrated_lufs(_sine(8000, fs, amp=0.3), fs)
    assert low == pytest.approx(mid - 4.6, abs=1.0)
    assert high == pytest.approx(mid + 4.0, abs=0.7)


def test_gating_ignores_long_quiet_tail():
    """Loud half + near-silent half: the relative gate drops the quiet
    blocks, so integrated loudness stays near the loud-only value
    instead of the ~3 dB drop an ungated mean would show."""
    fs = 16000
    loud = _sine(500, fs, sec=2.0, amp=0.3)
    quiet = _sine(500, fs, sec=2.0, amp=1e-5)
    gated = audio.integrated_lufs(np.concatenate([loud, quiet]), fs)
    loud_only = audio.integrated_lufs(loud, fs)
    assert gated == pytest.approx(loud_only, abs=1.0)


def test_silence_and_empty_are_none():
    assert audio.integrated_lufs(np.zeros(16000), 16000) is None
    assert audio.integrated_lufs(np.zeros(0), 16000) is None


def test_short_clip_fallback_single_block():
    """Clips under one 400 ms gating block measure as one whole-clip
    block (documented deviation) — a finite float, not None."""
    fs = 16000
    v = audio.integrated_lufs(_sine(440, fs, sec=0.05, amp=0.1), fs)
    assert v is not None and np.isfinite(v)


def test_audio_features_with_loudness(spark):
    rows = [("loud", audio.wav_bytes(audio._to_pcm16(_sine(440, 16000,
                                                           amp=0.25)),
                                     16000)),
            ("quiet", audio.wav_bytes(audio._to_pcm16(_sine(440, 16000,
                                                            amp=0.005)),
                                      16000)),
            ("broken", b"RIFFnope")]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r.clip_id: r for r in
           audio.audio_features(df, with_loudness=True).collect()}
    assert "integrated_lufs" in audio.audio_features(
        df, with_loudness=True).columns
    # int16 quantization in the WAV payload shifts LUFS by <0.01
    assert out["loud"].integrated_lufs == pytest.approx(
        float(audio.integrated_lufs(_sine(440, 16000, amp=0.25), 16000)),
        abs=0.01)
    assert out["loud"].integrated_lufs > out["quiet"].integrated_lufs + 25
    assert out["broken"].integrated_lufs is None
    # flag off -> column absent (schema stability for existing callers)
    assert "integrated_lufs" not in audio.audio_features(df).columns


def test_speech_loudness_dsl_check(spark):
    """x-spark-check: speech_loudness flags too-quiet and undecodable
    payloads inside the one-projection validation pass."""
    rows = [("ok", audio.wav_bytes(audio._to_pcm16(_sine(300, 16000,
                                                         amp=0.1)),
                                   16000)),
            ("too_quiet", audio.wav_bytes(
                audio._to_pcm16(_sine(300, 16000, amp=1e-4)), 16000)),
            ("broken", b"\x00\x01")]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    rs = {"properties": {"bytes": {"x-spark-check": "speech_loudness"}},
          "required": ["bytes"]}
    compiled = compile_ruleset(rs, df.schema,
                               extra_checks=audio.register_audio_checks())
    res = validate(df, compiled, row_id="clip_id")
    bad = {r.row_id for r in res.violations.collect()}
    assert bad == {"too_quiet", "broken"}
