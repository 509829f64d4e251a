"""Canonicalization stage: chunk-walking WAV decode (stereo / extra
chunks), windowed-sinc resampling fidelity, and the composed
canonicalize_clips operator — the mixed-provenance-corpus normalization
pass (mono 16 kHz PCM16) a training pipeline runs before ingestion."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions import audio


def _tone(freq, sr, ms, amp=0.5):
    t = np.arange(int(sr * ms / 1000), dtype=np.float64) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def _pcm(x):
    return np.clip(x * 32767.0, -32768, 32767).astype("<i2")


# ---------------------------------------------------------------------------
# chunk-walking parser
# ---------------------------------------------------------------------------

def test_parser_accepts_extra_chunks_identically():
    x = _tone(440, 16000, 100)
    canonical = audio.wav_bytes(_pcm(x), 16000)
    info_body = b"INFO" + b"IART" + (4).to_bytes(4, "little") + b"ab\x00\x00"
    info = b"LIST" + len(info_body).to_bytes(4, "little") + info_body
    padded = audio.wav_bytes_multi(_pcm(x), 16000, extra_chunks=info)
    sr_a, xa = audio.decode_wav_pcm16(canonical)
    sr_b, xb = audio.decode_wav_pcm16(padded)
    assert sr_a == sr_b == 16000
    np.testing.assert_array_equal(xa, xb)


def test_parser_honors_odd_chunk_padding():
    # a 3-byte chunk must be followed by one pad byte before `data`
    x = _tone(300, 8000, 50)
    odd = b"junk" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    b = audio.wav_bytes_multi(_pcm(x), 8000, extra_chunks=odd)
    sr, got = audio.decode_wav_pcm16(b)
    assert sr == 8000 and len(got) == len(x)


def test_stereo_downmix_is_channel_mean():
    left = _tone(440, 16000, 100)
    right = np.zeros_like(left)
    stereo = audio.wav_bytes_multi(
        np.stack([_pcm(left), _pcm(right)], axis=1), 16000)
    sr, got = audio.decode_wav_pcm16(stereo)
    assert sr == 16000
    # mean(L, 0) == L/2, up to int16 quantization
    assert audio.snr_db(left / 2, got) >= 40.0
    # opposite-phase channels cancel to silence
    anti = audio.wav_bytes_multi(
        np.stack([_pcm(left), _pcm(-left)], axis=1), 16000)
    _, z = audio.decode_wav_pcm16(anti)
    assert float(np.max(np.abs(z))) < 1e-4


def test_parser_rejects_malformed_still():
    with pytest.raises(ValueError):
        audio.decode_wav_pcm16(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks
    with pytest.raises(ValueError):
        audio.decode_wav_pcm16(b"not audio at all")
    # truncated data chunk (declared size > available bytes)
    good = audio.wav_bytes(_pcm(_tone(440, 16000, 50)), 16000)
    with pytest.raises(ValueError):
        audio.decode_wav_pcm16(good[:-10])
    # non-PCM format tag
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3  # IEEE float tag
    with pytest.raises(ValueError):
        audio.decode_wav_pcm16(bytes(bad_fmt))


# ---------------------------------------------------------------------------
# windowed-sinc resampler
# ---------------------------------------------------------------------------

def test_resample_length_and_identity():
    x = _tone(440, 16000, 100)
    assert audio.resample_sinc(x, 16000, 16000) is not x
    np.testing.assert_array_equal(audio.resample_sinc(x, 16000, 16000), x)
    y = audio.resample_sinc(x, 16000, 8000)
    assert len(y) == round(len(x) * 8000 / 16000)


def test_resample_tone_fidelity_down_and_up():
    # passband tone survives rate conversion: compare against the
    # analytically generated target-rate tone (edges trimmed — the tap
    # window is truncated there by construction)
    for sr_in, sr_out in [(22050, 16000), (8000, 16000), (44100, 16000)]:
        n_ms = 200
        x = _tone(420, sr_in, n_ms)
        y = audio.resample_sinc(x, sr_in, sr_out)
        ref = _tone(420, sr_out, n_ms)
        m = min(len(y), len(ref))
        trim = 64
        got = audio.snr_db(ref[trim:m - trim], y[trim:m - trim])
        assert got >= 35.0, (sr_in, sr_out, got)


def test_resample_preserves_dc_exactly():
    x = np.full(1000, 0.25)
    y = audio.resample_sinc(x, 22050, 16000)
    np.testing.assert_allclose(y, 0.25, atol=1e-9)


def test_resample_antialiases_above_target_nyquist():
    # 6 kHz tone downsampled 22050 -> 8000: above the 4 kHz target
    # Nyquist, so an anti-aliased resampler must attenuate it, not fold it
    x = _tone(6000, 22050, 200)
    y = audio.resample_sinc(x, 22050, 8000)
    in_rms = float(np.sqrt(np.mean(x ** 2)))
    out_rms = float(np.sqrt(np.mean(y ** 2)))
    assert out_rms < 0.2 * in_rms  # >= 14 dB down


def test_resample_empty_and_bad_rates():
    assert len(audio.resample_sinc(np.empty(0), 16000, 8000)) == 0
    with pytest.raises(ValueError):
        audio.resample_sinc(np.ones(10), 0, 8000)


def test_resample_properties_random_inputs():
    # property sweep (deterministic seed): any signal, any rate pair from
    # the realistic domain -> exact length formula, bounded output, and
    # constant signals stay constant (weight normalization). The bound is
    # a blow-up guard at the sinc Lebesgue-constant level (~log taps):
    # negative lobes mean interpolation may legitimately overshoot
    # max|x|, especially on few-sample inputs where edge rows renormalize
    import hypothesis.strategies as st
    from hypothesis import given, settings

    rates = st.sampled_from([8000, 11025, 16000, 22050, 24000, 44100, 48000])

    @settings(max_examples=60, deadline=None)
    @given(sr_in=rates, sr_out=rates,
           n=st.integers(min_value=1, max_value=4000),
           seed=st.integers(min_value=0, max_value=2**31))
    def prop(sr_in, sr_out, n, seed):
        x = np.random.default_rng(seed).uniform(-1, 1, n)
        y = audio.resample_sinc(x, sr_in, sr_out)
        if sr_in == sr_out:
            np.testing.assert_array_equal(y, x)
        else:
            assert len(y) == max(1, round(n * sr_out / sr_in))
        assert np.all(np.isfinite(y))
        assert float(np.max(np.abs(y), initial=0.0)) <= 3.0
        c = audio.resample_sinc(np.full(n, 0.5), sr_in, sr_out)
        np.testing.assert_allclose(c, 0.5, atol=1e-9)

    prop()


# ---------------------------------------------------------------------------
# composed canonicalize_clips (Spark, map-only)
# ---------------------------------------------------------------------------

def test_augment_speed_shifts_pitch_and_duration(spark):
    from pyspark.sql import functions as F
    x = _tone(440, 16000, 400)
    clips = spark.createDataFrame(
        [("a", audio.wav_bytes(_pcm(x), 16000)),
         ("bad", b"\x00\x01 not a container")],
        "clip_id string, bytes binary")
    out = {r.factor: r for r in audio.augment_speed(
        clips, factors=(0.9, 1.0, 1.1)).collect()}
    assert set(out) == {0.9, 1.0, 1.1}   # undecodable emits nothing
    n0 = len(x)
    for f, r in out.items():
        assert r.sr_hz == 16000
        # duration scales by 1/factor
        assert abs(r.n_samples - n0 / f) <= n0 * 0.01 + 2
        sr, y = audio.decode_wav_pcm16(bytes(r.bytes))
        # pitch scales by factor: dominant bin of the perturbed clip
        spec = np.abs(np.fft.rfft(y))
        peak_hz = np.argmax(spec) * 16000 / len(y)
        assert abs(peak_hz - 440 * f) < 15, (f, peak_hz)
    with pytest.raises(ValueError):
        audio.augment_speed(clips, factors=(0.0,))


def test_augment_noise_hits_target_snr_and_is_deterministic(spark):
    x = _tone(440, 16000, 400) * 0.5
    clips = spark.createDataFrame(
        [("a", audio.wav_bytes(_pcm(x), 16000)),
         ("silent", audio.wav_bytes(np.zeros(800, dtype="<i2"), 16000)),
         ("bad", b"\x00\x01 not a container")],
        "clip_id string, bytes binary")
    rows = audio.augment_noise(clips, snr_db=20.0).collect()
    # silent and undecodable emit nothing
    assert [r.clip_id for r in rows] == ["a"]
    r = rows[0]
    assert r.snr_db == 20.0 and r.sr_hz == 16000
    _, y = audio.decode_wav_pcm16(bytes(r.bytes))
    n = min(len(x), len(y))
    noise = y[:n] - x[:n]
    measured = 20 * np.log10(np.sqrt(np.mean(x[:n] ** 2))
                             / np.sqrt(np.mean(noise ** 2)))
    assert abs(measured - 20.0) < 1.0, measured   # PCM16 quantization slack
    # deterministic: identical bytes on rerun; different under a new seed
    again = audio.augment_noise(clips, snr_db=20.0).collect()[0]
    assert bytes(again.bytes) == bytes(r.bytes)
    other = audio.augment_noise(clips, snr_db=20.0, seed=7).collect()[0]
    assert bytes(other.bytes) != bytes(r.bytes)
    with pytest.raises(ValueError):
        audio.augment_noise(clips, snr_db=float("inf"))
    # low SNR on a hot clip: the mix is peak-normalized, never clipped,
    # so the achieved SNR still lands on target
    hot = spark.createDataFrame(
        [("h", audio.wav_bytes(_pcm(_tone(440, 16000, 400) * 0.9), 16000))],
        "clip_id string, bytes binary")
    r0 = audio.augment_noise(hot, snr_db=0.0).collect()[0]
    _, y0 = audio.decode_wav_pcm16(bytes(r0.bytes))
    x0 = _tone(440, 16000, 400) * 0.9
    n = min(len(x0), len(y0))
    # recover the common scale factor: project mix onto the signal
    g = float(np.dot(y0[:n], x0[:n]) / np.dot(x0[:n], x0[:n]))
    noise0 = y0[:n] - g * x0[:n]
    snr0 = 20 * np.log10(np.sqrt(np.mean((g * x0[:n]) ** 2))
                         / np.sqrt(np.mean(noise0 ** 2)))
    assert abs(snr0 - 0.0) < 1.0, snr0


def test_canonical_wav_expr_jvm_check(spark):
    from pyspark.sql import functions as F
    good = audio.wav_bytes(_pcm(_tone(440, 16000, 100)), 16000)
    wrong_sr = audio.wav_bytes(_pcm(_tone(440, 22050, 100)), 22050)
    stereo = audio.wav_bytes_multi(
        np.stack([_pcm(_tone(440, 16000, 100))] * 2, 1), 16000)
    info_body = b"INFO" + b"IART" + (4).to_bytes(4, "little") + b"ab\x00\x00"
    padded = audio.wav_bytes_multi(
        _pcm(_tone(440, 16000, 100)), 16000,
        extra_chunks=b"LIST" + len(info_body).to_bytes(4, "little") + info_body)
    rows = [("good", good), ("wrong_sr", wrong_sr), ("stereo", stereo),
            ("padded", padded), ("trunc", good[:-8]),
            ("flac", audio.flac_stub_bytes(1)), ("nul", None)]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    checked = df.select("clip_id", audio.canonical_wav_expr().alias("ok"))
    got = {r.clip_id: r.ok for r in checked.collect()}
    # decodable-but-not-canonical payloads (other rate, stereo, extra
    # chunks) fail: this check asserts the exact canonical layout
    assert got == {"good": True, "wrong_sr": False, "stereo": False,
                   "padded": False, "trunc": False, "flac": False,
                   "nul": None}
    # canonicalize output always passes its own canonical check
    canon = audio.canonicalize_clips(df.where("clip_id in ('wrong_sr','stereo','padded')"))
    assert canon.select(F.min(audio.canonical_wav_expr())).collect()[0][0]
    # zero Python in the plan: pure JVM expression
    plan = checked._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_canonical_wav_dsl_named_check(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    good = audio.wav_bytes(_pcm(_tone(440, 16000, 100)), 16000)
    raw = audio.wav_bytes(_pcm(_tone(440, 22050, 100)), 22050)
    df = spark.createDataFrame([("g", good), ("r", raw)],
                               "clip_id string, bytes binary")
    compiled = compile_ruleset(
        {"properties": {"bytes": {"x-spark-check": "canonical_wav"}}},
        df.schema, extra_checks=audio.register_audio_checks(),
        name="canon")
    res = validate(df, compiled, row_id="clip_id")
    assert {r.row_id for r in res.violations.collect()} == {"r"}


def test_canonicalize_clips_end_to_end(spark):
    mono_22k = audio.wav_bytes(_pcm(_tone(420, 22050, 200)), 22050)
    mono_8k = audio.wav_bytes(_pcm(_tone(420, 8000, 200)), 8000)
    stereo_16k = audio.wav_bytes_multi(
        np.stack([_pcm(_tone(420, 16000, 200, amp=0.4))] * 2, axis=1), 16000)
    # flac canonicalizes IN PLACE since round 3 (decode_payload_any);
    # the undecodable fixture must be genuinely undecodable
    flac_16k = audio.flac_encode(_pcm(_tone(420, 16000, 200)), 16000)
    rows = [("a", mono_22k), ("b", mono_8k), ("c", stereo_16k),
            ("f", flac_16k),
            ("bad", b"\x00\x01 not a container"), ("nul", None)]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r.clip_id: r for r in audio.canonicalize_clips(
        clips, target_sr=16000, normalize_db=-20.0).collect()}

    # undecodable payloads emit zero rows (slice_segments policy)
    assert set(out) == {"a", "b", "c", "f"}
    assert out["a"].src_sr_hz == 22050 and out["c"].src_channels == 2
    assert out["f"].src_channels == 1
    for r in out.values():
        assert r.sr_hz == 16000
        sr, x = audio.decode_wav_pcm16(bytes(r.bytes))
        assert sr == 16000 and len(x) == r.n_samples
        # loudness normalized to -20 dBFS
        rms_db = 20 * np.log10(float(np.sqrt(np.mean(x ** 2))))
        assert abs(rms_db - (-20.0)) < 0.5
        # content preserved: spectral peak still at the tone frequency
        spec = np.abs(np.fft.rfft(x))
        peak_hz = np.argmax(spec) * 16000 / len(x)
        assert abs(peak_hz - 420) < 25, (r.clip_id, peak_hz)


def test_transcode_clips_plumbing(spark):
    """The transcoder stage: WAV re-encodes to canonical (stereo+chunky
    containers normalized), unsupported codecs follow the on_error
    policy, and the stub seam raises exactly for codecs needing a
    library."""
    from pyspark.sql import functions as F
    chunky = audio.wav_bytes_multi(
        np.stack([_pcm(_tone(440, 22050, 100))] * 2, 1), 22050,
        extra_chunks=b"junk" + (4).to_bytes(4, "little") + b"abcd")
    rows = [("wav", chunky, "pcm_s16le"),
            ("flac", audio.flac_stub_bytes(1), "flac"),
            ("opus", audio.opus_stub_bytes(1), "opus"),
            ("junk", b"xx", "pcm_s16le")]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")

    skipped = audio.transcode_clips(df, on_error="skip").collect()
    assert sorted(r.clip_id for r in skipped) == ["flac", "wav"]
    # WAV output is exactly canonical (mono, 44-byte layout) at the
    # SOURCE rate
    out = spark.createDataFrame([r for r in skipped if r.clip_id == "wav"])
    assert out.select(F.min(audio.canonical_wav_expr(sr=22050))).collect()[0][0]

    kept = {r.clip_id: r for r in
            audio.transcode_clips(df, on_error="keep").collect()}
    assert kept["wav"].transcode_ok and kept["wav"].bytes is not None
    # FLAC is a LIVE decode path (pure-numpy verbatim decoder): the
    # transcoded WAV carries the exact samples the encoder wrapped
    assert kept["flac"].transcode_ok
    sr, x = audio.decode_wav_pcm16(bytes(kept["flac"].bytes))
    ref_sr, ref = audio.flac_decode(audio.flac_stub_bytes(1))
    assert sr == ref_sr and np.allclose(x * 32767, ref.astype(np.float64),
                                        atol=1e-6)
    for cid in ("opus", "junk"):
        assert not kept[cid].transcode_ok and kept[cid].bytes is None

    with pytest.raises(NotImplementedError):
        audio.transcode_payload(audio.opus_stub_bytes(1), "opus")
    with pytest.raises(ValueError):
        audio.transcode_clips(df, on_error="explode")
