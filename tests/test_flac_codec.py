"""Pure-numpy FLAC codec (verbatim-subframe subset): lossless roundtrip
across block boundaries, container integrity (sync/CRC-8/CRC-16/MD5),
the subset's honest refusals, and the end-to-end transcode SNR pin
against the fixture's clean reference signal."""

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions import audio
from remark_lint_frontmatter_schema_spark.sources import fixtures


@pytest.mark.parametrize("n", [16, 100, 4095, 4096, 4097, 13000])
def test_roundtrip_lossless(n):
    rng = np.random.default_rng(7 + n)
    x = rng.integers(-32768, 32768, n, dtype=np.int16)
    b = audio.flac_encode(x, 22050)
    assert b[:4] == b"fLaC"
    sr, y = audio.flac_decode(b)
    assert sr == 22050
    assert np.array_equal(x, y)


def test_extremes_and_silence_roundtrip():
    x = np.array([32767, -32768, 0, -1, 1] + [0] * 20, dtype=np.int16)
    sr, y = audio.flac_decode(audio.flac_encode(x, 8000))
    assert sr == 8000 and np.array_equal(x, y)


def test_corruption_detected():
    x = np.arange(-500, 500, dtype=np.int16)
    b = bytearray(audio.flac_encode(x, 16000))
    with pytest.raises(ValueError):
        audio.flac_decode(bytes(b[:30]))            # truncated metadata
    with pytest.raises(ValueError):
        audio.flac_decode(b"RIFF" + bytes(b[4:]))   # wrong magic
    flipped = bytearray(b)
    flipped[-40] ^= 0x01                            # sample byte -> CRC-16
    with pytest.raises(ValueError):
        audio.flac_decode(bytes(flipped))
    hdr = bytearray(b)
    hdr[4 + 4 + 34 + 2] ^= 0x01                     # frame header -> CRC-8
    with pytest.raises(ValueError):
        audio.flac_decode(bytes(hdr))


def test_predictor_subframes_refused_not_misdecoded():
    x = np.arange(100, dtype=np.int16)
    b = bytearray(audio.flac_encode(x, 16000))
    # subframe header sits right after magic+streaminfo+frame header
    # (4 sync/codes + 1 frame-number + 2 blocksize + 1 crc8)
    sub_at = 4 + 38 + 8
    assert b[sub_at] == 0x02                        # verbatim
    b[sub_at] = 0x10                                # FIXED order-0
    with pytest.raises(NotImplementedError):
        audio.flac_decode(bytes(b))


def test_fixture_flac_is_real_and_faithful():
    """The fixture generator's FLAC payloads decode losslessly to the
    same seeded signal the WAV rows carry — SNR against the clean
    reference >= 30 dB (BASELINE.json per-row invariant)."""
    for i in (1, 5, 32):
        sr, audio_ms = 16000, 50
        b = audio.flac_stub_bytes(i, sr, audio_ms)
        dsr, pcm = audio.flac_decode(b)
        assert dsr == sr
        ref = audio.sine_signal(i, sr, len(pcm))
        got = pcm.astype(np.float64) / 32767.0
        assert audio.snr_db(ref, got) >= 30.0
        # and byte-exact vs the WAV twin of the same clip
        wsr, wx = audio.decode_wav_pcm16(audio.synth_wav(i, sr, audio_ms))
        assert wsr == sr and np.allclose(wx, got, atol=1e-6)


def test_transcode_clips_flac_snr(spark):
    """transcode_clips round-trips fixture FLAC clips with SNR >= 30 dB
    vs the expected clean signal — the verdict's done-criterion."""
    rows = [(f"c{i}", audio.flac_stub_bytes(i, 16000, 40), "flac")
            for i in (3, 9)]
    df = spark.createDataFrame(rows,
                               "clip_id string, bytes binary, codec string")
    out = {r.clip_id: r for r in audio.transcode_clips(df).collect()}
    assert set(out) == {"c3", "c9"}
    for i in (3, 9):
        sr, x = audio.decode_wav_pcm16(bytes(out[f"c{i}"].bytes))
        ref = audio.sine_signal(i, sr, len(x))
        assert audio.snr_db(ref, x) >= 30.0


def test_fixture_rows_carry_decodable_flac(spark):
    """Every codec='flac' row the fixture generator emits (outside the
    deliberate corrupt/mismatch defect classes) is a decodable stream."""
    df = fixtures.generate_clips(spark, n_rows=60, audio_ms=10)
    rows = df.where("codec = 'flac' and bytes is not null").collect()
    assert rows
    ok = 0
    for r in rows:
        b = bytes(r.bytes)
        if not b.startswith(b"fLaC"):
            continue  # injected defect classes keep other payloads
        audio.flac_decode(b)
        ok += 1
    assert ok > 0
