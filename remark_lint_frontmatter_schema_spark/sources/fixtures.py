"""Deterministic `clips` + `speakers` fixture generator (FIXTURES.md).

Each injected defect class transposes one behavior of the reference's
valid/invalid demo corpus (citations in FIXTURES.md §1; e.g. ``codec=
"divx"`` is the ``category: Video game`` enum violation of
``demo/content/creative-work/behind-the-gare-st-lazare__local-broken.md:6``).

Generation is distributed: ``spark.range(n)`` + ``mapInPandas`` so the
bench tier (millions of rows with binary payloads) is produced by all
cores and never materializes on the driver. Seed = 42; row ``i`` is fully
determined by ``i`` and ``n_rows``, independent of partitioning.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..functions import audio

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, speaker_id string, props map<string,string>, "
    "part_date date, ruleset_id string"
)

SR_DOMAIN = [8000, 16000, 22050, 44100, 48000]
CODECS = ["pcm_s16le", "flac", "opus"]
# Extended tier: the full codec family the engine validates/decodes —
# telephony G.711 + IMA ADPCM, plus the wide/float PCM containers studio
# masters arrive in (bare or WAVE_FORMAT_EXTENSIBLE-wrapped). Kept out of
# the base corpus so round-pinned goldens/bench numbers stay comparable.
CODECS_EXTENDED = CODECS + [
    "pcm_mulaw", "pcm_alaw", "adpcm_ima_wav",
    "pcm_u8", "pcm_s24le", "pcm_s32le", "pcm_f32le", "pcm_f64le"]
LANGS = ["en", "de", "fr"]
_WORDS = ("the quick brown fox jumps over a lazy dog near riverbank "
          "while birds sing softly under warm summer skies").split()

N_PARTITIONS = 8
_BASE_DATE = dt.date(2026, 1, 1)

# defect classes keyed by i % 200 (10/200 = 5% violation rate, FIXTURES.md)
DEFECTS = {
    188: "no_frontmatter",
    189: "dangling_speaker",
    190: "enum_codec",
    191: "required_transcript",
    192: "type_props_take",
    193: "maxlength_transcript",
    194: "nested_required",
    195: "pattern_transcript",
    196: "range_sr",
    197: "range_dur",
    198: "corrupt_bytes",
    199: "codec_header_mismatch",
}

N_SPEAKERS = 1000
HOT_CLIP_ID = "clip_hot_0000000000"


def defect_class(i: int) -> str | None:
    return DEFECTS.get(i % 200)


def transcript_for(i: int) -> str:
    w = [_WORDS[(i + k) % len(_WORDS)] for k in range(3 + i % 5)]
    return f"Clip {i} says {' '.join(w)}."


def part_date_for(i: int, n_rows: int) -> dt.date:
    p = min(N_PARTITIONS - 1, i * N_PARTITIONS // max(n_rows, 1))
    return _BASE_DATE + dt.timedelta(days=p)


def expected_signal(i: int, audio_ms: int):
    """The clean reference signal for the per-row fidelity oracle
    (decoded-PCM allclose / SNR >= 30 dB, BASELINE.json input_hint)."""
    sr = SR_DOMAIN[i % len(SR_DOMAIN)]
    n = max(1, int(sr * audio_ms / 1000))
    return sr, audio.sine_signal(i, sr, n)


def payload_for(i: int, codec: str, sr_hz: int, audio_ms: int) -> bytes:
    """Conformant payload for any engine codec, carrying clip ``i``'s
    seeded sine+noise signal. Wide/float PCM rows alternate bare and
    WAVE_FORMAT_EXTENSIBLE containers deterministically (``i % 2``) so
    both layouts stay exercised. Base codecs are byte-identical to what
    :func:`generate_clips` has always emitted."""
    if codec == "flac":
        return audio.flac_stub_bytes(i, sr_hz, audio_ms)
    if codec == "opus":
        return audio.opus_stub_bytes(i, sr_hz, audio_ms)
    if codec in ("pcm_s16le", "divx"):  # injected enum rows keep a WAV
        return audio.synth_wav(i, sr_hz, audio_ms)
    from ..functions import pcm_codecs as pc
    n = max(1, int(sr_hz * audio_ms / 1000))
    x16 = audio.synth_pcm16(i, sr_hz, n)
    if codec == "pcm_mulaw":
        return pc.wav_bytes_g711(x16, sr_hz, law="mulaw")
    if codec == "pcm_alaw":
        return pc.wav_bytes_g711(x16, sr_hz, law="alaw")
    if codec == "adpcm_ima_wav":
        return pc.wav_bytes_ima_adpcm(x16, sr_hz)
    xf = x16.astype(np.float64) / 32767.0
    ext = bool(i % 2)
    wide = {"pcm_u8": (8, "int"), "pcm_s24le": (24, "int"),
            "pcm_s32le": (32, "int"), "pcm_f32le": (32, "float"),
            "pcm_f64le": (64, "float")}
    if codec in wide:
        bits, fmt = wide[codec]
        return pc.wav_bytes_pcm(xf, sr_hz, bits=bits, fmt=fmt,
                                extensible=ext)
    raise ValueError(f"no payload writer for codec {codec!r}")


def _make_row(i: int, n_rows: int, audio_ms: int, with_bytes: bool,
              n_hot: int, codecs: list = CODECS) -> tuple:
    d = defect_class(i)
    sr = SR_DOMAIN[i % len(SR_DOMAIN)]
    codec = codecs[i % len(codecs)]
    # dur_ms: deterministic in [200, 30000]; last partition drawn from a
    # +60%-mean shifted distribution (drift_partition class, FIXTURES.md)
    base_dur = 200 + (i * 7919) % 29800
    pdate = part_date_for(i, n_rows)
    is_last_part = pdate == _BASE_DATE + dt.timedelta(days=N_PARTITIONS - 1)
    dur = int(base_dur * 1.6) if is_last_part else base_dur

    clip_id = f"clip_{i:010d}"
    # ~0.1% duplicated ids + one hot id block (skew probe, north_rule)
    if i % 1000 == 500:
        clip_id = f"clip_{i - 1:010d}"
    if 0 < n_hot and n_rows // 2 <= i < n_rows // 2 + n_hot:
        clip_id = HOT_CLIP_ID

    transcript = transcript_for(i)
    speaker = f"spk_{(i * 31) % N_SPEAKERS:06d}"
    props = {"lang": LANGS[i % len(LANGS)], "take": str(i % 7)}
    ruleset = "clip"

    if d == "no_frontmatter":
        ruleset = None
    elif d == "dangling_speaker":
        speaker = f"spk_ghost_{i:06d}"
    elif d == "enum_codec":
        codec = "divx"
    elif d == "required_transcript":
        transcript = None
    elif d == "type_props_take":
        props = {"lang": props["lang"], "take": "eighteen-fifty-nine"}
    elif d == "maxlength_transcript":
        transcript = "x" * 2000
    elif d == "nested_required":
        props = {"take": props["take"]}
    elif d == "pattern_transcript":
        transcript = f"Clip {i} \x07 bell"
    elif d == "range_sr":
        sr = 3
    elif d == "range_dur":
        dur = -5

    b = None
    if with_bytes:
        if d == "corrupt_bytes":
            b = b"RIFX\x00\x01garbage-not-a-wav" + bytes(8)
        elif d == "codec_header_mismatch":
            b = audio.synth_wav(i, max(sr, 8000) * 2, audio_ms)
        else:
            # conformant container whose header metadata (fmt tag /
            # OpusHead sr / granule duration) agrees with the row's
            # declared codec + sr convention
            b = payload_for(i, codec, max(sr, 8000), audio_ms)

    return (clip_id, b, sr, dur, codec, transcript, speaker, props,
            pdate, ruleset)


def generate_clips(
    spark: SparkSession,
    n_rows: int,
    *,
    audio_ms: int = 40,
    with_bytes: bool = True,
    n_hot: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic clips table.

    ``audio_ms`` is the *payload* audio length — independent of the
    ``dur_ms`` metadata column so the bench tier stays disk-light while
    header/decode checks remain real.
    """
    if n_hot is None:
        n_hot = min(1000, max(0, n_rows // 200))
    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
            "speaker_id", "props", "part_date", "ruleset_id"]

    def gen(batches):
        for pdf in batches:
            rows = [_make_row(int(i), n_rows, audio_ms, with_bytes, n_hot)
                    for i in pdf["id"]]
            out = pd.DataFrame(rows, columns=cols)
            yield out

    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=CLIPS_SCHEMA)


def generate_clips_extended(
    spark: SparkSession,
    n_rows: int,
    *,
    audio_ms: int = 40,
    with_bytes: bool = True,
    n_hot: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """The clips table over the FULL codec family (CODECS_EXTENDED):
    G.711 mu/A-law, IMA ADPCM, wide/float PCM with alternating bare /
    EXTENSIBLE containers, alongside the base pcm_s16le/flac/opus rows.
    Same defect-injection machinery and determinism contract as
    :func:`generate_clips`; a separate tier so the base corpus's
    round-pinned goldens and bench numbers stay comparable."""
    if n_hot is None:
        n_hot = min(1000, max(0, n_rows // 200))
    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
            "speaker_id", "props", "part_date", "ruleset_id"]

    def gen(batches):
        for pdf in batches:
            rows = [_make_row(int(i), n_rows, audio_ms, with_bytes, n_hot,
                              codecs=CODECS_EXTENDED)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=CLIPS_SCHEMA)


def generate_speakers(spark: SparkSession, n: int = N_SPEAKERS) -> DataFrame:
    rows = [(f"spk_{i:06d}", f"Speaker {i}", LANGS[i % len(LANGS)])
            for i in range(n)]
    return spark.createDataFrame(rows, "speaker_id string, name string, lang string")


def write_clips(df: DataFrame, path: str) -> None:
    """Partitioned-parquet Iceberg emulation (no Iceberg jar in sandbox;
    production path is ``df.writeTo("db.clips")`` on a real catalog)."""
    df.write.mode("overwrite").partitionBy("part_date").parquet(path)


_ = np  # numpy used transitively via audio
