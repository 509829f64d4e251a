"""Y4M video codec + Spark plumbing: the video analog of the audio
fidelity suite — container grammar pins, roundtrip SNR floors per
colorspace, random-access == full-decode equivalence, malformed-container
policy, map-only Spark stages, DSL checks, cut detection and the
banded-aHash near-dup operator."""

import numpy as np
import pandas as pd
import pytest

from remark_lint_frontmatter_schema_spark.functions import video as vid


def _snr(ref: np.ndarray, got: np.ndarray) -> float:
    ref = ref.astype(np.float64)
    err = got.astype(np.float64) - ref
    p = float((ref ** 2).mean())
    n = float((err ** 2).mean())
    return 10 * np.log10(p / n) if n else float("inf")


# --- container grammar -------------------------------------------------------

def test_header_parse_fields():
    b = vid.make_y4m(1, w=34, h=21, n_frames=7, fps=30)
    m = vid.y4m_parse_header(b)
    assert (m["width"], m["height"], m["n_frames"]) == (34, 21, 7)
    assert m["fps"] == 30.0 and m["colorspace"] == "420jpeg"
    assert m["duration_ms"] == pytest.approx(7000 / 30.0)
    # chroma planes of a 34x21 4:2:0 stream are ceil-sized: 17x11
    assert m["frame_len"] == 34 * 21 + 2 * 17 * 11


def test_header_defaults_and_ignored_fields():
    b = b"YUV4MPEG2 W4 H2 F25:1 A4:3 Xsome=ext\nFRAME\n" + bytes(4 * 2 + 2 * 2)
    m = vid.y4m_parse_header(b)  # no C tag -> 420jpeg default
    assert m["colorspace"] == "420jpeg" and m["n_frames"] == 1


@pytest.mark.parametrize("raw,err", [
    (b"JUNK", "not a YUV4MPEG2"),
    (b"YUV4MPEG2 W4 H2\nFRAME\n" + bytes(12), "frame rate"),
    (b"YUV4MPEG2 W4 H2 F25:1 It\n", "interlaced"),
    (b"YUV4MPEG2 W4 H2 F25:1 Cweird\n", "colorspace"),
    (b"YUV4MPEG2 W4 H2 F25:1 Q9\n", "bad Y4M header field"),
    (b"YUV4MPEG2 W4 H2 F25:1\n" + bytes(11), "whole number of frames"),
    (b"YUV4MPEG2 W4 H2 F25:1\nFRAMX\n" + bytes(12), "marker"),
])
def test_malformed_containers_raise(raw, err):
    with pytest.raises(ValueError, match=err):
        vid.y4m_parse_header(raw)


# --- codec roundtrips --------------------------------------------------------

def test_mono_roundtrip_exact():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (5, 13, 17), dtype=np.uint8)
    b = vid.y4m_encode(frames, fps_num=30)
    meta, got = vid.y4m_decode(b)
    assert meta["colorspace"] == "mono"
    assert got.shape == frames.shape and (got == frames).all()


def test_c444_roundtrip_near_exact():
    """4:4:4 has no subsampling: only the BT.601 matrix rounding remains
    (±1 per channel on random pixels)."""
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    b = vid.y4m_encode(frames, colorspace="444")
    _, got = vid.y4m_decode(b)
    assert int(np.abs(got.astype(int) - frames.astype(int)).max()) <= 1


@pytest.mark.parametrize("cs,floor", [("420jpeg", 26.0), ("422", 27.0),
                                      ("444", 40.0)])
def test_smooth_content_roundtrip_snr(cs, floor):
    b = vid.make_y4m(3, w=32, h=24, n_frames=4, colorspace=cs)
    _, got = vid.y4m_decode(b)
    # re-encode decoded frames losslessly (mono of each channel is
    # overkill); compare against a second decode of a re-encode instead:
    # the chroma loss must have converged (idempotent after one pass)
    b2 = vid.y4m_encode(got, colorspace=cs)
    _, got2 = vid.y4m_decode(b2)
    assert _snr(got, got2) > floor


def test_odd_dimensions_chroma_padding():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, 5, 7, 3), dtype=np.uint8)
    b = vid.y4m_encode(frames, colorspace="420jpeg")
    m, got = vid.y4m_decode(b)
    assert m["frame_len"] == 5 * 7 + 2 * 4 * 3  # ceil(7/2)=4, ceil(5/2)=3
    assert got.shape == frames.shape


def test_frame_at_equals_full_decode():
    b = vid.make_y4m(4, n_frames=9)
    meta, frames = vid.y4m_decode(b)
    for k in (0, 4, 8):
        assert (vid.y4m_frame_at(b, meta, k) == frames[k]).all()
    with pytest.raises(ValueError, match="out of range"):
        vid.y4m_frame_at(b, meta, 9)


def test_decode_video_routes_and_raises():
    b = vid.make_y4m(5, n_frames=2)
    meta, _ = vid.decode_video(b)
    assert meta["n_frames"] == 2
    with pytest.raises(NotImplementedError, match="codec library"):
        vid.decode_video(b"\x00\x00\x01\xba mpeg-ps")


# --- analytics ---------------------------------------------------------------

def test_sample_schedule_and_random_access():
    b = vid.make_y4m(6, n_frames=50, fps=25)
    meta = vid.y4m_parse_header(b)
    sched = vid.sample_frame_schedule(meta, 1000.0)   # 1/s at 25 fps
    assert sched == list(range(0, 50, 25))
    assert vid.sample_frame_schedule(meta, 40.0) == list(range(50))


def test_cut_detection():
    b = vid.make_y4m(7, n_frames=10, fps=10, cut_at=6)
    cuts = vid.video_cuts(b, threshold=24.0)
    assert cuts == [600.0]


def test_ahash_pixels_invariance():
    """aHash is stable under brightness scaling and detects inversion."""
    b = vid.make_y4m(8, n_frames=1)
    meta = vid.y4m_parse_header(b)
    y = vid._luma_at(b, meta, 0).astype(np.float64)
    h1 = vid.ahash64_pixels(y)
    h2 = vid.ahash64_pixels(np.clip(y * 0.7 + 10, 0, 255))
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 3
    h3 = vid.ahash64_pixels(255.0 - y)
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") >= 48


# --- Spark plumbing ----------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    rows = [("vid_a", vid.make_y4m(10, n_frames=12, fps=12)),
            ("vid_a_dup", vid.make_y4m(10, n_frames=12, fps=12)),
            ("vid_b", vid.make_y4m(11, n_frames=12, fps=12, cut_at=3)),
            ("vid_bad", b"\x00garbage")]
    return spark.createDataFrame(rows, "media_id string, bytes binary")


def test_video_meta_stage(spark, media):
    out = {r["media_id"]: r for r in media.mapInPandas(
        vid.video_meta_map_in_pandas,
        schema=vid.VIDEO_META_SCHEMA).collect()}
    assert out["vid_a"]["decode_ok"] and out["vid_a"]["n_frames"] == 12
    assert out["vid_a"]["duration_ms"] == pytest.approx(1000.0)
    assert not out["vid_bad"]["decode_ok"]
    assert "YUV4MPEG2" in out["vid_bad"]["error"]


def test_frame_features_stage_map_only(spark, media):
    df = media.mapInPandas(vid.frame_features_map_in_pandas(250.0),
                           schema=vid.FRAME_FEATURE_SCHEMA)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # binary never shuffles
    rows = df.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_id["vid_a"]) == [0, 3, 6, 9]
    assert "vid_bad" not in by_id
    a0 = [r for r in by_id["vid_a"] if r["frame_idx"] == 0][0]
    assert 0 < a0["luma_mean"] < 255 and a0["luma_std"] > 0


def test_video_neardup_pairs(spark, media):
    pairs = vid.video_neardup_pairs(media, every_ms=250.0).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert {p["media_id"], p["media_id_r"]} == {"vid_a", "vid_a_dup"}
    assert p["n_matched"] >= 3


def test_video_checks_in_dsl(spark, media):
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark import (
        compile_ruleset, validate)
    # declared duration metadata: correct for vid_a/dup, wrong for vid_b
    df = media.withColumn(
        "dur_ms",
        F.when(F.col("media_id").startswith("vid_a"), F.lit(1000.0))
        .otherwise(F.lit(123.0)))
    for check, bad in [("video_magic", {"vid_bad"}),
                       ("video_decodes", {"vid_bad"}),
                       ("video_duration_consistent",
                        {"vid_bad", "vid_b"})]:
        compiled = compile_ruleset(
            {"$id": f"v-{check}", "type": "object", "properties": {
                "bytes": {"x-spark-check": check}}},
            df.schema, extra_checks=vid.register_video_checks())
        res = validate(df, compiled, row_id="media_id")
        got = {r["row_id"] for r in res.violations.collect()}
        assert got == bad, (check, got)
