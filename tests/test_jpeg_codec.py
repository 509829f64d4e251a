"""Baseline JPEG codec (functions/jpeg.py): roundtrip PSNR floors per
quality, grammar pins (marker walk, SOF offsets, dims without entropy
decode), strict malformed-input policy, out-of-subset honesty, and the
image-pipeline integration (decode_image routing, aHash near-dup across
PNG/JPEG containers of the same picture)."""

import struct

import numpy as np
import pytest

from remark_lint_frontmatter_schema_spark.functions import jpeg
from remark_lint_frontmatter_schema_spark.functions import multimodal as mm


def _psnr(a, b):
    mse = float(((a.astype(float) - b.astype(float)) ** 2).mean())
    return 10 * np.log10(255 ** 2 / mse) if mse else float("inf")


def _smooth(h, w, seed=0, ch=None):
    rng = np.random.default_rng(seed)
    base = (0.5 * np.linspace(0, 255, w)[None, :]
            + 0.5 * np.linspace(0, 255, h)[:, None])
    if ch is None:
        return np.clip(base + rng.normal(0, 2, (h, w)), 0,
                       255).astype(np.uint8)
    px = np.stack([base, np.roll(base, w // 3, axis=1), 255 - base],
                  axis=-1)
    return np.clip(px + rng.normal(0, 2, (h, w, 3)), 0,
                   255).astype(np.uint8)


@pytest.mark.parametrize("quality,floor", [(95, 40.0), (90, 37.0),
                                           (50, 32.0)])
@pytest.mark.parametrize("gray", [True, False])
def test_roundtrip_psnr(quality, floor, gray):
    px = _smooth(24, 32) if gray else _smooth(24, 32, ch=3)
    b = jpeg.jpeg_encode(px, quality=quality)
    got = jpeg.jpeg_decode(b)
    assert got.shape == px.shape
    assert _psnr(px, got) > floor


def test_odd_dimensions_and_tiny():
    for h, w in [(9, 13), (1, 1), (8, 8), (17, 3)]:
        px = _smooth(h, w, seed=h * 31 + w)
        got = jpeg.jpeg_decode(jpeg.jpeg_encode(px))
        assert got.shape == (h, w)
        assert _psnr(px, got) > 28.0, (h, w)


def test_dimensions_header_only():
    b = jpeg.make_jpeg(1, w=40, h=28)
    assert jpeg.jpeg_dimensions(b) == (40, 28)
    # sniffer agrees, and decode_image routes jpeg for real now
    assert mm.sniff_image_format(b) == "jpeg"
    px = mm.decode_image(b)
    assert px.shape == (28, 40, 3)


def test_quality_monotonicity():
    px = _smooth(24, 24, ch=3)
    sizes = [len(jpeg.jpeg_encode(px, quality=q)) for q in (30, 60, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
    errs = [_psnr(px, jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=q)))
            for q in (30, 60, 95)]
    assert errs[0] < errs[2]


def test_byte_stuffing_roundtrip():
    """Content tuned to emit 0xFF bytes in the entropy stream — the
    stuffing/unstuffing path must be exercised."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (32, 32), dtype=np.uint8)  # noisy -> long codes
    b = jpeg.jpeg_encode(px, quality=95)
    assert b"\xff\x00" in b[2:-2]  # stuffed bytes present
    got = jpeg.jpeg_decode(b)
    assert got.shape == px.shape
    assert _psnr(px, got) > 24.0


def test_malformed_raise():
    b = jpeg.make_jpeg(2, w=16, h=16)
    with pytest.raises(ValueError, match="SOI"):
        jpeg.jpeg_decode(b"not a jpeg")
    with pytest.raises(ValueError, match="truncated"):
        jpeg.jpeg_decode(b[:40])
    with pytest.raises(ValueError, match="truncated|marker"):
        jpeg.jpeg_decode(b[:-30])       # entropy data cut short
    bad = bytearray(b)
    bad[3] = 0x00                       # APP0 marker length corrupted
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(bytes(bad))


def test_out_of_subset_honesty():
    # progressive SOF2 -> NotImplementedError, not garbage pixels
    b = bytearray(jpeg.make_jpeg(3, w=16, h=16, gray=True))
    i = bytes(b).index(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        jpeg.jpeg_decode(bytes(b))
    # subsampled 4:2:0 SOF -> NotImplementedError
    raw = jpeg.make_jpeg(4, w=16, h=16)
    i = raw.index(b"\xff\xc0")
    b = bytearray(raw)
    b[i + 2 + 2 + 6 + 1] = 0x22         # comp 1 sampling 2x2
    with pytest.raises(NotImplementedError, match="subsampled"):
        jpeg.jpeg_decode(bytes(b))


def test_restart_markers_decode():
    """Hand-insert DRI + RSTn at MCU boundaries: the decoder must
    byte-align, consume the marker and reset DC prediction."""
    px = _smooth(8, 24, seed=9)         # 3 MCUs in a row
    b = jpeg.jpeg_encode(px)
    ref = jpeg.jpeg_decode(b)

    # rebuild with restart_interval=1 by re-encoding per-MCU: simplest
    # conformant construction — encode each 8x8 block as its own image
    # is NOT equivalent; instead splice DRI and re-encode entropy with
    # resets using the encoder's own tables via a tiny local writer.
    from remark_lint_frontmatter_schema_spark.functions.jpeg import (
        _BitWriter, _build_codes, _encode_plane_blocks, _quality_scale,
        _magnitude, _AC_LUMA, _DC_LUMA, _QT_LUMA)
    qt = _quality_scale(_QT_LUMA, 90)
    blocks = list(_encode_plane_blocks(px.astype(np.float64), qt))
    dc, ac = _build_codes(*_DC_LUMA), _build_codes(*_AC_LUMA)
    payload = bytearray()
    for m, zz in enumerate(blocks):
        w = _BitWriter()
        t, mag = _magnitude(int(zz[0]))     # pred resets every MCU
        c, ln = dc[t]
        w.write(c, ln)
        if t:
            w.write(mag, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac[0xF0]
                w.write(c, ln)
                run -= 16
            t, mag = _magnitude(v)
            c, ln = ac[(run << 4) | t]
            w.write(c, ln)
            w.write(mag, t)
            run = 0
        if run:
            c, ln = ac[0x00]
            w.write(c, ln)
        w.flush()
        payload += w.out
        if m < len(blocks) - 1:
            payload += bytes([0xFF, 0xD0 + (m % 8)])

    head_end = b.index(b"\xff\xda")
    sos_len = struct.unpack_from(">H", b, head_end + 2)[0]
    head = b[:head_end]
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    rebuilt = (head + dri + b[head_end:head_end + 2 + sos_len]
               + bytes(payload) + b"\xff\xd9")
    got = jpeg.jpeg_decode(rebuilt)
    assert _psnr(ref, got) > 45.0       # same quantized blocks


def test_fixture_determinism():
    assert jpeg.make_jpeg(7) == jpeg.make_jpeg(7)
    assert jpeg.make_jpeg(7) != jpeg.make_jpeg(8)


def test_cross_container_image_neardup(spark):
    """The same picture as PNG and JPEG lands in one aHash near-dup
    cluster — the image twin of the audio cross-codec dedup."""
    px = _smooth(32, 32, seed=3, ch=3)
    rows = [("png", mm.png_encode(px)),
            ("jpg", jpeg.jpeg_encode(px, quality=92)),
            ("other", mm.png_encode(_smooth(32, 32, seed=99, ch=3)[::-1]))]
    media = spark.createDataFrame(rows, "media_id string, bytes binary")
    pairs = {(r["id_a"], r["id_b"])
             for r in mm.image_neardup_pairs(media,
                                             max_distance=6).collect()}
    assert ("jpg", "png") in pairs
    assert not any("other" in p for p in pairs)
