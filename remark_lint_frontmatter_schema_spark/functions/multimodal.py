"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Images/video/audio are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched ``mapInPandas`` stages. The image/video codec libraries are NOT in
this sandbox, so the actual pixel decoding is stubbed behind clearly-marked
``NotImplementedError`` (or a deterministic fake for tests) — the
Spark-side plumbing (schemas, UDF signatures, batch shapes, partition
discipline) is real and tested. Audio is the fully-real modality
(functions/audio.py).

Payload discipline (same as audio): binary columns are never shuffled —
every operator here is a map-only stage emitting small typed rows; joins
happen on the metadata outputs.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

MEDIA_SCHEMA = ("media_id string, bytes binary, media_type string, "
                "meta map<string,string>")

IMAGE_META_SCHEMA = ("media_id string, format string, width int, height int, "
                     "n_bytes long, decode_ok boolean")

IMAGE_FEATURES_SCHEMA = ("media_id string, feature array<float>, "
                         "feat_dim int")

FRAME_SAMPLE_SCHEMA = ("media_id string, frame_idx int, frame_ts_ms int, "
                       "frame_bytes_stub string")


def sniff_image_format(b: bytes) -> str | None:
    """Container sniffing from magic bytes — real, no codec lib needed."""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return "webp"
    return None


def png_dimensions(b: bytes) -> tuple[int, int] | None:
    """PNG IHDR width/height — header-level, real."""
    if sniff_image_format(b) != "png" or len(b) < 24:
        return None
    w, h = struct.unpack_from(">II", b, 16)
    return w, h


def decode_image(b: bytes) -> np.ndarray:
    """STUB: pixel decode requires an image codec library (PIL/opencv),
    neither available in this sandbox. Production swaps this single
    function; everything around it (batching, schema, partitioning) is
    live."""
    raise NotImplementedError(
        "image pixel decode requires PIL/opencv (not in sandbox); "
        "use fake_image_features for deterministic test plumbing")


def fake_image_features(b: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature vector derived from the bytes alone
    (so plumbing tests have stable expected values)."""
    arr = np.frombuffer(b[:1024].ljust(1024, b"\0"), dtype=np.uint8)
    chunks = arr.reshape(dim, -1).astype(np.float32)
    return chunks.mean(axis=1) / 255.0


def image_meta_map_in_pandas(iterator):
    """mapInPandas: binary -> typed metadata rows (header-level decode is
    real; dimension extraction works for PNG, other formats yield nulls)."""
    for pdf in iterator:
        rows = []
        for mid, b in zip(pdf["media_id"], pdf["bytes"]):
            raw = bytes(b) if b is not None else b""
            fmt = sniff_image_format(raw)
            dims = png_dimensions(raw) if fmt == "png" else None
            rows.append((mid, fmt, dims[0] if dims else None,
                         dims[1] if dims else None, len(raw), fmt is not None))
        yield pd.DataFrame(rows, columns=["media_id", "format", "width",
                                          "height", "n_bytes", "decode_ok"])


def image_features_map_in_pandas(iterator):
    """mapInPandas: binary -> feature vectors (deterministic fake embedder;
    swap fake_image_features for a real model at deploy time)."""
    for pdf in iterator:
        rows = []
        for mid, b in zip(pdf["media_id"], pdf["bytes"]):
            raw = bytes(b) if b is not None else b""
            feat = fake_image_features(raw)
            rows.append((mid, [float(x) for x in feat], len(feat)))
        yield pd.DataFrame(rows, columns=["media_id", "feature", "feat_dim"])


def frame_sample_map_in_pandas(every_ms: int = 1000):
    """Video frame sampling STUB: emits the frame *schedule* (indices +
    timestamps from declared duration metadata) with a stub payload marker;
    a real decoder fills the frame bytes. Demonstrates the fan-out shape:
    one input row -> many frame rows, still map-only."""

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for mid, meta in zip(pdf["media_id"], pdf["meta"]):
                meta = meta or {}
                dur = int(meta.get("dur_ms", "0"))
                for k, ts in enumerate(range(0, max(dur, 0), every_ms)):
                    rows.append((mid, k, ts, "STUB:frame-decode-needs-codec"))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_ts_ms",
                                              "frame_bytes_stub"])
    return fn


def make_png_stub(i: int, w: int = 4, h: int = 3) -> bytes:
    """Minimal deterministic PNG header+junk (valid magic + IHDR dims) for
    plumbing tests — not a decodable image."""
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    rng = np.random.default_rng(7000 + i)
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + rng.integers(0, 256, 32, dtype=np.uint8).tobytes())
