"""Y4M (YUV4MPEG2) video: a REAL pure-numpy codec + Spark plumbing.

Round-3 closes the "video pixel decode is a stub" gap the same way audio
(FLAC/G.711/ADPCM in pure numpy) and images (PNG/GIF) were closed: with
one honestly-real uncompressed format rather than a codec-library
pretend. Y4M is the canonical interchange container for raw video
(mjpegtools/ffmpeg `-f yuv4mpeg`): a plain-text stream header
(`YUV4MPEG2 W<w> H<h> F<n>:<d> [Ip] [A<n>:<d>] [C<space>]\\n`) followed
by fixed-size `FRAME\\n`-prefixed planar YUV payloads.

Why Y4M is the right scale story, not just the feasible one: frames are
FIXED SIZE, so frame k lives at a closed-form byte offset — sampling one
frame per second from an hour-long clip decodes ~3.6 k frames and *skips*
the other ~10^5 without touching their bytes. The samplers below do real
random access (`y4m_frame_at`), which is exactly the
"decode-only-what-you-sample" discipline a 100 TB video corpus needs.
Compressed codecs (H.264 etc.) remain out-of-sandbox library territory —
`decode_video` raises the same documented ``NotImplementedError`` for
them that JPEG decode keeps on the image side.

Colorspaces: C420 / C420jpeg / C420mpeg2 / C420paldv (same plane layout;
chroma *siting* differs — decode identically, siting recorded in meta),
C422, C444 and Cmono. Interlaced streams (`It`/`Ib`/`Im`) raise — the
engine's corpora are progressive. RGB<->YUV is BT.601 full-range (the
JPEG/JFIF matrix), matching the C420jpeg default ffmpeg emits.

Payload discipline (same as audio/images): binary columns are never
shuffled — every operator here is a map-only stage emitting small typed
rows (metadata, per-frame features, 64-bit frame hashes); joins happen on
those outputs. Reference analog: the reference validates frontmatter it
can actually parse (YAML -> Ajv, index.ts:210-254); Y4M gives video the
same "decode it, don't trust the header" standard.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

_ = struct  # parity with sibling modules; header parse is text-based

_MAGIC = b"YUV4MPEG2"

# chroma plane dimensions per colorspace: (w_div, h_div); None = no chroma
_CHROMA = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2),
    "420paldv": (2, 2), "422": (2, 1), "444": (1, 1), "mono": None,
}

VIDEO_META_SCHEMA = ("media_id string, width int, height int, "
                     "fps double, n_frames int, duration_ms double, "
                     "colorspace string, decode_ok boolean, error string")

FRAME_FEATURE_SCHEMA = ("media_id string, frame_idx int, frame_ts_ms double, "
                        "luma_mean double, luma_std double, ahash long")


# ---------------------------------------------------------------------------
# container: header grammar + closed-form frame offsets
# ---------------------------------------------------------------------------

def _frame_bytes(w: int, h: int, cs: str) -> int:
    div = _CHROMA[cs]
    y = w * h
    if div is None:
        return y
    cw, ch = -(-w // div[0]), -(-h // div[1])
    return y + 2 * cw * ch


def y4m_parse_header(b: bytes) -> dict:
    """Parse the stream header -> dict(width, height, fps_num, fps_den,
    fps, colorspace, header_len, frame_len, frame_stride, n_frames,
    duration_ms). n_frames comes from closed-form size math (frames are
    fixed-size), then the first FRAME marker is verified so garbage with
    a valid first line still fails. ValueError on any malformed field —
    corruption is corruption, never a silently-empty video."""
    nl = b.find(b"\n")
    if not b.startswith(_MAGIC) or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    fields = b[len(_MAGIC):nl].split(b" ")
    w = h = None
    fn, fd = 0, 0
    cs = "420jpeg"  # spec default when C is absent
    for f in fields:
        if not f:
            continue
        tag, val = f[:1], f[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            fn, fd = (int(x) for x in val.split(b":"))
        elif tag == b"I":
            if val not in (b"p", b"?"):
                raise ValueError(
                    f"interlaced Y4M ({val!r}) outside engine subset")
        elif tag == b"C":
            cs = val.decode("ascii", "replace")
            if cs not in _CHROMA:
                raise ValueError(f"unknown Y4M colorspace C{cs}")
        elif tag in (b"A", b"X"):
            pass  # aspect ratio / extensions: legal, ignored
        else:
            raise ValueError(f"bad Y4M header field {f!r}")
    if not w or not h or w < 1 or h < 1:
        raise ValueError("Y4M header missing/invalid W or H")
    if fn < 1 or fd < 1:
        raise ValueError("Y4M header missing/invalid frame rate F")
    header_len = nl + 1
    frame_len = _frame_bytes(w, h, cs)
    stride = 6 + frame_len                 # b"FRAME\n" + planes
    body = len(b) - header_len
    if body % stride:
        raise ValueError("Y4M body is not a whole number of frames")
    n = body // stride
    if n and b[header_len:header_len + 6] != b"FRAME\n":
        raise ValueError("first Y4M frame marker missing")
    fps = fn / fd
    return {"width": w, "height": h, "fps_num": fn, "fps_den": fd,
            "fps": fps, "colorspace": cs, "header_len": header_len,
            "frame_len": frame_len, "frame_stride": stride, "n_frames": n,
            "duration_ms": n * 1000.0 * fd / fn}


def _yuv_planes(raw: bytes, w: int, h: int, cs: str):
    div = _CHROMA[cs]
    y = np.frombuffer(raw[: w * h], np.uint8).reshape(h, w)
    if div is None:
        return y, None, None
    cw, ch = -(-w // div[0]), -(-h // div[1])
    u = np.frombuffer(raw[w * h: w * h + cw * ch], np.uint8).reshape(ch, cw)
    v = np.frombuffer(raw[w * h + cw * ch:], np.uint8).reshape(ch, cw)
    return y, u, v


def _upsample(c: np.ndarray, w: int, h: int) -> np.ndarray:
    return np.repeat(np.repeat(c, -(-h // c.shape[0]), axis=0)[:h],
                     -(-w // c.shape[1]), axis=1)[:, :w]


def _yuv_to_rgb(y, u, v) -> np.ndarray:
    """BT.601 full-range (JPEG) -> uint8 RGB (h, w, 3)."""
    yf = y.astype(np.float64)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    bl = yf + 1.772 * uf
    return np.clip(np.stack([r, g, bl], axis=-1), 0, 255) \
        .round().astype(np.uint8)


def _rgb_to_yuv(px: np.ndarray):
    """uint8 RGB (h, w, 3) -> full-range BT.601 Y, U, V float planes."""
    r, g, b = (px[..., k].astype(np.float64) for k in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, u, v


def _subsample(c: np.ndarray, wd: int, hd: int) -> np.ndarray:
    h, w = c.shape
    ph, pw = -(-h // hd) * hd, -(-w // wd) * wd
    if (ph, pw) != (h, w):                 # edge-replicate odd dims
        c = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
    return c.reshape(ph // hd, hd, pw // wd, wd).mean(axis=(1, 3))


def y4m_frame_at(b: bytes, meta: dict, k: int, *, rgb: bool = True
                 ) -> np.ndarray:
    """Decode ONLY frame ``k`` via its closed-form offset (no scan, no
    decode of other frames): uint8 (h, w, 3) RGB, or the raw luma plane
    (h, w) with ``rgb=False`` / mono streams."""
    if not 0 <= k < meta["n_frames"]:
        raise ValueError(f"frame {k} out of range 0..{meta['n_frames']-1}")
    off = meta["header_len"] + k * meta["frame_stride"]
    if b[off: off + 6] != b"FRAME\n":
        raise ValueError(f"Y4M frame {k} marker missing")
    raw = b[off + 6: off + 6 + meta["frame_len"]]
    w, h, cs = meta["width"], meta["height"], meta["colorspace"]
    y, u, v = _yuv_planes(raw, w, h, cs)
    if u is None or not rgb:
        return y
    return _yuv_to_rgb(y, _upsample(u, w, h), _upsample(v, w, h))


def y4m_decode(b: bytes, *, rgb: bool = True):
    """Full decode -> (meta, frames): (n, h, w, 3) RGB, or (n, h, w)
    luma for mono streams / ``rgb=False``."""
    meta = y4m_parse_header(b)
    frames = [y4m_frame_at(b, meta, k, rgb=rgb)
              for k in range(meta["n_frames"])]
    shape = (0, meta["height"], meta["width"])
    return meta, (np.stack(frames) if frames
                  else np.zeros(shape, dtype=np.uint8))


def y4m_encode(frames: np.ndarray, *, fps_num: int = 25, fps_den: int = 1,
               colorspace: str = "420jpeg") -> bytes:
    """(n, h, w) grayscale or (n, h, w, 3) RGB uint8 -> Y4M bytes.
    Grayscale input forces Cmono; RGB converts BT.601 full-range with
    box-filter chroma subsampling (the mean over each siting block)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        colorspace = "mono"
    elif frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("frames must be (n,h,w) gray or (n,h,w,3) RGB")
    if colorspace not in _CHROMA:
        raise ValueError(f"unknown colorspace {colorspace!r}")
    n, h, w = frames.shape[:3]
    head = (f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1"
            f" C{colorspace}\n").encode()
    div = _CHROMA[colorspace]
    out = [head]
    for f in frames:
        out.append(b"FRAME\n")
        if div is None:
            out.append((f if f.ndim == 2 else f[..., 0]).tobytes())
            continue
        y, u, v = _rgb_to_yuv(f)
        out.append(np.clip(y, 0, 255).round().astype(np.uint8).tobytes())
        for c in (u, v):
            cc = _subsample(c, div[0], div[1])
            out.append(np.clip(cc, 0, 255).round().astype(np.uint8)
                       .tobytes())
    return b"".join(out)


def decode_video(b: bytes):
    """Route by container magic: Y4M decodes for real; compressed codecs
    raise the documented sandbox seam (same policy as JPEG on the image
    side — entropy decode is codec-library territory)."""
    if b[:9] == _MAGIC:
        return y4m_decode(b)
    raise NotImplementedError(
        "video decode: only YUV4MPEG2 is in the pure-numpy engine subset; "
        "compressed codecs need a codec library absent from this sandbox")


# ---------------------------------------------------------------------------
# frame analytics: sampling, features, hashes, cut detection
# ---------------------------------------------------------------------------

def _luma_at(b: bytes, meta: dict, k: int) -> np.ndarray:
    off = meta["header_len"] + k * meta["frame_stride"] + 6
    w, h = meta["width"], meta["height"]
    return np.frombuffer(b[off: off + w * h], np.uint8).reshape(h, w)


def ahash64_pixels(px: np.ndarray) -> int:
    """64-bit average hash of a luma/grayscale plane: box-resize to 8x8,
    bit k set iff cell k >= mean. Same construction as the image side's
    ahash64, factored to take pixels directly (no container round-trip)."""
    h, w = px.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.array([[px[ys[i]:max(ys[i + 1], ys[i] + 1),
                          xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                       for j in range(8)] for i in range(8)])
    bits = (cells >= cells.mean()).reshape(-1)
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out - (1 << 64) if out >= (1 << 63) else out  # signed for Spark


def sample_frame_schedule(meta: dict, every_ms: float) -> list:
    """Frame indices sampled at ~every_ms intervals (always includes
    frame 0; derived purely from header math)."""
    if meta["n_frames"] == 0:
        return []
    step = max(1, int(round(every_ms * meta["fps"] / 1000.0)))
    return list(range(0, meta["n_frames"], step))


def video_meta_map_in_pandas(iterator):
    """mapInPandas: (media_id, bytes) -> VIDEO_META_SCHEMA rows. Header
    parse + size math only — zero frame decode; malformed payloads become
    decode_ok=false artifact rows, never task failures (G-guard policy)."""
    for pdf in iterator:
        rows = []
        for mid, b in zip(pdf["media_id"], pdf["bytes"]):
            raw = bytes(b) if b is not None else b""
            try:
                m = y4m_parse_header(raw)
                rows.append((mid, m["width"], m["height"], m["fps"],
                             m["n_frames"], m["duration_ms"],
                             m["colorspace"], True, None))
            except (ValueError, NotImplementedError) as exc:
                rows.append((mid, None, None, None, None, None, None,
                             False, str(exc)))
        yield pd.DataFrame(rows, columns=[
            "media_id", "width", "height", "fps", "n_frames",
            "duration_ms", "colorspace", "decode_ok", "error"])


def frame_features_map_in_pandas(every_ms: float = 1000.0):
    """mapInPandas factory: (media_id, bytes) -> one FRAME_FEATURE row
    per sampled frame (luma mean/std + 64-bit aHash). Random access:
    only sampled frames are read — an every_ms of 1000 over 30 fps
    touches ~3% of the payload bytes. Map-only fan-out; the binary never
    leaves the stage."""
    def fn(iterator):
        for pdf in iterator:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                raw = bytes(b) if b is not None else b""
                try:
                    meta = y4m_parse_header(raw)
                except (ValueError, NotImplementedError):
                    continue  # meta pass owns malformed-payload artifacts
                for k in sample_frame_schedule(meta, every_ms):
                    y = _luma_at(raw, meta, k).astype(np.float64)
                    rows.append((mid, k, k * 1000.0 / meta["fps"],
                                 float(y.mean()), float(y.std()),
                                 ahash64_pixels(y)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "frame_ts_ms",
                "luma_mean", "luma_std", "ahash"])
    return fn


def video_cuts(b: bytes, *, threshold: float = 24.0) -> list:
    """Scene-cut timestamps (ms): mean-absolute luma difference between
    consecutive frames above ``threshold`` marks a cut. Full sequential
    luma walk (cuts need every boundary), still decode-free of chroma."""
    meta = y4m_parse_header(b)
    cuts = []
    prev = None
    for k in range(meta["n_frames"]):
        y = _luma_at(b, meta, k).astype(np.float64)
        if prev is not None:
            if float(np.abs(y - prev).mean()) >= threshold:
                cuts.append(k * 1000.0 / meta["fps"])
        prev = y
    return cuts


# ---------------------------------------------------------------------------
# DSL checks (x-spark-check names) + near-dup operator
# ---------------------------------------------------------------------------

def video_magic_ok_expr(bytes_col: str = "bytes"):
    """Pure-JVM prefilter: payload starts with the YUV4MPEG2 magic."""
    return F.substring(F.col(bytes_col), 1, 9) == F.lit(_MAGIC)


def _arrow_bool(fn):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType
    return pandas_udf(fn, BooleanType())


def video_decodes_batch(b: pd.Series) -> pd.Series:
    out = []
    for v in b:
        raw = bytes(v) if v is not None else b""
        try:
            y4m_parse_header(raw)
            out.append(True)
        except (ValueError, NotImplementedError):
            out.append(False)
    return pd.Series(out, dtype="bool")


def video_duration_consistent_batch(b: pd.Series, declared: pd.Series,
                                    tol_ms: float) -> pd.Series:
    out = []
    for v, d in zip(b, declared):
        raw = bytes(v) if v is not None else b""
        try:
            got = y4m_parse_header(raw)["duration_ms"]
            out.append(bool(abs(got - float(d)) <= tol_ms))
        except (ValueError, NotImplementedError, TypeError):
            out.append(False)
    return pd.Series(out, dtype="bool")


def register_video_checks(dur_col: str = "dur_ms",
                          tol_ms: float = 50.0) -> dict:
    """Named checks for the DSL's ``x-spark-check`` extension point,
    mirroring register_audio_checks / register_image_checks."""
    video_decodes = _arrow_bool(
        lambda b: video_decodes_batch(b))
    duration_ok = _arrow_bool(
        lambda b, d: video_duration_consistent_batch(b, d, tol_ms))
    return {
        "video_magic": lambda col: video_magic_ok_expr(),
        "video_decodes": lambda col: video_decodes(col),
        "video_duration_consistent":
            lambda col: duration_ok(col, F.col(dur_col)),
    }


def video_neardup_pairs(media, *, every_ms: float = 1000.0,
                        max_distance: int = 3, min_matched: int = 2,
                        bytes_col: str = "bytes",
                        id_col: str = "media_id"):
    """Perceptual video near-dup via sampled-frame aHash sequences:
    (a) map-only frame-feature pass (binary never shuffled), (b) block on
    (frame_idx, 16-bit hash band) — pigeonhole: hamming<=3 over 64 bits
    leaves >=1 of the 4 bands exact — (c) per-pair verify that >=
    ``min_matched`` aligned frames are within ``max_distance`` bits.
    Shuffle payload is (id, frame_idx, long) rows; candidate groups are
    band-bucket-local, never a global cross join."""
    df = media.select(F.col(id_col).alias("media_id"),
                      F.col(bytes_col).alias("bytes"))
    feats = df.mapInPandas(frame_features_map_in_pandas(every_ms),
                           schema=FRAME_FEATURE_SCHEMA) \
        .select("media_id", "frame_idx", "ahash")
    bands = feats.select(
        "media_id", "frame_idx", "ahash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("ahash", 16 * i).bitwiseAND(0xFFFF)
                     .alias("key"))
            for i in range(4)])).alias("b"))
    left = bands.select("media_id", "frame_idx", "ahash",
                        F.col("b.band").alias("band"),
                        F.col("b.key").alias("key"))
    right = (left.select(F.col("media_id").alias("media_id_r"),
                         F.col("frame_idx").alias("frame_idx_r"),
                         F.col("ahash").alias("ahash_r"),
                         "band", "key"))
    cand = (left.join(right, ["band", "key"])
            .where((F.col("media_id") < F.col("media_id_r"))
                   & (F.col("frame_idx") == F.col("frame_idx_r")))
            .select("media_id", "media_id_r", "frame_idx",
                    "ahash", "ahash_r").distinct())
    ham = F.bit_count(F.col("ahash").bitwiseXOR(F.col("ahash_r")))
    matched = (cand.where(ham <= max_distance)
               .groupBy("media_id", "media_id_r")
               .agg(F.countDistinct("frame_idx").alias("n_matched")))
    return matched.where(F.col("n_matched") >= min_matched)


def make_y4m(i: int, *, w: int = 32, h: int = 24, n_frames: int = 12,
             fps: int = 25, colorspace: str = "420jpeg",
             cut_at: int | None = None) -> bytes:
    """Deterministic fixture video for clip ``i``: a horizontally
    drifting smooth gradient (motion), optional hard scene cut at frame
    ``cut_at`` (content inverts). Smooth content keeps 4:2:0 chroma loss
    quantifiable for roundtrip SNR pins."""
    rng = np.random.default_rng(9000 + i)
    base = np.linspace(0, 255, w)[None, :] * np.linspace(
        0.4, 1.0, h)[:, None]
    frames = []
    for k in range(n_frames):
        f = np.roll(base, (k * (1 + i % 3)) % w, axis=1)
        if cut_at is not None and k >= cut_at:
            f = 255.0 - f
        rgb = np.stack([f, np.roll(f, w // 4, axis=1), 255.0 - f], axis=-1)
        rgb = rgb + rng.normal(0, 1.0, rgb.shape)
        frames.append(np.clip(rgb, 0, 255).astype(np.uint8))
    return y4m_encode(np.stack(frames), fps_num=fps,
                      colorspace=colorspace)
