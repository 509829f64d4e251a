"""Telephony PCM codecs: G.711 mu-law / A-law and IMA ADPCM, pure numpy.

Real codecs, no stubs: encode AND decode, byte-exact against an
independent reference (CPython's ``audioop``, the C implementation of
the SUN/CCITT G.711 tables and the Intel/DVI IMA algorithm — pinned
exhaustively over the full 16-bit domain in tests/test_pcm_codecs.py).
They extend :func:`...functions.audio.transcode_payload`'s live-codec
set — telephony corpora (call-center speech is a major ASR training
source) arrive as G.711 or IMA-ADPCM WAV, and the engine can now pull
them into the canonical PCM16 representation without an external
library.

Scale shape: all three are map-only per-payload transforms behind the
same Arrow-batched ``transcode_clips`` stage as WAV/FLAC — bytes never
shuffle. G.711 is fully vectorized (a handful of numpy ops per batch);
IMA ADPCM's predictor recursion is inherently sequential per clip, so
it runs as a per-clip python loop inside the Arrow batch (the honest
cost: ~1e6 samples/s/core — fine for the short-clip corpora it exists
for, and the loop is per *clip*, embarrassingly parallel across the
cluster).

Container grammar: G.711 WAVs use fmt tag 6 (A-law) / 7 (mu-law) with
8-bit samples and a ``fact`` chunk; IMA ADPCM uses fmt tag 0x11 with
the 4-byte-per-block header (predictor int16, step index, reserved)
and low-nibble-first packing per the Microsoft WAVE spec — note
``audioop`` packs high-nibble-first, so the exhaustive parity tests
compare nibble *sequences*, not raw bytes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# G.711 mu-law (the SUN g711.c segment algorithm, 14-bit internal domain,
# exactly audioop's arithmetic: v14 = x >> 2 floors toward -inf, so
# negative magnitudes round up one step relative to a naive abs()).
# ---------------------------------------------------------------------------


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 samples -> mu-law codes (uint8). Vectorized; byte-exact to
    audioop.lin2ulaw over the full 16-bit domain (tests)."""
    v = x.astype(np.int32) >> 2
    sign = v < 0
    mag = np.where(sign, -v, v)
    # CLIP then BIAS at 14-bit scale; the saturate cap to 0x1FFF
    # reproduces the reference's seg>=8 escape (code 0x80 / 0x00).
    mag = np.minimum(np.minimum(mag, 8159) + 33, 0x1FFF)
    exp = np.frexp(mag.astype(np.float64))[1] - 6        # bit_length-6: 0..7
    mant = (mag >> (exp + 1)) & 0x0F
    code = ~(np.where(sign, 0x80, 0) | (exp << 4) | mant) & 0xFF
    return code.astype(np.uint8)


def mulaw_decode(c: np.ndarray) -> np.ndarray:
    """mu-law codes (uint8) -> int16 samples; exact audioop.ulaw2lin."""
    c = (~c.astype(np.int32)) & 0xFF
    sign = (c & 0x80) != 0
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = ((((mant << 1) + 33) << exp) - 33) << 2
    return np.where(sign, -mag, mag).astype(np.int16)


# ---------------------------------------------------------------------------
# G.711 A-law (13-bit domain; even-bit inversion with 0x55).
# ---------------------------------------------------------------------------


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 samples -> A-law codes (uint8); exact audioop.lin2alaw.
    Note the asymmetric negative mapping ``-v - 1`` (A-law has no
    signed zero; audioop/SUN fold negatives one step)."""
    v = x.astype(np.int32) >> 3
    sign = v >= 0
    mag = np.where(sign, v, -v - 1)
    mag = np.minimum(mag, 0x0FFF)
    exp = np.minimum(np.maximum(
        np.frexp(mag.astype(np.float64))[1] - 5, 0), 7)
    mant = np.where(exp == 0, mag >> 1, (mag >> exp) & 0x0F)
    code = (np.where(sign, 0x80, 0) | (exp << 4) | mant) ^ 0x55
    return code.astype(np.uint8)


def alaw_decode(c: np.ndarray) -> np.ndarray:
    """A-law codes (uint8) -> int16 samples; exact audioop.alaw2lin."""
    c = c.astype(np.int32) ^ 0x55
    sign = (c & 0x80) != 0
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


# ---------------------------------------------------------------------------
# IMA ADPCM (DVI4): 4-bit differential codes over an 89-entry step table.
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                       -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def ima_encode_core(x: np.ndarray, pred: int = 0,
                    index: int = 0) -> tuple[np.ndarray, int, int]:
    """Encode int16 samples -> 4-bit code array (one uint8 per code,
    values 0..15) from initial predictor state. The quantizer is the
    canonical 3-step successive approximation (delta bits 4/2/1 with
    vpdiff accumulation) — nibble-exact to audioop.lin2adpcm (tests).
    Sequential by construction (each code depends on the running
    predictor); per-clip cost, parallel across clips."""
    out = np.empty(len(x), dtype=np.uint8)
    pred = int(pred)
    index = int(index)
    steps = _IMA_STEPS
    for i, s in enumerate(x.astype(np.int64)):
        step = int(steps[index])
        diff = int(s) - pred
        delta = 0
        if diff < 0:
            delta = 8
            diff = -diff
        vpdiff = step >> 3
        if diff >= step:
            delta |= 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        pred = pred - vpdiff if delta & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[delta])))
        out[i] = delta
    return out, pred, index


def ima_decode_core(codes: np.ndarray, pred: int = 0,
                    index: int = 0) -> tuple[np.ndarray, int, int]:
    """4-bit codes -> int16 samples from initial predictor state;
    the exact inverse companion of :func:`ima_encode_core`."""
    out = np.empty(len(codes), dtype=np.int16)
    pred = int(pred)
    index = int(index)
    for i, delta in enumerate(codes.astype(np.int32)):
        step = int(_IMA_STEPS[index])
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if delta & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[delta])))
        out[i] = pred
    return out, pred, index


# ---------------------------------------------------------------------------
# WAV containers for the three codecs (mono writers; the extended parser
# below downmixes multi-channel G.711 and refuses multi-channel IMA —
# per-channel 4-byte interleave groups are out of the engine subset).
# ---------------------------------------------------------------------------

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7
WAVE_FORMAT_IMA_ADPCM = 0x11


def _riff(chunks: list) -> bytes:
    body = b"".join(
        cid + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))
        for cid, data in chunks)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wav_bytes_g711(samples: np.ndarray, sr_hz: int, *,
                   law: str = "mulaw") -> bytes:
    """Mono int16 samples -> a G.711 WAV (fmt tag 7 mu-law / 6 A-law,
    8-bit, fact chunk carrying the sample count per the WAVE spec for
    non-PCM formats)."""
    if law == "mulaw":
        data, tag = mulaw_encode(samples), WAVE_FORMAT_MULAW
    elif law == "alaw":
        data, tag = alaw_encode(samples), WAVE_FORMAT_ALAW
    else:
        raise ValueError(f"law must be 'mulaw' or 'alaw', got {law!r}")
    fmt = struct.pack("<HHIIHHH", tag, 1, sr_hz, sr_hz, 1, 8, 0)
    fact = struct.pack("<I", len(samples))
    return _riff([(b"fmt ", fmt), (b"fact", fact),
                  (b"data", data.tobytes())])


def wav_bytes_ima_adpcm(samples: np.ndarray, sr_hz: int, *,
                        block_align: int = 512) -> bytes:
    """Mono int16 samples -> an IMA-ADPCM WAV (fmt tag 0x11): per-block
    4-byte header (first sample verbatim as the predictor, step index,
    reserved 0) + low-nibble-first codes; the final partial block is
    zero-padded and the fact chunk's true sample count makes the
    decoder truncate the padding."""
    if block_align < 8 or block_align % 4:
        raise ValueError("block_align must be a multiple of 4, >= 8")
    spb = (block_align - 4) * 2 + 1        # samples per block
    x = samples.astype(np.int16)
    n = len(x)
    blocks = []
    index = 0
    for start in range(0, max(n, 1), spb):
        blk = x[start: start + spb]
        if len(blk) == 0:
            break
        pred = int(blk[0])
        body = blk[1:]
        if len(body) < spb - 1:            # zero-pad the tail block
            body = np.concatenate([
                body, np.zeros(spb - 1 - len(body), dtype=np.int16)])
        codes, _, end_index = ima_encode_core(body, pred, index)
        packed = (codes[0::2] | (codes[1::2] << 4)).astype(np.uint8)
        # header carries the STARTING index for this block's body (the
        # decoder's initial state); the end state seeds the next block.
        blocks.append(struct.pack("<hBB", pred, index, 0) + packed.tobytes())
        index = end_index
    fmt = struct.pack("<HHIIHHH", WAVE_FORMAT_IMA_ADPCM, 1, sr_hz,
                      (sr_hz * block_align + spb - 1) // spb,
                      block_align, 4, 2) + struct.pack("<H", spb)
    fact = struct.pack("<I", n)
    return _riff([(b"fmt ", fmt), (b"fact", fact),
                  (b"data", b"".join(blocks))])


def _walk_wav(b: bytes) -> dict:
    """RIFF chunk walk -> {fmt fields, data payload, fact count}.
    Same grammar/policy as audio._parse_wav_pcm16 (any chunk order,
    pad bytes honored, ValueError on malformed)."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, len(b)
    info: dict = {"fact": None, "raw": None, "fmt_tag": None}
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            if size < 16 or body + 16 > end:
                raise ValueError("truncated fmt chunk")
            (info["fmt_tag"], info["n_ch"], info["sr"], _,
             info["block_align"], info["bits"]) = struct.unpack_from(
                "<HHIIHH", b, body)
            if size >= 20:
                info["ext"] = struct.unpack_from("<H", b, body + 18)[0]
        elif cid == b"fact":
            if size >= 4 and body + 4 <= end:
                info["fact"] = struct.unpack_from("<I", b, body)[0]
        elif cid == b"data":
            raw = b[body: body + size]
            if len(raw) < size:
                raise ValueError("truncated data chunk")
            info["raw"] = raw
        pos = body + size + (size & 1)
    if info["fmt_tag"] is None:
        raise ValueError("missing fmt chunk")
    if info["raw"] is None:
        raise ValueError("missing data chunk")
    return info


def _ima_samples_per_block(block_align: int) -> int:
    return (block_align - 4) * 2 + 1


def decode_wav_extended(b: bytes) -> tuple[int, np.ndarray]:
    """Parse a WAV of any engine-supported encoding -> (sr, mono float
    samples in [-1,1)): integer PCM16 (tag 1), A-law (6), mu-law (7),
    mono IMA ADPCM (0x11). Multi-channel G.711/PCM downmixes by channel
    mean (the corpus canonical form); multi-channel IMA raises
    NotImplementedError (per-channel nibble interleave — out of
    subset). ValueError on malformed containers, same policy as
    decode_wav_pcm16."""
    info = _walk_wav(b)
    tag, raw = info["fmt_tag"], info["raw"]
    n_ch, sr = info["n_ch"], info["sr"]
    if n_ch < 1:
        raise ValueError("bad channel count")
    if tag == WAVE_FORMAT_PCM:
        from .audio import decode_wav_pcm16
        return decode_wav_pcm16(b)
    if tag in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        if info["bits"] != 8:
            raise ValueError("G.711 WAV must be 8-bit")
        codes = np.frombuffer(raw[: (len(raw) // n_ch) * n_ch],
                              dtype=np.uint8)
        pcm = (alaw_decode(codes) if tag == WAVE_FORMAT_ALAW
               else mulaw_decode(codes))
        x = pcm.astype(np.float64) / 32767.0
        if n_ch > 1:
            x = x.reshape(-1, n_ch).mean(axis=1)
        if info["fact"] is not None:
            x = x[: info["fact"]]
        return sr, x
    if tag == WAVE_FORMAT_IMA_ADPCM:
        if n_ch != 1:
            raise NotImplementedError(
                "multi-channel IMA ADPCM outside engine subset")
        ba = info["block_align"]
        if ba < 8:
            raise ValueError("bad IMA block align")
        spb = _ima_samples_per_block(ba)
        out = []
        for start in range(0, len(raw), ba):
            blk = raw[start: start + ba]
            if len(blk) < 4:
                raise ValueError("truncated IMA block header")
            pred, index, _ = struct.unpack_from("<hBB", blk, 0)
            if index > 88:
                raise ValueError("IMA step index out of range")
            packed = np.frombuffer(blk[4:], dtype=np.uint8)
            codes = np.empty(len(packed) * 2, dtype=np.uint8)
            codes[0::2] = packed & 0x0F
            codes[1::2] = packed >> 4
            dec, _, _ = ima_decode_core(codes, pred, index)
            out.append(np.concatenate([[np.int16(pred)], dec]))
        x = (np.concatenate(out) if out
             else np.zeros(0, dtype=np.int16)).astype(np.float64) / 32767.0
        if info["fact"] is not None:
            x = x[: info["fact"]]
        return sr, x
    raise NotImplementedError(f"WAV format tag {tag} outside engine subset")


def wav_info(b: bytes) -> dict:
    """Header-only WAV metadata: {fmt_tag, sr_hz, n_ch, bits,
    n_samples} without touching sample data — the cheap route for
    duration/consistency checks. n_samples: fact chunk when present
    (authoritative for compressed formats), else derived from the data
    size (PCM16/G.711 frame math; IMA block math)."""
    info = _walk_wav(b)
    tag, n_ch = info["fmt_tag"], info["n_ch"]
    if n_ch < 1:
        raise ValueError("bad channel count")
    n = info["fact"]
    if n is None:
        size = len(info["raw"])
        if tag == WAVE_FORMAT_PCM:
            n = size // (2 * n_ch)
        elif tag in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
            n = size // n_ch
        elif tag == WAVE_FORMAT_IMA_ADPCM:
            ba = info["block_align"]
            if ba < 8:
                raise ValueError("bad IMA block align")
            spb = _ima_samples_per_block(ba)
            full, rem = divmod(size, ba)
            n = full * spb + (max((rem - 4) * 2 + 1, 0) if rem else 0)
        else:
            raise NotImplementedError(
                f"WAV format tag {tag} outside engine subset")
    return {"fmt_tag": tag, "sr_hz": info["sr"], "n_ch": n_ch,
            "bits": info["bits"], "n_samples": int(n)}
