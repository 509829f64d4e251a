"""Baseline JFIF/JPEG codec in pure numpy — closes the image-side
"JPEG decode is a stub" seam the same way FLAC closed audio's and Y4M
closed video's: a real, spec-conformant (ITU-T T.81 baseline sequential
DCT) encoder + decoder with strict malformed-input policy, no codec
library.

Subset (stated, honest): baseline sequential (SOF0), 8-bit, grayscale or
YCbCr 4:4:4 (the encoder never subsamples; the decoder accepts any
sampling factors that are all-equal — 4:2:0 streams from external
encoders raise NotImplementedError rather than mis-render), standard or
custom Huffman tables from DHT, DRI/RSTn restart markers, progressive
(SOF2) and arithmetic coding out of subset. Everything here is public
Annex-K material: the two example quantization tables (scaled by the
IJG quality curve), the four standard Huffman tables, the zigzag order.

Structure mirrors the sibling codecs: container walk raises ValueError
on corruption (bad marker stream, truncated entropy data, invalid
Huffman code), NotImplementedError on conformant-but-out-of-subset
streams; the mapInPandas plumbing in functions/multimodal.py routes by
magic and treats both as "undecodable" artifact rows, never task
failures.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (T.81 figure A.6): index i of the zigzag sequence ->
# position in the 8x8 block (row-major)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K.1 example quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99], dtype=np.int64).reshape(8, 8)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal DCT-II basis: block_dct = C @ block @ C.T
_C = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                for x in range(8)] for u in range(8)])


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 50 -> tables verbatim, 100 -> all-ones."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------

def _build_codes(bits, huffval):
    """(bits, huffval) -> {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, huffval):
    """(bits, huffval) -> {(length, code): symbol} for the bit reader."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(huffval):
                raise ValueError("DHT counts exceed symbol list")
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-coded segment reader with 0xFF00 unstuffing; hitting a
    real marker or running dry raises ValueError."""

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.b):
            raise ValueError("truncated JPEG entropy data")
        v = self.b[self.pos]
        self.pos += 1
        if v == 0xFF:
            if self.pos >= len(self.b):
                raise ValueError("truncated JPEG entropy data")
            m = self.b[self.pos]
            if m == 0x00:
                self.pos += 1
            else:
                raise ValueError("unexpected marker inside entropy data")
        self.acc = (self.acc << 8) | v
        self.n += 8

    def read_bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude code to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int):
    """Signed value -> (ssss category, magnitude code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray):
    r, g, b = (px[..., k].astype(np.float64) for k in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [y, cb, cr]


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).round() \
        .astype(np.uint8)


def _encode_plane_blocks(plane: np.ndarray, qt: np.ndarray):
    """Pad to 8x8 multiples (edge replicate), DCT, quantize -> iterator
    of zigzagged int coefficient vectors in raster MCU order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane.astype(np.float64) - 128.0,
               ((0, ph - h), (0, pw - w)), mode="edge")
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            blk = p[by:by + 8, bx:bx + 8]
            coef = _C @ blk @ _C.T
            q = np.round(coef / qt).astype(np.int64)
            yield q.reshape(-1)[_ZIGZAG]


def _huff_segment(tc: int, th: int, bits, huffval) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode(px: np.ndarray, *, quality: int = 90) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes
    (4:4:4, Annex-K tables scaled by the IJG quality curve)."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("pixels must be (h,w) gray or (h,w,3) RGB")
    h, w = px.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    qts = [_quality_scale(_QT_LUMA, quality)]
    planes = [px.astype(np.float64)] if gray else _rgb_to_ycbcr(px)
    if not gray:
        qts.append(_quality_scale(_QT_CHROMA, quality))

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for i, qt in enumerate(qts):                       # DQT
        body = bytes([i]) + bytes(int(v) for v in qt.reshape(-1)[_ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _huff_segment(0, 0, *_DC_LUMA)
    out += _huff_segment(1, 0, *_AC_LUMA)
    if not gray:
        out += _huff_segment(0, 1, *_DC_CHROMA)
        out += _huff_segment(1, 1, *_AC_CHROMA)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]
    wtr = _BitWriter()
    block_iters = [list(_encode_plane_blocks(
        pl, qts[min(ci, len(qts) - 1)])) for ci, pl in enumerate(planes)]
    pred = [0] * nc
    for m in range(len(block_iters[0])):               # 4:4:4 MCU = 1 blk/comp
        for ci in range(nc):
            zz = block_iters[ci][m]
            ti = 0 if ci == 0 else 1
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            t, mag = _magnitude(diff)
            code, ln = dc_codes[ti][t]
            wtr.write(code, ln)
            if t:
                wtr.write(mag, t)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[ti][0xF0]      # ZRL
                    wtr.write(code, ln)
                    run -= 16
                t, mag = _magnitude(v)
                code, ln = ac_codes[ti][(run << 4) | t]
                wtr.write(code, ln)
                wtr.write(mag, t)
                run = 0
            if run:
                code, ln = ac_codes[ti][0x00]          # EOB
                wtr.write(code, ln)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def jpeg_decode(b: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 pixels ((h, w) gray or (h, w, 3)
    RGB). ValueError on malformed streams; NotImplementedError on
    conformant streams outside the subset (progressive, subsampled,
    12-bit, arithmetic)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict = {}
    dc_tabs: dict = {}
    ac_tabs: dict = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated JPEG marker stream")
        if b[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = b[pos + 1]
        pos += 2
        if marker == 0x00:      # FF00 is stuffing, only legal in entropy
            raise ValueError("invalid JPEG marker 0x00")
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                                   # standalone
        seglen = struct.unpack_from(">H", b, pos)[0]
        body = b[pos + 2: pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        nxt = pos + seglen
        if marker == 0xDB:                             # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                vals = np.frombuffer(body[p + 1:p + 65], np.uint8)
                if len(vals) != 64:
                    raise ValueError("short DQT")
                qt = np.zeros(64, np.int64)
                qt[_ZIGZAG] = vals
                qts[tq] = qt.reshape(8, 8)
                p += 65
        elif marker == 0xC4:                           # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                huffval = list(body[p + 17:p + 17 + n])
                if len(huffval) != n:
                    raise ValueError("short DHT")
                tab = _build_decode_table(bits, huffval)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                p += 17 + n
        elif marker == 0xC0:                           # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG precision")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            if len({(c["h"], c["v"]) for c in comps}) != 1:
                raise NotImplementedError(
                    "subsampled JPEG outside engine subset (4:4:4 only)")
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} outside baseline subset")
        elif marker == 0xDD:                           # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:                           # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next((c for c in frame["comps"] if c["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError("SOS names unknown component")
                scan.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(b, nxt, frame, scan, qts, dc_tabs,
                                ac_tabs, restart_interval)
        # APPn/COM and anything else with a length: skip
        pos = nxt


def _decode_scan(b, pos, frame, scan, qts, dc_tabs, ac_tabs,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    if not h or not w:
        raise ValueError("zero-sized JPEG frame")
    nc = len(scan)
    bh, bw = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw * 8), np.float64) for _ in range(nc)]
    rdr = _BitReader(b, pos)
    pred = [0] * nc
    n_mcu = bh * bw
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            # byte-align and consume the RSTn marker
            rdr.n = 0
            if b[rdr.pos:rdr.pos + 1] != b"\xff" or \
                    not 0xD0 <= b[rdr.pos + 1] <= 0xD7:
                raise ValueError("missing JPEG restart marker")
            rdr.pos += 2
            pred = [0] * nc
        by, bx = divmod(m, bw)
        for ci, (comp, td, ta) in enumerate(scan):
            if td not in dc_tabs or ta not in ac_tabs:
                raise ValueError("SOS references missing Huffman table")
            if comp["tq"] not in qts:
                raise ValueError("component references missing DQT")
            zz = np.zeros(64, np.int64)
            t = rdr.read_symbol(dc_tabs[td])
            diff = _extend(rdr.read_bits(t), t) if t else 0
            pred[ci] += diff
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = rdr.read_symbol(ac_tabs[ta])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16                        # ZRL
                        continue
                    break                              # EOB
                k += r
                if k > 63:
                    raise ValueError("JPEG AC run overflows block")
                zz[k] = _extend(rdr.read_bits(s), s)
                k += 1
            blk = np.zeros(64, np.int64)
            blk[_ZIGZAG] = zz
            coef = blk.reshape(8, 8) * qts[comp["tq"]]
            pix = _C.T @ coef @ _C + 128.0
            planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        return np.clip(planes[0], 0, 255).round().astype(np.uint8)
    if nc == 3:
        return _ycbcr_to_rgb(*planes)
    raise NotImplementedError(f"{nc}-component JPEG outside subset")


def jpeg_dimensions(b: bytes):
    """(width, height) from the SOF header alone — no entropy decode."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = b[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        seglen = struct.unpack_from(">H", b, pos)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _, h, w = struct.unpack_from(">BHH", b, pos + 2)
            return w, h
        pos += seglen
    raise ValueError("no JPEG frame header found")


def make_jpeg(i: int, *, w: int = 24, h: int = 16, gray: bool = False,
              quality: int = 90) -> bytes:
    """Deterministic fixture image for clip ``i``: smooth gradients plus
    a seeded low-amplitude texture (keeps quantization loss measurable
    without block-noise cliffs)."""
    rng = np.random.default_rng(7100 + i)
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    base = 0.5 * gx + 0.5 * gy
    if gray:
        px = base + rng.normal(0, 2.0, (h, w))
        return jpeg_encode(np.clip(px, 0, 255).astype(np.uint8),
                           quality=quality)
    rgb = np.stack([base, np.roll(base, w // 3, axis=1), 255.0 - base],
                   axis=-1) + rng.normal(0, 2.0, (h, w, 3))
    return jpeg_encode(np.clip(rgb, 0, 255).astype(np.uint8),
                       quality=quality)
