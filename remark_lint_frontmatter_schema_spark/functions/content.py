"""draft-07 content keywords: ``contentEncoding`` / ``contentMediaType``.

JSON Schema draft-07 §8 defines both as *annotations* a validator MAY
assert; Ajv (the reference's validator, index.ts:310-317) leaves them
annotate-only by default. This engine asserts them — at corpus scale a
declared-but-wrong payload encoding is exactly the defect a validation
pass exists to catch — and documents the deviation here; an encoding or
media type the engine cannot verify lands in ``CompiledRuleset.unknown``
(strict mode flags it) rather than passing vacuously.

All checks are pure JVM Column expressions:

- base64 validity  = one anchored ``rlike`` (RFC 4648 alphabet + padding)
- media sniffing   = magic-byte equality on a bounded binary prefix
  (``substring`` of a binary column, or ``unbase64`` of the first 16
  base64 chars -> 12 decoded bytes — the payload itself is never
  decoded in full, so a 10 MB clip costs a 12-byte probe)
- application/json = ``try_parse_json`` (NULL on malformed) for plain
  string instances; the full parse is unavoidable for JSON but stays
  JVM-side

Magic numbers are the public file signatures (PNG: RFC 2083 §12.11,
RIFF/WAVE, JPEG SOI, GIF87a/89a, MP3 ID3v2 or 0xFFE frame sync).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC 4648 base64: 4-char groups, optional 1-2 '=' padding tail.
# \A/\z anchors, not ^/$: java.util.regex lets $ match before a trailing
# newline, which would bless "QUJD\n" as valid base64
BASE64_RE = (r"\A(?:[A-Za-z0-9+/]{4})*"
             r"(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?\z")

SUPPORTED_ENCODINGS = ("base64",)


def base64_ok(col: Column) -> Column:
    return col.rlike(BASE64_RE)


# media type -> (offset (1-based), magic bytes); checked with AND across
# entries so RIFF/WAVE needs both the container tag and the form type
_MAGIC: dict[str, tuple[tuple[int, bytes], ...]] = {
    "image/png": ((1, b"\x89PNG\r\n\x1a\n"),),
    "image/jpeg": ((1, b"\xff\xd8\xff"),),
    "image/gif": ((1, b"GIF8"),),
    "audio/wav": ((1, b"RIFF"), (9, b"WAVE")),
    "audio/x-wav": ((1, b"RIFF"), (9, b"WAVE")),
    "audio/flac": ((1, b"fLaC"),),
    "audio/ogg": ((1, b"OggS"),),
    "application/pdf": ((1, b"%PDF"),),
}

# every magic fits inside the first 12 bytes == 16 base64 chars
PROBE_B64_CHARS = 16
SUPPORTED_MEDIA_TYPES = tuple(sorted(_MAGIC)) + (
    "audio/mpeg", "application/json")


def magic_ok(prefix: Column, media_type: str) -> Column | None:
    """Boolean Column: does the binary ``prefix`` carry ``media_type``'s
    signature? None when the type has no registered signature."""
    if media_type in _MAGIC:
        ok = F.lit(True)
        for off, magic in _MAGIC[media_type]:
            ok = ok & (F.substring(prefix, off, len(magic)) == F.lit(magic))
        return ok
    if media_type == "audio/mpeg":
        # ID3v2 header, or a raw MPEG frame sync (11 set bits: first
        # byte 0xFF, second byte top-3 bits set -> hex 'FFE*'/'FFF*')
        return ((F.substring(prefix, 1, 3) == F.lit(b"ID3"))
                | F.hex(F.substring(prefix, 1, 2)).rlike("^FF[EF]"))
    return None


def b64_probe(col: Column) -> Column:
    """First 12 decoded bytes of a base64 string column: NULL unless the
    probe prefix is itself decodable base64 (either four clean groups, or
    the whole — short — payload with its padding), so a corrupt payload
    yields NULL, not garbage bytes."""
    head = F.substring(col, 1, PROBE_B64_CHARS)
    return F.when(head.rlike(BASE64_RE), F.unbase64(head))


def json_ok(col: Column) -> Column:
    """Well-formed JSON text (try_parse_json: NULL on malformed input)."""
    return F.try_parse_json(col).isNotNull()
