"""String-format regexes (the ``format`` keyword).

The reference registers ajv-formats (``/root/reference/index.ts:16,318``).
These patterns are re-derived from the publicly documented ajv-formats
definitions (https://github.com/ajv-validator/ajv-formats — MIT, public),
simplified where full RFC fidelity needs code, and anchored because Spark's
``rlike`` is an unanchored search while format checks are full-string.
"""

# RFC 4291 textual forms incl. IPv4-embedded tails at every compression
# point, mirroring the ajv-formats IPV6 pattern (built programmatically —
# the hand-flattened version misplaced the dotted-quad alternations and
# rejected e.g. '1:2:3:4:5:6:1.2.3.4' and '64:ff9b::192.0.2.33')
_V4 = (r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
       r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}")


def _ipv6_regex() -> str:
    h = "[0-9a-fA-F]{1,4}"
    alts = [
        f"(({h}:){{7}}({h}|:))",
        f"(({h}:){{6}}(:{h}|{_V4}|:))",
        f"(({h}:){{5}}((:{h}){{1,2}}|:{_V4}|:))",
        f"(({h}:){{4}}((:{h}){{1,3}}|(:{h})?:{_V4}|:))",
        f"(({h}:){{3}}((:{h}){{1,4}}|(:{h}){{0,2}}:{_V4}|:))",
        f"(({h}:){{2}}((:{h}){{1,5}}|(:{h}){{0,3}}:{_V4}|:))",
        f"({h}:((:{h}){{1,6}}|(:{h}){{0,4}}:{_V4}|:))",
        f"(:((:{h}){{1,7}}|(:{h}){{0,5}}:{_V4}|:))",
    ]
    return "^(" + "|".join(alts) + ")(%.+)?$"


FORMAT_REGEX = {
    "ipv6": _ipv6_regex(),
    "date": r"^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$",
    "time": r"^([01]\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?([zZ]|[+-]([01]\d|2[0-3]):[0-5]\d)?$",
    "date-time": (
        r"^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
        r"[tT ]([01]\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?([zZ]|[+-]([01]\d|2[0-3]):[0-5]\d)$"
    ),
    "email": r"^[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$",
    "uri": r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ipv4": r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$",
    "hostname": r"^(?=.{1,253}\.?$)[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*\.?$",
    # ISO 8601 duration, exact ajv-formats shape: weeks XOR the Y/M/D/T
    # parts, integer components only, lookaheads forbid bare "P"/"PT"
    "duration": (
        r"^P(?!$)(\d+W|(\d+Y)?(\d+M)?(\d+D)?"
        r"(T(?=\d)(\d+H)?(\d+M)?(\d+S)?)?)$"
    ),
    # `url` is registered (deprecated) by ajv-formats; its WHATWG-ish
    # regex is re-derived here as the pragmatic anchored form — scheme
    # (case-insensitive, as ajv's /i) + non-empty authority + no
    # whitespace. Documented deviations: localhost/private-IP hosts and
    # TLD-less names are ACCEPTED here (ajv rejects them) — at curation
    # scale internal URLs are data, not defects; tighten per-ruleset
    # with `pattern` if the ajv behavior is wanted
    "url": r"^(?i:https?|ftp)://[^\s/?#]+[^\s]*$",
    "json-pointer": r"^(/([^/~]|~[01])*)*$",
    "relative-json-pointer": r"^(0|[1-9]\d*)(#|(/([^/~]|~[01])*)*)$",
    # uri-reference: any uri or relative reference without spaces/fragments
    # beyond one '#' (structural check, as ajv's is regex-based too)
    "uri-reference": r"^[^\s\\#]*(#[^\s\\#]*)?$",
    # RFC 6570 URI template — the ajv-formats URITEMPLATE pattern (its /i
    # flag becomes Java's inline (?i))
    "uri-template": (
        r"(?i)^(?:(?:[^\x00-\x20\"'<>%\\^`{|}]|%[0-9a-f]{2})|"
        r"\{[+#./;?&=,!@|]?(?:[a-z0-9_]|%[0-9a-f]{2})+"
        r"(?::[1-9][0-9]{0,3}|\*)?"
        r"(?:,(?:[a-z0-9_]|%[0-9a-f]{2})+(?::[1-9][0-9]{0,3}|\*)?)*\})*$"
    ),
    # base64 content (ajv-formats BYTE, multiline collapsed to one line)
    "byte": (r"^(?:[A-Za-z0-9+/]{4})*"
             r"(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"),
}

# ajv-formats v3 renamed time/date-time to iso-time/iso-date-time (keeping
# the old names); same regexes
FORMAT_REGEX["iso-time"] = FORMAT_REGEX["time"]
FORMAT_REGEX["iso-date-time"] = FORMAT_REGEX["date-time"]

# ajv-formats JSON_POINTER_URI_FRAGMENT (RFC 6901 §6, its /i inlined)
FORMAT_REGEX["json-pointer-uri-fragment"] = (
    r"(?i)^#(?:\/(?:[a-z0-9_\-.!$&'()*+,;:=@]|%[0-9a-f]{2}|~0|~1)*)*$"
)

# PARITY-PLUS: ajv-formats 2.1.1 (the reference's pin) deliberately does
# NOT provide the internationalized formats — its README lists iri,
# iri-reference, idn-email, idn-hostname as unimplemented (extra deps), so
# with the reference a schema using them throws Ajv's unknown-format
# strict error. Registering pragmatic anchored checks here is therefore
# beyond-parity by design (documented deviation, like `url`):
#  * iri / iri-reference — RFC 3987 is RFC 3986 with ucschar added to the
#    unreserved set; the engine's uri/uri-reference regexes constrain only
#    scheme shape and whitespace, and `[^\s]` in Java regex already admits
#    non-ASCII, so the same structural checks are faithful for IRIs.
#  * idn-hostname — RFC 1123 label structure (1-63 chars, no leading/
#    trailing hyphen, dot-separated, ≤253 total) with `\p{L}\p{N}` in
#    place of ASCII alphanumerics. Punycode validity / IDNA2008 contextual
#    rules (e.g. bidi) are NOT checked — that needs a library, not a regex.
#  * idn-email — RFC 6531 shape: one '@', non-empty unicode local part
#    without spaces/angle brackets, idn-hostname domain.
_IDN_LABEL = r"[\p{L}\p{N}](?:[\p{L}\p{N}-]{0,61}[\p{L}\p{N}])?"
FORMAT_REGEX["iri"] = FORMAT_REGEX["uri"]
FORMAT_REGEX["iri-reference"] = FORMAT_REGEX["uri-reference"]
FORMAT_REGEX["idn-hostname"] = (
    rf"^(?=.{{1,253}}\.?$)(?:{_IDN_LABEL})(?:\.(?:{_IDN_LABEL}))*\.?$"
)
FORMAT_REGEX["idn-email"] = (
    rf"^[^\s@<>]+@(?:{_IDN_LABEL})(?:\.(?:{_IDN_LABEL}))*$"
)

# numeric formats (ajv-formats registers these with type: "number"): value
# must be integral and inside the two's-complement range. Compiled as pure
# Column range/floor expressions over numeric columns (plans/compiler.py).
FORMAT_NUMERIC_RANGE = {
    "int32": (-(1 << 31), (1 << 31) - 1),
    "int64": (-(1 << 63), (1 << 63) - 1),
}

# formats ajv-formats registers as unconditionally true (annotation-like:
# `binary`/`password` mark OpenAPI intent, `byte` strictness lives in the
# regex table above) — compile to a static pass, not an unknown warning
FORMAT_ALWAYS_OK = {"binary", "password"}

# `float`/`double`: ajv-formats checks finiteness (NaN/Inf fail); for
# floating columns that's isnan/infinity probes, for other numerics vacuous
FORMAT_FINITE = {"float", "double"}


def regex_format_ok(col):
    """Validity of the VALUE as a regular expression (ajv-formats
    ``regex``, registered by the reference at
    /root/reference/index.ts:16,318 — there it probes ``new RegExp(str)``).

    Pattern validity is not itself regex-expressible, and Spark's ``rlike``
    with a per-row pattern *throws* on an invalid pattern instead of
    returning false — so this is an Arrow-batched pandas UDF probing
    ``re.compile`` per distinct value (memoized per batch). Dialect note:
    the probe speaks Python ``re`` (ajv speaks JS RegExp, the engine's
    runtime checks speak java.util.regex) — each implementation of this
    format checks validity in its own dialect; ours is documented as
    Python's. UDF => off the pure-JVM hot path, which is why the compiler
    gates it behind the ``udf_formats`` option.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _ok(s: pd.Series) -> pd.Series:
        import re as _re
        cache: dict = {}

        def chk(v):
            if v is None:
                return None
            hit = cache.get(v)
            if hit is None:
                try:
                    _re.compile(v)
                    hit = True
                except _re.error:
                    hit = False
                cache[v] = hit
            return hit

        return s.map(chk)

    return _ok(col)


# formats whose check needs a vectorized Python probe (not a JVM regex);
# compiled only when the `udf_formats` engine option is on
FORMAT_UDF_CHECKERS = {
    "regex": regex_format_ok,
}
