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
    "json-pointer": r"^(/([^/~]|~[01])*)*$",
    "relative-json-pointer": r"^(0|[1-9]\d*)(#|(/([^/~]|~[01])*)*)$",
    # uri-reference: any uri or relative reference without spaces/fragments
    # beyond one '#' (structural check, as ajv's is regex-based too)
    "uri-reference": r"^[^\s\\#]*(#[^\s\\#]*)?$",
}
