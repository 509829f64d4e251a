"""Format-regex semantics (ajv-formats parity examples), evaluated in the
JVM regex dialect — the one `rlike` executes at runtime."""

import pytest

from remark_lint_frontmatter_schema_spark.functions.formats import FORMAT_REGEX

CASES = {
    "date": (["2026-02-28", "1999-12-31"], ["2026-13-01", "2026-00-10",
                                            "26-01-01", "2026-01-32"]),
    "time": (["23:59:59", "00:00:00.123", "10:20:30Z", "10:20:30+05:30"],
             ["24:00:00", "10:61:00", "1:2:3"]),
    "date-time": (["2026-01-02T03:04:05Z", "2026-01-02 03:04:05+01:00"],
                  ["2026-01-02", "03:04:05Z", "2026-01-02T25:00:00Z"]),
    "email": (["a@b.co", "first.last+tag@sub.example.org"],
              ["no-at-sign", "a@", "@b.co", "a@-bad.com"]),
    "uri": (["https://example.com/x?y=1", "urn:isbn:0451450523"],
            ["not a uri", "//missing-scheme", "ht tp://x"]),
    "uuid": (["123e4567-e89b-42d3-a456-426614174000"],
             ["123e4567e89b42d3a456426614174000", "xyz-4567"]),
    "ipv4": (["127.0.0.1", "255.255.255.255"],
             ["256.1.1.1", "1.2.3", "1.2.3.4.5"]),
    "hostname": (["example.com", "a-b.c-d.org", "localhost"],
                 ["-bad.com", "bad-.com", "ex ample.com"]),
    "ipv6": (["::1", "2001:db8::8a2e:370:7334", "1:2:3:4:5:6:7:8",
              "fe80::", "::ffff:192.168.0.1",
              # IPv4-embedded forms at every compression point (RFC 4291)
              "1:2:3:4:5:6:1.2.3.4", "64:ff9b::192.0.2.33",
              "fe80::1.2.3.4", "::ffff:0:255.255.255.255",
              "fe80::1%eth0"],
             ["12345::", "1::2::3", "1:2:3:4:5:6:7:8:9", "g::1",
              "1:2:3:4:5:6:7:1.2.3.4", "::1.2.3.256"]),
    # ajv-formats duration: integer components only (no fractional seconds)
    "duration": (["P3Y6M4DT12H30M5S", "P2W", "PT5S", "P1D"],
                 ["P", "PT", "P1W2D", "P1S", "3Y", "PT0.5S"]),
    "json-pointer": (["", "/foo/bar~0", "/a~1b/0"],
                     ["foo", "/~2", "/a~"]),
    "relative-json-pointer": (["0#", "1/foo", "0", "12/a~1b"],
                              ["#", "01/foo", "-1/x", "1#/x"]),
    "uri-reference": (["/path/to?x=1", "fragment#only", "", "../rel"],
                      ["a b", "two#hash#marks", "back\\slash"]),
    # ajv-formats JSON_POINTER_URI_FRAGMENT examples (RFC 6901 §6)
    "json-pointer-uri-fragment": (
        ["#", "#/foo/0", "#/a~1b", "#/c%25d", "#/m~0n"],
        ["#foo", "/foo/bar", "#/~2", "#/a b"]),
    # parity-plus internationalized formats (ajv-formats 2.1.1 does not
    # implement these; documented pragmatic checks)
    "idn-hostname": (["example.com", "bücher.de", "例え.テスト",
                      "xn--bcher-kva.example", "localhost"],
                     ["-bad.com", "bad-.com", "ex ample.com", "a..b"]),
    "idn-email": (["user@example.com", "θσερ@εχαμπλε.ψομ",
                   "用户@例え.テスト"],
                  ["no-at-sign", "a@", "@b.co", "a b@c.de", "a@-bad.com"]),
    "iri": (["https://en.wiktionary.org/wiki/Ῥόδος", "urn:isbn:0451450523"],
            ["not a iri", "//missing-scheme"]),
}


@pytest.mark.parametrize("fmt", sorted(CASES))
def test_format_examples(spark, fmt):
    pattern = spark._jvm.java.util.regex.Pattern.compile(FORMAT_REGEX[fmt])
    good, bad = CASES[fmt]
    for v in good:
        assert pattern.matcher(v).find(), f"{fmt}: {v!r} should match"
    for v in bad:
        assert not pattern.matcher(v).find(), f"{fmt}: {v!r} should NOT match"


def test_all_formats_compile_in_jvm(spark):
    for fmt, rx in FORMAT_REGEX.items():
        spark._jvm.java.util.regex.Pattern.compile(rx)


# ---------------------------------------------------------------------------
# round 2: uri-template / byte regexes, int32/int64 numeric formats, and the
# UDF-backed `regex` format (opt-in)
# ---------------------------------------------------------------------------

CASES_R2 = {
    "uri-template": (["http://example.com/{id}", "/users{?page,limit}",
                      "{+path}/here", "plain/path"],
                     ["{unclosed", "bad {id*2}", "{}"]),
    "byte": (["TWFu", "TWE=", "TQ==", ""],
             ["TWFu=", "T!Fu", "=TWFu"]),
    "url": (["http://example.com", "https://a.b/c?d=1#f",
             "ftp://host/file.txt"],
            ["example.com", "http://", "http:// space.com",
             "mailto:x@y.z"]),
}


@pytest.mark.parametrize("fmt", sorted(CASES_R2))
def test_format_examples_r2(spark, fmt):
    pattern = spark._jvm.java.util.regex.Pattern.compile(FORMAT_REGEX[fmt])
    good, bad = CASES_R2[fmt]
    for v in good:
        assert pattern.matcher(v).find(), f"{fmt}: {v!r} should match"
    for v in bad:
        assert not pattern.matcher(v).find(), f"{fmt}: {v!r} should NOT match"


def test_int32_int64_formats(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame(
        [("1", 5, 1.0), ("2", 2**31 - 1, 2.5), ("3", 2**31, 1e20),
         ("4", -2**31 - 1, -9.3e18)],
        "id string, n long, d double")
    rs = {"properties": {"n": {"format": "int32"}, "d": {"format": "int64"}}}
    compiled = compile_ruleset(rs, df.schema, name="numfmt")
    got = {(r.row_id, r.instance_path) for r in
           validate(df, compiled, row_id="id").violations.collect()}
    # n: 2^31 and -2^31-1 out of int32 range; d: 2.5 non-integral,
    # 1e20 and -9.3e18 out of int64 range (min is ~-9.22e18)
    assert got == {("3", "/n"), ("4", "/n"), ("2", "/d"), ("3", "/d"),
                   ("4", "/d")}


def test_regex_format_requires_opt_in(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame(
        [("1", "^a+$"), ("2", "[unclosed"), ("3", "(?P<x>ab)"), ("4", "*bad"),
         ("5", None)],
        "id string, pat string")
    rs = {"properties": {"pat": {"format": "regex"}}}
    # off by default: collected as unknown, no check compiled
    c0 = compile_ruleset(rs, df.schema, name="refmt")
    assert not c0.checks
    assert ("/pat", "format:regex:requires-udf_formats") in c0.unknown
    # opted in: pandas-UDF probe, invalid patterns flagged, NULL skipped
    c1 = compile_ruleset(rs, df.schema, name="refmt",
                         options={"udf_formats": True})
    assert len(c1.checks) == 1 and not c1.unknown
    got = {r.row_id for r in
           validate(df, c1, row_id="id").violations.collect()}
    assert got == {"2", "4"}


def test_regex_format_matches_jsonschema_checker(spark):
    """The documented dialect is Python re — exactly what the jsonschema
    package's FormatChecker probes for 'regex', so verdicts must agree."""
    import jsonschema
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    pats = ["^a+$", "[unclosed", "(?:x)*", "a{2,1}", "(?P<n>y)", "\\k<n>",
            "a**", "[a-z]+", "(", ")"]
    df = spark.createDataFrame([(str(i), p) for i, p in enumerate(pats)],
                               "id string, pat string")
    rs = {"properties": {"pat": {"format": "regex"}}}
    compiled = compile_ruleset(rs, df.schema, name="refmt2",
                               options={"udf_formats": True})
    res = validate(df, compiled, row_id="id")
    engine_ok = {r.id: r.passed
                 for r in res.annotated.select("id", "passed").collect()}
    checker = jsonschema.FormatChecker(["regex"])
    for i, p in enumerate(pats):
        assert engine_ok[str(i)] == checker.conforms(p, "regex"), p


def test_finite_always_ok_and_alias_formats(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame(
        [("1", 1.5), ("2", float("nan")), ("3", float("inf")), ("4", None)],
        "id string, d double")
    rs = {"properties": {"d": {"format": "double"}}}
    compiled = compile_ruleset(rs, df.schema, name="fin")
    got = {r.row_id for r in
           validate(df, compiled, row_id="id").violations.collect()}
    assert got == {"2", "3"}  # NaN and Inf fail; NULL skipped
    # binary/password: unconditionally valid, never unknown
    c2 = compile_ruleset({"properties": {"id": {"format": "password"}}},
                         df.schema, name="pw", options={"strict": True})
    assert not c2.checks and not c2.unknown
    # iso-* aliases share the original regexes
    assert FORMAT_REGEX["iso-time"] == FORMAT_REGEX["time"]
    assert FORMAT_REGEX["iso-date-time"] == FORMAT_REGEX["date-time"]
