"""draft-07 contentEncoding / contentMediaType (functions/content.py +
compiler binding). The engine ASSERTS these (documented deviation from
Ajv's annotate-only default); unverifiable declarations fall to unknown."""

import base64

from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
from remark_lint_frontmatter_schema_spark.functions.audio import synth_wav


def _violating_ids(spark, rows, ddl, ruleset, keyword):
    df = spark.createDataFrame(rows, ddl)
    compiled = compile_ruleset(ruleset, df.schema)
    res = validate(df, compiled, row_id="id")
    return {r.row_id for r in
            res.violations.where(f"keyword = '{keyword}'").collect()}


def test_content_encoding_base64(spark):
    rows = [("ok1", base64.b64encode(b"hello world").decode()),
            ("ok2", ""),                      # empty string is valid base64
            ("bad_char", "not!!base64@@"),
            ("bad_pad", "QUJDRA="),           # wrong padding length
            ("nullv", None)]
    bad = _violating_ids(
        spark, rows, "id string, payload string",
        {"properties": {"payload": {"contentEncoding": "base64"}}},
        "contentEncoding")
    assert bad == {"bad_char", "bad_pad"}


def test_media_type_on_binary_column(spark):
    wav = synth_wav(1, 16000, 200)
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    jpg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    rows = [("wav", wav), ("png", png), ("jpg", jpg), ("nullv", None)]
    bad = _violating_ids(
        spark, rows, "id string, payload binary",
        {"properties": {"payload": {"contentMediaType": "audio/wav"}}},
        "contentMediaType")
    assert bad == {"png", "jpg"}


def test_media_type_on_base64_string(spark):
    wav64 = base64.b64encode(synth_wav(2, 8000, 150)).decode()
    png64 = base64.b64encode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20).decode()
    rows = [("wav", wav64), ("png", png64), ("junk", "@@@not-base64")]
    ruleset = {"properties": {"payload": {
        "contentEncoding": "base64", "contentMediaType": "audio/wav"}}}
    bad = _violating_ids(spark, rows, "id string, payload string",
                         ruleset, "contentMediaType")
    # png payload and the undecodable one both fail the media assertion
    assert bad == {"png", "junk"}


def test_media_type_mpeg_sync_and_id3(spark):
    rows = [("id3", b"ID3\x04\x00" + b"\x00" * 8),
            ("sync", b"\xff\xfb\x90\x00" + b"\x00" * 8),
            ("wav", synth_wav(3, 16000, 100))]
    bad = _violating_ids(
        spark, rows, "id string, payload binary",
        {"properties": {"payload": {"contentMediaType": "audio/mpeg"}}},
        "contentMediaType")
    assert bad == {"wav"}


def test_application_json_plain_and_base64(spark):
    rows = [("obj", '{"a": 1}'), ("arr", "[1, 2]"),
            ("scalar", "42"), ("bad", "{nope"), ("nullv", None)]
    bad = _violating_ids(
        spark, rows, "id string, payload string",
        {"properties": {"payload": {
            "contentMediaType": "application/json"}}},
        "contentMediaType")
    assert bad == {"bad"}

    rows64 = [("good", base64.b64encode(b'{"k": [true]}').decode()),
              ("badjson", base64.b64encode(b"{broken").decode()),
              ("badb64", "!!!!")]
    bad64 = _violating_ids(
        spark, rows64, "id string, payload string",
        {"properties": {"payload": {
            "contentEncoding": "base64",
            "contentMediaType": "application/json"}}},
        "contentMediaType")
    assert bad64 == {"badjson", "badb64"}


def test_unverifiable_declarations_fall_to_unknown(spark):
    df = spark.createDataFrame([("a", "x", b"y", 1)],
                               "id string, s string, b binary, n int")
    compiled = compile_ruleset({"properties": {
        "s": {"contentMediaType": "text/csv"},          # no signature
        "b": {"contentEncoding": "base64"},              # wrong dtype
        "n": {"contentEncoding": "quoted-printable"},    # unsupported
    }}, df.schema)
    unknown = set(compiled.unknown)
    assert ("/s", "contentMediaType:text/csv") in unknown
    assert ("/b", "contentEncoding:base64") in unknown
    assert ("/n", "contentEncoding:quoted-printable") in unknown
    assert not compiled.checks


def test_message_shape(spark):
    df = spark.createDataFrame([("a", "@@")], "id string, p string")
    compiled = compile_ruleset(
        {"properties": {"p": {"contentEncoding": "base64"}}}, df.schema)
    res = validate(df, compiled, row_id="id")
    msg = res.violations.collect()[0].message
    assert msg == ("Must be base64 encoded • "
                   "#/properties/p/contentEncoding")


def test_trailing_newline_is_not_valid_base64(spark):
    # java regex lets $ match before a final \n — the anchors must be \z
    bad = _violating_ids(
        spark, [("nl", "QUJDRA==\n"), ("ok", "QUJDRA==")],
        "id string, payload string",
        {"properties": {"payload": {"contentEncoding": "base64"}}},
        "contentEncoding")
    assert bad == {"nl"}


# ---------------------------------------------------------------------------
# 2019-09 contentSchema: embedded-JSON validation through the variant path
# ---------------------------------------------------------------------------

def test_content_schema_validates_embedded_json(spark):
    rows = [
        ("ok", '{"k": 5, "name": "ab"}'),
        ("k_string", '{"k": "5", "name": "ab"}'),   # exact JSON typing
        ("k_missing", '{"name": "ab"}'),
        ("name_long", '{"k": 5, "name": "toolonggg"}'),
        ("not_json", "][nope"),                      # mediaType's job
        ("nullv", None),
    ]
    rs = {"properties": {"payload": {
        "contentMediaType": "application/json",
        "contentSchema": {
            "type": "object",
            "required": ["k", "name"],
            "properties": {"k": {"type": "integer", "minimum": 0},
                           "name": {"type": "string", "maxLength": 8}},
        },
    }}}
    df = spark.createDataFrame(rows, "id string, payload string")
    compiled = compile_ruleset(rs, df.schema)
    assert not compiled.unknown
    got = {}
    for r in validate(df, compiled, row_id="id").violations.collect():
        got.setdefault(r.row_id, set()).add(r.keyword)
    assert "ok" not in got and "nullv" not in got
    assert got["k_string"] == {"type"}
    assert got["k_missing"] == {"required"}
    assert got["name_long"] == {"maxLength"}
    # unparsable content: contentMediaType flags wellformedness; the
    # contentSchema checks stay vacuous (layered like Ajv annotations)
    assert got["not_json"] == {"contentMediaType"}


def test_content_schema_base64_and_unknown_fallthrough(spark):
    import base64 as b64
    rows = [("ok", b64.b64encode(b'{"k": 1}').decode()),
            ("bad", b64.b64encode(b'{"k": -1}').decode())]
    rs = {"properties": {"payload": {
        "contentEncoding": "base64",
        "contentMediaType": "application/json",
        "contentSchema": {"properties": {"k": {"minimum": 0}}},
    }}}
    df = spark.createDataFrame(rows, "id string, payload string")
    got = {r.row_id for r in
           validate(df, compile_ruleset(rs, df.schema), row_id="id")
           .violations.collect()}
    assert got == {"bad"}
    # no (or non-JSON) media type: honest unknown, never vacuous-pass
    c = compile_ruleset(
        {"properties": {"payload": {"contentSchema": {"type": "object"}}}},
        df.schema)
    assert ("/payload", "contentSchema") in c.unknown
