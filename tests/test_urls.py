"""URL canonicalization (operators/urls.py): rule-by-rule pins plus the
dedup composition."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.urls import (
    canonical_url, url_dedup, url_groups)

CASES = [
    # (input, expected canonical)
    ("https://example.com/path", "https://example.com/path"),
    ("HTTPS://Example.COM/path", "https://example.com/path"),
    ("https://example.com:443/path", "https://example.com/path"),
    ("http://example.com:80/path", "http://example.com/path"),
    ("http://example.com:8080/path", "http://example.com:8080/path"),
    ("https://example.com/path#section-2", "https://example.com/path"),
    ("https://example.com/path/", "https://example.com/path"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/path?utm_source=feed&utm_medium=rss",
     "https://example.com/path"),
    ("https://example.com/path?b=2&a=1", "https://example.com/path?a=1&b=2"),
    ("https://example.com/path?b=2&utm_campaign=x&a=1&fbclid=abc",
     "https://example.com/path?a=1&b=2"),
    ("https://example.com/Path?gclid=1", "https://example.com/Path"),
    # path case is PRESERVED (paths are case-sensitive, RFC 3986)
    ("  https://example.com/x  ", "https://example.com/x"),
    ("not a url at all", "not a url at all"),   # pass-through, trimmed
    (None, None),
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "id long, url string")
    got = {r.id: r.c for r in
           df.select("id", canonical_url("url").alias("c")).collect()}
    for i, (inp, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {inp!r} -> {got[i]!r} != {want!r}"


def test_url_groups_and_dedup(spark):
    rows = [
        (1, "https://example.com/a"),
        (2, "HTTPS://EXAMPLE.COM:443/a#frag"),     # dup of 1
        (3, "https://example.com/a?utm_source=x"),  # dup of 1
        (4, "https://example.com/b"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    g = url_groups(df, "url", "id").collect()
    assert len(g) == 1
    assert g[0].canon_url == "https://example.com/a"
    assert g[0].n_urls == 3 and g[0].keep_id == 1
    kept = {r.id for r in url_dedup(df, "url", "id").collect()}
    assert kept == {1, 4, 5}
