"""Winnowing fingerprints (operators/dedup.py winnow_fingerprints /
winnow_dup_pairs): exact parity with a naive Python twin, the paper's
coverage guarantee (any shared >= w+k-1-char run yields a shared
fingerprint), density, short-doc edge, and the df-cap."""

import hashlib
import random
import re

import pytest

from remark_lint_frontmatter_schema_spark.operators import dedup


def _norm(s):
    return re.sub(r"\s+", " ", s.lower()).strip()


def _py_winnow(text, k, w):
    """Naive reference: min (md5-16, rightmost) per window of w grams."""
    t = _norm(text)
    if len(t) < k:
        return set()
    hs = [hashlib.md5(t[i:i + k].encode()).hexdigest()[:16]
          for i in range(len(t) - k + 1)]
    sel = set()
    for s in range(len(hs) - w + 1):
        win = hs[s:s + w]
        m = min(win)
        # rightmost minimal position
        pos = s + max(i for i, h in enumerate(win) if h == m)
        sel.add((pos + 1, m))
    return sel


def test_winnow_matches_python_twin_exactly(spark):
    texts = [
        (1, "The quick brown Fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs please and thanks"),
        (3, "sphinx of black quartz judge my vow " * 3),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    got = {}
    for r in dedup.winnow_fingerprints(df, "text", "doc_id",
                                       k=5, w=4).collect():
        got.setdefault(r.id, set()).add((r.pos, r.fp))
    for doc_id, text in texts:
        assert got.get(doc_id, set()) == _py_winnow(text, 5, 4), doc_id


def test_winnow_coverage_guarantee(spark):
    """Plant a shared (w+k-1)-char run into otherwise-random doc pairs:
    every pair must share at least one selected fingerprint."""
    rng = random.Random(7)
    k, w = 8, 8
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def rand_text(n):
        return "".join(rng.choice(alpha + " ")
                       for _ in range(n)).replace("  ", " x")

    rows, pairs = [], []
    for i in range(12):
        shared = "".join(rng.choice(alpha) for _ in range(k + w - 1))
        a, b = 2 * i, 2 * i + 1
        rows.append((a, rand_text(80) + " " + shared + " " + rand_text(80)))
        rows.append((b, rand_text(120) + " " + shared + " " + rand_text(40)))
        pairs.append((a, b))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {}
    for r in dedup.winnow_fingerprints(df, "text", "doc_id",
                                       k=k, w=w).collect():
        fps.setdefault(r.id, set()).add(r.fp)
    for a, b in pairs:
        assert fps[a] & fps[b], (a, b)
    # density: winnowing keeps ~2/(w+1) of positions, never most of them
    n_pos = sum(len(_norm(t)) - k + 1 for _, t in rows)
    n_sel = sum(len(v) for v in fps.values())
    assert n_sel < 0.5 * n_pos


def test_winnow_short_doc_boundary(spark):
    k, w = 5, 4
    just_short = "a" * (k + w - 2)          # w-1 grams: no full window
    just_long = "abcdefgh"                   # k+w-1 chars: exactly 1 window
    assert len(just_long) == k + w - 1
    df = spark.createDataFrame(
        [(1, just_short), (2, just_long), (3, None)],
        "doc_id int, text string")
    got = dedup.winnow_fingerprints(df, "text", "doc_id", k=k, w=w)
    by_id = {}
    for r in got.collect():
        by_id.setdefault(r.id, []).append(r)
    assert 1 not in by_id and 3 not in by_id
    assert len(by_id[2]) == 1
    with pytest.raises(ValueError, match="winnow"):
        dedup.winnow_fingerprints(df, "text", "doc_id", k=1, w=4)


def test_winnow_dup_pairs_df_cap_and_threshold(spark):
    """A boilerplate run shared by MANY docs is df-capped out of the
    join; a pair sharing a long unique run survives min_shared."""
    k, w = 8, 8
    boiler = "this footer appears on every single page of the site"
    uniq = "zqxjkvbnmwordshared across exactly two documents only"
    rows = [(i, f"doc number {i} body text {boiler}") for i in range(10)]
    rows += [(100, "first twin " + uniq + " tail a"),
             (101, "second twin " + uniq + " tail b")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    capped = {(r.id_a, r.id_b): r.n_shared
              for r in dedup.winnow_dup_pairs(
                  df, "text", "doc_id", k=k, w=w,
                  min_shared=1, max_df=3).collect()}
    uncapped = {(r.id_a, r.id_b): r.n_shared
                for r in dedup.winnow_dup_pairs(
                    df, "text", "doc_id", k=k, w=w,
                    min_shared=1, max_df=None).collect()}
    # the genuinely-shared pair survives the cap with its full overlap
    assert (100, 101) in capped and (100, 101) in uncapped
    # uncapped, the boilerplate docs pairwise-explode (45 pairs); the
    # df cap prunes the hub fingerprints so most of that grid vanishes
    # (only boundary-selection subsets with df <= 3 remain)
    boiler = lambda d: sum(1 for a, b in d if a < 100 and b < 100)  # noqa: E731
    assert boiler(uncapped) == 45
    assert boiler(capped) < 45 / 2
    # shared counts only ever shrink under the cap
    assert all(capped[p] <= uncapped[p] for p in capped)


def test_winnow_xxhash_fast_mode_keeps_guarantee(spark):
    """The xxhash64 production mode selects a DIFFERENT (but equally
    valid) fingerprint set — the coverage guarantee and density hold
    under any fixed hash order."""
    k, w = 8, 8
    shared = "zxqvjwkpbd mfglt hcrns"        # >= w+k-1 chars
    df = spark.createDataFrame(
        [(1, "left filler text " + shared + " more filler here"),
         (2, "other document body " + shared + " trailing words")],
        "doc_id int, text string")
    fps = {}
    for r in dedup.winnow_fingerprints(df, "text", "doc_id", k=k, w=w,
                                       hash="xxhash64").collect():
        fps.setdefault(r.id, set()).add(r.fp)
        assert len(r.fp) == 16                       # padded hex
    assert fps[1] & fps[2]
    pairs = dedup.winnow_dup_pairs(df, "text", "doc_id", k=k, w=w,
                                   min_shared=1, hash="xxhash64").collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    with pytest.raises(ValueError, match="hash"):
        dedup.winnow_fingerprints(df, "text", "doc_id", hash="crc32")
