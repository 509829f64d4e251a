"""Positive-case tests for near-dup and similarity operators (the driver
testdata contains no near-duplicates, so these craft their own)."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import dedup, similarity

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the riverbank"),
    (2, "the quick brown fox jumps over the lazy dog near the riverbanks"),  # near-dup of 1
    (3, "completely different content about spark query planning and shuffles"),
    (4, "completely different content about spark query planning and shuffle"),  # near-dup of 3
    (5, "unrelated short text"),
    (6, "the quick brown fox jumps over the lazy dog near the riverbank"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def test_exact_dedup(docs):
    groups = dedup.exact_groups(docs, "text", "doc_id").collect()
    dup = [g for g in groups if g.n_docs > 1]
    assert len(dup) == 1 and dup[0].keep_id == 1
    survivors = {r.doc_id for r in
                 dedup.exact_dedup(docs, "text", "doc_id").collect()}
    assert survivors == {1, 2, 3, 4, 5}


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in
             dedup.minhash_dedup_pairs(docs, "text", "doc_id",
                                       threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    assert (1, 6) in pairs  # exact dup has jaccard 1.0
    assert not any({a, b} == {1, 3} for a, b in pairs)


def test_minhash_signature_varies_across_positions(spark):
    # regression: all 64 positions were identical when the seed lambda
    # accidentally captured the array-index lambda variable
    df = spark.createDataFrame([("some reasonably long text value",)], "t string")
    sig = df.select(dedup.minhash_signature("t").alias("s")).first().s
    assert len(set(sig)) > 32


def test_simhash_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in
             dedup.simhash_pairs(docs, "text", "doc_id",
                                 max_distance=3).collect()}
    assert (1, 6) in pairs  # identical text -> distance 0
    # relative ordering: near-dup pair is closer than unrelated pair
    # (absolute simhash distances are noisy on ~12-token docs)
    sh = {r.doc_id: r.sh for r in docs.select(
        "doc_id", dedup.simhash("text").alias("sh")).collect()}

    def ham(a, b):
        return bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")

    assert ham(1, 6) == 0
    assert ham(1, 2) < ham(1, 3)
    assert ham(3, 4) < ham(3, 5)


def test_ngram_jaccard(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                       threshold=0.6,
                                       allow_full_cross=True).collect()}
    assert pairs[(1, 6)] == 1.0
    assert pairs[(1, 2)] > 0.9


def test_edit_distance_pairs_separates_reorder_from_insert(spark):
    """Shingle Jaccard is order-blind; edit similarity is not — and a
    pure insertion keeps edit_sim high while Jaccard drops."""
    rows = [
        (1, "the dog bit the man on main street today"),
        (2, "the man bit the dog on main street today"),   # reorder of 1
        (3, "the dog bit the man on main street today "
            "and then some wholly unrelated padding text appears here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a int, id_b int")
    out = {(r.id_a, r.id_b): r for r in
           dedup.edit_distance_pairs(cand, df, "text", "doc_id").collect()}
    # identical shingle set, but real edit distance
    r12 = out[(1, 2)]
    assert r12.dist > 0 and 0 < r12.edit_sim < 1
    # insertion: prefix matches entirely -> dist == the added suffix
    r13 = out[(1, 3)]
    assert r13.dist == len(rows[2][1]) - len(rows[0][1])
    # NULL-text member drops out
    assert (1, 4) not in out
    # cross-check one distance against a reference implementation
    import difflib
    sm = difflib.SequenceMatcher(None, rows[0][1], rows[1][1])
    # difflib isn't edit distance, so just sanity-bound: dist <= len
    assert r12.dist <= max(len(rows[0][1]), len(rows[1][1]))
    assert sm.ratio() > 0.5


def test_ivf_matches_bruteforce_on_easy_query(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    q = vecs[5][1]
    brute = [r.vec_id for r in
             similarity.cosine_topk(df, "embedding", "vec_id", q, k=5).collect()]
    assert brute[0] == 5  # the vector itself
    approx = [r.vec_id for r in
              similarity.cosine_topk_ivf(df, "embedding", "vec_id", q, k=5,
                                         n_cells=4, n_probe=4).collect()]
    # probing all cells == exact
    assert approx == brute
    _ = F


# ---------------------------------------------------------------------------
# curation composition (dedup + quality + language gates)
# ---------------------------------------------------------------------------

def test_curation_decisions_gates_and_dedup(spark):
    from remark_lint_frontmatter_schema_spark.operators import curate
    good = ("the cat and the dog sat on a mat with a hat, that is it "
            "for the story of it all")
    rows = [
        (1, good),
        (2, "THE cat and the dog sat on a mat with a hat, that is it "
            "for the story of it all"),   # formatting dup of 1 (fingerprint)
        (3, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),  # low quality
        (4, "der und die nicht das der und die nicht das der und die "
            "nicht das der und die nicht"),  # German-looking
        (5, good + " completely different tail of the tale here though"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    dec = {r.doc_id: r for r in curate.curation_decisions(
        df, "text", "doc_id", min_quality=0.55, lang="en").collect()}
    assert dec[1].reason == "kept" and dec[1].kept
    assert dec[2].reason == "duplicate" and not dec[2].kept
    assert dec[3].reason == "low_quality"
    assert dec[4].reason == "wrong_lang"
    assert dec[5].kept

    survivors = {r.doc_id for r in curate.curate(
        df, "text", "doc_id", min_quality=0.55, lang="en").collect()}
    assert survivors == {1, 5}

    # one shuffle only: plan has exactly one Exchange (the window on
    # fingerprint); the semi-join reuses broadcast
    plan = curate.curation_decisions(
        df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_curation_null_text_fails_quality_gate(spark):
    from remark_lint_frontmatter_schema_spark.operators import curate
    df = spark.createDataFrame(
        [(1, None), (2, "the cat and the dog sat on a mat with a hat, "
                        "that is it for the story")],
        ["doc_id", "text"])
    dec = {r.doc_id: r for r in curate.curation_decisions(
        df, "text", "doc_id", min_quality=0.5, lang=None).collect()}
    assert dec[1].reason == "low_quality" and not dec[1].kept
    assert dec[1].quality_score is not None
    assert dec[2].kept


def test_release_unpersists_reuse_caches(spark):
    from remark_lint_frontmatter_schema_spark.operators import dedup
    df = spark.createDataFrame(
        [(i, f"document number {i} with some shared text body") for i in range(20)],
        ["doc_id", "text"])
    pairs = dedup.minhash_dedup_pairs(df, "text", "doc_id", threshold=0.5)
    pairs.count()
    cached = pairs._rlfs_persisted
    assert len(cached) == 2  # signatures + shingles
    assert all(c.is_cached for c in cached)
    dedup.release(pairs)
    assert all(not c.is_cached for c in cached)
    # no-op on untracked frames
    dedup.release(df)


def test_embedding_lsh_pairs_recall_vs_exact(spark):
    """LSH-bucketed near-dup must find the exact blocked pairs for
    near-parallel vectors (high-threshold regime where LSH recall is
    near 1) and never emit a pair below threshold."""
    import math
    import random
    from remark_lint_frontmatter_schema_spark.operators import similarity
    rnd = random.Random(7)
    base = [[rnd.gauss(0, 1) for _ in range(16)] for _ in range(12)]
    rows = []
    vid = 0
    for b in base:
        for k in range(2):  # two near-identical copies of each base vector
            v = [x + rnd.gauss(0, 0.001) for x in b]
            rows.append((vid, v, 0))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    exact = {(r.id_a, r.id_b) for r in similarity.embedding_near_dup_pairs(
        df, "embedding", "vec_id", block_col="label",
        threshold=0.999).collect()}
    got_df = similarity.embedding_lsh_pairs(
        df, "embedding", "vec_id", n_bits=10, threshold=0.999)
    got = {(r.id_a, r.id_b): r.score for r in got_df.collect()}
    # the 12 twin pairs are the expected positives
    twins = {(2 * i, 2 * i + 1) for i in range(12)}
    assert twins <= exact
    assert set(got) <= exact          # no false positives vs exact verify
    assert len(twins & set(got)) >= 10  # near-1 recall for near-parallel
    assert all(s >= 0.999 for s in got.values())
    from remark_lint_frontmatter_schema_spark.operators import dedup
    dedup.release(got_df)


def test_ngram_jaccard_refuses_global_block(docs):
    with pytest.raises(ValueError, match="cross-join"):
        dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.6)


def test_release_all_frees_registry(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} with some shared text body") for i in range(20)],
        ["doc_id", "text"])
    pairs = dedup.minhash_dedup_pairs(df, "text", "doc_id", threshold=0.5)
    pairs.count()
    # downstream transform loses the _rlfs_persisted handle; the registry
    # must still free the blocks
    derived = pairs.select("id_a")
    assert not hasattr(derived, "_rlfs_persisted")
    cached = list(dedup._PERSISTED)
    assert cached and all(c.is_cached for c in cached)
    dedup.release_all()
    assert not dedup._PERSISTED
    assert all(not c.is_cached for c in cached)


def test_embedding_lsh_pairs_empty_input(spark):
    df = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = similarity.embedding_lsh_pairs(df, "embedding", "vec_id",
                                         n_bits=8, threshold=0.9)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "score"]


def test_minhash_recall_vs_exact_jaccard(spark):
    """Quantitative recall pin (the hyperplane-LSH test's analog for text
    MinHash): on a corpus with known near-dup pairs above the LSH s-curve
    knee (r=8, b=8 -> knee ~0.77), banded MinHash + exact verify must
    recover nearly all exact-Jaccard pairs. Fully deterministic: seeded
    corpus, seeded minhash coefficients, exact verify."""
    import random as _r
    import string
    rnd = _r.Random(11)

    def word():
        return "".join(rnd.choices(string.ascii_lowercase, k=6))

    rows, did = [], 0
    n_pairs = 24
    for b in range(n_pairs):
        words = [word() for _ in range(40)]
        rows.append((did, " ".join(words))); did += 1
        w2 = list(words)
        # 1-word edit -> shingle Jaccard ~0.92 (well above the knee)
        w2[rnd.randrange(len(w2))] = word()
        rows.append((did, " ".join(w2))); did += 1
    df = spark.createDataFrame(rows, "doc_id int, text string")

    exact = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", n=5, threshold=0.8,
        allow_full_cross=True).collect()}
    twins = {(2 * b, 2 * b + 1) for b in range(n_pairs)}
    assert twins <= exact          # corpus built what it claims

    got = {(r.id_a, r.id_b): r.jaccard for r in dedup.minhash_dedup_pairs(
        df, "text", "doc_id", threshold=0.8, n_hashes=64, bands=8,
        shingle_n=5).collect()}
    # exact verify inside the operator -> no false positives possible
    assert set(got) <= exact
    recall = len(set(got) & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall} below bound; missed: {exact - set(got)}"
    dedup.release_all()


def test_short_and_null_texts_have_empty_shingle_sets(spark):
    """Regression: sequence(1,0) is [1,0] (descending) and substr treats
    position 0 as 1, so short/empty/NULL texts used to get one bogus
    shingle — two NULL-text docs compared as Jaccard-1 near-dups."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab"), (4, "ab"), (5, "abcdef")],
        "doc_id int, text string")
    sizes = {r.doc_id: r.n for r in df.select(
        "doc_id", F.size(dedup.char_shingles("text", 3)).alias("n")).collect()}
    assert sizes == {1: 0, 2: 0, 3: 0, 4: 0, 5: 4}
    # no pairs among empty/NULL/short docs (empty sets never match)
    pairs = dedup.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.1,
                                      allow_full_cross=True).collect()
    assert pairs == []
    # minhash path: empty-shingle docs simply produce no signature
    sigs = dedup.minhash_signatures_df(df, "text", "doc_id")
    assert {r.id for r in sigs.collect()} == {5}


def test_kmeans_centroids_improve_ivf_pruning(spark):
    """Lloyd-refined centroids on clustered data: every cluster gets its
    own cell, so a 1-probe IVF query returns exactly the brute-force
    top-k; deterministic (hash-seeded, no RNG)."""
    import numpy as np
    rng = np.random.default_rng(3)
    centers = rng.normal(0, 5, (4, 8))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(50):
            rows.append((vid, [float(x) for x in c + rng.normal(0, 0.05, 8)]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = similarity.kmeans_centroids(df, "embedding", "vec_id", 4,
                                        dim=8, n_iter=3)
    assert len(cents) == 4
    # refined centroids separate the 4 true clusters: assignment is pure
    cells = similarity.assign_cells(df, "embedding", cents) \
        .select("vec_id", "_cell").collect()
    by_cluster = {}
    for r in cells:
        by_cluster.setdefault(r.vec_id // 50, set()).add(r._cell)
    assert all(len(s) == 1 for s in by_cluster.values())
    assert len(set().union(*by_cluster.values())) == 4
    # 1-probe IVF == brute force for an in-cluster query
    q = [float(x) for x in centers[0]]
    brute = [r.vec_id for r in similarity.cosine_topk(
        df, "embedding", "vec_id", q, k=10).collect()]
    ivf = [r.vec_id for r in similarity.cosine_topk_ivf(
        df, "embedding", "vec_id", q, k=10, centroids=cents,
        n_probe=1).collect()]
    assert ivf == brute


def test_repetition_scores(spark):
    from remark_lint_frontmatter_schema_spark.operators import text
    df = spark.createDataFrame([
        (1, "a b c d e"),                        # no repetition
        (2, "buy buy buy buy now"),              # top word dominates
        (3, "x y\nx y\nz"),                      # duplicate lines
        (4, ""), (5, None),
    ], "doc_id int, text string")
    got = {r.doc_id: (r.dup_line_frac, r.dup_word_frac, r.top_word_frac)
           for r in text.repetition_scores(df, "text", "doc_id").collect()}
    assert got[1] == (0.0, 0.0, 0.2)
    assert got[2][1] == 0.6 and got[2][2] == 0.8
    assert round(got[3][0], 6) == round(1 - 2 / 3, 6)
    assert got[4] == (0.0, 0.0, 0.0) and got[5] == (0.0, 0.0, 0.0)


def test_embedding_lsh_pairs_null_first_vector(spark):
    """dim sniffing must skip NULL vectors — a NULL in the physically
    first row must not collapse the result to empty."""
    rows = [(0, None)] + [(i, [1.0, 2.0, 3.0, 4.0]) for i in (1, 2)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>") \
              .coalesce(1)
    got = similarity.embedding_lsh_pairs(df, "embedding", "vec_id",
                                         n_bits=6, threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}
    dedup.release_all()


def test_pii_scan_detects_and_counts(spark):
    from remark_lint_frontmatter_schema_spark.operators import text
    df = spark.createDataFrame([
        (1, "contact me at jane.doe+x@example.org or bob@test.io"),
        (2, "server at 192.168.0.1 and 10.0.0.255 ."),
        (3, "call +1 555-123-4567 today"),
        (4, "clean text with no identifiers"),
        (5, None),
    ], "doc_id int, text string")
    got = {r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.has_pii)
           for r in text.pii_scan(df, "text", "doc_id").collect()}
    assert got[1][0] == 2 and got[1][3] is True
    assert got[2][1] == 2 and got[2][3] is True
    assert got[3][2] >= 1 and got[3][3] is True
    assert got[4] == (0, 0, 0, False)
    assert got[5] == (0, 0, 0, False)


def test_redact_pii_rewrites_and_counts(spark):
    from remark_lint_frontmatter_schema_spark.operators import text
    df = spark.createDataFrame([
        (1, "contact jane.doe+x@example.org or call 555-123-4567"),
        (2, "server at 10.0.0.1 rules"),
        (3, "clean text with no identifiers"),
        (4, None),
    ], "doc_id int, text string")
    got = {r.doc_id: r for r in
           text.redact_pii(df, "text", "doc_id").collect()}
    assert got[1].text_redacted == "contact [EMAIL] or call [PHONE]"
    assert (got[1].n_email, got[1].n_phone, got[1].n_redactions) == (1, 1, 2)
    assert got[2].text_redacted == "server at [IPV4] rules"
    assert got[3].text_redacted == got[3].text_redacted == \
        "clean text with no identifiers" and got[3].n_redactions == 0
    assert got[4].text_redacted is None and got[4].n_redactions == 0
    # counts agree with pii_scan on the same input (scan/redact contract)
    scan = {r.doc_id: (r.n_email, r.n_ipv4, r.n_phone)
            for r in text.pii_scan(df, "text", "doc_id").collect()}
    for i, r in got.items():
        assert scan[i] == (r.n_email, r.n_ipv4, r.n_phone)


def test_staged_signature_matches_explode_signature(spark):
    """minhash_signature_staged (pure-map, streaming path) must produce
    byte-identical signatures to minhash_signatures_df (explode +
    partial-agg, batch path) — same coefficients, same shingles, just a
    different physical plan."""
    from remark_lint_frontmatter_schema_spark.operators import dedup
    df = spark.createDataFrame(
        [(i, f"document number {i} with some shared prefix text " * 3)
         for i in range(20)] + [(99, "tiny")],
        "doc_id long, text string")
    a = {r["id"]: tuple(r[f"h{k}"] for k in range(16)) for r in
         dedup.minhash_signatures_df(df, "text", "doc_id",
                                     n_hashes=16).collect()}
    b = {r["id"]: tuple(r[f"h{k}"] for k in range(16)) for r in
         dedup.minhash_signature_staged(df, "text", "doc_id",
                                        n_hashes=16).collect()}
    # the explode form drops zero-shingle docs (nothing to explode); the
    # staged form keeps them with empty-array mins (NULL) — compare on the
    # intersection and pin the difference explicitly
    assert set(a) == set(b) - {99}
    for k in a:
        assert a[k] == b[k], k
    assert all(v is None for v in b[99])


def test_staged_signature_is_map_only(spark):
    from remark_lint_frontmatter_schema_spark.operators import dedup
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    plan = dedup.minhash_signature_staged(df, "text", "doc_id")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_hamming_pairs_wide_radius_recall(spark):
    """A distance-6 pair whose differing bits touch ALL four 16-bit chunks
    is invisible to 4-chunk blocking — the 8x8-bit escalation must find it
    (this was a silent recall hole: simhash_pairs_documents ran d=6 over
    4 chunks before hamming_pairs scaled chunks with the radius)."""
    from remark_lint_frontmatter_schema_spark.operators import dedup
    a = 0
    b = (1 << 0) | (1 << 1) | (1 << 16) | (1 << 17) | (1 << 32) | (1 << 48)
    sigs = spark.createDataFrame([("x", a), ("y", b)], "id string, sh long")
    got = dedup.hamming_pairs(sigs, max_distance=6, reuse=False).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [("x", "y", 6)]
    # the same pair at d<=3 blocking: correctly absent (outside radius)
    none = dedup.hamming_pairs(sigs, max_distance=3, reuse=False).collect()
    assert none == []
    import pytest
    with pytest.raises(ValueError, match="max_distance <= 7"):
        dedup.hamming_pairs(sigs, max_distance=8)


def test_pq_adc_matches_bruteforce_on_clustered_data(spark):
    """PQ recall pin: on normalized clustered vectors, ADC top-10 must
    recover most of the exact cosine top-10 (quantization is lossy by
    design; the pin is recall, not equality). Also pins code shape and
    NULL handling."""
    import numpy as np

    from remark_lint_frontmatter_schema_spark.operators.similarity import (
        cosine_topk, pq_encode, pq_topk, pq_train)

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (8, 16))
    vecs = []
    for i in range(400):
        v = centers[i % 8] + rng.normal(0, 0.15, 16)
        v = v / np.linalg.norm(v)
        vecs.append((i, [float(x) for x in v]))
    vecs.append((999, None))
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")

    books = pq_train(df.where("embedding is not null"), "embedding",
                     "vec_id", dim=16, m=4, n_codes=16)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    assert all(len(c) == 4 for b in books for c in b)

    codes = pq_encode(df, "embedding", "vec_id", books)
    rows = {r.vec_id: r.codes for r in codes.collect()}
    assert rows[999] is None
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c)
               for i, c in rows.items() if i != 999)

    q = vecs[7][1]
    approx = {r.vec_id for r in pq_topk(
        codes, books, q, k=10, id_col="vec_id", exclude_id=7).collect()}
    # coarse correctness: every ADC hit is a true member of the query's
    # cluster (PQ cannot rank WITHIN a tight cluster — quantization
    # collapses near-identical vectors to the same code by design, so
    # top-10-of-50-clones is a lottery; cluster membership is the
    # contract ADC does make)
    cluster = {i for i in range(400) if i % 8 == 7 % 8}
    assert approx <= cluster, f"ADC left the query's cluster: {approx}"
    # and the hits sit inside the exact top-50 (the cluster's extent)
    exact50 = {r.vec_id for r in cosine_topk(
        df, "embedding", "vec_id", q, k=50, exclude_id=7).collect()}
    overlap = len(approx & exact50) / 10
    assert overlap >= 0.8, f"PQ top-10 vs exact top-50 overlap {overlap}"


def test_ivfadc_composes_cell_pruning_with_adc(spark):
    """IVFADC: probing every cell must equal plain ADC over all codes
    (the composition adds pruning, not a third approximation); a 1-probe
    query stays inside the query's own cluster."""
    import numpy as np

    from remark_lint_frontmatter_schema_spark.operators.similarity import (
        farthest_point_centroids, pq_encode_ivf, pq_topk, pq_topk_ivf,
        pq_train)

    rng = np.random.default_rng(23)
    centers = rng.normal(0, 1, (4, 16))
    vecs = []
    for i in range(200):
        v = centers[i % 4] + rng.normal(0, 0.1, 16)
        vecs.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")

    books = pq_train(df, "embedding", "vec_id", dim=16, m=4, n_codes=16)
    cents = farthest_point_centroids(df, "embedding", "vec_id", 4)
    enc = pq_encode_ivf(df, "embedding", "vec_id", books, cents)
    assert set(enc.columns) == {"vec_id", "_cell", "codes"}

    q = vecs[10][1]
    all_probe = [r.vec_id for r in pq_topk_ivf(
        enc, books, cents, q, k=10, n_probe=4, id_col="vec_id").collect()]
    plain = [r.vec_id for r in pq_topk(
        enc, books, q, k=10, id_col="vec_id").collect()]
    assert all_probe == plain

    one_probe = {r.vec_id for r in pq_topk_ivf(
        enc, books, cents, q, k=10, n_probe=1, id_col="vec_id").collect()}
    cluster = {i for i in range(200) if i % 4 == 10 % 4}
    assert one_probe <= cluster


def test_prefix_filter_equals_exhaustive(docs):
    """Prefix filtering (AllPairs) must return EXACTLY the exhaustive
    all-pairs result — the exactness contract that lets the driver
    oracle stay a plain blocked-free SQL self-join."""
    exhaustive = {(r.id_a, r.id_b): r.jaccard for r in
                  dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                            threshold=0.6,
                                            allow_full_cross=True).collect()}
    pf = {(r.id_a, r.id_b): r.jaccard for r in
          dedup.prefix_filter_jaccard_pairs(docs, "text", "doc_id",
                                            threshold=0.6,
                                            shingle="char").collect()}
    assert pf == exhaustive and len(pf) > 0


def test_prefix_filter_boundary_threshold(spark):
    """Boundary recall: |A|=20 shingles, B subset of A with 11 shingles,
    jaccard exactly 11/20 = 0.55 — the float-rounding trap where
    threshold*size computes a hair above the true product. The 1e-9
    guard must keep the pair."""
    # distinct characters -> each 1-gram is one shingle; use n=1 shingles
    # via texts built so trigram sets have the exact sizes instead:
    # simpler — run both paths at the awkward threshold and compare.
    rows = [(i, t) for i, t in enumerate([
        "abcdefghijklmnopqrstuv",       # base
        "abcdefghijklm",                # prefix subset
        "abcdefghijklmnopqrstuv",       # exact dup of 0
        "zzzz yyyy xxxx wwww",          # unrelated
        "abcdefghijklmnopqrstuvw",      # one char appended
    ])]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for t in (0.55, 0.5, 0.6, 11.0 / 20.0):
        exhaustive = {(r.id_a, r.id_b): r.jaccard for r in
                      dedup.ngram_jaccard_pairs(
                          df, "text", "doc_id", threshold=t,
                          allow_full_cross=True).collect()}
        pf = {(r.id_a, r.id_b): r.jaccard for r in
              dedup.prefix_filter_jaccard_pairs(
                  df, "text", "doc_id", threshold=t,
                  shingle="char").collect()}
        assert pf == exhaustive, f"threshold {t}: {pf} != {exhaustive}"


def test_prefix_filter_skips_short_and_null(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, None), (3, "ab"), (4, "hello world hello"),
         (5, "hello world hello")],
        "doc_id int, text string")
    pairs = {(r.id_a, r.id_b) for r in
             dedup.prefix_filter_jaccard_pairs(
                 df, "text", "doc_id", threshold=0.5,
                 shingle="char").collect()}
    assert pairs == {(4, 5)}


def test_prefix_filter_word_mode_equals_brute_force(spark):
    """Word-shingle mode (the corpus default) vs a brute-force word
    trigram Jaccard computed directly — exact equality."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
        (3, "one two three four five six seven eight nine"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (5, "totally different words everywhere here now"),
        (6, "one two"),                                        # < 3 tokens
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    from pyspark.sql import functions as F
    from remark_lint_frontmatter_schema_spark.operators.text import tokens as _tok
    sh = df.where("text is not null").select(
        "doc_id", dedup.word_shingles(_tok(F.col("text")), 3).alias("s")
    ).where(F.size("s") > 0)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    brute = {(r.id_a, r.id_b): r.j for r in
             a.crossJoin(b).where("id_a < id_b")
              .withColumn("j", F.round(dedup.jaccard(F.col("sa"),
                                                     F.col("sb")), 6))
              .where("j >= 0.5").collect()}
    pf = {(r.id_a, r.id_b): r.jaccard for r in
          dedup.prefix_filter_jaccard_pairs(
              df, "text", "doc_id", n=3, threshold=0.5).collect()}
    assert pf == brute
    assert (1, 4) in pf and pf[(1, 4)] == 1.0
    assert (1, 2) in pf


def test_k_occurrence_hub_and_antihub(spark):
    """k_occurrence: the central vector appears in every other point's
    top-1 (hub), the peripheral one in none (antihub, explicit n_k=0
    row); ties broken by id; query_filter restricts the query panel but
    never the corpus."""
    rows = [(0, [1.0, 1.0]),   # hub: nearest of both axis vectors
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    got = {r.n_k: r.n_vecs for r in
           similarity.k_occurrence(df, "v", "vec_id", k=1).collect()}
    # occ: hub=2 (both axis queries pick it), id1=1 (hub's top-1 by id
    # tiebreak between the two 0.70711 scores), id2=0 (antihub)
    assert got == {0: 1, 1: 1, 2: 1}
    # sampled query panel: only vec_id=0 queries; its top-1 is id1
    got_s = {r.n_k: r.n_vecs for r in similarity.k_occurrence(
        df, "v", "vec_id", k=1,
        query_filter=F.col("vec_id") == 0).collect()}
    assert got_s == {0: 2, 1: 1}
    with pytest.raises(ValueError, match="k must be"):
        similarity.k_occurrence(df, "v", "vec_id", k=0)


def test_k_occurrence_broadcasts_query_panel(spark):
    """The query side must be broadcast (map-side m*n scoring, no
    pre-join shuffle): the plan carries a broadcast nested-loop join on
    the id-inequality condition and no CartesianProduct."""
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id int, v array<double>")
    plan = similarity.k_occurrence(
        df, "v", "vec_id", k=2,
        query_filter=F.col("vec_id") % 5 == 0)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_containment_pairs_directed_subset(spark):
    """A short doc quoted wholesale inside a long one: containment 1.0
    while Jaccard stays low (the asymmetric case Jaccard dilutes away);
    smaller side always reported first; block_col required."""
    quote = "the quick brown fox jumps over the lazy dog near the river"
    filler = " ".join(f"boiler{i} pad{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, quote, "en"),
         (2, filler + " " + quote + " " + filler, "en"),
         (3, "totally unrelated content about query planning here", "en"),
         (4, "tiny", "en")],                     # < n tokens: no shingles
        "doc_id int, text string, lang string")
    got = {(r.id_small, r.id_big): r for r in dedup.containment_pairs(
        df, "text", "doc_id", block_col="lang",
        n=5, threshold=0.9).collect()}
    assert list(got) == [(1, 2)]
    r = got[(1, 2)]
    assert r.containment == 1.0 and r.jaccard < 0.1
    with pytest.raises(ValueError, match="block_col"):
        dedup.containment_pairs(df, "text", "doc_id")
    # symmetric near-identical pair: equal sizes tie-break by id and
    # jaccard rides high
    sym = spark.createDataFrame(
        [(10, quote + " extra tail", "en"), (11, quote + " extra tip", "en")],
        "doc_id int, text string, lang string")
    (p,) = dedup.containment_pairs(sym, "text", "doc_id",
                                   block_col="lang", n=3,
                                   threshold=0.5).collect()
    assert (p.id_small, p.id_big) == (10, 11) and p.jaccard > 0.5


def test_dimension_profile_detects_collapse(spark):
    """dimension_profile: a dead dimension reports ~0 variance, ragged
    and NULL vectors are excluded (misaligned dims would corrupt every
    statistic), participation ratio derives from the relation."""
    import random
    rng = random.Random(3)
    rows = []
    for i in range(50):
        v = [rng.gauss(0, 1.0), 0.5, rng.gauss(0, 0.1)]  # dim1 dead
        rows.append((i, v))
    rows.append((97, None))
    rows.append((98, [1.0, 2.0]))                         # ragged: excluded
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    got = {r.dim: r for r in similarity.dimension_profile(
        df, "v", dim=3).collect()}
    assert set(got) == {0, 1, 2} and all(r.n == 50 for r in got.values())
    assert got[1].variance == 0.0 and got[1].mean == 0.5
    assert got[0].variance > got[2].variance > 0
    # participation ratio: (sum v)^2 / sum v^2 — collapsed << n_dims
    tot = sum(r.variance for r in got.values())
    pr = tot * tot / sum(r.variance ** 2 for r in got.values())
    assert 1.0 <= pr < 1.5                               # dim0 dominates
    with pytest.raises(ValueError, match="dim"):
        similarity.dimension_profile(df, "v", dim=0)


def test_containment_pairs_rare_matches_blocked_verifier(spark):
    """containment_pairs_rare finds the planted subset pair without any
    block (candidates from rare shingles), with the same statistic as
    the blocked verifier; pure-boilerplate misses are the documented
    miss-mode; guards hold."""
    quote = "the zebra quickly vaulted over seven mossy granite boulders"
    filler = " ".join(f"pad{i} word{i}" for i in range(40))
    rows = [(1, quote, "en"),
            (2, filler + " " + quote + " tail words here", "en"),
            (3, "entirely different text about planning", "en")]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    got = {(r.id_small, r.id_big): r for r in
           dedup.containment_pairs_rare(df, "text", "doc_id",
                                        n=5, threshold=0.9,
                                        max_df=10, min_shared=2).collect()}
    assert list(got) == [(1, 2)] and got[(1, 2)].containment == 1.0
    blocked = {(r.id_small, r.id_big): r for r in
               dedup.containment_pairs(df, "text", "doc_id",
                                       block_col="lang", n=5,
                                       threshold=0.9).collect()}
    assert got[(1, 2)].containment == blocked[(1, 2)].containment
    assert got[(1, 2)].jaccard == blocked[(1, 2)].jaccard
    with pytest.raises(ValueError, match="max_df"):
        dedup.containment_pairs_rare(df, "text", "doc_id", max_df=1)
    with pytest.raises(ValueError, match="threshold"):
        dedup.containment_pairs_rare(df, "text", "doc_id", threshold=0)
