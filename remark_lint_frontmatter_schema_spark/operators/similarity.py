"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k for one query vector: a single
  scan with a JVM-side dot product (zip_with + aggregate), then a top-k
  (TakeOrderedAndProject — no full sort). The correctness baseline.
* ``cosine_topk_ivf`` — the scale path: IVF-style partition pruning. A
  k-means-ish set of centroids (sampled deterministically) assigns every
  vector to a cell; a query probes only the ``n_probe`` nearest cells, so
  the scan touches cells/n_probe of the data. At 100 TB the cell id is a
  partition column and pruning happens at the source.
* ``embedding_near_dup_pairs`` — near-dup by cosine within a blocking key
  (exact within block; compose with LSH/IVF blocks at scale).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b):
    # try_divide: a zero-norm vector must yield NULL (similar to nothing),
    # not raise DIVIDE_BY_ZERO under ANSI mode (Spark 4 default) nor
    # produce NaN (which Spark orders ABOVE every double, so a bare
    # `score >= threshold` would glue a zero vector to its whole block)
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(df: DataFrame, vec_col: str, id_col: str,
                query: list[float], k: int = 10,
                *, exclude_id=None) -> DataFrame:
    """Exact top-k by cosine similarity to ``query`` (tie-broken by id so
    results are deterministic)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 5)
        .alias("score"))
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def k_occurrence(df: DataFrame, vec_col: str, id_col: str, *,
                 k: int = 10, query_filter=None) -> DataFrame:
    """Hubness diagnostic: the k-occurrence histogram ``N_k`` — for each
    vector, in how many other points' cosine top-k does it appear —
    aggregated to (n_k, n_vecs) rows.

    High-dimensional embedding spaces concentrate: a few "hub" vectors
    show up in everyone's neighbor lists (huge ``n_k``) while many
    "antihubs" appear in none (``n_k = 0``) — a skewed histogram is the
    standard warning (Radovanović et al., JMLR 2010) that cosine-kNN
    retrieval quality and kNN-graph dedup (SemDeDup cells, near-dup
    pairs) will be dominated by hubs on this embedding model. The n_k=0
    row is emitted explicitly (antihub count), via a left join of the
    corpus against the occurrence counts — never silently dropped.

    Dataflow: the (optionally ``query_filter``-sampled) query side is
    BROADCAST against the corpus — m*n scores evaluated map-side with no
    pre-join shuffle — then one window per query id takes top-k and one
    hash aggregate counts occurrences. Exact over the sampled queries (a
    deterministic ``pmod(id, s) = 0`` filter gives an unbiased estimator
    any SQL oracle reproduces row-exactly). At 10^12-corpus scale the
    all-pairs form is off the table regardless of sampling — feed the
    same occurrence aggregation from :func:`pq_topk_ivf` neighbor lists
    instead; this operator is the exact small-scale / validation form.
    Scores are rounded to 5 before ranking (id tiebreak) so ranks are
    reproducible across engines."""
    if k < 1:
        raise ValueError("k must be >= 1")
    corpus = df.select(F.col(id_col).alias("_id"),
                       F.col(vec_col).cast("array<double>").alias("_v"))
    qsrc = df if query_filter is None else df.where(query_filter)
    q = qsrc.select(F.col(id_col).alias("_qid"),
                    F.col(vec_col).cast("array<double>").alias("_qv"))
    scored = (corpus.join(F.broadcast(q), F.col("_id") != F.col("_qid"))
                    .select("_qid", "_id",
                            F.round(cosine(F.col("_v"), F.col("_qv")), 5)
                             .alias("_score")))
    w = Window.partitionBy("_qid").orderBy(F.desc("_score"),
                                           F.col("_id").asc())
    topk = scored.withColumn("_rk", F.row_number().over(w)) \
                 .where(F.col("_rk") <= k)
    occ = topk.groupBy("_id").agg(F.count(F.lit(1)).alias("_occ"))
    per_vec = (corpus.select("_id")
                     .join(occ, "_id", "left")
                     .select(F.coalesce(F.col("_occ"), F.lit(0))
                              .alias("n_k")))
    return per_vec.groupBy("n_k").agg(F.count(F.lit(1)).alias("n_vecs"))


def dimension_profile(df: DataFrame, vec_col: str, *, dim: int) -> DataFrame:
    """Per-dimension statistics of an embedding column: (dim, n, mean,
    variance, min, max) — the embedding-collapse diagnostic.

    A healthy encoder spreads information across dimensions; training
    collapse or a truncation bug shows up as DEAD dimensions (variance
    ~0) or one dimension carrying almost all the variance — both
    invisible to the row-level x-embedding checks (norm, NaN, length)
    and cheap to watch here. The participation ratio
    ``(sum var)^2 / sum var^2`` derives directly from this relation
    (n_dims means isotropic, ~1 means collapsed).

    One posexplode + hash aggregate whose shuffle carries (dim) keys —
    dim groups total, map-side combined. Vectors that are NULL or not
    exactly ``dim`` long are absent (shape policing is
    validate_embeddings_array's job, and mixing lengths would silently
    misalign dimensions)."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    v = F.col(vec_col).cast("array<double>")
    base = df.where(v.isNotNull() & (F.size(v) == dim)) \
             .select(F.posexplode(v).alias("dim", "x"))
    return base.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mean"),
        F.var_samp("x").alias("variance"),
        F.min("x").alias("min"),
        F.max("x").alias("max"))


def assign_cells(df: DataFrame, vec_col: str, centroids: list[list[float]]):
    """IVF cell assignment: argmin squared distance to each centroid — an
    unrolled JVM expression per centroid (centroid count is small)."""
    dists = []
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), carr,
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        dists.append(d.alias(f"_d{ci}"))
    best = F.lit(0)
    best_d = dists[0]
    for ci in range(1, len(centroids)):
        cond = dists[ci] < best_d
        best = F.when(cond, F.lit(ci)).otherwise(best)
        best_d = F.when(cond, dists[ci]).otherwise(best_d)
    return df.withColumn("_cell", best)


def assign_cells_np(df: DataFrame, vec_col: str,
                    centroids: list[list[float]], *,
                    with_sim: bool = False) -> DataFrame:
    """Arrow-batched numpy cell assignment — the LARGE-n_cells path.

    The unrolled JVM expression in :func:`assign_cells` grows linearly in
    plan size with the centroid count and falls off the codegen cliff
    past ~16 cells (measured: planning hangs at 32×64-dim); a numpy
    ``(batch, cells)`` distance matrix costs the same one map stage at
    any cell count (the :func:`pq_encode` trade, same reasoning). Adds
    ``_cell`` (and ``_csim`` — cosine to the assigned centroid, rounded
    to 5 — when ``with_sim``); NULL vectors get NULL in both."""
    C = np.asarray(centroids, dtype="float64")          # (c, d)
    c_n2 = (C ** 2).sum(axis=1)
    c_norm = np.sqrt(c_n2)

    @F.pandas_udf("struct<cell:int, sim:double>")
    def _assign(vs: pd.Series) -> pd.DataFrame:
        n = len(vs)
        cell = pd.Series([None] * n, dtype="object", index=vs.index)
        sim = pd.Series([None] * n, dtype="object", index=vs.index)
        mask = vs.notna()
        if mask.any():
            X = np.stack(vs[mask].to_numpy())           # (n, d)
            dots = X @ C.T                              # (n, c)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin drops ||x||^2
            idx = (c_n2 - 2.0 * dots).argmin(axis=1)
            cell[mask] = pd.Series(idx, dtype="object",
                                   index=vs.index[mask])
            if with_sim:
                xn = np.sqrt((X ** 2).sum(axis=1))
                s = np.round(dots[np.arange(len(idx)), idx]
                             / (xn * c_norm[idx]), 5)
                sim[mask] = pd.Series(s, dtype="object",
                                      index=vs.index[mask])
        return pd.DataFrame({"cell": cell, "sim": sim})

    out = df.withColumn(
        "_a", _assign(F.col(vec_col).cast("array<double>")))
    cols = [F.col("_a.cell").alias("_cell")]
    if with_sim:
        cols.append(F.col("_a.sim").alias("_csim"))
    return out.select("*", *cols).drop("_a")


# cell counts above this use the numpy assignment path (JVM expression
# plan size is linear in cells; see assign_cells_np)
_MAX_UNROLLED_CELLS = 16


def sample_centroids(df: DataFrame, vec_col: str, id_col: str,
                     n_cells: int) -> list[list[float]]:
    """Deterministic centroid seed: the n_cells vectors with the smallest
    xxhash64(id) — stable across runs, no RNG, one small collect."""
    rows = (df.select(F.col(vec_col).alias("v"),
                      F.xxhash64(F.col(id_col).cast("string")).alias("h"))
              .orderBy("h").limit(n_cells).collect())
    return [[float(x) for x in r.v] for r in rows]


def _sampled_points(df: DataFrame, vec_col: str, id_col: str,
                    sample_n: int) -> "object":
    """Deterministic hash-ordered sample of vectors as an (n, dim) numpy
    array — ONE bounded collect, the same rows on every rerun (xxhash64
    order, value tiebreak)."""
    import numpy as np
    rows = (df.where(F.col(vec_col).isNotNull())
              .select(F.col(vec_col).cast("array<double>").alias("v"),
                      F.xxhash64(F.col(id_col).cast("string")).alias("h"))
              .orderBy("h", "v").limit(sample_n).collect())
    return np.array([r.v for r in rows], dtype=np.float64)


def _greedy_seed(pts, n: int):
    """Deterministic greedy k-center (farthest-point) seed indices over an
    (n_pts, dim) array — THE shared seeding for IVF cells, sampled Lloyd,
    and PQ subspace codebooks (k-means++-style spread without RNG)."""
    import numpy as np
    chosen = [0]
    d = ((pts - pts[0]) ** 2).sum(axis=1)
    for _ in range(min(n, len(pts)) - 1):
        i = int(np.argmax(d))
        chosen.append(i)
        d = np.minimum(d, ((pts - pts[i]) ** 2).sum(axis=1))
    return chosen


def farthest_point_centroids(df: DataFrame, vec_col: str, id_col: str,
                             n_cells: int, *,
                             sample_n: int = 4096) -> list[list[float]]:
    """Greedy k-center (farthest-point) seeding over a deterministic
    hash-ordered sample — the k-means++-style spread guarantee without
    RNG: plain hash sampling can drop two seeds in one cluster and leave
    another cluster seedless, which Lloyd iterations cannot repair. One
    small collect (<= sample_n rows); the greedy loop is driver-side
    numpy over the sample."""
    pts = _sampled_points(df, vec_col, id_col, sample_n)
    if len(pts) == 0:
        return []
    return [[float(x) for x in pts[i]] for i in _greedy_seed(pts, n_cells)]


def kmeans_centroids(df: DataFrame, vec_col: str, id_col: str,
                     n_cells: int, *, dim: int, n_iter: int = 2,
                     train_sample_n: int | None = 65536) -> list[list[float]]:
    """Lloyd-refined IVF centroids, deterministic.

    Seeded from :func:`farthest_point_centroids` (deterministic greedy
    k-center — hash sampling alone can double-seed one cluster and miss
    another, unrecoverable by Lloyd), then ``n_iter`` Lloyd rounds.

    Default path (``train_sample_n`` set): Lloyd runs DRIVER-SIDE numpy
    over one bounded deterministic sample — the faiss-standard IVF
    training regime, because at 10^12 rows the alternative is ``n_iter``
    extra full-table scans just to move centroids the sample already
    pins (centroid estimates converge ~1/sqrt(sample), not with table
    size). ONE collect of ``train_sample_n`` vectors; zero extra scans.

    ``train_sample_n=None`` restores the fully-distributed exact loop:
    each round is one scan + a shuffle of ``n_cells x dim`` partial sums
    (``avg(element_at(vec, i))`` — no explode, map-side combined) — for
    when training must see every row. Empty cells keep their previous
    centroid on both paths. Refined cells tighten IVF partition pruning:
    fewer probes reach the same recall, so scan fraction per query drops.
    """
    import numpy as np
    # NULL vectors carry no training signal and the numpy path assigns
    # them cell NULL (whose all-None means would crash the float() below)
    df = df.where(F.col(vec_col).isNotNull())
    if train_sample_n is not None:
        pts = _sampled_points(df, vec_col, id_col, train_sample_n)
        if len(pts) == 0:
            return []
        C = pts[_greedy_seed(pts, n_cells)].copy()
        for _ in range(n_iter):
            # k small distance rows of len(pts) each — never the
            # (n, k, dim) tensor
            dists = np.stack([((pts - c) ** 2).sum(axis=1) for c in C])
            a = dists.argmin(axis=0)
            for ci in range(len(C)):
                members = pts[a == ci]
                if len(members):
                    C[ci] = members.mean(axis=0)
        return [[float(x) for x in row] for row in C]
    cents = farthest_point_centroids(df, vec_col, id_col, n_cells)
    v = F.col(vec_col).cast("array<double>")
    for _ in range(n_iter):
        assigned = (assign_cells_np(df, vec_col, cents)
                    if len(cents) > _MAX_UNROLLED_CELLS
                    else assign_cells(df, vec_col, cents))
        rows = (assigned
                .groupBy("_cell")
                .agg(*[F.avg(F.element_at(v, i + 1)).alias(f"c{i}")
                       for i in range(dim)])
                .collect())
        by_cell = {r._cell: [float(r[f"c{i}"]) for i in range(dim)]
                   for r in rows if r._cell is not None}
        cents = [by_cell.get(ci, cents[ci]) for ci in range(len(cents))]
    return cents


def cosine_topk_ivf(df: DataFrame, vec_col: str, id_col: str,
                    query: list[float], k: int = 10, *, n_cells: int = 16,
                    n_probe: int = 4,
                    centroids: list[list[float]] | None = None) -> DataFrame:
    """Approximate top-k: probe only the n_probe cells nearest the query.

    At warehouse scale the cell assignment is precomputed/persisted
    (partition or bucket column) so the probe is a partition-pruned scan.
    """
    if centroids is None:
        centroids = sample_centroids(df, vec_col, id_col, n_cells)

    def sqdist(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probe = sorted(range(len(centroids)),
                   key=lambda ci: sqdist(centroids[ci], query))[:n_probe]
    cells = assign_cells(df, vec_col, centroids)
    pruned = cells.where(F.col("_cell").isin(*probe))
    return cosine_topk(pruned.drop("_cell"), vec_col, id_col, query, k)


def embedding_near_dup_pairs(df: DataFrame, vec_col: str, id_col: str, *,
                             block_col: str, threshold: float = 0.99,
                             reuse: bool = True) -> DataFrame:
    """Exact cosine near-dup pairs within a blocking key. ``reuse``
    persists the casted-vector relation so the self-join's two sides read
    the source once (Spark does not dedupe aliased self-join subtrees)."""
    from .dedup import _persist, _track
    v = df.select(F.col(block_col).alias("blk"), F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    if reuse:
        v = _persist(v)
    a = v.select("blk", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = v.select("blk", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = (a.join(b, "blk")
             .where(F.col("id_a") < F.col("id_b"))
             .withColumn("score", F.round(cosine(F.col("v_a"), F.col("v_b")), 5))
             # NaN (zero-norm vector) sorts ABOVE every double in Spark —
             # without the guard a zero vector pairs with its whole block
             .where(~F.isnan("score") & (F.col("score") >= threshold))
             .select("id_a", "id_b", "score"))
    return _track(pairs, v)


_ = math


# ---------------------------------------------------------------------------
# random-hyperplane LSH (SimHash for vectors) — the bucketed scale path for
# embedding near-dup when no natural blocking key exists
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (Box-Muller over a seeded
    LCG — stdlib-only, stable across runs/processes)."""
    import math as _m
    import random as _r
    rnd = _r.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def hyperplane_signature(vec_col, planes: list[list[float]]):
    """n_bits sign bits packed into one long — pure JVM expressions (one
    dot product per plane, shift-or pack)."""
    v = F.col(vec_col).cast("array<double>") if isinstance(vec_col, str) \
        else vec_col
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(v, parr) >= 0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return sig


def embedding_lsh_pairs(df: DataFrame, vec_col: str, id_col: str, *,
                        n_bits: int = 12, threshold: float = 0.85,
                        dim: int | None = None, seed: int = 42,
                        reuse: bool = True) -> DataFrame:
    """Near-dup pairs via random-hyperplane LSH buckets + exact verify.

    Vectors with identical n_bits sign-signatures land in one bucket
    (collision probability (1 - theta/pi)^n_bits — high for near-parallel
    vectors); the exact cosine runs only within buckets. The bucket join
    shuffles (id, vector) once on the signature — at 10^12 rows the
    signature is a persisted bucketing column and the join is co-located.
    Recall can be raised by unioning several seeds (standard multi-table
    LSH); one table is the single-scan default.

    Pass ``dim`` (the vector dimensionality) when known — omitting it costs
    one tiny ``first()`` job to sniff it (array columns carry no static
    length in the schema). An empty input returns an empty pairs frame.
    """
    from .dedup import _persist, _track
    if dim is None:
        # probe a NON-NULL vector: sniffing the physically-first row would
        # silently return an empty result when row 1's vector is NULL but
        # the rest are valid
        row = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
        if row is None:
            id_t = df.schema[id_col].dataType.simpleString()
            return df.sparkSession.createDataFrame(
                [], f"id_a {id_t}, id_b {id_t}, score double")
        dim = len(row[0])
    planes = _hyperplanes(dim, n_bits, seed)
    sig = df.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"),
                    hyperplane_signature(vec_col, planes).alias("bucket"))
    if reuse:
        sig = _persist(sig)
    a = sig.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = sig.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = (a.join(b, "bucket")
              .where(F.col("id_a") < F.col("id_b"))
              .withColumn("score", F.round(cosine(F.col("v_a"),
                                                  F.col("v_b")), 5))
              # NaN guard — see embedding_near_dup_pairs
              .where(~F.isnan("score") & (F.col("score") >= threshold))
              .select("id_a", "id_b", "score"))
    return _track(pairs, sig)


# ---------------------------------------------------------------------------
# Product quantization (the memory-bound ANN scale path)
# ---------------------------------------------------------------------------
#
# At 10^12 vectors the working set, not the arithmetic, is the wall: a
# 768-dim float32 embedding is 3 KB/row, while an m-subspace PQ code is m
# BYTES (n_codes <= 256). Train per-subspace codebooks once, encode every
# vector to its nearest-centroid code per subspace, and answer queries by
# asymmetric distance computation (ADC): a per-query lookup table of
# query-to-centroid distances, so the scan touches only the code column —
# a pure-JVM element_at + sum, no vector arithmetic per row. Compose with
# IVF cells (cosine_topk_ivf) at the design point: cells prune the scan,
# PQ shrinks what the scan reads. Cosine ordering is preserved by
# L2-normalizing vectors before train/encode (callers own normalization;
# on unit vectors L2 rank == cosine rank).


def _subspaces(dim: int, m: int) -> list:
    """Contiguous (start, length) splits; dim need not divide evenly."""
    if not 1 <= m <= dim:
        raise ValueError(f"pq: m={m} must be in [1, {dim}]")
    base, extra = divmod(dim, m)
    out, start = [], 1  # slice() is 1-based
    for j in range(m):
        ln = base + (1 if j < extra else 0)
        out.append((start, ln))
        start += ln
    return out


def pq_train(df: DataFrame, vec_col: str, id_col: str, *, dim: int,
             m: int = 4, n_codes: int = 16, n_iter: int = 8,
             sample_n: int = 4096) -> list[list[list[float]]]:
    """Per-subspace codebooks from a bounded deterministic sample,
    trained on the DRIVER (numpy Lloyd, farthest-point seeded).

    Training is deliberately not distributed: codebook quality needs a
    few thousand representative vectors, not the corpus (FAISS trains on
    a sample for the same reason), so ONE bounded collect
    (``sample_n`` × dim doubles) replaces m distributed k-means runs
    whose nested argmin expressions blow up plan size. The sample is
    hash-ordered by id — deterministic, no Date/random dependence — and
    the resulting codebooks ship back to executors as literals inside
    the encode/ADC expressions."""
    rows = (df.where(F.col(vec_col).isNotNull())
              .select(F.col(vec_col).cast("array<double>").alias("_v"),
                      F.xxhash64(F.col(id_col).cast("string")).alias("_h"))
              .orderBy("_h").limit(sample_n).collect())
    if not rows:
        raise ValueError("pq_train: no non-NULL vectors to train on")
    sample = np.asarray([r._v for r in rows], dtype="float64")
    if sample.shape[1] != dim:
        raise ValueError(
            f"pq_train: dim={dim} but vectors have {sample.shape[1]}")
    books = []
    for start, ln in _subspaces(dim, m):
        sub = sample[:, start - 1: start - 1 + ln]
        k = min(n_codes, len(sub))
        cents = sub[_greedy_seed(sub, k)].copy()
        for _ in range(n_iter):  # Lloyd
            assign = ((sub[:, None, :] - cents[None, :, :]) ** 2) \
                .sum(axis=2).argmin(axis=1)
            for ci in range(k):
                mask = assign == ci
                if mask.any():
                    cents[ci] = sub[mask].mean(axis=0)
        books.append([[float(x) for x in c] for c in cents])
    return books


def pq_encode(df: DataFrame, vec_col: str, id_col: str,
              codebooks: list[list[list[float]]], *,
              passthrough: tuple = ()) -> DataFrame:
    """Encode each vector to its PQ code: ``(id_col, codes array<int>)``.

    One Arrow-batched map stage (pandas UDF): per batch, each subspace's
    nearest-centroid assignment is a single numpy distance-matrix argmin
    — m·n_codes unrolled JVM ``aggregate`` expressions would be
    CodegenFallback HOFs whose plan size explodes past m·k ≈ 64, the
    wrong trade for a stage that is vectorizable BLAS (measured: the
    expression form hung planning at m=16, k=64). NULL vectors yield
    NULL codes. The codes relation is what a 10^12-row deployment
    persists — m bytes/vector — while raw embeddings stay cold; encoding
    runs once per corpus, the hot ADC scan (:func:`pq_topk`) stays pure
    JVM."""
    dim = sum(len(b[0]) for b in codebooks)
    subs = _subspaces(dim, len(codebooks))
    books_np = [np.asarray(b, dtype="float64") for b in codebooks]

    @F.pandas_udf("array<int>")
    def _enc(vs: pd.Series) -> pd.Series:
        mask = vs.notna()
        out = pd.Series([None] * len(vs), dtype="object", index=vs.index)
        if mask.any():
            mat = np.stack(vs[mask].to_numpy())
            codes = np.empty((mat.shape[0], len(books_np)), dtype="int32")
            for j, ((start, ln), book) in enumerate(zip(subs, books_np)):
                sub = mat[:, start - 1: start - 1 + ln]
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin drops ||x||^2
                d = (sub @ book.T) * -2.0 + (book ** 2).sum(axis=1)
                codes[:, j] = d.argmin(axis=1)
            out[mask] = pd.Series([c for c in codes], dtype="object",
                                  index=vs.index[mask])
        return out

    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        _enc(F.col(vec_col).cast("array<double>")).alias("codes"))


def pq_topk(codes_df: DataFrame, codebooks: list[list[list[float]]],
            query: list[float], k: int = 10, *, id_col: str,
            exclude_id=None) -> DataFrame:
    """ADC top-k over PQ codes: per-subspace lookup tables of
    query-to-centroid squared distances (driver-computed literals), so
    each row costs m ``element_at`` + a sum — the scan never touches a
    vector. Returns ``(id_col, adc double)`` ascending (smaller = more
    similar; on normalized vectors ADC rank approximates cosine rank
    with codebook quantization error)."""
    subs = _subspaces(len(query), len(codebooks))
    luts = []
    for (start, ln), book in zip(subs, codebooks):
        qs = query[start - 1: start - 1 + ln]
        luts.append(F.array(*[
            F.lit(float(sum((a - b) ** 2 for a, b in zip(qs, c))))
            for c in book]))
    adc = None
    for j, lut in enumerate(luts):
        term = F.element_at(lut, F.col("codes")[j] + 1)
        adc = term if adc is None else adc + term
    scored = (codes_df.where(F.col("codes").isNotNull())
              .select(F.col(id_col), F.round(adc, 6).alias("adc")))
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.asc("adc"), F.col(id_col)).limit(k)


def pq_encode_ivf(df: DataFrame, vec_col: str, id_col: str,
                  codebooks: list[list[list[float]]],
                  centroids: list[list[float]]) -> DataFrame:
    """IVFADC index relation: ``(id_col, _cell int, codes array<int>)``
    — the composition a 10^12-vector deployment persists, partitioned by
    ``_cell``. One scan builds both: the coarse cell (JVM argmin over
    ``centroids``, :func:`assign_cells`) and the PQ code (Arrow-batched,
    :func:`pq_encode`); raw vectors are read once and stay cold."""
    cells = assign_cells(df, vec_col, centroids)
    return pq_encode(cells, vec_col, id_col, codebooks,
                     passthrough=("_cell",))


def pq_topk_ivf(enc_df: DataFrame, codebooks: list[list[list[float]]],
                centroids: list[list[float]], query: list[float],
                k: int = 10, *, n_probe: int = 2, id_col: str,
                exclude_id=None) -> DataFrame:
    """IVFADC query: probe the ``n_probe`` cells nearest the query
    (driver arithmetic over the small centroid list), then ADC-rank only
    those cells' codes. At the design point ``_cell`` is a partition
    column, so the probe filter prunes at the source and the scan reads
    ``n_probe/n_cells`` of the m-byte code column — the two approximations
    (cell recall, code quantization) compose and are bounded separately."""
    dists = [sum((a - b) ** 2 for a, b in zip(query, c)) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    return pq_topk(enc_df.where(F.col("_cell").isin(probe)),
                   codebooks, query, k, id_col=id_col,
                   exclude_id=exclude_id)


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication over the embedding space
# ---------------------------------------------------------------------------

def semdedup(df: DataFrame, vec_col: str, id_col: str, *, dim: int,
             n_cells: int = 16, threshold: float = 0.95, n_iter: int = 2,
             centroids: list[list[float]] | None = None,
             max_iter: int = 25) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    k-means cells block the pair search, cosine pairs above ``threshold``
    within a cell close into connected components, and the survivor of
    each component is the member with the LOWEST cosine to its cell
    centroid (the paper's "keep the most atypical example" rule — typical
    members are the redundant ones), ties to the smallest id.

    Returns one row per input row: ``(id_col, cell, centroid_sim, kept,
    dup_of)`` — ``kept=false`` rows name their surviving twin in
    ``dup_of``, so ``where(kept)`` IS the deduplicated corpus and the
    false rows are audit output.

    Scale: the only quadratic work is the within-cell exact verify — cell
    population is bounded by ``n_cells`` (at the 10^12 design point
    ``cell`` is a persisted partition column, the pair search runs
    per-partition with no shuffle, and ``n_cells`` is sized so a cell fits
    an executor). Everything else shuffles ids + one double per row, never
    vectors: component closure is the large/small-star iteration
    (``operators/clusters.py``) and survivor election is one groupBy-min.
    Centroid training (``kmeans_centroids``) is deterministic — no RNG —
    so reruns reproduce byte-identical verdicts. Reference parity: the
    reference has no embedding stage (``/root/reference/index.ts``); this
    is part of the training-data operator family the north-star adds.
    """
    from .clusters import connected_components
    from .dedup import _persist, _track

    if centroids is None:
        centroids = kmeans_centroids(df, vec_col, id_col, n_cells,
                                     dim=dim, n_iter=n_iter)
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    if len(centroids) > _MAX_UNROLLED_CELLS:
        # large cell counts: one Arrow stage yields cell AND centroid
        # cosine together (see assign_cells_np)
        scored = (assign_cells_np(base, "v", centroids, with_sim=True)
                  .select("id", F.col("_cell").alias("cell"), "v",
                          F.col("_csim").alias("centroid_sim")))
    else:
        spark = df.sparkSession
        cent_df = spark.createDataFrame(
            [(ci, [float(x) for x in c]) for ci, c in enumerate(centroids)],
            "cell int, _cvec array<double>")
        assigned = assign_cells(base, "v", centroids) \
            .withColumnRenamed("_cell", "cell")
        # broadcast-join the tiny centroid relation (never a per-row
        # CreateMap literal) to score each member against its own
        # centroid; NULL vectors get cell NULL here too (assign_cells'
        # when-chain would otherwise default them into cell 0 — the
        # numpy path's contract is the one both paths keep)
        scored = (assigned.join(F.broadcast(cent_df), "cell")
                  .select("id",
                          F.when(F.col("v").isNotNull(), F.col("cell"))
                           .alias("cell"),
                          "v",
                          F.when(F.col("v").isNotNull(),
                                 F.round(cosine(F.col("v"),
                                                F.col("_cvec")), 5))
                           .alias("centroid_sim")))
    scored = _persist(scored)
    a = scored.select("cell", F.col("id").alias("id_a"),
                      F.col("v").alias("v_a"))
    b = scored.select("cell", F.col("id").alias("id_b"),
                      F.col("v").alias("v_b"))
    pair_score = F.round(cosine(F.col("v_a"), F.col("v_b")), 5)
    pairs = (a.join(b, "cell")
              .where(F.col("id_a") < F.col("id_b"))
              # NaN guard: a zero-norm vector's cosine is 0/0 = NaN, and
              # Spark orders NaN ABOVE every double, so a bare
              # `>= threshold` would glue the zero vector to its whole
              # cell — zero vectors are provably similar to nothing
              .where(~F.isnan(pair_score) & (pair_score >= threshold))
              .select("id_a", "id_b"))
    comp = connected_components(pairs, max_iter=max_iter)
    member = comp.join(
        scored.select(F.col("id").alias("node"), "centroid_sim"), "node")
    # min over (centroid_sim, node) structs: lowest similarity wins, then
    # smallest id — one partial-aggregated groupBy, no window
    surv = (member.groupBy("component")
                  .agg(F.min(F.struct("centroid_sim", "node")).alias("_s"))
                  .select("component", F.col("_s.node").alias("_keep")))
    labeled = (scored.select("id", "cell", "centroid_sim")
               .join(comp.withColumnRenamed("node", "id"), "id", "left")
               .join(surv, "component", "left")
               .select(F.col("id").alias(id_col), "cell", "centroid_sim",
                       (F.col("_keep").isNull()
                        | (F.col("_keep") == F.col("id"))).alias("kept"),
                       F.when(F.col("_keep") != F.col("id"), F.col("_keep"))
                        .alias("dup_of")))
    return _track(labeled, scored)
