"""Sequence packing (operators/packing.py): distributed exclusive
prefix-sum correctness vs a pure-python fold, bucket-boundary coverage,
straddle semantics, and argument guards."""

import random

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.packing import (
    pack_documents, pack_stats)


def _df(spark, counts, ids=None):
    ids = ids if ids is not None else list(range(len(counts)))
    return spark.createDataFrame(
        list(zip(ids, counts)), "doc_id long, n long")


def _python_pack(pairs, capacity):
    """(id, n) pairs already in packing order -> expected rows."""
    out, acc = {}, 0
    for i, n in pairs:
        out[i] = (n, acc, acc // capacity, acc % capacity,
                  acc % capacity + n > capacity)
        acc += n
    return out


def test_known_small_example(spark):
    # capacity 10, counts 4,5,3,10,1 in id order:
    # pre_sum 0,4,9,12,22 ; bins 0,0,0,1,2 ; straddles F,F,T,T,F
    df = _df(spark, [4, 5, 3, 10, 1])
    rows = pack_documents(df, "doc_id", capacity=10, n_col="n") \
        .orderBy("doc_id").collect()
    assert [(r.doc_id, r.pre_sum, r.bin_id, r.offset_in_bin, r.straddles)
            for r in rows] == [
        (0, 0, 0, 0, False),
        (1, 4, 0, 4, False),
        (2, 9, 0, 9, True),
        (3, 12, 1, 2, True),
        (4, 22, 2, 2, False),
    ]


@pytest.mark.parametrize("n_buckets", [1, 3, 8, 64])
def test_matches_python_fold_across_buckets(spark, n_buckets):
    rnd = random.Random(7)
    counts = [rnd.randint(1, 50) for _ in range(300)]
    df = _df(spark, counts).repartition(5)
    rows = pack_documents(df, "doc_id", capacity=97, n_col="n",
                          n_buckets=n_buckets).collect()
    want = _python_pack(list(enumerate(counts)), 97)
    assert len(rows) == len(want)
    for r in rows:
        n, pre, b, off, strad = want[r.doc_id]
        assert (r.n_tokens, r.pre_sum, r.bin_id, r.offset_in_bin,
                r.straddles) == (n, pre, b, off, strad)


def test_custom_order_col(spark):
    # reverse order: key = -doc_id
    counts = [4, 5, 3]
    df = _df(spark, counts).withColumn("key", -F.col("doc_id"))
    rows = pack_documents(df, "doc_id", capacity=10, n_col="n",
                          order_col="key").orderBy("doc_id").collect()
    want = _python_pack([(2, 3), (1, 5), (0, 4)], 10)
    for r in rows:
        assert (r.pre_sum, r.bin_id) == want[r.doc_id][1:3]


def test_text_col_path_and_exclusions(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "   "), (3, "x")],
        "doc_id long, text string")
    rows = pack_documents(df, "doc_id", capacity=2, text_col="text") \
        .orderBy("doc_id").collect()
    # NULL and zero-token docs excluded; 3-token doc straddles capacity 2
    assert [(r.doc_id, r.n_tokens, r.bin_id, r.straddles) for r in rows] \
        == [(0, 3, 0, True), (3, 1, 1, False)]


def test_stats_and_guards(spark):
    df = _df(spark, [4, 5, 3, 10, 1])
    packed = pack_documents(df, "doc_id", capacity=10, n_col="n")
    s = pack_stats(packed, capacity=10).first()
    assert (s.n_bins, s.n_docs, s.n_tokens_total) == (3, 5, 23)
    assert s.straddle_fraction == 0.4
    # a final doc straddling SEVERAL boundaries still counts filled bins:
    # one 25-token doc fills ceil(25/10) = 3 bins though its bin_id is 0
    one = pack_documents(_df(spark, [25]), "doc_id", capacity=10, n_col="n")
    assert pack_stats(one, capacity=10).first().n_bins == 3
    with pytest.raises(ValueError):
        pack_documents(df, "doc_id", capacity=0, n_col="n")
    with pytest.raises(ValueError):
        pack_documents(df, "doc_id", capacity=10, n_col="n", n_buckets=0)
    with pytest.raises(ValueError):
        pack_stats(packed, capacity=0)
    # string order key would cast to NULL and silently drop every row
    sdf = spark.createDataFrame([("a", 3)], "doc_id string, n long")
    with pytest.raises(ValueError, match="numeric"):
        pack_documents(sdf, "doc_id", capacity=10, n_col="n")
    # timestamp order keys cast to epoch cleanly and stay allowed
    tdf = spark.createDataFrame(
        [(1, 4), (2, 5)], "doc_id long, n long")         .withColumn("ts", F.timestamp_seconds(F.col("doc_id") * 100))
    rows = pack_documents(tdf, "doc_id", capacity=10, n_col="n",
                          order_col="ts").orderBy("doc_id").collect()
    assert [(r.doc_id, r.pre_sum) for r in rows] == [(1, 0), (2, 4)]
    with pytest.raises(ValueError):
        pack_documents(df, "doc_id", capacity=10)
    with pytest.raises(ValueError):
        pack_documents(df, "doc_id", capacity=10, n_col="n",
                       text_col="text")


def test_empty_input(spark):
    df = _df(spark, [])
    assert pack_documents(df, "doc_id", capacity=10, n_col="n").count() == 0
