"""Session 31 operators: near-dup split leakage and MinHash
estimator calibration — hand-constructed corpora with known pair
sets (the contract queries carry the DuckDB hash checks)."""

from __future__ import annotations

import hashlib

import __spark_entry__ as entry


def _split_of(doc_id: int) -> str:
    p = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
    return "train" if p < "e6" else ("val" if p < "f3" else "test")


def _pick_id(split: str, start: int = 0) -> int:
    i = start
    while _split_of(i) != split:
        i += 1
    return i


def test_split_leak_near_hand_case(spark, tmp_path):
    # identical texts => simhash hamming 0 pairs; disjoint vocabularies
    # between the groups keep the fingerprints far apart (no spurious
    # pairs).  One pair crosses train/test, one sits inside train.
    a = _pick_id("train")
    b = _pick_id("test")
    c = _pick_id("train", a + 1)
    d = _pick_id("train", c + 1)
    e = _pick_id("train", d + 1)
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "one two three four five six seven eight"
    t3 = "red green blue cyan magenta yellow black white"
    rows = [(a, t1), (b, t1), (c, t2), (d, t2), (e, t3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {(r.split_a, r.split_b): r for r in
           entry._q_split_leak_near(spark, sf).collect()}
    assert set(got) == {("test", "train"), ("train", "train")}
    assert got[("test", "train")].n_pairs == 1
    assert got[("train", "train")].n_pairs == 1
    assert got[("test", "train")].share_e6 == 500_000
    assert got[("train", "train")].share_e6 == 500_000


def test_minhash_err_identical_pair_zero_error(spark, tmp_path):
    # two identical docs: every minhash component matches (est = 1.0)
    # and the true word-set Jaccard is 1.0 — calibration error exactly
    # 0; the third doc's vocabulary is disjoint so it never becomes a
    # candidate (no band bucket can collide through shared min tokens)
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    r = entry._q_minhash_err(spark, sf).collect()[0]
    assert r.n_pairs == 1
    assert r.mean_abs_err_e6 == 0
    assert r.max_abs_err_e6 == 0
    assert (r.n_over, r.n_under) == (0, 0)


def test_gram_matrix_python_twin(spark):
    # textbook numpy X'X on the same floor(v*4096) grid must match the
    # distributed matrix-partial-aggregation fold bit for bit,
    # including under repartitioning (order independence of + on int64)
    import numpy as np

    from frogocr_spark.operators.similarity import gram_matrix_int
    rng = np.random.RandomState(3)
    vecs = rng.randn(40, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").repartition(7)
    got = {(r.i, r.j): r.gram
           for r in gram_matrix_int(df, use_dims=5).collect()}
    q = np.floor(vecs.astype("float64")[:, :5] * 4096).astype(np.int64)
    expect = q.T @ q
    assert len(got) == 15                    # 5*6/2 upper triangle
    for (i, j), v in got.items():
        assert i <= j
        assert v == expect[i][j]


def test_gram_matrix_guards(spark):
    import pytest as _pt

    from frogocr_spark.operators.similarity import gram_matrix_int
    df = spark.createDataFrame([(1, [0.1, 0.2])],
                               "vec_id long, embedding array<float>")
    with _pt.raises(ValueError):
        gram_matrix_int(df, use_dims=0)
    with _pt.raises(Exception):              # vector shorter than d
        gram_matrix_int(df, use_dims=5).collect()


def test_average_precision_hand_case(spark):
    # ranked (score DESC, id): 5(+) 4(-) 3(+) 2(-)
    # AP terms: k=1 cp=1 -> 1000000; k=3 cp=2 -> 666666 (truncated)
    # AP = (1000000 + 666666) // 2 = 833333
    from pyspark.sql import functions as F

    from frogocr_spark.operators.analytics import average_precision_exact
    rows = [(1, 5, 1), (2, 4, 0), (3, 3, 1), (4, 2, 0)]
    df = spark.createDataFrame(rows, "id long, s long, y int")
    r = average_precision_exact(df, F.col("s"), F.col("y") == 1,
                                "id").collect()[0]
    assert (r.n, r.n_pos) == (4, 2)
    assert r.ap_e6 == 833_333


def test_average_precision_ties_and_empty_pos(spark):
    from pyspark.sql import functions as F

    from frogocr_spark.operators.analytics import average_precision_exact
    # tie on score: order falls back to id ASC — positive id=1 ranks
    # first: terms k=1 cp=1 -> 1000000 ; AP = 1000000
    rows = [(1, 7, 1), (2, 7, 0)]
    df = spark.createDataFrame(rows, "id long, s long, y int")
    r = average_precision_exact(df, F.col("s"), F.col("y") == 1,
                                "id").collect()[0]
    assert r.ap_e6 == 1_000_000
    # flipped ids: positive now ranks second -> cp=1 k=2 -> 500000
    rows = [(2, 7, 1), (1, 7, 0)]
    df = spark.createDataFrame(rows, "id long, s long, y int")
    r = average_precision_exact(df, F.col("s"), F.col("y") == 1,
                                "id").collect()[0]
    assert r.ap_e6 == 500_000
    # no positives -> NULL
    rows = [(1, 5, 0), (2, 4, 0)]
    df = spark.createDataFrame(rows, "id long, s long, y int")
    r = average_precision_exact(df, F.col("s"), F.col("y") == 1,
                                "id").collect()[0]
    assert r.ap_e6 is None and r.n_pos == 0
