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
