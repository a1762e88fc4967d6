"""Rolling fingerprint, BPE-ish token count, embedding near-dup."""

import numpy as np
import pytest

from frogocr_spark.operators import textstats
from frogocr_spark.operators.dedup import embedding_near_dup_pairs
from frogocr_spark.operators.textstats import (ROLL_BASE, ROLL_MOD,
                                               hash_token,
                                               rolling_fingerprint)


def _py_roll(text: str) -> int:
    acc = 0
    for tok in text.split():
        acc = (acc * ROLL_BASE + hash_token(tok)) % ROLL_MOD
    return acc


def test_rolling_fingerprint_matches_python_and_is_order_sensitive(spark):
    rows = [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, ""),
            (3, "alpha beta gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.roll_fp for r in rolling_fingerprint(df).collect()}
    for i, t in rows:
        assert got[i] == _py_roll(t), i
    assert got[0] == got[3]          # identical text → identical fp
    assert got[0] != got[1]          # reordered tokens → different fp
    assert got[2] == 0


def test_bpe_token_count(spark):
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(0, "hello, world! x2"), (1, ""), (2, "a.b.c")],
        "id long, text string")
    got = {r.id: r.n for r in df.select(
        "id", textstats.bpe_token_count(F.col("text")).alias("n")).collect()}
    # hello , world ! x 2 → 6 ; a . b . c → 5
    assert got == {0: 6, 1: 0, 2: 5}


@pytest.fixture(scope="module")
def near_dup_emb(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # plant near-dups: 100/101 ≈ copies of 0/1 with tiny noise
    for src, nid in ((0, 100), (1, 101)):
        v = base[src] + rng.normal(scale=0.01, size=16).astype(np.float32)
        rows.append((nid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_embedding_near_dup_exact(spark, near_dup_emb):
    got = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(
        near_dup_emb, threshold=0.95, use_lsh=False).collect()}
    assert (0, 100) in got and (1, 101) in got
    # random 16-dim pairs never reach .95
    assert all(b in (100, 101) for _, b in got)


def test_embedding_near_dup_lsh_finds_planted(spark, near_dup_emb):
    got = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(
        near_dup_emb, threshold=0.95, dim=16, use_lsh=True).collect()}
    assert (0, 100) in got and (1, 101) in got
    exact = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(
        near_dup_emb, threshold=0.95, use_lsh=False).collect()}
    assert got <= exact  # LSH candidates verified by exact cosine
