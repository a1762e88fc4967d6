"""ANN: brute-force correctness vs numpy; LSH recall vs brute force."""

import numpy as np
import pytest

from frogocr_spark.operators import similarity

DIM = 16
N = 80


def _vectors():
    # deterministic pseudo-random vectors (hash-free simple LCG)
    rng = np.random.default_rng(42)
    return rng.normal(size=(N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def emb_df(spark):
    vecs = _vectors()
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_bruteforce_matches_numpy(spark, emb_df):
    vecs = _vectors().astype(np.float64)
    queries = emb_df.where("vec_id < 5")
    got = similarity.cosine_topk_bruteforce(emb_df, queries, k=3).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(5):
        order = [i for i in np.argsort(-sims[q]) if i != q][:3]
        mine = sorted([r for r in got if r.query_id == q], key=lambda r: r.rank)
        assert [r.neighbor_id for r in mine] == order
        for r, i in zip(mine, order):
            assert r.cosine == pytest.approx(sims[q][i], abs=1e-6)


def test_lsh_recall_vs_bruteforce(spark, emb_df):
    queries = emb_df.where("vec_id < 10")
    exact = similarity.cosine_topk_bruteforce(emb_df, queries, k=5).collect()
    approx = similarity.cosine_topk_lsh(emb_df, queries, k=5, dim=DIM,
                                        nbits=4, ntables=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # candidates re-ranked with EXACT cosine → any common pair agrees
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert r.cosine == pytest.approx(
                exact_cos[(r.query_id, r.neighbor_id)], abs=1e-9)


def test_lsh_deterministic(spark, emb_df):
    queries = emb_df.where("vec_id < 3")
    a = similarity.cosine_topk_lsh(emb_df, queries, 3, DIM).collect()
    b = similarity.cosine_topk_lsh(emb_df, queries, 3, DIM).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
