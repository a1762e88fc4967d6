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


def test_lsh_score_e4_integer_contract(spark, emb_df):
    """score_e4 contract mode (round-4 fix for the sim_cosine_lsh red
    row): cosine_e4 must equal the pure-Python integer twin BIT-FOR-BIT
    (floor(v*4096) quantization, exact integer sums, single-rounded
    IEEE finish), stay within one quantum of the float cosine, and the
    k-cut must order by (cosine_e4 desc, neighbor_id asc)."""
    queries = emb_df.where("vec_id < 5")
    out = similarity.cosine_topk_lsh(emb_df, queries, k=5, dim=DIM,
                                     nbits=4, ntables=8,
                                     score_e4=True).collect()
    assert out, "no candidates"
    vecs = _vectors()
    vq = np.floor(vecs.astype(np.float64) * similarity.QUANT).astype(
        np.int64)

    def twin(qi, ni):
        dot = int((vq[qi] * vq[ni]).sum())
        na = int((vq[qi] * vq[qi]).sum())
        nb = int((vq[ni] * vq[ni]).sum())
        return int(np.floor((10000.0 * float(dot))
                            / np.sqrt(float(na) * float(nb))))

    for r in out:
        assert r.cosine_e4 == twin(r.query_id, r.neighbor_id)
        # quantized score tracks the float cosine within ~1 quantum
        assert abs(r.cosine_e4 - r.cosine * 10000.0) <= 2.0
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        keys = [(-r.cosine_e4, r.neighbor_id) for r in rows]
        assert keys == sorted(keys)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_lsh_deterministic(spark, emb_df):
    queries = emb_df.where("vec_id < 3")
    a = similarity.cosine_topk_lsh(emb_df, queries, 3, DIM).collect()
    b = similarity.cosine_topk_lsh(emb_df, queries, 3, DIM).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_ivf_recall_vs_bruteforce(spark, emb_df):
    queries = emb_df.where("vec_id < 10")
    exact = similarity.cosine_topk_bruteforce(emb_df, queries, k=5).collect()
    approx = similarity.cosine_topk_ivf(emb_df, queries, k=5,
                                        n_clusters=8, nprobe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # candidates re-ranked with EXACT cosine -> any common pair agrees
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert r.cosine == pytest.approx(
                exact_cos[(r.query_id, r.neighbor_id)], abs=1e-9)


def test_ivf_full_probe_is_exact(spark, emb_df):
    """nprobe == n_clusters degenerates to brute force (every cell probed)."""
    queries = emb_df.where("vec_id < 5")
    exact = similarity.cosine_topk_bruteforce(emb_df, queries, k=3).collect()
    full = similarity.cosine_topk_ivf(emb_df, queries, k=3,
                                      n_clusters=4, nprobe=4).collect()
    assert sorted((r.query_id, r.neighbor_id, r.rank) for r in full) == \
        sorted((r.query_id, r.neighbor_id, r.rank) for r in exact)


def test_ivf_deterministic(spark, emb_df):
    queries = emb_df.where("vec_id < 3")
    a = similarity.cosine_topk_ivf(emb_df, queries, 3, n_clusters=8).collect()
    b = similarity.cosine_topk_ivf(emb_df, queries, 3, n_clusters=8).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_ivf_prefit_centroids_reused(spark, emb_df):
    """ivf_fit once, search many times (the production pattern: fit is a
    bounded driver-side step, search is per-batch)."""
    cents = similarity.ivf_fit(emb_df, n_clusters=8)
    assert cents.shape == (8, DIM)
    import numpy as _np
    _np.testing.assert_allclose(_np.linalg.norm(cents, axis=1), 1.0,
                                rtol=1e-9)
    queries = emb_df.where("vec_id < 3")
    via_prefit = similarity.cosine_topk_ivf(
        emb_df, queries, 3, centroids=cents, nprobe=8).collect()
    refit = similarity.cosine_topk_ivf(
        emb_df, queries, 3, n_clusters=8, nprobe=8).collect()
    assert sorted(map(str, via_prefit)) == sorted(map(str, refit))


def test_partial_topk_matches_bruteforce(spark):
    """cosine_topk_partial (partition-local partial reduction) returns
    exactly the brute-force top-k: same (query, neighbor, rank) triples,
    same cosines to float tolerance."""
    import pytest

    from frogocr_spark.operators.similarity import (cosine_topk_bruteforce,
                                                    cosine_topk_partial)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(7)
    bf = {(r.query_id, r.neighbor_id): (r.rank, r.cosine)
          for r in cosine_topk_bruteforce(emb, queries, k=5).collect()}
    pt = {(r.query_id, r.neighbor_id): (r.rank, r.cosine)
          for r in cosine_topk_partial(
              emb.repartition(6), queries, k=5).collect()}
    assert set(bf) == set(pt)
    for key, (rank, cos) in bf.items():
        assert pt[key][0] == rank
        assert pt[key][1] == pytest.approx(cos, abs=1e-9)


def test_partial_topk_tie_groups_survive_local_prune(spark):
    """k+1 identical embeddings tied at the kth cosine, spread across
    partitions: the local prune must keep the whole tie group so the
    global ascending-id tie-break matches brute force exactly."""
    from frogocr_spark.operators.similarity import (cosine_topk_bruteforce,
                                                    cosine_topk_partial)

    base = [1.0, 0.0, 0.0, 0.0]
    rows = ([(0, [0.9, 0.1, 0.0, 0.0])]                 # the query
            + [(i, base) for i in range(1, 8)]           # 7-way tie
            + [(10, [0.0, 1.0, 0.0, 0.0])])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id = 0")
    bf = [(r.query_id, r.neighbor_id, r.rank)
          for r in cosine_topk_bruteforce(df, queries, k=3).collect()]
    pt = [(r.query_id, r.neighbor_id, r.rank)
          for r in cosine_topk_partial(
              df.repartition(5), queries, k=3).collect()]
    assert sorted(pt) == sorted(bf)
    # the winners are the three SMALLEST ids of the tie group
    assert sorted(n for _, n, _ in pt) == [1, 2, 3]


def test_partial_topk_empty_queries(spark):
    from frogocr_spark.operators.similarity import cosine_topk_partial

    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "vec_id long, embedding array<double>")
    out = cosine_topk_partial(df, df.where("vec_id < 0"), k=3)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "neighbor_id", "cosine", "rank"}
