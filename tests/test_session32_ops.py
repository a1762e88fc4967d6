"""Session 32 operators: DBSCAN (grid-blocked, deterministic border
rule)."""

from __future__ import annotations

import pytest

from frogocr_spark.operators.clustering import dbscan_grid


def _rows(spark, pts):
    return spark.createDataFrame(pts, "id long, x long, y long")


def test_dbscan_hand_case(spark):
    # one dense triangle (all core, cluster 1), one border hanging off
    # B, one isolated noise point; eps=2, min_pts=3 (count incl. self)
    pts = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 3, 0), (5, 9, 9)]
    got = {r.id: (r.role, r.cluster_id)
           for r in dbscan_grid(_rows(spark, pts), 2, 3).collect()}
    assert got == {1: ("core", 1), 2: ("core", 1), 3: ("core", 1),
                   4: ("border", 1), 5: ("noise", None)}


def test_dbscan_border_tiebreak_min_cluster(spark):
    # two 4-point core clusters (ids 1-4 and 5-8) and a point exactly
    # eps from a core of EACH; with min_pts=4 it stays non-core (2
    # neighbors + self) and the deterministic rule assigns the MIN
    # cluster id (1), independent of any scan order
    pts = [(1, 0, 0), (2, 1, 0), (3, 2, 0), (4, 1, 1),
           (5, 6, 0), (6, 7, 0), (7, 8, 0), (8, 7, 1),
           (9, 4, 0)]
    got = {r.id: (r.role, r.cluster_id)
           for r in dbscan_grid(_rows(spark, pts), 2, 4).collect()}
    assert got[9] == ("border", 1)
    assert {got[i] for i in (1, 2, 3, 4)} == {("core", 1)}
    assert {got[i] for i in (5, 6, 7, 8)} == {("core", 5)}


def test_dbscan_singleton_core(spark):
    # min_pts=1: every point is trivially core (itself); an edge-less
    # core is its own singleton cluster
    pts = [(7, 0, 0), (9, 50, 50)]
    got = {r.id: (r.role, r.cluster_id)
           for r in dbscan_grid(_rows(spark, pts), 2, 1).collect()}
    assert got == {7: ("core", 7), 9: ("core", 9)}


def test_dbscan_min_pts_guard(spark):
    with pytest.raises(ValueError):
        dbscan_grid(_rows(spark, [(1, 0, 0)]), 2, 0)


def test_power_iteration_hand_case(spark):
    # diagonal Gram: two copies of e1, one e2 -> G = diag(2s, s) with
    # s = 4096^2; each round halves the second component's ratio, so
    # after 4 rounds v = (1e6, 62500); Rayleigh recomputed here with
    # explicit integer arithmetic (trunc division, as documented)
    from frogocr_spark.operators.similarity import power_iteration_int
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    rows = (power_iteration_int(df, use_dims=2, iters=4)
            .orderBy("i").collect())
    assert [r.component_e6 for r in rows] == [1000000, 62500]
    s = 4096 * 4096
    num = (10**6 * (2 * s * 10**6) + 62500 * (s * 62500)) * 10**6
    den = 10**12 + 62500 * 62500
    assert rows[0].rayleigh_e6 == num // den  # positive: trunc == floor
    assert rows[0].rayleigh_e6 == rows[1].rayleigh_e6


def test_power_iteration_guards(spark):
    from frogocr_spark.operators.similarity import power_iteration_int
    df = spark.createDataFrame([(1, [0.0, 0.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        power_iteration_int(df, use_dims=2, iters=0)
    with pytest.raises(ValueError, match="zero"):
        power_iteration_int(df, use_dims=2, iters=2)


def test_tdiv_matches_duckdb_trunc_semantics():
    import duckdb

    from frogocr_spark.operators.similarity import _tdiv
    con = duckdb.connect()
    for a in (-7, -1, 0, 1, 7, -1000001, 999999):
        got = con.execute(f"SELECT CAST({a} AS HUGEINT) // 2").fetchone()[0]
        assert _tdiv(a, 2) == int(got)


def test_silhouette_hand_case(spark):
    # ids 1..4, md5-order seeds are ids 4 and 1 (a87.. < c4c..); after
    # one Lloyd round the centroids are hand-derivable: c0 = [100000,
    # 100001] (floor mean of ids 3,4), c1 = [0, 1] (ids 1,2); expected
    # a/b/s recomputed below with explicit integer arithmetic
    from frogocr_spark.operators.clustering import kmeans_silhouette
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0002]),
         (3, [10.0, 10.0]), (4, [10.0, 10.0002])],
        "vec_id long, embedding array<float>")
    got = {r.cluster: (r.n_members, r.mean_s_e6)
           for r in kmeans_silhouette(df, k=2, iters=1).collect()}
    c0, c1 = [100000, 100001], [0, 1]
    qs = {1: [0, 0], 2: [0, 2], 3: [100000, 100000],
          4: [100000, 100002]}

    def d2(q, c):
        return (q[0] - c[0]) ** 2 + (q[1] - c[1]) ** 2

    exp = {0: [], 1: []}
    for q in qs.values():
        da, db = sorted((d2(q, c0), d2(q, c1)))
        cl = 0 if d2(q, c0) <= d2(q, c1) else 1
        exp[cl].append((db - da) * 10**6 // db)
    assert got == {cl: (len(v), sum(v) // len(v))
                   for cl, v in exp.items()}


def test_ari_identical_partitions(spark):
    # same k, same iters, same corpus -> identical partitions -> ARI
    # is exactly 1e6 and s_ij == s_a == s_b (= 2 * C(2,2) = 2)
    from frogocr_spark.operators.clustering import kmeans_agreement_ari
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0002]),
         (3, [10.0, 10.0]), (4, [10.0, 10.0002])],
        "vec_id long, embedding array<float>")
    r = kmeans_agreement_ari(df, k_a=2, k_b=2, iters=2).collect()[0]
    assert (r.n, r.s_ij, r.s_a, r.s_b) == (4, 2, 2, 2)
    assert r.ari_e6 == 1_000_000


def test_ari_degenerate_single_cluster_convention(spark):
    # all points identical: both runs collapse to one non-empty
    # cluster -> denominator 0 -> ARI defined as 1e6
    from frogocr_spark.operators.clustering import kmeans_agreement_ari
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(1, 5)],
        "vec_id long, embedding array<float>")
    r = kmeans_agreement_ari(df, k_a=2, k_b=2, iters=1).collect()[0]
    assert (r.s_ij, r.s_a, r.s_b) == (6, 6, 6)
    assert r.ari_e6 == 1_000_000


def test_silhouette_k_guard(spark):
    from frogocr_spark.operators.clustering import kmeans_silhouette
    df = spark.createDataFrame([(1, [0.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans_silhouette(df, k=1, iters=1)
