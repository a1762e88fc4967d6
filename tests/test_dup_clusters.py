"""Connected-components duplicate clustering vs a union-find oracle."""

import pytest

from frogocr_spark.operators.dedup import dup_clusters


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("pairs", [
    [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
    [(i, i + 1) for i in range(12)],          # one chain (worst-case diameter)
    [(5, 9), (1, 5), (9, 40), (40, 2)],
])
def test_clusters_match_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dup_clusters(df, max_iters=20).collect()}
    expect = _union_find(pairs)
    assert got == expect


def test_keep_canonical_per_cluster(spark):
    pairs = spark.createDataFrame([(3, 7), (7, 9), (100, 101)],
                                  "id_a long, id_b long")
    got = dup_clusters(pairs).collect()
    clusters = {}
    for r in got:
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    assert sorted(clusters[3]) == [3, 7, 9]
    assert sorted(clusters[100]) == [100, 101]
    # canonical = min id = cluster_id itself
    for cid, members in clusters.items():
        assert cid == min(members)


# ---------------------------------------------------------------------------
# large-star/small-star variant (O(log n) rounds, diameter-independent)
# ---------------------------------------------------------------------------

from frogocr_spark.operators.dedup import dup_clusters_star


@pytest.mark.parametrize("pairs", [
    [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
    [(i, i + 1) for i in range(12)],
    [(5, 9), (1, 5), (9, 40), (40, 2)],
    [(7, 3)],                                  # single pair
])
def test_star_clusters_match_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dup_clusters_star(df, driver_finish_edges=0).collect()}
    assert got == _union_find(pairs)


def test_star_handles_deep_chain_in_log_rounds(spark):
    """A 120-node chain has diameter 120: min-label propagation would need
    ~120 rounds, the star algorithm must finish within max_iters=8."""
    pairs = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dup_clusters_star(df, max_iters=8,
                                      driver_finish_edges=0).collect()}
    assert got == {i: 0 for i in range(121)}


def test_star_matches_propagation_variant(spark):
    pairs = [(3, 7), (7, 9), (100, 101), (55, 54), (54, 9)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    a = sorted((r.doc_id, r.cluster_id) for r in dup_clusters(df).collect())
    b = sorted((r.doc_id, r.cluster_id)
               for r in dup_clusters_star(df, driver_finish_edges=0).collect())
    assert a == b


def test_star_hybrid_driver_finish_matches_distributed(spark):
    """The hybrid collect+union-find finish (default) must equal the
    forced fully-distributed star iteration on the same graph."""
    pairs = [(i, i + 1) for i in range(60)] + [(100, 200), (200, 300)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    hybrid = sorted((r.doc_id, r.cluster_id)
                    for r in dup_clusters_star(df).collect())
    dist = sorted((r.doc_id, r.cluster_id)
                  for r in dup_clusters_star(
                      df, driver_finish_edges=0).collect())
    assert hybrid == dist


def test_resolve_duplicates_keeps_min_and_unpaired(spark):
    from frogocr_spark.operators.dedup import resolve_duplicates
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)],
                                  "id_a long, id_b long")
    kept = sorted(r.doc_id for r in resolve_duplicates(docs, pairs).collect())
    # component {1,2,3} -> keep 1; {7,8} -> keep 7; unpaired 0,4,5,6,9 kept
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_star_raises_instead_of_silent_nonconvergence(spark):
    """max_iters exhausted with edges above the driver budget must raise
    (never emit intermediate labels as if converged)."""
    import pytest as _pytest

    pairs = [(i, i + 1) for i in range(80)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters_star(df, max_iters=1, driver_finish_edges=0)
    # same graph, same round budget, but a driver budget that fits:
    # finishes exactly via the local path
    got = {r.doc_id: r.cluster_id
           for r in dup_clusters_star(df, max_iters=1,
                                      driver_finish_edges=10_000).collect()}
    assert got == {i: 0 for i in range(81)}
