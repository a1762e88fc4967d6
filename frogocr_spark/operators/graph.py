"""Iterative graph algorithms over edge DataFrames — integer-exact
PageRank.

This is the second iterative-distributed-algorithm surface next to the
connected-components operator (operators/dedup.py star-contraction):
power iteration over a directed graph, the shape used for page/domain
authority scoring when ranking a crawl before curation.

Determinism is the design constraint: float PageRank sums per-node
contributions in WHATEVER order the shuffle delivers them, so two runs
(or two engines) disagree in the last ulp and a value-hash check is
impossible.  Here scores are INTEGERS (initial mass ``scale`` per
node) and every step is integer arithmetic:

- contribution = ``score DIV out_degree``  (truncating integer div —
  all scores non-negative, so trunc == floor in every engine);
- update   = ``base + (damp_num · Σ contrib) DIV damp_den`` with
  ``base = (scale · (damp_den − damp_num)) DIV damp_den`` — the
  d = damp_num/damp_den damping factor as an exact rational.

Integer addition is associative/commutative, so the aggregation is
order-independent: same result under any partitioning, any engine.
Overflow headroom: Σ contrib ≤ N·scale, so ``damp_num · Σ`` needs
``N·scale·damp_num < 2^63`` — with the default scale 10^12 and
damp 85/100 that allows ~10^5 nodes; pass a smaller ``scale`` for
bigger graphs (raises if the bound is violated when ``n_nodes`` is
supplied).

Semantics notes (documented variants, mirrored exactly by the SQL
oracle): mass lost to ``DIV`` truncation and to dangling nodes (no
out-edges) is dropped, not redistributed — per-iteration mass is not
conserved, as in the common "toy" PR formulation; nodes with no
in-edges settle at ``base``.

Scale shape: per iteration ONE equi-join (edges ⋈ scores, keyed on
src) and ONE keyed aggregation (keyed on dst, map-side combined — a
high-in-degree hub partial-aggregates in every task).  The score
relation is node-sized, edges are scanned once per iteration, nothing
is ever collected to the driver, and the iteration count is a fixed
plan depth (no driver-side convergence loop in the contract path).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def pagerank_int(edges: DataFrame, iters: int = 3,
                 scale: int = DEFAULT_SCALE,
                 damp_num: int = 85, damp_den: int = 100,
                 n_nodes_hint: int | None = None) -> DataFrame:
    """Integer-exact PageRank over distinct directed ``(src, dst)``
    edges.  Returns ``(node, score)`` with ``score`` a BIGINT — the
    exact same integers any engine computes.

    ``edges`` must be duplicate-free (dedupe upstream: multi-edges
    would double-count contributions)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damp_num < damp_den:
        raise ValueError(f"need 0 < damp_num < damp_den, "
                         f"got {damp_num}/{damp_den}")
    if n_nodes_hint is not None and n_nodes_hint * scale * damp_num >= 2**63:
        raise ValueError(
            f"overflow risk: n_nodes*scale*damp_num = "
            f"{n_nodes_hint * scale * damp_num} >= 2^63; lower scale")
    base = (scale * (damp_den - damp_num)) // damp_den

    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # degree rides WITH the edge list: joined once, reused every iteration
    edges_deg = edges.join(out_deg, "src")

    scores = nodes.select("node", F.lit(scale).cast("long").alias("score"))
    for _ in range(iters):
        contrib = (edges_deg
                   .join(scores, edges_deg["src"] == scores["node"])
                   .select(F.col("dst").alias("node"),
                           F.expr("score DIV out_deg").alias("c"))
                   .groupBy("node")
                   .agg(F.sum("c").alias("in_mass")))
        scores = (nodes.join(contrib, "node", "left")
                  .select("node",
                          (F.lit(base)
                           + F.expr(f"(coalesce(in_mass, 0L) * "
                                    f"{damp_num}) DIV {damp_den}"))
                          .cast("long").alias("score")))
    return scores


def pagerank_int_oracle_sql(edges_sql: str, iters: int = 3,
                            scale: int = DEFAULT_SCALE,
                            damp_num: int = 85,
                            damp_den: int = 100) -> str:
    """The DuckDB twin: chained CTEs computing the IDENTICAL integers
    (``//`` truncates like Spark's ``DIV`` on non-negative values).
    ``edges_sql`` must yield distinct (src, dst)."""
    base = (scale * (damp_den - damp_num)) // damp_den
    sql = [f"WITH e AS ({edges_sql}),"]
    sql.append("nodes AS (SELECT src AS node FROM e "
               "UNION SELECT dst FROM e),")
    sql.append("deg AS (SELECT src, count(*) AS out_deg FROM e "
               "GROUP BY src),")
    sql.append("ed AS (SELECT e.src, e.dst, deg.out_deg FROM e "
               "JOIN deg USING (src)),")
    sql.append(f"it0 AS (SELECT node, CAST({scale} AS BIGINT) AS score "
               f"FROM nodes),")
    for i in range(1, iters + 1):
        sql.append(
            f"m{i} AS (SELECT ed.dst AS node, "
            f"CAST(sum(s.score // ed.out_deg) AS BIGINT) AS in_mass "
            f"FROM ed JOIN it{i-1} s ON ed.src = s.node "
            f"GROUP BY ed.dst),")
        sql.append(
            f"it{i} AS (SELECT n.node, CAST({base} + "
            f"(COALESCE(m.in_mass, 0) * {damp_num}) // {damp_den} "
            f"AS BIGINT) AS score "
            f"FROM nodes n LEFT JOIN m{i} m USING (node)),")
    sql[-1] = sql[-1].rstrip(",")
    sql.append(f"SELECT node, score FROM it{iters}")
    return "\n".join(sql)


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected graph (the local
    clustering-coefficient numerator; the classic multi-way-join
    distributed-graph benchmark).  Input: an edge list in ANY mix of
    directions/duplicates/self-loops — normalized to a canonical
    undirected simple graph first.

    Scale shape — degree orientation, the standard trick: every edge is
    oriented from its lower-(degree, id) endpoint to the higher one, so
    each triangle is enumerated EXACTLY once as a path u→v→w plus one
    closing-edge semi-join, and a high-degree hub never fans out as a
    join source (out-degree under this orientation is bounded by
    O(sqrt(|E|)) / graph arboricity — the wedge count collapses from
    Σ deg² to Σ oriented-deg², the difference between infeasible and
    linear-ish on power-law graphs).  Two equi-joins + one broadcastable
    degree join; no cartesian anywhere.  Output: ``(node, n_triangles)``
    for every node of the graph (0 for triangle-free nodes)."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v"))
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    nodes = (und.select(F.col("u").alias("node"))
             .unionByName(und.select(F.col("v").alias("node")))
             .dropDuplicates(["node"]))
    deg = (und.select(F.col("u").alias("node"))
           .unionByName(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    # orient by (deg, id): a -> b iff (deg_a, a) < (deg_b, b)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    oriented = (und.join(du, "u").join(dv, "v")
                .select(
                    F.when((F.col("du") < F.col("dv"))
                           | ((F.col("du") == F.col("dv"))
                              & (F.col("u") < F.col("v"))),
                           F.struct(F.col("u").alias("a"),
                                    F.col("v").alias("b")))
                    .otherwise(F.struct(F.col("v").alias("a"),
                                        F.col("u").alias("b")))
                    .alias("e"))
                .select("e.a", "e.b"))
    # wedges a->b, a->c (b < c by id to de-duplicate the unordered pair)
    e1 = oriented.select(F.col("a"), F.col("b"))
    e2 = oriented.select(F.col("a"), F.col("b").alias("c"))
    wedges = (e1.join(e2, "a").where(F.col("b") < F.col("c")))
    # closing edge: (b, c) present in the UNDIRECTED canonical set
    closing = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    per_node = (tris.select(F.explode(F.array("a", "b", "c"))
                            .alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri")))
    return (nodes.join(per_node, "node", "left")
            .select("node",
                    F.coalesce(F.col("n_tri"), F.lit(0)).cast("long")
                    .alias("n_triangles")))


def triangle_counts_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin: canonicalize, orient by (degree, id), wedge join +
    closing-edge join, explode the three corners — identical semantics,
    so the hash match proves the degree-oriented plan equivalent to the
    textbook definition."""
    return f"""
        WITH raw AS ({edges_sql}),
        und AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ), nodes AS (
            SELECT DISTINCT node FROM (
                SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        ), deg AS (
            SELECT node, COUNT(*) AS d FROM (
                SELECT u AS node FROM und UNION ALL SELECT v FROM und)
            GROUP BY node
        ), oriented AS (
            SELECT CASE WHEN (da.d < db.d)
                             OR (da.d = db.d AND und.u < und.v)
                        THEN und.u ELSE und.v END AS a,
                   CASE WHEN (da.d < db.d)
                             OR (da.d = db.d AND und.u < und.v)
                        THEN und.v ELSE und.u END AS b
            FROM und JOIN deg da ON da.node = und.u
                     JOIN deg db ON db.node = und.v
        ), tris AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a
            WHERE e1.b < e2.b
              AND EXISTS (SELECT 1 FROM und
                          WHERE und.u = e1.b AND und.v = e2.b)
        ), corners AS (
            SELECT unnest([a, b, c]) AS node FROM tris
        ), cnt AS (
            SELECT node, COUNT(*) AS n FROM corners GROUP BY node
        )
        SELECT nodes.node, CAST(COALESCE(cnt.n, 0) AS BIGINT)
               AS n_triangles
        FROM nodes LEFT JOIN cnt USING (node)
    """


def kcore(edges: DataFrame, k: int, rounds: int | None = None,
          src: str = "src", dst: str = "dst",
          max_rounds: int = 100) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    every node whose degree in the SURVIVING graph is < ``k`` until no
    node changes (the classic community-density / spam-farm filter;
    Seidman 1983).  Input: an edge list in any mix of directions /
    duplicates / self-loops — normalized to a canonical undirected
    simple graph first (same contract as :func:`triangle_counts`).

    Two modes:

    - ``rounds=None`` (default): peel to the FIXPOINT with an
      early-exit driver loop (one O(1)-row count job per round —
      eager, like the star-contraction CC loop in operators/dedup.py);
      raises after ``max_rounds`` without convergence.
    - ``rounds=R``: run EXACTLY R peel rounds as a fixed plan depth —
      peeling is monotone (each round's survivor set shrinks or is
      stable), so extra rounds past the fixpoint are no-ops and an
      R-round run equals the true k-core whenever convergence happens
      within R.  This is the contract-query mode: the DuckDB oracle
      (:func:`kcore_oracle_sql`) unrolls the identical R rounds, so a
      hash match proves the distributed peel equivalent.

    Scale shape: per round ONE degree aggregation (map-side combined,
    node-sized output) + TWO left-semi equi-joins restricting edges to
    surviving endpoints — everything keyed, nothing collected, the
    edge relation only ever shrinks.  ``localCheckpoint`` per round
    cuts the lineage so plan depth stays constant (eager — documented
    per the global_rank precedent).  Output: ``(node, core_degree)``
    for every node of the k-core (its degree WITHIN the core, ≥ k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v")
           .select(F.least("u", "v").alias("u"),
                   F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    cur = und.localCheckpoint()
    n_rounds = rounds if rounds is not None else max_rounds
    prev_edges = cur.count() if rounds is None else None
    for _ in range(n_rounds):
        deg = (cur.select(F.col("u").alias("node"))
               .unionByName(cur.select(F.col("v").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
        alive = deg.where(F.col("d") >= k).select("node")
        cur = (cur
               .join(alive.withColumnRenamed("node", "u"), "u",
                     "left_semi")
               .join(alive.withColumnRenamed("node", "v"), "v",
                     "left_semi")
               .localCheckpoint())
        if rounds is None:
            n = cur.count()
            if n == prev_edges:
                break
            prev_edges = n
    else:
        if rounds is None:
            raise RuntimeError(
                f"kcore did not converge within max_rounds={max_rounds}")
    return (cur.select(F.col("u").alias("node"))
            .unionByName(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("core_degree")))


def kcore_oracle_sql(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB twin of ``kcore(..., rounds=R)``: the peel unrolled as a
    chain of plain CTEs (recursive CTEs cannot reference the working
    table twice, which the two-endpoint restriction needs — same
    unrolling pattern as :func:`pagerank_int_oracle_sql`)."""
    sql = [f"WITH raw AS ({edges_sql}),"]
    sql.append("e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
               "greatest(src, dst) AS v FROM raw WHERE src <> dst),")
    for i in range(1, rounds + 1):
        sql.append(
            f"d{i} AS MATERIALIZED (SELECT node, count(*) AS d FROM ("
            f"SELECT u AS node FROM e{i-1} UNION ALL "
            f"SELECT v FROM e{i-1}) GROUP BY node),")
        sql.append(
            f"a{i} AS MATERIALIZED (SELECT node FROM d{i} "
            f"WHERE d >= {k}),")
        sql.append(
            f"e{i} AS MATERIALIZED (SELECT e.u, e.v FROM e{i-1} e "
            f"JOIN a{i} x ON e.u = x.node "
            f"JOIN a{i} y ON e.v = y.node),")
    sql[-1] = sql[-1].rstrip(",")
    sql.append(
        f"SELECT node, CAST(count(*) AS BIGINT) AS core_degree FROM ("
        f"SELECT u AS node FROM e{rounds} UNION ALL "
        f"SELECT v FROM e{rounds}) GROUP BY node")
    return "\n".join(sql)


def bfs_levels(edges: DataFrame, seeds: DataFrame, rounds: int,
               src: str = "src", dst: str = "dst",
               seed_col: str = "node") -> DataFrame:
    """Multi-source BFS over an undirected graph: every node reachable
    from the seed set within ``rounds`` hops, labeled with its MINIMUM
    hop distance — the influence-propagation / blast-radius primitive
    (abuse spread, contamination reach, social distance).

    Fixed plan depth: exactly ``rounds`` expansion rounds (matching the
    oracle's unrolled CTE chain — :func:`bfs_levels_oracle_sql`); BFS
    levels are monotone under expansion, so rounds past the eccentricity
    are no-ops, and the R-round result equals true min-distance for
    every node within R hops (nodes further out are absent, by
    contract).

    Scale shape: per round ONE equi-join (frontier ⋈ edges, keyed on
    the node) + one min-agg merge (map-side combined) — the classic
    Pregel step as DataFrame ops; ``localCheckpoint`` per round keeps
    plan depth constant.  Output: ``(node, level)``."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v"))
    bi = und.unionByName(und.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
    bi = bi.dropDuplicates(["u", "v"]).localCheckpoint()
    levels = (seeds.select(F.col(seed_col).alias("node"))
              .dropDuplicates()
              .withColumn("level", F.lit(0).cast("int"))
              .localCheckpoint())
    for i in range(1, rounds + 1):
        frontier = levels.where(F.col("level") == i - 1)
        nxt = (frontier
               .join(bi, frontier["node"] == bi["u"])
               .select(F.col("v").alias("node"),
                       F.lit(i).cast("int").alias("level")))
        levels = (levels.unionByName(nxt)
                  .groupBy("node")
                  .agg(F.min("level").cast("int").alias("level"))
                  .localCheckpoint())
    return levels


def bfs_levels_oracle_sql(edges_sql: str, seeds_sql: str,
                          rounds: int) -> str:
    """DuckDB twin: the identical fixed-round expansion unrolled as a
    MATERIALIZED CTE chain (the :func:`kcore_oracle_sql` pattern —
    min-merge per round, so the hash match proves the Pregel-style
    plan computes true min hop distances)."""
    sql = [f"WITH raw AS ({edges_sql}),"]
    sql.append("bi AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
               "SELECT src AS u, dst AS v FROM raw WHERE src <> dst "
               "UNION ALL "
               "SELECT dst, src FROM raw WHERE src <> dst)),")
    sql.append(f"l0 AS MATERIALIZED (SELECT DISTINCT node, "
               f"0 AS level FROM ({seeds_sql})),")
    for i in range(1, rounds + 1):
        sql.append(
            f"l{i} AS MATERIALIZED (SELECT node, min(level) AS level "
            f"FROM (SELECT node, level FROM l{i-1} UNION ALL "
            f"SELECT bi.v AS node, {i} AS level FROM l{i-1} f "
            f"JOIN bi ON f.node = bi.u AND f.level = {i-1}) "
            f"GROUP BY node),")
    sql[-1] = sql[-1].rstrip(",")
    sql.append(f"SELECT node, CAST(level AS INT) AS level "
               f"FROM l{rounds}")
    return "\n".join(sql)


def modularity_by_community(edges: DataFrame, comm: DataFrame,
                            node_col: str = "node",
                            comm_col: str = "community",
                            src: str = "src",
                            dst: str = "dst") -> DataFrame:
    """Newman modularity INGREDIENTS of a node partition over an
    undirected simple graph — the standard partition-quality metric
    (community detection's objective).  Emitted as exact integers so
    any engine agrees:  per community ``n_nodes, degree_sum (d_c),
    internal_edges (e_c), m`` — Q = Σ_c (e_c/m − (d_c/2m)²) is a fixed
    float finish the consumer derives.

    Scale shape: degrees = one edge-explode + node-keyed agg; community
    decoration = two node-keyed equi-joins of the edge list against the
    node-bounded community table; internal-edge and degree rollups are
    map-side-combined keyed aggs.  Nodes missing from ``comm`` are
    dropped (inner semantics), nodes in ``comm`` without edges count
    with degree 0.  PRECONDITION: ``comm`` has exactly one row per
    node — duplicate node rows would fan out both joins and silently
    double-count degrees (callers derive comm from a groupBy/rank,
    which guarantees it)."""
    e = (edges.select(F.least(src, dst).alias("u"),
                      F.greatest(src, dst).alias("v"))
         .where(F.col("u") != F.col("v")).distinct())
    cm = comm.select(F.col(node_col).alias("_n"),
                     F.col(comm_col).alias("_c"))
    deg = (e.select(F.col("u").alias("_n"))
           .unionAll(e.select(F.col("v").alias("_n")))
           .groupBy("_n").agg(F.count(F.lit(1)).alias("_deg")))
    nodes = (cm.join(deg, "_n", "left")
             .select("_c", F.coalesce("_deg", F.lit(0)).alias("_deg")))
    per_comm = (nodes.groupBy("_c")
                .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                     F.sum("_deg").cast("long").alias("degree_sum")))
    cu = cm.select(F.col("_n").alias("u"), F.col("_c").alias("_cu"))
    cv = cm.select(F.col("_n").alias("v"), F.col("_c").alias("_cv"))
    internal = (e.join(cu, "u").join(cv, "v")
                .where(F.col("_cu") == F.col("_cv"))
                .groupBy(F.col("_cu").alias("_c"))
                .agg(F.count(F.lit(1)).cast("long")
                     .alias("internal_edges")))
    m = e.count()
    return (per_comm.join(internal, "_c", "left")
            .select(F.col("_c").alias("community"), "n_nodes",
                    "degree_sum",
                    F.coalesce("internal_edges", F.lit(0)).cast("long")
                    .alias("internal_edges"),
                    F.lit(int(m)).cast("long").alias("m")))


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Degree-assortativity INGREDIENTS of an undirected simple graph —
    the Pearson correlation of degrees across edge endpoints (Newman
    2002; do hubs attach to hubs?).  Composes the repo's exact-decimal
    moment machinery: per edge BOTH orientations (deg_u, deg_v) and
    (deg_v, deg_u) feed :func:`~frogocr_spark.operators.analytics.
    moment_stats_exact` — all five sufficient sums are DECIMAL(38,0)
    exact, so the correlation hash-matches any engine regardless of
    partitioning.  Symmetrization makes mean_x == mean_y by
    construction (a free internal consistency check).

    Scale shape: one edge-explode + node-keyed degree agg, two
    node-keyed joins to decorate endpoints, one map-side-combined
    moments agg.  Output: ONE row — ``n (2m), mean_x, var_x, mean_y,
    var_y, corr_xy`` (6 dp)."""
    from frogocr_spark.operators.analytics import moment_stats_exact

    e = (edges.select(F.least(src, dst).alias("u"),
                      F.greatest(src, dst).alias("v"))
         .where(F.col("u") != F.col("v")).distinct())
    deg = (e.select(F.col("u").alias("_n"))
           .unionAll(e.select(F.col("v").alias("_n")))
           .groupBy("_n").agg(F.count(F.lit(1)).alias("_deg")))
    du = deg.select(F.col("_n").alias("u"), F.col("_deg").alias("du"))
    dv = deg.select(F.col("_n").alias("v"), F.col("_deg").alias("dv"))
    pairs = e.join(du, "u").join(dv, "v")
    both = (pairs.select(F.col("du").alias("x"), F.col("dv").alias("y"))
            .unionAll(pairs.select(F.col("dv").alias("x"),
                                   F.col("du").alias("y"))))
    return (moment_stats_exact(
        both.withColumn("_g", F.lit("all")), F.col("x"), F.col("y"),
        "_g").drop("_g"))


def label_propagation(edges: DataFrame, rounds: int,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) over an undirected
    graph: every node starts labeled with its own id; each round every
    node adopts the most frequent label among its neighbors AND itself
    (the self-vote damps the classic bipartite two-cycle), ties broken
    by the SMALLEST label — a fully deterministic, seedless variant of
    the usual random-order LPA, so two engines (and two cluster
    topologies) compute the identical communities.

    Fixed plan depth: exactly ``rounds`` sync rounds, matching the
    oracle's unrolled CTE chain (:func:`label_propagation_oracle_sql`)
    — the contract-query mode, same design as :func:`kcore` /
    :func:`bfs_levels`.  LPA is not monotone, so the R-round result is
    defined AS the R-round result (both sides run the identical chain).

    Scale shape: per round ONE equi-join (labels ⋈ edges, keyed on the
    node — the Pregel gather) + ONE (node, label)-keyed count
    (map-side combined: a hub's votes partial-aggregate in every task)
    + ONE node-keyed ``max_by`` argmax (map-side combined as well).
    The label relation stays node-sized; edges are scanned once per
    round; nothing is collected; ``localCheckpoint`` per round keeps
    the plan depth constant.  Output: ``(node, label)``."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v")
           .select(F.least("u", "v").alias("u"),
                   F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    bi = (und.unionByName(und.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
          .localCheckpoint())
    labels = (bi.select(F.col("u").alias("node")).dropDuplicates()
              .withColumn("label", F.col("node"))
              .localCheckpoint())
    for _ in range(rounds):
        nbr = (labels.join(bi, labels["node"] == bi["u"])
               .select(F.col("v").alias("node"), "label"))
        votes = (nbr.unionByName(labels.select("node", "label"))
                 .groupBy("node", "label")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        labels = (votes.groupBy("node")
                  .agg(F.expr("max_by(label, struct(cnt, -label))")
                       .alias("label"))
                  .localCheckpoint())
    return labels


def label_propagation_oracle_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB twin: the identical sync-LPA rounds unrolled as a
    MATERIALIZED CTE chain; the argmax is restated as max-count +
    min-label-among-max (provably the same as ``max_by(label,
    struct(cnt, -label))``), so a hash match proves the distributed
    gather/argmax equivalent."""
    sql = [f"WITH raw AS ({edges_sql}),"]
    sql.append("und AS MATERIALIZED (SELECT DISTINCT least(src, dst) "
               "AS u, greatest(src, dst) AS v FROM raw "
               "WHERE src <> dst),")
    sql.append("bi AS MATERIALIZED (SELECT u, v FROM und UNION ALL "
               "SELECT v, u FROM und),")
    sql.append("l0 AS MATERIALIZED (SELECT DISTINCT u AS node, "
               "u AS label FROM bi),")
    for i in range(1, rounds + 1):
        sql.append(
            f"v{i} AS MATERIALIZED (SELECT node, label, "
            f"count(*) AS cnt FROM ("
            f"SELECT bi.v AS node, l.label FROM l{i-1} l "
            f"JOIN bi ON l.node = bi.u "
            f"UNION ALL SELECT node, label FROM l{i-1}) "
            f"GROUP BY node, label),")
        sql.append(
            f"m{i} AS MATERIALIZED (SELECT node, max(cnt) AS mc "
            f"FROM v{i} GROUP BY node),")
        sql.append(
            f"l{i} AS MATERIALIZED (SELECT v.node, min(v.label) "
            f"AS label FROM v{i} v JOIN m{i} m "
            f"ON v.node = m.node AND v.cnt = m.mc GROUP BY v.node),")
    sql[-1] = sql[-1].rstrip(",")
    sql.append(f"SELECT node, label FROM l{rounds}")
    return "\n".join(sql)


def sssp_int(edges: DataFrame, seeds: DataFrame, rounds: int,
             src: str = "src", dst: str = "dst", weight: str = "w",
             seed_col: str = "node") -> DataFrame:
    """Multi-source single-source-shortest-paths over an undirected
    graph with non-negative INTEGER edge weights — distributed
    Bellman-Ford relaxation, the weighted generalization of
    :func:`bfs_levels` (latency maps, influence cost, hop-weighted
    blast radius).

    Integer distances make the min-merge order-independent and
    engine-exact (float weight sums would tie-break differently in the
    last ulp).  Fixed plan depth: exactly ``rounds`` relaxation rounds
    — after R rounds every node whose true shortest path uses ≤ R
    edges carries its final distance (Bellman-Ford invariant), and the
    oracle (:func:`sssp_int_oracle_sql`) unrolls the identical chain.

    Scale shape: per round ONE equi-join (distances ⋈ edges, keyed on
    the node) + ONE min-merge (map-side combined); distance relation
    node-sized; ``localCheckpoint`` per round.  Negative weights raise.
    Output: ``(node, dist)`` for nodes reached within ``rounds``."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                        F.col(weight).cast("long").alias("w"))
           .where("u <> v"))
    bi = (und.unionByName(und.select(F.col("v").alias("u"),
                                     F.col("u").alias("v"), "w"))
          .groupBy("u", "v").agg(F.min("w").alias("w"))
          .localCheckpoint())
    dist = (seeds.select(F.col(seed_col).alias("node"))
            .dropDuplicates()
            .withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint())
    for _ in range(rounds):
        relax = (dist.join(bi, dist["node"] == bi["u"])
                 .select(F.col("v").alias("node"),
                         (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relax)
                .groupBy("node")
                .agg(F.min("dist").cast("long").alias("dist"))
                .localCheckpoint())
    return dist


def sssp_int_oracle_sql(edges_sql: str, seeds_sql: str,
                        rounds: int) -> str:
    """DuckDB twin of :func:`sssp_int`: the relaxation unrolled as a
    MATERIALIZED min-merge CTE chain (the :func:`bfs_levels_oracle_sql`
    pattern with weighted candidates)."""
    sql = [f"WITH raw AS ({edges_sql}),"]
    sql.append("bi AS MATERIALIZED (SELECT u, v, min(w) AS w FROM ("
               "SELECT src AS u, dst AS v, w FROM raw WHERE src <> dst "
               "UNION ALL SELECT dst, src, w FROM raw "
               "WHERE src <> dst) GROUP BY u, v),")
    sql.append(f"d0 AS MATERIALIZED (SELECT DISTINCT node, "
               f"CAST(0 AS BIGINT) AS dist FROM ({seeds_sql})),")
    for i in range(1, rounds + 1):
        sql.append(
            f"d{i} AS MATERIALIZED (SELECT node, min(dist) AS dist "
            f"FROM (SELECT node, dist FROM d{i-1} UNION ALL "
            f"SELECT bi.v AS node, f.dist + bi.w AS dist "
            f"FROM d{i-1} f JOIN bi ON f.node = bi.u) "
            f"GROUP BY node),")
    sql[-1] = sql[-1].rstrip(",")
    sql.append(f"SELECT node, CAST(dist AS BIGINT) AS dist "
               f"FROM d{rounds}")
    return "\n".join(sql)


def jaccard_link_prediction(edges: DataFrame, k: int = 50,
                            src: str = "src", dst: str = "dst",
                            max_center_degree: int | None = None
                            ) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg
    2003): for every NON-adjacent pair sharing >= 1 neighbor, the exact
    scaled score

        jaccard_e6 = common * 10^6 DIV (deg_a + deg_b - common)

    and the global top ``k`` by (jaccard_e6 desc, a asc, b asc) — the
    "who should be connected next" primitive of recommendation and
    graph-completion pipelines, integer-exact so the k-cut can never
    flip on a float ulp.

    Scale shape: candidate pairs are enumerated FROM THE CENTER — each
    node emits its neighbor pairs (a < b), so the cost is exactly
    Sigma deg(n)^2/2 wedges (the unavoidable price of EXACT common
    -neighbor counts; degree orientation cannot apply because every
    wedge must be counted, not each triangle once).  On power-law
    graphs ``max_center_degree`` caps the hub fanout (wedges through
    mega-hubs carry near-zero Jaccard anyway — standard hub
    suppression; the oracle must apply the same cap).  One
    neighbor-list agg -> one pair count (map-side combined) -> degree
    decoration joins -> LeftAnti vs the edge set -> TakeOrdered k.
    Output: ``(a, b, common, deg_a, deg_b, jaccard_e6)``."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v"))
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    adj = (und.select(F.col("u").alias("n"), F.col("v").alias("x"))
           .unionByName(und.select(F.col("v").alias("n"),
                                   F.col("u").alias("x"))))
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj
    if max_center_degree is not None:
        keep = deg.where(F.col("deg") <= int(max_center_degree))
        centers = adj.join(F.broadcast(keep.select("n")), "n")
    left = centers.select("n", F.col("x").alias("a"))
    right = centers.select("n", F.col("x").alias("b"))
    pairs = (left.join(right, "n").where(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).alias("common")))
    nonadj = pairs.join(
        und.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"], "left_anti")
    scored = (nonadj
              .join(deg.select(F.col("n").alias("a"),
                               F.col("deg").alias("deg_a")), "a")
              .join(deg.select(F.col("n").alias("b"),
                               F.col("deg").alias("deg_b")), "b")
              .withColumn("jaccard_e6",
                          F.expr("(common * 1000000) DIV "
                                 "(deg_a + deg_b - common)")))
    return (scored.orderBy(F.col("jaccard_e6").desc(),
                           F.col("a").asc(), F.col("b").asc())
            .limit(int(k))
            .select("a", "b", F.col("common").cast("long").alias("common"),
                    F.col("deg_a").cast("long").alias("deg_a"),
                    F.col("deg_b").cast("long").alias("deg_b"),
                    "jaccard_e6"))


def jaccard_link_prediction_oracle_sql(edges_sql: str, k: int,
                                       max_center_degree: int | None = None
                                       ) -> str:
    """DuckDB twin of :func:`jaccard_link_prediction` — same center
    -enumerated wedges, same hub cap, same exact integer score."""
    cap = ""
    if max_center_degree is not None:
        cap = (f"JOIN deg dn ON adj.n = dn.n AND "
               f"dn.deg <= {int(max_center_degree)}")
    return f"""
        WITH raw AS ({edges_sql}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ), adj AS MATERIALIZED (
            SELECT u AS n, v AS x FROM und
            UNION ALL SELECT v, u FROM und
        ), deg AS MATERIALIZED (
            SELECT n, count(*) AS deg FROM adj GROUP BY n
        ), centers AS (
            SELECT adj.n, adj.x FROM adj {cap}
        ), pairs AS (
            SELECT l.x AS a, r.x AS b, count(*) AS common
            FROM centers l JOIN centers r
              ON l.n = r.n AND l.x < r.x
            GROUP BY 1, 2
        ), nonadj AS (
            SELECT p.* FROM pairs p
            WHERE NOT EXISTS (SELECT 1 FROM und
                              WHERE und.u = p.a AND und.v = p.b)
        )
        SELECT a, b, CAST(common AS BIGINT) AS common,
               CAST(da.deg AS BIGINT) AS deg_a,
               CAST(db.deg AS BIGINT) AS deg_b,
               CAST((common * 1000000) // (da.deg + db.deg - common)
                    AS BIGINT) AS jaccard_e6
        FROM nonadj
        JOIN deg da ON nonadj.a = da.n
        JOIN deg db ON nonadj.b = db.n
        ORDER BY jaccard_e6 DESC, a ASC, b ASC LIMIT {int(k)}
    """


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Local clustering coefficient per node: ``cc_e6 = 2 * triangles *
    10^6 DIV (deg * (deg - 1))`` — exact millionths over the degree
    -oriented :func:`triangle_counts` (each triangle enumerated once)
    and the canonical undirected degree; NULL for deg < 2 (undefined).
    The per-node "how clique-like is my neighborhood" signal used for
    community/spam structure audits.

    Scale shape: the triangle plan (two equi-joins, orientation-bounded
    fanout) plus ONE degree agg and a node-keyed join — nothing new
    shuffles wider than the node relation.  Output: ``(node, deg,
    n_triangles, cc_e6)``."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v"))
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    deg = (und.select(F.col("u").alias("node"))
           .unionByName(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    tri = triangle_counts(und, "u", "v")
    return (tri.join(deg, "node")
            .withColumn(
                "cc_e6",
                F.when(F.col("deg") >= 2,
                       F.expr("(2 * n_triangles * 1000000) DIV "
                              "(deg * (deg - 1))")))
            .select("node", F.col("deg").cast("long").alias("deg"),
                    "n_triangles", "cc_e6"))


def clustering_coefficient_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`clustering_coefficient`, reusing the
    triangle oracle (textbook wedge definition) + a degree join."""
    tri = triangle_counts_oracle_sql(edges_sql)
    return f"""
        WITH tri AS MATERIALIZED ({tri}),
        raw AS ({edges_sql}),
        und AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ), deg AS (
            SELECT n AS node, count(*) AS deg FROM (
                SELECT u AS n FROM und UNION ALL SELECT v FROM und
            ) GROUP BY 1
        )
        SELECT tri.node, CAST(deg AS BIGINT) AS deg, n_triangles,
               CASE WHEN deg >= 2 THEN
                    CAST((2 * n_triangles * 1000000) //
                         (deg * (deg - 1)) AS BIGINT) END AS cc_e6
        FROM tri JOIN deg ON tri.node = deg.node
    """


def two_hop_reach(edges: DataFrame, src: str = "src",
                  dst: str = "dst",
                  max_mid_degree: int | None = None,
                  precise_capped: bool = False) -> DataFrame:
    """Per-node 2-hop reach: how many DISTINCT other nodes are within
    ≤ 2 undirected hops — the friend-of-friend audience size of social
    /abuse analytics (and the k=2 slice of neighborhood growth).

    Scale shape: the 2-hop candidates are one adjacency self-join on
    the middle node — cost exactly Σ deg(n)² wedge instances, the same
    unavoidable bound as exact common-neighbor counting.  On power-law
    graphs ONE mega-hub makes one task quadratic (VERDICT r3 #2), so
    ``max_mid_degree`` caps the fanout the same way dedup's
    ``max_bucket`` caps hot LSH buckets: a node acting as the MIDDLE of
    a wedge exposes only its ``max_mid_degree`` smallest-id neighbors
    (deterministic truncation — a rank window per node, engine
    -portable), dropping the join bound to Σ deg(n)·min(deg(n), cap) —
    LINEAR in hub degree.  Hop-1 adjacency is never truncated, and
    every node keeps a row; rows whose 2-hop set may undercount (nodes
    adjacent to a capped hub) carry ``capped = true`` — the same
    honest-flagging contract as dedup's star expansion.

    Flag precision (VERDICT r4 #6): the default flag OVER-approximates
    — every hub-adjacent node is flagged, even one whose truncated
    wedge candidates were all reachable through kept paths anyway.
    ``precise_capped=True`` flags EXACTLY the nodes whose reported
    count undercounts: the truncated wedge candidates
    (adj ⨝ truncated-mid-edges) are anti-joined against the kept reach
    pair set, so a node is flagged iff it actually lost a distinct
    2-hop candidate.  Cost: the lost-candidate join regenerates the
    pairs the cap skipped — Σ_hub deg·(deg−cap) rows, the wedge bound
    the cap exists to avoid — so precise mode is for audits and
    moderate-hub graphs, not the 10^12-node default (where the cheap
    flag stays the honest linear-cost answer and its over-approximation
    is exactly "hub-adjacent").  Output:
    ``(node, n_1hop, n_2hop_total, capped)`` where n_2hop_total counts
    distinct nodes at hop 1 or 2 (self excluded)."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v"))
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    adj = (und.select(F.col("u").alias("n"), F.col("v").alias("x"))
           .unionByName(und.select(F.col("v").alias("n"),
                                   F.col("u").alias("x"))))
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("n_1hop"))
    adj_mid = adj
    truncated = None
    if max_mid_degree is not None:
        cap = int(max_mid_degree)
        if cap < 1:
            raise ValueError(f"max_mid_degree must be >= 1, got {cap}")
        w = Window.partitionBy("n").orderBy("x")
        ranked = adj.withColumn("_r", F.row_number().over(w))
        adj_mid = ranked.where(F.col("_r") <= cap).drop("_r")
        if precise_capped:
            truncated = ranked.where(F.col("_r") > cap).drop("_r")
        else:
            hubs = deg.where(F.col("n_1hop") > cap).select("n")
            # cheap over-approximation: a node's count CAN undercount
            # only if one of its mids was capped
            flagged = (adj.join(hubs.withColumnRenamed("n", "x"), "x")
                       .select("n").dropDuplicates()
                       .withColumn("capped", F.lit(True)))
    hop2 = (adj.select(F.col("x").alias("mid"), F.col("n").alias("a"))
            .join(adj_mid.select(F.col("n").alias("mid"),
                                 F.col("x").alias("c")), "mid")
            .where(F.col("a") != F.col("c"))
            .select("a", "c"))
    pairs = (adj.select(F.col("n").alias("a"), F.col("x").alias("c"))
             .unionByName(hop2)
             .dropDuplicates(["a", "c"]))
    if truncated is not None:
        # kept reach pairs feed two consumers (the count and the
        # anti-join) — checkpoint so the wedge join runs once
        pairs = pairs.localCheckpoint()
        lost = (adj.select(F.col("n").alias("a"), F.col("x").alias("mid"))
                .join(truncated.select(F.col("n").alias("mid"),
                                       F.col("x").alias("c")), "mid")
                .where(F.col("a") != F.col("c"))
                .select("a", "c").dropDuplicates(["a", "c"]))
        flagged = (lost.join(pairs, ["a", "c"], "left_anti")
                   .select(F.col("a").alias("n")).dropDuplicates()
                   .withColumn("capped", F.lit(True)))
    reach = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("n_2hop_total"))
    out = (deg.join(reach, deg.n == reach.a)
           .select(F.col("n").alias("node"),
                   F.col("n_1hop").cast("long").alias("n_1hop"),
                   F.col("n_2hop_total").cast("long")
                   .alias("n_2hop_total")))
    if max_mid_degree is None:
        return out.withColumn("capped", F.lit(False))
    return (out.join(flagged.withColumnRenamed("n", "node"),
                     "node", "left")
            .withColumn("capped", F.coalesce("capped", F.lit(False))))


def two_hop_reach_oracle_sql(edges_sql: str,
                             max_mid_degree: int | None = None,
                             precise_capped: bool = False) -> str:
    """DuckDB twin of :func:`two_hop_reach` — same smallest-id mid
    truncation, same capped-row flag (cheap hub-adjacent over-
    approximation by default; ``precise_capped`` mirrors the exact
    lost-candidate anti-join)."""
    if max_mid_degree is None:
        mid_cte = "adj_mid AS (SELECT n, x FROM adj)"
        capped = "FALSE AS capped"
        flag_join = ""
    else:
        cap = int(max_mid_degree)
        if precise_capped:
            mid_cte = f"""ranked AS MATERIALIZED (
                SELECT n, x,
                       row_number() OVER (PARTITION BY n ORDER BY x) AS r
                FROM adj
            ), adj_mid AS (
                SELECT n, x FROM ranked WHERE r <= {cap}
            ), truncated AS (
                SELECT n, x FROM ranked WHERE r > {cap}
            ), kept_pairs AS MATERIALIZED (
                SELECT DISTINCT a, c FROM (
                    SELECT n AS a, x AS c FROM adj
                    UNION ALL
                    SELECT l.n AS a, r.x AS c
                    FROM adj l JOIN adj_mid r ON l.x = r.n
                    WHERE l.n <> r.x
                )
            ), flagged AS (
                SELECT DISTINCT lost.a AS n FROM (
                    SELECT DISTINCT l.n AS a, r.x AS c
                    FROM adj l JOIN truncated r ON l.x = r.n
                    WHERE l.n <> r.x
                ) lost
                WHERE NOT EXISTS (
                    SELECT 1 FROM kept_pairs kp
                    WHERE kp.a = lost.a AND kp.c = lost.c
                )
            )"""
        else:
            mid_cte = f"""adj_mid AS (
                SELECT n, x FROM (
                    SELECT n, x,
                           row_number() OVER (PARTITION BY n ORDER BY x)
                               AS r
                    FROM adj
                ) WHERE r <= {cap}
            ), flagged AS (
                SELECT DISTINCT adj.n FROM adj
                JOIN (SELECT n FROM deg WHERE n_1hop > {cap}) h
                  ON adj.x = h.n
            )"""
        capped = "(fl.n IS NOT NULL) AS capped"
        flag_join = "LEFT JOIN flagged fl ON deg.n = fl.n"
    return f"""
        WITH raw AS ({edges_sql}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ), adj AS MATERIALIZED (
            SELECT u AS n, v AS x FROM und
            UNION ALL SELECT v, u FROM und
        ), deg AS MATERIALIZED (
            SELECT n, count(*) AS n_1hop FROM adj GROUP BY n
        ), {mid_cte}, hop2 AS (
            SELECT l.n AS a, r.x AS c
            FROM adj l JOIN adj_mid r ON l.x = r.n
            WHERE l.n <> r.x
        ), reach AS (
            SELECT a, count(DISTINCT c) AS n_2hop_total FROM (
                SELECT n AS a, x AS c FROM adj
                UNION ALL SELECT a, c FROM hop2
            ) GROUP BY a
        )
        SELECT deg.n AS node, CAST(n_1hop AS BIGINT) AS n_1hop,
               CAST(n_2hop_total AS BIGINT) AS n_2hop_total,
               {capped}
        FROM deg JOIN reach ON deg.n = reach.a {flag_join}
    """


def two_hop_reach_hll(edges: DataFrame, src: str = "src",
                      dst: str = "dst", p: int = 8) -> DataFrame:
    """Bounded-state 2-hop reach: per node, a deterministic-HLL
    estimate of the distinct nodes within ≤ 2 undirected hops — the
    10^12-node scale path where even the hub-capped exact operator
    (:func:`two_hop_reach`) pays Σ deg·min(deg,cap) wedge rows and
    undercounts what it truncates.  Here NO wedge is ever
    materialized: per-node state is ≤ m = 2^p register rows
    (:func:`frogocr_spark.operators.sketches.hll_registers` — the
    md5-deterministic sketch whose registers are a pure FUNCTION of
    the neighbor set), and the 2-hop gather is ONE edge equi-join over
    register rows — Σ_mid deg(mid)·min(deg(mid), m) rows, LINEAR in
    hub degree — followed by the idempotent per-(node, bucket) max
    merge.  Because registers are a function of the set, the composed
    sketch is BIT-IDENTICAL to sketching the exactly-materialized
    2-ball (pytest proves register-table equality), so the standard
    1.04/sqrt(m) error bound applies verbatim.

    Semantics note: the gathered set is the CLOSED 2-ball — a node
    reaches itself through any round trip a→mid→a, and HLL cannot
    subtract — so on nodes with ≥ 1 edge the estimated set includes
    self, while the exact operator reports the open ball (compare
    against exact+1 when auditing).  Output: ``(node, n_1hop,
    n_zero_regs, reg_sum_scaled, hll_est)`` — the integer register
    aggregates are the engine-portable hash-contract columns, the
    float estimate is derived (same contract shape as hll_distinct)."""
    from .sketches import hll_estimate_from_registers, hll_registers

    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v"))
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    adj = (und.select(F.col("u").alias("n"), F.col("v").alias("x"))
           .unionByName(und.select(F.col("v").alias("n"),
                                   F.col("u").alias("x"))))
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("n_1hop"))
    regs1 = hll_registers(adj, ["n"], "x", p)
    gather = (adj.select(F.col("n").alias("a"), F.col("x").alias("mid"))
              .join(regs1.withColumnRenamed("n", "mid"), "mid")
              .select(F.col("a").alias("n"), "bucket", "reg"))
    merged = (regs1.unionByName(gather)
              .groupBy("n", "bucket").agg(F.max("reg").alias("reg")))
    est = hll_estimate_from_registers(merged, ["n"], p)
    return (deg.join(est, "n")
            .select(F.col("n").alias("node"),
                    F.col("n_1hop").cast("long").alias("n_1hop"),
                    "n_zero_regs", "reg_sum_scaled", "hll_est"))


def two_hop_reach_hll_oracle_sql(edges_sql: str, p: int = 8) -> str:
    """DuckDB twin of :func:`two_hop_reach_hll`: identical md5 hash,
    bucket split, rho, register union and one-division finish (the
    hll_distinct oracle pattern over the graph gather)."""
    from .sketches import hll_constants
    c = hll_constants(p)
    return f"""
        WITH raw AS ({edges_sql}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ), adj AS MATERIALIZED (
            SELECT u AS n, v AS x FROM und
            UNION ALL SELECT v, u FROM und
        ), deg AS (
            SELECT n, count(*) AS n_1hop FROM adj GROUP BY n
        ), hashed AS (
            SELECT n, x,
                   ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT
                   AS h
            FROM adj
        ), regs1 AS MATERIALIZED (
            SELECT n, h >> {c['w']} AS bucket,
                   CAST(max(CASE WHEN (h & {c['rem_mask']}) = 0
                            THEN {c['maxrho']}
                            ELSE {c['w']} + 1
                                 - length(bin(h & {c['rem_mask']}))
                            END) AS BIGINT) AS reg
            FROM hashed GROUP BY 1, 2
        ), merged AS (
            SELECT n, bucket, max(reg) AS reg FROM (
                SELECT n, bucket, reg FROM regs1
                UNION ALL
                SELECT a.n AS n, r.bucket, r.reg
                FROM (SELECT n, x AS mid FROM adj) a
                JOIN regs1 r ON r.n = a.mid
            ) GROUP BY 1, 2
        ), agg AS (
            SELECT n,
                   CAST(sum(1::BIGINT << CAST({c['maxrho']} - reg AS INT))
                        AS BIGINT) AS hit_sum,
                   count(*) AS n_hit
            FROM merged GROUP BY n
        )
        SELECT deg.n AS node, CAST(n_1hop AS BIGINT) AS n_1hop,
               CAST({c['m']} - n_hit AS INT) AS n_zero_regs,
               CAST(hit_sum + ({c['m']} - n_hit) * {c['empty_term']}
                    AS BIGINT) AS reg_sum_scaled,
               round({c['est_num']!r} /
                     CAST(hit_sum + ({c['m']} - n_hit) * {c['empty_term']}
                          AS DOUBLE), 3) AS hll_est
        FROM deg JOIN agg ON deg.n = agg.n
    """


def _lc_floor_table(p: int) -> list[int]:
    """Linear-counting floors as an INTEGER LITERAL table: entry V =
    ``floor(m·ln(m/V))`` for V = 0..m (entry 0 unused).  The number of
    zero registers V has only m+1 possible values, so the small-range
    correction — whose ``ln`` would otherwise be a libm
    last-ulp-portability hazard in the hash contract — is computed
    ONCE here in Python and shipped verbatim to BOTH engines as
    integers: no transcendental function runs in either engine."""
    import math
    m = 1 << p
    return [0] + [int(math.floor(m * math.log(m / v)))
                  for v in range(1, m + 1)]


def neighborhood_function(edges: DataFrame, src: str = "src",
                          dst: str = "dst", max_k: int = 4,
                          p: int = 8) -> DataFrame:
    """Neighborhood function / HyperANF (Boldi, Rosa & Vigna, WWW
    2011 — the public HLL-on-graphs algorithm): for k = 0..max_k, the
    per-k ball sketches ``B_k(v) = B_{k-1}(v) ∪ ⋃_{(v,w)∈E}
    B_{k-1}(w)`` with ``B_0(v) = {v}``, iterated as register
    max-merges.  NF(k) = Σ_v |B_k(v)| yields average distance and
    effective diameter — the classic web-graph/social-graph distance
    audit, computable at 10^12 nodes because per-node state is ≤ m
    register rows regardless of degree and each round is ONE edge
    equi-join over register rows + one keyed max (the
    :func:`two_hop_reach_hll` gather generalized to k rounds; same
    bit-determinism argument — registers are a pure function of the
    ball set).

    Output: one row per k ∈ [0, max_k] with INTEGER cross-node
    aggregates only — ``(k, n_nodes, nf_floor, sum_reg_scaled,
    sum_zero_regs)``:

    - ``nf_floor`` = Σ_v floor(est(v)) — the neighborhood function
      itself, made engine-portable: each node's estimate is the
      small-range-corrected HLL value — linear counting ``m·ln(m/V)``
      when the raw estimate ≤ 2.5m and V (zero registers) > 0, read
      from the :func:`_lc_floor_table` INTEGER literal (so no libm
      ``ln`` runs in either engine), else floor of the raw estimate
      (ONE correctly-rounded IEEE division of the shared float
      literal by the exact integer register sum).  The cross-node sum
      of integers is order-independent (a float Σ_v est(v) would
      hash-differ by summation order).  DECIMAL(38,0) emitted as its
      decimal string (Σ ≤ n² — past int64 at 10^12 nodes).
    - ``sum_reg_scaled`` = Σ_v reg_sum_scaled(v), same DECIMAL string
      treatment (each node's scaled sum is ≤ m·2^maxrho ≈ 2^61).

    Eager per round (localCheckpoint cuts the k-fold lineage,
    ≤ nodes·m rows each — the pagerank/kcore discipline)."""
    from .sketches import hll_constants, hll_registers

    if max_k < 1:
        raise ValueError(f"max_k must be >= 1, got {max_k}")
    c = hll_constants(p)
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .where("u <> v"))
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    adj = (und.select(F.col("u").alias("n"), F.col("v").alias("x"))
           .unionByName(und.select(F.col("v").alias("n"),
                                   F.col("u").alias("x")))
           .localCheckpoint())
    nodes = adj.select("n").dropDuplicates()
    regs = hll_registers(nodes.withColumn("x", F.col("n")),
                         ["n"], "x", p).localCheckpoint()

    lc = _lc_floor_table(p)
    lc_arr = F.array(*[F.lit(x) for x in lc])

    def _nf_row(r: DataFrame, k: int) -> DataFrame:
        term = F.expr(f"shiftleft(cast(1 as bigint), "
                      f"cast({c['maxrho']} - reg as int))")
        per_node = (r.groupBy("n")
                    .agg(F.sum(term).alias("_hit"),
                         F.count(F.lit(1)).alias("_nh")))
        full = (F.col("_hit") + (F.lit(c["m"]) - F.col("_nh"))
                * F.lit(c["empty_term"]))
        raw = F.lit(c["est_num"]) / full.cast("double")
        v = (F.lit(c["m"]) - F.col("_nh")).cast("int")
        est_floor = (F.when((raw <= 2.5 * c["m"]) & (v > 0),
                            F.element_at(lc_arr, v + 1))
                     .otherwise(F.floor(raw))).cast("long")
        return (per_node.groupBy()
                .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                     F.sum(est_floor.cast("decimal(38,0)"))
                     .cast("decimal(38,0)").cast("string")
                     .alias("nf_floor"),
                     F.sum(full.cast("decimal(38,0)"))
                     .cast("decimal(38,0)").cast("string")
                     .alias("sum_reg_scaled"),
                     F.sum(F.lit(c["m"]) - F.col("_nh"))
                     .cast("long").alias("sum_zero_regs"))
                .withColumn("k", F.lit(k).cast("int"))
                .select("k", "n_nodes", "nf_floor", "sum_reg_scaled",
                        "sum_zero_regs"))

    out = _nf_row(regs, 0)
    for k in range(1, max_k + 1):
        gather = (adj.select(F.col("n").alias("a"),
                             F.col("x").alias("mid"))
                  .join(regs.withColumnRenamed("n", "mid"), "mid")
                  .select(F.col("a").alias("n"), "bucket", "reg"))
        regs = (regs.unionByName(gather)
                .groupBy("n", "bucket").agg(F.max("reg").alias("reg"))
                .localCheckpoint())
        out = out.unionByName(_nf_row(regs, k))
    return out


def neighborhood_function_oracle_sql(edges_sql: str, max_k: int = 4,
                                     p: int = 8) -> str:
    """DuckDB twin of :func:`neighborhood_function` — the identical
    register chain unrolled as K materialized CTEs."""
    from .sketches import hll_constants
    c = hll_constants(p)
    parts = [f"""
        WITH raw AS ({edges_sql}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM raw WHERE src <> dst
        ), adj AS MATERIALIZED (
            SELECT u AS n, v AS x FROM und
            UNION ALL SELECT v, u FROM und
        ), nodes AS (SELECT DISTINCT n FROM adj),
        r0 AS MATERIALIZED (
            SELECT n, h >> {c['w']} AS bucket,
                   CAST(CASE WHEN (h & {c['rem_mask']}) = 0
                        THEN {c['maxrho']}
                        ELSE {c['w']} + 1
                             - length(bin(h & {c['rem_mask']}))
                        END AS BIGINT) AS reg
            FROM (SELECT n,
                         ('0x' || substr(md5(CAST(n AS VARCHAR)), 1, 15))
                         ::BIGINT AS h
                  FROM nodes)
        )"""]
    for k in range(1, max_k + 1):
        parts.append(f""", r{k} AS MATERIALIZED (
            SELECT n, bucket, max(reg) AS reg FROM (
                SELECT n, bucket, reg FROM r{k-1}
                UNION ALL
                SELECT a.n, r.bucket, r.reg
                FROM (SELECT n, x AS mid FROM adj) a
                JOIN r{k-1} r ON r.n = a.mid
            ) GROUP BY 1, 2
        )""")
    finishes = []
    for k in range(max_k + 1):
        finishes.append(f"""
            SELECT {k} AS k, CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(CAST(sum(CAST(
                       CASE WHEN {c['est_num']!r} /
                                 CAST(hit + ({c['m']} - nh)
                                      * {c['empty_term']} AS DOUBLE)
                                 <= {2.5 * c['m']!r}
                             AND ({c['m']} - nh) > 0
                            THEN ({_lc_floor_table(p)})[
                                CAST({c['m']} - nh AS INT) + 1]
                            ELSE CAST(floor({c['est_num']!r} /
                                 CAST(hit + ({c['m']} - nh)
                                      * {c['empty_term']} AS DOUBLE))
                                 AS BIGINT) END
                                 AS HUGEINT)) AS HUGEINT) AS VARCHAR)
                       AS nf_floor,
                   CAST(CAST(sum(CAST(hit AS HUGEINT)
                                 + ({c['m']} - nh)
                                 * {c['empty_term']}::HUGEINT)
                             AS HUGEINT) AS VARCHAR) AS sum_reg_scaled,
                   CAST(sum({c['m']} - nh) AS BIGINT) AS sum_zero_regs
            FROM (SELECT n,
                         CAST(sum(1::BIGINT <<
                                  CAST({c['maxrho']} - reg AS INT))
                              AS BIGINT) AS hit,
                         count(*) AS nh
                  FROM r{k} GROUP BY n)""")
    return ("".join(parts) + "\n"
            + "\nUNION ALL\n".join(finishes))


def effective_diameter(nf_rows, q: float = 0.9) -> float:
    """HyperANF finish: the q-effective diameter from collected
    :func:`neighborhood_function` rows — the smallest k (with linear
    interpolation between integer k, the standard ANF/HyperANF
    convention) at which NF(k) ≥ q·NF(k_max).  Driver-side arithmetic
    over max_k+1 tiny rows; NF(k) is read from the operator's
    ``nf_floor`` column — Σ_v floor est(v), the engine-portable
    neighborhood function itself.

    ``nf_floor`` is DECIMAL(38,0)/VARCHAR precisely because cross-node
    sums exceed int64 at the advertised 10^12-node scale, so the
    target comparison and the interpolation numerator/denominator run
    in EXACT arithmetic (Python int + ``fractions.Fraction`` of the
    exact binary value of ``q``); floats appear only in the final
    interpolated value.  Above 2^53 a float() parse would silently
    collapse adjacent NF values and misplace the crossing k (ADVICE
    r4)."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    rows = sorted(nf_rows, key=lambda r: r["k"])
    if not rows:
        raise ValueError("empty neighborhood function")
    nf = [int(r["nf_floor"]) for r in rows]
    target = Fraction(q) * nf[-1]
    for i, v in enumerate(nf):
        if v >= target:
            if i == 0:
                return 0.0
            lo, hi = nf[i - 1], v
            return (i - 1) + float((target - lo) / (hi - lo)) \
                if hi > lo else float(i)
    return float(rows[-1]["k"])


def hits_int(edges: DataFrame, iters: int = 2,
             scale: int = 1_000_000) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999 — hubs & authorities) over
    distinct directed ``(src, dst)`` edges: the link-analysis sibling
    of :func:`pagerank_int` for bipartite-ish graphs (who aggregates
    vs who is aggregated).

    Float HITS normalizes by an L2 norm (sqrt — not portable bit-for-
    bit across engines when fed shuffle-ordered sums); here each half-
    step rescales by the SUM with one truncating division::

        auth(v) = (Σ_{u→v} hub(u)) · scale DIV max(Σ_raw, 1)
        hub(u)  = (Σ_{u→v} auth(v)) · scale DIV max(Σ_raw, 1)

    — all int64/DECIMAL(38,0) ops, order-independent, so every engine
    computes the identical integers after any iteration count.

    Scale shape: per half-step ONE gather equi-join + one map-side-
    combined keyed agg, plus a 1-row total broadcast back (the
    zorder_buckets cross-join pattern — O(1) driver traffic).  The
    edge relation and node set are localCheckpointed ONCE up front,
    and each half-step result once produced (same lineage-cut
    discipline as ``pagerank_int`` / ``kcore``; eager, like them):
    auth_i feeds both hub_i and the final join, so a lazy reference
    DAG re-evaluates every earlier half-step's shuffle per consumer —
    measured ~2× end-to-end on the co-event graph, whose construction
    is itself a self-join.  Exact while
    n_nodes · scale² < 10^38 (DECIMAL headroom).  Output:
    ``(node, hub, auth)`` for every node."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        tot = raw.agg(F.sum("_raw").cast("decimal(38,0)").alias("_t"))
        return (nodes.join(raw, "node", "left")
                .crossJoin(F.broadcast(tot))
                .select("node", F.expr(
                    f"(CAST(coalesce(_raw, 0) AS DECIMAL(38,0)) "
                    f"* {scale}) DIV greatest(coalesce(_t, 1), 1)")
                    .cast("long").alias(col)))

    hub = nodes.select("node", F.lit(scale).cast("long").alias("hub"))
    auth = None
    # each half-step result is localCheckpointed: auth_i feeds BOTH
    # hub_i and the final join, hub_i feeds auth_{i+1} — left lazy the
    # reference DAG re-evaluates every earlier half-step's shuffle
    # per consumer (2^iters stage blowup); the checkpoint is
    # n_nodes-rows tiny
    for _ in range(iters):
        a_raw = (edges.join(hub, edges["src"] == hub["node"])
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("hub").alias("_raw")))
        auth = _normalize(a_raw, "auth").localCheckpoint()
        h_raw = (edges.join(auth, edges["dst"] == auth["node"])
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("auth").alias("_raw")))
        hub = _normalize(h_raw, "hub").localCheckpoint()
    return hub.join(auth, "node").select("node", "hub", "auth")


def hits_int_oracle_sql(edges_sql: str, iters: int = 2,
                        scale: int = 1_000_000) -> str:
    """DuckDB twin of :func:`hits_int`: the identical integer chain as
    unrolled CTEs (HUGEINT sums, ``//`` ≡ Spark ``DIV`` on these
    non-negative values)."""
    sql = [f"WITH e AS ({edges_sql}),",
           "nodes AS (SELECT src AS node FROM e UNION "
           "SELECT dst FROM e),",
           f"h0 AS (SELECT node, CAST({scale} AS BIGINT) AS hub "
           f"FROM nodes),"]
    for i in range(1, iters + 1):
        sql.append(
            f"ar{i} AS (SELECT e.dst AS node, "
            f"CAST(sum(h.hub) AS HUGEINT) AS raw "
            f"FROM e JOIN h{i-1} h ON e.src = h.node GROUP BY e.dst),")
        sql.append(f"at{i} AS (SELECT greatest(coalesce(sum(raw), 1), 1)"
                   f" AS t FROM ar{i}),")
        sql.append(
            f"a{i} AS (SELECT n.node, CAST(COALESCE(r.raw, 0) * {scale}"
            f" // t AS BIGINT) AS auth "
            f"FROM nodes n LEFT JOIN ar{i} r USING (node) "
            f"CROSS JOIN at{i}),")
        sql.append(
            f"hr{i} AS (SELECT e.src AS node, "
            f"CAST(sum(a.auth) AS HUGEINT) AS raw "
            f"FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),")
        sql.append(f"ht{i} AS (SELECT greatest(coalesce(sum(raw), 1), 1)"
                   f" AS t FROM hr{i}),")
        sql.append(
            f"h{i} AS (SELECT n.node, CAST(COALESCE(r.raw, 0) * {scale}"
            f" // t AS BIGINT) AS hub "
            f"FROM nodes n LEFT JOIN hr{i} r USING (node) "
            f"CROSS JOIN ht{i}),")
    sql[-1] = sql[-1].rstrip(",")
    sql.append(f"SELECT h.node, h.hub, a.auth "
               f"FROM h{iters} h JOIN a{iters} a USING (node)")
    return "\n".join(sql)
