"""Integer-exact distributed k-means (Lloyd's algorithm) — the
clustering primitive of the embedding-curation pipeline (IVF coarse
quantizers, SemDeDup cluster structure, dataset cartography), expressed
so that every iteration is ENGINE-EXACT and an ANSI-SQL oracle can
re-run the identical chain bit-for-bit:

- components quantize to integer ten-thousandths (``round(v·10⁴)`` —
  one float→double cast and one correctly-rounded multiply both engines
  agree on), so squared L2 distances are exact int64 sums;
- seeds are the ``k`` vectors with the smallest ``md5(id)`` — the
  repo's standard seedless, engine-portable pick (no RNG; same as
  SemDeDup/PQ seeding in :mod:`~frogocr_spark.operators.similarity`);
- assignment = argmin of the EXACT integer distance, ties → smaller
  cluster index;
- centroid update = element-wise ``floor(sum / count)`` — floor
  division of exact integers (portable: with |sum| < 2⁵³ the
  double-division floor equals the exact rational floor in every IEEE
  engine); an emptied cluster keeps its previous centroid.

Scale shape per iteration: the assignment is a PURE MAP stage (the
k×dim centroid matrix ships as literals — the corpus is never joined
or shuffled for its labels, the SemDeDup assignment argument), and the
update is ONE map-side-combined (cluster, position) aggregation whose
shuffle is bounded by k·dim rows, collected to the driver (k·dim
ints — bounded and documented-eager, the same contract as
``pq_fit``/``bpe_train``).  The corpus-side quantization is
localCheckpointed once so iterations re-scan columnar cached data, not
the lineage.

Reference parity: the reference has no clustering; this is part of the
training-data-pipeline surface the brief adds (SURVEY.md §2 extension,
same family as similarity/IVF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantize(vec_col: str, scale: int) -> "F.Column":
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def _dist(q: "F.Column", centroid: list[int]) -> "F.Column":
    c = F.array(*[F.lit(int(x)).cast("long") for x in centroid])
    return F.aggregate(
        F.zip_with(q, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _best(q: "F.Column", centroids: list[list[int]]) -> "F.Column":
    """struct(d, j) of the argmin centroid — least() over (dist, index)
    structs implements 'smallest distance, ties to smaller index'."""
    cands = [F.struct(_dist(q, c).alias("d"),
                      F.lit(j).cast("long").alias("j"))
             for j, c in enumerate(centroids)]
    return cands[0] if len(cands) == 1 else F.least(*cands)


def kmeans_int(corpus: DataFrame, k: int = 4, iters: int = 3, *,
               id_col: str = "vec_id", vec_col: str = "embedding",
               scale: int = 10_000) -> DataFrame:
    """Run ``iters`` Lloyd rounds (assign → update) then a final
    assignment against the last centroids.  EAGER: runs ~2 Spark jobs
    per round (see module docstring).  Output: one row per NON-EMPTY
    cluster — ``cluster long, n_members long, inertia long (exact Σ
    squared int distance), centroid array<long>``."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    spark = corpus.sparkSession
    q = (corpus.select(F.col(id_col).alias("_id"),
                       _quantize(vec_col, scale).alias("q"))
         .localCheckpoint(eager=True))
    seeds = (q.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
             .limit(k).collect())
    if len(seeds) < k:
        raise ValueError(f"corpus has {len(seeds)} rows < k={k}")
    centroids = [[int(x) for x in row["q"]] for row in seeds]
    for _ in range(iters):
        assigned = q.withColumn("_j", _best(F.col("q"), centroids)["j"])
        stats = (assigned
                 .select("_j", F.posexplode("q").alias("_i", "_v"))
                 .groupBy("_j", "_i")
                 .agg(F.sum("_v").alias("_s"),
                      F.count(F.lit(1)).alias("_n"))
                 .collect())
        by_j: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_j.setdefault(int(r["_j"]), {})[int(r["_i"])] = (
                int(r["_s"]), int(r["_n"]))
        centroids = [
            [by_j[j][i][0] // by_j[j][i][1]          # Python // floors,
             for i in range(len(centroids[j]))]      # matching the
            if j in by_j else centroids[j]           # oracle's floor()
            for j in range(k)]
    best = _best(F.col("q"), centroids)
    out = (q.select(best["j"].alias("cluster"), best["d"].alias("_d"))
           .groupBy("cluster")
           .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                F.sum("_d").cast("long").alias("inertia")))
    cdf = F.broadcast(spark.createDataFrame(
        [(j, centroids[j]) for j in range(k)],
        "cluster long, centroid array<long>"))
    return out.join(cdf, "cluster").select(
        "cluster", "n_members", "inertia", "centroid")


def kmeans_oracle_sql(k: int = 4, iters: int = 3, dim: int = 64, *,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      scale: int = 10_000) -> str:
    """DuckDB twin: one WITH chain re-running the identical seed pick,
    per-round exact-integer argmin assignment (cross join to the k-row
    centroid CTE, ``QUALIFY row_number() OVER (PARTITION BY id ORDER BY
    d, j) = 1``), floor-division update with empty-cluster carryover,
    and the final assignment + rollup."""
    sql = [f"""
        WITH q AS (
            SELECT {id_col} AS vid,
                   list_transform({vec_col}, x ->
                       CAST(round(CAST(x AS DOUBLE) * {scale}, 0)
                            AS BIGINT)) AS q
            FROM {table}
        ), c0 AS (
            SELECT row_number() OVER (
                       ORDER BY md5(CAST(vid AS VARCHAR)), vid) - 1
                   AS j, q AS c
            FROM q
            QUALIFY row_number() OVER (
                        ORDER BY md5(CAST(vid AS VARCHAR)), vid)
                    <= {k}
        )"""]
    ssq = (f"CAST(list_sum(list_transform(range(1, {dim} + 1), i -> "
           f"(q.q[i] - c.c[i]) * (q.q[i] - c.c[i]))) AS BIGINT)")
    for r in range(1, iters + 2):
        p = r - 1
        sql.append(f""", d{r} AS (
            SELECT q.vid, q.q, c.j, {ssq} AS d
            FROM q CROSS JOIN c{p} c
        ), a{r} AS (
            SELECT vid, q, j, d FROM d{r}
            QUALIFY row_number() OVER (
                        PARTITION BY vid ORDER BY d, j) = 1
        )""")
        if r <= iters:
            sql.append(f""", u{r} AS (
            SELECT a.j, t.i,
                   CAST(floor(CAST(sum(a.q[t.i]) AS DOUBLE)
                              / count(*)) AS BIGINT) AS ci
            FROM a{r} a CROSS JOIN range(1, {dim} + 1) t(i)
            GROUP BY a.j, t.i
        ), c{r} AS (
            SELECT j, list(ci ORDER BY i) AS c FROM u{r} GROUP BY j
            UNION ALL
            SELECT j, c FROM c{p}
            WHERE j NOT IN (SELECT DISTINCT j FROM a{r})
        )""")
    last = iters + 1
    sql.append(f"""
        SELECT a.j AS cluster,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(a.d) AS BIGINT) AS inertia,
               c.c AS centroid
        FROM a{last} a JOIN c{iters} c ON a.j = c.j
        GROUP BY a.j, c.c""")
    return "".join(sql)


def maxmin_coreset(corpus: DataFrame, k: int = 5, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: int = 10_000) -> DataFrame:
    """Greedy k-center / farthest-point coreset selection (Gonzalez
    1985) — the diversity-sampling step of embedding curation (pick k
    maximally-spread exemplars; 2-approximation of the optimal
    k-center cover).  Same engine-exact discipline as
    :func:`kmeans_int`: integer ten-thousandths quantization, exact
    int64 squared-L2, smallest-md5(id) seed, argmax ties → smaller id.

    Scale shape: per round the distance-to-selected-set evaluation is
    a PURE MAP stage (the ≤ k selected vectors ship as literals — the
    corpus is never joined/shuffled) followed by one TakeOrdered(1)
    reduction.  EAGER by necessity (each pick depends on the last):
    k−1 driver round-trips of ONE row each — the
    ``kmeans_int``/``bpe_train`` bounded-driver-traffic contract.

    Output: ``(round, vec_id, dist)`` — ``dist`` is the exact integer
    squared distance from the pick to the nearest earlier-selected
    center (0 for the seed; non-increasing over rounds, the classic
    k-center radius curve)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = corpus.sparkSession
    q = (corpus.select(F.col(id_col).alias("_id"),
                       _quantize(vec_col, scale).alias("q"))
         .localCheckpoint(eager=True))
    [seed] = (q.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
              .limit(1).collect())
    picks = [(0, seed["_id"], 0)]
    sel_vecs = [[int(x) for x in seed["q"]]]
    sel_ids = [seed["_id"]]
    for r in range(1, k):
        cand = (q.where(~F.col("_id").isin(sel_ids))
                .select("_id", "q",
                        _best(F.col("q"), sel_vecs)["d"].alias("_d"))
                .orderBy(F.desc("_d"), F.asc("_id")).limit(1).collect())
        if not cand:
            break  # fewer than k distinct rows
        row = cand[0]
        picks.append((r, row["_id"], int(row["_d"])))
        sel_vecs.append([int(x) for x in row["q"]])
        sel_ids.append(row["_id"])
    id_type = corpus.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        picks, f"round long, {id_col} {id_type}, dist long")


def maxmin_coreset_oracle_sql(k: int = 5, dim: int = 64, *,
                              table: str = "embeddings",
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              scale: int = 10_000) -> str:
    """DuckDB twin of :func:`maxmin_coreset`: the identical greedy
    chain unrolled as CTEs (min-over-selected via a grouped cross
    join, pick via QUALIFY on (dist DESC, id))."""
    ssq = (f"CAST(list_sum(list_transform(range(1, {dim} + 1), i -> "
           f"(q.q[i] - s.sq[i]) * (q.q[i] - s.sq[i]))) AS BIGINT)")
    sql = [f"""
        WITH q AS (
            SELECT {id_col} AS vid,
                   list_transform({vec_col}, x ->
                       CAST(round(CAST(x AS DOUBLE) * {scale}, 0)
                            AS BIGINT)) AS q
            FROM {table}
        ), sel0 AS (
            SELECT vid AS svid, q AS sq FROM q
            QUALIFY row_number() OVER (
                        ORDER BY md5(CAST(vid AS VARCHAR)), vid) = 1
        )"""]
    for r in range(1, k):
        p = r - 1
        sql.append(f""", d{r} AS (
            SELECT q.vid, min({ssq}) AS d
            FROM q CROSS JOIN sel{p} s
            WHERE q.vid NOT IN (SELECT svid FROM sel{p})
            GROUP BY q.vid
        ), p{r} AS (
            SELECT vid, d FROM d{r}
            QUALIFY row_number() OVER (ORDER BY d DESC, vid) = 1
        ), sel{r} AS (
            SELECT svid, sq FROM sel{p}
            UNION ALL
            SELECT q.vid, q.q FROM q JOIN p{r} USING (vid)
        )""")
    parts = [f"SELECT 0 AS round, svid AS {id_col}, "
             f"CAST(0 AS BIGINT) AS dist FROM sel0"]
    for r in range(1, k):
        parts.append(f"SELECT {r} AS round, vid AS {id_col}, "
                     f"CAST(d AS BIGINT) AS dist FROM p{r}")
    sql.append("\n" + "\nUNION ALL\n".join(parts))
    return "".join(sql)
