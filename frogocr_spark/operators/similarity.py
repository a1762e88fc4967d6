"""Approximate-nearest-neighbor search over an embedding column.

Two paths over ``embeddings(vec_id bigint, embedding array<float>, label
int)``:

- :func:`cosine_topk_bruteforce` — exact baseline: broadcast the (small)
  query set, JVM-side dot product via ``F.zip_with``/``F.aggregate``
  (whole-stage codegen, no Python), rank window for top-k.  Correct at any
  corpus size as long as the QUERY side is broadcastable.
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH buckets
  (SimHash for vectors).  Corpus and queries are bucketed by an
  ``nbits``-bit sign signature; candidates meet only inside matching
  buckets (equi-join on bucket id, multi-probe via ``ntables``
  independent tables), then exact cosine re-rank.  Recall is tested
  against the brute-force baseline in tests/test_similarity.py.

Hyperplanes are deterministic (hash-derived pseudo-random), so results
are reproducible without any RNG state.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def cosine_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank); self-pairs
    excluded.  Queries are broadcast — the corpus is never shuffled."""
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (c.crossJoin(q)
              .where(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cosine", _cosine(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _hyperplanes(dim: int, nbits: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 bytes."""
    planes = []
    for b in range(nbits):
        vals = []
        i = 0
        while len(vals) < dim:
            digest = hashlib.md5(f"lsh:{table}:{b}:{i}".encode()).digest()
            for off in range(0, 16, 4):
                (u,) = struct.unpack("<i", digest[off:off + 4])
                vals.append(u / 2**31)  # ∈ [-1, 1)
            i += 1
        planes.append(vals[:dim])
    return planes


def _bucket_udf(dim: int, nbits: int, ntables: int):
    """Vectorized bucket assignment: one numpy matmul per Arrow batch over
    ALL tables' hyperplanes at once → array<long> of ntables bucket ids.
    Each table's id is offset by table_index * 2^nbits so ids never
    collide across tables (one explode+join instead of ntables joins)."""
    planes = np.array([_hyperplanes(dim, nbits, t) for t in range(ntables)],
                      dtype=np.float64)          # (ntables, nbits, dim)
    flat = planes.reshape(ntables * nbits, dim).T   # (dim, ntables*nbits)
    weights = (1 << np.arange(nbits, dtype=np.int64))
    offsets = (np.arange(ntables, dtype=np.int64) << nbits)

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())            # (n, dim)
        signs = (mat @ flat) > 0                    # (n, ntables*nbits)
        bits = signs.reshape(len(mat), ntables, nbits).astype(np.int64)
        ids = (bits * weights).sum(axis=2) + offsets  # (n, ntables)
        return pd.Series(list(ids))

    return buckets


def cosine_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int, dim: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nbits: int = 8, ntables: int = 4) -> DataFrame:
    """ANN top-k: candidates = bucket collisions in any of ``ntables``
    random-hyperplane tables; exact cosine re-rank of candidates."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))

    buckets = _bucket_udf(dim, nbits, ntables)
    cb = c.select("*", F.explode(buckets(F.col("cv"))).alias("_bkt"))
    qb = F.broadcast(
        q.select("*", F.explode(buckets(F.col("qv"))).alias("_bkt")))
    cand = (cb.join(qb, "_bkt").drop("_bkt")
            .dropDuplicates(["query_id", "neighbor_id"])
            .where(F.col("neighbor_id") != F.col("query_id")))
    scored = cand.withColumn("cosine", _cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
