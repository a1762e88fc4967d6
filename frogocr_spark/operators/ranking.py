"""Scalable global ranking / dense-id assignment.

``global_rank`` assigns a 1-based dense rank under a total order WITHOUT
a single-partition window (the classic ``Window.orderBy`` with no
partitionBy collapses the whole relation into one task — the textbook
scale hazard).  Instead:

1. ``repartitionByRange`` on the order key — Spark's RangePartitioner is
   order-preserving across partition IDs (partition 0 holds the lowest
   key range), so global rank = per-partition rank + the number of rows
   in all lower partitions.
2. per-partition ``row_number`` (a window PARTITIONED by the range
   partition id — every partition ranks independently, full parallelism).
3. per-partition counts (one tiny aggregate, ~``num_partitions`` rows)
   are collected, turned into cumulative offsets, and broadcast-joined
   back.

Driver cost is O(num_partitions) ints — bounded and independent of data
size.  Used by :mod:`frogocr_spark.operators.dedup` to intern the token
dictionary into dense integer ids (rank under the document-frequency-
ascending PPJoin order), which makes both the prefix equi-join keys and
the exact ``array_intersect`` verification numeric instead of string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[str],
                rank_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Append ``rank_col``: 1-based global ``row_number`` under
    ``ORDER BY order_cols`` — scalable (no single-partition exchange).

    The order key should be unique per row (ties get arbitrary-but-
    deterministic distinct ranks, exactly like ``row_number``).  The
    input subtree is localCheckpointed because it is consumed twice
    (per-partition counts action + the ranked output).

    NOTE: calling this runs Spark jobs EAGERLY (the localCheckpoint and
    the per-partition counts collect execute at call time, not at the
    downstream action) — callers that compose it into a larger plan
    (e.g. ``ngram_jaccard_pairs``) become eager at plan-construction.
    """
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(p, *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint())
    counts = {r["_pid"]: r["c"] for r in
              ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("c"))
              .collect()}
    offsets, acc = [], 0
    for pid in range(max(counts, default=-1) + 1):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    off_df = F.broadcast(df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (ranged.join(off_df, "_pid")
            .withColumn(rank_col,
                        (F.row_number().over(w) + F.col("_offset"))
                        .cast("long"))
            .drop("_pid", "_offset"))
