"""Join operators (SURVEY §2.3): range/interval join, as-of join,
nearest-neighbor join — cross-row generalizations of the reference's
within-document joins, built scale-first.

Scale design: a naive theta-join on a range predicate is a cross product.
Every operator here buckets the range key first so the physical plan is an
EQUI-join on the bucket (shuffle-hash / sort-merge, AQE-skew-safe) with
the residual range predicate applied post-join — the standard
bucketed-range-join decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          keys: list[str],
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          coverage: float = 0.75,
                          bucket_width: int | None = None) -> DataFrame:
    """J1: pairs whose intervals overlap with mutual coverage > ``coverage``
    in either direction (reference predicate ``Source/TaskProcessor.cpp:165``
    — ``Quad::coverage`` both ways, ``Source/Core/Quad.hpp:49-59``).

    With ``bucket_width`` the join is decomposed into equi-joins on
    overlapping bucket ids (each interval is exploded to the buckets it
    touches), keeping the shuffle keyed and pruning non-candidates early.
    """
    lw = [F.col(c) for c in keys]
    if bucket_width:
        lb = left.withColumn(
            "_bkt", F.explode(F.sequence(
                F.floor(F.col(l_start) / bucket_width),
                F.floor((F.col(l_end) - 1) / bucket_width))))
        rb = right.withColumn(
            "_bkt", F.explode(F.sequence(
                F.floor(F.col(r_start) / bucket_width),
                F.floor((F.col(r_end) - 1) / bucket_width))))
        joined = lb.join(rb, on=[*keys, "_bkt"], how="inner")
        # dedupe bucket-duplicated pairs: keep the pair only in the bucket
        # where the overlap begins
        joined = joined.where(
            F.floor(F.greatest(F.col(l_start), F.col(r_start)) / bucket_width)
            == F.col("_bkt")).drop("_bkt")
    else:
        joined = left.join(right, on=keys, how="inner")

    inter = (F.least(F.col(l_end), F.col(r_end))
             - F.greatest(F.col(l_start), F.col(r_start)))
    cov_l = inter / (F.col(l_end) - F.col(l_start))
    cov_r = inter / (F.col(r_end) - F.col(r_start))
    return joined.where((inter > 0) & ((cov_l > coverage) | (cov_r > coverage)))


def as_of_join(left: DataFrame, right: DataFrame, keys: list[str],
               l_time: str, r_time: str,
               right_cols: list[str],
               direction: str = "backward") -> DataFrame:
    """J6: for each left row, the latest right row with
    ``r_time <= l_time`` (backward) or earliest with ``>=`` (forward),
    per key — the never-rewinding cursor walk of
    ``Source/HuginMunin/HuginMuninTextRecognizer.cpp:176-202`` generalized.

    Implementation: union + single window pass (``last() over ordered
    rows``), NOT a per-group ``merge_asof`` UDF — one shuffle on the key,
    no Python, scales to any group size."""
    lt = left.withColumn("_t", F.col(l_time)).withColumn("_side", F.lit(1))
    rt = (right.select(*keys, F.col(r_time).alias("_t"),
                       *[F.col(c) for c in right_cols])
          .withColumn("_side", F.lit(0)))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    for c in left.columns:
        if c not in keys:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))

    if direction == "backward":
        # right rows sort before left rows at equal time → "<=" semantics
        w = (Window.partitionBy(*keys).orderBy(F.col("_t").asc(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = [F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                  for c in right_cols]
    else:
        w = (Window.partitionBy(*keys).orderBy(F.col("_t").desc(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = [F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                  for c in right_cols]

    keep = [c for c in left.columns]
    out = (unioned.select(*keep, F.col("_side"), *filled)
           .where("_side = 1").drop("_side"))
    return out


def nearest_neighbor_join(left: DataFrame, right: DataFrame, keys: list[str],
                          left_id: list[str], l_val: str, r_val: str,
                          right_cols: list[str],
                          max_distance: float | None = None) -> DataFrame:
    """J7/J9: for each left row (identified by ``left_id``) the right row
    minimizing ``|l_val - r_val|`` within the same key (argmin by
    (distance, tiebreak)) — the box→cell matcher of
    ``Source/Paddle/Structure.cpp:245-277`` (sort key ``:268-276``) /
    closest-text-line lookup with max-distance rejection
    ``Source/Alto/PrintSpace.cpp:23-58`` as a rank window over an
    equi-join on the key."""
    r = right.select(*keys, F.col(r_val).alias("_rv"),
                     *[F.col(c) for c in right_cols])
    joined = left.join(r, on=keys, how="inner")
    dist = F.abs(F.col(l_val) - F.col("_rv"))
    if max_distance is not None:
        joined = joined.where(dist <= max_distance)
    w = Window.partitionBy(*left_id).orderBy(dist.asc(), F.col("_rv").asc())
    return (joined.withColumn("_rk", F.row_number().over(w))
            .where("_rk = 1").drop("_rk", "_rv"))


def fuzzy_self_join_blocked(df: DataFrame, col: str, id_col: str,
                            max_dist: int = 2) -> DataFrame:
    """Blocked edit-distance self-join — record linkage / fuzzy entity
    matching: every unordered pair of rows whose ``col`` values are
    within Levenshtein distance ``max_dist``.

    Blocking is COMPLETE (no recall loss): ``|len(a) − len(b)| ≤ d`` is
    a NECESSARY condition for ``lev(a,b) ≤ d``, so candidates are
    generated by an asymmetric length-key expansion — each row probes
    as "left" under keys ``len .. len+d`` while standing as "right"
    under its own length — and every qualifying pair meets EXACTLY once
    (shorter side left; equal lengths tie-break on id).  This replaces
    the O(N²) all-pairs comparison with per-length-bucket joins; the
    expensive ``levenshtein`` runs only on survivors.  A length bucket
    is only as selective as the length distribution — for heavier
    corpora compose with a second block key (e.g. a character n-gram,
    the standard multi-pass record-linkage setup).

    Output: ``(id_a, id_b, val_a, val_b, lev)`` with ``id_a < id_b``."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    base = (df.select(F.col(id_col).alias("_fid"),
                      F.col(col).alias("_fval"))
            .where(F.col(col).isNotNull()))
    ln = F.length("_fval")
    left = base.select(
        "_fid", "_fval", ln.alias("_flen"),
        F.explode(F.sequence(ln, ln + max_dist)).alias("_k"))
    right = base.select(F.col("_fid").alias("_gid"),
                        F.col("_fval").alias("_gval"),
                        ln.alias("_k"))
    cand = (left.join(right, "_k")
            .where(((F.col("_flen") < F.col("_k"))
                    | (F.col("_fid") < F.col("_gid"))))
            .where(F.levenshtein("_fval", "_gval") <= max_dist))
    return cand.select(
        F.least("_fid", "_gid").alias("id_a"),
        F.greatest("_fid", "_gid").alias("id_b"),
        F.when(F.col("_fid") < F.col("_gid"), F.col("_fval"))
        .otherwise(F.col("_gval")).alias("val_a"),
        F.when(F.col("_fid") < F.col("_gid"), F.col("_gval"))
        .otherwise(F.col("_fval")).alias("val_b"),
        F.levenshtein("_fval", "_gval").cast("int").alias("lev"))
