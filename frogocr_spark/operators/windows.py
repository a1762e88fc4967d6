"""Window / sort / top-k operators (SURVEY §2.5 W1-W7).

All pure DataFrame compositions — Catalyst plans them; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def priority_limit(df: DataFrame, order_col: str, n: int,
                   tiebreak: str | None = None) -> DataFrame:
    """W2: ``ORDER BY priority DESC LIMIT n`` (task-queue fetch — reference
    ``Source/Application.cpp:503-504``).  Physical plan is
    TakeOrderedAndProject: no full sort, a per-partition top-n + merge."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return df.orderBy(*order).limit(n)


def positional_ids(df: DataFrame, partition_cols: list[str],
                   order_cols: list[str], id_col: str = "pos_id") -> DataFrame:
    """W3: deterministic positional-ID assignment — the ALTO ``…_tb_i`` ID
    scheme (reference ``Source/Alto/WriteXml.cpp:130-137,164-181``) as
    ``row_number()`` over a stable data-keyed window."""
    w = Window.partitionBy(*partition_cols).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(id_col, F.row_number().over(w))


def reading_order_rank(df: DataFrame, partition_cols: list[str],
                       y_col: str, x_col: str, band: int = 10,
                       rank_col: str = "read_rank",
                       tiebreak: str | None = None) -> DataFrame:
    """W1 (relational analog): band-then-x reading order as a window rank.

    The exact reference algorithm (single bubble pass,
    ``Source/Paddle/PaddleTextDetector.cpp:337-352``) lives in
    core.segment.reading_order for per-turn payloads; this is the
    SQL-expressible large-scale variant: quantize y into bands, rank by
    (band, x, y)."""
    band_col = F.floor(F.col(y_col) / F.lit(band))
    order = [band_col, F.col(x_col), F.col(y_col)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w))


def top_k_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                    k: int, desc: bool = True,
                    tiebreak: str | None = None) -> DataFrame:
    """W5-adjacent: top-k per group via rank window (NMS's 'sort by score,
    keep best' half; the IoU suppression half needs the sequential pass in
    core/UDF)."""
    order = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("_rk", F.row_number().over(w))
              .where(F.col("_rk") <= k).drop("_rk"))


def intern_dimension(df: DataFrame, group_cols: list[str],
                     dim_cols: list[str],
                     idx_col: str = "style_ref") -> DataFrame:
    """J8: per-group dimension interning — distinct ``dim_cols`` values get
    a dense 0-based index per group (the font-interning loop of
    ``Source/Tesseract/TesseractTextRecognizer.cpp:107-120`` as a
    dense_rank window; first-seen order replaced by sorted order for
    determinism under parallelism)."""
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() for c in dim_cols])
    return df.withColumn(idx_col, F.dense_rank().over(w) - 1)


def mode_per_group(df: DataFrame, group_cols: list[str], value_col: str,
                   out_col: str = "mode_value") -> DataFrame:
    """A3: most-frequent value per group (rotation-angle histogram argmax —
    reference ``Source/Tesseract/TesseractTextRecognizer.cpp:366-376``).
    Ties break to the smallest value (deterministic)."""
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_n").desc(), F.col(value_col).asc())
    return (counts.withColumn("_rk", F.row_number().over(w))
            .where("_rk = 1")
            .select(*group_cols, F.col(value_col).alias(out_col)))
