"""global_rank: scalable dense global rank (range partition + offsets).

Checked against the single-partition ``Window.orderBy`` row_number it
replaces — identical output on unique keys, at several partition counts
(including more partitions than rows, which exercises empty ranges)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from frogocr_spark.operators.ranking import global_rank


@pytest.mark.parametrize("num_partitions", [1, 3, 8, 64])
def test_global_rank_matches_window(spark, num_partitions):
    rows = [(i, f"tok{i % 7}_{i}") for i in range(37)]
    df = spark.createDataFrame(rows, "t_df long, token string")
    got = {(r["token"], r["rank"]) for r in
           global_rank(df, ["t_df", "token"],
                       num_partitions=num_partitions).collect()}
    w = Window.orderBy("t_df", "token")
    want = {(r["token"], r["rank"]) for r in
            df.withColumn("rank",
                          F.row_number().over(w).cast("long")).collect()}
    assert got == want


def test_global_rank_is_dense_and_order_consistent(spark):
    df = spark.createDataFrame(
        [(5, "e"), (1, "a"), (3, "c"), (3, "b"), (9, "z")],
        "t_df long, token string")
    out = sorted(global_rank(df, ["t_df", "token"]).collect(),
                 key=lambda r: r["rank"])
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    assert [r["token"] for r in out] == ["a", "b", "c", "e", "z"]


def test_global_rank_empty(spark):
    df = spark.createDataFrame([], "t_df long, token string")
    assert global_rank(df, ["t_df", "token"]).count() == 0
