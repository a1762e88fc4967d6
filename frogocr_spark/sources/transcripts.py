"""Spark builders for the transcripts table (BASELINE.json ``input_hint``).

Generation is distributed: ``spark.range(n_convs)`` fans conversation ids
across executors and a ``mapInPandas`` expands each conv into its turns via
the pure generator (`payloadgen` — a pure function of (conv, turn), so any
executor can produce any row independently; no driver materialization, no
shuffle).  This is how the synthetic 10^12-turn table would be produced on
a real cluster too: the source scales linearly with executors.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import payloadgen

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

# rows ≈ sf * ROWS_PER_SF (median ~9 turns/conv); sf0.1 → ~600k turns to
# mirror TESTDATA.md's sf0.1 = ~600k lineitem rows.
ROWS_PER_SF = 6_000_000
MEAN_TURNS = 9.0


def n_convs_for_sf(sf: float) -> int:
    return max(8, int(sf * ROWS_PER_SF / MEAN_TURNS))


def sf_of_dir(sf_dir: str) -> float:
    """Parse '…/sf0.01' → 0.01 (defensive default 0.001)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return 0.001


def generate(spark: SparkSession, n_convs: int,
             skew_conv_turns: int = 0,
             partitions: int | None = None) -> DataFrame:
    """Distributed deterministic transcripts table."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for conv in pdf["id"]:
                rows.extend(payloadgen.gen_conv(int(conv), skew_conv_turns))
            yield pd.DataFrame(
                rows, columns=[f.name for f in TRANSCRIPT_SCHEMA.fields]
            )

    convs = spark.range(0, n_convs, numPartitions=partitions)
    return convs.mapInPandas(expand, schema=TRANSCRIPT_SCHEMA)


def generate_for_sf(spark: SparkSession, sf_dir: str,
                    skew_conv_turns: int = 0) -> DataFrame:
    return generate(spark, n_convs_for_sf(sf_of_dir(sf_dir)),
                    skew_conv_turns=skew_conv_turns)
