"""SparkSession factory with the engine's standard configuration.

Settings chosen for the execution model this engine targets (SURVEY §4):
AQE with skew-join handling for the conv_id skew path, Arrow for the
mapInArrow extraction operator, UTC session timezone so DuckDB oracle
comparisons are stable, shuffle partitions sized to cores (local mode)
instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Bounds per-batch UDF memory (north-rule T3 analog).  64k rows of ~0.5 KB
# transcript text ≈ 32 MB in flight per core — measured faster than 10k
# (fewer Arrow flushes + fewer Python-side loop iterations) and still far
# inside executor memory at 32 concurrent tasks.
ARROW_BATCH_ROWS = 65_536


def get_spark(app_name: str = "frogocr_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # storage-partitioned joins over conv_id-bucketed tables: allow a
        # join on (conv_id, turn_idx) to reuse hash co-location on the
        # conv_id bucket key alone (sources/catalog.BucketedTable — the
        # shuffle-free resume anti-join at 10^12-row scale)
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
