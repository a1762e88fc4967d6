"""Per-partition lineage + metrics sidecar (north-rule requirement).

The analog of FrogOCR's per-stage ``Processing`` provenance records
(reference ``Source/TaskProcessor.cpp:19-88,338-355``) and per-processor
counters (``Source/TaskProcessor.hpp:51``, ``Source/Application.cpp:
318-331``), re-expressed as one aggregation over the extraction output:

``(run_id, partition_id) → rows_in, rows_out, empty_after_strip,
parse_failures, n_convs, stage_settings)``

``rows_in == rows_out`` by construction (extraction is 1:1) but both are
recorded so the reconciliation invariant
``rows_in == rows_out`` / ``rows_out >= empty + failures`` is checkable
from the sidecar alone (FIXTURES.md §5.6).  Aggregation is map-side
partial (plain ``groupBy().agg`` — Spark does the partial/final split).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sidecar(extracted: DataFrame, run_id: str,
                  stage_settings: dict | None = None) -> DataFrame:
    """Aggregate the extraction output into the lineage sidecar table."""
    settings_json = json.dumps(stage_settings or {}, sort_keys=True)
    return (
        extracted
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.count(F.lit(1)).alias("rows_out"),
            F.sum(F.col("empty_after_strip").cast("long")).alias("empty_after_strip"),
            F.sum(F.col("parse_failed").cast("long")).alias("parse_failures"),
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
            F.avg("confidence").alias("mean_confidence"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage_settings", F.lit(settings_json))
        # wall-clock provenance lives ONLY here (C9: timestamps never enter
        # the matched output — reference Processing.dateTime analog,
        # Source/TaskProcessor.cpp:11-13)
        .withColumn("created_at", F.current_timestamp())
    )
