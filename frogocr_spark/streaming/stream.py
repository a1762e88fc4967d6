"""Streaming extraction: the reference's hand-rolled micro-batch loop
(SURVEY §2.8) re-expressed as Structured Streaming.

Mapping (reference → Spark):
- poll loop + empty-queue sleep (``Source/Application.cpp:287-336``, 30 s
  default) → ``trigger(processingTime=...)``
- ``--exit-if-no-tasks`` drain mode (``:267-274,310-313``) →
  ``Trigger.AvailableNow`` (process the backlog, stop)
- backpressure ``maxTasksPerThread`` (``:318-335``) →
  ``maxFilesPerTrigger``
- at-most-once fetch-then-delete (``:62-64,518-521``) → checkpointed
  offsets + idempotent per-epoch writes = exactly-once (strictly stronger)

The transformation is the SAME fused extraction operator as the batch
plan — Structured Streaming reuses the incremental Catalyst plan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.extraction import extract_turns
from ..sources.catalog import Table
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def start_stream(spark: SparkSession, input_dir: str, output_dir: str,
                 checkpoint_dir: str | None = None,
                 available_now: bool = True,
                 max_files_per_trigger: int | None = None) -> StreamingQuery:
    """Stream transcripts parquet dir → extraction table (exactly-once)."""
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(output_dir, "_checkpoint")
    reader = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)

    extracted = extract_turns(stream)
    out_table = Table(spark, os.path.join(output_dir, "extractions"))

    def write_epoch(batch_df, epoch_id: int) -> None:
        # idempotent per-epoch append: a replayed epoch overwrites itself
        out_table.append(batch_df, run_id=f"epoch_{epoch_id}")

    writer = (extracted.writeStream
              .foreachBatch(write_epoch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


def run_drain(spark: SparkSession, input_dir: str, output_dir: str,
              **kwargs) -> None:
    """--exit-if-no-tasks analog: process everything available, stop."""
    q = start_stream(spark, input_dir, output_dir, available_now=True, **kwargs)
    q.awaitTermination()
