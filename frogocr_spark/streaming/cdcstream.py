"""Streaming CDC apply — continuous MERGE INTO (upsert) of a
change-data-capture stream into a catalog ``Table``.

Each micro-batch is one MERGE: matched target rows are replaced by the
batch's version, new keys are inserted (``operators/tables.upsert``
inside ``sources/catalog.Table.merge``'s crash-safe two-phase snapshot
publish).  Exactly-once rests on TWO independent legs:

1. **Replay idempotence of the operation itself** — upsert is
   idempotent: MERGE-ing the same batch twice yields the identical
   table state (the replayed rows replace themselves).  This is the
   same exactly-once-in-effect argument as the HLL register max-monoid
   in ``sketchstream``, and unlike the CMS sum-merge it holds with no
   sink cooperation at all.
2. **The applied-batch log** — ``_CDC_APPLIED`` records every batch id
   whose merge PUBLISHED.  A replayed batch id short-circuits before
   doing any work, which (a) saves the full-table rewrite a blind
   re-merge would burn, and (b) sidesteps the snapshot-id collision a
   re-merge under the same ``merge_id`` would raise.  The log is
   appended AFTER the atomic publish: a crash between publish and log
   write costs one redundant-but-idempotent re-merge attempt, never a
   lost or doubled change.  Spark only ever replays the LAST
   un-checkpointed batch, so a logged batch can never arrive again with
   different content.

Within-batch semantics: a CDC batch may carry several versions of one
key; the LAST by ``(seq_col)`` wins (the standard CDC compaction),
reduced with one keyed window BEFORE the merge so the MERGE
cardinality precondition (one source row per key) holds.

Scale shape: batch compaction is one keyed window over the (small) CDC
batch; the merge's anti-join broadcasts the batch keys against the big
table (AQE picks broadcast-anti for a CDC-sized source).  The
full-table rewrite per batch is the sandbox-scale analog of Iceberg's
matched-file rewrite — at 100 TB the merge would rewrite only affected
partitions; the protocol (manifest supersede + atomic publish + applied
log) is the part that transfers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_cdc_batch(batch_df: DataFrame, key_cols: list[str],
                      seq_col: str) -> DataFrame:
    """Last-writer-wins compaction of a CDC batch: keep each key's row
    with the highest ``(seq_col, <key tiebreak>)`` — one window over the
    batch, deterministic for duplicated (key, seq) pairs."""
    from pyspark.sql import Window
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(seq_col).desc(), *[F.col(c) for c in key_cols]))
    return (batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def _applied_log(table) -> str:
    return os.path.join(table.path, "_CDC_APPLIED")


def _applied_ids(table) -> set[str]:
    p = _applied_log(table)
    if not os.path.exists(p):
        return set()
    with open(p) as fh:
        return set(fh.read().split())


def cdc_merge_batch_fn(table, key_cols: list[str], seq_col: str):
    """A ``foreachBatch`` function: compact the batch (last seq wins per
    key), MERGE it into ``table``, log the batch id.  Replays of logged
    batches are no-ops; an unlogged replay whose snapshot already
    published (crash in the log-write window) is recognized and only
    re-logged."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        mid = f"cdc-{batch_id}"
        applied = _applied_ids(table)
        if mid in applied:
            return                       # replay of a completed batch
        compacted = compact_cdc_batch(batch_df, key_cols, seq_col)
        if not compacted.head(1):
            pass                         # empty batch: log it and move on
        elif os.path.isdir(os.path.join(table.data_dir, f"run_id={mid}")):
            pass                         # published, log write was lost
        else:
            table.merge(compacted.drop(seq_col), key_cols, merge_id=mid)
        os.makedirs(table.path, exist_ok=True)
        with open(_applied_log(table), "a") as fh:
            fh.write(mid + "\n")

    return fn


def start_cdc_merge(spark: SparkSession, input_dir: str, schema, table,
                    key_cols: list[str], seq_col: str,
                    checkpoint_dir: str, available_now: bool = True):
    """Wire a file-source CDC stream into the merge sink.  AvailableNow
    drains the backlog and stops (the batch-parity test mode); the
    checkpoint makes restarts resume at the next unseen file."""
    reader = spark.readStream.schema(schema).parquet(input_dir)
    writer = (reader.writeStream
              .foreachBatch(cdc_merge_batch_fn(table, key_cols, seq_col))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
