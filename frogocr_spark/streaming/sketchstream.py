"""Streaming sketch ingestion — continuous distinct-counting with
bounded state, the streaming face of ``operators/sketches``.

The HLL register table is a MONOID under element-wise max: merging is
associative, commutative and IDEMPOTENT.  That last property is the
whole design: a replayed or duplicated micro-batch contributes register
rows whose max-merge changes nothing, so the ingest is exactly-once *in
effect* under plain at-least-once delivery — no transactional sink
required (the idempotent ``run_id=b<batch_id>`` append is still used,
purely to keep storage from accumulating duplicate files).

Per micro-batch the state written is <= m registers per group —
REGARDLESS of batch size — so a 10^12-row stream accumulates kilobytes
of sketch, not a key set.  Readers max-merge all appended runs and run
the shared estimate finish (``hll_estimate_from_registers``), which is
the byte-identical computation the hash-checked batch query
``hll_distinct`` performs — the streaming path inherits the oracle
verification through the shared code.

Contrast with ``dedupstream``: exact streaming dedup needs
watermark-bounded key state (exactness costs state); the sketch trades
a quantified ~1.04/sqrt(m) error for state independent of the stream
length.  Both tiers are part of the 100 TB surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import (hll_estimate_from_registers,
                                  hll_merge_registers, hll_registers)


def hll_ingest_batch_fn(regs_table, group_cols: list[str], key_col: str,
                        p: int = 8):
    """A ``foreachBatch`` function: collapse each micro-batch to its
    register table (<= m rows per group) and append idempotently.
    ``regs_table`` is a ``sources.catalog.Table``."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, group_cols, key_col, p)
        regs_table.append(regs, run_id=f"b{batch_id}")

    return fn


def hll_read_estimate(spark: SparkSession, regs_table,
                      group_cols: list[str], p: int = 8) -> DataFrame:
    """Current per-group estimate over everything ingested so far:
    max-merge all appended register runs, then the shared finish."""
    regs = hll_merge_registers(regs_table.read(), group_cols)
    return hll_estimate_from_registers(regs, group_cols, p)


def start_hll_ingest(spark: SparkSession, input_dir: str, schema,
                     regs_table, group_cols: list[str], key_col: str,
                     checkpoint_dir: str, p: int = 8,
                     available_now: bool = True):
    """Wire a file-source stream into the register sink.  AvailableNow
    drains the backlog and stops (the batch-parity test mode); the
    checkpoint makes restarts resume at the next unseen file."""
    reader = (spark.readStream.schema(schema).parquet(input_dir))
    writer = (reader.writeStream
              .foreachBatch(hll_ingest_batch_fn(regs_table, group_cols,
                                                key_col, p))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Count-min streaming ingest — the instructive CONTRAST to the HLL path
# above.  CMS cells merge by SUM: associative and commutative but NOT
# idempotent, so a replayed micro-batch WOULD double-count.  Here
# exactly-once must come from the sink — the catalog Table's
# run_id=b<batch_id> staged append replaces a replayed batch's own files
# instead of adding to them.  The test suite pins both facts: a replay
# through the idempotent append changes nothing, and a raw duplicate
# append (bypassing the guard) visibly inflates counts — the failure
# mode the HLL monoid is immune to.
# ---------------------------------------------------------------------------


def cms_ingest_batch_fn(cells_table, key_col: str, d: int = 4,
                        w: int = 512):
    """``foreachBatch``: collapse each micro-batch to its d*w-bounded
    cell table and append under ``run_id=b<batch_id>``."""
    from ..operators.sketches import cms_build

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        cells = cms_build(batch_df, key_col, d, w)
        cells_table.append(cells, run_id=f"b{batch_id}")

    return fn


def cms_read_sketch(spark: SparkSession, cells_table) -> DataFrame:
    """Current sketch over everything ingested: SUM-merge all appended
    cell runs (cnt is additive across batches)."""
    from pyspark.sql import functions as F
    return (cells_table.read()
            .groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt")))


def start_cms_ingest(spark: SparkSession, input_dir: str, schema,
                     cells_table, key_col: str, checkpoint_dir: str,
                     d: int = 4, w: int = 512,
                     available_now: bool = True):
    """File-source stream -> CMS cell sink (see start_hll_ingest)."""
    reader = (spark.readStream.schema(schema).parquet(input_dir))
    writer = (reader.writeStream
              .foreachBatch(cms_ingest_batch_fn(cells_table, key_col,
                                                d, w))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
