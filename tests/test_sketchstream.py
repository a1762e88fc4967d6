"""Streaming HLL ingestion (streaming/sketchstream): drain == batch
estimate exactly, bounded per-batch state, idempotence under replay
(the max-merge monoid), and checkpointed incremental drains."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from frogocr_spark.operators.sketches import hll_constants, hll_estimate
from frogocr_spark.sources.catalog import Table
from frogocr_spark.streaming.sketchstream import (hll_read_estimate,
                                                  start_hll_ingest)

SCHEMA = StructType([
    StructField("grp", StringType()),
    StructField("key", LongType()),
])


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [("even" if k % 2 == 0 else "odd", k) for k in range(lo, hi)],
        SCHEMA)


def _drain(spark, input_dir, regs_dir, ckpt):
    q = start_hll_ingest(spark, input_dir, SCHEMA, Table(spark, regs_dir),
                         ["grp"], "key", ckpt, p=8)
    q.awaitTermination()


def test_streamed_estimate_equals_batch_exactly(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    regs_dir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    # three files -> micro-batches with overlapping key ranges
    _rows(spark, 0, 400).coalesce(1).write.mode("append").parquet(input_dir)
    _rows(spark, 200, 700).coalesce(1).write.mode("append") \
        .parquet(input_dir)
    _rows(spark, 650, 900).coalesce(1).write.mode("append") \
        .parquet(input_dir)
    _drain(spark, input_dir, regs_dir, ckpt)

    streamed = {r["grp"]: (r["reg_sum_scaled"], r["hll_est"])
                for r in hll_read_estimate(spark, Table(spark, regs_dir),
                                           ["grp"]).collect()}
    batch = {r["grp"]: (r["reg_sum_scaled"], r["hll_est"])
             for r in hll_estimate(_rows(spark, 0, 900), ["grp"],
                                   "key").collect()}
    # registers are deterministic -> EXACT equality, not approximate
    assert streamed == batch


def test_per_batch_state_is_bounded_by_m(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    regs_dir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, 0, 5000).coalesce(1).write.parquet(input_dir)
    _drain(spark, input_dir, regs_dir, ckpt)
    regs = Table(spark, regs_dir).read()
    m = hll_constants(8)["m"]
    per_group = {r["grp"]: r["n"] for r in
                 regs.groupBy("grp").count()
                 .withColumnRenamed("count", "n").collect()}
    assert all(n <= m for n in per_group.values())
    # 2500 distinct keys per group versus <= 256 register rows
    assert sum(per_group.values()) <= 2 * m


def test_replayed_batch_changes_nothing(spark, tmp_path):
    """The monoid property: appending the SAME register run under a
    different run_id (simulated at-least-once redelivery that dodged
    the idempotent-append guard) leaves the estimate untouched."""
    input_dir = str(tmp_path / "in")
    regs_dir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, 0, 1000).coalesce(1).write.parquet(input_dir)
    _drain(spark, input_dir, regs_dir, ckpt)
    t = Table(spark, regs_dir)
    before = {r["grp"]: r["hll_est"]
              for r in hll_read_estimate(spark, t, ["grp"]).collect()}
    # duplicate ALL existing register rows under a fresh run id
    t.append(t.read(), run_id="replay")
    after = {r["grp"]: r["hll_est"]
             for r in hll_read_estimate(spark, t, ["grp"]).collect()}
    assert after == before


def test_checkpoint_incremental_drain(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    regs_dir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, 0, 300).coalesce(1).write.mode("append").parquet(input_dir)
    _drain(spark, input_dir, regs_dir, ckpt)
    est1 = {r["grp"]: r["hll_est"]
            for r in hll_read_estimate(spark, Table(spark, regs_dir),
                                       ["grp"]).collect()}
    # second drain, same checkpoint, no new files -> unchanged
    _drain(spark, input_dir, regs_dir, ckpt)
    est2 = {r["grp"]: r["hll_est"]
            for r in hll_read_estimate(spark, Table(spark, regs_dir),
                                       ["grp"]).collect()}
    assert est2 == est1
    # new file -> estimate equals the batch answer over the union
    _rows(spark, 300, 800).coalesce(1).write.mode("append") \
        .parquet(input_dir)
    _drain(spark, input_dir, regs_dir, ckpt)
    est3 = {r["grp"]: r["hll_est"]
            for r in hll_read_estimate(spark, Table(spark, regs_dir),
                                       ["grp"]).collect()}
    batch = {r["grp"]: r["hll_est"]
             for r in hll_estimate(_rows(spark, 0, 800), ["grp"],
                                   "key").collect()}
    assert est3 == batch
