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


# --------------------------------------------------------------- CMS

def test_cms_stream_drain_equals_batch_sketch(spark, tmp_path):
    from frogocr_spark.operators.sketches import cms_build, cms_estimate
    from frogocr_spark.streaming.sketchstream import (cms_read_sketch,
                                                      start_cms_ingest)
    input_dir = str(tmp_path / "in")
    cells_dir = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, 0, 300).coalesce(1).write.mode("append").parquet(input_dir)
    _rows(spark, 100, 500).coalesce(1).write.mode("append") \
        .parquet(input_dir)
    q = start_cms_ingest(spark, input_dir, SCHEMA, Table(spark, cells_dir),
                         "key", ckpt, d=3, w=64)
    q.awaitTermination()
    streamed = {(r["row"], r["col"]): r["cnt"] for r in
                cms_read_sketch(spark, Table(spark, cells_dir)).collect()}
    batch = {(r["row"], r["col"]): r["cnt"] for r in
             cms_build(_rows(spark, 0, 300)
                       .union(_rows(spark, 100, 500)), "key",
                       d=3, w=64).collect()}
    assert streamed == batch
    # and estimates read off the merged sketch respect the CMS bound
    merged = cms_read_sketch(spark, Table(spark, cells_dir))
    keys = _rows(spark, 0, 500).select("key").distinct()
    est = {r["key"]: r["cms_est"] for r in
           cms_estimate(merged, keys, "key", d=3, w=64).collect()}
    assert all(est[k] >= (2 if 100 <= k < 300 else 1)
               for k in range(0, 500))


def test_cms_replay_idempotent_append_vs_raw_duplicate(spark, tmp_path):
    """The monoid contrast: CMS cells are sum-merged, so exactly-once
    rests on the idempotent run_id append — a replay through it is a
    no-op, while a raw duplicate under a NEW run_id double-counts."""
    from frogocr_spark.operators.sketches import cms_build
    from frogocr_spark.streaming.sketchstream import cms_read_sketch
    t = Table(spark, str(tmp_path / "cells"))
    cells = cms_build(_rows(spark, 0, 200), "key", d=3, w=64)
    t.append(cells, run_id="b0")
    base = {(r["row"], r["col"]): r["cnt"]
            for r in cms_read_sketch(spark, t).collect()}
    # replayed batch, SAME run id -> staged append replaces its own
    # files; sketch unchanged
    t.append(cells, run_id="b0")
    again = {(r["row"], r["col"]): r["cnt"]
             for r in cms_read_sketch(spark, t).collect()}
    assert again == base
    # raw duplicate under a fresh run id -> counts double (the failure
    # mode HLL's max-merge is immune to; see test_replayed_batch_*)
    t.append(cells, run_id="b0dup")
    doubled = {(r["row"], r["col"]): r["cnt"]
               for r in cms_read_sketch(spark, t).collect()}
    assert doubled == {c: 2 * n for c, n in base.items()}
