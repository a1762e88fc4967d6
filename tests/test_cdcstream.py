"""Streaming CDC apply (streaming/cdcstream): drained stream state ==
one batch MERGE of the same changes, last-writer-wins within a batch,
incremental checkpointed drains, replay idempotence (logged batch +
publish-without-log crash window)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from frogocr_spark.sources.catalog import Table
from frogocr_spark.streaming.cdcstream import (cdc_merge_batch_fn,
                                               compact_cdc_batch,
                                               start_cdc_merge)

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("v", StringType()),
    StructField("seq", LongType()),
])


def _cdc(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _drain(spark, input_dir, tbl_dir, ckpt):
    q = start_cdc_merge(spark, input_dir, SCHEMA, Table(spark, tbl_dir),
                        ["id"], "seq", ckpt)
    q.awaitTermination()


def _state(spark, tbl_dir):
    return {r.id: r.v for r in Table(spark, tbl_dir).read().collect()}


def test_compact_cdc_batch_last_seq_wins(spark):
    b = _cdc(spark, [(1, "a", 1), (1, "b", 3), (1, "c", 2), (2, "x", 1)])
    got = {r.id: (r.v, r.seq) for r in
           compact_cdc_batch(b, ["id"], "seq").collect()}
    assert got == {1: ("b", 3), 2: ("x", 1)}


def test_drained_stream_equals_single_merge(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    tbl_dir = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    # three CDC files: inserts, then updates + new keys, then an update
    _cdc(spark, [(1, "a", 1), (2, "b", 2)]).coalesce(1) \
        .write.mode("append").parquet(input_dir)
    _cdc(spark, [(2, "B", 3), (3, "c", 4)]).coalesce(1) \
        .write.mode("append").parquet(input_dir)
    _cdc(spark, [(1, "A", 5)]).coalesce(1) \
        .write.mode("append").parquet(input_dir)
    _drain(spark, input_dir, tbl_dir, ckpt)
    assert _state(spark, tbl_dir) == {1: "A", 2: "B", 3: "c"}


def test_incremental_drain_resumes_from_checkpoint(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    tbl_dir = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    _cdc(spark, [(1, "a", 1)]).coalesce(1).write.mode("append") \
        .parquet(input_dir)
    _drain(spark, input_dir, tbl_dir, ckpt)
    assert _state(spark, tbl_dir) == {1: "a"}
    # new CDC file after the first drain: only IT is processed next
    _cdc(spark, [(1, "a2", 2), (2, "b", 3)]).coalesce(1) \
        .write.mode("append").parquet(input_dir)
    _drain(spark, input_dir, tbl_dir, ckpt)
    assert _state(spark, tbl_dir) == {1: "a2", 2: "b"}


def test_replay_of_logged_batch_is_noop(spark, tmp_path):
    tbl = Table(spark, str(tmp_path / "tbl"))
    fn = cdc_merge_batch_fn(tbl, ["id"], "seq")
    fn(_cdc(spark, [(1, "a", 1), (2, "b", 1)]), 0)
    snaps_before = tbl.snapshots()
    # Spark redelivers batch 0 (at-least-once): logged -> short-circuit
    fn(_cdc(spark, [(1, "a", 1), (2, "b", 1)]), 0)
    assert tbl.snapshots() == snaps_before
    assert {r.id: r.v for r in tbl.read().collect()} == {1: "a", 2: "b"}


def test_crash_between_publish_and_log_recovers(spark, tmp_path):
    """Publish succeeded, log write lost: the replay must recognize the
    published snapshot, re-log it, and NOT raise or double-apply."""
    import os

    tbl = Table(spark, str(tmp_path / "tbl"))
    fn = cdc_merge_batch_fn(tbl, ["id"], "seq")
    fn(_cdc(spark, [(1, "a", 1)]), 0)
    fn(_cdc(spark, [(1, "A", 2), (2, "b", 2)]), 1)
    # simulate the crash window: erase batch 1 from the applied log
    log = os.path.join(tbl.path, "_CDC_APPLIED")
    with open(log) as fh:
        lines = [ln for ln in fh.read().split() if ln != "cdc-1"]
    with open(log, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    fn(_cdc(spark, [(1, "A", 2), (2, "b", 2)]), 1)     # replay
    assert {r.id: r.v for r in tbl.read().collect()} == {1: "A", 2: "b"}
    with open(log) as fh:
        assert fh.read().split().count("cdc-1") == 1


def test_empty_batch_is_logged_not_merged(spark, tmp_path):
    tbl = Table(spark, str(tmp_path / "tbl"))
    fn = cdc_merge_batch_fn(tbl, ["id"], "seq")
    fn(_cdc(spark, [(1, "a", 1)]), 0)
    fn(_cdc(spark, []), 1)               # empty CDC batch
    assert {r.id: r.v for r in tbl.read().collect()} == {1: "a"}
    import os
    with open(os.path.join(tbl.path, "_CDC_APPLIED")) as fh:
        assert "cdc-1" in fh.read().split()
