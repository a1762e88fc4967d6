"""Streaming dedup: first occurrence passes, duplicates within the
watermark horizon are dropped, and the seen-set survives checkpointed
drain/restart cycles (exactly-once across restarts)."""

from __future__ import annotations

import os
from datetime import datetime

from frogocr_spark.streaming.dedupstream import (dedup_stream_content,
                                                 dedup_stream_exact)

SCHEMA = "doc_id long, ts timestamp, text string"


def _write_batch(spark, path, name, rows):
    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, m), t) for i, (m, t) in enumerate(rows)],
        SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, name))


def _drain(spark, inp, out, ckpt, op):
    stream = (spark.readStream.schema(SCHEMA).format("parquet")
              .option("maxFilesPerTrigger", 1)
              .load(inp + "/*"))
    q = (op(stream).writeStream.outputMode("append").format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "drain did not finish in 120s"


def test_content_dedup_within_and_across_drains(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)
    op = lambda s: dedup_stream_content(s, delay="10 minutes")  # noqa: E731

    # drain 1: "alpha" arrives twice (minute 1 and 2) → one row out
    _write_batch(spark, inp, "f1", [(1, "alpha"), (2, "alpha"),
                                    (3, "beta")])
    _drain(spark, inp, out, ckpt, op)
    texts = [r.text for r in spark.read.parquet(out).collect()]
    assert sorted(texts) == ["alpha", "beta"]

    # drain 2 (restart from checkpoint): "alpha" again within the
    # horizon → still dropped; a new text passes
    _write_batch(spark, inp, "f2", [(4, "alpha"), (5, "gamma")])
    _drain(spark, inp, out, ckpt, op)
    texts = [r.text for r in spark.read.parquet(out).collect()]
    assert sorted(texts) == ["alpha", "beta", "gamma"]
    # digest column rides along for batch reconciliation
    row = spark.read.parquet(out).where("text = 'beta'").first()
    assert len(row.digest) == 32


def test_key_dedup_exact_first_wins(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)
    op = lambda s: dedup_stream_exact(  # noqa: E731
        s, ["doc_id"], delay="10 minutes")

    # doc_id 0 appears twice within one drain — first event wins
    df = spark.createDataFrame(
        [(0, datetime(2024, 1, 1, 0, 1), "first"),
         (0, datetime(2024, 1, 1, 0, 2), "dup-of-0"),
         (1, datetime(2024, 1, 1, 0, 3), "other")], SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(inp, "f1"))
    _drain(spark, inp, out, ckpt, op)
    rows = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert rows == {0: "first", 1: "other"}

    # batch parity: the same frame deduped in batch mode yields the same
    # key set (streaming semantics are a superset: watermark eviction)
    batch = spark.createDataFrame(
        [(0, datetime(2024, 1, 1, 0, 1), "first"),
         (0, datetime(2024, 1, 1, 0, 2), "dup"),
         (1, datetime(2024, 1, 1, 0, 3), "other")], SCHEMA)
    assert batch.dropDuplicates(["doc_id"]).count() == 2
