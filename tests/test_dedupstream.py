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
    return q


def _state_rows(q):
    """Total rows held by the dedup state store after the drain."""
    prog = q.lastProgress
    return sum(op["numRowsTotal"] for op in prog["stateOperators"])


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


def test_curate_stream_gates_then_dedups(spark, tmp_path):
    """Streaming curation: quality/language/length junk never reaches
    the sink OR the dedup state; duplicates of kept docs are dropped
    within and across checkpointed drains."""
    from frogocr_spark.streaming.dedupstream import curate_stream

    inp, out, ckpt = (str(tmp_path / d) for d in ("cin", "cout", "cckpt"))
    os.makedirs(inp)
    good = ("the cat sat on the mat and it is a fine day for "
            "everyone involved in this business")
    other = ("a dog ran through the park and it was chasing the ball "
             "for hours on end that day")
    junk_short = "the a of"                       # fails min_tokens
    junk_lang = "og det er som på til av i med for og det er som på"
    op = lambda s: curate_stream(s, delay="10 minutes")  # noqa: E731

    _write_batch(spark, inp, "f1", [(1, good), (2, good), (3, junk_short),
                                    (4, junk_lang), (5, other)])
    q = _drain(spark, inp, out, ckpt, op)
    texts = [r.text for r in spark.read.parquet(out).collect()]
    assert sorted(texts) == sorted([good, other])
    # the ORDERING property, observed at the state store: gates run
    # BEFORE the stateful dedup, so state holds digests of the 2 KEPT
    # docs only — gate-after-dedup would hold 4 (junk digests too)
    assert _state_rows(q) == 2

    # restart: a dup of a kept doc is still dropped; junk still gated
    _write_batch(spark, inp, "f2", [(6, good), (7, junk_short)])
    _drain(spark, inp, out, ckpt, op)
    texts = [r.text for r in spark.read.parquet(out).collect()]
    assert sorted(texts) == sorted([good, other])


def test_near_dedup_stream_incremental_lsh(spark, tmp_path):
    """foreachBatch incremental-LSH ingestion: batch docs matching any
    KEPT base doc drop, within-batch pairs drop the larger id, and only
    survivors' signatures enter the base; replaying the drained stream
    (same checkpoint) appends nothing."""
    import os

    from frogocr_spark.sources.catalog import Table
    from frogocr_spark.streaming.dedupstream import near_dedup_batch_fn

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    uniq = {1: "alpha beta gamma delta epsilon one",
            2: "zeta eta theta iota kappa two",
            12: "completely different twelve body words here"}
    # file b0: 1, 2 unique; 3 = dup of 1 (within-batch: 3 loses)
    rows0 = [(1, uniq[1]), (2, uniq[2]), (3, uniq[1])]
    # file b1: 10 = dup of 1 (base: loses), 11 = dup of 2 (base: loses),
    # 12 unique, 13 = dup of 12 (within-batch: loses)
    rows1 = [(10, uniq[1]), (11, uniq[2]), (12, uniq[12]),
             (13, uniq[12])]
    for name, rows, mtime in (("f0", rows0, 1_700_000_000),
                              ("f1", rows1, 1_700_000_600)):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        p = os.path.join(inp, name)
        df.coalesce(1).write.mode("overwrite").parquet(p)
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    sink = Table(spark, str(tmp_path / "sink"))
    sigs = Table(spark, str(tmp_path / "sigs"))
    fn = near_dedup_batch_fn(sink, sigs, threshold=0.5, hash_fn="md5")

    def drain():
        stream = (spark.readStream
                  .schema("doc_id long, text string")
                  .format("parquet").option("maxFilesPerTrigger", 1)
                  .load(inp + "/*"))
        q = (stream.writeStream.foreachBatch(fn)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    drain()
    kept = sorted(r.doc_id for r in sink.read().collect())
    assert kept == [1, 2, 12]
    # signature base = kept docs only
    assert sorted(r.doc_id for r in sigs.read().collect()) == [1, 2, 12]
    # replay with the same checkpoint: nothing re-processed, no dupes
    drain()
    assert sorted(r.doc_id for r in sink.read().collect()) == [1, 2, 12]
