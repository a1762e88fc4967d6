"""Event-time windows + watermark: late-data semantics, batch parity.

Three AvailableNow drains over a file stream with a shared checkpoint:
the watermark advances between drains, append mode emits each window
exactly once when the watermark passes its end, and an event later than
the watermark is DROPPED (its already-finalized window is not re-emitted
and its count is unchanged).
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from frogocr_spark.streaming.eventtime import windowed_event_stats

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write_batch(spark, path, name, rows):
    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, m), t, v)
         for i, (m, t, v) in enumerate(rows)], SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, name))


def _drain(spark, inp, out, ckpt):
    stream = (spark.readStream.schema(SCHEMA).format("parquet")
              .option("maxFilesPerTrigger", 1)
              .load(inp + "/*"))
    agg = windowed_event_stats(stream, window="10 minutes",
                               watermark_delay="5 minutes")
    q = (agg.writeStream.outputMode("append").format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "drain did not finish in 120s"


def _result(spark, out):
    return {(r.win_start.minute, r.event_type): r.n_events
            for r in spark.read.parquet(out).collect()}


def test_watermark_drops_late_data_and_emits_once(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)

    # drain 1: on-time events at :01, :12, :25 → watermark 00:20 →
    # windows [00,10) and [10,20) finalize
    _write_batch(spark, inp, "f1", [(1, "click", 1.0), (12, "click", 1.0),
                                    (25, "click", 1.0)])
    _drain(spark, inp, out, ckpt)
    res1 = _result(spark, out)
    assert res1 == {(0, "click"): 1, (10, "click"): 1}

    # drain 2: a TOO-LATE event at :12 (< watermark 00:20 → dropped; its
    # window was already emitted) + an in-watermark event at :27 + a
    # fresh one at :41 advancing the watermark to 00:36 → [20,30)
    # finalizes WITH the :27 event but WITHOUT any resurrection of [10,20)
    _write_batch(spark, inp, "f2", [(12, "click", 9.9), (27, "click", 1.0),
                                    (41, "click", 1.0)])
    _drain(spark, inp, out, ckpt)
    res2 = _result(spark, out)
    assert res2 == {(0, "click"): 1, (10, "click"): 1, (20, "click"): 2}

    # drain 3: push the watermark past 00:50 → [40,50) finalizes; the
    # late :12 event never resurfaces anywhere
    _write_batch(spark, inp, "f3", [(58, "click", 1.0)])
    _drain(spark, inp, out, ckpt)
    res3 = _result(spark, out)
    assert res3 == {(0, "click"): 1, (10, "click"): 1, (20, "click"): 2,
                    (40, "click"): 1}


def test_streaming_matches_batch_for_on_time_data(spark, tmp_path):
    """Drain of an all-on-time stream == the batch twin over the same
    rows (same plan, incremental vs one-shot)."""
    inp, out, ckpt = (str(tmp_path / d) for d in ("in2", "out2", "ckpt2"))
    os.makedirs(inp)
    rows = [(1, "click", 1.5), (3, "view", 2.0), (12, "click", 0.5),
            (14, "view", 1.0), (27, "click", 3.25), (41, "view", 7.0),
            (58, "click", 2.0)]
    _write_batch(spark, inp, "f1", rows)
    _drain(spark, inp, out, ckpt)
    streamed = {(r.win_start, r.event_type): (r.n_events, r.sum_value)
                for r in spark.read.parquet(out).collect()}
    batch_df = windowed_event_stats(
        spark.read.schema(SCHEMA).parquet(inp + "/*"),
        window="10 minutes")
    batch = {(r.win_start, r.event_type): (r.n_events, r.sum_value)
             for r in batch_df.collect()}
    # append mode only emits windows the watermark has passed — every
    # emitted window must match the batch result exactly
    assert streamed, "stream emitted nothing"
    for k, v in streamed.items():
        assert batch[k] == v


# ---------------------------------------------------------------------------
# gap-based session windows (F.session_window): merge + exactly-once close
# ---------------------------------------------------------------------------

from frogocr_spark.streaming.eventtime import session_event_stats


def _drain_sessions(spark, inp, out, ckpt):
    stream = (spark.readStream.schema(SCHEMA).format("parquet")
              .option("maxFilesPerTrigger", 1)
              .load(inp + "/*"))
    agg = session_event_stats(stream, gap="5 minutes",
                              watermark_delay="5 minutes")
    q = (agg.writeStream.outputMode("append").format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "drain did not finish in 120s"


def test_session_windows_merge_and_close(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("sin", "sout", "sckpt"))
    os.makedirs(inp)

    # events at :01, :03, :05 chain into ONE session (gaps < 5 min);
    # :20 is a separate session and pushes the watermark to :15, which
    # closes the first session (ended :10 = :05 + gap)
    _write_batch(spark, inp, "f1", [(1, "click", 1.0), (3, "click", 2.0),
                                    (5, "click", 4.0), (20, "click", 8.0)])
    _drain_sessions(spark, inp, out, ckpt)
    rows = {(r.sess_start.minute, r.sess_end.minute): (r.n_events,
                                                       r.sum_value)
            for r in spark.read.parquet(out).collect()}
    assert rows == {(1, 10): (3, 7.0)}

    # a later event at :40 pushes the watermark past the :20 session's
    # close (:25) → it emits exactly once with its original stats
    _write_batch(spark, inp, "f2", [(40, "click", 16.0)])
    _drain_sessions(spark, inp, out, ckpt)
    rows = {(r.sess_start.minute, r.sess_end.minute): (r.n_events,
                                                       r.sum_value)
            for r in spark.read.parquet(out).collect()}
    assert rows == {(1, 10): (3, 7.0), (20, 25): (1, 8.0)}


def test_session_windows_batch_twin(spark):
    from datetime import datetime as dt
    df = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 0, 1), "a", 1.0),
         (2, dt(2024, 1, 1, 0, 4), "a", 2.0),
         (3, dt(2024, 1, 1, 0, 30), "a", 4.0),
         (4, dt(2024, 1, 1, 0, 2), "b", 8.0)], SCHEMA)
    rows = {(r.event_type, r.sess_start.minute, r.sess_end.minute):
            (r.n_events, r.sum_value)
            for r in session_event_stats(df, gap="5 minutes").collect()}
    assert rows == {("a", 1, 9): (2, 3.0), ("a", 30, 35): (1, 4.0),
                    ("b", 2, 7): (1, 8.0)}
