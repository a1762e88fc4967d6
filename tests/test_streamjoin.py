"""Stream-stream interval join: batch parity, exactly-once across
incremental drains, and the range-condition state-bounding contract.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from frogocr_spark.streaming.streamjoin import interval_stream_join

SCHEMA = "user_id long, event_id long, ts timestamp"


def _rows(spark, rows):
    return spark.createDataFrame(
        [(u, i, datetime(2024, 1, 1, 0, m, s)) for (u, i, m, s) in rows],
        SCHEMA)


def _write(spark, path, name, rows):
    _rows(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, name))


def _drain(spark, lin, rin, out, ckpt):
    ls = (spark.readStream.schema(SCHEMA).format("parquet")
          .option("maxFilesPerTrigger", 1).load(lin + "/*"))
    rs = (spark.readStream.schema(SCHEMA).format("parquet")
          .option("maxFilesPerTrigger", 1).load(rin + "/*"))
    j = interval_stream_join(ls, rs, "user_id", max_lag="10 minutes")
    q = (j.writeStream.outputMode("append").format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "drain did not finish in 180s"


def _pairs(spark, out):
    return {(r.user_id, r.l_event_id, r.r_event_id, r.lag_us)
            for r in spark.read.parquet(out).collect()}


def test_stream_join_matches_batch(spark, tmp_path):
    lin, rin, out, ckpt = (str(tmp_path / d)
                           for d in ("l", "r", "out", "ckpt"))
    os.makedirs(lin), os.makedirs(rin)
    clicks = [(1, 10, 0, 0), (1, 11, 5, 0), (2, 12, 0, 0),
              (1, 13, 30, 0)]
    buys = [(1, 20, 8, 0),    # joins clicks 10 (8 min) and 11 (3 min)
            (2, 21, 15, 0),   # 15 min after click 12 -> outside window
            (3, 22, 1, 0)]    # no click for user 3
    _write(spark, lin, "f1", clicks)
    _write(spark, rin, "f1", buys)
    _drain(spark, lin, rin, out, ckpt)
    got = _pairs(spark, out)
    batch = {(r.user_id, r.l_event_id, r.r_event_id, r.lag_us)
             for r in interval_stream_join(
                 _rows(spark, clicks), _rows(spark, buys), "user_id",
                 max_lag="10 minutes").collect()}
    assert got == batch == {(1, 10, 20, 480_000_000),
                            (1, 11, 20, 180_000_000)}


def test_stream_join_exactly_once_across_drains(spark, tmp_path):
    lin, rin, out, ckpt = (str(tmp_path / d)
                           for d in ("l", "r", "out", "ckpt"))
    os.makedirs(lin), os.makedirs(rin)
    # drain 1: click at :00, purchase at :04 -> one pair
    _write(spark, lin, "f1", [(1, 10, 0, 0)])
    _write(spark, rin, "f1", [(1, 20, 4, 0)])
    _drain(spark, lin, rin, out, ckpt)
    assert _pairs(spark, out) == {(1, 10, 20, 240_000_000)}
    # drain 2: a NEW purchase at :07 joins the ALREADY-SEEN click from
    # drain 1 (it is still inside the watermark horizon / join state);
    # the old pair is NOT re-emitted
    _write(spark, rin, "f2", [(1, 21, 7, 0)])
    _drain(spark, lin, rin, out, ckpt)
    assert _pairs(spark, out) == {(1, 10, 20, 240_000_000),
                                  (1, 10, 21, 420_000_000)}
    # drain 3: nothing new -> nothing emitted
    _drain(spark, lin, rin, out, ckpt)
    assert len(_pairs(spark, out)) == 2


def test_stream_join_plan_has_bounded_state_condition(spark, tmp_path):
    """The physical streaming plan must carry watermarks on BOTH sides —
    the precondition for state eviction in a stream-stream join (without
    them Spark either rejects append mode or buffers forever)."""
    lin, rin = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lin), os.makedirs(rin)
    _write(spark, lin, "f1", [(1, 10, 0, 0)])
    _write(spark, rin, "f1", [(1, 20, 4, 0)])
    ls = (spark.readStream.schema(SCHEMA).format("parquet")
          .load(lin + "/*"))
    rs = (spark.readStream.schema(SCHEMA).format("parquet")
          .load(rin + "/*"))
    j = interval_stream_join(ls, rs, "user_id", max_lag="10 minutes")
    assert j.isStreaming
    plan = j._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
