"""Event-time windowed aggregation with watermarked late-data handling.

The reference has no event-time semantics (its queue is processing-time
FIFO-by-priority — SURVEY §2.8), but a transcript pipeline at production
scale ingests continuously and late turns are routine.  This module adds
the Spark-native form: tumbling event-time windows + watermark.

One aggregation definition serves BOTH execution modes (Structured
Streaming reuses the incremental Catalyst plan):

- batch: plain `groupBy(window(ts))` — DuckDB-oracled via ``time_bucket``
  (tumbling windows align to the epoch in both engines, so bucket
  boundaries agree for divisor-of-hour widths).
- streaming: ``withWatermark`` bounds the aggregation state (windows
  older than the watermark are finalized and evicted) and drops events
  arriving later than ``watermark_delay`` past the max seen event time —
  in append mode a window is emitted exactly once, when the watermark
  passes its end (late-data semantics tested in
  tests/test_eventtime.py).

State size at scale = open windows × groups, independent of input volume
— the watermark is what makes a 10^12-event stream feasible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(df: DataFrame, *, window: str = "10 minutes",
                         watermark_delay: str = "5 minutes",
                         time_col: str = "ts",
                         key_col: str = "event_type") -> DataFrame:
    """Tumbling event-time window stats per key; mode chosen by the
    input: a streaming frame gets the watermark, a batch frame is the
    oracle-checkable twin (identical results for on-time data)."""
    d = df.withWatermark(time_col, watermark_delay) if df.isStreaming else df
    return (d.groupBy(F.window(time_col, window).alias("win"),
                      F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    key_col, "n_events", "sum_value"))


def session_event_stats(df: DataFrame, *, gap: str = "10 minutes",
                        watermark_delay: str = "5 minutes",
                        time_col: str = "ts",
                        key_col: str = "event_type") -> DataFrame:
    """GAP-based session windows per key (``F.session_window``): a
    session extends while successive events arrive within ``gap`` of the
    previous one and closes after a quiet period — the streaming-native
    twin of the batch ``sessionize`` contract query (lag-threshold
    cumulative-sum sessionization).

    Unlike tumbling windows, session windows MERGE as late events bridge
    two open sessions; Spark handles the merge in the state store.  In
    append mode a session is emitted exactly once, when the watermark
    passes its close (tested across checkpointed drains in
    tests/test_eventtime.py).  Batch mode on the same definition is the
    oracle-checkable twin."""
    d = df.withWatermark(time_col, watermark_delay) if df.isStreaming else df
    return (d.groupBy(F.session_window(time_col, gap).alias("sess"),
                      F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"),
                    key_col, "n_events", "sum_value"))
