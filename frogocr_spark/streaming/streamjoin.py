"""Stream-stream interval join (event-time range + equi-key).

The click→conversion attribution shape: a right-side event (purchase)
joins every left-side event (click) of the same key whose timestamp
precedes it by at most ``max_lag``.  One definition serves both modes
(the repo's eventtime.py pattern):

- batch: a keyed equi-join with a residual time-range predicate — the
  DuckDB-oracled contract twin (``attribution`` query).
- streaming: BOTH sides get watermarks and the join carries the
  event-time range condition, which is what lets Spark bound the join
  state: a buffered left row can be evicted once the right watermark
  passes ``l_ts + max_lag`` (and vice versa) — without the range
  condition the state store must keep every row forever, the classic
  unbounded stream-join failure.  Inner joins emit a pair exactly once,
  when both sides have arrived (tested: incremental drains over a
  shared checkpoint produce exactly the batch pairs, no duplicates).

Scale shape: the join is keyed on the equi-key (user), so the shuffle
is a plain keyed exchange; the time predicate is a post-join residual.
State at any instant is bounded by rows within the watermark horizon —
traffic-rate-proportional, not history-proportional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(left: DataFrame, right: DataFrame, key: str, *,
                         l_ts: str = "ts", r_ts: str = "ts",
                         max_lag: str = "10 minutes",
                         watermark_delay: str = "5 minutes",
                         l_prefix: str = "l_",
                         r_prefix: str = "r_") -> DataFrame:
    """Pairs (left, right) with equal ``key`` and ``l_ts <= r_ts <=
    l_ts + max_lag``.  Output: the key, then every non-key column of
    each side under its prefix, plus ``lag_us`` (integer microseconds,
    engine-exact)."""
    l = (left.withWatermark(l_ts, watermark_delay)
         if left.isStreaming else left)
    r = (right.withWatermark(r_ts, watermark_delay)
         if right.isStreaming else right)
    lsel = [F.col(key)] + [F.col(c).alias(f"{l_prefix}{c}")
                           for c in left.columns if c != key]
    rsel = [F.col(key).alias("_rkey")] + [
        F.col(c).alias(f"{r_prefix}{c}")
        for c in right.columns if c != key]
    la, ra = l.select(*lsel), r.select(*rsel)
    lt, rt = f"{l_prefix}{l_ts}", f"{r_prefix}{r_ts}"
    cond = ((F.col(key) == F.col("_rkey"))
            & (F.col(rt) >= F.col(lt))
            & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {max_lag}")))
    out = la.join(ra, cond, "inner").drop("_rkey")
    return out.withColumn(
        "lag_us",
        F.unix_micros(F.col(rt).cast("timestamp"))
        - F.unix_micros(F.col(lt).cast("timestamp")))
