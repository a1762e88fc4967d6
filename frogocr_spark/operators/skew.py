"""conv_id-salted repartition + secondary sort (SURVEY §4 custom piece a).

Extraction is a pure per-row map, so correctness never depends on
partitioning — ordering comes from the ``(conv_id, turn_idx)`` data keys,
never from partition iteration order (SURVEY §7 hard part 2).  But at
10^12 turns a hash-repartition on ``conv_id`` alone would put a
10^4-turn conversation (the long-agent-session skew case) into one task.
Salting on ``pmod(turn_idx, salt_buckets)`` splits hot conversations
across ``salt_buckets`` tasks while keeping small conversations one-task;
``sortWithinPartitions(conv_id, turn_idx)`` then restores stable turn
order inside every task so Arrow batches see contiguous turns (locality
for downstream per-conv ops + deterministic batch content).

The reference has no cross-task shuffle at all (FIFO thread dispatch —
``Source/Application.cpp:318-335``); this module is the Spark-native
replacement for that scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def salted_repartition(df: DataFrame, num_partitions: int | None = None,
                       salt_buckets: int = DEFAULT_SALT_BUCKETS,
                       conv_col: str = "conv_id",
                       turn_col: str = "turn_idx") -> DataFrame:
    """Hash-repartition on (conv_id, salt) then secondary-sort the turns."""
    salt = F.pmod(F.col(turn_col), F.lit(salt_buckets))
    if num_partitions:
        out = df.repartition(num_partitions, F.col(conv_col), salt)
    else:
        out = df.repartition(F.col(conv_col), salt)
    return out.sortWithinPartitions(conv_col, turn_col)
