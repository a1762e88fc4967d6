"""Resumability: processed-keys anti-join (F1) + exactly-once bookkeeping.

FrogOCR resumes by checking output existence per task before processing
(reference ``Source/TaskProcessor.cpp:191-209``) and consumes the queue
destructively (``Source/Application.cpp:62-64,518-521`` — at-most-once).
The Spark-native design is strictly stronger (SURVEY §2.8 T6):

1. never delete input — the transcripts table is immutable;
2. skip-done via LEFT ANTI JOIN of the input against the committed output
   keys ``(conv_id, turn_idx)``;
3. idempotent run_id-scoped appends (catalog.Table.append) make a retried
   run_id safe → exactly-once end to end.

The anti-join is the engine's only cross-table join (SURVEY §2.3 note); at
scale the committed-key side is typically much smaller than the input in a
resume scenario and Spark's AQE picks broadcast vs shuffle automatically —
we pass a hint only when the caller knows the key set is tiny.

NULL keys (VERDICT r4 #4 three-valued-logic audit): anti-join equality is
null-unsafe — a NULL-keyed INPUT row matches nothing and would be
re-selected on every resume (duplicate appends: the exactly-once story
leans on the keys), while a NULL-keyed committed row is merely inert.
The transcripts schema declares both keys non-nullable
(sources/transcripts.TRANSCRIPT_SCHEMA) and the catalog's appends write
them through unchanged, so the invariant is enforced at the source; any
future nullable-key source must pre-filter or surrogate NULL keys before
entering the resume loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ("conv_id", "turn_idx")


def filter_unprocessed(input_df: DataFrame, processed: DataFrame | None,
                       broadcast_threshold_rows: int | None = None) -> DataFrame:
    """F1: keep only input rows whose keys are not yet committed."""
    if processed is None:
        return input_df
    keys = processed.select(*KEYS).dropDuplicates(list(KEYS))
    if broadcast_threshold_rows is not None:
        keys = F.broadcast(keys)
    return input_df.join(keys, on=list(KEYS), how="left_anti")


def filter_unprocessed_bucketed(input_df: DataFrame,
                                processed: DataFrame | None) -> DataFrame:
    """F1 at 10^12-row scale: storage-partitioned anti-join.

    Both sides must come from conv_id-bucketed tables with the same bucket
    count (``sources.catalog.BucketedTable``); the join then reads matching
    buckets pairwise with ZERO Exchange — no shuffle of either the input
    or the committed-key side on resume (plan-asserted in
    tests/test_bucketed.py).  Keys are NOT de-duplicated here: a dropDuplicates
    would reintroduce a shuffle, and duplicate committed keys cannot occur
    (run_id-idempotent appends) while being harmless to anti-join semantics
    anyway.
    """
    if processed is None:
        return input_df
    return input_df.join(processed.select(*KEYS), on=list(KEYS),
                         how="left_anti")
