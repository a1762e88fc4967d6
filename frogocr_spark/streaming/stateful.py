"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-conversation incremental state over the turn stream — the streaming
analog of the reference's per-processor accumulation
(``Source/TaskProcessor.hpp:51``, counters rolled up by the scheduler —
``Source/Application.cpp:318-331``), expressed with Spark's arbitrary
stateful processing:

For each ``conv_id`` the operator maintains ``(n_turns, n_extracted,
n_empty, last_turn_idx)`` across micro-batches and emits one updated
summary row per conversation per batch.  State survives restarts via the
streaming checkpoint — kill/resume keeps the counts exact.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..core.extract import extract_batch

STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_extracted", T.LongType()),
    T.StructField("n_empty", T.LongType()),
    T.StructField("last_turn_idx", T.IntegerType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_extracted", T.LongType()),
    T.StructField("n_empty", T.LongType()),
    T.StructField("last_turn_idx", T.IntegerType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterable[pd.DataFrame]:
    (conv_id,) = key
    n_turns, n_extracted, n_empty, last_idx = (
        state.get if state.exists else (0, 0, 0, -1))
    for pdf in pdfs:
        res = extract_batch(pdf["text"])
        n_turns += len(pdf)
        nonempty = (res["extracted_text"].str.len() > 0).sum()
        n_extracted += int(nonempty)
        n_empty += int(len(res) - nonempty)
        last_idx = max(last_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_extracted, n_empty, last_idx))
    yield pd.DataFrame([{
        "conv_id": conv_id, "n_turns": n_turns, "n_extracted": n_extracted,
        "n_empty": n_empty, "last_turn_idx": last_idx,
    }])


def conversation_state_stream(stream_df: DataFrame) -> DataFrame:
    """turn stream → per-conversation running extraction summary."""
    return (stream_df
            .select("conv_id", "turn_idx", "text")
            .groupBy("conv_id")
            .applyInPandasWithState(
                _update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
