"""Streaming deduplication: the streaming face of the dedup family.

Training-data ingestion is continuous; the exact-dedup operator
(operators/dedup.exact_dedup) has a streaming twin here built on Spark's
watermark-bounded duplicate state:

- :func:`dedup_stream_exact` — drop rows whose KEY was already seen,
  with state bounded by an event-time watermark
  (``dropDuplicatesWithinWatermark``): a duplicate arriving within
  ``delay`` of the first occurrence is dropped; state for keys older
  than the watermark is evicted, so the operator runs forever on a
  10^12-row stream with bounded memory.  This is the honest unbounded-
  stream contract — EXACT dedup over an infinite horizon requires
  unbounded state in any engine.
- :func:`dedup_stream_content` — same machinery keyed on a content
  digest (``md5(text)``) computed on the fly: the streaming analog of
  digest-groupBy exact dedup.  The digest column rides along in the
  output so downstream batch reconciliation can join against the batch
  dedup's digests.

State lives in the streaming checkpoint: kill/resume keeps the
seen-set exact (no re-emission of already-passed rows), which the
drain/restart test locks in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(stream_df: DataFrame, key_cols: list[str],
                       time_col: str = "ts",
                       delay: str = "10 minutes") -> DataFrame:
    """First occurrence per key passes; duplicates within the watermark
    horizon are dropped; key state is evicted once the watermark passes
    ``delay`` beyond the first occurrence's event time."""
    return (stream_df.withWatermark(time_col, delay)
            .dropDuplicatesWithinWatermark(key_cols))


def dedup_stream_content(stream_df: DataFrame, text_col: str = "text",
                         time_col: str = "ts",
                         delay: str = "10 minutes",
                         digest_col: str = "digest") -> DataFrame:
    """Content-digest streaming dedup: md5 of the payload text is the
    duplicate key (computed JVM-side, codegen'd — no Python)."""
    with_digest = stream_df.withColumn(digest_col, F.md5(F.col(text_col)))
    return (with_digest.withWatermark(time_col, delay)
            .dropDuplicatesWithinWatermark([digest_col]))


def curate_stream(stream_df: DataFrame, text_col: str = "text",
                  time_col: str = "ts", delay: str = "10 minutes",
                  lang: str = "en", min_quality: float = 0.5,
                  min_tokens: int = 5) -> DataFrame:
    """Streaming curation: the streaming twin of the batch ``curate``
    contract query — language/quality/length gates (stateless column
    expressions, identical to the batch path) composed with the
    watermark-bounded content dedup.  Gates run BEFORE the stateful
    dedup so junk never enters the duplicate state store — at ingest
    scale the state holds digests of KEPT documents only."""
    from ..operators.textstats import curation_gates
    gated = curation_gates(stream_df, text_col=text_col, lang=lang,
                           min_quality=min_quality, min_tokens=min_tokens)
    return dedup_stream_content(gated, text_col=text_col,
                                time_col=time_col, delay=delay)
