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


def near_dedup_batch_fn(sink, sigs, id_col: str = "doc_id",
                        text_col: str = "text", num_hashes: int = 32,
                        bands: int = 8, threshold: float = 0.6,
                        hash_fn: str = "xxhash64"):
    """Streaming NEAR-dup ingestion: a ``foreachBatch`` function that
    runs :func:`operators.dedup.minhash_lsh_pairs_incremental` per
    micro-batch against the accumulated base — the streaming face of
    the incremental operator (daily-increment shape, continuously).

    Per batch: (1) the batch is LSH-banded against the persisted
    signature table (base×base never re-paired — work proportional to
    the batch); (2) losers drop by the greedy order-deterministic rule
    — a batch doc matching ANY base doc loses, and of a within-batch
    pair the larger id loses (the batch pipeline's connected-components
    resolution is the offline twin; greedy-vs-keeper is the standard
    ingestion rule and may over-drop on within-batch chains, which is
    documented and tested); (3) survivors append to ``sink`` and their
    signatures to ``sigs`` — only KEPT documents become future base, so
    state grows with the deduped corpus, not the raw stream.

    Exactly-once across restarts: both appends are ``run_id=b<batch_id>``
    idempotent (:class:`sources.catalog.Table` staged publish), so a
    replayed micro-batch overwrites its own files instead of
    duplicating them."""
    from ..operators.dedup import (minhash_lsh_pairs_incremental,
                                   minhash_signatures)

    kw = dict(num_hashes=num_hashes, bands=bands, threshold=threshold,
              hash_fn=hash_fn)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()   # stabilize the source cut
        # signatures computed ONCE per batch: shared by the pairing
        # (new_signatures) and by the kept-docs persistence below
        batch_sigs = minhash_signatures(batch_df, id_col, text_col,
                                        num_hashes, hash_fn=hash_fn
                                        ).localCheckpoint()
        if sigs.exists():
            base_sigs = sigs.read().select(id_col, "signature")
            pairs = minhash_lsh_pairs_incremental(
                batch_df, None, id_col, text_col,
                base_signatures=base_sigs, new_signatures=batch_sigs, **kw)
            base_ids = base_sigs.select(F.col(id_col).alias("id_b"))
            vs_base = (pairs.join(base_ids, "id_b", "leftsemi")
                       .select(F.col("id_a").alias("_loser")))
            vs_new = (pairs.join(base_ids, "id_b", "left_anti")
                      .select(F.col("id_b").alias("_loser")))
            losers = vs_base.unionByName(vs_new).distinct()
        else:
            pairs = minhash_lsh_pairs_incremental(
                batch_df, batch_df.limit(0), id_col, text_col,
                new_signatures=batch_sigs, **kw)
            losers = pairs.select(F.col("id_b").alias("_loser")).distinct()
        losers = losers.localCheckpoint()
        kept = batch_df.join(
            losers, batch_df[id_col] == losers._loser, "left_anti"
        ).localCheckpoint()
        run = f"b{batch_id}"
        sink.append(kept, run_id=run)
        sigs.append(batch_sigs.join(kept.select(id_col), id_col,
                                    "leftsemi"),
                    run_id=run)

    return fn
