"""Deterministic ×N scale-up of the synthetic test tables (VERDICT r4 #1).

Builds a sf-equiv directory (e.g. sf0.1 × 100 ≈ sf10) for the
scale-certification run — entirely from the existing deterministic
sf0.1 tables, no external data.  Replication is WORKLOAD-PRESERVING,
not row-copying: a naive copy would make every row an exact duplicate
of its replicas, turning the dedup/similarity queries into degenerate
mega-cluster workloads.  Instead each replica is transformed so
intra-replica structure is EXACTLY the original while cross-replica
similarity collapses:

- ``documents``: tokens of replica k>0 are injectively renamed into a
  disjoint token space (``rk_<token>``) — within a replica every
  Jaccard/minhash/simhash relation is isomorphic to sf0.1's; across
  replicas intersections are empty.  True near-dup pair count scales
  exactly ×N (the linear-scaling yardstick the bench checks against).
- ``embeddings``: replica k>0 is multiplied elementwise by a
  deterministic ±1 sign pattern (a diagonal orthogonal transform):
  norms and ALL intra-replica dot products are preserved bit-for-bit
  in exact arithmetic, cross-replica cosines are scrambled.
- ``events``: ids/users offset per replica and timestamps shifted by
  ``k × 400 days`` so replicas are temporally disjoint — the
  co-event graph becomes N disjoint copies (density per time window
  unchanged; a shared clock would grow windows quadratically).
- all other tables: copied verbatim (the certification queries don't
  read them; present so every ``queries()`` entry still resolves).

Replica 0 is always the identity, so sf0.1 results embed as a subset.

Usage: python tools/gen_sfbig.py <out_dir> [replicas=100] [src=/root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

COPY_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")


def _replicas(spark: SparkSession, n: int):
    return F.broadcast(spark.range(n).select(
        F.col("id").cast("int").alias("replica")))


def scale_documents(spark, src, n):
    docs = spark.read.parquet(f"{src}/documents.parquet")
    d = docs.crossJoin(_replicas(spark, n))
    renamed = F.array_join(
        F.transform(F.split("text", " "),
                    lambda x: F.concat(F.lit("r"),
                                       F.col("replica").cast("string"),
                                       F.lit("_"), x)), " ")
    text = F.when(F.col("replica") == 0, F.col("text")).otherwise(renamed)
    return d.select(
        (F.col("doc_id") + F.col("replica").cast("long") * 1_000_000)
        .alias("doc_id"),
        text.alias("text"),
        "lang", "source",
        F.length(text).cast(docs.schema["n_chars"].dataType)
        .alias("n_chars"))


def scale_embeddings(spark, src, n):
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    d = emb.crossJoin(_replicas(spark, n))
    # ±1 diagonal sign pattern per (replica, dim) — deterministic,
    # norm- and intra-replica-dot-product-preserving
    flipped = F.transform(
        "embedding",
        lambda x, i: x * (F.lit(1.0) - 2.0 * F.pmod(
            F.hash(F.col("replica") * 4099 + i), F.lit(2))
            .cast("float")))
    vec = F.when(F.col("replica") == 0, F.col("embedding")) \
           .otherwise(flipped)
    return d.select(
        (F.col("vec_id") + F.col("replica").cast("long") * 1_000_000)
        .alias("vec_id"),
        vec.cast(emb.schema["embedding"].dataType).alias("embedding"),
        "label")


def scale_events(spark, src, n):
    ev = spark.read.parquet(f"{src}/events.parquet")
    d = ev.crossJoin(_replicas(spark, n))
    return d.select(
        (F.col("event_id") + F.col("replica").cast("long") * 100_000_000)
        .alias("event_id"),
        (F.col("ts") + F.make_interval(days=F.col("replica") * 400))
        .alias("ts"),
        (F.col("user_id")
         + F.col("replica").cast(ev.schema["user_id"].dataType)
         * 1_000_000).alias("user_id"),
        "event_type", "value", "props")


def main() -> None:
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)

    from frogocr_spark.session import get_spark
    spark = get_spark(app_name="gen-sfbig", cores=32)
    try:
        for name, fn, files in (("documents", scale_documents, 64),
                                ("embeddings", scale_embeddings, 32),
                                ("events", scale_events, 64)):
            fn(spark, src, n).repartition(files).write \
                .mode("overwrite").parquet(f"{out}/{name}.parquet")
            print(f"{name}: scaled x{n}")
        for t in COPY_TABLES:
            dst = f"{out}/{t}.parquet"
            if not os.path.exists(dst):
                shutil.copyfile(f"{src}/{t}.parquet", dst)
        print("done:", out)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
