"""Plan-shape regression guards: the properties BENCH/BASELINE.md claims
(column pruning to the UDF's needs, parquet filter pushdown, broadcast
anti-join for small key sets, map-only extraction) asserted on the real
executed plans so a refactor can't silently regress them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def transcripts_parquet(spark, tmp_path_factory):
    from frogocr_spark.sources import transcripts
    out = str(tmp_path_factory.mktemp("plans") / "transcripts")
    transcripts.generate_for_sf(spark, SF).repartition(8) \
        .write.mode("overwrite").parquet(out)
    return out


def test_extraction_plan_is_map_only_and_column_pruned(spark,
                                                       transcripts_parquet):
    from frogocr_spark.operators.extraction import extract_turns
    df = spark.read.parquet(transcripts_parquet)
    plan = _plan(extract_turns(df))
    assert "MapInArrow" in plan
    assert "Exchange" not in plan          # pure per-row map, no shuffle
    # Arrow width: the scan must read only the columns the UDF consumes
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("conv_id", "turn_idx", "role", "text"):
        assert col in read_schema
    for col in ("tool", "ts"):
        assert col not in read_schema


def test_filter_pushdown_reaches_parquet_scan(spark, transcripts_parquet):
    df = (spark.read.parquet(transcripts_parquet)
          .where(F.col("role") == "user").select("conv_id", "turn_idx"))
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "EqualTo(role,user)" in plan or "role" in \
        plan.split("PushedFilters:")[1].splitlines()[0]


def test_resume_anti_join_broadcasts_small_key_set(spark,
                                                   transcripts_parquet):
    from frogocr_spark.operators.resume import filter_unprocessed
    inp = spark.read.parquet(transcripts_parquet)
    done = inp.limit(500).select("conv_id", "turn_idx")
    plan = _plan(filter_unprocessed(inp, done))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_ivf_corpus_side_never_shuffles(spark):
    """IVF ANN: the corpus side must be scan → cell-assign → broadcast
    join — no Exchange on the corpus path (the top-k window exchanges
    only the small candidate set)."""
    from frogocr_spark.operators.similarity import cosine_topk_ivf
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_topk_ivf(emb, emb.where("vec_id < 5"), k=3, n_clusters=8)
    plan = _plan(out)
    # candidate join itself is broadcast — the only exchange allowed is
    # the rank window over (small) scored candidates
    assert "BroadcastHashJoin" in plan
    pre_window = plan.split("row_number")[0]
    assert pre_window.count("Exchange") <= 1


def test_embedding_lsh_pair_dedup_exchanges_bare_ids(spark):
    """The bucket-join candidate dedup must shuffle BARE id pairs, never
    the embedding vectors (the round-1 minhash lesson: carrying the
    payload through the quadratic bucket fanout multiplies shuffle
    volume by the payload width).  Locked by asserting no vector column
    appears in the plan between the bucket join and the pair-dedup
    aggregate."""
    from frogocr_spark.operators.dedup import embedding_near_dup_pairs
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = embedding_near_dup_pairs(emb, threshold=0.4, dim=64, use_lsh=True)
    plan = _plan(out)
    # the dedup aggregate over (id_a, id_b): find its partial-aggregate
    # exchange and check the exchanged schema mentions ids only
    segs = plan.split("Exchange hashpartitioning(id_a")
    assert len(segs) >= 2, "expected an id-pair keyed exchange"
    # the line describing the exchange carries its output schema
    exch_line = "Exchange hashpartitioning(id_a" + segs[1].splitlines()[0]
    assert "_v" not in exch_line and "embedding" not in exch_line
